"""Enrichment actor (ST1 authority-cache analog): broadcast small side
+ per-actor TTL cache."""

import time

import pyarrow as pa

from goobi_viewer_indexer_ray.stages.enrich import EnrichDocs, TTLCache


def test_ttl_cache_semantics():
    c = TTLCache(max_size=3, ttl_seconds=0.2)
    c.put("a", 1)
    assert c.get("a") == 1 and c.hits == 1
    time.sleep(0.25)
    assert c.get("a") is None  # expired
    for k in "bcde":
        c.put(k, k)
    assert c.get("b") is None  # evicted (size 3)
    assert c.get("e") == "e"


def test_enrich_stage(ray_session):
    import ray
    import ray.data as rd

    base_ref = ray.put({"en": "English", "de": "German"})

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(40)), pa.int64()),
                "lang": pa.array((["en", "de", "fr", "xx"] * 10), pa.string()),
            }
        )
    ).repartition(2)
    out = ds.map_batches(
        EnrichDocs,
        fn_constructor_kwargs={
            "base_ref": base_ref,
            "key_col": "lang",
            "out_col": "lang_name",
        },
        batch_format="pyarrow",
        batch_size=10,
        concurrency=2,
        num_cpus=1,
    ).to_pandas()
    assert len(out) == 40
    got = dict(zip(out["lang"], out["lang_name"]))
    assert got["en"] == "English" and got["de"] == "German"
    assert got["fr"] == "unknown:fr" and got["xx"] == "unknown:xx"
