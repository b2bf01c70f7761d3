"""Curation pipeline: per-stage semantics + partitioned write
round-trip (oracle parity lives in test_catalog.py)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from goobi_viewer_indexer_ray.pipelines.curate import CURATE_DEFAULTS, curate


def _corpus():
    """Docs engineered to trip each filter exactly once."""
    good = "the of and in to " * 20          # 100 en tokens, distinct ok
    rows = [
        (1, good + "alpha beta gamma delta"),          # keeper
        (2, good + "alpha beta gamma delta"),          # exact dup of 1 → dropped
        (3, "too short"),                              # < min_tokens
        # de keeper: 13 distinct / 130 tokens → distinct ratio 10% ≥ 8%
        (4, "der die das und ist ein nicht mit von zu haus baum tag " * 10),
        (5, "le la les et de " * 30),                  # fr → lang-filtered
        (6, "the " * 100),                             # distinct ratio too low
        (7, good + "!!!" * 200),                       # punct share too high
        (8, "the of and " * 4000),                     # > max_tokens
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_curate_filters_and_dedup(ray_session):
    import ray

    ds = ray.data.from_arrow(_corpus()).repartition(3)
    out = curate(
        ds, **{**CURATE_DEFAULTS, "sample_fraction": 1.0}
    ).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 4]
    assert out.set_index("doc_id")["lang_pred"].to_dict() == {1: "en", 4: "de"}


def test_curate_sample_subset(ray_session):
    import ray

    good = "the of and in to " * 20
    many = pa.table(
        {
            "doc_id": pa.array(range(100, 160), pa.int64()),
            "text": pa.array(
                [good + f"unique{w} alpha beta gamma" for w in range(60)], pa.string()
            ),
        }
    )
    ds = ray.data.from_arrow(many)
    full = set(
        curate(ds, **{**CURATE_DEFAULTS, "sample_fraction": 1.0})
        .to_pandas()["doc_id"]
    )
    half = set(
        curate(ds, **{**CURATE_DEFAULTS, "sample_fraction": 0.5})
        .to_pandas()["doc_id"]
    )
    assert full == set(range(100, 160))
    assert 10 < len(half) < 50 and half <= full


def test_curate_partitioned_write(ray_session, tmp_path):
    import ray

    ds = ray.data.from_arrow(_corpus())
    out_dir = str(tmp_path / "curated")
    cur = curate(ds, **{**CURATE_DEFAULTS, "sample_fraction": 1.0}, out_dir=out_dir)
    # one directory per language partition, readable back to same rows
    parts = sorted(d for d in os.listdir(out_dir) if d.startswith("lang_pred="))
    assert parts == ["lang_pred=de", "lang_pred=en"]
    back = pq.read_table(out_dir).to_pandas()
    assert sorted(back["doc_id"].tolist()) == sorted(
        cur.to_pandas()["doc_id"].tolist()
    )
