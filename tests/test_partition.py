"""Space-aware data-repository partition strategies
(functions/partition.py — RemainingSpaceStrategy.java:81-170 /
MaxRecordNumberStrategy.java analogs): smallest-sufficient-space
selection, stickiness, ledger persistence, resume byte-identity, and
strategy-aware update routing."""

import glob
import hashlib
import json
import os

import numpy as np
import pytest


def test_remaining_space_selection_rules():
    from goobi_viewer_indexer_ray.functions.partition import RemainingSpaceStrategy

    st = RemainingSpaceStrategy([100, 50, 200], buffer=10)
    # smallest sufficient space wins: size 30 fits (90, 40, 190) → p1
    assert st.assign(["a"], [30]).tolist() == [1]
    # p1 now has 10 usable (40-30) < 20+buffer → size 20 fits (90, 190) → p0
    assert st.assign(["b"], [20]).tolist() == [0]
    # sticky: re-assigning "a" returns p1 without re-charging bytes
    used_before = list(st.used)
    assert st.assign(["a"], [999]).tolist() == [1]
    assert st.used == used_before
    # nothing fits size 500 → the reference's fatal error
    with pytest.raises(RuntimeError, match="no partition"):
        st.assign(["huge"], [500])
    # round-trip through the persisted state
    st2 = RemainingSpaceStrategy.from_state(st.to_state())
    assert st2.assign(["a"], [1]).tolist() == [1]
    assert st2.used == st.used


def test_max_records_strategy():
    from goobi_viewer_indexer_ray.functions.partition import MaxRecordNumberStrategy

    st = MaxRecordNumberStrategy(2, max_records=2)
    assert st.assign(["a", "b", "c"]).tolist() == [0, 0, 1]
    assert st.assign(["a"]).tolist() == [0]  # sticky
    assert st.assign(["d"]).tolist() == [1]
    with pytest.raises(RuntimeError, match="max_records"):
        st.assign(["e"])


def _tree(root):
    out = {}
    for f in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True):
        out[os.path.relpath(f, root)] = hashlib.md5(open(f, "rb").read()).hexdigest()
    return out


def test_strategy_build_resume_and_update(ray_session, tmp_path_factory):
    """End-to-end: budgeted build honors the ledger; rerun is a
    byte-identical no-op; an update keeps old urls sticky, assigns new
    ones by rule, and routes deletes through the ledger."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.functions.partition import (
        RemainingSpaceStrategy, load_ledger,
    )
    from goobi_viewer_indexer_ray.pipelines.build import build_all
    from goobi_viewer_indexer_ray.pipelines.updates import apply_updates

    folder = tmp_path_factory.mktemp("srcparts")
    out = str(tmp_path_factory.mktemp("stratout") / "out")
    import datetime
    ts = datetime.datetime(2031, 1, 1, tzinfo=datetime.timezone.utc)

    def shard(path, urls, tag, ts=ts):
        pq.write_table(pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([ts] * len(urls), pa.timestamp("us", tz="UTC")),
            "html": pa.array(
                [f"<html><body><p>{tag} {u} words here</p></body></html>".encode()
                 for u in urls], pa.binary()),
            "text": pa.array([None] * len(urls), pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }), str(path))

    urls = [f"https://strat.example/{i:02d}" for i in range(12)]
    shard(folder / "s0.parquet", urls, "v1")

    budgets = [700, 700, 10_000]
    build_all(str(folder / "s0.parquet"), out, num_shards=2,
              partition_strategy=RemainingSpaceStrategy(budgets, buffer=16))
    led = load_ledger(out)
    assert led is not None and set(led.assign_map) == set(urls)
    # every partition's charged bytes respect its budget
    assert all(u <= b for u, b in zip(led.used, budgets))
    # docs landed exactly where the ledger says
    for p in set(led.assign_map.values()):
        f = os.path.join(out, "docs", f"part={p:05d}", "data.parquet")
        got = pq.read_table(f, columns=["url"]).column("url").to_pylist()
        assert all(led.assign_map[u] == p for u in got)
    man = json.load(open(os.path.join(out, "docs_manifest.json")))
    assert man["partition_strategy"].startswith("remaining_space:")

    # rerun under the same policy → byte-identical no-op
    h0 = _tree(out)
    build_all(str(folder / "s0.parquet"), out, num_shards=2,
              partition_strategy=RemainingSpaceStrategy(budgets, buffer=16))
    assert _tree(out) == h0

    # update: existing url stays sticky, new url assigned by the rule
    old_url, new_url = urls[0], "https://strat.example/new"
    shard(folder / "delta.parquet", [old_url, new_url], "v2",
          ts=ts + datetime.timedelta(days=1))
    apply_updates(out, str(folder / "delta.parquet"))
    led2 = load_ledger(out)
    assert led2.assign_map[old_url] == led.assign_map[old_url]  # sticky
    assert new_url in led2.assign_map
    p_old = led2.assign_map[old_url]
    f = os.path.join(out, "docs", f"part={p_old:05d}", "data.parquet")
    t = pq.read_table(f)
    row = t.filter(pa.compute.equal(t.column("url"), old_url))
    assert row.num_rows == 1 and "v2" in row.column("text")[0].as_py()

    # delete routes through the ledger (ledger part, not the url hash)
    apply_updates(out, None, [new_url])
    all_urls = []
    for f in glob.glob(os.path.join(out, "docs", "part=*", "data.parquet")):
        all_urls += pq.read_table(f, columns=["url"]).column("url").to_pylist()
    assert new_url not in all_urls and old_url in all_urls


def test_hash_rebuild_clears_stale_ledger(ray_session, tmp_path_factory):
    """Review finding: rebuilding an out_dir WITHOUT a strategy must
    remove the previous strategy build's ledger — otherwise later
    updates/deletes would route urls to strategy-era partitions that
    no longer hold them."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.functions.partition import (
        LEDGER_NAME, MaxRecordNumberStrategy, load_ledger,
    )
    from goobi_viewer_indexer_ray.pipelines.build import build_all

    folder = tmp_path_factory.mktemp("srcclear")
    out = str(tmp_path_factory.mktemp("clearout") / "out")
    ts = datetime.datetime(2031, 1, 1, tzinfo=datetime.timezone.utc)
    urls = [f"https://clear.example/{i}" for i in range(8)]
    pq.write_table(pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([ts] * 8, pa.timestamp("us", tz="UTC")),
        "html": pa.array([f"<p>{u}</p>".encode() for u in urls], pa.binary()),
        "text": pa.array([None] * 8, pa.string()),
        "lang": pa.array(["en"] * 8, pa.string()),
    }), str(folder / "s0.parquet"))

    build_all(str(folder / "s0.parquet"), out, num_shards=2,
              partition_strategy=MaxRecordNumberStrategy(4, max_records=4))
    assert load_ledger(out) is not None
    build_all(str(folder / "s0.parquet"), out, num_shards=2)  # hash rebuild
    assert load_ledger(out) is None
    assert not os.path.exists(os.path.join(out, LEDGER_NAME))
    man = json.load(open(os.path.join(out, "docs_manifest.json")))
    assert man["partition_strategy"] == "hash"


def test_stale_ledger_ignored_when_manifest_says_hash(ray_session, tmp_path_factory):
    """Review finding (crash window): if a stale strategy ledger
    survives a hash rebuild (e.g. cleanup crashed), update routing must
    IGNORE it — the manifest's recorded strategy is authoritative."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.functions.partition import (
        LEDGER_NAME, MaxRecordNumberStrategy, save_ledger,
    )
    from goobi_viewer_indexer_ray.pipelines.build import build_all
    from goobi_viewer_indexer_ray.pipelines.updates import apply_updates

    folder = tmp_path_factory.mktemp("srcstale")
    out = str(tmp_path_factory.mktemp("staleout") / "out")
    ts = datetime.datetime(2031, 1, 1, tzinfo=datetime.timezone.utc)
    urls = [f"https://stale.example/{i}" for i in range(6)]

    def shard(path, us):
        pq.write_table(pa.table({
            "url": pa.array(us, pa.string()),
            "warc_ts": pa.array([ts] * len(us), pa.timestamp("us", tz="UTC")),
            "html": pa.array([f"<p>{u} text</p>".encode() for u in us], pa.binary()),
            "text": pa.array([None] * len(us), pa.string()),
            "lang": pa.array(["en"] * len(us), pa.string()),
        }), str(path))

    shard(folder / "s0.parquet", urls)
    build_all(str(folder / "s0.parquet"), out, num_shards=2)  # hash build
    # plant a stale ledger that routes every url to a WRONG partition
    stale = MaxRecordNumberStrategy(4, max_records=100)
    stale.assign_map = {u: 3 for u in urls}
    save_ledger(out, stale)
    assert os.path.exists(os.path.join(out, LEDGER_NAME))
    # the delete must still land (hash routing, ledger ignored)
    apply_updates(out, None, [urls[0]])
    remaining = []
    for f in glob.glob(os.path.join(out, "docs", "part=*", "data.parquet")):
        import pyarrow.parquet as _pq
        remaining += _pq.read_table(f, columns=["url"]).column("url").to_pylist()
    assert urls[0] not in remaining and set(urls[1:]) <= set(remaining)
