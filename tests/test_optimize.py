"""Index optimize (forceMerge-to-one) — stages/optimize.py.

Pins the three contracts: (1) an optimized segment is BYTE-IDENTICAL
to what a fresh single-bucket build produces, (2) the query surface is
unchanged (rank-identical top-k, same vocab stats, positions intact),
(3) the pass is idempotent/resumable and updates still apply after it.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from tests.conftest import NUM_PARTS, NUM_SHARDS, TINY_N, TINY_SEED


def _index_files(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "index_manifest.json")) as f:
        man = json.load(f)
    from goobi_viewer_indexer_ray.stages.index_merge import segment_dir

    return {
        (s["shard"], s["bucket"]): os.path.join(
            segment_dir(os.path.join(out_dir, "index"), s["shard"], s["bucket"]),
            s.get("file") or "terms.parquet",
        )
        for s in man["segments"]
    }


@pytest.fixture(scope="module")
def opt_build(ray_session, tiny_paths, tmp_path_factory):
    """Multi-segment build + its optimized copy + a single-bucket
    reference build (all over the same tiny corpus)."""
    from goobi_viewer_indexer_ray.pipelines.build import build_all
    from goobi_viewer_indexer_ray.stages.optimize import optimize_index

    root = tmp_path_factory.mktemp("opt")
    multi = str(root / "multi")
    build_all(tiny_paths, multi, num_parts=NUM_PARTS, num_shards=NUM_SHARDS,
              num_range_buckets=4)
    opt = str(root / "opt")
    shutil.copytree(multi, opt)
    man = optimize_index(opt)
    single = str(root / "single")
    build_all(tiny_paths, single, num_parts=NUM_PARTS, num_shards=NUM_SHARDS,
              num_range_buckets=1)
    return {"multi": multi, "opt": opt, "single": single, "man": man}


def test_optimize_compacts_to_one_segment_per_shard(opt_build):
    segs = _index_files(opt_build["opt"])
    assert sorted(segs) == [(s, 0) for s in range(NUM_SHARDS)]
    # multi-segment source really had >1 bucket per shard
    assert len(_index_files(opt_build["multi"])) > NUM_SHARDS


def test_optimized_segment_bytes_equal_single_bucket_build(opt_build):
    opt_files = _index_files(opt_build["opt"])
    single_files = _index_files(opt_build["single"])
    assert sorted(opt_files) == sorted(single_files)
    for key, opt_path in opt_files.items():
        with open(opt_path, "rb") as a, open(single_files[key], "rb") as b:
            assert a.read() == b.read(), f"segment {key} differs"


def test_query_identity_after_optimize(opt_build):
    from goobi_viewer_indexer_ray.pipelines.oracle import REFERENCE_QUERIES
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex, topk_exact, topk_wand

    before = LocalIndex(opt_build["multi"])
    after = LocalIndex(opt_build["opt"])
    assert after.n_terms == before.n_terms
    for q in REFERENCE_QUERIES:
        d_b, s_b = topk_exact(before, q["query"], q["k"])
        d_a, s_a = topk_exact(after, q["query"], q["k"])
        assert d_b.tolist() == d_a.tolist()
        assert s_b.tolist() == s_a.tolist()
        d_w, s_w = topk_wand(after, q["query"], q["k"])
        assert d_w.tolist() == d_a.tolist()
        assert s_w.tolist() == s_a.tolist()


def test_vocab_stats_identity(opt_build):
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex

    before = LocalIndex(opt_build["multi"])
    after = LocalIndex(opt_build["opt"])
    for term, ref in before._lookup.items():
        got = after.lookup(term)
        assert got is not None and got.df == ref.df and got.cf == ref.cf


def test_optimize_idempotent(opt_build):
    from goobi_viewer_indexer_ray.stages.optimize import optimize_index

    files = _index_files(opt_build["opt"])
    mtimes = {k: os.path.getmtime(p) for k, p in files.items()}
    man2 = optimize_index(opt_build["opt"])
    assert man2["fingerprint"] == opt_build["man"]["fingerprint"]
    assert {k: os.path.getmtime(p) for k, p in files.items()} == mtimes


def test_cleanup_removed_stale_segments(opt_build):
    index_dir = os.path.join(opt_build["opt"], "index")
    for d in os.listdir(index_dir):
        segs = os.listdir(os.path.join(index_dir, d))
        assert segs == ["seg=00000"], segs
        files = sorted(os.listdir(os.path.join(index_dir, d, "seg=00000")))
        parquets = [f for f in files if f.endswith(".parquet")]
        assert len(parquets) == 1 and parquets[0].startswith("terms-")


def test_reader_fails_loud_on_superseded_manifest(opt_build, tmp_path):
    """A manifest listing a missing segment file (damage, or a reader
    that raced an optimize's cleanup) must raise — never serve a
    silently empty index."""
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex

    dmg = str(tmp_path / "dmg")
    shutil.copytree(opt_build["opt"], dmg)
    victim = next(iter(_index_files(dmg).values()))
    os.remove(victim)
    with pytest.raises(FileNotFoundError, match="missing segment file"):
        LocalIndex(dmg)


def test_resume_skips_compacted_shard(ray_session, tiny_paths, tmp_path_factory):
    """A shard compacted by an interrupted run is not re-merged against
    its own output on the retry (checked before reading)."""
    from goobi_viewer_indexer_ray.pipelines.build import _job_fp, build_all
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex, _merge_segments
    from goobi_viewer_indexer_ray.stages.optimize import (
        _OptimizeShard, optimize_index, segments_to_runs,
    )
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("resume") / "out")
    build_all(tiny_paths, out, num_parts=NUM_PARTS, num_shards=NUM_SHARDS,
              num_range_buckets=4)
    with open(os.path.join(out, "index_manifest.json")) as f:
        old = json.load(f)
    fp = _job_fp(old["fingerprint"], optimize=1)
    file_name = f"terms-{fp[:8]}.parquet"
    files = _index_files(out)
    segs0 = [(b, p) for (s, b), p in files.items() if s == 0]

    # simulate the interrupted run: shard 0 compacted, manifest not yet
    import pyarrow as pa

    task = _OptimizeShard(os.path.join(out, "index"), fp, file_name,
                          {(0, 0): segs0})
    task(pa.table({"shard": [0], "target": [0]}))
    opt_path = os.path.join(os.path.dirname(segs0[0][1]).rsplit("/seg=", 1)[0],
                            "seg=00000", file_name)
    mtime = os.path.getmtime(opt_path)

    man = optimize_index(out)
    assert man["fingerprint"] == fp
    assert os.path.getmtime(opt_path) == mtime  # shard 0 skipped, not redone
    idx = LocalIndex(out)
    assert idx.n_terms > 0


def test_forcemerge_k2_bytes_equal_fresh_two_bucket_build(
        ray_session, tiny_paths, tmp_path_factory):
    """forceMerge(2) over a 4-bucket build == a fresh
    num_range_buckets=2 build, byte for byte (group boundaries
    coincide: g=2 old buckets per target)."""
    from goobi_viewer_indexer_ray.pipelines.build import build_all
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex
    from goobi_viewer_indexer_ray.stages.optimize import optimize_index

    root = tmp_path_factory.mktemp("fm2")
    multi = str(root / "multi")
    build_all(tiny_paths, multi, num_parts=NUM_PARTS, num_shards=NUM_SHARDS,
              num_range_buckets=4)
    opt = str(root / "opt")
    shutil.copytree(multi, opt)
    man = optimize_index(opt, max_segments_per_shard=2)
    assert sorted({s["bucket"] for s in man["segments"]}) == [0, 1]
    fresh = str(root / "fresh")
    build_all(tiny_paths, fresh, num_parts=NUM_PARTS, num_shards=NUM_SHARDS,
              num_range_buckets=2)
    opt_files, fresh_files = _index_files(opt), _index_files(fresh)
    assert sorted(opt_files) == sorted(fresh_files)
    for key, p in opt_files.items():
        with open(p, "rb") as a, open(fresh_files[key], "rb") as b:
            assert a.read() == b.read(), key
    # at/below target → no-op; a later k=1 compacts further
    man2 = optimize_index(opt, max_segments_per_shard=2)
    assert man2["fingerprint"] == man["fingerprint"]
    man3 = optimize_index(opt)  # k=1 chains from the k=2 state
    assert sorted({s["bucket"] for s in man3["segments"]}) == [0]
    assert LocalIndex(opt).n_terms == LocalIndex(multi).n_terms


def test_update_after_forcemerge_k2_mixes_file_names(
        ray_session, tiny_paths, tmp_path_factory):
    """After forceMerge(2), an update re-merges only the dirty target
    bucket (back under the default file name) while the clean
    optimized segment keeps its fingerprinted file — the mixed-name
    manifest must serve consistently."""
    from goobi_viewer_indexer_ray.pipelines.build import build_all
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex, topk_exact
    from goobi_viewer_indexer_ray.pipelines.updates import update_doc
    from goobi_viewer_indexer_ray.sources.corpus import gen_pages
    from goobi_viewer_indexer_ray.stages.optimize import optimize_index

    out = str(tmp_path_factory.mktemp("k2upd") / "out")
    build_all(tiny_paths, out, num_parts=NUM_PARTS, num_shards=NUM_SHARDS,
              num_range_buckets=4)
    optimize_index(out, max_segments_per_shard=2)
    row = gen_pages(TINY_N, TINY_SEED).to_pylist()[30]
    update_doc(out, row["url"], b"<html><body>zzmixzz zzmixzz</body></html>",
               warc_ts=row["warc_ts"])
    files = _index_files(out)
    names = {os.path.basename(p) for p in files.values()}
    assert "terms.parquet" in names  # the re-merged dirty bucket
    assert any(n.startswith("terms-") for n in names)  # clean optimized
    idx = LocalIndex(out)
    d, _ = topk_exact(idx, "zzmixzz", 5)
    assert d.size == 1


def test_positions_survive_optimize(ray_session, pos_index_dir, tmp_path_factory):
    """A positional index keeps exact per-occurrence positions through
    the compaction (poss blobs are per-posting delta runs — byte
    passthrough per term)."""
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex
    from goobi_viewer_indexer_ray.stages.optimize import optimize_index

    opt = str(tmp_path_factory.mktemp("posopt") / "out")
    shutil.copytree(pos_index_dir, opt)
    optimize_index(opt)
    before = LocalIndex(pos_index_dir)
    after = LocalIndex(opt)
    assert after.n_terms == before.n_terms
    for term in before._lookup:
        b = before.lookup(term).positions_all()
        a = after.lookup(term).positions_all()
        for x, y in zip(b, a):
            assert x.tolist() == y.tolist(), term
    segs = _index_files(opt)
    assert all(bucket == 0 for _, bucket in segs)


def test_update_after_optimize(ray_session, tiny_paths, tmp_path_factory):
    """apply_updates still lands on an optimized index (all parts map
    to the single bucket 0) and queries stay consistent."""
    from goobi_viewer_indexer_ray.pipelines.build import build_all
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex, topk_exact
    from goobi_viewer_indexer_ray.pipelines.updates import update_doc
    from goobi_viewer_indexer_ray.sources.corpus import gen_pages
    from goobi_viewer_indexer_ray.stages.optimize import optimize_index

    out = str(tmp_path_factory.mktemp("upd") / "out")
    build_all(tiny_paths, out, num_parts=NUM_PARTS, num_shards=NUM_SHARDS,
              num_range_buckets=4)
    optimize_index(out)

    row = gen_pages(TINY_N, TINY_SEED).to_pylist()[20]
    marker = "zzupdatedzz"
    update_doc(out, row["url"],
               f"<html><body>{marker} {marker}</body></html>".encode(),
               warc_ts=row["warc_ts"], lang=row.get("lang", ""))

    idx = LocalIndex(out)
    d, _ = topk_exact(idx, marker, 5)
    assert len(d) == 1


def test_repeated_optimize_cycles_leave_no_orphan_sidecars(
        ray_session, tiny_paths, tmp_path_factory):
    """auto_optimize runs after every update — superseded fingerprinted
    sidecar manifests must be cleaned, not accumulate."""
    from goobi_viewer_indexer_ray.pipelines.build import build_all
    from goobi_viewer_indexer_ray.pipelines.updates import update_doc
    from goobi_viewer_indexer_ray.sources.corpus import gen_pages
    from goobi_viewer_indexer_ray.stages.optimize import optimize_index

    out = str(tmp_path_factory.mktemp("cycles") / "out")
    build_all(tiny_paths, out, num_parts=NUM_PARTS, num_shards=NUM_SHARDS,
              num_range_buckets=4)
    rows = gen_pages(TINY_N, TINY_SEED).to_pylist()
    for i in (10, 11):  # two update+optimize cycles
        update_doc(out, rows[i]["url"],
                   f"<html><body>cycle{i} cycle{i}</body></html>".encode(),
                   warc_ts=rows[i]["warc_ts"])
        optimize_index(out)
    index_dir = os.path.join(out, "index")
    for d in os.listdir(index_dir):
        for seg in os.listdir(os.path.join(index_dir, d)):
            files = os.listdir(os.path.join(index_dir, d, seg))
            sidecars = [f for f in files if f.startswith("_manifest-")]
            assert len(sidecars) <= 1, (d, seg, files)
            parquets = [f for f in files if f.endswith(".parquet")]
            assert len(parquets) == 1, (d, seg, files)


# ------------------------------------------- tiered merge planning

def test_select_merges_under_budget_is_noop():
    from goobi_viewer_indexer_ray.stages.optimize import select_merges

    # 8 segments, budget >= 10 -> nothing to do
    assert select_merges([10 << 20] * 8) == []


def test_select_merges_merges_smallest_first():
    from goobi_viewer_indexer_ray.stages.optimize import select_merges

    f = 2 * 1024 * 1024
    # 15 floor-sized flush segments: level-1 tier allows 10 + ceil
    # residual -> over budget -> one cheapest merge of 10 smallest
    merges = select_merges([f] * 15, segs_per_tier=10,
                           max_merge_at_once=10)
    assert merges, "over-budget tier must trigger a merge"
    assert len(merges[0]) == 10
    # a big-segment tail inflates the byte budget: same 15 smalls
    # plus three 400 MB segments fit the allowance -> TMP does NOT
    # merge (the policy scales allowed count with index bytes)
    assert select_merges([f] * 12 + [400 << 20] * 3,
                         segs_per_tier=10, max_merge_at_once=10) == []


def test_select_merges_cascades_and_covers_each_index_once_per_round():
    from goobi_viewer_indexer_ray.stages.optimize import select_merges

    f = 2 * 1024 * 1024
    merges = select_merges([f] * 120, segs_per_tier=4, max_merge_at_once=4)
    # every original index appears in at least one merge; within one
    # merge no duplicates
    for g in merges:
        assert len(g) == len(set(g))
    # cascade: later merges may contain previously-merged indices, and
    # the plan terminates (bounded rounds)
    assert len(merges) >= 30


def test_select_merges_rejects_degenerate_params():
    import pytest

    from goobi_viewer_indexer_ray.stages.optimize import select_merges

    with pytest.raises(ValueError):
        select_merges([1], segs_per_tier=1)
