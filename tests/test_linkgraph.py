"""Link-graph operators: integer PageRank (fast == distributed ==
hand recurrence) and anchor aggregation."""

import numpy as np
import pyarrow as pa
import pytest


def _ref_pagerank(n, src, dst, iters=10, scale=10**9):
    """Straight-line reference of the documented integer recurrence."""
    out_deg = np.bincount(src, minlength=n).astype(np.int64)
    pr = np.full(n, scale, np.int64)
    tp = (15 * scale) // 100
    for _ in range(iters):
        share = np.where(out_deg > 0, pr // np.maximum(out_deg, 1), 0)
        insum = np.zeros(n, np.int64)
        for s, d in zip(src, dst):
            insum[d] += share[s]
        de = int(pr[out_deg == 0].sum()) // n
        pr = tp + (85 * (insum + de)) // 100
    return pr, out_deg


def test_synth_edges_rule():
    from goobi_viewer_indexer_ray.stages.linkgraph import synth_edges

    t = synth_edges(np.arange(20), 20)
    src = t.column("src").to_numpy()
    dst = t.column("dst").to_numpy()
    assert (src != dst).all()
    # doc 5 -> (7*5 + j + 1) % 20 for j in 0..0 (5 % 4 == 1 edge)
    assert dst[src == 5].tolist() == [16]
    assert (np.bincount(src, minlength=20) <= 3).all()  # u%4 minus self-drops
    assert t.column("anchor").to_pylist()[0].startswith("a")


def test_pagerank_fast_matches_reference(ray_session):
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import pagerank, synth_edges

    n = 300
    edges_t = synth_edges(np.arange(n), n)
    nodes = ray.data.from_arrow(pa.table({"node": pa.array(range(n), pa.int64())}))
    edges = ray.data.from_arrow(edges_t)
    out = (
        pagerank(nodes, edges, iters=10, method="numpy")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pr_ref, od_ref = _ref_pagerank(
        n, edges_t.column("src").to_numpy(), edges_t.column("dst").to_numpy()
    )
    assert out["pr"].to_numpy().tolist() == pr_ref.tolist()
    assert out["out_deg"].to_numpy().tolist() == od_ref.tolist()
    # mass sanity: damped walk conserves ~n*scale within floor slack
    assert abs(out["pr"].sum() - n * 10**9) < n * 100


def test_pagerank_distributed_identical(ray_session):
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import pagerank, synth_edges

    n = 120
    # sparse, shuffled node ids exercise the id-mapping in both paths
    ids = (np.arange(n) * 37 + 11) % n
    edges_t = synth_edges(np.arange(n), n)
    nodes = ray.data.from_arrow(pa.table({"node": pa.array(ids, pa.int64())}))
    edges = ray.data.from_arrow(edges_t)
    fast = (
        pagerank(nodes, edges, iters=6, method="numpy")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        pagerank(nodes, edges, iters=6, method="distributed", num_partitions=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert fast[["node", "pr", "out_deg", "in_deg"]].equals(
        dist[["node", "pr", "out_deg", "in_deg"]]
    )


def test_pagerank_dangling_redistribution(ray_session):
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import pagerank

    # 0 -> 1, 1 dangling: without redistribution node 0 would starve
    nodes = ray.data.from_arrow(pa.table({"node": pa.array([0, 1], pa.int64())}))
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([0], pa.int64()), "dst": pa.array([1], pa.int64())})
    )
    out = pagerank(nodes, edges, iters=10).to_pandas().sort_values("node")
    assert out["pr"].iloc[0] > 10**9 * 0.4  # fed by node 1's dangling mass
    assert out["pr"].iloc[1] > out["pr"].iloc[0]


def test_anchor_stats_tiebreak_and_hosts(ray_session):
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import anchor_stats

    t = pa.table(
        {
            "src": pa.array([1, 11, 2, 3, 4], pa.int64()),  # hosts 1,1,2,3,4
            "dst": pa.array([9, 9, 9, 9, 9], pa.int64()),
            "anchor": pa.array(["b", "b", "a", "a", "c"], pa.string()),
        }
    )
    out = anchor_stats(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["doc_id"], r["in_deg"], r["n_hosts"]) == (9, 5, 4)
    assert (r["top_anchor"], r["top_anchor_n"]) == ("a", 2)  # 2-2 tie -> min anchor


def test_anchor_stats_host_mod_bound(ray_session):
    from goobi_viewer_indexer_ray.stages.linkgraph import anchor_stats

    with pytest.raises(ValueError):
        anchor_stats(None, host_mod=64)


def test_pagerank_checkpoint_resume(ray_session, tmp_path):
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import pagerank, synth_edges

    n = 80
    edges_t = synth_edges(np.arange(n), n)
    nodes = ray.data.from_arrow(pa.table({"node": pa.array(range(n), pa.int64())}))
    edges = ray.data.from_arrow(edges_t)
    direct = (
        pagerank(nodes, edges, iters=6, method="distributed", num_partitions=2)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    ck = str(tmp_path / "pr_ckpt")
    # "crash" after 3 rounds...
    pagerank(nodes, edges, iters=3, method="distributed", num_partitions=2,
             checkpoint_dir=ck)
    import os

    assert os.path.exists(os.path.join(ck, "iter=3", "_COMPLETE"))
    # ...resume to 6: rounds 1-3 come from disk, 4-6 run live
    resumed = (
        pagerank(nodes, edges, iters=6, method="distributed", num_partitions=2,
                 checkpoint_dir=ck)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert direct[["node", "pr"]].equals(resumed[["node", "pr"]])
    # an already-complete run is a pure read (marker for 6 now exists)
    again = (
        pagerank(nodes, edges, iters=6, method="distributed", num_partitions=2,
                 checkpoint_dir=ck)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert direct[["node", "pr"]].equals(again[["node", "pr"]])


def test_pagerank_checkpoint_requires_distributed(ray_session, tmp_path):
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import pagerank

    nodes = ray.data.from_arrow(pa.table({"node": pa.array([0, 1], pa.int64())}))
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([0], pa.int64()), "dst": pa.array([1], pa.int64())})
    )
    with pytest.raises(ValueError):
        pagerank(nodes, edges, method="numpy", checkpoint_dir=str(tmp_path))


def _ref_hits(n, src, dst, iters=5, scale=10**6):
    """Straight-line reference of the documented HITS recurrence."""
    h = np.full(n, scale, np.int64)
    a = np.zeros(n, np.int64)
    for _ in range(iters):
        ar = np.zeros(n, np.int64)
        for s, d in zip(src, dst):
            ar[d] += h[s]
        q = max(1, (int(ar.max()) + scale - 1) // scale)
        a = ar // q
        hr = np.zeros(n, np.int64)
        for s, d in zip(src, dst):
            hr[s] += a[d]
        q2 = max(1, (int(hr.max()) + scale - 1) // scale)
        h = hr // q2
    return a, h


def test_hits_fast_matches_reference(ray_session):
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import hits, synth_edges

    n = 300
    edges_t = synth_edges(np.arange(n), n)
    nodes = ray.data.from_arrow(pa.table({"node": pa.array(range(n), pa.int64())}))
    edges = ray.data.from_arrow(edges_t)
    out = (
        hits(nodes, edges, iters=5, method="numpy")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    a_ref, h_ref = _ref_hits(
        n, edges_t.column("src").to_numpy(), edges_t.column("dst").to_numpy()
    )
    assert out["auth"].to_numpy().tolist() == a_ref.tolist()
    assert out["hub"].to_numpy().tolist() == h_ref.tolist()
    # max-rescaling keeps every score in [0, scale]
    assert out["auth"].between(0, 10**6).all()
    assert out["hub"].between(0, 10**6).all()


def test_hits_distributed_identical(ray_session):
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import hits, synth_edges

    n = 120
    ids = (np.arange(n) * 37 + 11) % n  # shuffled node order
    edges_t = synth_edges(np.arange(n), n)
    nodes = ray.data.from_arrow(pa.table({"node": pa.array(ids, pa.int64())}))
    edges = ray.data.from_arrow(edges_t)
    fast = (
        hits(nodes, edges, iters=3, method="numpy")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        hits(nodes, edges, iters=3, method="distributed", num_partitions=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert fast[["node", "auth", "hub"]].equals(dist[["node", "auth", "hub"]])


@pytest.mark.parametrize("method", ["numpy", "distributed"])
def test_triangles_known_graph(ray_session, method):
    """Triangle counts on a hand-checkable graph: K4 plus a pendant
    edge — K4 has 4 triangles, each corner in 3 of them; the pendant
    node in none.  Directions and duplicate edges must collapse.
    Both plans (numpy fast path and the two-hash-join distributed
    plan) must agree exactly."""
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import triangles

    src = [0, 0, 0, 1, 1, 2, 3, 2, 1]  # K4 on {0,1,2,3} + 3-4 pendant
    dst = [1, 2, 3, 2, 3, 3, 4, 0, 0]  # incl. reversed dupes 2-0, 1-0
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    )
    out = (
        triangles(edges, method=method, num_partitions=2)
        .to_pandas().sort_values("node")
    )
    got = dict(zip(out.node, out.n_triangles))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_methods_identical(ray_session):
    """numpy and distributed plans agree on a dense random graph
    (every wedge shape, dupes, isolated nodes, no triangles for
    some)."""
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import triangles

    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ).repartition(5)
    fast = (
        triangles(edges, method="numpy")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        triangles(edges, method="distributed", num_partitions=2)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert len(fast) > 0
    assert fast.equals(dist)


def test_bfs_depth_rejects_non_node_closed_edges(ray_session):
    """Round-4 ADVICE: an edge endpoint absent from the node table must
    raise, not silently alias into a neighboring node slot."""
    import pytest
    import ray.data

    from goobi_viewer_indexer_ray.stages.linkgraph import bfs_depth

    nodes = ray.data.from_items([{"node": n} for n in (0, 5, 10)])
    ok = bfs_depth(nodes, ray.data.from_items(
        [{"src": 0, "dst": 5}]), rounds=2).to_pydict()
    assert dict(zip(ok["doc_id"], ok["depth"])) == {0: 0, 5: 1, 10: -1}
    # dst=7 not in nodes → would have aliased into node 10's slot
    with pytest.raises(ValueError, match="node-closed"):
        bfs_depth(ray.data.from_items([{"node": n} for n in (0, 5, 10)]),
                  ray.data.from_items([{"src": 0, "dst": 7}]), rounds=2)
    # endpoint beyond max(node) → would have indexed past the array
    with pytest.raises(ValueError, match="node-closed"):
        bfs_depth(ray.data.from_items([{"node": n} for n in (0, 5, 10)]),
                  ray.data.from_items([{"src": 0, "dst": 99}]), rounds=2)


def test_opic_numpy_equals_distributed(ray_session):
    """The OPIC integer recurrence is identical on both paths —
    the pagerank bit-exactness contract."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.linkgraph import opic, synth_edges

    ids = np.arange(300, dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    edges = rd.from_arrow(synth_edges(ids, 300))
    a = (opic(docs, edges, node_col="doc_id", method="numpy")
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (opic(docs, edges, node_col="doc_id", method="distributed",
              num_partitions=4)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a.equals(b)
    # history grows monotonically with rounds and dominates cash
    assert int(a["hist"].sum()) > int(a["cash"].sum())


def test_opic_rejects_open_edges(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.linkgraph import opic

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([0, 1, 2], pa.int64())}))
    edges = rd.from_arrow(pa.table({"src": pa.array([0, 9], pa.int64()),
                                    "dst": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="endpoint not in nodes"):
        opic(docs, edges, node_col="doc_id", method="numpy")


def test_cc_numpy_equals_distributed_and_labels(ray_session):
    """Hash-min CC: numpy fixpoint == distributed join loop, and the
    label is the min node id of the component (checked against a
    brute-force union-find)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.linkgraph import (
        connected_components, synth_edges)

    ids = np.arange(200, dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    # same-block filter => many components (the catalog fixture rule)
    et = synth_edges(ids, 200)
    src = et.column("src").to_numpy()
    dst = et.column("dst").to_numpy()
    keep = (src // 25) == (dst // 25)
    edges = rd.from_arrow(pa.table({"src": pa.array(src[keep], pa.int64()),
                                    "dst": pa.array(dst[keep], pa.int64())}))
    a = (connected_components(docs, edges, node_col="doc_id",
                              method="numpy")
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (connected_components(docs, edges, node_col="doc_id",
                              method="distributed", num_partitions=4)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a.equals(b)

    # brute-force union-find oracle
    parent = list(range(200))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(src[keep], dst[keep]):
        rs, rd_ = find(int(s)), find(int(d))
        if rs != rd_:
            parent[max(rs, rd_)] = min(rs, rd_)
    want = np.array([min(i for i in range(200) if find(i) == find(j))
                     for j in range(200)], np.int64)
    assert np.array_equal(a["comp"].to_numpy(), want)
    assert len(set(want.tolist())) > 5  # genuinely multi-component


def test_trustrank_numpy_equals_distributed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.linkgraph import (
        synth_edges, trustrank)

    ids = np.arange(300, dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    edges = rd.from_arrow(synth_edges(ids, 300))
    a = (trustrank(docs, edges, node_col="doc_id", method="numpy")
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (trustrank(docs, edges, node_col="doc_id", method="distributed",
                   num_partitions=4)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a.equals(b)
    # seeds hold trust; a non-seed with no trusted in-path decays to ~0
    seeds = a[a["is_seed"] == 1]
    assert (seeds["trust"] > 0).all()
    assert int(a["trust"].sum()) > 0


def test_trustrank_rejects_empty_seeds(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.linkgraph import trustrank

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1, 3], pa.int64())}))
    edges = rd.from_arrow(pa.table({"src": pa.array([1], pa.int64()),
                                    "dst": pa.array([3], pa.int64())}))
    with pytest.raises(ValueError, match="empty seed set"):
        trustrank(docs, edges, node_col="doc_id", seed_mod=50,
                  method="numpy")


def test_lpa_numpy_equals_distributed(ray_session):
    """Synchronous LPA with deterministic ties: numpy == join loop."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.linkgraph import (
        label_propagation, synth_edges)

    ids = np.arange(200, dtype=np.int64)
    et = synth_edges(ids, 200)
    src = et.column("src").to_numpy()
    dst = et.column("dst").to_numpy()
    keep = (src // 25) == (dst // 25)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    edges = rd.from_arrow(pa.table({"src": pa.array(src[keep], pa.int64()),
                                    "dst": pa.array(dst[keep], pa.int64())}))
    a = (label_propagation(docs, edges, node_col="doc_id", method="numpy")
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (label_propagation(docs, edges, node_col="doc_id",
                           method="distributed", num_partitions=4)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a.equals(b)
    # labels are node ids and non-trivial (some node adopted another's)
    labs = a["label"].to_numpy()
    assert set(labs.tolist()) <= set(ids.tolist())
    assert (labs != ids).any()


def test_kcore_numpy_equals_distributed(ray_session):
    """2-core peeling: numpy == join loop, and membership matches a
    brute-force peel-to-fixpoint."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.linkgraph import kcore, synth_edges

    ids = np.arange(200, dtype=np.int64)
    et = synth_edges(ids, 200)
    src = et.column("src").to_numpy()
    dst = et.column("dst").to_numpy()
    keep = np.ones(src.size, bool)  # full graph: its 2-core is nontrivial
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    edges = rd.from_arrow(pa.table({"src": pa.array(src[keep], pa.int64()),
                                    "dst": pa.array(dst[keep], pa.int64())}))
    a = (kcore(docs, edges, node_col="doc_id", method="numpy")
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (kcore(docs, edges, node_col="doc_id", method="distributed",
               num_partitions=4)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a.equals(b)

    # brute-force fixpoint peel
    import collections

    adj = collections.defaultdict(set)
    for s, d in zip(src[keep], dst[keep]):
        adj[int(s)].add(int(d))
        adj[int(d)].add(int(s))
    alive = set(range(200))
    while True:
        drop = {v for v in alive
                if len(adj[v] & alive) < 2}
        if not drop:
            break
        alive -= drop
    want = np.array([1 if i in alive else 0 for i in range(200)], np.int64)
    assert np.array_equal(a["in_core"].to_numpy(), want)
    assert 0 < int(want.sum()) < 200  # nontrivial split


def test_cc_and_lpa_sparse_shuffled_ids(ray_session):
    """Sparse, shuffled node ids (the searchsorted paths must not
    assume density or order)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.linkgraph import (
        connected_components, label_propagation)

    rng = np.random.default_rng(11)
    ids = np.sort(rng.choice(10**9, 120, replace=False)).astype(np.int64)
    rng.shuffle(ids)
    # ring edges inside blocks of 6 -> 20 components
    src, dst = [], []
    for b in range(0, 120, 6):
        blk = ids[b:b + 6]
        for i in range(5):
            src.append(int(blk[i]))
            dst.append(int(blk[i + 1]))
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    edges = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())}))
    cc = (connected_components(docs, edges, node_col="doc_id",
                               method="numpy")
          .to_pandas().sort_values("node").reset_index(drop=True))
    assert len(set(cc["comp"])) == 20
    # every component's label is its min member
    for b in range(0, 120, 6):
        blk = set(int(x) for x in ids[b:b + 6])
        labs = set(int(cc[cc["node"].isin(blk)]["comp"].iloc[i])
                   for i in range(6))
        assert labs == {min(blk)}
    lp = (label_propagation(docs, edges, node_col="doc_id",
                            method="numpy")
          .to_pandas())
    assert set(lp["label"]) <= set(ids.tolist())
