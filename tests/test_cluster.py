"""Connected components: min-label propagation over join+groupby."""

import pyarrow as pa
import pytest
import ray.data

from goobi_viewer_indexer_ray.stages.cluster import connected_components


def _run(nodes, edges, **kw):
    # default to the distributed loop (threshold 0) so these tests pin
    # the propagation path; the union-find fast path has its own test
    kw.setdefault("small_graph_threshold", 0)
    nds = ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    eds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    out = connected_components(nds, eds, num_partitions=2, **kw)
    return {r["node"]: r["cluster_id"] for r in out.take_all()}


def test_chain_clique_singleton():
    # chain 1-2-3-4, clique {10,11,12}, singleton 99
    nodes = [1, 2, 3, 4, 10, 11, 12, 99]
    edges = [(2, 1), (2, 3), (4, 3), (10, 11), (11, 12), (12, 10)]
    lbl = _run(nodes, edges)
    assert lbl == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_long_path_converges():
    # a 12-hop path needs multiple propagation rounds
    nodes = list(range(13))
    edges = [(i, i + 1) for i in range(12)]
    lbl = _run(nodes, edges)
    assert set(lbl.values()) == {0}


def test_duplicate_and_reversed_edges():
    nodes = [5, 6, 7]
    edges = [(6, 5), (5, 6), (6, 7), (6, 7)]
    lbl = _run(nodes, edges)
    assert lbl == {5: 5, 6: 5, 7: 5}


def test_fast_path_matches_distributed_and_sizes():
    nodes = [1, 2, 3, 4, 10, 11, 12, 99]
    edges = [(2, 1), (2, 3), (4, 3), (10, 11), (11, 12), (12, 10)]
    slow = _run(nodes, edges)
    fast = _run(nodes, edges, small_graph_threshold=10_000)
    assert fast == slow
    # sizes via the broadcast map
    nds = ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    eds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    out = connected_components(nds, eds, with_size=True)
    sz = {r["node"]: r["cluster_size"] for r in out.take_all()}
    assert sz == {1: 4, 2: 4, 3: 4, 4: 4, 10: 3, 11: 3, 12: 3, 99: 1}


def test_distributed_broadcast_assignment():
    nodes = [1, 2, 3, 7]
    edges = [(2, 1), (2, 3)]
    lbl = _run(nodes, edges, assign="broadcast", small_graph_threshold=0)
    assert lbl == {1: 1, 2: 1, 3: 1, 7: 7}


def test_no_edges_all_singletons():
    lbl = _run([3, 8, 12], [])
    assert lbl == {3: 3, 8: 8, 12: 12}


def test_round_cap_raises():
    nodes = list(range(40))
    edges = [(i, i + 1) for i in range(39)]
    with pytest.raises(RuntimeError):
        _run(nodes, edges, max_rounds=3)
