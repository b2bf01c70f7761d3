"""Connected components: min-label propagation over join+groupby."""

import pyarrow as pa
import pytest
import ray.data

from goobi_viewer_indexer_ray.stages.cluster import connected_components


def _run(nodes, edges, **kw):
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


def test_no_edges_all_singletons():
    lbl = _run([3, 8, 12], [])
    assert lbl == {3: 3, 8: 8, 12: 12}


def test_round_cap_raises():
    nodes = list(range(40))
    edges = [(i, i + 1) for i in range(39)]
    with pytest.raises(RuntimeError):
        _run(nodes, edges, max_rounds=3)
