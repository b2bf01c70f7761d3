"""hierarchy_rollup: N-deep chains, up/down field routing
(MetsIndexer.indexAllChildren / EadIndexer transposed — see
stages/hierarchy.py).  The catalog entry is hash-checked against a
recursive-CTE DuckDB oracle in test_catalog.py; these tests pin the
operator semantics directly plus fast-path == distributed-path.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from goobi_viewer_indexer_ray.stages.hierarchy import hierarchy_rollup


def _forest(n: int, *, stride: int = 1, offset: int = 0):
    """Deterministic binary-heap forest over (optionally strided) ids:
    position p's parent is (p-1)//2 for p >= 4; roots at p 0..3."""
    pos = np.arange(n)
    ids = pos * stride + offset
    ppos = np.where(pos >= 4, (pos - 1) // 2, -1)
    parent = np.where(ppos >= 0, ids[np.maximum(ppos, 0)], -1)
    label = [f"L{p}" if p % 3 == 0 else None for p in pos]
    return pa.table(
        {"id": ids, "parent": parent, "label": pa.array(label, pa.string())}
    )


def _run(tbl, **kw):
    import ray.data

    out = hierarchy_rollup(ray.data.from_arrow(tbl), **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def test_small_tree_semantics(ray_session):
    # ids 0..9: roots 0-3; 4->1, 5->2, 6->2, 7->3, 8->3, 9->4->1
    out = _run(_forest(10))
    by = out.set_index("node")
    assert by.loc[0, "depth"] == 0 and by.loc[0, "root_id"] == 0
    assert by.loc[0, "subtree_size"] == 1  # singleton root
    assert by.loc[9, "depth"] == 2 and by.loc[9, "root_id"] == 1
    assert by.loc[9, "path"] == "1/4/9"
    # label present at p%3==0 → 0,3,6,9 labeled; node 9 keeps its own
    assert by.loc[9, "inherited_label"] == "L9"
    # node 4 (no label) inherits from... parent 1 (unlabeled) → None
    assert by.loc[4, "inherited_label"] is None or pd.isna(
        by.loc[4, "inherited_label"]
    )
    # node 7 -> parent 3 labeled L3
    assert by.loc[7, "inherited_label"] == "L3"
    # subtree sizes: node 1's subtree = {1, 4, 9} = 3
    assert by.loc[1, "subtree_size"] == 3
    # total closure consistency: sum(depth+1) == sum(subtree_size)
    assert (out.depth + 1).sum() == out.subtree_size.sum()


def test_distributed_equals_fast(ray_session):
    import ray.data

    tbl = _forest(800, stride=7, offset=3)  # sparse ids
    fast = _run(tbl)
    dist = (
        hierarchy_rollup(
            ray.data.from_arrow(tbl).repartition(6),
            small_tree_threshold=0,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fast, dist[fast.columns].astype({c: fast[c].dtype for c in fast.columns})
    )
    assert fast.depth.max() >= 4  # a real multi-level chain


def test_all_roots(ray_session):
    tbl = pa.table(
        {
            "id": pa.array([5, 6, 7], pa.int64()),
            "parent": pa.array([-1, -1, -1], pa.int64()),
            "label": pa.array(["a", None, "c"], pa.string()),
        }
    )
    out = _run(tbl)
    assert (out.depth == 0).all()
    assert (out.subtree_size == 1).all()
    assert list(out.root_id) == [5, 6, 7]


def test_null_parent_is_root(ray_session):
    tbl = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "parent": pa.array([None, 1], pa.int64()),
            "label": pa.array(["x", None], pa.string()),
        }
    )
    out = _run(tbl).set_index("node")
    assert out.loc[2, "root_id"] == 1
    assert out.loc[2, "inherited_label"] == "x"  # down-routed
    assert out.loc[1, "subtree_size"] == 2  # up-routed


def test_missing_parent_fails_loud(ray_session):
    tbl = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "parent": pa.array([-1, 99], pa.int64()),
            "label": pa.array([None, None], pa.string()),
        }
    )
    with pytest.raises(Exception):
        _run(tbl)


def test_pointer_doubling_equals_peel(ray_session):
    import ray.data

    tbl = _forest(800, stride=7, offset=3)
    fast = _run(tbl)
    dbl = (
        hierarchy_rollup(
            ray.data.from_arrow(tbl).repartition(6),
            small_tree_threshold=0,
            num_partitions=4,
            method="double",
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fast, dbl[fast.columns].astype({c: fast[c].dtype for c in fast.columns})
    )


def test_pointer_doubling_round_bound(ray_session):
    """A 33-deep chain must finish in ~log2(depth) jumps — peel's
    per-level budget (max_rounds=7 < 33) suffices for doubling."""
    import ray.data

    n = 34  # pure chain: node i's parent is i-1
    ids = np.arange(n, dtype=np.int64)
    parent = ids - 1
    tbl = pa.table(
        {
            "id": ids,
            "parent": parent,
            "label": pa.array([None] * n, pa.string()),
        }
    )
    out = (
        hierarchy_rollup(
            ray.data.from_arrow(tbl),
            small_tree_threshold=0,
            num_partitions=2,
            max_rounds=7,  # 2^6 = 64 > 33; peel would need 33 rounds
            method="double",
        )
        .to_pandas()
        .set_index("node")
    )
    assert out.loc[n - 1, "depth"] == n - 1
    assert out.loc[n - 1, "root_id"] == 0
    assert out.loc[0, "subtree_size"] == n
    assert out.loc[n - 1, "path"] == "/".join(map(str, range(n)))


def test_missing_parent_fails_loud_distributed(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "parent": pa.array([-1, 99], pa.int64()),
            "label": pa.array([None, None], pa.string()),
        }
    )
    for method in ("peel", "double"):
        with pytest.raises((ValueError, Exception)):
            hierarchy_rollup(
                ray.data.from_arrow(tbl), small_tree_threshold=0,
                num_partitions=2, method=method,
            ).to_pandas()


def test_missing_parent_above_all_ids(ray_session):
    """Dangling parent sorting ABOVE every node id must raise the
    loud ValueError, not an IndexError (review finding)."""
    tbl = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "parent": pa.array([-1, 99], pa.int64()),
            "label": pa.array([None, None], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="parent id not in node table"):
        _run(tbl)
