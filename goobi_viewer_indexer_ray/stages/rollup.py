"""Hierarchical parent roll-up — the volume↔anchor join family (J2/A2).

Reference semantics transposed:

- ``MetsIndexer.anchorMerge`` (``MetsIndexer.java:1157-1228``) reloads
  an anchor record and rebuilds it from its volumes' fields, with the
  volume list sorted by the numeric ``CURRENTNOSORT`` key
  (``MetsIndexer.java:1185-1199``, ``collectVolumeInfo :1244-1310``);
- ``addSuperSearchFields`` (``AbstractWriteStrategy.java:201-218``)
  appends each child doc's DEFAULT/FULLTEXT to the root doc's
  ``SUPERDEFAULT``/``SUPERFULLTEXT``;
- ``NUMVOLUMES`` (``MetsIndexer.java:446-456``) counts volumes per
  anchor; ``ORDERLABELFIRST``/``ORDERLABELLAST``
  (``MetsIndexer.java:571-583``) carry the first/last child labels.

Generic Ray-Data operator: child rows grouped by a parent key; per
parent → child count, the ordered child-key list, the ordered rolled-up
"super" field, and min/max of the sort key.

Scale shape (same as the sessions operator): ONE global sort by
``(parent, sort_key)`` → fully vectorized per-batch partials (one
partial row per parent PER BATCH — segment boundaries via diff, ordered
C-level string joins on slices) → a tiny ``groupby(parent)`` combine
over the few partials per parent, stitched in sort-key order.  The
shuffle carries one row per (parent, batch), never one per child; no
task ever holds more than one batch of children plus one parent's
partials (the reference's own assumption: one anchor's volume list fits
in memory, ``MetsIndexer.collectVolumeInfo``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parent_rollup"]


def parent_rollup(ds, *, parent_col: str, order_col: str, rollup_col: str,
                  key_sep: str = ",", rollup_sep: str = " "):
    """children → one row per parent:

    ``(parent, num_children, first_key, last_key, child_keys,
    super_rollup)`` where ``child_keys`` = the ``order_col`` values in
    ascending order joined by ``key_sep`` (the anchor's sorted volume
    list) and ``super_rollup`` = the ``rollup_col`` values in the same
    order joined by ``rollup_sep`` (the SUPERDEFAULT bag).

    ``order_col`` must be integer-valued (the CURRENTNOSORT analog);
    ``rollup_col`` is a string column.
    """

    empty = pa.table(
        {
            "parent": pa.array([], pa.int64()),
            "n_children": pa.array([], pa.int64()),
            "first_key": pa.array([], pa.int64()),
            "last_key": pa.array([], pa.int64()),
            "child_keys": pa.array([], pa.string()),
            "super_rollup": pa.array([], pa.string()),
            "edge": pa.array([], pa.bool_()),
        }
    )

    def partials(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return empty
        parent = t.column(parent_col).cast(pa.int64()).to_numpy()
        key = t.column(order_col).cast(pa.int64()).to_numpy()
        labels = t.column(rollup_col).to_pylist()
        new_p = np.ones(n, dtype=bool)
        new_p[1:] = parent[1:] != parent[:-1]
        starts = np.flatnonzero(new_p)
        ends = np.append(starts[1:], n)
        key_strs = key.astype(np.str_)  # vectorized int→str
        # after the global (parent, key) sort each batch is a contiguous
        # slice, so ONLY the batch's first and last parents can straddle
        # a batch boundary — every interior parent is already complete
        edge = np.zeros(starts.size, dtype=bool)
        edge[0] = True
        edge[-1] = True
        return pa.table(
            {
                "parent": pa.array(parent[starts], pa.int64()),
                "n_children": pa.array(ends - starts, pa.int64()),
                "first_key": pa.array(key[starts], pa.int64()),
                "last_key": pa.array(key[ends - 1], pa.int64()),
                "child_keys": pa.array(
                    [key_sep.join(key_strs[s:e]) for s, e in zip(starts, ends)],
                    pa.string(),
                ),
                "super_rollup": pa.array(
                    [rollup_sep.join(labels[s:e]) for s, e in zip(starts, ends)],
                    pa.string(),
                ),
                "edge": pa.array(edge, pa.bool_()),
            }
        )

    # materialize ONLY the partial rows (one row per (parent, batch) —
    # tiny vs the child table) so the interior/edge split below doesn't
    # recompute the sort twice
    parts = (
        ds.sort([parent_col, order_col])
        .map_batches(partials, batch_format="pyarrow")
        .materialize()
    )

    def finalize_interior(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("edge")))
        return pa.table(
            {
                "parent": t.column("parent"),
                "num_children": t.column("n_children"),
                "first_key": t.column("first_key"),
                "last_key": t.column("last_key"),
                "child_keys": t.column("child_keys"),
                "super_rollup": t.column("super_rollup"),
            }
        )

    def pick_edges(t: pa.Table) -> pa.Table:
        return t.filter(t.column("edge"))

    def combine(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g.column("first_key"))
        g = g.take(order)
        keys = g.column("child_keys").to_pylist()
        sups = g.column("super_rollup").to_pylist()
        return pa.table(
            {
                "parent": pa.array([g.column("parent")[0].as_py()], pa.int64()),
                "num_children": pa.array(
                    [pc.sum(g.column("n_children")).as_py()], pa.int64()
                ),
                "first_key": pa.array([g.column("first_key")[0].as_py()], pa.int64()),
                "last_key": pa.array([g.column("last_key")[-1].as_py()], pa.int64()),
                "child_keys": pa.array([key_sep.join(keys)], pa.string()),
                "super_rollup": pa.array([rollup_sep.join(sups)], pa.string()),
            }
        )

    # interior parents bypass the combine shuffle entirely; only the
    # ≤2-per-batch edge partials enter the per-parent combine
    interior = parts.map_batches(finalize_interior, batch_format="pyarrow")
    edges = (
        parts.map_batches(pick_edges, batch_format="pyarrow")
        .groupby("parent")
        .map_groups(combine, batch_format="pyarrow")
    )
    return interior.union(edges)
