"""Multi-level hierarchy inheritance — N-deep docstruct chains.

Reference semantics transposed (NOT one-level like
:func:`stages.rollup.parent_rollup`):

- ``MetsIndexer.indexAllChildren`` (``MetsIndexer.java:1546-1732``)
  walks arbitrary-depth docstruct trees, routing fields BOTH ways:
  inheritable metadata / access conditions flow DOWN from ancestors to
  every descendant, while child fields roll UP into ancestors;
- ``EadIndexer.indexAllChildren`` (``EadIndexer.java:341-372``)
  recurses the same way over EAD node trees;
- each doc records its ancestry (``PI_TOPSTRUCT``, ``PI_PARENT``, the
  logical docstruct path).

Generic Ray-Data operator over a flat ``(id, parent, label)`` node
table (``parent = -1`` or null marks a root; every other ``parent``
must be a valid ``id``):

``hierarchy_rollup(nodes)`` → one row per node:

- ``root_id``   — the chain's top ancestor (``PI_TOPSTRUCT`` analog),
- ``depth``     — #edges to the root,
- ``path``      — ``root/.../node`` id path (logical docstruct path),
- ``inherited_label`` — nearest non-null ``label`` walking UP from the
  node itself (the down-routed inheritable field: access conditions /
  inherited metadata),
- ``subtree_size`` — #nodes in the subtree rooted at the node,
  including itself (the up-routed roll-up; ``NUMVOLUMES`` generalized
  to every level of the tree).

Scale shape
-----------

Two paths, same contract (mirroring ``stages/cluster.py``):

- **fast path** (≤ ``small_tree_threshold`` nodes): the node table is
  the documented small side — one driver-side vectorized numpy chain
  walk (one gather per level), O(N · depth) total.
- **distributed paths** (selected by ``method``): the default
  ``"peel"`` climbs one level per round — ONE hash-partitioned
  ``Dataset.join`` of the still-climbing state rows against a
  pre-built ``(id → parent, label(parent), parent(parent))`` map;
  O(depth) rounds of O(N_active) shuffle with the active set
  SHRINKING as chains hit their roots.  Depth is small by
  construction for docstruct trees (METS / EAD hierarchies are
  ≤ ~10 deep — the reference recurses them on one thread).  For
  pathological deep chains, ``method="double"`` runs pointer doubling
  (:func:`_distributed_double`): each round jumps ``anc → anc(anc)``
  via one state self-join, folding path/label/depth segment-wise —
  ⌈log₂ depth⌉ rounds (pytest pins a 33-deep chain finishing within a
  7-round budget, and output identity with peel/fast).

Subtree sizes come from the ancestor CLOSURE (one row per
(node, ancestor-or-self) pair, O(N · depth) — emitted incrementally by
the same loop, never re-walked) aggregated with ONE
``groupby(ancestor).count()`` — the same closure a recursive SQL CTE
materializes, so the DuckDB oracle checks it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["hierarchy_rollup"]


def _fast_path(ids: np.ndarray, parents: np.ndarray, labels: list,
               max_rounds: int) -> pa.Table:
    """Driver-side vectorized chain walk (node table ≤ threshold)."""
    order = np.argsort(ids, kind="stable")
    sid = ids[order]
    spar = parents[order]

    def up(x: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(sid, x)
        # clamp before the gather: a dangling id above every node id
        # must raise the loud ValueError, not a raw IndexError
        safe = np.minimum(pos, sid.size - 1)
        if not ((pos < sid.size) & (sid[safe] == x)).all():
            raise ValueError("hierarchy_rollup: parent id not in node table")
        return spar[pos]

    n = ids.size
    cur = ids.copy()
    alive = np.ones(n, dtype=bool)
    chains = [cur.copy()]  # chains[k][i] = ancestor at distance k (-1 past root)
    for _ in range(max_rounds):
        p = np.full(n, -1, np.int64)
        p[alive] = up(cur[alive])
        alive = p >= 0
        if not alive.any():
            break
        cur = np.where(alive, p, cur)
        chains.append(p.copy())
    else:
        raise RuntimeError(f"hierarchy_rollup: chain deeper than {max_rounds}")

    mat = np.stack(chains)  # (L, n)
    valid = mat >= 0
    depth = valid.sum(axis=0) - 1
    root = mat[depth, np.arange(n)]

    # subtree size: every (node, ancestor-or-self) closure entry counts
    # 1 toward its ancestor — one unique-count over the closure (ids
    # may be sparse/strided, so no dense bincount)
    anc_ids = mat[valid]
    u, c = np.unique(anc_ids, return_counts=True)
    subtree = c[np.searchsorted(u, ids)]  # every node self-appears

    lab_by_id = {int(i): v for i, v in zip(ids, labels)}
    paths, inh = [], []
    for col in range(n):
        chain = mat[: depth[col] + 1, col]  # node .. root
        paths.append("/".join(str(int(c)) for c in chain[::-1]))
        v = None
        for c in chain:  # nearest non-null label, own first (down routing)
            lv = lab_by_id[int(c)]
            if lv is not None:
                v = lv
                break
        inh.append(v)

    return pa.table(
        {
            "node": pa.array(ids, pa.int64()),
            "root_id": pa.array(root, pa.int64()),
            "depth": pa.array(depth.astype(np.int64), pa.int64()),
            "path": pa.array(paths, pa.string()),
            "inherited_label": pa.array(inh, pa.string()),
            "subtree_size": pa.array(subtree.astype(np.int64), pa.int64()),
        }
    )


def _split_done(t: pa.Table, want_done: bool) -> pa.Table:
    m = t.column("done")
    return t.filter(m if want_done else pc.invert(m))


def hierarchy_rollup(nodes, *, id_col: str = "id", parent_col: str = "parent",
                     label_col: str = "label", num_partitions: int = 8,
                     max_rounds: int = 64,
                     small_tree_threshold: int = 1_000_000,
                     method: str = "peel"):
    """Nodes ``(id, parent, label)`` → per-node hierarchy fields.

    Returns a Dataset with columns ``(node, root_id, depth, path,
    inherited_label, subtree_size)`` — see module docstring.

    ``method`` selects the distributed strategy (identical output,
    pytest-pinned): ``"peel"`` climbs one level per round — O(depth)
    rounds whose shuffle volume SHRINKS as chains finish (right for
    the shallow docstruct trees the reference indexes); ``"double"``
    is pointer doubling — each round jumps ``anc → anc(anc)`` via one
    state self-join, folding path/label/depth segment-wise, so only
    ⌈log₂ depth⌉ rounds of full-size shuffles (right for pathological
    deep chains, where peeling's depth×shuffle count dominates)."""
    import ray
    import ray.data

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": t.column(id_col).cast(pa.int64()),
                "parent": pc.fill_null(t.column(parent_col).cast(pa.int64()), -1),
                "label": t.column(label_col).cast(pa.string()),
            }
        )

    nt = nodes.map_batches(norm, batch_format="pyarrow").materialize()

    if nt.count() <= small_tree_threshold:
        tbl = pa.concat_tables(nt.iter_batches(batch_format="pyarrow", batch_size=None))
        return ray.data.from_arrow(
            _fast_path(
                tbl.column("id").to_numpy(),
                tbl.column("parent").to_numpy(),
                tbl.column("label").to_pylist(),
                max_rounds,
            )
        )

    if method == "double":
        return _distributed_double(nt, num_partitions, max_rounds)
    if method != "peel":
        raise ValueError(f"unknown method: {method!r}")

    # ------------- distributed level-by-level ancestor peeling -------------
    # Lookup map, built ONCE with one self-join: for child id `pid`,
    # its parent, the PARENT's label (folded into inh on arrival), and
    # the parent's parent (-1 ⇔ arriving row is done).  Root rows
    # (parent = -1) are excluded — the loop never looks them up.
    def left_side(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater_equal(t.column("parent"), 0))
        return pa.table({"pid": keep.column("id"), "parent": keep.column("parent")})

    def right_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rid": t.column("id"),
                "rparent": t.column("parent"),
                "rlabel": t.column("label"),
            }
        )

    pmap = (
        nt.map_batches(left_side, batch_format="pyarrow")
        .join(
            nt.map_batches(right_side, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("parent",),
            right_on=("rid",),
        )
        .repartition(num_partitions)
        .materialize()
    )

    def seed(t: pa.Table) -> pa.Table:
        ids = t.column("id")
        return pa.table(
            {
                "node": ids,
                "cur": ids,
                "depth": pa.array(np.zeros(t.num_rows, np.int64)),
                "path": pc.cast(ids, pa.string()),
                "inh": t.column("label"),
                "done": pc.equal(t.column("parent"), -1),
            }
        )

    state = (
        nt.map_batches(seed, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    # ancestor closure: (anc) rows; every node contributes itself first
    closures = [
        state.map_batches(
            lambda t: pa.table({"anc": t.column("node")}), batch_format="pyarrow"
        ).materialize()
    ]

    def step(t: pa.Table) -> pa.Table:
        # joined columns: state row + (pid, parent, rparent, rlabel)
        return pa.table(
            {
                "node": t.column("node"),
                "cur": t.column("parent"),
                "depth": pc.add(t.column("depth"), 1),
                "path": pc.binary_join_element_wise(
                    pc.cast(t.column("parent"), pa.string()), t.column("path"), "/"
                ),
                "inh": pc.coalesce(t.column("inh"), t.column("rlabel")),
                "done": pc.equal(t.column("rparent"), -1),
            }
        )

    for _ in range(max_rounds):
        active = state.map_batches(
            lambda t: _split_done(t, False), batch_format="pyarrow"
        )
        if active.count() == 0:
            break
        settled = state.map_batches(
            lambda t: _split_done(t, True), batch_format="pyarrow"
        )
        stepped = active.join(
            pmap,
            join_type="inner",
            num_partitions=num_partitions,
            on=("cur",),
            right_on=("pid",),
        ).map_batches(step, batch_format="pyarrow").materialize()
        # every stepped row reached a NEW ancestor this round (its new
        # cur) — exactly one closure row each, no re-emission
        closures.append(
            stepped.map_batches(
                lambda t: pa.table({"anc": t.column("cur")}),
                batch_format="pyarrow",
            )
        )
        state = settled.union(stepped).repartition(num_partitions).materialize()
    else:
        raise RuntimeError(f"hierarchy_rollup: no fixpoint in {max_rounds} rounds")

    # a dangling parent id silently drops its row from the inner join —
    # surface it loudly, matching the fast path's ValueError
    if state.count() != nt.count():
        raise ValueError("hierarchy_rollup: parent id not in node table")

    closure = closures[0]
    for c in closures[1:]:
        closure = closure.union(c)
    sizes = closure.groupby("anc").count()

    def rename_sizes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "anc": t.column("anc").cast(pa.int64()),
                "subtree_size": t.column("count()").cast(pa.int64()),
            }
        )

    sizes = sizes.map_batches(rename_sizes, batch_format="pyarrow")

    def as_final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "root_id": t.column("cur"),
                "depth": t.column("depth"),
                "path": t.column("path"),
                "inherited_label": t.column("inh"),
            }
        )

    final = state.map_batches(as_final, batch_format="pyarrow")
    out = final.join(
        sizes,
        join_type="inner",
        num_partitions=num_partitions,
        on=("node",),
        right_on=("anc",),
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "root_id": t.column("root_id").cast(pa.int64()),
                "depth": t.column("depth").cast(pa.int64()),
                "path": t.column("path"),
                "inherited_label": t.column("inherited_label"),
                "subtree_size": t.column("subtree_size").cast(pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def _distributed_double(nt, num_partitions: int, max_rounds: int):
    """Pointer doubling: state row = the path SEGMENT a node has
    covered so far.

    Invariants (``seg`` is top-first, "…/node"):

    - done row: covers node..root inclusive — ``anc`` = the root,
      ``seg`` = the full root-first id path, ``inh`` = first non-null
      label over the whole chain, ``depth`` = edge count to the root.
    - active row: covers node..just-below-``anc`` — ``seg``/``inh``
      exclude ``anc``'s id/label, ``depth`` = edges node→``anc``.

    Jump: join active rows against the WHOLE state on
    ``anc == partner.node`` and splice::

        anc   ← partner.anc          depth ← depth + partner.depth
        seg   ← partner.seg "/" seg  inh   ← coalesce(inh, partner.inh)
        done  ← partner.done

    Both invariants are preserved, the covered distance doubles, so
    ⌈log₂ depth⌉ rounds finish every chain.  Subtree sizes come from
    splitting the final paths (each path enumerates exactly the
    (node, ancestor-or-self) closure) — one vectorized split pass and
    one ``groupby(anc).count()``, same closure volume as peeling.
    """
    import ray

    def seed(t: pa.Table) -> pa.Table:
        ids = t.column("id")
        par = t.column("parent")
        is_root = pc.equal(par, -1)
        return pa.table(
            {
                "node": ids,
                "anc": pc.if_else(is_root, ids, par),
                "depth": pc.if_else(
                    is_root,
                    pa.array(np.zeros(t.num_rows, np.int64)),
                    pa.array(np.ones(t.num_rows, np.int64)),
                ),
                "seg": pc.cast(ids, pa.string()),
                "inh": t.column("label"),
                "done": is_root,
            }
        )

    state = (
        nt.map_batches(seed, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )

    def partner_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_node": t.column("node"),
                "p_anc": t.column("anc"),
                "p_depth": t.column("depth"),
                "p_seg": t.column("seg"),
                "p_inh": t.column("inh"),
                "p_done": t.column("done"),
            }
        )

    def splice(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "anc": t.column("p_anc"),
                "depth": pc.add(t.column("depth"), t.column("p_depth")),
                "seg": pc.binary_join_element_wise(
                    t.column("p_seg"), t.column("seg"), "/"
                ),
                "inh": pc.coalesce(t.column("inh"), t.column("p_inh")),
                "done": t.column("p_done"),
            }
        )

    for _ in range(max_rounds):
        active = state.map_batches(
            lambda t: _split_done(t, False), batch_format="pyarrow"
        )
        if active.count() == 0:
            break
        settled = state.map_batches(
            lambda t: _split_done(t, True), batch_format="pyarrow"
        )
        partners = state.map_batches(partner_side, batch_format="pyarrow")
        jumped = active.join(
            partners,
            join_type="inner",  # anc is always a valid node id
            num_partitions=num_partitions,
            on=("anc",),
            right_on=("p_node",),
        ).map_batches(splice, batch_format="pyarrow")
        state = settled.union(jumped).repartition(num_partitions).materialize()
    else:
        raise RuntimeError(f"hierarchy_rollup: no fixpoint in {max_rounds} rounds")

    # a dangling parent id silently drops its row from the inner join —
    # surface it loudly, matching the fast path's ValueError
    if state.count() != nt.count():
        raise ValueError("hierarchy_rollup: parent id not in node table")

    # ancestor closure from the final paths: one vectorized split pass
    def closure_rows(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("seg"), "/").combine_chunks()
        flat = pc.cast(parts.values, pa.int64())
        return pa.table({"anc": flat})

    sizes = (
        state.map_batches(closure_rows, batch_format="pyarrow")
        .groupby("anc")
        .count()
    )

    def rename_sizes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "anc": t.column("anc").cast(pa.int64()),
                "subtree_size": t.column("count()").cast(pa.int64()),
            }
        )

    sizes = sizes.map_batches(rename_sizes, batch_format="pyarrow")

    def as_final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "root_id": t.column("anc"),
                "depth": t.column("depth"),
                "path": t.column("seg"),
                "inherited_label": t.column("inh"),
            }
        )

    out = state.map_batches(as_final, batch_format="pyarrow").join(
        sizes,
        join_type="inner",
        num_partitions=num_partitions,
        on=("node",),
        right_on=("anc",),
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "root_id": t.column("root_id").cast(pa.int64()),
                "depth": t.column("depth").cast(pa.int64()),
                "path": t.column("path"),
                "inherited_label": t.column("inherited_label"),
                "subtree_size": t.column("subtree_size").cast(pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")
