"""Multi-source union-merge (D4): overlay records for one key from
several sources by field-level precedence.

Reference semantics transposed: a re-indexed record overlays the
existing Solr doc — fields present in the new source win, fields only
present in the old doc survive (``Indexer`` re-index + the
``DataRepository`` migration merge; see also ``SolrSearchIndex``
delta handling).  Generalized to N sources with an explicit
precedence order: for every key, for every merge field, the merged
value is the first non-null value scanning sources in precedence
order; rows missing from a higher-precedence source fall through to
lower ones.

Scale shape (same as ``rollup.parent_rollup``): tag each source with
its precedence rank (a constant column — no data movement), union the
Datasets (concatenation, not a shuffle), ONE global sort by
``(key, rank)``, then fully vectorized per-batch partials — one row
per (key, batch) carrying each field's first-non-null value and the
rank it came from via a ``minimum.reduceat`` over null-masked
positions.  After the sort, only a batch's first and last keys can
straddle a boundary, so interior keys bypass the combine entirely and
only the ≤2-per-batch edge partials enter the tiny ``groupby(key)``
min-rank combine.  The shuffle carries one row per (key, source) at
most; no driver-side state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["union_merge", "union_merge_tagged"]


def union_merge(sources, *, key_col: str, merge_cols: list[str]):
    """Merge ``sources`` (a list of Datasets, HIGHEST precedence
    first) into one row per key:

    ``(key, n_records, <merge_cols...>, <col>_src...)`` where each
    merge column holds the first non-null value in precedence order
    and ``<col>_src`` the 0-based rank of the source that supplied it
    (null when every source was null).

    Merge columns are cast to string (the reference's Solr fields are
    stringly typed); the key must be integer-valued.

    When all sources derive from ONE upstream dataset, prefer
    :func:`union_merge_tagged` with a single map_batches that emits
    every source's rows pre-tagged — one read and no N-branch union
    in front of the sort (N small reads each fan out into tiny blocks
    that multiply the sort's fixed orchestration cost).
    """
    if not sources:
        raise ValueError("union_merge needs at least one source")

    def tag(rank: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = [t.column(key_col).cast(pa.int64())]
            names = ["key"]
            for c in merge_cols:
                cols.append(t.column(c).cast(pa.string()))
                names.append(c)
            cols.append(pa.array(np.full(t.num_rows, rank, np.int64)))
            names.append("rank")
            return pa.table(dict(zip(names, cols)))

        return fn

    tagged = [s.map_batches(tag(i), batch_format="pyarrow") for i, s in enumerate(sources)]
    u = tagged[0].union(*tagged[1:]) if len(tagged) > 1 else tagged[0]
    return union_merge_tagged(u, merge_cols=merge_cols)


def union_merge_tagged(u, *, merge_cols: list[str]):
    """Core of :func:`union_merge` over an already-tagged dataset:
    ``u`` has columns ``(key int64, <merge_cols...> string, rank
    int64)`` with rank 0 = highest precedence."""

    part_fields = [("key", pa.int64()), ("n_records", pa.int64())]
    for c in merge_cols:
        part_fields += [(c, pa.string()), (c + "_src", pa.int64())]
    part_fields.append(("edge", pa.bool_()))
    empty = pa.table({n: pa.array([], t) for n, t in part_fields})

    def partials(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return empty
        key = t.column("key").to_numpy()
        rank = t.column("rank").to_numpy()
        new_k = np.ones(n, dtype=bool)
        new_k[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new_k)
        ends = np.append(starts[1:], n)
        edge = np.zeros(starts.size, dtype=bool)
        edge[0] = True
        edge[-1] = True
        out: dict[str, pa.Array] = {
            "key": pa.array(key[starts], pa.int64()),
            "n_records": pa.array(ends - starts, pa.int64()),
        }
        pos = np.arange(n, dtype=np.int64)
        for c in merge_cols:
            col = t.column(c)
            valid = np.asarray(pc.is_valid(col).to_numpy(zero_copy_only=False))
            # first valid position per key segment: null positions are
            # pushed to +inf (=n) and min.reduceat picks the earliest —
            # the batch is (key, rank)-sorted, so earliest == best rank
            masked = np.where(valid, pos, n)
            first = np.minimum.reduceat(masked, starts)
            has = first < n
            idx = pa.array(np.where(has, first, 0), pa.int64())
            vals = col.take(idx) if isinstance(col, pa.Array) else col.combine_chunks().take(idx)
            out[c] = pc.if_else(pa.array(has), vals, pa.scalar(None, pa.string()))
            out[c + "_src"] = pa.array(
                np.where(has, rank[np.where(has, first, 0)], -1), pa.int64()
            ).cast(pa.int64())
            out[c + "_src"] = pc.if_else(
                pa.array(has), out[c + "_src"], pa.scalar(None, pa.int64())
            )
        out["edge"] = pa.array(edge, pa.bool_())
        return pa.table(out)

    parts = (
        u.sort(["key", "rank"])
        .map_batches(partials, batch_format="pyarrow")
        .materialize()  # partials only — one row per (key, batch)
    )

    final_names = ["key", "n_records"] + [
        n for c in merge_cols for n in (c, c + "_src")
    ]

    def finalize_interior(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("edge")))
        return t.select(final_names)

    def pick_edges(t: pa.Table) -> pa.Table:
        return t.filter(t.column("edge"))

    def combine(g: pa.Table) -> pa.Table:
        out = {
            "key": pa.array([g.column("key")[0].as_py()], pa.int64()),
            "n_records": pa.array([pc.sum(g.column("n_records")).as_py()], pa.int64()),
        }
        for c in merge_cols:
            srcs = g.column(c + "_src").to_numpy(zero_copy_only=False)
            valid = np.flatnonzero(~np.isnan(srcs.astype(np.float64)))
            if valid.size:
                best = valid[np.argmin(srcs[valid].astype(np.int64))]
                out[c] = pa.array([g.column(c)[int(best)].as_py()], pa.string())
                out[c + "_src"] = pa.array([int(srcs[best])], pa.int64())
            else:
                out[c] = pa.array([None], pa.string())
                out[c + "_src"] = pa.array([None], pa.int64())
        return pa.table(out)

    interior = parts.map_batches(finalize_interior, batch_format="pyarrow")
    edges = (
        parts.map_batches(pick_edges, batch_format="pyarrow")
        .groupby("key")
        .map_groups(combine, batch_format="pyarrow")
    )
    return interior.union(edges)
