"""Temporal join operators Ray Data lacks natively (driver brief:
"as-of join, range join, windowed aggregate ... implement as a
composition of map_batches + groupby().map_groups + sort if semantics
allow").

:func:`asof_join` — for every probe row, the latest build row of the
same key whose timestamp is before (``strict``) or at-or-before the
probe's.  Composition: select minimal columns per side → tag → union →
ONE ``groupby(key)`` shuffle → per-group vectorized ``searchsorted``.

Partitioning assumption (documented per SURVEY.md §2.10): one key's
rows fit a reduce task — keys are entity-level logs (user/customer
histories), the same assumption the sessionization operator makes.  A
pathological hot key would need doc-range salting with boundary
stitching (the pattern ``events_sessions``' batch partials already
demonstrate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["asof_join", "band_join"]


def _tag_side(key: str, ts_col: str, id_col: str, side: int):
    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column(key).cast(pa.int64()),
                "ts": t.column(ts_col).cast(pa.int64()),
                "rid": t.column(id_col).cast(pa.int64()),
                "side": pa.array(np.full(t.num_rows, side, np.int8)),
            }
        )

    return f


def asof_join(probe, build, *, on: str, ts_col: str, probe_id: str,
              build_id: str, strict: bool = True):
    """(probe_id, build_id) pairs: per probe row, the latest build row
    of the same ``on`` key with ``ts < probe.ts`` (``strict=True``) or
    ``ts ≤ probe.ts``.  Ties on build ts break to the larger build id.
    Probe rows with no qualifying build row are dropped (inner as-of).
    """
    p = probe.map_batches(_tag_side(on, ts_col, probe_id, 1), batch_format="pyarrow")
    b = build.map_batches(_tag_side(on, ts_col, build_id, 0), batch_format="pyarrow")
    side = "left" if strict else "right"

    def join_group(g: pa.Table) -> pa.Table:
        sides = g.column("side").to_numpy()
        ts = g.column("ts").to_numpy()
        rid = g.column("rid").to_numpy()
        bm = sides == 0
        if not bm.any() or bm.all():
            return pa.table(
                {"probe_id": pa.array([], pa.int64()), "build_id": pa.array([], pa.int64())}
            )
        b_ts, b_id = ts[bm], rid[bm]
        order = np.lexsort((b_id, b_ts))  # (ts, id) asc → last index = tie-winner
        b_ts, b_id = b_ts[order], b_id[order]
        p_ts, p_id = ts[~bm], rid[~bm]
        idx = np.searchsorted(b_ts, p_ts, side=side) - 1
        keep = idx >= 0
        return pa.table(
            {
                "probe_id": pa.array(p_id[keep], pa.int64()),
                "build_id": pa.array(b_id[idx[keep]], pa.int64()),
            }
        )

    return p.union(b).groupby("key").map_groups(join_group, batch_format="pyarrow")


def band_join(ds, *, value_col: str, id_col: str, width: float):
    """Range (band) self-join: all id pairs (a < b) with
    ``|v_a − v_b| ≤ width`` — the brief's "range join" expressed as
    bucket blocking + one ``groupby(bucket)``.

    Each row replicates to buckets ``⌊v/width⌋`` and ``⌊v/width⌋+1``;
    a qualifying pair's own-buckets differ by ≤ 1, so the pair is
    co-located in exactly one OWNED group (``max(own_a, own_b)``) —
    no dedup shuffle.  Per group: sort by value, sliding-window pair
    ranges via ``searchsorted`` (vectorized, no O(n²) scan when the
    band is selective).  Skew note: a band with k rows emits O(k·m)
    pairs (m = matches per row) in one task — pick ``width`` so bands
    are selective, exactly like choosing an LSH band count.
    """

    def replicate(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy().astype(np.float64)
        rid = t.column(id_col).cast(pa.int64()).to_numpy()
        own = np.floor(v / width).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(np.concatenate([own, own + 1])),
                "v": pa.array(np.concatenate([v, v])),
                "rid": pa.array(np.concatenate([rid, rid])),
                "own": pa.array(np.concatenate([own, own])),
            }
        )

    def emit(g: pa.Table) -> pa.Table:
        gb = int(g.column("bucket")[0].as_py())
        v = g.column("v").to_numpy()
        rid = g.column("rid").to_numpy()
        own = g.column("own").to_numpy()
        order = np.argsort(v, kind="stable")
        v, rid, own = v[order], rid[order], own[order]
        hi = np.searchsorted(v, v + width, side="right")
        counts = hi - np.arange(v.size) - 1
        if counts.sum() <= 0:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        i = np.repeat(np.arange(v.size), counts)
        j = np.concatenate([np.arange(k + 1, h) for k, h in enumerate(hi)]) if v.size else i
        keep = np.maximum(own[i], own[j]) == gb  # ownership → global uniqueness
        i, j = i[keep], j[keep]
        a = np.minimum(rid[i], rid[j])
        b = np.maximum(rid[i], rid[j])
        keep2 = a != b
        return pa.table(
            {"id_a": pa.array(a[keep2], pa.int64()), "id_b": pa.array(b[keep2], pa.int64())}
        )

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )
