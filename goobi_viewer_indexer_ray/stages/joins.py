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

__all__ = ["asof_join"]


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
