"""Coordinate-string → WKT conversion (M13).

Transposes ``helper/GeoJSONTools.java``: ``convert`` (``:69``) routes a
raw coordinate string by sniffed type (``getCoordinatesType`` ``:395``)
to a point or polygon geometry (``:161``, ``:189``), emitting the WKT
search field and the ``BOOL_WKT_COORDS`` existence flag the reference
attaches to every record with usable coordinates.

Pure per-value parser + a vectorizable ``map_batches`` wrapper:

- ``"x y"``                     → ``POINT (x y)``
- ``"x1 y1 x2 y2 ... xn yn"``   → ``POLYGON ((x1 y1, ..., x1 y1))``
  (ring closed if the input doesn't repeat the first point)
- anything else                 → type ``unknown``, empty WKT,
  ``bool_wkt='false'`` (the reference's no-coords path).

Numbers are emitted integer-formatted when integral (``"12"`` not
``"12.0"``) so the output is reproducible by an ANSI-SQL oracle's
string construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["coords_type", "convert_coords", "GeoConvert"]


def _fmt(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(float(v))


def coords_type(value: str) -> str:
    """Sniff a coordinate string (GeoJSONTools.getCoordinatesType):
    2 numbers → 'point'; ≥6 numbers, even count → 'polygon';
    else 'unknown'."""
    toks = (value or "").split()
    try:
        nums = [float(t) for t in toks]
    except ValueError:
        return "unknown"
    if len(nums) == 2:
        return "point"
    if len(nums) >= 6 and len(nums) % 2 == 0:
        return "polygon"
    return "unknown"


def convert_coords(value: str) -> tuple[str, str, int, float, float, float, float, str]:
    """Coordinate string → (geo_type, wkt, n_points, minx, miny, maxx,
    maxy, bool_wkt).  Unknown input → ('unknown', '', 0, 0, 0, 0, 0,
    'false') — the no-coordinates record path."""
    kind = coords_type(value)
    if kind == "unknown":
        return ("unknown", "", 0, 0.0, 0.0, 0.0, 0.0, "false")
    nums = [float(t) for t in value.split()]
    pts = list(zip(nums[0::2], nums[1::2]))
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    if kind == "point":
        wkt = f"POINT ({_fmt(xs[0])} {_fmt(ys[0])})"
        return ("point", wkt, 1, xs[0], ys[0], xs[0], ys[0], "true")
    if pts[0] != pts[-1]:  # close the ring
        pts = pts + [pts[0]]
    body = ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)
    return ("polygon", f"POLYGON (({body}))", len(pts),
            min(xs), min(ys), max(xs), max(ys), "true")


class GeoConvert:
    """``map_batches`` stage: a coordinate-string column → the WKT
    output columns.  Stateless per batch (string parsing is the
    operator — there is no array kernel for free-form coord strings,
    exactly as the reference walks each string in Java)."""

    def __init__(self, coords_col: str, id_col: str):
        self.coords_col = coords_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        vals = t.column(self.coords_col).to_pylist()
        rows = [convert_coords(v) for v in vals]
        kinds, wkts, npts, minx, miny, maxx, maxy, flags = (
            zip(*rows) if rows else ((),) * 8
        )
        return pa.table(
            {
                self.id_col: t.column(self.id_col).cast(pa.int64()),
                "geo_type": pa.array(kinds, pa.string()),
                "wkt": pa.array(wkts, pa.string()),
                "n_points": pa.array(np.asarray(npts, dtype=np.int64), pa.int64()),
                "bbox_minx": pa.array(np.asarray(minx, dtype=np.float64)),
                "bbox_miny": pa.array(np.asarray(miny, dtype=np.float64)),
                "bbox_maxx": pa.array(np.asarray(maxx, dtype=np.float64)),
                "bbox_maxy": pa.array(np.asarray(maxy, dtype=np.float64)),
                "bool_wkt": pa.array(flags, pa.string()),
            }
        )


# ------------------------------------------------------------- geofilt

def geo_radius_topk(ds, queries, *, k: int = 10,
                    x_col: str = "x", y_col: str = "y",
                    id_col: str = "doc_id"):
    """Spatial radius search — the ``{!geofilt sfield=WKT_COORDS
    pt=... d=...}&sort=geodist() asc`` query the viewer issues against
    the coordinate fields this indexer writes (reference:
    ``GeoJSONTools.java`` emits the searchable geo fields;
    the filter/sort half lives in Solr's spatial component, which this
    engine owns here).

    Per query ``(query_id, cx, cy, r)``: every point within radius r of
    (cx, cy), ranked by distance asc (id asc tiebreak), top ``k``, plus
    the exact within-radius count (Solr's ``numFound``).

    Metric: SQUARED EUCLIDEAN IN INTEGER COORDINATE SPACE — the
    deterministic stand-in for haversine meters.  All arithmetic is
    int64, so every distance, rank, tie, and count is bit-exact under
    any partitioning and replayable by an ANSI-SQL oracle (haversine's
    float trig would make near-boundary verdicts platform-lottery).

    Scale shape: the query list rides the closure (a handful of ints);
    ONE streamed pass over (id, x, y) emits ≤ k candidate rows plus one
    count partial per query per batch; the final fold sees
    O(queries · batches · k) rows — never the matched set.  At 10¹²
    docs the same pass would read a Hilbert/geohash-partitioned point
    store and prune batches by bbox before the distance kernel.

    Returns an Arrow table ``(query_id, rank, doc_id, dist2, n_found)``
    sorted by (query_id, rank).
    """
    import pyarrow as pa

    qs = [(int(q), int(cx), int(cy), int(r)) for q, cx, cy, r in queries]

    def part(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        xs = t.column(x_col).to_numpy().astype(np.int64, copy=False)
        ys = t.column(y_col).to_numpy().astype(np.int64, copy=False)
        out_q, out_d, out_dist = [], [], []
        for qid, cx, cy, r in qs:
            dx = xs - cx
            dy = ys - cy
            d2 = dx * dx + dy * dy
            hit = d2 <= r * r
            n_hit = int(hit.sum())
            if n_hit:
                d_h, dist_h = ids[hit], d2[hit]
                order = np.lexsort((d_h, dist_h))[:k]
                out_q.extend([qid] * order.size)
                out_d.extend(d_h[order].tolist())
                out_dist.extend(dist_h[order].tolist())
            # count partial (doc_id = -1 marker, dist2 carries the count)
            out_q.append(qid)
            out_d.append(-1)
            out_dist.append(n_hit)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
                "dist2": pa.array(out_dist, pa.int64()),
            }
        )

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    cols = {c: [] for c in ("query_id", "rank", "doc_id", "dist2",
                            "n_found")}
    if len(parts):
        counts = parts[parts.doc_id < 0].groupby("query_id")["dist2"].sum()
        cand = parts[parts.doc_id >= 0]
        for qid, g in cand.groupby("query_id"):
            g = g.sort_values(["dist2", "doc_id"]).head(k)
            for r, row in enumerate(g.itertuples(), 1):
                cols["query_id"].append(int(qid))
                cols["rank"].append(r)
                cols["doc_id"].append(int(row.doc_id))
                cols["dist2"].append(int(row.dist2))
                cols["n_found"].append(int(counts.loc[qid]))
    return pa.table({c: pa.array(v, pa.int64()) for c, v in cols.items()})
