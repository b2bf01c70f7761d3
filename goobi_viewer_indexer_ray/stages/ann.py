"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one float64 matmul
  and emits only its batch-local top-k candidates per query; the tiny
  candidate union is merged on the driver.  No shuffle.
- :func:`lsh_topk` — the scale path: seeded random-hyperplane LSH
  buckets; a query only scores vectors in its probed buckets
  (multi-probe by Hamming-1).  Approximate recall, same output shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["brute_force_topk", "lsh_topk"]


def _as_matrix(col) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix, zero-copy flatten.

    Fixed-size lists and uniform-length variable lists reshape the
    underlying values buffer directly; the pylist fallback only fires
    for ragged input (invalid for an embedding column anyway).
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        return (
            arr.values.to_numpy(zero_copy_only=False)
            .reshape(-1, dim)
            .astype(np.float64, copy=False)
        )
    if arr.null_count == 0:
        offs = arr.offsets.to_numpy()
        widths = np.diff(offs)
        if widths.size and (widths == widths[0]).all():
            vals = arr.values.to_numpy(zero_copy_only=False)
            return (
                vals[offs[0] : offs[-1]]
                .reshape(-1, int(widths[0]))
                .astype(np.float64, copy=False)
            )
    return np.array(arr.to_pylist(), dtype=np.float64)


def _fetch_queries(ds, query_ids: list[int]):
    """(vec_id asc sorted query matrix) via a vectorized batch filter —
    no per-row ``ds.filter`` lambda for a handful of query vectors."""
    import pyarrow.compute as pc

    wanted = pa.array(sorted(set(int(q) for q in query_ids)), pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("vec_id"), value_set=wanted))

    picked = ds.map_batches(pick, batch_format="pyarrow")
    qt = pa.concat_tables(
        picked.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("vec_id")
    return qt.column("vec_id").to_numpy().astype(np.int64), _as_matrix(qt.column("embedding"))


def _topk_tied(cos: np.ndarray, k: int) -> np.ndarray:
    """Indices whose 4-dp-rounded cosine ties or beats the kth best —
    batch-local pruning that keeps every rounded tie so the driver
    merge's (cos_r desc, vec_id asc) ranking never loses a survivor."""
    r = np.round(cos, 4)
    kk = min(k, r.size)
    if kk == 0:
        return np.empty(0, np.int64)
    kth = -np.partition(-r, kk - 1)[kk - 1]
    return np.flatnonzero(r >= kth)


def _final_merge(parts: pd.DataFrame, k: int) -> pd.DataFrame:
    out = []
    for qid, g in parts.groupby("query_vec_id"):
        g = g.sort_values(["cos_r", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else parts.assign(rank=[])
    return res[["query_vec_id", "vec_id", "cos_r", "rank"]].astype(
        {"query_vec_id": "int64", "vec_id": "int64", "cos_r": "float64", "rank": "int64"}
    )


def brute_force_topk(ds, query_ids: list[int], k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k of every vector against the query vectors.

    ``query_ids`` select query rows from the same embeddings table.
    Ranking key: (round(cos, 4) desc, vec_id asc) — rounding makes the
    result stable under any float summation order (and matches the
    DuckDB oracle's double-precision cosine).
    """
    import ray

    qids_np, q = _fetch_queries(ds, query_ids)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ref = ray.put((qids_np, qn))

    def score(t: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        m = _as_matrix(t.column("embedding"))
        vn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        cos = qm @ vn.T  # (nq, batch)
        vids = t.column("vec_id").to_numpy()
        rows_q, rows_v, rows_c = [], [], []
        for qi in range(cos.shape[0]):
            # batch-local prune keeping rounded ties (final ranking is
            # by (round(cos,4) desc, vec_id asc) — a tied candidate with
            # lower raw cosine must survive to the driver merge)
            idx = _topk_tied(cos[qi], k)
            rows_q.extend([int(qids[qi])] * len(idx))
            rows_v.extend(vids[idx].tolist())
            rows_c.extend(np.round(cos[qi][idx], 4).tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(rows_q, pa.int64()),
                "vec_id": pa.array(rows_v, pa.int64()),
                "cos_r": pa.array(rows_c, pa.float64()),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return _final_merge(parts, k)


def lsh_topk(ds, query_ids: list[int], k: int = 10, *, planes: int = 8,
             seed: int = 97) -> pd.DataFrame:
    """Approximate cosine top-k via random-hyperplane bucketing.

    Vectors are bucketed by the sign pattern of ``planes`` seeded
    hyperplanes; each query multiprobes its own bucket plus all
    Hamming-≤2 neighbors (≈15% of buckets at 8 planes).  Output shape
    identical to :func:`brute_force_topk` (rows-only correctness
    check; recall floor measured in tests).
    """
    import ray

    qids_np, q = _fetch_queries(ds, query_ids)
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((planes, dim))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qsig = (q @ H.T > 0).astype(np.uint32)
    qbuckets = []
    for s in qsig:
        base = int(sum(int(s[j]) << (planes - 1 - j) for j in range(planes)))
        probe = {base} | {base ^ (1 << j) for j in range(planes)}
        probe |= {base ^ (1 << i) ^ (1 << j) for i in range(planes) for j in range(i + 1, planes)}
        qbuckets.append(probe)
    q_ref = ray.put((qids_np, qn, qbuckets, H))

    def score(t: pa.Table) -> pa.Table:
        qids, qm, probes, planes_m = ray.get(q_ref)
        m = _as_matrix(t.column("embedding"))
        vn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        sig = (m @ planes_m.T > 0).astype(np.uint32)
        bucket = np.zeros(len(m), dtype=np.int64)
        for j in range(planes_m.shape[0]):
            bucket |= sig[:, j].astype(np.int64) << (planes_m.shape[0] - 1 - j)
        vids = t.column("vec_id").to_numpy()
        rows_q, rows_v, rows_c = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(bucket, list(probes[qi]))
            if not mask.any():
                continue
            cos = qm[qi] @ vn[mask].T
            sel_ids = vids[mask]
            idx = _topk_tied(cos, k)
            rows_q.extend([int(qids[qi])] * len(idx))
            rows_v.extend(sel_ids[idx].tolist())
            rows_c.extend(np.round(cos[idx], 4).tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(rows_q, pa.int64()),
                "vec_id": pa.array(rows_v, pa.int64()),
                "cos_r": pa.array(rows_c, pa.float64()),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return _final_merge(parts, k)
