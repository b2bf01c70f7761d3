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

__all__ = ["brute_force_topk", "lsh_topk", "write_lsh_partitions",
           "lsh_topk_partitioned", "embedding_dup_pairs",
           "quantize_embeddings", "quantized_topk",
           "pq_codebook", "pq_assign", "pq_adc_topk"]


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


def _quantize_matrix(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-vector int8 quantization: ``q = floor(x / max|x| *
    127 + 0.5)``, ``scale = max|x| / 127``.  floor(+0.5) instead of
    round() so the SQL oracle (DuckDB ``floor``) reproduces it exactly
    — numpy's round is banker's, SQL's is half-away, floor(+0.5) is
    neither's tie rule and both engines agree on it."""
    a = np.max(np.abs(m), axis=1, keepdims=True)
    safe = np.where(a == 0, 1.0, a)
    q = np.floor(m / safe * 127.0 + 0.5).astype(np.int8)
    return q, (a[:, 0] / 127.0)


def quantize_embeddings(ds):
    """Per-vector int8 quantization summary — the storage/compute scale
    path for the embedding column (4× smaller than float32, int8 GEMM
    at query time; the standard trade in large-scale vector serving).

    Returns a Dataset of ``(vec_id, scale, sum_q, sum_abs_q, max_q)`` —
    the integer summaries keep the oracle comparison exact while still
    pinning every quantized value through the sums.
    """
    def quant(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column("embedding"))
        q, scale = _quantize_matrix(m)
        qi = q.astype(np.int64)
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "scale": pa.array(scale, pa.float64()),
                "sum_q": pa.array(qi.sum(axis=1), pa.int64()),
                "sum_abs_q": pa.array(np.abs(qi).sum(axis=1), pa.int64()),
                "max_q": pa.array(qi.max(axis=1), pa.int64()),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


def quantized_topk(ds, query_ids: list[int], k: int = 10) -> pd.DataFrame:
    """Approximate cosine top-k over int8-quantized vectors.

    Per batch: one int32 GEMM (``q_query @ q_vec.T``) plus a rank-1
    scale correction — the cosine of the DEQUANTIZED vectors, so the
    only error vs :func:`brute_force_topk` is the quantization noise
    itself (recall pinned in tests).  Same ranking/merge contract as
    the exact path.
    """
    import ray

    qids_np, qm = _fetch_queries(ds, query_ids)
    qq, _ = _quantize_matrix(qm)
    # per-vector scales cancel in cosine (q·s_a vs ‖q‖·s_a), so only
    # the int8 query matrix ships — no dequantized copies
    q_ref = ray.put((qids_np, qq.astype(np.int32)))

    def score(t: pa.Table) -> pa.Table:
        qids, qqi = ray.get(q_ref)
        m = _as_matrix(t.column("embedding"))
        vq, _ = _quantize_matrix(m)
        dots = qqi @ vq.astype(np.int32).T  # exact int32 GEMM
        # cosine of dequantized vectors: scales cancel against norms
        vd_norm = np.maximum(np.linalg.norm(vq.astype(np.float64), axis=1), 1e-300)
        qd_norm = np.maximum(np.linalg.norm(qqi.astype(np.float64), axis=1), 1e-300)
        cos = dots / qd_norm[:, None] / vd_norm[None, :]
        vids = t.column("vec_id").to_numpy()
        rows_q, rows_v, rows_c = [], [], []
        for qi in range(cos.shape[0]):
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


def ivf_assign(ds, *, num_cells: int = 16):
    """IVF coarse quantization: every vector → its nearest centroid
    cell (the inverted-file ANN scale path, alongside the LSH one).

    The quantizer is DETERMINISTIC — centroids are the normalized
    embeddings of vec_ids ``0..num_cells-1`` (no k-means iterations),
    so a SQL oracle can recompute every assignment exactly; a k-means
    refinement is a drop-in replacement since assignment and probing
    only ever see the centroid matrix.  Ranking key per vector:
    (round(cos, 4) desc, centroid index asc) — the engine's standard
    cross-engine float protocol.

    Scale shape: the centroid matrix is broadcast once (``ray.put``),
    assignment is one zero-shuffle ``map_batches`` matmul; at 10⁹
    vectors this is the partitioned-write key for cell-pruned probes
    (mirror of ``write_lsh_partitions``).
    """
    import ray

    _, c = _fetch_queries(ds, list(range(num_cells)))
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)
    c_ref = ray.put(cn)

    def assign(t: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        m = _as_matrix(t.column("embedding"))
        vn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        cos_r = np.round(vn @ cm.T, 4)  # (batch, K)
        cell = np.argmax(cos_r, axis=1)  # first max = smallest index on ties
        best = cos_r[np.arange(cell.size), cell]
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "cell": pa.array(cell.astype(np.int64), pa.int64()),
                "cos_r": pa.array(best, pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_topk(ds, query_ids: list[int], k: int = 10, *,
             num_cells: int = 16, nprobe: int = 4) -> pd.DataFrame:
    """IVF-probed approximate top-k: each query scores only vectors
    whose cell is among its ``nprobe`` nearest centroids.  With
    ``nprobe == num_cells`` this degenerates to exact brute force
    (pytest pins that identity); smaller nprobe trades recall for a
    1/num_cells·nprobe candidate fraction."""
    import ray

    _, c = _fetch_queries(ds, list(range(num_cells)))
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)
    qids_np, q = _fetch_queries(ds, query_ids)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qcos = np.round(qn @ cn.T, 4)
    # stable argsort of -cos: equal (rounded) sims keep ascending cell
    # order, so the probe set is deterministic under ties
    probe = np.argsort(-qcos, axis=1, kind="stable")[:, :nprobe]
    ref = ray.put((qids_np, qn, cn, probe))

    def score(t: pa.Table) -> pa.Table:
        qids, qm, cm, pr = ray.get(ref)
        m = _as_matrix(t.column("embedding"))
        vn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        cell = np.argmax(np.round(vn @ cm.T, 4), axis=1)
        vids = t.column("vec_id").to_numpy()
        rows_q, rows_v, rows_c = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cell, pr[qi])
            if not mask.any():
                continue
            cos = qm[qi] @ vn[mask].T
            idx = _topk_tied(cos, k)
            sel = np.flatnonzero(mask)[idx]
            rows_q.extend([int(qids[qi])] * len(idx))
            rows_v.extend(vids[sel].tolist())
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


def _planes(planes: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((planes, dim))


def _buckets_of(m: np.ndarray, H: np.ndarray) -> np.ndarray:
    """(n, dim) vectors → int64 bucket id (sign pattern of ``H``)."""
    planes = H.shape[0]
    sig = (m @ H.T > 0).astype(np.uint32)
    bucket = np.zeros(len(m), dtype=np.int64)
    for j in range(planes):
        bucket |= sig[:, j].astype(np.int64) << (planes - 1 - j)
    return bucket


def _query_probes(q: np.ndarray, H: np.ndarray) -> list[set[int]]:
    """Multiprobe sets per query: own bucket + all Hamming-≤2 neighbors
    (≈15% of buckets at 8 planes)."""
    planes = H.shape[0]
    qsig = (q @ H.T > 0).astype(np.uint32)
    out = []
    for s in qsig:
        base = int(sum(int(s[j]) << (planes - 1 - j) for j in range(planes)))
        probe = {base} | {base ^ (1 << j) for j in range(planes)}
        probe |= {base ^ (1 << i) ^ (1 << j) for i in range(planes) for j in range(i + 1, planes)}
        out.append(probe)
    return out


def _lsh_score_fn(q_ref, k: int):
    """Shared per-batch scorer for the LSH variants (bucket recomputed
    per batch from the broadcast plane matrix)."""
    import ray

    def score(t: pa.Table) -> pa.Table:
        qids, qm, probes, planes_m = ray.get(q_ref)
        m = _as_matrix(t.column("embedding"))
        vn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        bucket = _buckets_of(m, planes_m)
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

    return score


def lsh_topk(ds, query_ids: list[int], k: int = 10, *, planes: int = 8,
             seed: int = 97) -> pd.DataFrame:
    """Approximate cosine top-k via random-hyperplane bucketing.

    Vectors are bucketed by the sign pattern of ``planes`` seeded
    hyperplanes; each query multiprobes its own bucket plus all
    Hamming-≤2 neighbors.  Output shape identical to
    :func:`brute_force_topk` (rows-only correctness check; recall
    floor measured in tests).  This variant scans every batch (compute
    pruning only); :func:`lsh_topk_partitioned` adds IO pruning over a
    bucket-partitioned store.
    """
    import ray

    qids_np, q = _fetch_queries(ds, query_ids)
    H = _planes(planes, q.shape[1], seed)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ref = ray.put((qids_np, qn, _query_probes(q, H), H))
    score = _lsh_score_fn(q_ref, k)
    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return _final_merge(parts, k)


def write_lsh_partitions(ds, out_dir: str, *, planes: int = 8, seed: int = 97) -> None:
    """Embeddings → parquet partitioned by LSH bucket (``bucket=<b>/``).

    The scale path's storage layout: a probe then READS only its
    probed buckets' files (IO pruning), instead of scanning every
    vector batch and pruning in compute.  One pass, no shuffle (each
    input block writes its own per-bucket files)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column("embedding"))
        H = _planes(planes, m.shape[1], seed)
        return t.append_column("bucket", pa.array(_buckets_of(m, H), pa.int64()))

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )


def lsh_topk_partitioned(part_dir: str, ds, query_ids: list[int], k: int = 10, *,
                         planes: int = 8, seed: int = 97) -> pd.DataFrame:
    """LSH top-k over a bucket-partitioned store written by
    :func:`write_lsh_partitions` — only the union of the queries'
    probed buckets is READ from storage (IO pruning, not just compute
    pruning).  Identical output to :func:`lsh_topk` on the same data
    (same probes, same candidates, same rounding)."""
    import os

    import ray
    import ray.data

    qids_np, q = _fetch_queries(ds, query_ids)
    H = _planes(planes, q.shape[1], seed)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probes = _query_probes(q, H)
    union: set[int] = set()
    for p in probes:
        union |= p
    import glob as _glob

    paths = [
        f
        for d in sorted(os.listdir(part_dir))
        if d.startswith("bucket=") and int(d.split("=")[1]) in union
        for f in sorted(_glob.glob(os.path.join(part_dir, d, "*.parquet")))
    ]
    if not paths:
        return _final_merge(
            pd.DataFrame({"query_vec_id": [], "vec_id": [], "cos_r": []}), k
        )
    sub = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    q_ref = ray.put((qids_np, qn, probes, H))
    score = _lsh_score_fn(q_ref, k)
    parts = sub.map_batches(score, batch_format="pyarrow").to_pandas()
    return _final_merge(parts, k)


def write_ivf_partitions(ds, out_dir: str, *, num_cells: int = 16) -> None:
    """Embeddings → parquet partitioned by IVF cell (``cell=<c>/``) —
    the inverted-file storage layout: a probe READS only its probed
    cells' files (IO pruning), the mirror of
    :func:`write_lsh_partitions` for the centroid quantizer.  One
    pass, no shuffle."""
    import ray

    _, c = _fetch_queries(ds, list(range(num_cells)))
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)
    c_ref = ray.put(cn)

    def add_cell(t: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        m = _as_matrix(t.column("embedding"))
        vn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        cell = np.argmax(np.round(vn @ cm.T, 4), axis=1).astype(np.int64)
        return t.append_column("cell", pa.array(cell, pa.int64()))

    ds.map_batches(add_cell, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["cell"]
    )


def ivf_topk_partitioned(part_dir: str, ds, query_ids: list[int], k: int = 10, *,
                         num_cells: int = 16, nprobe: int = 4) -> pd.DataFrame:
    """IVF top-k over a cell-partitioned store written by
    :func:`write_ivf_partitions` — only the union of the queries'
    probed cells is READ from storage.  Identical output to
    :func:`ivf_topk` on the same data (same centroids, same probes,
    same rounding)."""
    import glob as _glob
    import os

    import ray
    import ray.data

    _, c = _fetch_queries(ds, list(range(num_cells)))
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)
    qids_np, q = _fetch_queries(ds, query_ids)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probe = np.argsort(-np.round(qn @ cn.T, 4), axis=1, kind="stable")[:, :nprobe]
    union = set(int(x) for x in probe.reshape(-1))
    paths = [
        f
        for d in sorted(os.listdir(part_dir))
        if d.startswith("cell=") and int(d.split("=")[1]) in union
        for f in sorted(_glob.glob(os.path.join(part_dir, d, "*.parquet")))
    ]
    if not paths:
        return _final_merge(
            pd.DataFrame({"query_vec_id": [], "vec_id": [], "cos_r": []}), k
        )
    sub = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    ref = ray.put((qids_np, qn, cn, probe))

    def score(t: pa.Table) -> pa.Table:
        qids, qm, cm, pr = ray.get(ref)
        m = _as_matrix(t.column("embedding"))
        vn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        cell = np.argmax(np.round(vn @ cm.T, 4), axis=1)
        vids = t.column("vec_id").to_numpy()
        rows_q, rows_v, rows_c = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cell, pr[qi])
            if not mask.any():
                continue
            cos = qm[qi] @ vn[mask].T
            idx = _topk_tied(cos, k)
            sel = np.flatnonzero(mask)[idx]
            rows_q.extend([int(qids[qi])] * len(idx))
            rows_v.extend(vids[sel].tolist())
            rows_c.extend(np.round(cos[idx], 4).tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(rows_q, pa.int64()),
                "vec_id": pa.array(rows_v, pa.int64()),
                "cos_r": pa.array(rows_c, pa.float64()),
            }
        )

    parts = sub.map_batches(score, batch_format="pyarrow").to_pandas()
    return _final_merge(parts, k)


def embedding_dup_pairs(ds, *, threshold: float = 0.45, round_dp: int = 4,
                        block_target: int = 2048) -> pd.DataFrame:
    """Exact embedding-cosine near-duplicate pairs: all (a < b) with
    ``round(cos, round_dp) ≥ threshold`` — the embedding leg of the
    dedup family (driver brief), with a full SQL oracle.

    Distributed block×block tiling — the corpus is NEVER materialized
    on the driver and no task ever holds more than two blocks:

    1. each vector gets a block id ``blk = vec_id % B`` (``B`` sized so
       a block ≈ ``block_target`` vectors from the dataset's metadata
       count — no data scan);
    2. every row is fanned out once per block it must meet:
       ``(min(blk, other), max(blk, other))`` for each ``other`` —
       each unordered block pair is a distinct shuffle key, so each
       unordered VECTOR pair is computed by exactly one reduce task;
    3. ``groupby(blk_a, blk_b)`` → one vectorized tile kernel per
       group: a (≤2-block) × (≤2-block) float64 matmul emitting only
       the over-threshold pairs.

    Communication is ``N·B`` rows — the inherent cost of exact
    all-pairs; per-task memory is bounded by ``block_target``
    regardless of N.  The only driver-side object is the (small)
    near-dup pair output.  LSH-bucket prefiltering
    (:func:`write_lsh_partitions`) remains the sub-quadratic
    approximate path when exactness is not required.
    """
    n = ds.count()  # parquet metadata count — no scan
    empty = pd.DataFrame(
        {
            "vec_a": pd.Series([], dtype="int64"),
            "vec_b": pd.Series([], dtype="int64"),
            "cos_r": pd.Series([], dtype="float64"),
        }
    )
    if not n:
        return empty
    # blocks sized for BOTH bounds: per-task memory (≤ block_target
    # vectors per block) AND reduce parallelism — a near-constant
    # shuffle key is pathological for the sort-based groupby (key
    # cardinality must comfortably exceed the partition count), so
    # small corpora still get ≥~8 blocks → ≥36 tile groups.
    num_blocks = max(
        -(-int(n) // block_target),
        min(8, max(1, int(n) // 64)),
    )

    def fan_out(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        m = _as_matrix(t.column("embedding"))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        # splitmix64 finalizer, not raw id residue: structured id
        # spaces (strided, clustered) must still spread uniformly or a
        # tile can exceed the documented block_target memory bound
        x = ids.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        blk = (x % np.uint64(num_blocks)).astype(np.int64)
        others = np.arange(num_blocks, dtype=np.int64)
        rep_blk = np.repeat(blk, num_blocks)
        rep_other = np.tile(others, ids.size)
        flat = pa.array(np.repeat(mn, num_blocks, axis=0).reshape(-1), pa.float64())
        offs = pa.array(
            np.arange(0, (ids.size * num_blocks + 1) * mn.shape[1], mn.shape[1],
                      dtype=np.int64)
        )
        return pa.table(
            {
                "blk_a": pa.array(np.minimum(rep_blk, rep_other), pa.int64()),
                "blk_b": pa.array(np.maximum(rep_blk, rep_other), pa.int64()),
                "blk": pa.array(rep_blk, pa.int64()),
                "vec_id": pa.array(np.repeat(ids, num_blocks), pa.int64()),
                "emb_n": pa.LargeListArray.from_arrays(offs, flat),
            }
        )

    def tile_kernel(g: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cos_r": pa.array([], pa.float64()),
            }
        )
        ids = g.column("vec_id").to_numpy().astype(np.int64)
        if ids.size < 2:
            return out_empty
        blk = g.column("blk").to_numpy().astype(np.int64)
        la = g.column("emb_n").combine_chunks()
        offs = la.offsets.to_numpy()
        vals = la.values.to_numpy(zero_copy_only=False)
        dim = int(offs[1] - offs[0])
        mn = vals[offs[0]: offs[-1]].reshape(-1, dim)
        ba = int(g.column("blk_a")[0].as_py())
        bb = int(g.column("blk_b")[0].as_py())
        if ba == bb:  # diagonal tile: triangular within one block
            r = np.round(mn @ mn.T, round_dp)
            ai, bj = np.nonzero(r >= threshold)
            keep = ids[ai] < ids[bj]
            va, vb, cr = ids[ai][keep], ids[bj][keep], r[ai, bj][keep]
        else:  # off-diagonal tile: cross product of the two blocks
            in_a = blk == ba
            ids_a, ids_b = ids[in_a], ids[~in_a]
            if ids_a.size == 0 or ids_b.size == 0:
                return out_empty
            r = np.round(mn[in_a] @ mn[~in_a].T, round_dp)
            ai, bj = np.nonzero(r >= threshold)
            xa, xb = ids_a[ai], ids_b[bj]
            va, vb = np.minimum(xa, xb), np.maximum(xa, xb)
            cr = r[ai, bj]
        return pa.table(
            {
                "vec_a": pa.array(va, pa.int64()),
                "vec_b": pa.array(vb, pa.int64()),
                "cos_r": pa.array(cr, pa.float64()),
            }
        )

    parts = (
        ds.map_batches(fan_out, batch_format="pyarrow")
        .groupby(["blk_a", "blk_b"])
        .map_groups(tile_kernel, batch_format="pyarrow")
        .to_pandas()  # near-dup pair rows only — the small output
    )
    if parts.empty:
        return empty
    return (
        parts[["vec_a", "vec_b", "cos_r"]]
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
        .astype({"vec_a": "int64", "vec_b": "int64", "cos_r": "float64"})
    )


# ------------------------------------------------- product quantization

PQ_M = 8    # subspaces
PQ_KC = 16  # centroids per subspace (4-bit codes)


def pq_codebook(dim: int, *, m: int = PQ_M, kc: int = PQ_KC) -> np.ndarray:
    """(m, kc, dim//m) int64 codebook from pure key arithmetic:
    ``C[s,c,d] = ((1+s)*37 + c*11 + d*5) % 255 - 127``.

    In production the codebook comes from offline k-means and is
    broadcast to workers; here it is DERIVED so the SQL oracle can
    regenerate it from the same formula instead of shipping 1024
    float literals — and INTEGER so every distance below is exact
    int64 (the ``media_dims`` synthesis pattern applied to vector
    codebooks)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    s = np.arange(m, dtype=np.int64)[:, None, None]
    c = np.arange(kc, dtype=np.int64)[None, :, None]
    d = np.arange(dim // m, dtype=np.int64)[None, None, :]
    return ((1 + s) * 37 + c * 11 + d * 5) % 255 - 127


def _pq_codes(q_int: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 (n, dim) → (codes (n, m), per-subspace min dists (n, m)).
    argmin returns the FIRST minimum — the lowest-centroid tie rule the
    SQL replays with ``ORDER BY dist, c``."""
    n = q_int.shape[0]
    m, kc, dsub = C.shape
    x = q_int.reshape(n, m, 1, dsub)
    dist = ((x - C[None]) ** 2).sum(axis=3)  # (n, m, kc) int64
    codes = dist.argmin(axis=2)
    return codes, np.take_along_axis(dist, codes[:, :, None], axis=2)[:, :, 0]


def _quantize_int(m: np.ndarray) -> np.ndarray:
    q, _scale = _quantize_matrix(m)
    return q.astype(np.int64)


def pq_assign(ds, *, m: int = PQ_M, kc: int = PQ_KC):
    """PQ code assignment over the embedding column: per vector, int8-
    quantize (the ``quantize_embeddings`` rule), split into ``m``
    subspaces, snap each to its nearest integer codebook centroid.
    Returns ``(vec_id, pq_code, dist_total)`` — the packed 4-bit×8
    code word (``Σ code_s << 4s``) plus the total squared
    reconstruction error, both exact int64.  32× storage cut vs
    float32 (8 bytes + scale per vector); one stateless
    ``map_batches`` pass, codebook captured in the closure (broadcast
    once per worker, not per batch)."""

    def assign(t: pa.Table) -> pa.Table:
        mat = _as_matrix(t.column("embedding"))
        C = pq_codebook(mat.shape[1], m=m, kc=kc)
        codes, dists = _pq_codes(_quantize_int(mat), C)
        shifts = (4 * np.arange(m, dtype=np.int64))[None, :]
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "pq_code": pa.array((codes << shifts).sum(axis=1), pa.int64()),
                "dist_total": pa.array(dists.sum(axis=1), pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def pq_adc_topk(ds, query_ids: list[int], k: int = 10, *,
                m: int = PQ_M, kc: int = PQ_KC) -> pd.DataFrame:
    """Asymmetric-distance top-k over PQ codes (Jégou et al. 2011 ADC,
    integer-exact variant): each query builds an ``(m, kc)`` LUT of
    exact int64 subspace distances to every centroid; candidate
    distance is then ``m`` LUT lookups per vector — no decode, no
    GEMM.  Per batch: quantize + assign codes + fancy-index the LUT;
    per-query bottom-k partials (ties kept) shrink each block to
    ~k rows before the driver's final (dist asc, vec_id asc) merge —
    the same stream shape as :func:`brute_force_topk`, at LUT cost."""
    qids, Q = _fetch_queries(ds, query_ids)
    C = pq_codebook(Q.shape[1], m=m, kc=kc)
    qint = _quantize_int(Q).reshape(len(qids), m, 1, Q.shape[1] // m)
    lut = ((qint - C[None]) ** 2).sum(axis=3)  # (nq, m, kc) int64
    sidx = np.arange(m)

    def score(t: pa.Table) -> pa.Table:
        mat = _as_matrix(t.column("embedding"))
        ids = t.column("vec_id").cast(pa.int64()).to_numpy()
        codes, _ = _pq_codes(_quantize_int(mat), C)
        out_q, out_v, out_d = [], [], []
        for qi in range(len(qids)):
            adc = lut[qi][sidx[None, :], codes].sum(axis=1)  # (nb,) int64
            kk = min(k, adc.size)
            kth = np.partition(adc, kk - 1)[kk - 1]
            keep = np.flatnonzero(adc <= kth)  # ties kept for the merge
            out_q.append(np.full(keep.size, qids[qi], np.int64))
            out_v.append(ids[keep])
            out_d.append(adc[keep])
        return pa.table(
            {
                "query_vec_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "adc_dist": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = []
    for qid, g in parts.groupby("query_vec_id"):
        g = g.sort_values(["adc_dist", "vec_id"]).head(k)
        out.append(g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64)))
    return pd.concat(out, ignore_index=True)[
        ["query_vec_id", "vec_id", "adc_dist", "rank"]
    ].astype({"query_vec_id": "int64", "vec_id": "int64",
              "adc_dist": "int64", "rank": "int64"})
