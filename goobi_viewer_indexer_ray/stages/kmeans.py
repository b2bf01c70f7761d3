"""Trained k-means over the embedding column + SemDeDup semantic dedup.

The reference never sees embeddings (it indexes one METS record at a
time); a web-scale training-data pipeline clusters them constantly —
for semantic dedup (Abbas et al. 2023, "SemDeDup"), IVF coarse
quantizers, and topic-balanced sampling.  Two operators:

- :func:`kmeans_assign` — distributed Lloyd iterations over
  INT-QUANTIZED embeddings.  Vectors are int8-quantized per row (the
  ``quantize_embeddings`` rule, ``stages/ann.py:_quantize_matrix``)
  then SHIFTED by +127 into [0, 254]: squared distances are
  shift-invariant, and the shift keeps every centroid-update floor
  division non-negative — where numpy's ``//`` (floor) and DuckDB's
  ``//`` (truncate) agree, so the whole recurrence is bit-exact and
  SQL-replayable (the ``link_pagerank`` integer-recurrence contract
  applied to Lloyd's algorithm).  Per iteration::

      assign(v)   = argmin_j  Σ_d (q_vd − c_jd)²      (first-min tie → lowest j)
      c'_j[d]     = (Σ_{v∈j} q_vd) // |j|             (empty j keeps c_j)

  Init: the k lowest ``vec_id`` rows' quantized vectors (deterministic,
  oracle-replayable).  After ``iters`` assign+update rounds, ONE final
  assign emits ``(vec_id, cluster, dist2)``.

- :func:`semantic_dedup` — SemDeDup with the trained clusters as the
  blocking unit: within each cluster, a vector is a duplicate iff some
  LOWER-id cluster-mate has quantized cosine ≥ threshold.  The test is
  cross-multiplied into pure integers (``thr = √(num/den)``)::

      dup(a, b)  ⟺  ip > 0  ∧  den·ip² ≥ num·|a|²·|b|²
      ip = Σ q_a q_b,  |a|² = Σ q_a²   (unshifted int64)

  so there is no float tolerance anywhere — every verdict, including
  near-threshold ones, hash-matches the SQL replay.

Scale shape
-----------

``kmeans_assign`` materializes the quantized vectors ONCE, then each
round is one stateless ``map_batches`` (distances against the
broadcast (k, dim) centroid matrix — k·dim int64s in the closure, sent
once per worker) emitting ≤ k·dim partial-sum rows per batch, folded
by one tiny ``groupby(cluster, d)``.  Per-round shuffle volume is
O(k·dim·n_batches) ints — independent of corpus size.  The centroid
matrix itself (k·dim ints) is the only driver round-trip per round —
the ``pagerank`` dangling-scalar pattern.

``semantic_dedup`` is ONE ``groupby(cluster).map_groups`` — the
cluster IS the blocking unit (that is SemDeDup's point: within-cluster
pairs only, never all-pairs).  Group cost is |cluster|²·dim int ops;
at corpus scale you raise k so E|cluster| = n/k stays bounded (the
paper uses k ≈ n/10⁴) and shard any residual hot cluster by id range
— the same skew caveat ``stages/linkgraph.py:anchor_stats`` documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _as_matrix, _quantize_matrix

__all__ = ["kmeans_assign", "semantic_dedup", "classify_nearest_centroid"]

KM_K = 8        # clusters
KM_ITERS = 4    # assign+update rounds (final assign is one more pass)
SEM_NUM = 1225   # threshold² numerator: cos ≥ 0.35 ⟺ 10⁴·ip² ≥ 1225·|a|²·|b|²
SEM_DEN = 10000  # (0.35 splits the synthetic corpus ~80/20; a real
                 # near-dup corpus would run 0.9+ — the arithmetic is
                 # identical, int64 headroom holds to dim ≈ 5·10⁵)


def _quantize_shifted(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, (n, dim) int64 in [0, 254]) for a batch."""
    m = _as_matrix(t.column("embedding"))
    q, _scale = _quantize_matrix(m)
    return (
        t.column("vec_id").cast(pa.int64()).to_numpy(),
        q.astype(np.int64) + 127,
    )


def _dist2(qs: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) exact int64 squared L2: ‖a‖² − 2a·c + ‖c‖² (the expansion
    keeps it one int64 GEMM instead of an (n, k, dim) broadcast)."""
    aa = (qs * qs).sum(axis=1)[:, None]
    cc = (C * C).sum(axis=1)[None, :]
    return aa - 2 * (qs @ C.T) + cc


def _init_centroids(dsq, k: int) -> np.ndarray:
    """Quantized vectors of the k lowest vec_ids.  Per-batch bottom-k
    prune first, so only ≤ k rows per block reach the driver."""

    import ray

    def prune(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        keep = np.argsort(ids, kind="stable")[:k]
        return t.take(pa.array(np.sort(keep)))

    refs = dsq.map_batches(prune, batch_format="pyarrow").to_arrow_refs()
    head = pa.concat_tables(ray.get(refs))
    ids = head.column("vec_id").to_numpy()
    order = np.argsort(ids, kind="stable")[:k]
    mat = np.stack(
        [np.asarray(head.column("q")[int(i)].as_py(), np.int64) for i in order]
    )
    return mat


def _quantized_ds(ds):
    """Materialized (vec_id, q list<int64>) — scanned once, reused by
    every Lloyd round and the final assign."""

    def quant(t: pa.Table) -> pa.Table:
        ids, qs = _quantize_shifted(t)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "q": pa.array(list(qs), pa.list_(pa.int64())),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow").materialize()


def _q_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t.column("vec_id").to_numpy()
    arr = t.column("q")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = arr.offsets.to_numpy()
    vals = arr.values.to_numpy()
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return ids, vals[offs[0]: offs[-1]].reshape(-1, dim)


def _lloyd(dsq, *, k: int, iters: int) -> np.ndarray:
    """Run the assign+update rounds; returns the final (k, dim) int64
    centroid matrix (tiny — the only state that ever reaches the
    driver)."""
    C = _init_centroids(dsq, k)
    dim = C.shape[1]

    for _ in range(iters):
        def part(t: pa.Table, C=C) -> pa.Table:
            ids, qs = _q_matrix(t)
            a = _dist2(qs, C).argmin(axis=1)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            sums = np.zeros((k, dim), np.int64)
            np.add.at(sums, a, qs)
            live = np.flatnonzero(cnt)
            # long-form partials: ≤ k·dim rows per batch
            cl = np.repeat(live, dim)
            d = np.tile(np.arange(dim, dtype=np.int64), live.size)
            return pa.table(
                {
                    "cluster": pa.array(cl, pa.int64()),
                    "d": pa.array(d, pa.int64()),
                    "s": pa.array(sums[live].ravel(), pa.int64()),
                    "cnt": pa.array(np.repeat(cnt[live], dim), pa.int64()),
                }
            )

        folded = (
            dsq.map_batches(part, batch_format="pyarrow")
            .groupby(["cluster", "d"])
            .sum(["s", "cnt"])
            .take_all()
        )  # ≤ k·dim tiny rows — the per-round driver round-trip
        C = C.copy()
        for r in folded:
            j, d = int(r["cluster"]), int(r["d"])
            C[j, d] = int(r["sum(s)"]) // int(r["sum(cnt)"])
    return C


def kmeans_assign(ds, *, k: int = KM_K, iters: int = KM_ITERS):
    """Lloyd k-means over ``(vec_id, embedding)`` → Dataset of
    ``(vec_id, cluster, dist2)``, all int64, bit-exact under any
    partitioning (see module docstring for the recurrence)."""
    dsq = _quantized_ds(ds)
    C = _lloyd(dsq, k=k, iters=iters)

    def final(t: pa.Table, C=C) -> pa.Table:
        ids, qs = _q_matrix(t)
        d2 = _dist2(qs, C)
        a = d2.argmin(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "dist2": pa.array(d2[np.arange(a.size), a], pa.int64()),
            }
        )

    return dsq.map_batches(final, batch_format="pyarrow")


def kmeans_silhouette(ds, *, k: int = KM_K, iters: int = KM_ITERS):
    """Per-cluster simplified-silhouette summary over the TRAINED
    clustering (Rousseeuw 1987, centroid form — the clustering-quality
    meter a curation pipeline reads before trusting SemDeDup's
    blocks): for each point ``a² = dist² to own centroid`` (the argmin
    — so ``b² ≥ a²`` by construction and the score is never negative),
    ``b² = min dist² to any OTHER centroid``, score
    ``s_bp = 10⁴·(b²−a²) // max(a², b², 1)`` — all int64 over the
    quantized embeddings, so every row is bit-exact under any
    partitioning (the module's contract).  Returns a ``k``-row Dataset
    ``(cluster, n, sum_s_bp, min_s_bp, max_s_bp)``: one distance GEMM
    per batch against the broadcast centroids + ONE k-group
    aggregate — no pairwise work, corpus-size-linear."""
    from ray.data.aggregate import Count, Max, Min, Sum

    dsq = _quantized_ds(ds)
    C = _lloyd(dsq, k=k, iters=iters)

    def score(t: pa.Table, C=C) -> pa.Table:
        ids, qs = _q_matrix(t)
        d2 = _dist2(qs, C)
        a = d2.argmin(axis=1)
        rows = np.arange(a.size)
        a2 = d2[rows, a]
        d2m = d2.copy()
        d2m[rows, a] = np.iinfo(np.int64).max
        b2 = d2m.min(axis=1)
        s_bp = 10000 * (b2 - a2) // np.maximum(np.maximum(a2, b2), 1)
        return pa.table(
            {
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "s_bp": pa.array(s_bp.astype(np.int64), pa.int64()),
            }
        )

    return (
        dsq.map_batches(score, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(
            Count(alias_name="n"),
            Sum("s_bp", alias_name="sum_s_bp"),
            Min("s_bp", alias_name="min_s_bp"),
            Max("s_bp", alias_name="max_s_bp"),
        )
    )


SEM_TILE = 2048  # hot-cluster bound: members above this fan out into
#                  block×block tile pairs instead of one N×N Gram task

_SENTINEL = np.int64(1) << np.int64(62)


def _splitmix_block(ids: np.ndarray, num_blocks: int) -> np.ndarray:
    """splitmix64-finalized block id — uniform even for strided or
    clustered vec_id spaces (the ``embedding_dup_pairs`` rule)."""
    x = ids.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(num_blocks)).astype(np.int64)


def semantic_dedup(ds, *, k: int = KM_K, iters: int = KM_ITERS,
                   num: int = SEM_NUM, den: int = SEM_DEN,
                   tile: int = SEM_TILE):
    """SemDeDup: Dataset of ``(vec_id, cluster, dup_of, keep)`` where
    ``dup_of`` is the LOWEST-id cluster-mate with quantized cosine ≥
    √(num/den) (−1 if none) and ``keep = dup_of < 0``.  Blocking =
    the trained k-means clusters; within-cluster pairwise work runs in
    one ``groupby(cluster).map_groups`` Gram task per NORMAL cluster.

    **Hot-cluster sharding** (round-4 verdict #7 — the caveat made
    real): clusters larger than ``tile`` members no longer run one
    |cluster|²-memory task.  Their rows fan out once per block
    (``blk = splitmix64(vec_id) % B``, ``B = ⌈n/tile⌉``) into every
    unordered block pair; a ``groupby(cluster, blk_a, blk_b)`` tile
    kernel emits, per vector, the lowest matching lower-id mate seen
    IN THAT TILE, plus one sentinel row per member from its home tile
    (so no-match vectors survive); a final ``groupby(vec_id).min``
    folds tile minima into the exact global ``dup_of``.  Per-task
    memory is bounded by ``2·tile`` vectors regardless of cluster
    size; communication is members × B rows — the inherent exact
    all-pairs cost, same as :func:`..stages.ann.embedding_dup_pairs`.
    With no hot clusters the plan is EXACTLY the old single-shuffle
    one (cold path untouched → hash-green by construction)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    dsq = _quantized_ds(ds)
    C = _lloyd(dsq, k=k, iters=iters)

    def tag(t: pa.Table, C=C) -> pa.Table:
        _ids, qs = _q_matrix(t)
        a = _dist2(qs, C).argmin(axis=1)
        return t.append_column("cluster", pa.array(a.astype(np.int64), pa.int64()))

    # materialize the tagged corpus ONCE: three consumers follow
    # (cluster-size count, cold-path filter, hot-path fan-out) and an
    # un-materialized Dataset would re-run quantize+tag for each
    # (review finding) — this is the checkpoint trade the object
    # store exists for, and it replaces up to 3 corpus re-scans
    joined = dsq.map_batches(tag, batch_format="pyarrow").materialize()

    def dedup_group(t: pa.Table) -> pa.Table:
        ids, qs = _q_matrix(t)
        order = np.argsort(ids, kind="stable")
        ids, qs = ids[order], qs[order]
        qu = qs - 127  # unshifted values for the cosine test
        G = qu @ qu.T  # int64 gram — |cluster|²·dim, the blocked cost
        n2 = np.diag(G).copy()
        ok = (G > 0) & (den * G * G >= num * np.outer(n2, n2))
        np.fill_diagonal(ok, False)
        ok[:, :] = np.tril(ok, -1)  # only lower-id mates count
        has = ok.any(axis=1)
        first = ok.argmax(axis=1)
        dup_of = np.where(has, ids[first], np.int64(-1))
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(
                    np.full(ids.size, t.column("cluster")[0].as_py(), np.int64)
                ),
                "dup_of": pa.array(dup_of, pa.int64()),
                "keep": pa.array(~has),
            }
        )

    # cluster sizes: k tiny rows to the driver off the materialized pass
    sizes = {int(r["cluster"]): int(r["count()"])
             for r in joined.groupby("cluster").count().take_all()}
    hot = {c: n for c, n in sizes.items() if n > tile}
    if not hot:
        return joined.groupby("cluster").map_groups(
            dedup_group, batch_format="pyarrow"
        )

    hot_arr = pa.array(sorted(hot), pa.int64())
    blocks_of = {c: -(-n // tile) for c, n in hot.items()}

    cold = joined.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t.column("cluster"), value_set=hot_arr))
        ),
        batch_format="pyarrow",
    )
    cold_out = cold.groupby("cluster").map_groups(
        dedup_group, batch_format="pyarrow"
    )

    def fan_out(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_in(t.column("cluster"), value_set=hot_arr))
        ids = sub.column("vec_id").to_numpy().astype(np.int64)
        cl = sub.column("cluster").to_numpy().astype(np.int64)
        parts = []
        for c in np.unique(cl):
            B = blocks_of[int(c)]
            m = cl == c
            cids = ids[m]
            rows = sub.filter(pa.array(m))
            blk = _splitmix_block(cids, B)
            others = np.arange(B, dtype=np.int64)
            rep_idx = np.repeat(np.arange(cids.size, dtype=np.int64), B)
            rep_blk = np.repeat(blk, B)
            rep_other = np.tile(others, cids.size)
            rt = rows.take(pa.array(rep_idx))
            parts.append(
                rt.append_column(
                    "blk", pa.array(rep_blk, pa.int64())
                ).append_column(
                    "blk_a", pa.array(np.minimum(rep_blk, rep_other), pa.int64())
                ).append_column(
                    "blk_b", pa.array(np.maximum(rep_blk, rep_other), pa.int64())
                )
            )
        if not parts:
            sch = t.schema.append(pa.field("blk", pa.int64()))
            sch = sch.append(pa.field("blk_a", pa.int64()))
            sch = sch.append(pa.field("blk_b", pa.int64()))
            return sch.empty_table()
        return pa.concat_tables(parts)

    def tile_kernel(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "dup_of": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        ids = g.column("vec_id").to_numpy().astype(np.int64)
        blk = g.column("blk").to_numpy().astype(np.int64)
        cluster = int(g.column("cluster")[0].as_py())
        ba = int(g.column("blk_a")[0].as_py())
        bb = int(g.column("blk_b")[0].as_py())
        _all_ids, qs = _q_matrix(g)
        qu = qs - 127
        out_v, out_d = [], []
        if ba == bb:
            # home tile: sentinel rows (each member exactly once across
            # all its tile pairs) + within-tile pairs
            m = blk == ba
            tids, tqu = ids[m], qu[m]
            order = np.argsort(tids, kind="stable")
            tids, tqu = tids[order], tqu[order]
            out_v.extend(tids.tolist())
            out_d.extend([int(_SENTINEL)] * tids.size)
            if tids.size > 1:
                G = tqu @ tqu.T
                n2 = np.diag(G).copy()
                ok = (G > 0) & (den * G * G >= num * np.outer(n2, n2))
                np.fill_diagonal(ok, False)
                ok[:, :] = np.tril(ok, -1)
                has = ok.any(axis=1)
                first = ok.argmax(axis=1)
                out_v.extend(tids[has].tolist())
                out_d.extend(tids[first[has]].tolist())
        else:
            ma, mb = blk == ba, blk == bb
            ia, qa = ids[ma], qu[ma]
            ib, qb = ids[mb], qu[mb]
            if ia.size and ib.size:
                G = qb @ qa.T  # (nb, na) cross gram
                n2a = np.einsum("ij,ij->i", qa, qa)
                n2b = np.einsum("ij,ij->i", qb, qb)
                ok = (G > 0) & (den * G * G >= num * np.outer(n2b, n2a))
                # lower-id mate in EITHER direction across the tiles
                lower_ba = ia[None, :] < ib[:, None]  # a-side mate lower
                okb = ok & lower_ba
                hasb = okb.any(axis=1)
                if hasb.any():
                    cand = np.where(okb, ia[None, :], _SENTINEL).min(axis=1)
                    out_v.extend(ib[hasb].tolist())
                    out_d.extend(cand[hasb].tolist())
                oka = ok & ~lower_ba
                hasa = oka.any(axis=0)
                if hasa.any():
                    cand = np.where(oka, ib[:, None], _SENTINEL).min(axis=0)
                    out_v.extend(ia[hasa].tolist())
                    out_d.extend(cand[hasa].tolist())
        return pa.table(
            {
                "vec_id": pa.array(out_v, pa.int64()),
                "cluster": pa.array(
                    np.full(len(out_v), cluster, np.int64), pa.int64()
                ),
                "dup_of": pa.array(out_d, pa.int64()),
            }
        )

    folded = (
        joined.map_batches(fan_out, batch_format="pyarrow")
        .groupby(["cluster", "blk_a", "blk_b"])
        .map_groups(tile_kernel, batch_format="pyarrow")
        .groupby(["vec_id", "cluster"])
        .aggregate(Min("dup_of", alias_name="dup_of"))
    )

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("dup_of").to_numpy().astype(np.int64)
        none = d >= int(_SENTINEL)
        return pa.table(
            {
                "vec_id": pc.cast(t.column("vec_id"), pa.int64()),
                "cluster": pc.cast(t.column("cluster"), pa.int64()),
                "dup_of": pa.array(np.where(none, np.int64(-1), d), pa.int64()),
                "keep": pa.array(none),
            }
        )

    return cold_out.union(folded.map_batches(finish, batch_format="pyarrow"))


# ----------------------------------------------- centroid classifier

CLS_SPLIT = 5  # vec_id % CLS_SPLIT == 0 → held-out eval row


def classify_nearest_centroid(embeds, *, split: int = CLS_SPLIT):
    """Nearest-class-mean (Rocchio) classifier over the labeled
    embedding table — the cheap supervised labeler a curation pipeline
    trains to route documents (quality tiers, topics, domains) when a
    full model is too expensive to run per-document.

    Train split: ``vec_id % split != 0``; eval split: ``== 0``.  Over
    +127-shifted int8-quantized vectors (:func:`_quantize_shifted`):

        c_l[d]   = (Σ_{train v∈l} q_vd) // n_l      (floor; operands
                    non-negative ⇒ numpy floor == SQL truncate)
        pred(v)  = argmin_l Σ_d (q_vd − c_ld)²      (first-min tie →
                    lowest label)

    — every centroid component, distance, and verdict is int64, so the
    whole train+eval is bit-exact under any partitioning and
    SQL-replayable (the :func:`kmeans_assign` contract, one round,
    supervised).

    Scale shape: pass 1 emits ≤ L·(dim+1) partial-sum rows per batch
    (per-batch ``np.add.at`` fold first), ONE tiny
    ``groupby(label, d)`` builds the (L, dim) centroid matrix — per-
    batch shuffle volume is corpus-size independent; pass 2 broadcasts
    the matrix in the closure and scores each batch with one int64
    GEMM.  Returns a Dataset ``(vec_id, label, pred, dist2, correct)``
    over the eval split.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def train_partials(t: pa.Table) -> pa.Table:
        ids, q = _quantize_shifted(t)
        labels = t.column("label").cast(pa.int64()).to_numpy()
        tr = ids % split != 0
        q_t, l_t = q[tr], labels[tr]
        if not q_t.shape[0]:
            return pa.table({"label": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(l_t)
        dim = q_t.shape[1]
        sums = np.zeros((len(uniq), dim), np.int64)
        np.add.at(sums, codes, q_t)
        cnt = np.bincount(codes).astype(np.int64)
        lab = np.repeat(uniq.astype(np.int64), dim)
        d = np.tile(np.arange(dim, dtype=np.int64), len(uniq))
        # d = -1 marker rows carry the per-label train counts
        return pa.table(
            {
                "label": pa.array(
                    np.concatenate([lab, uniq.astype(np.int64)]), pa.int64()),
                "d": pa.array(
                    np.concatenate([d, np.full(len(uniq), -1)]), pa.int64()),
                "s": pa.array(
                    np.concatenate([sums.ravel(), cnt]), pa.int64()),
            }
        )

    folded = (
        embeds.map_batches(train_partials, batch_format="pyarrow")
        .groupby(["label", "d"])
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas()
    )
    counts = folded[folded.d < 0].set_index("label")["s"]
    comp = folded[folded.d >= 0].sort_values(["label", "d"])
    labels_sorted = np.sort(counts.index.to_numpy().astype(np.int64))
    dim = int(comp.d.max()) + 1
    cmat = (
        comp.s.to_numpy().astype(np.int64).reshape(len(labels_sorted), dim)
        // counts.loc[labels_sorted].to_numpy().astype(np.int64)[:, None]
    )
    c_sq = np.einsum("ld,ld->l", cmat, cmat)

    def score(t: pa.Table) -> pa.Table:
        ids, q = _quantize_shifted(t)
        labels = t.column("label").cast(pa.int64()).to_numpy()
        ev = ids % split == 0
        ids_e, q_e, l_e = ids[ev], q[ev], labels[ev]
        if not q_e.shape[0]:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("vec_id", "label", "pred", "dist2", "correct")})
        d2 = (
            np.einsum("nd,nd->n", q_e, q_e)[:, None]
            - 2 * (q_e @ cmat.T)
            + c_sq[None, :]
        )
        idx = np.argmin(d2, axis=1)  # first min == lowest label (sorted)
        pred = labels_sorted[idx]
        best = d2[np.arange(d2.shape[0]), idx]
        return pa.table(
            {
                "vec_id": pa.array(ids_e, pa.int64()),
                "label": pa.array(l_e, pa.int64()),
                "pred": pa.array(pred, pa.int64()),
                "dist2": pa.array(best, pa.int64()),
                "correct": pa.array((pred == l_e).astype(np.int64),
                                    pa.int64()),
            }
        )

    return embeds.map_batches(score, batch_format="pyarrow")
