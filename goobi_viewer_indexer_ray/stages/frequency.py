"""Frequent-term (heavy-hitter) mining: local-threshold sketch + exact
recount.

Corpus-curation operator (vocabulary pruning, stopword discovery,
boilerplate detection) with the classic two-phase shape used by every
verify path in this repo:

1. **Candidate sketch** (one ``map_batches`` pass): each batch counts
   its own tokens exactly (``pd.factorize`` + ``bincount`` — the batch
   is already in memory, so a full local count is cheaper and strictly
   more accurate than a decrementing Misra-Gries loop; MG with
   capacity ⌈1/σ⌉ is the constant-memory swap-in if per-batch distinct
   vocab ever outgrows the worker) and emits only terms with local
   share ≥ σ.  Pigeonhole over batches: a term with GLOBAL share ≥ σ
   must have share ≥ σ in at least one batch — summing the negation
   ``cf_b·B < bp·n_b`` over batches contradicts ``cf·B ≥ bp·N`` — so
   the candidate union has NO false negatives.  All threshold math is
   integer (basis points) on both engines; no float boundary risk.
2. **Exact recount** (second pass + tiny shuffle): candidate vocab is
   broadcast (``ray.put``); each batch re-counts ONLY candidate terms
   (vectorized ``np.isin`` over factorized codes) and emits per-batch
   partials plus one ``_total_`` row carrying the batch token count
   (``_total_`` cannot collide — the tokenizer's ``[^\\W_]+`` never
   emits underscores).  A ``groupby(term).sum()`` over this
   candidates-only relation (≪ the full term shuffle of a naive
   groupby) finalizes, and the driver filters false positives by the
   exact global threshold.

Returns exactly the terms with ``cf·10000 ≥ σ_bp·total`` — an
ANSI-SQL-checkable contract despite the sketch in the middle.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import TOKEN_RE

__all__ = ["frequent_terms", "kmv_distinct_bigrams", "hll_registers_bigrams",
           "cms_heavy_hitters", "ks_drift", "TOTAL_SENTINEL"]

TOTAL_SENTINEL = "_total_"  # unreachable by the underscore-free tokenizer


def _batch_token_codes(batch: pa.Table):
    texts = batch.column("text").to_pylist()
    findall = TOKEN_RE.findall
    norm = unicodedata.normalize
    flat: list[str] = []
    for t in texts:
        if t:
            flat.extend(findall(norm("NFC", t).lower()))
    if not flat:
        return None, None
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    return codes, uniq


def frequent_terms(ds, *, sigma_bp: int, min_batch_rows: int | None = None):
    """Terms whose corpus-wide occurrence share is ≥ ``sigma_bp``
    basis points (1 bp = 0.01%).  Returns a sorted pandas DataFrame
    ``(term, cf)``; the total used for the threshold is the exact
    corpus token count."""
    import ray
    from ray.data.aggregate import Sum

    def candidates(batch: pa.Table) -> pa.Table:
        codes, uniq = _batch_token_codes(batch)
        if codes is None:
            return pa.table({"term": pa.array([], pa.string())})
        cnt = np.bincount(codes, minlength=len(uniq))
        keep = cnt.astype(np.int64) * 10_000 >= np.int64(sigma_bp) * codes.size
        return pa.table({"term": pa.array(uniq[keep], pa.string())})

    _empty = pd.DataFrame({"term": pd.Series([], dtype=object),
                           "cf": pd.Series([], dtype="int64")})
    cand = ds.map_batches(candidates, batch_format="pyarrow").to_pandas()
    if cand.empty:  # all-empty blocks can drop the schema entirely
        return _empty
    vocab = np.unique(cand["term"].to_numpy(dtype=object))
    vocab_sorted = np.sort(vocab)
    vocab_ref = ray.put(vocab_sorted)

    def recount(batch: pa.Table) -> pa.Table:
        cv = ray.get(vocab_ref)
        codes, uniq = _batch_token_codes(batch)
        if codes is None:
            return pa.table(
                {"term": pa.array([], pa.string()), "cf": pa.array([], pa.int64())}
            )
        total = codes.size
        hit = np.isin(uniq, cv)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        terms = np.append(uniq[hit], TOTAL_SENTINEL)
        cfs = np.append(cnt[hit], np.int64(total))
        return pa.table(
            {"term": pa.array(terms, pa.string()), "cf": pa.array(cfs, pa.int64())}
        )

    agg = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf", alias_name="cf"))
        .to_pandas()
    )
    if agg.empty or "term" not in agg.columns:
        return _empty
    total = int(agg.loc[agg["term"] == TOTAL_SENTINEL, "cf"].iloc[0])
    out = agg[agg["term"] != TOTAL_SENTINEL].copy()
    out["cf"] = out["cf"].astype("int64")
    out = out[out["cf"] * 10_000 >= sigma_bp * total]
    return out.sort_values("term").reset_index(drop=True)


# ------------------------------------------------------------ KMV sketch

def kmv_distinct_bigrams(ds, *, k: int = 64, with_exact: bool = True):
    """KMV (k-minimum-values) distinct-bigram sketch per ``source`` —
    the integer-exact alternative to HyperLogLog for cardinality
    estimation over a 100 TB corpus (distinct n-grams per crawl source
    is the standard diversity signal next to ``dup_ngram_stats``).

    Estimator (Bar-Yossef et al. 2002): hash every distinct value to
    uint64, keep the k smallest; if fewer than k distinct survive the
    stream, the sketch IS exact, else ``est = (k-1) * 2^64 // h_k``.
    ALL arithmetic is integer (Python int / SQL HUGEINT), and the hash
    is the repo's md5-prefix convention — so the DuckDB oracle can
    replay the estimator bit-for-bit, unlike HLL's float harmonic
    mean.  Bigrams are the hashed value (space-joined, NFC+lower
    tokens — the ``_TOKS`` twin every text oracle shares).

    Shape: ONE ``map_batches`` pass (per-batch distinct (source, hv)
    pairs, vectorized: factorize tokens → composite bigram codes → md5
    only on the batch-unique bigrams) + ONE ``groupby(source)``.
    ``with_exact=True`` (the verification mode the catalog gate uses)
    ships every batch-distinct pair so the finalizer can also emit the
    true ``n_exact``; ``with_exact=False`` is the PRODUCTION mode —
    partials truncate to their bottom-k, capping the shuffle at
    k rows × sources × batches, and the estimate is IDENTICAL because
    the global bottom-k survives per-batch bottom-k truncation
    (pytest pins both modes equal)."""
    def partial(batch: pa.Table) -> pa.Table:
        src_uniq, psrc, hv = _batch_distinct_bigram_hashes(batch)
        empty = pa.table(
            {"source": pa.array([], pa.string()), "hv": pa.array([], pa.uint64())}
        )
        if hv.size == 0:
            return empty
        if not with_exact:
            keep = np.zeros(hv.size, dtype=bool)
            for s in np.unique(psrc):
                idx = np.flatnonzero(psrc == s)
                if idx.size > k:
                    idx = idx[np.argpartition(hv[idx], k - 1)[:k]]
                keep[idx] = True
            psrc, hv = psrc[keep], hv[keep]
        return pa.table(
            {
                "source": pa.array(src_uniq[psrc], pa.string()),
                "hv": pa.array(hv, pa.uint64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        hvs = np.unique(df["hv"].to_numpy(dtype=np.uint64))
        if hvs.size < k:
            est = int(hvs.size)
        else:
            est = ((k - 1) * (1 << 64)) // int(np.sort(hvs)[k - 1])
        out = {"source": [df["source"].iloc[0]], "kmv_est": [est]}
        if with_exact:
            out["n_exact"] = [int(hvs.size)]
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final, batch_format="pandas")
    )


def _batch_distinct_bigram_hashes(batch: pa.Table):
    """Batch-distinct (source, bigram) md5-prefix hashes, fully
    vectorized: factorize tokens → composite bigram codes → md5 only
    on the batch-unique bigram strings.  Returns ``(src_uniq, psrc,
    hv)`` — the unique source strings, per-pair source codes into it,
    and the uint64 hashes (empty arrays when no bigram exists).
    Shared core of the KMV and HLL cardinality sketches."""
    from ..functions.hashing import md5_hash64_array

    def _empty():
        return (
            np.empty(0, dtype=object),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.uint64),
        )

    texts = batch.column("text").to_pylist()
    codes_src, src_uniq = pd.factorize(
        np.asarray(batch.column("source").to_pylist(), dtype=object)
    )
    findall = TOKEN_RE.findall
    norm = unicodedata.normalize
    counts = np.empty(len(texts), dtype=np.int64)
    flat: list[str] = []
    for i, t in enumerate(texts):
        toks = findall(norm("NFC", t).lower()) if t else []
        counts[i] = len(toks)
        flat.extend(toks)
    if len(flat) < 2:
        return _empty()
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
    valid = np.ones(codes.size, dtype=bool)
    ends = np.cumsum(counts[counts > 0])
    valid[ends - 1] = False
    lead = np.flatnonzero(valid)
    if lead.size == 0:
        return _empty()
    v = np.int64(uniq.size)
    key = codes[lead] * v + codes[lead + 1]
    src_per_tok = np.repeat(codes_src, counts)[lead]
    pair = np.unique(src_per_tok.astype(np.int64) * (v * v) + key)
    psrc, pkey = pair // (v * v), pair % (v * v)
    # md5 only on the batch-unique bigram strings
    ukey, inv = np.unique(pkey, return_inverse=True)
    w1, w2 = uniq[(ukey // v)], uniq[(ukey % v)]
    hv_uniq = md5_hash64_array([a + " " + b for a, b in zip(w1, w2)])
    return np.asarray(src_uniq, dtype=object), psrc, hv_uniq[inv]


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values (0 → 0), vectorized with
    integer shifts — float ``log2`` misrounds near powers of two above
    2⁵³ (e.g. 2⁵⁸−1 rounds UP), so no floats anywhere."""
    x = x.astype(np.uint64, copy=True)
    r = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        r[m] += s
        x[m] >>= np.uint64(s)
    r[x > 0] += 1
    return r


def hll_registers_bigrams(ds, *, p: int = 6):
    """HyperLogLog registers per ``source`` over distinct bigrams —
    the float-free HLL gate: the OUTPUT is the integer register table
    ``(source, bucket, max_rho)`` (2^p buckets; rho = leading-zero
    count of the remaining 64−p hash bits + 1), not the harmonic-mean
    estimate, so the DuckDB oracle replays it bit-for-bit with
    ``length(bin(rem))`` (the estimate is a deterministic driver-side
    fold over ≤ 2^p rows per source if a caller wants it).

    Shape: the KMV sketch's shared vectorized core
    (:func:`_batch_distinct_bigram_hashes`) per batch, reduced to
    ≤ sources × 2^p register rows per batch (``np.maximum.at``), then
    ONE ``groupby(source, bucket).max`` — shuffle volume is
    register-bounded, corpus-size independent, the production HLL
    merge shape (registers are max-mergeable)."""
    from ray.data.aggregate import Max

    shift = np.uint64(64 - p)
    mask = np.uint64((1 << (64 - p)) - 1)
    rho_cap = np.int64(64 - p + 1)

    def partial(batch: pa.Table) -> pa.Table:
        src_uniq, psrc, hv = _batch_distinct_bigram_hashes(batch)
        if hv.size == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64()),
                    "rho": pa.array([], pa.int64()),
                }
            )
        bucket = (hv >> shift).astype(np.int64)
        rem = hv & mask
        rho = rho_cap - _bitlen_u64(rem)  # rem == 0 → rho_cap
        # per-batch register fold: one row per (source, bucket) seen
        code = psrc * (1 << p) + bucket
        ucode, inv = np.unique(code, return_inverse=True)
        reg = np.zeros(ucode.size, dtype=np.int64)
        np.maximum.at(reg, inv, rho)
        return pa.table(
            {
                "source": pa.array(src_uniq[ucode // (1 << p)], pa.string()),
                "bucket": pa.array(ucode % (1 << p), pa.int64()),
                "rho": pa.array(reg, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .aggregate(Max("rho"))
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "bucket": pc.cast(t.column("bucket"), pa.int64()),
                "max_rho": pc.cast(t.column("max(rho)"), pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


CMS_D = 4    # hash rows
CMS_W = 64   # cells per row


def cms_heavy_hitters(ds, *, d: int = CMS_D, w: int = CMS_W, top: int = 20):
    """Count-Min sketch heavy-hitter estimates (Cormode &
    Muthukrishnan 2005) next to the exact counts — the third sketch of
    the cardinality/frequency family (KMV, HLL, CMS).  The sketch is a
    ``d × w`` integer counter matrix; every term occurrence increments
    one cell per row (``cell = md5_u64(f"{r}:{term}") % w``), and a
    term's estimate is the MIN over its ``d`` cells — never an
    underestimate, with the paper's ε = e/w overcount bound whp.

    Shape: ONE ``map_batches`` pass emits per-batch partial cell
    counts (≤ d·w rows per batch — the sketch, not the vocabulary,
    crosses the wire) + ONE bounded ``groupby(r, cell)``; counter
    matrices are entrywise-addable, which is exactly that groupby-sum.
    The exact side (for the ``top`` comparison terms) is the usual
    term groupby.  Both the cell hash and the min-fold are integer, so
    the DuckDB oracle replays the sketch bit-for-bit.

    Returns ``(term, cf, cms_est)`` for the top-``top`` terms by
    (cf desc, term) — ``cms_est ≥ cf`` always (pytest-pinned)."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_hash64_array

    def sketch_partial(batch: pa.Table) -> pa.Table:
        codes, uniq = _batch_token_codes(batch)
        if codes is None:
            return pa.table(
                {
                    "r": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        cf = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        mat = np.zeros((d, w), np.int64)
        for r in range(d):
            cells = (md5_hash64_array([f"{r}:{t}" for t in uniq])
                     % np.uint64(w)).astype(np.int64)
            np.add.at(mat[r], cells, cf)
        rr, cc = np.nonzero(mat)
        return pa.table(
            {
                "r": pa.array(rr.astype(np.int64), pa.int64()),
                "cell": pa.array(cc.astype(np.int64), pa.int64()),
                "cnt": pa.array(mat[rr, cc], pa.int64()),
            }
        )

    def exact_partial(batch: pa.Table) -> pa.Table:
        codes, uniq = _batch_token_codes(batch)
        if codes is None:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cf": pa.array([], pa.int64())}
            )
        cf = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"term": pa.array(uniq.astype(str), pa.string()),
             "cf": pa.array(cf, pa.int64())}
        )

    # the sketch is d·w rows BY CONSTRUCTION — the documented bounded
    # small side (corpus-size independent), safe on the driver
    sketch = np.zeros((d, w), np.int64)
    for row in (
        ds.map_batches(sketch_partial, batch_format="pyarrow")
        .groupby(["r", "cell"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    ):
        sketch[int(row["r"]), int(row["cell"])] = int(row["cnt"])

    cand = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf", alias_name="cf"))
        .sort(["cf", "term"], descending=[True, False])
        .limit(top)
        .take_all()
    )
    terms = [r["term"] for r in cand]
    cfs = np.array([int(r["cf"]) for r in cand], np.int64)
    est = np.full(len(terms), np.iinfo(np.int64).max, np.int64)
    for r in range(d):
        cells = (md5_hash64_array([f"{r}:{t}" for t in terms])
                 % np.uint64(w)).astype(np.int64)
        est = np.minimum(est, sketch[r, cells])
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "cf": pa.array(cfs, pa.int64()),
            "cms_est": pa.array(est, pa.int64()),
        }
    )


def ks_drift(ds, *, group_col: str = "source", value_col: str = "n_chars"):
    """Per-group two-sample Kolmogorov-Smirnov drift vs the whole
    corpus, INTEGER-exact — the distribution-shift screen a curation
    pipeline runs per crawl source / per snapshot (is this source's
    doc-length profile drifting from the corpus?).

    The KS statistic sup|F_g − F| is evaluated only at observed
    values, and both ECDFs are rational with denominators n_g·N — so
    the comparison runs on the integer numerator
    ``ks_num = max over v of |cum_g(v)·N − cum_all(v)·n_g|`` and
    ``ks_bp = 10⁴·ks_num // (N·n_g)``; no float boundary anywhere.

    Shape: ONE ``groupby(group, value).count()`` — the only shuffle —
    then the finalize folds the (groups × distinct values) summary on
    the driver.  That summary is the documented small side for
    bounded-cardinality metrics (lengths, scores, bucketed values); an
    unbounded continuous metric should be bucketed upstream first,
    which only coarsens the sup."""
    grouped = ds.groupby([group_col, value_col]).count().take_all()
    if not grouped:
        return pa.table(
            {
                group_col: pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "ks_num": pa.array([], pa.int64()),
                "ks_bp": pa.array([], pa.int64()),
            }
        )
    src = np.asarray([r[group_col] for r in grouped], dtype=object)
    val = np.asarray([int(r[value_col]) for r in grouped], np.int64)
    cnt = np.asarray([int(r["count()"]) for r in grouped], np.int64)
    vals = np.unique(val)
    vpos = np.searchsorted(vals, val)
    total = np.zeros(vals.size, np.int64)
    np.add.at(total, vpos, cnt)
    ca = np.cumsum(total)
    n_all = int(ca[-1])
    groups = np.unique(src)
    out_g, out_n, out_num, out_bp = [], [], [], []
    for g in groups:
        m = src == g
        per = np.zeros(vals.size, np.int64)
        np.add.at(per, vpos[m], cnt[m])
        cs = np.cumsum(per)
        n_g = int(cs[-1])
        d = int(np.max(np.abs(cs * n_all - ca * n_g)))
        out_g.append(g)
        out_n.append(n_g)
        out_num.append(d)
        out_bp.append(10000 * d // (n_all * n_g))
    return pa.table(
        {
            group_col: pa.array(out_g, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
            "ks_num": pa.array(out_num, pa.int64()),
            "ks_bp": pa.array(out_bp, pa.int64()),
        }
    )
