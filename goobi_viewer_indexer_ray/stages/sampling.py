"""Deterministic sampling + exact distributed quantiles.

Training-data curation operators beyond the reference's own surface
(the reference has no sampling — SURVEY.md §2.7 O6 "none in
reference"; large-scale corpus work needs it constantly).

Design rules, 100 TB-first:

- **Sampling is a pure per-row predicate on a content hash**, not a
  random draw: ``keep ⇔ int(md5(key ‖ ':' ‖ salt)[:8], 16) < ⌊p·2³²⌋``.
  That makes it (a) embarrassingly parallel — a plain ``map_batches``
  filter, no coordination, no RNG state, (b) reproducible across
  retries/resumes (a re-executed block samples identically), and
  (c) ANSI-SQL-expressible for the oracle (DuckDB ``md5``; the 8-hex
  prefix compares lexicographically ≡ numerically).  MD5 is the pinned
  cross-engine hash (same precedent as ``dedup.content_hash_batch``);
  the per-row ``hashlib`` call is the documented price of oracle
  parity.
- **Quantiles are exact via a value histogram**: one
  ``groupby(col).count()`` shuffle produces the (value, count)
  relation; the driver folds the CDF over the *distinct-value*
  histogram (the small side — bounded by the value domain, not the
  row count) and reads off ``min{v : F(v) ≥ q}`` — the same
  definition as SQL ``cume_dist``.  For unbounded continuous domains
  pre-bucket (round/scale) first or swap in a mergeable sketch; the
  histogram path is exact whenever the domain is enumerable, which
  covers the corpus-stat use cases (token counts, char counts, status
  codes, years).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "sample_threshold",
    "hash_sample",
    "stratified_sample",
    "temperature_resample",
    "quantiles",
    "grouped_quantiles",
    "weighted_bottom_k",
    "budget_select",
]


def sample_threshold(fraction: float) -> str:
    """8-hex-char keep threshold for ``fraction`` ∈ [0, 1]."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of range: {fraction}")
    if fraction == 1.0:
        return "g"  # lexicographically above every hex digest → keep all
    return f"{int(fraction * 2**32):08x}"


def _hash_keys(keys: np.ndarray) -> np.ndarray:
    """``md5(key)[:8]`` per key (U8 hex array).  The per-row hashlib
    call is the pinned price of DuckDB-oracle parity (see module
    docstring); everything around it is vectorized."""
    return np.fromiter(
        (hashlib.md5(k).hexdigest()[:8] for k in keys),
        dtype="U8",
        count=len(keys),
    )


def _salted_keys(tbl: pa.Table, key_col: str, salt: str) -> np.ndarray:
    """``key ':' salt`` as a numpy bytes array, built with Arrow
    kernels (cast + element-wise binary join — no pandas hop)."""
    joined = pc.binary_join_element_wise(
        pc.cast(tbl[key_col], pa.string()), f":{salt}", ""
    )
    return np.asarray(pc.cast(joined, pa.binary()).combine_chunks())


def hash_sample(ds, *, key_col: str, fraction: float, salt: str = "s0"):
    """Deterministic ``fraction``-rate sample keyed on ``key_col``.

    Rows whose hashed key falls under the threshold are kept — the
    SAME rows every run, every retry, every engine (oracle:
    ``substr(md5(key || ':' || salt), 1, 8) < '<threshold>'``).
    """
    thr = sample_threshold(fraction)
    salt_s = str(salt)

    def part(tbl: pa.Table) -> pa.Table:
        h = _hash_keys(_salted_keys(tbl, key_col, salt_s))
        return tbl.filter(pa.array(h < np.array(thr, dtype="U8")))

    return ds.map_batches(part, batch_format="pyarrow")


def stratified_sample(ds, *, key_col: str, strata_col: str,
                      fractions: dict[str, float], default: float = 0.0,
                      salt: str = "s0"):
    """Per-stratum deterministic sampling (e.g. per-language rates —
    the classic corpus rebalancing move).  Strata not listed in
    ``fractions`` — including NULL strata — keep ``default`` rate.
    ``fractions`` keys are matched against the stratum's STRING form
    (the column is cast to string before lookup).  Same hash rule as
    :func:`hash_sample`, so a stratum's sample is a superset of any
    smaller rate's — rates can be tuned without resampling churn.
    """
    thr_map = {s: sample_threshold(f) for s, f in fractions.items()}
    thr_default = sample_threshold(default)
    salt_s = str(salt)

    def part(tbl: pa.Table) -> pa.Table:
        # Per-stratum threshold via dictionary-encode: map each DISTINCT
        # stratum once, then gather by code — no per-row dict lookup.
        # Null strata take the default rate (slot appended at the end);
        # the dictionary lookup is by the stratum's STRING form — the
        # documented key contract for `fractions`.
        enc = pc.dictionary_encode(
            pc.cast(tbl[strata_col], pa.string())
        ).combine_chunks()
        uniq = np.array(
            [thr_map.get(s, thr_default) for s in enc.dictionary.to_pylist()]
            + [thr_default],
            dtype="U8",
        )
        idx = np.asarray(pc.fill_null(enc.indices, len(uniq) - 1)).astype(np.int64)
        thr = uniq[idx] if len(tbl) else np.empty(0, "U8")
        h = _hash_keys(_salted_keys(tbl, key_col, salt_s))
        return tbl.filter(pa.array(h < thr))

    return ds.map_batches(part, batch_format="pyarrow")


def temperature_resample(ds, *, key_col: str, strata_col: str,
                         weight_col: str, temperature: float = 2.0,
                         salt: str = "s0"):
    """Temperature-based mixture rebalancing (the multilingual /
    multi-source pretraining data-mixing move): target mixture
    ``q_s ∝ p_s^(1/T)`` over the strata's weight shares ``p_s``,
    realized as deterministic downsampling — per-stratum keep rate
    ``r_s = (w_min / w_s)^(1/T)`` (the lightest stratum keeps
    everything; heavier strata shrink toward the tempered mixture).
    ``T = 1`` is a no-op, ``T → ∞`` approaches uniform-by-stratum.

    Two passes, both scale-clean: ONE ``groupby(strata)`` for the
    integer weight totals (the small side — one row per stratum),
    then the same coordination-free md5-threshold filter as
    :func:`stratified_sample` — reproducible across retries/engines,
    and a stratum's sample is a subset of any higher-T run's.

    ``weight_col`` must be integer per-row weights (token counts);
    the rate math is float64 ``(w_min/w)^(1/T)`` — with ``T = 2``
    that is division + an exactly-specified libm ``pow(x, 0.5)``,
    reproducible in the DuckDB oracle.
    """
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    from ray.data.aggregate import Sum

    totals = pa.concat_tables(
        ds.groupby(strata_col)
        .aggregate(Sum(on=weight_col, alias_name="w"))
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    strata = totals.column(strata_col).to_pylist()
    w = totals.column("w").to_numpy()
    if len(w) == 0:
        return stratified_sample(ds, key_col=key_col, strata_col=strata_col,
                                 fractions={}, default=0.0, salt=salt)
    w_min = int(w.min())
    # keys stringified (stratified_sample's lookup contract); the
    # minimum-weight strata keep everything EXACTLY (also dodges 0/0
    # when an all-empty stratum makes w_min == 0 — the SQL oracle's
    # `w = w_min → keep` arm)
    fractions = {
        str(s): (1.0 if int(ws) == w_min
                 else float((w_min / int(ws)) ** (1.0 / temperature)))
        for s, ws in zip(strata, w)
    }
    return stratified_sample(ds, key_col=key_col, strata_col=strata_col,
                             fractions=fractions, default=0.0, salt=salt)


def _cdf_pick(values: np.ndarray, counts: np.ndarray, qs: list[float]):
    """min{v : F(v) ≥ q} over a sorted value histogram."""
    order = np.argsort(values, kind="stable")
    v, c = values[order], counts[order]
    cum = np.cumsum(c, dtype=np.float64)
    total = cum[-1]
    out = []
    for q in qs:
        idx = int(np.searchsorted(cum / total, q, side="left"))
        out.append(v[min(idx, len(v) - 1)])
    return out


def quantiles(ds, col: str, qs: list[float]) -> pa.Table:
    """Exact quantiles of ``col`` (``cume_dist`` definition:
    ``min{v : F(v) ≥ q}``).  One count-shuffle over distinct values;
    driver work is O(|domain|)."""
    hist = ds.groupby(col).count().to_pandas()
    v = hist[col].to_numpy()
    c = hist["count()"].to_numpy()
    picks = _cdf_pick(v, c, qs)
    return pa.table(
        {
            "q": pa.array([float(q) for q in qs], pa.float64()),
            "value": pa.array([int(p) for p in picks], pa.int64()),
        }
    )


def grouped_quantiles(ds, *, group_col: str, col: str, qs: list[float]) -> pa.Table:
    """Per-group exact quantiles: ``groupby(group, value).count()``
    histogram shuffle, then a vectorized per-group CDF fold on the
    (group × distinct-value) small side."""
    hist = ds.groupby([group_col, col]).count().to_pandas()
    hist = hist.sort_values([group_col, col], kind="stable")
    g = hist[group_col].to_numpy()
    v = hist[col].to_numpy()
    c = hist["count()"].to_numpy(dtype=np.float64)
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], g.size]
    out_g, out_q, out_v = [], [], []
    for s, e in zip(starts, ends):  # per GROUP (small side), not per row
        picks = _cdf_pick(v[s:e], c[s:e], qs)
        out_g.extend([g[s]] * len(qs))
        out_q.extend(float(q) for q in qs)
        out_v.extend(int(p) for p in picks)
    return pa.table(
        {
            group_col: pa.array(out_g),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.int64()),
        }
    )


def weighted_bottom_k(ds, *, key_col: str, weight_col: str, k: int,
                      salt: str = "w0"):
    """Exact-k weighted sample via integer priority ordering (the
    bottom-k / priority-sampling family — Duffield et al. 2007 — with
    floor arithmetic instead of the float ``-ln(u)/w`` key, so the
    pick is bit-deterministic and SQL-replicable): item priority is
    ``(md5_hash64(key‖':'‖salt) >> 2) // max(weight, 1)`` and the
    sample is the k lexicographically-smallest ``(priority, key)``
    rows — heavier rows draw smaller priorities ∝ 1/weight, the
    quality-weighted pick a curation pipeline uses when it needs an
    EXACT sample size (``temperature_resample`` is the rate-based
    sibling).  The 62-bit shift keeps every value int64-safe on both
    engines.

    Shape: per-batch bottom-k partials (vectorized lexsort) shrink the
    stream to ≤ k rows per block — correct because the global bottom-k
    always survives per-batch truncation — then one tiny
    ``sort().limit(k)`` over ≤ k × #blocks candidates.  No full-corpus
    sort, no driver materialization of anything but the k winners."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).cast(pa.string()).to_pylist()
        hv = _hash64([f"{x}:{salt}" for x in keys])
        w = np.maximum(t.column(weight_col).cast(pa.int64()).to_numpy(), 1)
        prio = ((hv >> np.uint64(2)).astype(np.int64)) // w
        kid = t.column(key_col).cast(pa.int64()).to_numpy()
        order = np.lexsort((kid, prio))[:k]
        return pa.table(
            {
                key_col: pa.array(kid[order], pa.int64()),
                weight_col: pa.array(
                    t.column(weight_col).cast(pa.int64()).to_numpy()[order], pa.int64()
                ),
                "priority": pa.array(prio[order], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["priority", key_col])
        .limit(k)
    )


def _hash64(keys) -> np.ndarray:
    """uint64 md5-prefix hashes (big-endian first 8 bytes — the
    ``('0x'||substr(md5(x),1,16))::UBIGINT`` SQL twin)."""
    from ..functions.hashing import md5_hash64_array

    return md5_hash64_array(keys)


def budget_select(scored, *, budget: int, score_col: str = "score_num",
                  weight_col: str = "n_tokens", key_col: str = "doc_id",
                  coarse_shift: int = 6):
    """Token-budget data selection: keep the highest-scoring docs whose
    cumulative token weight fits ``budget``, ordered by
    ``(score desc, key asc)`` — the "select the best N tokens" move a
    pretraining pipeline runs after quality scoring (the budgeted
    counterpart of a fixed-threshold quality filter).

    Exact and distributed via the two-level pattern the quantile /
    pack_assign operators established:

    1. ONE ``groupby(score >> coarse_shift)`` folds per-bucket weight
       totals (bucket count is bounded by the score RANGE / 2^shift,
       corpus-size independent — the driver never sees per-doc rows);
    2. the driver scans bucket totals score-descending to find the
       BOUNDARY bucket (everything above it fits, everything below it
       doesn't);
    3. only the boundary bucket's rows (≈ 1/2^shift of the range, not
       of the corpus) are pulled to resolve the exact (score, key)
       cut inside it; a skewed boundary bucket would recurse with a
       finer shift — documented, not needed at these scales;
    4. one broadcast (boundary score-set) stream pass emits the
       verdict for every row.

    Returns ``(key, score, weight, kept)`` — kept ⟺ running total
    through the doc (in global (score desc, key) order) ≤ budget.
    The SQL oracle is one window cumsum.
    """
    import ray

    if budget < 0:
        raise ValueError("budget must be >= 0")
    scored = scored.materialize()

    def bucket_partial(t: pa.Table) -> pa.Table:
        s = t.column(score_col).cast(pa.int64()).to_numpy()
        w = t.column(weight_col).cast(pa.int64()).to_numpy()
        b = s >> coarse_shift  # arithmetic shift floors negatives
        vals, inv = np.unique(b, return_inverse=True)
        sums = np.zeros(vals.size, np.int64)
        np.add.at(sums, inv, w)
        return pa.table(
            {
                "b": pa.array(vals, pa.int64()),
                "w": pa.array(sums, pa.int64()),
            }
        )

    totals = pa.concat_tables(
        scored.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("b")
        .sum("w")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    b_ids = totals.column("b").to_numpy()
    b_w = totals.column("sum(w)").to_numpy()
    order = np.argsort(-b_ids, kind="stable")  # score-descending
    b_ids, b_w = b_ids[order], b_w[order]
    cum = np.cumsum(b_w)
    # boundary = first bucket whose inclusion overflows the budget
    over = np.flatnonzero(cum > budget)
    if over.size == 0:  # everything fits
        nb, above_total = None, 0
    else:
        i = int(over[0])
        nb = int(b_ids[i])
        above_total = int(cum[i - 1]) if i else 0

    cut = None  # (score, key) of the last kept doc inside the boundary
    if nb is not None:
        def pick_boundary(t: pa.Table, nb=nb) -> pa.Table:
            s = t.column(score_col).cast(pa.int64()).to_numpy()
            return t.filter(pa.array((s >> coarse_shift) == nb))

        bnd = pa.concat_tables(
            ray.get(
                scored.map_batches(
                    pick_boundary, batch_format="pyarrow"
                ).to_arrow_refs()
            )
        )
        s = bnd.column(score_col).cast(pa.int64()).to_numpy()
        k = bnd.column(key_col).cast(pa.int64()).to_numpy()
        w = bnd.column(weight_col).cast(pa.int64()).to_numpy()
        o = np.lexsort((k, -s))
        run = above_total + np.cumsum(w[o])
        fit = np.flatnonzero(run <= budget)
        if fit.size:
            last = int(fit[-1])
            cut = (int(s[o][last]), int(k[o][last]))
    cfg = ray.put((nb, cut, above_total))

    def verdict(t: pa.Table) -> pa.Table:
        nb_, cut_, _ = ray.get(cfg)
        s = t.column(score_col).cast(pa.int64()).to_numpy()
        k = t.column(key_col).cast(pa.int64()).to_numpy()
        w = t.column(weight_col).cast(pa.int64()).to_numpy()
        if nb_ is None:
            kept = np.ones(s.size, bool)
        else:
            b = s >> coarse_shift
            kept = b > nb_
            if cut_ is not None:
                cs, ck = cut_
                inb = b == nb_
                kept |= inb & ((s > cs) | ((s == cs) & (k <= ck)))
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                score_col: pa.array(s, pa.int64()),
                weight_col: pa.array(w, pa.int64()),
                "kept": pa.array(kept),
            }
        )

    return scored.map_batches(verdict, batch_format="pyarrow")
