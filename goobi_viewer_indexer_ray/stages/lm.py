"""Bigram-LM perplexity scoring — the CCNet-style quality gate.

The canonical web-corpus curation move the catalog did not yet cover:
train a small language model on a TRUSTED slice of the corpus, score
every document's cross-entropy under it, and keep the low-perplexity
(fluent) tail.  Production systems use a pruned KenLM; the contract
here is a Laplace-smoothed bigram model whose every score is replayed
bit-for-bit by the SQL oracle.

Integer-exact scoring
---------------------

Per-bigram surprisal is fixed-point **micro-bits**::

    L(w1, w2) = round( log2( (c_head(w1) + V) / (c_bg(w1, w2) + 1) ) * 1e6 )

with ``c_bg`` the model-slice count of the bigram, ``c_head`` the
model-slice count of ``w1`` as a bigram head, and ``V`` the
model-slice distinct-token count (Laplace add-one over a ``V``-way
successor choice; unseen heads degrade to ``log2 V``).  ``L`` is the
ONLY float step, one per distinct bigram, and a rational ratio's
``log2`` is never exactly ``k + 0.5`` micro-bits (log2 of a rational
is integer or irrational), so the half-even/half-away rounding split
between numpy and SQL cannot bite.  Everything after ``L`` is int64:
a document scores ``ce_micro = (Σ cnt·L) // n_bigrams`` — exact under
any partitioning, summation order, or engine.

Scale shape
-----------

- **Model build**: map-side bigram partials (`bigram_counts_batch`)
  over the model slice, one small ``groupby(w1, w2)`` combine — the
  model is the documented broadcast small side (a pruned LM at real
  scale), shipped once via ``ray.put``.
- **Scoring**: one streaming pass; per batch ONE factorize + ONE
  ``np.unique`` over composite bigram keys, then a dict lookup per
  *distinct* batch bigram (bounded by model size, never per token)
  and an integer segment-sum per doc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text_ops import _flat_token_codes, _seg_sums, bigram_counts_batch

__all__ = ["bigram_lm_model", "perplexity_score",
           "stupid_backoff_model", "stupid_backoff_score"]

MICRO = 1_000_000


def bigram_lm_model(ds, *, model_source: str) -> dict:
    """Documents → Laplace bigram model trained on ``source ==
    model_source``: ``{"bg": {(w1, w2): count}, "heads": {w1: count},
    "v": distinct-token count}``."""
    from ray.data.aggregate import Sum

    def part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("source"), model_source))
        return bigram_counts_batch(t)

    agg = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
    )
    bg: dict[tuple[str, str], int] = {}
    heads: dict[str, int] = {}
    for r in agg.take_all():
        c = int(r["n"])
        bg[(r["w1"], r["w2"])] = c
        heads[r["w1"]] = heads.get(r["w1"], 0) + c

    def vocab_part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("source"), model_source))
        _ids, _counts, _codes, uniq = _flat_token_codes(t)
        return pa.table({"t": pa.array(uniq, pa.string())})

    vocab: set[str] = set()
    for r in ds.map_batches(vocab_part, batch_format="pyarrow").take_all():
        vocab.add(r["t"])
    return {"bg": bg, "heads": heads, "v": len(vocab)}


def _surprisal_micro(model: dict, w1: str, w2: str) -> int:
    ch = model["heads"].get(w1, 0)
    cb = model["bg"].get((w1, w2), 0)
    return int(np.round(np.log2((ch + model["v"]) / (cb + 1.0)) * MICRO))


def perplexity_score(ds, model: dict, *, keep_below: int):
    """Documents → ``(doc_id, n_bigrams, ce_micro, keep)``; docs with
    no bigram (< 2 tokens) are dropped.  ``ce_micro`` is mean
    surprisal in micro-bits; ``keep = ce_micro <= keep_below``."""
    import ray

    ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids, counts, codes, uniq = _flat_token_codes(t)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "ce_micro": pa.array([], pa.int64()),
                "keep": pa.array([], pa.bool_()),
            }
        )
        if codes.size < 2:
            return empty
        # positions that start a bigram: all but each doc's last token
        valid = np.ones(codes.size, dtype=bool)
        ends = np.cumsum(counts[counts > 0])
        valid[ends - 1] = False
        lead = np.flatnonzero(valid)
        if lead.size == 0:
            return empty
        v = np.int64(uniq.size)
        key = codes[lead] * v + codes[lead + 1]
        ukey, inv = np.unique(key, return_inverse=True)
        lut = np.fromiter(
            (_surprisal_micro(m, uniq[k // v], uniq[k % v]) for k in ukey),
            np.int64,
            ukey.size,
        )
        per_pos = lut[inv]
        # integer segment-sum of surprisals per doc (prefix-sum diff)
        nbg = np.maximum(counts - 1, 0)
        tot = _seg_sums(per_pos, nbg)
        sel = nbg > 0
        ce = tot[sel] // nbg[sel]
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "n_bigrams": pa.array(nbg[sel], pa.int64()),
                "ce_micro": pa.array(ce, pa.int64()),
                "keep": pa.array(ce <= keep_below, pa.bool_()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def stupid_backoff_model(ds, *, model_source: str) -> dict:
    """Laplace-bigram model PLUS the unigram table Stupid Backoff
    (Brants et al. 2007 — the web-scale smoothing that skips
    normalization entirely) backs off to: adds ``uni`` (model-slice
    token counts) and ``t`` (slice token total) to
    :func:`bigram_lm_model`'s output."""
    from ray.data.aggregate import Sum

    m = bigram_lm_model(ds, model_source=model_source)

    def uni_part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("source"), model_source))
        _ids, _counts, codes, uniq = _flat_token_codes(t)
        if codes.size == 0:
            return pa.table({"t": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"t": pa.array(uniq, pa.string()),
                         "n": pa.array(cnt, pa.int64())})

    uni: dict[str, int] = {}
    for r in (
        ds.map_batches(uni_part, batch_format="pyarrow")
        .groupby("t")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    ):
        uni[r["t"]] = int(r["n"])
    m["uni"] = uni
    m["t"] = sum(uni.values())
    return m


def _sb_surprisal_micro(model: dict, w1: str, w2: str) -> tuple[int, int]:
    """(micro-bits, backed_off 0/1) under Stupid Backoff: seen bigram
    scores ``−log2(c_bg/c_head)``; otherwise ``−log2(0.4 · (c_uni+1) /
    (T+V))`` — every ratio rational, so the single rounding step never
    sits on a half-microbit boundary (the :mod:`lm` float contract)."""
    cb = model["bg"].get((w1, w2), 0)
    if cb > 0:
        ch = model["heads"][w1]
        return int(np.round(np.log2(ch / cb) * MICRO)), 0
    cu = model["uni"].get(w2, 0)
    ratio = (5.0 * (model["t"] + model["v"])) / (2.0 * (cu + 1))
    return int(np.round(np.log2(ratio) * MICRO)), 1


def stupid_backoff_score(ds, model: dict):
    """Documents → ``(doc_id, n_bigrams, sb_micro, backoff_bp)``:
    mean Stupid-Backoff surprisal in micro-bits plus the share of
    bigram positions that backed off to the unigram (the
    out-of-model-distribution signal).  Same one-pass
    distinct-bigram-lookup shape as :func:`perplexity_score`."""
    import ray

    ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids, counts, codes, uniq = _flat_token_codes(t)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "sb_micro": pa.array([], pa.int64()),
                "backoff_bp": pa.array([], pa.int64()),
            }
        )
        if codes.size < 2:
            return empty
        valid = np.ones(codes.size, dtype=bool)
        ends = np.cumsum(counts[counts > 0])
        valid[ends - 1] = False
        lead = np.flatnonzero(valid)
        if lead.size == 0:
            return empty
        v = np.int64(uniq.size)
        key = codes[lead] * v + codes[lead + 1]
        ukey, inv = np.unique(key, return_inverse=True)
        pairs = [_sb_surprisal_micro(m, uniq[k // v], uniq[k % v])
                 for k in ukey]
        lut = np.array([p[0] for p in pairs], np.int64)
        bo = np.array([p[1] for p in pairs], np.int64)
        per_pos = lut[inv]
        per_bo = bo[inv]
        nbg = np.maximum(counts - 1, 0)
        tot = _seg_sums(per_pos, nbg)
        nback = _seg_sums(per_bo, nbg)
        sel = nbg > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "n_bigrams": pa.array(nbg[sel], pa.int64()),
                "sb_micro": pa.array(tot[sel] // nbg[sel], pa.int64()),
                "backoff_bp": pa.array(
                    10000 * nback[sel] // nbg[sel], pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
