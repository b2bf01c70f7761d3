"""Text-analysis batch operators for training-data pipelines.

Beyond the reference's own operator set (SURVEY.md §2): language-ID,
quality signals, token counting, and document fingerprinting — each a
vectorized ``map_batches`` function over a text table.  Outputs are
integer counts wherever the value is a ratio of small integers, so the
DuckDB oracle comparison is exact (float rounding rules differ between
numpy — half-even — and DuckDB — half-away; integers sidestep it).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64_array
from ..functions.tokenize import tokenize

__all__ = [
    "STOPWORDS",
    "langid_batch",
    "quality_batch",
    "token_count_batch",
    "fingerprint_batch",
    "shingles_batch",
    "simhash_batch",
]

# Marker stopword lists for the n-gram-free language-ID heuristic —
# shared with the per-language analyzers (functions/tokenize.py).
from ..functions.tokenize import STOPWORDS  # noqa: F401  (re-export)

_LANG_ORDER = ("en", "de", "fr")


def _tokens_of(batch: pa.Table) -> tuple[list[int], list[list[str]]]:
    ids = batch.column("doc_id").to_pylist()
    toks = [tokenize(t or "") for t in batch.column("text").to_pylist()]
    return ids, toks


def langid_batch(batch: pa.Table) -> pa.Table:
    """Stopword-hit language ID → (doc_id, lang_pred, en_hits, de_hits, fr_hits).

    ``lang_pred`` = language with the most stopword hits, ties broken
    by en > de > fr; 'und' (undetermined) when all counts are zero.
    """
    ids, toks = _tokens_of(batch)
    hits = {lang: [] for lang in _LANG_ORDER}
    preds = []
    for ts in toks:
        counts = {}
        for lang in _LANG_ORDER:
            sw = STOPWORDS[lang]
            counts[lang] = sum(1 for t in ts if t in sw)
            hits[lang].append(counts[lang])
        best = max(_LANG_ORDER, key=lambda lang: (counts[lang], -_LANG_ORDER.index(lang)))
        preds.append(best if counts[best] > 0 else "und")
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang_pred": pa.array(preds, pa.string()),
            "en_hits": pa.array(hits["en"], pa.int64()),
            "de_hits": pa.array(hits["de"], pa.int64()),
            "fr_hits": pa.array(hits["fr"], pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals as raw integer counts (ratios left to consumers):
    (doc_id, n_chars_c, n_tokens, n_distinct, stopword_hits, punct_hits)."""
    ids, toks = _tokens_of(batch)
    texts = batch.column("text").to_pylist()
    sw = STOPWORDS["en"]
    alnum_sp = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ")
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars_c": pa.array([len(t or "") for t in texts], pa.int64()),
            "n_tokens": pa.array([len(ts) for ts in toks], pa.int64()),
            "n_distinct": pa.array([len(set(ts)) for ts in toks], pa.int64()),
            "stopword_hits": pa.array(
                [sum(1 for t in ts if t in sw) for ts in toks], pa.int64()
            ),
            "punct_hits": pa.array(
                [sum(1 for c in (t or "") if c not in alnum_sp) for t in texts], pa.int64()
            ),
        }
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    ids, toks = _tokens_of(batch)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array([len(ts) for ts in toks], pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Canonical-token fingerprint: md5 of the space-joined token stream
    (the canonical-text content hash; DuckDB-reproducible)."""
    ids, toks = _tokens_of(batch)
    fps = [hashlib.md5(" ".join(ts).encode()).hexdigest() for ts in toks]
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "fp_md5": pa.array(fps, pa.string())}
    )


def shingles_batch(batch: pa.Table, n: int = 5) -> pa.Table:
    """Distinct token n-gram shingles per doc → (doc_id, sh, n).

    ``n`` (the doc's distinct-shingle count) rides along on every
    shingle row so downstream pair generation can carry set sizes
    through the shuffle instead of a driver-side size lookup.
    """
    ids, toks = _tokens_of(batch)
    out_ids, out_sh, out_n = [], [], []
    for did, ts in zip(ids, toks):
        seen = set()
        for i in range(len(ts) - n + 1):
            seen.add(" ".join(ts[i : i + n]))
        out_ids.extend([did] * len(seen))
        out_sh.extend(sorted(seen))
        out_n.extend([len(seen)] * len(seen))
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "sh": pa.array(out_sh, pa.string()),
            "n": pa.array(out_n, pa.int64()),
        }
    )


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over the token multiset → (doc_id, simhash_hex).

    bit_j(doc) = sign( Σ_tokens tf(t) * (bit_j(hash64(t)) ? +1 : -1) ).
    Vectorized: one factorize + one (uniq_tokens × 64) bit matrix +
    one segmented reduce per batch — no per-doc Python bit loops.
    """
    import pandas as pd

    ids, toks = _tokens_of(batch)
    n_docs = len(ids)
    counts = np.array([len(ts) for ts in toks], dtype=np.int64)
    flat: list[str] = [t for ts in toks for t in ts]
    sigs = np.zeros(n_docs, dtype=np.uint64)
    if flat:
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        rows = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        key = rows * np.int64(len(uniques)) + codes
        uk, tf = np.unique(key, return_counts=True)
        urow = uk // len(uniques)
        ucode = uk % len(uniques)
        h = hash64_array(uniques)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        contrib = tf[:, None] * (2 * bits[ucode] - 1)  # (n_pairs, 64)
        starts = np.flatnonzero(np.diff(urow, prepend=-1))
        v = np.add.reduceat(contrib, starts, axis=0)  # (docs_with_tokens, 64)
        present = urow[starts]
        sig_bits = (v > 0).astype(np.uint64)
        part = np.zeros(present.size, dtype=np.uint64)
        for j in range(64):
            part |= sig_bits[:, j] << np.uint64(j)
        sigs[present] = part
    out = [f"{int(s):016x}" for s in sigs]
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "simhash_hex": pa.array(out, pa.string())}
    )
