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
import unicodedata

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_hash64_array
from ..functions.tokenize import TOKEN_RE, tokenize

__all__ = [
    "STOPWORDS",
    "langid_batch",
    "quality_batch",
    "repetition_batch",
    "subword_count_batch",
    "token_count_batch",
    "norm_quantize_batch",
    "lexical_diversity_batch",
    "fingerprint_batch",
    "shingles_batch",
    "simhash_batch",
    "chunk_batch",
    "contamination_hits",
    "bigram_counts_batch",
    "dup_ngram_stats",
    "pack_assign",
    "HashedLinearScorer",
]

# Marker stopword lists for the n-gram-free language-ID heuristic —
# shared with the per-language analyzers (functions/tokenize.py).
from ..functions.tokenize import STOPWORDS  # noqa: F401  (re-export)

_LANG_ORDER = ("en", "de", "fr")


def _tokens_of(batch: pa.Table) -> tuple[list[int], list[list[str]]]:
    ids = batch.column("doc_id").to_pylist()
    toks = [tokenize(t or "") for t in batch.column("text").to_pylist()]
    return ids, toks


def _flat_token_codes(batch: pa.Table):
    """Batch → (doc_ids, per-doc token counts, flat token codes, vocab).

    One C-regex scan per doc + ONE ``pd.factorize`` over the batch's
    flat token stream — the same vectorized shape as
    ``postings._count_batch``.  All per-token work downstream operates
    on the integer ``codes`` array (never on Python strings)."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    findall = TOKEN_RE.findall
    norm = unicodedata.normalize
    counts = np.empty(len(texts), dtype=np.int64)
    flat: list[str] = []
    for i, t in enumerate(texts):
        toks = findall(norm("NFC", t).lower()) if t else []
        counts[i] = len(toks)
        flat.extend(toks)
    if flat:
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    else:
        codes = np.empty(0, dtype=np.int64)
        uniques = np.empty(0, dtype=object)
    return ids, counts, codes.astype(np.int64, copy=False), uniques


def _seg_sums(per_token: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-doc sums of a per-token array (prefix-sum difference — safe
    for zero-token docs, unlike ``np.add.reduceat``)."""
    cs = np.concatenate([[0], np.cumsum(per_token, dtype=np.int64)])
    ends = np.cumsum(counts)
    return cs[ends] - cs[ends - counts]


def _vocab_hits(uniques: np.ndarray, codes: np.ndarray, counts: np.ndarray,
                words: frozenset[str]) -> np.ndarray:
    """Per-doc count of tokens in ``words``: one ``np.isin`` over the
    (tiny) batch vocabulary, gathered through the code array."""
    if uniques.size == 0:
        return np.zeros(counts.size, dtype=np.int64)
    vocab_mask = np.isin(uniques, np.asarray(sorted(words), dtype=object))
    return _seg_sums(vocab_mask[codes], counts)


def langid_batch(batch: pa.Table) -> pa.Table:
    """Stopword-hit language ID → (doc_id, lang_pred, en_hits, de_hits, fr_hits).

    ``lang_pred`` = language with the most stopword hits, ties broken
    by en > de > fr; 'und' (undetermined) when all counts are zero.
    Fully vectorized: factorize + ``np.isin`` on the batch vocabulary +
    segmented sums — no per-row/per-token Python loops.
    """
    ids, counts, codes, uniques = _flat_token_codes(batch)
    mat = np.zeros((ids.size, len(_LANG_ORDER)), dtype=np.int64)
    for li, lang in enumerate(_LANG_ORDER):
        mat[:, li] = _vocab_hits(uniques, codes, counts, STOPWORDS[lang])
    # argmax returns the FIRST max → exactly the en > de > fr tie rule
    best = np.argmax(mat, axis=1)
    langs = np.asarray(_LANG_ORDER, dtype=object)
    preds = np.where(mat.max(axis=1, initial=0) > 0, langs[best], "und")
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang_pred": pa.array(preds, pa.string()),
            "en_hits": pa.array(mat[:, 0], pa.int64()),
            "de_hits": pa.array(mat[:, 1], pa.int64()),
            "fr_hits": pa.array(mat[:, 2], pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals as raw integer counts (ratios left to consumers):
    (doc_id, n_chars_c, n_tokens, n_distinct, stopword_hits, punct_hits).

    Vectorized: token work through ``_flat_token_codes`` codes;
    char-level counts via Arrow C++ kernels (``utf8_length`` +
    ``replace_substring_regex``) on the raw column."""
    import pyarrow.compute as pc

    ids, counts, codes, uniques = _flat_token_codes(batch)
    # distinct tokens per doc: unique (row, code) pairs → bincount rows
    if codes.size:
        rows = np.repeat(np.arange(ids.size, dtype=np.int64), counts)
        key = rows * np.int64(max(1, uniques.size)) + codes
        u_rows = np.unique(key) // max(1, uniques.size)
        n_distinct = np.bincount(u_rows, minlength=ids.size).astype(np.int64)
    else:
        n_distinct = np.zeros(ids.size, dtype=np.int64)
    txt = pc.fill_null(batch.column("text"), "")
    n_chars = pc.utf8_length(txt)
    # punct = chars remaining after deleting [a-zA-Z0-9 ] (codepoint
    # count == Python len — matches the per-char set-membership rule)
    punct = pc.utf8_length(pc.replace_substring_regex(txt, pattern="[a-zA-Z0-9 ]+", replacement=""))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars_c": pc.cast(n_chars, pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "stopword_hits": pa.array(
                _vocab_hits(uniques, codes, counts, STOPWORDS["en"]), pa.int64()
            ),
            "punct_hits": pc.cast(punct, pa.int64()),
        }
    )


def boilerplate_blocks(ds, *, w: int = 10, min_docs: int = 2):
    """Cross-document duplicated-block removal accounting — the
    RefinedWeb / CCNet *line-level* dedup (Penedo et al. 2023 §3.3:
    lines duplicated across documents are boilerplate — nav bars,
    cookie banners, license footers — and are REMOVED from otherwise
    unique docs).  The driver corpus is newline-free, so the removal
    unit here is the non-overlapping ``w``-token block (incl. the
    tail runt); on a real corpus the block fn splits on newlines
    first — the pipeline shape is identical.

    A block occurring in ≥ ``min_docs`` DISTINCT docs is boilerplate.
    Output per doc: total / boilerplate block counts, total / removed
    token counts, and an integer checksum over the KEPT occurrences
    (``Σ (h mod 2³¹)`` per kept block occurrence, ``h`` = the
    md5-prefix 64-bit block hash) so the oracle pins exactly WHICH
    blocks survive, not just how many.

    Scale shape (2 shuffles, both on reduced rows):

    1. map-side: per-doc totals (no shuffle — docs never split) and
       per ``(doc, h)`` occurrence-combined rows;
    2. ONE ``groupby(h)`` over the combined rows emits rows ONLY for
       boilerplate blocks (df ≥ min_docs — rare by construction);
    3. totals ∪ boiler-partials → ONE doc-count-sized
       ``groupby(doc_id).sum`` (kept checksum = total − removed).
    """
    from ray.data.aggregate import Sum

    M31 = np.int64(1 << 31)
    cols = ["n_blocks", "n_boiler_blocks", "n_tokens",
            "n_tokens_removed", "kept_checksum"]

    def occ_and_totals(which: str):
        def f(batch: pa.Table) -> pa.Table:
            ids, toks = _tokens_of(batch)
            o_doc: list[int] = []
            o_blk: list[str] = []
            t_doc: list[int] = []
            t_rows: list[tuple[int, int, int]] = []
            for did, ts in zip(ids, toks):
                if not ts:
                    continue
                blks = [" ".join(ts[i:i + w]) for i in range(0, len(ts), w)]
                o_doc.extend([did] * len(blks))
                o_blk.extend(blks)
                t_doc.append(did)
                t_rows.append((len(blks), len(ts)))
            if which == "totals":
                h = md5_hash64_array(o_blk).astype(np.int64) % M31
                # fold per-doc: occurrences are contiguous per doc
                dids = np.asarray(o_doc, np.int64)
                first = np.r_[True, dids[1:] != dids[:-1]] if dids.size else np.empty(0, bool)
                seg = np.cumsum(first) - 1
                chk = np.bincount(seg, weights=h, minlength=len(t_doc)).astype(np.int64)
                nb = np.asarray([r[0] for r in t_rows], np.int64)
                nt = np.asarray([r[1] for r in t_rows], np.int64)
                z = np.zeros(len(t_doc), np.int64)
                return pa.table({
                    "doc_id": pa.array(np.asarray(t_doc, np.int64)),
                    "n_blocks": pa.array(nb), "n_boiler_blocks": pa.array(z),
                    "n_tokens": pa.array(nt), "n_tokens_removed": pa.array(z),
                    "kept_checksum": pa.array(chk),
                })
            # occurrence stream: combine per (doc, h) map-side
            hh = md5_hash64_array(o_blk).view(np.int64)
            ntok = np.fromiter((b.count(" ") + 1 for b in o_blk), np.int64,
                               count=len(o_blk))
            df = pd.DataFrame({"doc_id": np.asarray(o_doc, np.int64),
                               "h": hh, "tok": ntok})
            g = (df.groupby(["h", "doc_id"], sort=False)
                   .agg(n_occ=("tok", "size"), tok_sum=("tok", "sum"))
                   .reset_index())
            return pa.table({
                "h": pa.array(g["h"].to_numpy(), pa.int64()),
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "n_occ": pa.array(g["n_occ"].to_numpy().astype(np.int64)),
                "tok_sum": pa.array(g["tok_sum"].to_numpy().astype(np.int64)),
            })
        return f

    def boiler_only(g: pa.Table) -> pa.Table:
        if g.num_rows < min_docs:          # (doc, h) rows are distinct docs
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_blocks": pa.array([], pa.int64()),
                "n_boiler_blocks": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_tokens_removed": pa.array([], pa.int64()),
                "kept_checksum": pa.array([], pa.int64()),
            })
        h31 = int(g.column("h")[0].as_py()) % int(M31)
        occ = g.column("n_occ").to_numpy()
        tok = g.column("tok_sum").to_numpy()
        z = np.zeros(g.num_rows, np.int64)
        return pa.table({
            "doc_id": g.column("doc_id").cast(pa.int64()),
            "n_blocks": pa.array(z),
            "n_boiler_blocks": pa.array(occ.astype(np.int64)),
            "n_tokens": pa.array(z),
            "n_tokens_removed": pa.array(tok.astype(np.int64)),
            "kept_checksum": pa.array((-h31 * occ).astype(np.int64)),
        })

    totals = ds.map_batches(occ_and_totals("totals"), batch_format="pyarrow")
    boiler = (
        ds.map_batches(occ_and_totals("occ"), batch_format="pyarrow")
        .groupby("h")
        .map_groups(boiler_only, batch_format="pyarrow")
    )
    return (
        totals.union(boiler)
        .groupby("doc_id")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )


# Gopher rules (Rae et al. 2021, "Scaling Language Models", App. A1.1)
# use a fixed 8-word English must-have list, distinct from the langid
# stopword sets above.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """Gopher document-quality rules as integer counts + rule bits.

    The five corpus-independent rules of Rae et al. 2021 App. A1.1
    (the ones that need no cross-doc state — the cross-doc repetition
    half lives in :func:`dup_ngram_stats` / :func:`repetition_batch`):

    - ``r_count``: 50 ≤ word count ≤ 100 000;
    - ``r_wordlen``: mean word length in [3, 10] — cross-multiplied
      to ``3·n ≤ Σlen ∧ Σlen ≤ 10·n`` (no division, oracle-exact);
    - ``r_sym``: symbol-to-word ratio ('#' chars + '…' chars +
      non-overlapping '...' runs) ≤ 0.1 → ``10·sym ≤ n``;
    - ``r_alpha``: ≥ 80 % of words contain an alphabetic char →
      ``5·n_alpha ≥ 4·n``;
    - ``r_stop``: ≥ 2 DISTINCT words from the fixed 8-word list.

    ``keep`` is the conjunction.  Fully vectorized: one factorize per
    batch, per-unique length/alpha/stopword lookups gathered through
    the code array, segmented sums via ``np.bincount``; symbol counts
    are Arrow C++ ``count_substring`` kernels (non-overlapping,
    leftmost — same semantics as DuckDB ``regexp_extract_all``).
    Stateless single pass — no shuffle at any scale."""
    ids, counts, codes, uniques = _flat_token_codes(batch)
    n = ids.size
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    if codes.size:
        u_len = np.fromiter((len(u) for u in uniques), np.int64,
                            count=uniques.size)
        u_alpha = np.fromiter(
            (any(c.isalpha() for c in u) for u in uniques), np.int64,
            count=uniques.size)
        word_chars = np.bincount(rows, weights=u_len[codes],
                                 minlength=n).astype(np.int64)
        alpha_words = np.bincount(rows, weights=u_alpha[codes],
                                  minlength=n).astype(np.int64)
        # distinct stopword TYPES per doc: unique (row, code) pairs
        # restricted to the 8-word list
        sw_mask = np.isin(uniques, np.asarray(GOPHER_STOPWORDS, object))
        hit = sw_mask[codes]
        key = rows[hit] * np.int64(max(1, uniques.size)) + codes[hit]
        stop_distinct = np.bincount(
            np.unique(key) // max(1, uniques.size), minlength=n
        ).astype(np.int64)
    else:
        word_chars = np.zeros(n, np.int64)
        alpha_words = np.zeros(n, np.int64)
        stop_distinct = np.zeros(n, np.int64)
    txt = pc.fill_null(batch.column("text"), "")
    n_sym = (
        pc.count_substring(txt, "#").to_numpy().astype(np.int64)
        + pc.count_substring(txt, "…").to_numpy().astype(np.int64)
        + pc.count_substring(txt, "...").to_numpy().astype(np.int64)
    )
    r_count = ((counts >= 50) & (counts <= 100_000)).astype(np.int64)
    r_wordlen = ((3 * counts <= word_chars)
                 & (word_chars <= 10 * counts)).astype(np.int64)
    r_sym = (10 * n_sym <= counts).astype(np.int64)
    r_alpha = (5 * alpha_words >= 4 * counts).astype(np.int64)
    r_stop = (stop_distinct >= 2).astype(np.int64)
    keep = r_count & r_wordlen & r_sym & r_alpha & r_stop
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(counts, pa.int64()),
            "n_word_chars": pa.array(word_chars, pa.int64()),
            "n_sym": pa.array(n_sym, pa.int64()),
            "n_alpha_words": pa.array(alpha_words, pa.int64()),
            "n_stop_distinct": pa.array(stop_distinct, pa.int64()),
            "r_count": pa.array(r_count, pa.int64()),
            "r_wordlen": pa.array(r_wordlen, pa.int64()),
            "r_sym": pa.array(r_sym, pa.int64()),
            "r_alpha": pa.array(r_alpha, pa.int64()),
            "r_stop": pa.array(r_stop, pa.int64()),
            "keep": pa.array(keep, pa.int64()),
        }
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy()
    findall = TOKEN_RE.findall
    norm = unicodedata.normalize
    counts = np.fromiter(
        (len(findall(norm("NFC", t).lower())) if t else 0
         for t in batch.column("text").to_pylist()),
        dtype=np.int64,
        count=len(batch),
    )
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "n_tokens": pa.array(counts, pa.int64())}
    )


_SUBWORD_RE = None  # compiled lazily (import-time regex cost off the cold path)


def subword_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish subword-token count estimate per doc.

    LLM budget accounting needs *model-tokenizer-scale* counts, not
    word counts; real BPE needs a merges table, but the chunking
    behavior is dominated by the pre-tokenizer split + the ~4
    chars/token average.  The deterministic rule here:

    - every maximal alnum run contributes ``ceil(len/4)`` subwords
      (counted as matches of greedy ``[a-z0-9]{1,4}``);
    - every non-space punctuation char is its own subword.

    Both clauses are plain regexes with identical leftmost-greedy
    semantics in Python ``re`` and DuckDB RE2 (no lookarounds, which
    RE2 lacks), so the SQL oracle is exact:
    ``len(regexp_extract_all(lower(text),'[a-z0-9]{1,4}')) +
    len(regexp_extract_all(lower(text),'[^ a-z0-9\\s]'))``.
    """
    import re

    global _SUBWORD_RE
    if _SUBWORD_RE is None:
        _SUBWORD_RE = (re.compile(r"[a-z0-9]{1,4}"), re.compile(r"[^\sa-z0-9]"))
    chunk_re, punct_re = _SUBWORD_RE
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    norm = unicodedata.normalize
    out = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        low = norm("NFC", t).lower() if t else ""
        out[i] = len(chunk_re.findall(low)) + len(punct_re.findall(low))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_subwords": pa.array(out, pa.int64()),
        }
    )


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Within-document repetition signals (the Gopher-rules family —
    Rae et al. 2021's repetition filters, adapted to token/bigram
    modality since this corpus has no line structure):

    ``(doc_id, n_tokens, n_distinct_tokens, top_token_n, n_bigrams,
    top_bigram_n)`` — the modal token/bigram count over the total is
    the repeated-n-gram fraction; emitted as exact integers (the
    engine's cross-engine float policy).

    Fully vectorized: per-token work happens on the batch's integer
    code array — (doc, token) and (doc, bigram) occurrences become
    composite integer keys, ONE ``np.unique`` per modality counts
    them, and a segmented ``np.maximum.reduceat`` takes the per-doc
    mode.  No Python token loops."""
    ids, counts, codes, uniques = _flat_token_codes(batch)
    ndocs = len(ids)
    V = np.int64(max(uniques.size, 1))
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), counts)

    def per_doc_stats(keys: np.ndarray, key_doc_div: np.int64):
        """distinct count + modal occurrence count per doc from a
        sorted-unique composite key array whose doc = key // div."""
        distinct = np.zeros(ndocs, dtype=np.int64)
        top = np.zeros(ndocs, dtype=np.int64)
        if keys.size:
            uk, uc = np.unique(keys, return_counts=True)
            udoc = uk // key_doc_div
            distinct += np.bincount(udoc, minlength=ndocs).astype(np.int64)
            starts = np.flatnonzero(np.concatenate([[True], udoc[1:] != udoc[:-1]]))
            top[udoc[starts]] = np.maximum.reduceat(uc, starts)
        return distinct, top

    tok_keys = doc_idx * V + codes
    n_distinct, top_token = per_doc_stats(tok_keys, V)

    same_doc = doc_idx[1:] == doc_idx[:-1] if doc_idx.size else np.empty(0, bool)
    bg_doc = doc_idx[1:][same_doc]
    bg_keys = (bg_doc * V + codes[:-1][same_doc]) * V + codes[1:][same_doc]
    _, top_bigram = per_doc_stats(bg_keys, V * V)

    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
            "top_token_n": pa.array(top_token, pa.int64()),
            "n_bigrams": pa.array(np.maximum(counts - 1, 0), pa.int64()),
            "top_bigram_n": pa.array(top_bigram, pa.int64()),
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

    bit_j(doc) = sign( Σ_tokens tf(t) * (bit_j(h64(t)) ? +1 : -1) )
    with ``h64`` = the md5-prefix hash (``md5_hash64_array``) so the
    fingerprint is reproducible by the DuckDB bit-ops oracle.
    Vectorized: one factorize + one (uniq_tokens × 64) bit matrix +
    one segmented reduce per batch — no per-doc Python bit loops.
    """
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
        h = md5_hash64_array(uniques)
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


def chunk_batch(batch: pa.Table, *, chunk: int = 16, stride: int = 8) -> pa.Table:
    """Sliding-window token chunks per doc — the pretraining/RAG
    sequence chunker: windows of ``chunk`` tokens every ``stride``
    tokens, last window truncated, empty docs emit nothing.

    Emits ``(doc_id, chunk_idx, start_tok, n_tok, chunk_text)``; the
    chunk text pins token content (not just counts) through the SQL
    oracle's ``array_to_string`` slice.  Window arithmetic is
    vectorized (one repeat/arange over the batch); only the final
    per-chunk text join is per-row — the same cost class as writing
    the chunk out.
    """
    ids, toks = _tokens_of(batch)
    if not toks:  # zero-row batches reach map_batches fns after filters
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "n_tok": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
    counts = np.fromiter((len(t) for t in toks), np.int64, len(toks))
    n_chunks = np.where(counts > 0, (np.maximum(counts - 1, 0) // stride) + 1, 0)
    doc_rep = np.repeat(np.asarray(ids, np.int64), n_chunks)
    total = int(n_chunks.sum())
    offs = np.concatenate([[0], np.cumsum(n_chunks)[:-1]]).astype(np.int64)
    cidx = np.arange(total, dtype=np.int64) - np.repeat(offs, n_chunks)
    starts = cidx * stride
    n_tok = np.minimum(chunk, np.repeat(counts, n_chunks) - starts)
    texts = []
    doc_of = np.repeat(np.arange(len(toks), dtype=np.int64), n_chunks)
    for d, s, m in zip(doc_of.tolist(), starts.tolist(), n_tok.tolist()):
        texts.append(" ".join(toks[d][s : s + m]))
    return pa.table(
        {
            "doc_id": pa.array(doc_rep, pa.int64()),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "start_tok": pa.array(starts, pa.int64()),
            "n_tok": pa.array(n_tok, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
        }
    )


def contamination_hits(ds, *, bench_mod: int = 97, n: int = 5):
    """Benchmark decontamination: per non-benchmark doc, how many of
    its DISTINCT token ``n``-gram shingles appear in the benchmark
    docs' shingle set.

    The benchmark side (``doc_id % bench_mod == 0`` — a deterministic
    stand-in for an eval set) is the natural small side: its distinct
    shingles are collected once and broadcast (``ray.put``); the
    corpus streams through one ``pc.is_in`` membership pass.  Returns
    a Dataset of ``(doc_id, n_hits, contaminated)`` covering EVERY
    non-benchmark doc (zero-hit docs included — the decontamination
    verdict must be total).
    """
    import pyarrow.compute as pc

    import ray

    def bench_only(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return t.filter(pa.array(ids % bench_mod == 0))

    bench_sh = set()
    for b in (
        ds.map_batches(bench_only, batch_format="pyarrow")
        .map_batches(lambda t: shingles_batch(t, n=n), batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        bench_sh.update(b.column("sh").to_pylist())
    sh_ref = ray.put(pa.array(sorted(bench_sh), pa.string()))

    def hits(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = ids % bench_mod != 0
        sub = t.filter(pa.array(keep))
        doc_ids = sub.column("doc_id").to_numpy()
        sh = shingles_batch(sub, n=n)
        bench = ray.get(sh_ref)
        hit = pc.is_in(sh.column("sh"), value_set=bench).to_numpy(zero_copy_only=False)
        sh_doc = sh.column("doc_id").to_numpy()
        # per-doc hit counts over this batch's shingle rows, then a
        # left-align back onto every non-bench doc (zero-hit included);
        # batch doc ids are not guaranteed sorted, so map through argsort
        order = np.argsort(doc_ids, kind="stable")
        sorted_ids = doc_ids[order]
        pos = np.searchsorted(sorted_ids, sh_doc)
        counts = np.zeros(doc_ids.size, np.int64)
        np.add.at(counts, order[pos], hit.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_hits": pa.array(counts, pa.int64()),
                "contaminated": pa.array(counts > 0),
            }
        )

    return ds.map_batches(hits, batch_format="pyarrow")


def dup_ngram_stats(ds, *, n: int = 8):
    """Inter-document duplicate n-gram signal (the Gopher /
    RefinedWeb cross-doc repetition filter — distinct from
    :func:`repetition_batch`'s INTRA-doc signal and from the pairwise
    dedup family): per doc, how many of its DISTINCT token n-grams
    also occur in at least one OTHER document.

    A doc with a high shared-gram fraction is boilerplate / template /
    near-copy material even when no single pair crosses a Jaccard
    threshold — the per-document filterable form of duplication.

    Scale shape — fully vectorized, no per-gram Python dispatch and NO
    join: the identity ``n_shared = n_grams − #{grams with df == 1
    owned by the doc}`` lets ONE ``groupby(gram)`` carry everything —

    1. per-doc distinct-gram totals are exact MAP-SIDE (a doc's
       shingles never split across batches) — one tiny row per doc,
       no shuffle;
    2. distinct (doc, gram) rows → ``groupby(gram).aggregate(Count,
       Min(doc_id))`` — when ``df == 1`` the min IS the owning doc, so
       the gram's uniqueness verdict and its owner come out of the one
       unavoidable gram shuffle;
    3. ``df == 1`` rows collapse to per-batch partial owner counts →
       one n_docs-sized ``groupby(doc_id).sum`` (tiny).

    (The previous shape re-shuffled every (doc, gram) row through a
    hash join against the df table — 3.5× the wall time of this one at
    sf0.1 for identical output.)

    Outputs integer counts only (``n_grams``, ``n_shared``) — the
    fraction is a trivial downstream division, and integers keep the
    DuckDB oracle exact (no float rounding-parity risk).  Docs shorter
    than ``n`` tokens emit ``(0, 0)`` rows (the verdict must be total),
    via one broadcast of the per-doc stats table, the natural small
    side.
    """
    import ray
    from ray.data.aggregate import Count, Min, Sum

    grams = ds.map_batches(
        lambda t: shingles_batch(t, n=n), batch_format="pyarrow"
    ).materialize()

    def doc_totals(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        ngr = t.column("n").to_numpy()
        first = np.r_[True, ids[1:] != ids[:-1]] if ids.size else np.empty(0, bool)
        return pa.table(
            {
                "doc_id": pa.array(ids[first], pa.int64()),
                "n_grams": pa.array(ngr[first], pa.int64()),
            }
        )

    totals = pa.concat_tables(
        grams.map_batches(doc_totals, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )

    gram_stats = (
        grams.map_batches(
            lambda t: t.select(["doc_id", "sh"]), batch_format="pyarrow"
        )
        .groupby("sh")
        .aggregate(Count(alias_name="nd"), Min("doc_id", alias_name="mind"))
    )

    def uniq_partial(t: pa.Table) -> pa.Table:
        owners = t.filter(pc.equal(t.column("nd"), 1)).column("mind").to_numpy()
        vals, cnts = np.unique(owners, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(vals.astype(np.int64), pa.int64()),
                "u": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    uniq = pa.concat_tables(
        gram_stats.map_batches(uniq_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .sum("u")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )

    # fold the two tiny per-doc tables: n_shared = n_grams − n_unique
    t_ids = totals.column("doc_id").to_numpy()
    order = np.argsort(t_ids, kind="stable")
    s_ids = t_ids[order]
    n_g = totals.column("n_grams").to_numpy()[order]
    n_u = np.zeros(s_ids.size, np.int64)
    if uniq.num_rows:
        u_ids = uniq.column("doc_id").to_numpy()
        pos = np.searchsorted(s_ids, u_ids)
        n_u[pos] = uniq.column("sum(u)").to_numpy()
    s_ref = ray.put((s_ids, n_g, n_g - n_u))

    def attach(t: pa.Table) -> pa.Table:
        ids_, ng, ns = ray.get(s_ref)
        d = t.column("doc_id").cast(pa.int64()).to_numpy()
        pos = np.clip(np.searchsorted(ids_, d), 0, max(ids_.size - 1, 0))
        hit = (ids_[pos] == d) if ids_.size else np.zeros(d.size, bool)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "n_grams": pa.array(np.where(hit, ng[pos], 0), pa.int64())
                if ids_.size
                else pa.array(np.zeros(d.size, np.int64)),
                "n_shared": pa.array(np.where(hit, ns[pos], 0), pa.int64())
                if ids_.size
                else pa.array(np.zeros(d.size, np.int64)),
            }
        )

    return ds.select_columns(["doc_id"]).map_batches(attach, batch_format="pyarrow")


class HashedLinearScorer:
    """Hashing-trick linear text classifier — the fasttext-shaped
    batched-inference stage: a callable CLASS for
    ``map_batches(HashedLinearScorer, concurrency=N)`` whose weight
    table is built ONCE per actor in ``__init__`` (the model-load
    pattern; a real deployment would read a trained vector here —
    this engine pins a deterministic Knuth-hash weight init so the
    DuckDB oracle can recompute every score exactly).

    Scoring is fully vectorized: one factorize per batch, ONE md5
    hash per DISTINCT token (bucket = ``h64(t) % n_buckets`` — the
    same md5-prefix hash the SimHash oracle reproduces in SQL),
    weight gather through the code array, segmented per-doc sums.
    Integer outputs (``score_num`` = Σ weights, with
    ``weight_b = (b · 2654435761) mod 1001 − 500``) keep the oracle
    float-free; the calibrated score is ``score_num / n_tokens``
    downstream.
    """

    def __init__(self, n_buckets: int = 4096):
        b = np.arange(n_buckets, dtype=np.uint64)
        self.weights = (
            (b * np.uint64(2654435761)) % np.uint64(1001)
        ).astype(np.int64) - 500
        self.n_buckets = np.uint64(n_buckets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, counts, codes, uniques = _flat_token_codes(batch)
        if uniques.size:
            buckets = md5_hash64_array(uniques) % self.n_buckets
            w_uniq = self.weights[buckets.astype(np.int64)]
            num = _seg_sums(w_uniq[codes], counts)
        else:
            num = np.zeros(counts.size, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
                "score_num": pa.array(num, pa.int64()),
            }
        )


def pack_assign(ds, *, budget: int, bucket_size: int = 65_536):
    """Sequence packing for pretraining: concatenate the corpus in
    doc_id order and cut fixed ``budget``-token training sequences —
    each doc gets its global token offset and the first/last pack
    (sequence) index it lands in (docs straddle pack boundaries, as in
    standard pretraining concatenation).

    The core is a DISTRIBUTED PREFIX SUM over doc_id order — the
    canonical two-level scan:

    1. one ``groupby(doc_id // bucket_size)`` computes per-bucket
       token totals (the small side: one row per bucket);
    2. the driver folds bucket totals into exclusive bucket offsets
       (O(#buckets), broadcast once via ``ray.put``);
    3. a second pass over the same bucket groups sorts each bucket by
       doc_id, adds the bucket-local cumsum to the broadcast offset.

    No global sort, no O(N) driver state — per-task memory is one
    bucket's rows.  Returns ``(doc_id, n_tokens, tok_offset,
    pack_first, pack_last)``; empty docs occupy zero tokens and land
    "at" their offset's pack.  The oracle is one SQL window function.
    """
    import ray

    if budget <= 0:
        raise ValueError("budget must be positive")

    counted = ds.map_batches(token_count_batch, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").cast(pa.int64()).to_numpy()
        return t.append_column(
            "bucket", pa.array(d // bucket_size, pa.int64())
        )

    bucketed = counted.map_batches(add_bucket, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Sum

    totals = pa.concat_tables(
        bucketed.groupby("bucket")
        .aggregate(Sum(on="n_tokens", alias_name="tot"))
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("bucket")
    b_ids = totals.column("bucket").to_numpy()
    b_tot = totals.column("tot").to_numpy()
    b_off = np.concatenate([[0], np.cumsum(b_tot)[:-1]])  # exclusive scan
    off_ref = ray.put((b_ids, b_off))

    def scan_group(g: pa.Table) -> pa.Table:
        ids_, offs = ray.get(off_ref)
        order = pc.sort_indices(g.column("doc_id"))
        g = g.take(order)
        n = g.column("n_tokens").to_numpy()
        b = int(g.column("bucket")[0].as_py())
        base = int(offs[np.searchsorted(ids_, b)])
        start = base + np.concatenate([[0], np.cumsum(n)[:-1]])
        end = start + n  # exclusive
        pack_first = start // budget
        # an empty doc "lands at" its offset; a doc's last token is end-1
        pack_last = np.where(n > 0, (end - 1) // budget, pack_first)
        return pa.table(
            {
                "doc_id": g.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "tok_offset": pa.array(start.astype(np.int64), pa.int64()),
                "pack_first": pa.array(pack_first.astype(np.int64), pa.int64()),
                "pack_last": pa.array(pack_last.astype(np.int64), pa.int64()),
            }
        )

    return bucketed.groupby("bucket").map_groups(scan_group, batch_format="pyarrow")


def bigram_counts_batch(batch: pa.Table) -> pa.Table:
    """Partial adjacent-bigram counts for one batch — the map-side
    pre-aggregation of corpus collocation mining (PMI inputs ride on
    integer counts; the tiny ``groupby(w1, w2).sum`` downstream is the
    only shuffle).  Fully vectorized: one factorize, doc-boundary mask,
    composite-key ``np.unique`` — no per-token Python."""
    _ids, counts, codes, uniq = _flat_token_codes(batch)
    empty = pa.table(
        {
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    if codes.size < 2:
        return empty
    # a position starts a bigram iff it has a successor in the SAME doc:
    # mark every doc's last token invalid (covers the global last too)
    valid = np.ones(codes.size, dtype=bool)
    ends = np.cumsum(counts[counts > 0])
    valid[ends - 1] = False
    lead = np.flatnonzero(valid)
    if lead.size == 0:
        return empty
    v = np.int64(uniq.size)
    key = codes[lead] * v + codes[lead + 1]
    ukey, n = np.unique(key, return_counts=True)
    return pa.table(
        {
            "w1": pa.array(uniq[(ukey // v)], pa.string()),
            "w2": pa.array(uniq[(ukey % v)], pa.string()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        }
    )


def nextword_counts_batch(batch: pa.Table, heads: list[str]) -> pa.Table:
    """Partial next-word postings for one batch — the map-side half of
    a Williams/Zobel-style *next-word index* (phrase-query
    acceleration: for a set of frequent first words, the list of
    successor words with pair/document counts replaces a positional
    intersection).  Same vectorized shape as
    :func:`bigram_counts_batch`, plus the per-doc key so the downstream
    ``groupby(head, nxt)`` can count distinct documents exactly: each
    document's tokens live in ONE input row, so one partial row per
    ``(doc, head, nxt)`` is emitted and the reducer's ``Count`` IS the
    document frequency — no distinct-shuffle needed."""
    ids, counts, codes, uniq = _flat_token_codes(batch)
    empty = pa.table(
        {
            "head": pa.array([], pa.string()),
            "nxt": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )
    if codes.size < 2:
        return empty
    valid = np.ones(codes.size, dtype=bool)
    ends = np.cumsum(counts[counts > 0])
    valid[ends - 1] = False
    code_of = {w: i for i, w in enumerate(uniq)}
    head_codes = np.array(
        sorted(code_of[h] for h in heads if h in code_of), dtype=np.int64
    )
    if head_codes.size == 0:
        return empty
    lead = np.flatnonzero(valid & np.isin(codes, head_codes))
    if lead.size == 0:
        return empty
    doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
    v = np.int64(uniq.size)
    key = (doc_idx[lead] * v + codes[lead]) * v + codes[lead + 1]
    ukey, n = np.unique(key, return_counts=True)
    w2 = ukey % v
    w1 = (ukey // v) % v
    d = ukey // (v * v)
    return pa.table(
        {
            "head": pa.array(uniq[w1], pa.string()),
            "nxt": pa.array(uniq[w2], pa.string()),
            "doc_id": pa.array(ids[d], pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        }
    )


def vocab_growth(ds, checkpoints: list[int], *, bucket_size: int = 65_536):
    """Heaps'-law vocabulary growth: for each token-count checkpoint N,
    how many distinct unigrams / bigrams appear within the first N
    tokens of the corpus in doc_id order — the classic sublinearity
    diagnostic for pretraining corpora (a flattening curve means the
    tail is duplicated boilerplate; synthetic data shows it early).

    Fully distributed, exact, no global sort:

    1. the same two-level prefix scan as :func:`pack_assign` turns
       per-bucket token totals into exclusive bucket offsets (driver
       sees one row per bucket, broadcast once);
    2. one ``groupby(bucket).map_groups`` pass re-derives each doc's
       global token offset inside its bucket group and emits the
       bucket-local FIRST global position per distinct unigram and
       adjacent-pair bigram (integer codes throughout; term strings
       materialize once per distinct term per bucket);
    3. a vocab-sized ``groupby(key).min`` folds bucket partials into
       true global first positions;
    4. checkpoint counts are ``searchsorted`` bincount partials folded
       on the driver (len(checkpoints) ints per batch).

    Returns an Arrow table ``(unit, checkpoint, vocab)`` — vocab =
    #terms whose first occurrence position < checkpoint — sorted by
    (unit, checkpoint), zeros included.
    """
    import ray
    from ray.data.aggregate import Min, Sum

    cps = np.asarray(sorted(checkpoints), dtype=np.int64)

    def add_bucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").cast(pa.int64()).to_numpy()
        return t.append_column("bucket", pa.array(d // bucket_size, pa.int64()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()

    def count_rows(t: pa.Table) -> pa.Table:
        out = token_count_batch(t)
        return out.append_column("bucket", t.column("bucket"))

    totals = pa.concat_tables(
        bucketed.map_batches(count_rows, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum(on="n_tokens", alias_name="tot"))
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("bucket")
    b_ids = totals.column("bucket").to_numpy()
    b_off = np.concatenate(
        [[0], np.cumsum(totals.column("tot").to_numpy())[:-1]]
    )
    off_ref = ray.put((b_ids, b_off))

    def firsts_in_bucket(g: pa.Table) -> pa.Table:
        ids_, offs = ray.get(off_ref)
        order = pc.sort_indices(g.column("doc_id"))
        g = g.take(order)
        ids, counts, codes, uniq = _flat_token_codes(g)
        if codes.size == 0:
            return pa.table(
                {"key": pa.array([], pa.string()),
                 "fp": pa.array([], pa.int64())}
            )
        b = int(g.column("bucket")[0].as_py())
        base = int(offs[np.searchsorted(ids_, b)])
        starts = np.cumsum(counts) - counts
        gpos = base + np.arange(codes.size, dtype=np.int64)
        # ^ docs are sorted and token runs are contiguous, so the flat
        # stream index IS the bucket-local position; + base = global.
        v = np.int64(uniq.size)

        def run_min(keys: np.ndarray, pos: np.ndarray):
            o = np.argsort(keys, kind="stable")
            k_s, p_s = keys[o], pos[o]
            cut = np.concatenate(([0], np.flatnonzero(np.diff(k_s)) + 1))
            return k_s[cut], np.minimum.reduceat(p_s, cut)

        uk, up = run_min(codes, gpos)
        uni_terms = uniq[uk]
        # bigrams: adjacent tokens within the same doc
        doc_of = np.repeat(np.arange(ids.size, dtype=np.int64), counts)
        same = doc_of[1:] == doc_of[:-1]
        bk = codes[:-1][same] * v + codes[1:][same]
        bp = gpos[:-1][same]
        if bk.size:
            bku, bpu = run_min(bk, bp)
            big_terms = np.char.add(
                np.char.add(uniq[(bku // v)].astype(str), " "),
                uniq[(bku % v)].astype(str),
            )
        else:
            bku = np.empty(0, np.int64)
            bpu = np.empty(0, np.int64)
            big_terms = np.empty(0, dtype=object)
        keys = np.concatenate(
            [np.char.add("u:", uni_terms.astype(str)),
             np.char.add("b:", big_terms.astype(str))]
        )
        return pa.table(
            {
                "key": pa.array(keys.astype(object), pa.string()),
                "fp": pa.array(np.concatenate([up, bpu]), pa.int64()),
            }
        )

    firsts = (
        bucketed.groupby("bucket")
        .map_groups(firsts_in_bucket, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Min(on="fp", alias_name="fp"))
    )

    def hist(t: pa.Table) -> pa.Table:
        keys = t.column("key").to_pandas().to_numpy()
        fp = t.column("fp").to_numpy()
        rows_u, rows_c, rows_n = [], [], []
        for unit, tag in (("unigram", "u:"), ("bigram", "b:")):
            sel = np.char.startswith(keys.astype(str), tag)
            f = fp[sel]
            # vocab at checkpoint = #terms with fp < cp
            n_at = np.searchsorted(np.sort(f), cps, side="left")
            rows_u.extend([unit] * cps.size)
            rows_c.extend(cps.tolist())
            rows_n.extend(n_at.tolist())
        return pa.table(
            {
                "unit": pa.array(rows_u, pa.string()),
                "checkpoint": pa.array(rows_c, pa.int64()),
                "vocab": pa.array(rows_n, pa.int64()),
            }
        )

    partials = firsts.map_batches(hist, batch_format="pyarrow").to_pandas()
    fold = (
        partials.groupby(["unit", "checkpoint"], sort=True)["vocab"]
        .sum()
        .reset_index()
    )
    # zeros for any (unit, checkpoint) no batch emitted (empty corpus)
    out = {"unit": [], "checkpoint": [], "vocab": []}
    got = {(r.unit, int(r.checkpoint)): int(r.vocab) for r in fold.itertuples()}
    for unit in ("bigram", "unigram"):
        for cp in cps.tolist():
            out["unit"].append(unit)
            out["checkpoint"].append(cp)
            out["vocab"].append(got.get((unit, cp), 0))
    return pa.table(
        {
            "unit": pa.array(out["unit"], pa.string()),
            "checkpoint": pa.array(out["checkpoint"], pa.int64()),
            "vocab": pa.array(out["vocab"], pa.int64()),
        }
    )


def s_stem_array(terms: np.ndarray) -> np.ndarray:
    """Vectorized S-stemmer (Harman 1991, "How effective is
    suffixing?") — the light plural stemmer Solr ships as
    ``EnglishMinimalStemFilter`` (the reference's schema picks its
    stemmer per field; this is the deterministic one an exact oracle
    can replay).  First matching rule wins:

    1. ``*ies`` (but not ``*eies``/``*aies``)  → ``*y``
    2. ``*es``  (but not ``*aes``/``*ees``/``*oes``) → drop ``s``
    3. ``*s``   (but not ``*us``/``*ss``)      → drop ``s``
    """
    t = terms.astype(str)
    r1 = (
        np.char.endswith(t, "ies")
        & ~np.char.endswith(t, "eies")
        & ~np.char.endswith(t, "aies")
    )
    r2 = (
        np.char.endswith(t, "es")
        & ~np.char.endswith(t, "aes")
        & ~np.char.endswith(t, "ees")
        & ~np.char.endswith(t, "oes")
        & ~r1
    )
    r3 = (
        np.char.endswith(t, "s")
        & ~np.char.endswith(t, "us")
        & ~np.char.endswith(t, "ss")
        & ~r1
        & ~r2
    )
    out = t.astype(object)
    idx1 = np.flatnonzero(r1)
    if idx1.size:
        out[idx1] = [w[:-3] + "y" for w in t[idx1]]
    idx23 = np.flatnonzero(r2 | r3)
    if idx23.size:
        out[idx23] = [w[:-1] for w in t[idx23]]
    return out


def norm_quantize_batch(batch: pa.Table) -> pa.Table:
    """Lossy doc-length "norm" quantization — the scoring-norm byte
    the reference delegates to Lucene's ``SmallFloat`` (Solr encodes
    each doc's length into one byte for BM25's length normalization;
    see SURVEY.md §1.2 — norms are the last piece of the delegated
    Solr surface we re-own).  Same quantizer class, exact integer
    semantics so a SQL oracle can replay it bit-for-bit:

    - ``dl < 32`` → ``code = dl``  (exact region)
    - else ``e = bitlen(dl) − 5``; ``code = 16·e + (dl >> e)``
      (4-bit mantissa with hidden high bit: ``dl >> e`` ∈ [16, 31]) —
      monotone, relative error < 1/16
    - decode: ``dl_lossy = (code − 16·e) << e`` with
      ``e = code//16 − 1`` (floor of the quantization cell)

    Input ``(doc_id, n_tokens)`` partials from ``token_count_batch``;
    output ``(doc_id, dl, norm_code, dl_lossy)``.  Pure per-row map —
    no shuffle; bit length via integer shifts (float ``log2``
    misrounds near powers of two)."""
    dl = batch.column("n_tokens").to_numpy().astype(np.int64)
    code = dl.copy()
    big = dl >= 32
    if big.any():
        x = dl[big].copy()
        bl = np.zeros(x.size, dtype=np.int64)
        for s in (32, 16, 8, 4, 2, 1):
            m = x >= (np.int64(1) << np.int64(s))
            bl[m] += s
            x[m] >>= np.int64(s)
        bl += 1  # x is now 1 for every entry (dl >= 32 > 0)
        e = bl - 5
        code[big] = 16 * e + (dl[big] >> e.astype(np.int64))
    lossy = code.copy()
    dec = code >= 32
    if dec.any():
        e = code[dec] // 16 - 1
        lossy[dec] = (code[dec] - 16 * e) << e
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "dl": pa.array(dl, pa.int64()),
            "norm_code": pa.array(code, pa.int64()),
            "dl_lossy": pa.array(lossy, pa.int64()),
        }
    )


def lexical_diversity_batch(batch: pa.Table) -> pa.Table:
    """Per-doc lexical-diversity signals — type/token ratio and hapax
    share, the classic corpus-quality screens next to the Gopher rules
    (machine-generated spam skews low-TTR; OCR noise skews hapax-high).
    Integer basis points so the oracle replays exactly.

    Output ``(doc_id, n_tokens, n_types, n_hapax, ttr_bp)`` with
    ``ttr_bp = 10000·n_types // n_tokens`` (0 for empty docs).  Fully
    vectorized: ONE factorize, composite ``(doc, type)`` key through
    ``np.unique`` — per-row map, no shuffle."""
    ids, counts, codes, uniq = _flat_token_codes(batch)
    n_docs = len(ids)
    types = np.zeros(n_docs, dtype=np.int64)
    hapax = np.zeros(n_docs, dtype=np.int64)
    if codes.size:
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        v = np.int64(uniq.size)
        key = doc_idx * v + codes
        ukey, kcnt = np.unique(key, return_counts=True)
        np.add.at(types, ukey // v, 1)
        np.add.at(hapax, (ukey // v)[kcnt == 1], 1)
    ttr = np.where(counts > 0, 10000 * types // np.maximum(counts, 1), 0)
    return pa.table(
        {
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_types": pa.array(types, pa.int64()),
            "n_hapax": pa.array(hapax, pa.int64()),
            "ttr_bp": pa.array(ttr, pa.int64()),
        }
    )


_VOWEL_RUN_RE = r"[aeiouy]+"
_SENT_RUN_RE = r"[.!?]+"


def readability_batch(batch: pa.Table) -> pa.Table:
    """Per-doc Flesch-Kincaid readability basis (Kincaid et al. 1975
    — the grade-level screen web-quality pipelines run next to the
    Gopher rules; too-low and too-high grades both flag non-prose):
    word / sentence / syllable counts plus the EXACT integer
    numerator/denominator of ``100·FK_grade``::

        FK = 0.39·(W/S) + 11.8·(Y/W) − 15.59
        fk_num = 39·W² + 1180·Y·S − 1559·W·S,  fk_den = W·S

    so no float division crosses the oracle (the ratio is the grade
    ×100; ``fk_den = 0`` when a doc has no words or no sentences).
    Syllables are vowel-group runs per word (min 1 — the classic
    heuristic); sentences are ``[.!?]+`` runs in the RAW text.
    Vectorized: syllable regex runs once per VOCAB entry (not per
    token) and broadcasts through the factorize codes; sentence
    counting is one Arrow ``count_substring_regex`` kernel."""
    ids, counts, codes, uniques = _flat_token_codes(batch)
    n_sent = pc.fill_null(
        pc.count_substring_regex(
            pc.cast(batch.column("text"), pa.string()), _SENT_RUN_RE
        ),
        0,
    ).to_numpy().astype(np.int64)
    syll = np.zeros(len(ids), dtype=np.int64)
    if codes.size:
        syl_u = pc.count_substring_regex(
            pa.array(uniques, pa.string()), _VOWEL_RUN_RE
        ).to_numpy().astype(np.int64)
        np.maximum(syl_u, 1, out=syl_u)  # every word ≥ 1 syllable
        syll = _seg_sums(syl_u[codes], counts)
    w, s = counts, n_sent
    fk_den = w * s
    fk_num = np.where(fk_den > 0, 39 * w * w + 1180 * syll * s - 1559 * fk_den, 0)
    return pa.table(
        {
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "n_words": pa.array(w, pa.int64()),
            "n_sent": pa.array(s, pa.int64()),
            "n_syll": pa.array(syll, pa.int64()),
            "fk_num": pa.array(fk_num, pa.int64()),
            "fk_den": pa.array(fk_den, pa.int64()),
        }
    )


def char_entropy_batch(batch: pa.Table) -> pa.Table:
    """Per-doc Shannon entropy (bits) over the lowercased [a-z0-9]
    character stream — the gibberish/low-diversity screen (CCNet-family
    quality signal: keyboard-mash and single-char spam sit near 0,
    English prose near 4.1).  ``H = Σ cᵢ(ln N − ln cᵢ) / (N ln 2)``,
    emitted at 4 dp next to the exact integer char/distinct counts so
    the oracle replays the identical expression tree.  Vectorized: one
    utf-8 byte scan, 36-symbol ``bincount`` per batch, no per-char
    Python."""
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    texts = batch.column("text").to_pylist()
    enc = [(t.lower().encode("utf-8") if t else b"") for t in texts]
    lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
    n_docs = len(ids)
    hist = np.zeros((n_docs, 36), dtype=np.int64)
    if lens.sum():
        flat = np.frombuffer(b"".join(enc), np.uint8)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        code = np.full(flat.shape, -1, np.int64)
        digit = (flat >= 48) & (flat <= 57)
        letter = (flat >= 97) & (flat <= 122)
        code[digit] = flat[digit] - 48
        code[letter] = flat[letter] - 87
        keep = code >= 0
        np.add.at(
            hist.reshape(-1), doc_idx[keep] * 36 + code[keep], 1
        )
    n_chars = hist.sum(axis=1)
    n_distinct = (hist > 0).sum(axis=1).astype(np.int64)
    safe_n = np.maximum(n_chars, 1).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        contrib = hist * (np.log(safe_n)[:, None] - np.log(np.maximum(hist, 1)))
    ent = contrib.sum(axis=1) / (safe_n * np.log(2.0))
    ent = np.where(n_chars > 0, np.round(ent, 4), 0.0)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "entropy_bits": pa.array(ent, pa.float64()),
        }
    )
