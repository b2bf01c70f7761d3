"""Posting generation (SURVEY.md §2.6 A8 map side).

Two stages are provided:

- :class:`TokenizePostings` — raw ``(term, doc_id, tf, dl)`` rows; used
  by catalog operators that need the posting relation itself (term-df
  aggregation etc.).
- :class:`TokenizeEncodeRuns` — **map-side SPIMI**: each Arrow batch of
  docs is tokenized, counted, sorted by (term, doc_id) and immediately
  delta+varint-encoded into one compressed *run* per term
  (``BASELINE.json:north_star``: "build per-partition SPIMI-style
  posting lists as Arrow batches, then a groupby-term shuffle ...").
  Only these compressed runs — ≈5-15× smaller and ≈15× fewer rows than
  raw postings — enter the ``groupby(shard)`` shuffle, and a head
  term's postings arrive at its reducer as many doc-range-bounded runs
  rather than one giant raw group (this IS the skew salt: the salt key
  is the batch's doc range, assigned map-side for free).

Everything is vectorized: one regex scan per doc (C), one factorize +
one lexsort + segmented varint encode per batch — no per-term Python
loops in the hot path.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.codec import encode_varints_segmented
from ..functions.hashing import hash64_array
from ..functions.tokenize import TOKEN_RE

__all__ = ["TokenizePostings", "TokenizeEncodeRuns", "POSTINGS_SCHEMA",
           "RUNS_SCHEMA", "RUNS_POS_SCHEMA"]

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
        ("shard", pa.int32()),
    ]
)

RUNS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("first_doc", pa.int64()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
    ]
)


RUNS_POS_SCHEMA = RUNS_SCHEMA.append(pa.field("poss", pa.binary()))


def _gather_segments(seg_starts: np.ndarray, sizes_in_order: np.ndarray,
                     order: np.ndarray) -> np.ndarray:
    """Take-indices that gather variable-length segments in ``order``.

    ``seg_starts[i]`` is segment i's start in the flat source array;
    ``sizes_in_order[k] = len(segment order[k])``.  Fully vectorized
    (repeat + cumsum), no per-segment Python.
    """
    total = int(sizes_in_order.sum())
    out_starts = np.concatenate([[0], np.cumsum(sizes_in_order)[:-1]]).astype(np.int64)
    return (
        np.repeat(seg_starts[order], sizes_in_order)
        + np.arange(total, dtype=np.int64)
        - np.repeat(out_starts, sizes_in_order)
    )


def _count_batch_pos(batch: pa.Table):
    """Like :func:`_count_batch` but also returns each posting's token
    positions (0-based within the doc), flat + aligned with the final
    (term_code, doc_id) posting order."""
    doc_ids = batch.column("doc_id").to_numpy()
    doc_lens = (
        batch.column("doc_len").to_numpy() if "doc_len" in batch.column_names else None
    )
    texts = batch.column("text").to_pylist()
    findall = TOKEN_RE.findall
    norm = unicodedata.normalize
    all_tokens: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = findall(norm("NFC", t).lower()) if t else []
        counts[i] = len(toks)
        all_tokens.extend(toks)
    if not all_tokens:
        return None
    if doc_lens is None:
        doc_lens = counts

    codes, uniques = pd.factorize(np.asarray(all_tokens, dtype=object), sort=True)
    total = codes.size
    row_of_token = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    tok_starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    tok_pos = np.arange(total, dtype=np.int64) - np.repeat(tok_starts, counts)

    key = codes.astype(np.int64) * np.int64(len(texts)) + row_of_token
    occ_order = np.argsort(key, kind="stable")  # stable → pos ascending in-group
    uniq_key, tf = np.unique(key, return_counts=True)
    u_code = uniq_key // len(texts)
    u_row = uniq_key % len(texts)
    doc = doc_ids[u_row]
    order = np.lexsort((doc, u_code))

    occ_starts = np.concatenate([[0], np.cumsum(tf)[:-1]]).astype(np.int64)
    take = _gather_segments(occ_starts, tf[order], order)
    pos_final = tok_pos[occ_order][take]
    return (
        uniques,
        u_code[order],
        doc[order],
        tf[order].astype(np.int64),
        doc_lens[u_row][order].astype(np.int64),
        pos_final,
        counts,  # per-input-row token counts (writer doc_len source)
    )


def _count_batch(batch: pa.Table):
    """Shared per-batch counting: returns (uniq-pair arrays) or None.

    Output postings are sorted by (term_code, doc_id) with terms
    factorized in sorted order.
    """
    doc_ids = batch.column("doc_id").to_numpy()
    doc_lens = (
        batch.column("doc_len").to_numpy() if "doc_len" in batch.column_names else None
    )
    texts = batch.column("text").to_pylist()

    findall = TOKEN_RE.findall
    norm = unicodedata.normalize
    all_tokens: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = findall(norm("NFC", t).lower()) if t else []
        counts[i] = len(toks)
        all_tokens.extend(toks)
    if not all_tokens:
        return None
    if doc_lens is None:
        doc_lens = counts

    codes, uniques = pd.factorize(np.asarray(all_tokens, dtype=object), sort=True)
    row_of_token = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    key = codes.astype(np.int64) * np.int64(len(texts)) + row_of_token
    uniq_key, tf = np.unique(key, return_counts=True)
    u_code = uniq_key // len(texts)
    u_row = uniq_key % len(texts)
    # np.unique sorts keys → output is ordered by (term_code, row);
    # rows within a batch are in doc_id order only if the batch is a
    # contiguous slice — enforce true doc order explicitly:
    doc = doc_ids[u_row]
    order = np.lexsort((doc, u_code))
    return (
        uniques,
        u_code[order],
        doc[order],
        tf[order].astype(np.int64),
        doc_lens[u_row][order].astype(np.int64),
        counts,  # per-input-row token counts (writer doc_len source)
    )


class TokenizePostings:
    """docs → raw posting rows (term, doc_id, tf, dl, shard)."""

    def __init__(self, num_shards: int, bucket_bits: int | None = None):
        self.num_shards = num_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        res = _count_batch(batch)
        if res is None:
            return POSTINGS_SCHEMA.empty_table()
        uniques, codes, doc, tf, dl, _counts = res
        terms = uniques[codes]
        shard = (hash64_array(terms) % np.uint64(self.num_shards)).astype(np.int32)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(doc, pa.int64()),
                "tf": pa.array(tf.astype(np.int32)),
                "dl": pa.array(dl.astype(np.int32)),
                "shard": pa.array(shard),
            }
        )


class TokenizeEncodeRuns:
    """docs → one compressed posting run per (term, batch).

    ``bucket_size`` (optional): additionally split runs at doc-range
    bucket boundaries (``doc_id // bucket_size``), so every run lies
    entirely inside ONE bucket — the invariant the segmented
    ``(shard, bucket)`` index merge relies on.  The pages pipeline
    doesn't need it (each part's docs already share a bucket); the
    text-table adapter, whose doc ids are dense, does.
    """

    def __init__(self, num_shards: int, bucket_size: int | None = None,
                 with_positions: bool = False):
        self.num_shards = num_shards
        self.bucket_size = bucket_size
        self.with_positions = with_positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.encode_with_doc_lens(batch)[0]

    def encode_with_doc_lens(self, batch: pa.Table):
        """(runs table, per-input-row token counts) — the counts are
        what the docs writer stores as ``doc_len``, computed from the
        SAME tokenization that builds the postings (one tokenize pass
        per corpus; the extract stage no longer tokenizes)."""
        n_rows = batch.num_rows
        if self.with_positions:
            res = _count_batch_pos(batch)
            if res is None:
                return RUNS_POS_SCHEMA.empty_table(), np.zeros(n_rows, np.int64)
            uniques, codes, doc, tf, dl, pos_flat, counts = res
        else:
            res = _count_batch(batch)
            if res is None:
                return RUNS_SCHEMA.empty_table(), np.zeros(n_rows, np.int64)
            uniques, codes, doc, tf, dl, counts = res
            pos_flat = None

        # run boundaries: one run per distinct term code (codes sorted);
        # with bucket_size also break where the doc-range bucket changes
        # (doc asc within a term code → buckets monotone within a run)
        new_run = np.ones(codes.size, dtype=bool)
        new_run[1:] = codes[1:] != codes[:-1]
        if self.bucket_size:
            bkt = doc // self.bucket_size
            new_run[1:] |= bkt[1:] != bkt[:-1]
        starts = np.flatnonzero(new_run)
        lengths = np.diff(np.append(starts, codes.size))

        # per-run delta gaps: first value absolute, then doc deltas
        gaps = np.empty(doc.shape, dtype=np.uint64)
        np.subtract(doc[1:], doc[:-1], out=gaps[1:], casting="unsafe")
        gaps[starts] = doc[starts].astype(np.uint64)

        docs_b = encode_varints_segmented(gaps, starts)
        tfs_b = encode_varints_segmented(tf.astype(np.uint64), starts)
        dls_b = encode_varints_segmented(dl.astype(np.uint64), starts)

        run_terms = uniques[codes[starts]]
        shard = (hash64_array(run_terms) % np.uint64(self.num_shards)).astype(np.int32)
        cf = np.add.reduceat(tf, starts)
        cols = {
            "term": pa.array(run_terms, pa.string()),
            "shard": pa.array(shard),
            "first_doc": pa.array(doc[starts], pa.int64()),
            "df": pa.array(lengths, pa.int64()),
            "cf": pa.array(cf, pa.int64()),
            "docs": pa.array(docs_b, pa.binary()),
            "tfs": pa.array(tfs_b, pa.binary()),
            "dls": pa.array(dls_b, pa.binary()),
        }
        if pos_flat is not None:
            # per-posting delta (first absolute, then gaps); one blob
            # per run = segments at the runs' occurrence offsets
            occ_post_starts = np.concatenate([[0], np.cumsum(tf)[:-1]]).astype(np.int64)
            pos_gaps = np.empty(pos_flat.shape, dtype=np.uint64)
            np.subtract(pos_flat[1:], pos_flat[:-1], out=pos_gaps[1:], casting="unsafe")
            pos_gaps[occ_post_starts] = pos_flat[occ_post_starts].astype(np.uint64)
            run_occ_starts = occ_post_starts[starts]
            cols["poss"] = pa.array(
                encode_varints_segmented(pos_gaps, run_occ_starts), pa.binary()
            )
        return pa.table(cols), counts
