"""Posting generation: ``docs(doc_id, text, doc_len) → (term, doc_id, tf, dl)``.

The map side of SURVEY.md §2.6 A8 — the work the reference hands to
Lucene's analyzer.  Stateless ``map_batches`` function; the per-batch
term counting is vectorized (regex scan in C, then one factorize + one
unique over the whole batch — no per-row Python counting).

Also computes the term-shard and salt-bucket keys for the two-stage
merge (SURVEY.md §4.1 skew plan): ``shard = hash64(term) % Q``;
``bucket = doc_id >> bucket_bits`` so a head term's postings split into
doc-range-disjoint runs that later concatenate without re-encoding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64_array
from ..functions.tokenize import TOKEN_RE
import unicodedata

__all__ = ["TokenizePostings", "POSTINGS_SCHEMA"]

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
        ("shard", pa.int32()),
        ("bucket", pa.int32()),
    ]
)


class TokenizePostings:
    """Batch fn (usable as plain function or actor): docs → posting rows."""

    def __init__(self, num_shards: int, bucket_bits: int = 62):
        self.num_shards = num_shards
        self.bucket_bits = bucket_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        doc_lens = (
            batch.column("doc_len").to_numpy()
            if "doc_len" in batch.column_names
            else None
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
            return POSTINGS_SCHEMA.empty_table()
        if doc_lens is None:  # dl = token count when no doc_len column
            doc_lens = counts

        codes, uniques = pd.factorize(np.asarray(all_tokens, dtype=object))
        row_of_token = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        # (doc, term) → tf via one unique over a combined key
        key = row_of_token * np.int64(len(uniques)) + codes
        uniq_key, tf = np.unique(key, return_counts=True)
        u_row = uniq_key // len(uniques)
        u_code = (uniq_key % len(uniques)).astype(np.int64)

        terms = uniques[u_code]
        shard = (hash64_array(terms) % np.uint64(self.num_shards)).astype(np.int32)
        out_doc = doc_ids[u_row]
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "tf": pa.array(tf.astype(np.int32)),
                "dl": pa.array(doc_lens[u_row].astype(np.int32)),
                "shard": pa.array(shard),
                "bucket": pa.array((out_doc >> np.int64(self.bucket_bits)).astype(np.int32)),
            }
        )
