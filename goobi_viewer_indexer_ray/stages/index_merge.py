"""Index merge: posting rows → compressed per-shard term files.

The reduce side of SURVEY.md §2.6 A8 (the work the reference delegates
to Lucene's index writer), as a salted two-stage shuffle (§4.1):

- **Stage A — EncodeRuns**: ``groupby(["shard", "bucket"])`` where
  ``bucket = doc_id >> bucket_bits`` is a doc-range salt.  Each group
  sorts its postings by (term, doc_id) and encodes per-term runs of
  delta+varint blocks.  Group memory is bounded by (postings of one
  shard within one doc range), tunable via ``bucket_bits`` — this is
  what keeps a head term ("the", df≈N) from materializing all N of its
  postings in one reducer.
- **Stage B — ShardWriter**: ``groupby("shard")`` over the *compressed*
  runs (≈5–10× smaller than raw postings).  Buckets partition doc-id
  space in increasing order, so merging a term's runs is a plain
  concatenation of independently-decodable block lists — no decode, no
  re-sort.  Each shard is written as ONE atomic parquet file plus a
  per-shard manifest (the checkpoint unit for index resume).

Reference parity anchors: commit-per-record → atomic per-shard rename
(``SolrSearchIndex.java:538``); spill batching → block size
(``SerializingSolrWriteStrategy.java:77``).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import encode_term_blocks
from ..state.manifest import atomic_write_bytes, atomic_write_json, load_manifest

__all__ = ["BLOCK_STRUCT", "RUNS_SCHEMA", "TERMS_SCHEMA", "EncodeRuns", "ShardWriter", "shard_paths"]

BLOCK_STRUCT = pa.struct(
    [
        ("n", pa.int32()),
        ("first_doc", pa.int64()),
        ("max_doc", pa.int64()),
        ("max_impact", pa.float32()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
    ]
)

RUNS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("bucket", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("blocks", pa.list_(BLOCK_STRUCT)),
    ]
)

TERMS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("blocks", pa.list_(BLOCK_STRUCT)),
    ]
)


class EncodeRuns:
    """(shard, bucket) posting group → per-term compressed runs."""

    def __init__(self, avgdl: float):
        self.avgdl = float(avgdl)

    def __call__(self, group: pa.Table) -> pa.Table:
        terms_arr = group.column("term").to_pandas()
        codes, uniques = pd.factorize(terms_arr, sort=True)
        doc = group.column("doc_id").to_numpy()
        tf = group.column("tf").to_numpy().astype(np.int64)
        dl = group.column("dl").to_numpy().astype(np.int64)
        order = np.lexsort((doc, codes))
        codes, doc, tf, dl = codes[order], doc[order], tf[order], dl[order]
        starts = np.flatnonzero(np.diff(codes, prepend=-1))
        ends = np.append(starts[1:], codes.size)

        shard = group.column("shard")[0].as_py()
        bucket = group.column("bucket")[0].as_py()
        out_terms, out_df, out_cf, out_blocks = [], [], [], []
        for s, e in zip(starts, ends):
            out_terms.append(uniques[codes[s]])
            out_df.append(int(e - s))
            out_cf.append(int(tf[s:e].sum()))
            out_blocks.append(encode_term_blocks(doc[s:e], tf[s:e], dl[s:e], self.avgdl))
        n = len(out_terms)
        return pa.table(
            {
                "term": pa.array(out_terms, pa.string()),
                "shard": pa.array([shard] * n, pa.int32()),
                "bucket": pa.array([bucket] * n, pa.int32()),
                "df": pa.array(out_df, pa.int64()),
                "cf": pa.array(out_cf, pa.int64()),
                "blocks": pa.array(out_blocks, pa.list_(BLOCK_STRUCT)),
            }
        )


def shard_dir(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, f"shard={shard:05d}")


def shard_paths(index_dir: str) -> list[str]:
    out = []
    if os.path.isdir(index_dir):
        for d in sorted(os.listdir(index_dir)):
            p = os.path.join(index_dir, d, "terms.parquet")
            if d.startswith("shard=") and os.path.exists(p):
                out.append(p)
    return out


class ShardWriter:
    """Shard's run rows → one atomic ``terms.parquet`` + shard manifest.

    Emits a one-row manifest table per shard (collected by the driver
    into the index manifest — the lineage/metrics ledger, the analog of
    the reference's success-marker files, ``MetsIndexer.java:176-262``).
    """

    def __init__(self, index_dir: str, fingerprint: str):
        self.index_dir = index_dir
        self.fingerprint = fingerprint

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        shard = group.column("shard")[0].as_py()
        sdir = shard_dir(self.index_dir, shard)
        out_path = os.path.join(sdir, "terms.parquet")
        man_path = os.path.join(sdir, "_manifest.json")

        existing = load_manifest(man_path)
        if existing and existing.get("fingerprint") == self.fingerprint and os.path.exists(out_path):
            return pa.table(
                {
                    "shard": pa.array([shard], pa.int32()),
                    "n_terms": pa.array([existing["n_terms"]], pa.int64()),
                    "n_postings": pa.array([existing["n_postings"]], pa.int64()),
                    "bytes": pa.array([existing["bytes"]], pa.int64()),
                    "seconds": pa.array([0.0], pa.float64()),
                    "skipped": pa.array([True]),
                }
            )

        # merge runs per term: buckets are disjoint, increasing doc ranges
        # → concatenation of block lists, no re-encode.
        sorted_g = group.sort_by([("term", "ascending"), ("bucket", "ascending")])
        terms = sorted_g.column("term")
        codes, uniques = pd.factorize(terms.to_pandas(), sort=False)  # already sorted
        df = sorted_g.column("df").to_numpy()
        cf = sorted_g.column("cf").to_numpy()
        blocks_col = sorted_g.column("blocks").to_pylist()
        starts = np.flatnonzero(np.diff(codes, prepend=-1))
        ends = np.append(starts[1:], codes.size)

        m_terms, m_df, m_cf, m_blocks = [], [], [], []
        for s, e in zip(starts, ends):
            m_terms.append(uniques[codes[s]])
            m_df.append(int(df[s:e].sum()))
            m_cf.append(int(cf[s:e].sum()))
            merged: list = []
            for b in blocks_col[s:e]:
                merged.extend(b)
            m_blocks.append(merged)

        table = pa.table(
            {
                "term": pa.array(m_terms, pa.string()),
                "df": pa.array(m_df, pa.int64()),
                "cf": pa.array(m_cf, pa.int64()),
                "blocks": pa.array(m_blocks, pa.list_(BLOCK_STRUCT)),
            }
        )
        import io

        buf = io.BytesIO()
        pq.write_table(table, buf, compression="zstd")
        data = buf.getvalue()
        atomic_write_bytes(out_path, data)
        n_postings = int(np.sum(m_df, dtype=np.int64))
        atomic_write_json(
            man_path,
            {
                "fingerprint": self.fingerprint,
                "shard": shard,
                "n_terms": len(m_terms),
                "n_postings": n_postings,
                "bytes": len(data),
            },
        )
        return pa.table(
            {
                "shard": pa.array([shard], pa.int32()),
                "n_terms": pa.array([len(m_terms)], pa.int64()),
                "n_postings": pa.array([n_postings], pa.int64()),
                "bytes": pa.array([len(data)], pa.int64()),
                "seconds": pa.array([time.time() - t0], pa.float64()),
                "skipped": pa.array([False]),
            }
        )
