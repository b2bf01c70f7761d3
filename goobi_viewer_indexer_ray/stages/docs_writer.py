"""Docs partition writer: dedup-keep-latest + deterministic doc ids +
per-partition SPIMI run cache.

Per url-hash partition (the data-repository analog, SURVEY.md §4.1):

1. keep the latest crawl per ``url`` — max ``warc_ts``, the reference's
   delete-before-insert upsert / URN-collision semantics
   (``Indexer.java:1695-1756``, ``AbstractWriteStrategy.java:158-195``);
2. sort by ``url``; ``doc_id = part * PART_STRIDE + local_rank``
   (``functions/ids.py`` — no cross-partition coordination);
3. write the docs part file AND the partition's compressed SPIMI runs
   (``runs/part=*/runs.parquet``) — both atomic, both manifested.
   The run cache is what makes index rebuilds and incremental updates
   partition-level: only dirty partitions re-extract/re-tokenize; the
   term-shard shuffle re-reads cheap compressed runs;
4. **return the run rows** so the fused build streams straight into
   the ``groupby(shard)`` merge.
"""

from __future__ import annotations

import io
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.ids import PART_STRIDE
from ..state.manifest import atomic_write_bytes, atomic_write_json, load_manifest
from .postings import RUNS_SCHEMA, TokenizeEncodeRuns

__all__ = ["DocsPartWriter", "dedup_and_rank", "part_dir", "runs_part_path", "DOCS_SCHEMA"]

DOCS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("lang", pa.string()),
        ("text", pa.string()),
        ("doc_len", pa.int32()),
        ("part", pa.int32()),
        ("local_rank", pa.int64()),
    ]
)


def part_dir(docs_dir: str, part: int) -> str:
    return os.path.join(docs_dir, f"part={part:05d}")


def runs_part_path(runs_dir: str, part: int) -> str:
    return os.path.join(runs_dir, f"part={part:05d}", "runs.parquet")


def dedup_and_rank(group: pa.Table) -> pa.Table:
    """Rows of one part → deduped (latest warc_ts per url), url-sorted,
    with ``local_rank`` — the pure partition semantics.

    Tie-break on equal (url, warc_ts): descending content hash of the
    extracted text, then descending lang — so the survivor is a pure
    function of logical content, independent of Ray's arrival order
    (byte-identity invariant; mirrored by the oracle's selection rule).
    """
    from ..functions.hashing import hash64_array

    th = hash64_array(
        [t or "" for t in group.column("text").to_pylist()]
    ).astype(np.uint64)
    group = group.append_column("_th", pa.array(th, pa.uint64()))
    g = group.sort_by(
        [
            ("url", "ascending"),
            ("warc_ts", "descending"),
            ("_th", "descending"),
            ("lang", "descending"),
        ]
    )
    urls = np.asarray(g.column("url").to_pylist(), dtype=object)
    keep = np.ones(len(urls), dtype=bool)
    if len(urls) > 1:
        keep[1:] = urls[1:] != urls[:-1]
    g = g.filter(pa.array(keep))
    g = g.append_column("local_rank", pa.array(np.arange(g.num_rows, dtype=np.int64)))
    return g.select([f.name for f in DOCS_SCHEMA]).cast(DOCS_SCHEMA)


class DocsPartWriter:
    def __init__(self, docs_dir: str, runs_dir: str, fingerprint: str, num_shards: int):
        self.docs_dir = docs_dir
        self.runs_dir = runs_dir
        self.fingerprint = fingerprint
        self.tokenizer = TokenizeEncodeRuns(num_shards)

    def __call__(self, group: pa.Table, part: int | None = None) -> pa.Table:
        t0 = time.time()
        if part is None:
            part = int(group.column("part")[0].as_py())
        pdir = part_dir(self.docs_dir, part)
        docs_path = os.path.join(pdir, "data.parquet")
        docs_man = os.path.join(pdir, "_manifest.json")
        runs_path = runs_part_path(self.runs_dir, part)
        runs_man = os.path.join(os.path.dirname(runs_path), "_manifest.json")

        em_docs = load_manifest(docs_man)
        em_runs = load_manifest(runs_man)
        if (
            em_docs
            and em_runs
            and em_docs.get("fingerprint") == self.fingerprint
            and em_runs.get("fingerprint") == self.fingerprint
            and os.path.exists(docs_path)
            and os.path.exists(runs_path)
        ):
            return pq.read_table(runs_path)  # resume: reuse cached runs

    # ---- compute part content ----
        n_in = group.num_rows
        g = dedup_and_rank(group)
        # no doc_len column → the tokenizer derives counts itself, and
        # those counts BECOME the stored doc_len: one tokenize pass per
        # corpus instead of two (extract used to tokenize a second
        # time just for doc_len)
        doc_rows = pa.table(
            {
                "doc_id": pa.array(
                    part * PART_STRIDE + np.arange(g.num_rows, dtype=np.int64)
                ),
                "text": g.column("text"),
            }
        )
        if g.num_rows:
            runs, doc_lens = self.tokenizer.encode_with_doc_lens(doc_rows)
            g = g.set_column(
                g.schema.get_field_index("doc_len"),
                "doc_len",
                pa.array(doc_lens.astype(np.int32), pa.int32()),
            )
        else:
            runs = RUNS_SCHEMA.empty_table()

        buf = io.BytesIO()
        pq.write_table(g, buf, compression="zstd")
        data = buf.getvalue()
        atomic_write_bytes(docs_path, data)
        atomic_write_json(
            docs_man,
            {
                "fingerprint": self.fingerprint,
                "part": part,
                "n_rows": g.num_rows,
                "sum_dl": int(np.sum(g.column("doc_len").to_numpy(), dtype=np.int64))
                if g.num_rows
                else 0,
                "n_dups_removed": n_in - g.num_rows,
                "bytes": len(data),
                "seconds": time.time() - t0,
            },
        )
        rbuf = io.BytesIO()
        pq.write_table(runs, rbuf, compression="zstd")
        rdata = rbuf.getvalue()
        atomic_write_bytes(runs_path, rdata)
        atomic_write_json(
            runs_man,
            {
                "fingerprint": self.fingerprint,
                "part": part,
                "n_runs": runs.num_rows,
                "bytes": len(rdata),
            },
        )
        return runs
