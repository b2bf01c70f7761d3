"""Docs partition writer: dedup-keep-latest + deterministic doc ids.

Per url-hash partition (the data-repository analog, SURVEY.md §4.1):

1. keep the latest crawl per ``url`` — max ``warc_ts``, the reference's
   delete-before-insert upsert / URN-collision semantics
   (``Indexer.java:1695-1756``, ``AbstractWriteStrategy.java:158-195``);
2. sort by ``url``; ``doc_id = part * PART_STRIDE + local_rank``
   (``functions/ids.py`` — no cross-partition coordination);
3. write ONE atomic parquet file per partition + a per-part manifest —
   the partition-level checkpoint unit for resume;
4. **return the deduped, id-assigned rows** so the index build
   continues streaming in the same pipeline (fused docs+index).
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

__all__ = ["DocsPartWriter", "part_dir", "DOCS_SCHEMA", "DOCS_OUT_SCHEMA"]

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

# rows passed on to the fused index build
DOCS_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("doc_len", pa.int32()),
    ]
)


def part_dir(docs_dir: str, part: int) -> str:
    return os.path.join(docs_dir, f"part={part:05d}")


class DocsPartWriter:
    def __init__(self, docs_dir: str, fingerprint: str):
        self.docs_dir = docs_dir
        self.fingerprint = fingerprint

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        part = int(group.column("part")[0].as_py())
        pdir = part_dir(self.docs_dir, part)
        out_path = os.path.join(pdir, "data.parquet")
        man_path = os.path.join(pdir, "_manifest.json")

        n_in = group.num_rows
        # latest crawl per url: stable sort (url asc, warc_ts desc), first wins
        g = group.sort_by([("url", "ascending"), ("warc_ts", "descending")])
        urls = np.asarray(g.column("url").to_pylist(), dtype=object)
        keep = np.ones(len(urls), dtype=bool)
        if len(urls) > 1:
            keep[1:] = urls[1:] != urls[:-1]
        g = g.filter(pa.array(keep))
        local_rank = np.arange(g.num_rows, dtype=np.int64)
        g = g.append_column("local_rank", pa.array(local_rank))
        g = g.select([f.name for f in DOCS_SCHEMA]).cast(DOCS_SCHEMA)

        existing = load_manifest(man_path)
        already = (
            existing
            and existing.get("fingerprint") == self.fingerprint
            and os.path.exists(out_path)
        )
        if not already:
            buf = io.BytesIO()
            pq.write_table(g, buf, compression="zstd")
            data = buf.getvalue()
            atomic_write_bytes(out_path, data)
            atomic_write_json(
                man_path,
                {
                    "fingerprint": self.fingerprint,
                    "part": part,
                    "n_rows": g.num_rows,
                    "sum_dl": int(np.sum(g.column("doc_len").to_numpy(), dtype=np.int64)),
                    "n_dups_removed": n_in - g.num_rows,
                    "bytes": len(data),
                    "seconds": time.time() - t0,
                },
            )

        return pa.table(
            {
                "doc_id": pa.array(part * PART_STRIDE + local_rank),
                "text": g.column("text"),
                "doc_len": g.column("doc_len"),
            }
        )
