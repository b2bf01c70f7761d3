"""Docs partition writer: dedup-keep-latest + deterministic local ranks.

Per url-hash partition (the data-repository analog, SURVEY.md §4.1):

1. keep the latest crawl per ``url`` — max ``warc_ts``, the reference's
   delete-before-insert upsert / URN-collision semantics
   (``Indexer.java:1695-1756``, ``AbstractWriteStrategy.java:158-195``);
2. sort by ``url`` and assign ``local_rank`` 0..n-1 — stage one of the
   deterministic two-phase doc_id assignment (global
   ``doc_id = offset[part] + local_rank`` after a driver-side prefix
   sum over part counts, replacing the reference's random-UUID IDDOCs,
   ``Indexer.java:480``);
3. write ONE atomic parquet file per partition + a per-part manifest —
   the partition-level checkpoint unit for resume.
"""

from __future__ import annotations

import io
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.manifest import atomic_write_bytes, atomic_write_json, load_manifest

__all__ = ["DocsPartWriter", "part_dir", "DOCS_SCHEMA"]

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


class DocsPartWriter:
    def __init__(self, docs_dir: str, fingerprint: str):
        self.docs_dir = docs_dir
        self.fingerprint = fingerprint

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        part = group.column("part")[0].as_py()
        pdir = part_dir(self.docs_dir, part)
        out_path = os.path.join(pdir, "data.parquet")
        man_path = os.path.join(pdir, "_manifest.json")

        existing = load_manifest(man_path)
        if existing and existing.get("fingerprint") == self.fingerprint and os.path.exists(out_path):
            return self._manifest_row(part, existing["n_rows"], existing["sum_dl"],
                                      existing["n_dups_removed"], existing["bytes"], 0.0, True)

        n_in = group.num_rows
        # latest crawl per url: stable sort (url asc, warc_ts desc), first wins
        g = group.sort_by([("url", "ascending"), ("warc_ts", "descending")])
        urls = np.asarray(g.column("url").to_pylist(), dtype=object)
        keep = np.ones(len(urls), dtype=bool)
        if len(urls) > 1:
            keep[1:] = urls[1:] != urls[:-1]
        g = g.filter(pa.array(keep))
        g = g.append_column("local_rank", pa.array(np.arange(g.num_rows, dtype=np.int64)))
        g = g.select([f.name for f in DOCS_SCHEMA])

        buf = io.BytesIO()
        pq.write_table(g.cast(DOCS_SCHEMA), buf, compression="zstd")
        data = buf.getvalue()
        atomic_write_bytes(out_path, data)
        sum_dl = int(np.sum(g.column("doc_len").to_numpy(), dtype=np.int64))
        atomic_write_json(
            man_path,
            {
                "fingerprint": self.fingerprint,
                "part": part,
                "n_rows": g.num_rows,
                "sum_dl": sum_dl,
                "n_dups_removed": n_in - g.num_rows,
                "bytes": len(data),
            },
        )
        return self._manifest_row(part, g.num_rows, sum_dl, n_in - g.num_rows, len(data),
                                  time.time() - t0, False)

    @staticmethod
    def _manifest_row(part, n_rows, sum_dl, n_dups, nbytes, seconds, skipped) -> pa.Table:
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "n_rows": pa.array([n_rows], pa.int64()),
                "sum_dl": pa.array([sum_dl], pa.int64()),
                "n_dups_removed": pa.array([n_dups], pa.int64()),
                "bytes": pa.array([nbytes], pa.int64()),
                "seconds": pa.array([seconds], pa.float64()),
                "skipped": pa.array([skipped]),
            }
        )
