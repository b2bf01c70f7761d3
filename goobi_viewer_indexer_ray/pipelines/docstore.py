"""Random-access document fetch over the partitioned docs store.

The viewer's hottest non-search operation is the PI lookup: a search
returns ids, then the record itself is fetched to render (reference:
``SolrSearchIndex`` ``getDocumentByPI`` usage throughout the viewer
stack; this indexer's docs store is the system of record the reference
keeps in Solr stored fields).

The id layout makes the lookup O(#parts touched), never a scan:
``doc_id = part·2³⁶ + local_rank`` (:mod:`functions.ids`), so a batch
of ids groups by ``doc_id >> 36`` and each group reads EXACTLY ONE
``docs/part=*/data.parquet`` with a ``local_rank IN (...)`` filter —
parquet row-group statistics prune the read inside the file (ranks are
the write order, so they are monotone per row group).

Scale shape: the store is the build's resumable output layout
unchanged; a serving deployment holds one ``DocStore`` per replica
(stateless, cheap — paths only, no data cached) and the per-request
cost is bounded by the ids' part fan-out, not the corpus.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.ids import PART_STRIDE

__all__ = ["DocStore"]


class DocStore:
    """Doc-id → stored record lookup over ``out_dir/docs``."""

    def __init__(self, out_dir: str):
        self.docs_dir = os.path.join(out_dir, "docs")
        if not os.path.isdir(self.docs_dir):
            raise ValueError(f"no docs store under {out_dir}")

    def _part_path(self, part: int) -> str:
        return os.path.join(self.docs_dir, f"part={part:05d}", "data.parquet")

    def get(self, doc_ids) -> pa.Table:
        """Fetch the stored rows for ``doc_ids`` (any iterable of ints).

        Returns one row per FOUND id, in ascending doc_id order, with
        the derived ``doc_id`` column first; unknown ids are silently
        absent (the caller distinguishes by row count — the
        reference's Solr lookup contract).  Each referenced part file
        is opened exactly once.
        """
        ids = sorted({int(d) for d in doc_ids})
        by_part: dict[int, list[int]] = defaultdict(list)
        for d in ids:
            by_part[d >> 36].append(d % PART_STRIDE)
        out: list[pa.Table] = []
        for part in sorted(by_part):
            path = self._part_path(part)
            if not os.path.isfile(path):
                continue
            t = pq.read_table(
                path, filters=[("local_rank", "in", by_part[part])]
            )
            if t.num_rows == 0:
                continue
            rank = t.column("local_rank").to_numpy().astype(np.int64)
            did = (np.int64(part) << np.int64(36)) + rank
            t = t.add_column(0, "doc_id", pa.array(did, pa.int64()))
            out.append(t.sort_by("doc_id"))
        if not out:
            # empty result with the store's real schema + doc_id
            part0 = sorted(os.listdir(self.docs_dir))
            schema = pq.read_schema(
                os.path.join(self.docs_dir, part0[0], "data.parquet")
            )
            empty = schema.empty_table()
            return empty.add_column(0, "doc_id", pa.array([], pa.int64()))
        return pa.concat_tables(out)
