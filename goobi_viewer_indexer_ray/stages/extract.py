"""Extract stage: ``pages(html:binary) → docs_raw(text, doc_len, part)``.

The actor-pool transposition of the reference's per-page full-text
chain (``helper/FulltextAugmentor.java:78-238``; ALTO converters held
as per-process objects, ``helper/TextHelper.java:139-151`` — our ST4):
a callable class so per-worker setup happens once in ``__init__`` and
``__call__`` handles one zero-copy Arrow batch.

Drops ``html`` immediately on output (SURVEY.md §7.4.6: binary blobs
must not travel further down the pipeline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.extract import extract_text
from ..functions.hashing import part_array

__all__ = ["ExtractPages", "DOCS_RAW_SCHEMA"]

DOCS_RAW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("lang", pa.string()),
        ("text", pa.string()),
        ("doc_len", pa.int32()),
        ("part", pa.int32()),
    ]
)


class ExtractPages:
    """html → canonical text + url-hash partition id.

    ``doc_len`` is emitted as a 0 placeholder: the docs writer fills it
    from the SAME tokenization that builds the posting runs
    (``TokenizeEncodeRuns.encode_with_doc_lens``), so the corpus is
    tokenized ONCE per build instead of twice — tokenizing here would
    also waste work on rows dedup later drops.

    Engine policy for the optional pre-extracted ``text`` input column:
    it is *ignored* — text is always re-derived from ``html`` so the
    byte-identical invariant has a single source of truth (mirrors the
    reference's priority chain always re-reading source files rather
    than trusting stale index state).
    """

    def __init__(self, num_parts: int, part_map: dict[str, int] | None = None):
        self.num_parts = num_parts
        # optional explicit url → part assignment (a partition
        # STRATEGY's ledger — functions/partition.py); urls not in the
        # map fall back to the hash.  The map rides the closure/actor
        # init: it is the ingest-batch small side, never corpus-sized.
        self.part_map = part_map
        # touch the module-level compiled regexes once per actor
        self._extract = extract_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html")
        texts: list[str] = []
        extract = self._extract
        for v in htmls:
            texts.append(extract(v.as_py()))
        doc_lens = [0] * len(texts)  # finalized by the docs writer
        urls = batch.column("url")
        url_list = urls.to_pylist()
        parts = part_array(url_list, self.num_parts)
        if self.part_map:
            pm = self.part_map
            parts = np.array(
                [pm.get(u, int(h)) for u, h in zip(url_list, parts)], np.int32
            )
        return pa.table(
            {
                "url": urls,
                "warc_ts": batch.column("warc_ts"),
                "lang": batch.column("lang"),
                "text": pa.array(texts, pa.string()),
                "doc_len": pa.array(doc_lens, pa.int32()),
                "part": pa.array(parts),
            }
        )
