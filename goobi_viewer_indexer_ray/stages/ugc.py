"""UGC / annotation doc generation (M11).

Transposes the reference's crowdsourcing-content path: ``Indexer.java``
``:516-689`` (page-level UGC XML → one Solr doc per annotation, typed
fields per annotation kind) and ``:707-799`` (WebAnnotation JSON →
UGC docs), both of which also build the owner's ``UGCTERMS`` aggregate
search string from every annotation value.

Web-corpus transposition: an "annotation" is a typed judgment phrase
matched in the document text (adjective + target noun — the
PERSON/ADDRESS/COMMENT typed-annotation analog).  Each match becomes
one child UGC record carrying:

- ``pos``        annotation ordinal within the doc (the page-order analog),
- ``value``      the full matched text (``MD_BODY``),
- ``ugc_type``   the annotation kind (typed-field analog),
- ``ugc_target`` the annotated entity,
- ``ugcterms``   the OWNER's aggregate of all its annotation values
  (space-joined, in order — the UGCTERMS search field), repeated on
  each child row exactly as the reference copies it onto the owner doc.

One compiled-regex pass per doc inside ``map_batches`` (the pattern is
compiled once per actor/task closure); no shuffle — per-doc work only.
"""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = ["UGC_PATTERN", "ExtractUgc"]

# adjective judgment + target noun — the typed-annotation shape
UGC_PATTERN = r"(?P<ugc_type>slow|fast|big|small) (?P<ugc_target>query|scan|join)"

_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("pos", pa.int64()),
        ("value", pa.string()),
        ("ugc_type", pa.string()),
        ("ugc_target", pa.string()),
        ("ugcterms", pa.string()),
    ]
)


class ExtractUgc:
    """``map_batches`` stage: text → UGC child records (+ owner
    UGCTERMS aggregate on each)."""

    def __init__(self, pattern: str = UGC_PATTERN):
        self.rx = re.compile(pattern)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        o_id, o_pos, o_val, o_ty, o_tg, o_terms = [], [], [], [], [], []
        finditer = self.rx.finditer
        for did, text in zip(ids, texts):
            ms = list(finditer(text or ""))
            if not ms:
                continue
            terms = " ".join(m.group(0) for m in ms)
            for p, m in enumerate(ms):
                o_id.append(did)
                o_pos.append(p)
                o_val.append(m.group(0))
                o_ty.append(m.group("ugc_type"))
                o_tg.append(m.group("ugc_target"))
                o_terms.append(terms)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "pos": pa.array(o_pos, pa.int64()),
                "value": pa.array(o_val, pa.string()),
                "ugc_type": pa.array(o_ty, pa.string()),
                "ugc_target": pa.array(o_tg, pa.string()),
                "ugcterms": pa.array(o_terms, pa.string()),
            }
        )
