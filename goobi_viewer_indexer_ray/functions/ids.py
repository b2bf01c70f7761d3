"""Deterministic doc-id assignment (replaces the reference's random
UUID IDDOCs, ``Indexer.java:480``).

    doc_id = part * PART_STRIDE + local_rank

where ``part = hash64(url) % num_parts`` and ``local_rank`` is the
row's position in the url-sorted, deduped partition.  Strided ids (not
dense) make assignment a pure per-partition function — no driver-side
prefix sum, no barrier — so the whole docs+index build runs as ONE
streaming pipeline.  Ids are strictly increasing within a partition
and partitions occupy disjoint ranges, which the delta/varint posting
codec relies on.

PART_STRIDE = 2^36 → up to ~68 B docs per partition and ~2^27
partitions inside a signed int64.
"""

from __future__ import annotations

PART_STRIDE = 1 << 36


def doc_id_for(part: int, local_rank: int) -> int:
    return part * PART_STRIDE + local_rank


def part_of_doc(doc_id: int) -> int:
    return doc_id >> 36
