"""Re-crawl snapshot diff: classify every URL across two crawl
snapshots as added / removed / changed / unchanged.

Reference semantics transposed: the hotfolder decides per record
whether to (re)index, skip, or delete by comparing the incoming file
against what the index already holds (``Hotfolder.java`` dispatch +
``Indexer`` delta handling: a re-dropped record with identical content
is a no-op, changed content re-indexes, a ``.delete`` removes).  At
web scale the same decision runs over two *crawl snapshots*: the
previous crawl's (url, content-hash) manifest vs the new crawl's —
the standard incremental re-index planner (only ``added`` + ``changed``
urls enter the indexing pipeline; ``removed`` urls become tombstones).

Scale shape: the two snapshots are independent Datasets (at 100 TB,
two manifest tables on disk).  Each is tagged with constant presence
columns (no data movement), ``union`` concatenates (not a shuffle),
and ONE ``groupby(url)`` aggregate — ``Sum`` of the presence flags,
``Max`` of the null-masked hashes — produces one row per url; the
status classification is a fully vectorized per-batch pass over the
aggregate output.  The shuffle carries exactly one row per (url,
snapshot); no driver-side state, no ``map_groups`` over millions of
2-row groups.  ``changed`` is decided by HASH INEQUALITY of the two
sides (the real content compare), never by any generation rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["snapshot_diff"]

# int64-safe hash domain (md5 prefix folded below 2^63; 0 = absent).
_HMOD = np.uint64(9223372036854775807)


def content_hash64(texts) -> np.ndarray:
    """md5-prefix uint64 folded into int64 range — SQL replay:
    ``('0x' || substr(md5(t), 1, 16))::UBIGINT % 9223372036854775807``."""
    from ..functions.hashing import md5_hash64_array

    return (md5_hash64_array(texts) % _HMOD).astype(np.int64)


def snapshot_diff(snap_a, snap_b, *, key_col: str = "url", hash_col: str = "h"):
    """Diff two (url, content-hash) snapshot Datasets.

    Returns one row per url: ``(url, doc_id, status, h_a, h_b)`` with
    status ∈ {added, removed, changed, unchanged} (``added`` = only in
    B, ``removed`` = only in A, ``changed`` = in both with h_a ≠ h_b).
    Absent-side hashes surface as 0 (hashes are folded into [1, 2^63),
    so 0 is unambiguous).  Extra columns present in both snapshots
    (e.g. ``doc_id``) are carried through via ``Max``.
    """
    from ray.data.aggregate import Max, Sum

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            one = pa.array(np.ones(n, dtype=np.int64))
            zero = pa.array(np.zeros(n, dtype=np.int64))
            h = pc.cast(t.column(hash_col), pa.int64())
            return pa.table(
                {
                    key_col: t.column(key_col),
                    "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                    "in_a": one if side == "a" else zero,
                    "in_b": one if side == "b" else zero,
                    "h_a": h if side == "a" else zero,
                    "h_b": h if side == "b" else zero,
                }
            )

        return fn

    unioned = snap_a.map_batches(tag("a"), batch_format="pyarrow").union(
        snap_b.map_batches(tag("b"), batch_format="pyarrow")
    )
    agg = unioned.groupby(key_col).aggregate(
        Sum("in_a"), Sum("in_b"), Max("h_a"), Max("h_b"), Max("doc_id")
    )

    def classify(t: pa.Table) -> pa.Table:
        in_a = t.column("sum(in_a)").to_numpy(zero_copy_only=False)
        in_b = t.column("sum(in_b)").to_numpy(zero_copy_only=False)
        h_a = t.column("max(h_a)").to_numpy(zero_copy_only=False)
        h_b = t.column("max(h_b)").to_numpy(zero_copy_only=False)
        status = np.where(
            in_a == 0,
            "added",
            np.where(in_b == 0, "removed", np.where(h_a != h_b, "changed", "unchanged")),
        )
        return pa.table(
            {
                key_col: t.column(key_col),
                "doc_id": pc.cast(t.column("max(doc_id)"), pa.int64()),
                "status": pa.array(status.astype(object), pa.string()),
                "h_a": pa.array(h_a, pa.int64()),
                "h_b": pa.array(h_b, pa.int64()),
            }
        )

    return agg.map_batches(classify, batch_format="pyarrow")
