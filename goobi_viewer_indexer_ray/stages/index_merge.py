"""Index merge: compressed SPIMI runs → per-(shard, doc-range) segments.

The reduce side of SURVEY.md §2.6 A8 (the work the reference delegates
to Lucene's index writer — its segment model is also the reference
analog for this layout, ``helper/SolrSearchIndex.java:388``).  Input:
the ``groupby(shard, bucket)`` groups of
:class:`~..stages.postings.TokenizeEncodeRuns` output — per-(term,
batch) compressed runs, where ``bucket = first_doc //
bucket_size_docs`` is a doc-range bucket (every run lies entirely in
one bucket by construction).  For each (shard, bucket) group:

1. sort runs by (term, first_doc);
2. decode ALL runs in three vectorized passes (one segmented varint
   decode per column for the whole segment — no per-run Python work);
3. re-sort per term by doc_id and **re-encode canonically** into
   ``BLOCK_SIZE`` blocks with per-block ``max_doc`` / ``max_tf`` /
   ``min_dl`` metadata.  Blocks restart at every segment boundary, so
   a segment's bytes are a pure function of the logical postings in
   its doc range — independent of Ray's batching (resume
   byte-identity / rank determinism) AND independent of which other
   segments exist;
4. write ONE atomic ``index/shard=S/seg=B/terms.parquet`` + manifest
   (the checkpoint unit; reference analog: commit-per-record,
   ``SolrSearchIndex.java:538``).

Scale property (the head-term guarantee): NO single reduce task ever
holds one term's full postings — a term's postings are split across
``num_range_buckets`` independent segments, each bounded by
``corpus / (num_shards × num_range_buckets)``.  Query-side,
:class:`~..pipelines.query.LocalIndex` concatenates a term's
per-segment block lists in bucket order (doc order) — blocks are
independently decodable, so no re-encoding happens at read time.

The segment is also the incremental-update unit: a segment's
fingerprint derives from the run fingerprints of the parts in its
bucket, so an update that dirties one part re-merges only that
bucket's segments and leaves every other segment untouched on disk.
"""

from __future__ import annotations

import io
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import BLOCK_SIZE, decode_varints, encode_varints_segmented
from ..state.manifest import atomic_write_bytes, atomic_write_json, load_manifest

__all__ = ["BLOCK_STRUCT", "TERMS_SCHEMA", "SegmentWriter", "segment_dir",
           "segment_paths"]

BLOCK_STRUCT = pa.struct(
    [
        ("n", pa.int32()),
        ("first_doc", pa.int64()),
        ("max_doc", pa.int64()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
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

# Positional variant (Lucene-style positions payload): one extra binary
# per block — the block's postings' within-doc token positions,
# per-posting delta-encoded (first absolute, then gaps; the posting's
# tf says how many values belong to it).  A build opts in via
# ``TokenizeEncodeRuns(with_positions=True)``; the default layout and
# its byte-identity contract are untouched.
BLOCK_STRUCT_POS = pa.struct(list(BLOCK_STRUCT) + [pa.field("poss", pa.binary())])


def segment_dir(index_dir: str, shard: int, bucket: int) -> str:
    return os.path.join(index_dir, f"shard={shard:05d}", f"seg={bucket:05d}")


def segment_paths(index_dir: str) -> list[dict]:
    """``[{shard, bucket, path}, ...]`` for an index directory.

    When the sibling ``index_manifest.json`` exists, only the segments
    it lists are returned — a stale ``shard=*/seg=*`` directory left
    behind by an earlier build with different ``num_shards`` /
    ``num_range_buckets`` must never be silently merged into the live
    index (it would surface phantom docs inconsistent with the docs
    manifest).  The directory walk is the fallback for manifest-less
    ad-hoc index dirs.
    """
    man = load_manifest(os.path.join(os.path.dirname(index_dir.rstrip("/")),
                                     "index_manifest.json"))
    out = []
    if man and "segments" in man:
        for s in man["segments"]:
            # optional per-segment file indirection: an optimize pass
            # (stages/optimize.py) commits its compacted segment under a
            # fingerprinted file name so the whole swap is ONE atomic
            # manifest write — readers see the old or the new index,
            # never a mix.  Default stays "terms.parquet".
            p = os.path.join(segment_dir(index_dir, int(s["shard"]), int(s["bucket"])),
                             s.get("file") or "terms.parquet")
            if not os.path.exists(p):
                # a manifest that lists a missing file means the index
                # was damaged, or this reader loaded a manifest that an
                # optimize pass has since superseded (old files cleaned
                # up).  Serving a silently partial/empty index would be
                # far worse than failing — the caller can re-read the
                # (new) manifest and retry.
                raise FileNotFoundError(
                    f"index manifest lists missing segment file {p} — "
                    "index damaged or superseded by a concurrent "
                    "optimize; reload the manifest"
                )
            out.append({"shard": int(s["shard"]), "bucket": int(s["bucket"]), "path": p})
        return out
    if os.path.isdir(index_dir):
        for d in sorted(os.listdir(index_dir)):
            if not d.startswith("shard="):
                continue
            for seg in sorted(os.listdir(os.path.join(index_dir, d))):
                p = os.path.join(index_dir, d, seg, "terms.parquet")
                if seg.startswith("seg=") and os.path.exists(p):
                    out.append(
                        {
                            "shard": int(d.split("=")[1]),
                            "bucket": int(seg.split("=")[1]),
                            "path": p,
                        }
                    )
    return out


def _concat_bytes(col: pa.ChunkedArray | pa.Array) -> bytes:
    return b"".join(col.to_pylist())


class SegmentWriter:
    """One (shard, bucket) group's run rows → atomic segment file.

    ``seg_fps`` maps bucket → expected fingerprint (per-bucket, so an
    incremental update re-merges only dirty buckets); ``default_fp``
    covers buckets not in the map (fresh single-fingerprint builds).
    """

    def __init__(self, index_dir: str, default_fp: str,
                 seg_fps: dict[int, str] | None = None,
                 file_name: str = "terms.parquet"):
        self.index_dir = index_dir
        self.default_fp = default_fp
        self.seg_fps = seg_fps or {}
        # non-default file names (optimize passes) keep their own
        # sidecar manifest so the live segment's resume state is never
        # clobbered while the old file is still the published one
        self.file_name = file_name
        self.man_name = ("_manifest.json" if file_name == "terms.parquet"
                         else f"_manifest-{file_name}.json")

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        shard = int(group.column("shard")[0].as_py())
        bucket = int(group.column("bucket")[0].as_py())
        fp = self.seg_fps.get(bucket, self.default_fp)
        sdir = segment_dir(self.index_dir, shard, bucket)
        out_path = os.path.join(sdir, self.file_name)
        man_path = os.path.join(sdir, self.man_name)

        existing = load_manifest(man_path)
        if existing and existing.get("fingerprint") == fp and os.path.exists(out_path):
            return self._row(shard, bucket, fp, existing["n_terms"],
                             existing["n_postings"], existing.get("sum_cf", 0),
                             existing["bytes"], 0.0, True)

        if group.num_rows == 0:
            return self._row(shard, bucket, fp, 0, 0, 0, 0, 0.0, False)
        with_pos = "poss" in group.column_names
        g = group.sort_by([("term", "ascending"), ("first_doc", "ascending")])
        run_df = g.column("df").to_numpy()
        run_tf_sum = g.column("cf").to_numpy()

        # ---- one vectorized decode for the whole segment ----
        gaps = decode_varints(_concat_bytes(g.column("docs"))).astype(np.int64)
        tfs = decode_varints(_concat_bytes(g.column("tfs"))).astype(np.int64)
        dls = decode_varints(_concat_bytes(g.column("dls"))).astype(np.int64)
        n_post = gaps.size

        run_starts = np.concatenate([[0], np.cumsum(run_df)[:-1]]).astype(np.int64)
        # absolute doc ids: per-run cumsum via global cumsum minus run base
        cs = np.cumsum(gaps)
        base = np.where(run_starts > 0, cs[run_starts - 1], 0)
        doc_abs = cs - np.repeat(base, run_df)

        # term id per run (runs sorted by term)
        terms_np = np.asarray(g.column("term").to_pylist(), dtype=object)
        new_term = np.ones(terms_np.size, dtype=bool)
        if terms_np.size > 1:
            new_term[1:] = terms_np[1:] != terms_np[:-1]
        run_term_idx = np.cumsum(new_term) - 1
        post_term_idx = np.repeat(run_term_idx, run_df)

        # canonical per-term doc order (robust to any map-side batching)
        order = np.lexsort((doc_abs, post_term_idx))
        pos_sorted = None
        if with_pos:
            from ..stages.postings import _gather_segments

            pos_gaps = decode_varints(_concat_bytes(g.column("poss"))).astype(np.int64)
            occ_starts_pre = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
            cs_p = np.cumsum(pos_gaps)
            base_p = np.where(occ_starts_pre > 0, cs_p[occ_starts_pre - 1], 0)
            abs_pos = cs_p - np.repeat(base_p, tfs)
            pos_sorted = abs_pos[_gather_segments(occ_starts_pre, tfs[order], order)]
        doc_abs, tfs, dls, post_term_idx = (
            doc_abs[order], tfs[order], dls[order], post_term_idx[order]
        )

        uniq_terms = terms_np[new_term]
        term_starts = np.flatnonzero(np.diff(post_term_idx, prepend=-1))
        term_df = np.diff(np.append(term_starts, n_post))
        term_cf = np.add.reduceat(run_tf_sum, np.flatnonzero(new_term))

        # ---- canonical block encode, fully vectorized across terms ----
        # (byte-identical to functions.codec.encode_term_blocks per term)
        pos_in_term = np.arange(n_post, dtype=np.int64) - np.repeat(term_starts, term_df)
        block_starts = np.flatnonzero(pos_in_term % BLOCK_SIZE == 0)
        block_ends = np.append(block_starts[1:], n_post)
        blocks_per_term = np.bincount(
            post_term_idx[block_starts], minlength=uniq_terms.size
        )
        out_gaps = np.empty(n_post, dtype=np.uint64)
        np.subtract(doc_abs[1:], doc_abs[:-1], out=out_gaps[1:], casting="unsafe")
        out_gaps[block_starts] = doc_abs[block_starts].astype(np.uint64)
        docs_b = encode_varints_segmented(out_gaps, block_starts)
        tfs_b = encode_varints_segmented(tfs.astype(np.uint64), block_starts)
        dls_b = encode_varints_segmented(dls.astype(np.uint64), block_starts)
        b_max_tf = np.maximum.reduceat(tfs, block_starts).astype(np.int32)
        b_min_dl = np.minimum.reduceat(dls, block_starts).astype(np.int32)

        arrays = [
            pa.array((block_ends - block_starts).astype(np.int32), pa.int32()),
            pa.array(doc_abs[block_starts], pa.int64()),
            pa.array(doc_abs[block_ends - 1], pa.int64()),
            pa.array(b_max_tf, pa.int32()),
            pa.array(b_min_dl, pa.int32()),
            pa.array(docs_b, pa.binary()),
            pa.array(tfs_b, pa.binary()),
            pa.array(dls_b, pa.binary()),
        ]
        fields = list(BLOCK_STRUCT)
        if with_pos:
            # per-posting delta re-encode in canonical order, one blob
            # per BLOCK (concatenation of its postings' varint runs)
            occ_f = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
            out_pg = np.empty(pos_sorted.shape, dtype=np.uint64)
            np.subtract(pos_sorted[1:], pos_sorted[:-1], out=out_pg[1:], casting="unsafe")
            out_pg[occ_f] = pos_sorted[occ_f].astype(np.uint64)
            post_blobs = encode_varints_segmented(out_pg, occ_f)
            poss_b = [
                b"".join(post_blobs[s:e])
                for s, e in zip(block_starts.tolist(), block_ends.tolist())
            ]
            arrays.append(pa.array(poss_b, pa.binary()))
            fields = list(BLOCK_STRUCT_POS)
        struct = pa.StructArray.from_arrays(arrays, fields=fields)
        offsets = np.concatenate([[0], np.cumsum(blocks_per_term)]).astype(np.int32)
        blocks_col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)

        table = pa.table(
            {
                "term": pa.array(uniq_terms, pa.string()),
                "df": pa.array(term_df, pa.int64()),
                "cf": pa.array(term_cf, pa.int64()),
                "blocks": blocks_col,
            }
        )
        buf = io.BytesIO()
        pq.write_table(table, buf, compression="zstd")
        data = buf.getvalue()
        atomic_write_bytes(out_path, data)
        sum_cf = int(term_cf.sum())
        atomic_write_json(
            man_path,
            {
                "fingerprint": fp,
                "shard": shard,
                "bucket": bucket,
                "n_terms": int(uniq_terms.size),
                "n_postings": int(n_post),
                "sum_cf": sum_cf,
                "bytes": len(data),
            },
        )
        return self._row(shard, bucket, fp, int(uniq_terms.size), int(n_post),
                         sum_cf, len(data), time.time() - t0, False)

    @staticmethod
    def _row(shard, bucket, fp, n_terms, n_postings, sum_cf, nbytes, seconds,
             skipped) -> pa.Table:
        return pa.table(
            {
                "shard": pa.array([shard], pa.int32()),
                "bucket": pa.array([bucket], pa.int32()),
                "fp": pa.array([fp], pa.string()),
                "n_terms": pa.array([n_terms], pa.int64()),
                "n_postings": pa.array([n_postings], pa.int64()),
                "sum_cf": pa.array([sum_cf], pa.int64()),
                "bytes": pa.array([nbytes], pa.int64()),
                "seconds": pa.array([seconds], pa.float64()),
                "skipped": pa.array([skipped]),
            }
        )
