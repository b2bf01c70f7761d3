"""Index optimize (Lucene forceMerge(k)): compact every shard's
doc-range segments down to at most k canonical segments (default 1).

Reference: the indexer optionally optimizes the Solr index after each
record (``performance.autoOptimize`` — Configuration.java:441-443,
Hotfolder.java invoking ``SolrSearchIndex.optimize()``), which is
Lucene's forceMerge(1): fewer segments, faster term lookups, at the
cost of one full rewrite.  Our transposition compacts the doc-range
segments (index format v3, one ``seg=B`` per doc-range bucket per
shard) back into one segment per shard once a build has gone cold —
the end state a log-structured index wants after its write-heavy phase.

Design (Ray-Data-first, crash-consistent):

- **One task per shard** (``map_batches`` over the shard list): each
  task reads ONLY its shard's segments, decodes the postings flat (one
  vectorized pass — no per-term Python), re-encodes through the SAME
  canonical ``SegmentWriter`` the build uses, so an optimized segment
  is byte-identical to what a fresh ``num_range_buckets=1`` build
  would have produced.  No shuffle: segment→segment compaction is
  embarrassingly parallel across shards.
- **Atomic publish via file indirection**: the compacted segment is
  written under a fingerprinted file name (``terms-<fp8>.parquet``)
  next to the live ``terms.parquet``; readers keep using the old
  manifest until ONE atomic ``index_manifest.json`` write flips every
  shard to the new file (segments carry an explicit ``file`` field —
  see ``segment_paths``).  A crash at any point leaves either the old
  or the new view, never a mix; stale files are deleted only after the
  manifest commit.
- **Resumable**: each compacted segment records the optimize
  fingerprint in its sidecar manifest; a re-run skips shards already
  compacted (checked BEFORE reading, so a finished shard is never
  re-merged against its own output).
- **Update-compatible**: the published ``bucket_size_docs`` spans all
  parts, so a later ``apply_updates`` maps every part to bucket 0 —
  exactly where the compacted postings live — and re-merges from the
  per-part run cache as usual.

At 100 TB: one task per shard bounds per-task memory to the largest
shard's postings (shard count is the operator's parallelism knob, set
at build time precisely so a shard fits a worker); the read is pruned
to the shard's own files and the output is one sequential write.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..functions.codec import decode_varints, encode_varints_segmented
from ..state.manifest import load_manifest, write_manifest
from .index_merge import SegmentWriter, segment_dir

__all__ = ["segments_to_runs", "optimize_index", "select_merges"]


def segments_to_runs(merged: pa.Table, shard: int, bucket: int = 0) -> pa.Table:
    """Decode a merged segment view back into SPIMI run rows (one row
    per term, tagged ``bucket``) — the exact input shape
    ``SegmentWriter`` consumes.

    ``merged`` is ``_merge_segments``' output: rows sorted by
    ``(term, bucket)``, so each term's blocks are contiguous and
    doc-ascending in the flat block arrays.  Everything is one flat
    vectorized pass: docs need re-deltaing (block-absolute →
    term-absolute + gaps); tfs/dls/poss blobs are plain per-block
    varint runs whose concatenation per term is ALREADY the run
    encoding, so they pass through as bytes.
    """
    la = merged.column("blocks").combine_chunks()
    blk_off = la.offsets.to_numpy().astype(np.int64)
    sv = la.values
    b_n = sv.field("n").to_numpy().astype(np.int64)
    with_pos = "poss" in [f.name for f in sv.type]

    docs_blobs = sv.field("docs").to_pylist()
    gaps = decode_varints(b"".join(docs_blobs)).astype(np.int64)
    bs = np.concatenate([[0], np.cumsum(b_n)[:-1]]).astype(np.int64)
    cs = np.cumsum(gaps)
    base = np.where(bs > 0, cs[bs - 1], 0)
    doc_abs = cs - np.repeat(base, b_n)

    row_df = merged.column("df").to_numpy()
    row_cf = merged.column("cf").to_numpy()
    terms_np = np.asarray(merged.column("term").to_pylist(), dtype=object)
    new_term = np.ones(terms_np.size, dtype=bool)
    if terms_np.size > 1:
        new_term[1:] = terms_np[1:] != terms_np[:-1]
    row_start = np.flatnonzero(new_term)
    row_end = np.append(row_start[1:], terms_np.size)
    term_df = np.add.reduceat(row_df, row_start).astype(np.int64)
    term_cf = np.add.reduceat(row_cf, row_start).astype(np.int64)
    term_starts = np.concatenate([[0], np.cumsum(term_df)[:-1]]).astype(np.int64)

    out_gaps = np.empty(doc_abs.shape, dtype=np.uint64)
    np.subtract(doc_abs[1:], doc_abs[:-1], out=out_gaps[1:], casting="unsafe")
    out_gaps[term_starts] = doc_abs[term_starts].astype(np.uint64)
    docs_runs = encode_varints_segmented(out_gaps, term_starts)

    t_blk_s, t_blk_e = blk_off[row_start], blk_off[row_end]

    def _join(blobs: list[bytes]) -> list[bytes]:
        return [b"".join(blobs[s:e]) for s, e in zip(t_blk_s.tolist(), t_blk_e.tolist())]

    cols = {
        "term": pa.array(terms_np[new_term], pa.string()),
        "shard": pa.array(np.full(row_start.size, shard, np.int32)),
        "bucket": pa.array(np.full(row_start.size, bucket, np.int32)),
        "first_doc": pa.array(doc_abs[term_starts], pa.int64()),
        "df": pa.array(term_df, pa.int64()),
        "cf": pa.array(term_cf, pa.int64()),
        "docs": pa.array(docs_runs, pa.binary()),
        "tfs": pa.array(_join(sv.field("tfs").to_pylist()), pa.binary()),
        "dls": pa.array(_join(sv.field("dls").to_pylist()), pa.binary()),
    }
    if with_pos:
        cols["poss"] = pa.array(_join(sv.field("poss").to_pylist()), pa.binary())
    return pa.table(cols)


class _OptimizeShard:
    """Per-(shard, target-bucket) compaction task: read the group's
    live segments, re-encode as one segment under the optimize file
    name (forceMerge(k): k target buckets per shard, doc order kept)."""

    def __init__(self, index_dir: str, fp: str, file_name: str,
                 segs_by_group: dict[tuple[int, int], list[tuple[int, str]]]):
        self.index_dir = index_dir
        self.fp = fp
        self.file_name = file_name
        self.segs_by_group = segs_by_group

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pipelines.query import _merge_segments

        out = []
        writer = SegmentWriter(self.index_dir, self.fp, file_name=self.file_name)
        for shard, target in zip(batch.column("shard").to_pylist(),
                                 batch.column("target").to_pylist()):
            shard, target = int(shard), int(target)
            sdir = segment_dir(self.index_dir, shard, target)
            man = load_manifest(os.path.join(sdir, writer.man_name))
            if (man and man.get("fingerprint") == self.fp
                    and os.path.exists(os.path.join(sdir, self.file_name))):
                # already compacted by an interrupted earlier run — must
                # be detected BEFORE reading, or the finished output
                # would be merged against its own sources
                out.append(writer._row(shard, target, self.fp, man["n_terms"],
                                       man["n_postings"], man.get("sum_cf", 0),
                                       man["bytes"], 0.0, True))
                continue
            segs = [(b, pq.read_table(p))
                    for b, p in self.segs_by_group[(shard, target)]]
            merged = _merge_segments(segs)
            out.append(writer(segments_to_runs(merged, shard, bucket=target)))
        return pa.concat_tables(out)


def optimize_index(out_dir: str, *, max_segments_per_shard: int = 1,
                   cleanup: bool = True) -> dict:
    """Compact every shard to at most ``max_segments_per_shard``
    doc-range segments (Lucene forceMerge(k); the default k=1 is the
    reference's ``autoOptimize``).  Returns the new manifest.

    Old buckets are grouped in contiguous doc-range runs (``b // g``),
    so the published ``bucket_size_docs`` scales by ``g`` and both
    readers and ``apply_updates``' part→bucket arithmetic stay
    consistent with the compacted layout.  Idempotent: already at or
    below the target is a no-op.  Writers are serialized by the same
    build lock updates take.
    """
    from ..pipelines.build import _job_fp
    from ..pipelines.updates import _BuildLock

    if max_segments_per_shard < 1:
        raise ValueError("max_segments_per_shard must be >= 1")
    k = max_segments_per_shard
    man_path = os.path.join(out_dir, "index_manifest.json")
    with _BuildLock(out_dir):
        # the manifest MUST be read under the lock — a concurrent
        # apply_updates could otherwise commit between read and lock
        # and this pass would compact (and publish) a stale segment list
        old = load_manifest(man_path)
        if old is None:
            raise FileNotFoundError(f"no index manifest under {out_dir}")
        # at most one segment exists per (shard, bucket), so "every
        # bucket id < k" already bounds each shard's segment count by k
        if all(int(s["bucket"]) < k for s in old["segments"]):
            # already at/below the target in the target bucket range —
            # optimizing again would chain a new fingerprint and
            # rewrite identical bytes
            if cleanup:
                _cleanup(out_dir, old)
            return old
        fp = _job_fp(old["fingerprint"], optimize=k)

        index_dir = os.path.join(out_dir, "index")
        file_name = f"terms-{fp[:8]}.parquet"
        max_bucket = max(int(s["bucket"]) for s in old["segments"])
        g = -(-(max_bucket + 1) // k)  # ceil: old buckets per target
        segs_by_group: dict[tuple[int, int], list[tuple[int, str]]] = {}
        for s in old["segments"]:
            b = int(s["bucket"])
            p = os.path.join(segment_dir(index_dir, int(s["shard"]), b),
                             s.get("file") or "terms.parquet")
            segs_by_group.setdefault((int(s["shard"]), b // g), []).append((b, p))

        groups = sorted(segs_by_group)
        rows = (
            ray.data.from_items([{"shard": s, "target": t} for s, t in groups])
            .map_batches(
                _OptimizeShard(index_dir, fp, file_name, segs_by_group),
                batch_format="pyarrow",
                batch_size=1,
            )
            .to_pandas()
        )
        segments = [
            {"shard": int(r["shard"]), "bucket": int(r["bucket"]), "fp": r["fp"],
             "n_terms": int(r["n_terms"]), "n_postings": int(r["n_postings"]),
             "sum_cf": int(r["sum_cf"]), "bytes": int(r["bytes"]),
             "file": file_name}
            for r in rows.to_dict("records")
        ]
        segments.sort(key=lambda s: (s["shard"], s["bucket"]))
        # doc→bucket arithmetic scales with the grouping: doc // (old
        # width · g) == old_bucket // g, and updates' part→bucket uses
        # the same width, so the single source of truth is this field
        bucket_size_docs = int(old["bucket_size_docs"]) * g
        new_man = write_manifest(
            man_path,
            stage="index",
            fingerprint=fp,
            extra={
                "num_shards": old["num_shards"],
                "bucket_size_docs": bucket_size_docs,
                "optimized_from": old["fingerprint"],
                "n_terms": int(sum(s["n_terms"] for s in segments)),
                "n_postings": int(sum(s["n_postings"] for s in segments)),
                "index_bytes": int(sum(s["bytes"] for s in segments)),
                "segments": segments,
            },
        )
        if cleanup:
            _cleanup(out_dir, new_man)
    return new_man


def _cleanup(out_dir: str, man: dict) -> None:
    """Delete segment dirs/files the (already-committed) manifest no
    longer references — safe because readers only follow the manifest."""
    index_dir = os.path.join(out_dir, "index")
    live = {(int(s["shard"]), int(s["bucket"])): s.get("file") or "terms.parquet"
            for s in man["segments"]}
    if not os.path.isdir(index_dir):
        return
    for d in os.listdir(index_dir):
        if not d.startswith("shard="):
            continue
        shard = int(d.split("=")[1])
        for seg in os.listdir(os.path.join(index_dir, d)):
            if not seg.startswith("seg="):
                continue
            bucket = int(seg.split("=")[1])
            sdir = os.path.join(index_dir, d, seg)
            keep = live.get((shard, bucket))
            if keep is None:
                shutil.rmtree(sdir, ignore_errors=True)
                continue
            # the live data file, its resume sidecar, and the default
            # `_manifest.json` (owned by the build/update merge path)
            # survive; superseded data files AND their per-run
            # `_manifest-<file>.json` sidecars go — otherwise every
            # auto_optimize cycle leaks one orphaned JSON per segment
            keep_files = {keep, "_manifest.json", f"_manifest-{keep}.json"}
            for f in os.listdir(sdir):
                if ((f.endswith(".parquet") or f.startswith("_manifest-"))
                        and f not in keep_files):
                    os.remove(os.path.join(sdir, f))


# --------------------------------------------- tiered merge planning

def select_merges(segment_bytes: list[int], *, segs_per_tier: int = 10,
                  max_merge_at_once: int = 10,
                  floor_bytes: int = 2 * 1024 * 1024) -> list[list[int]]:
    """TieredMergePolicy-style merge planning (Lucene's default policy
    — the one the reference's Solr core runs between the explicit
    ``autoOptimize`` forceMerges): given live segment sizes, return
    the list of merges (index groups into ``segment_bytes``) that
    brings the count back under budget.  Deterministic transposition
    of the policy's core rules:

    - sizes below ``floor_bytes`` count AS ``floor_bytes`` (the floor
      rule: a dust pile of tiny flush segments doesn't excuse an
      over-long tail);
    - allowed count = ``segs_per_tier`` per size tier, tiers stepping
      ×``max_merge_at_once`` from the floor;
    - while over budget, merge the ``max_merge_at_once`` SMALLEST
      segments (cheapest merge first — the policy's preference for
      low-cost merges, made deterministic by (size, index) order);
    - cascades: a produced merge is itself a live segment and may be
      merged again in a later round.

    Pure planning — O(n log n), no I/O; callers apply the groups with
    the same segment-compaction machinery as :func:`optimize_index`.
    """
    if segs_per_tier < 2 or max_merge_at_once < 2:
        raise ValueError("segs_per_tier and max_merge_at_once must be >= 2")
    # live = (floored_size, original_indices_it_covers)
    live: list[tuple[int, list[int]]] = [
        (max(int(b), floor_bytes), [i]) for i, b in enumerate(segment_bytes)
    ]
    merges: list[list[int]] = []

    def allowed_count() -> int:
        # Lucene TieredMergePolicy.getMaxAllowedSegs transposed: walk
        # size tiers from the floor; each full tier may hold
        # segs_per_tier segments, the last (partial) tier its ceil
        bytes_left = sum(s for s, _ in live)
        level = floor_bytes
        allowed = 0
        while True:
            seg_count_level = bytes_left / level
            if seg_count_level < segs_per_tier:
                allowed += int(np.ceil(seg_count_level))
                break
            allowed += segs_per_tier
            bytes_left -= segs_per_tier * level
            level *= max_merge_at_once
        return max(allowed, segs_per_tier)

    while len(live) > allowed_count():
        # merge the max_merge_at_once smallest (ties by original index)
        order = sorted(range(len(live)),
                       key=lambda i: (live[i][0], live[i][1][0]))
        pick = sorted(order[:max_merge_at_once])
        group: list[int] = []
        size = 0
        for i in pick:
            size += live[i][0]
            group.extend(live[i][1])
        merges.append(sorted(group))
        live = [x for i, x in enumerate(live) if i not in set(pick)]
        live.append((size, sorted(group)))
    return merges
