"""Incremental upsert / delete — the reference's update machinery.

Reference analogs: ``prepareUpdate`` delete-before-insert upsert
(``Indexer.java:1695-1756``), ``.delete``/``.purge`` command files with
cascade delete + ``DATEDELETED`` trace docs (``Indexer.java:365-473``,
SURVEY.md §3.2), and ``.docupdate`` single-doc updates.

Our transposition is partition-level incremental rebuild (SURVEY.md
§2.9): a delta of new/updated pages plus a list of deleted urls dirties
only the url-hash partitions it touches.

    dirty parts = hash(urls in delta ∪ deletes) % num_parts
    delta path (streaming — the delta NEVER concatenates on the
    driver): extract → groupby(part) → per-dirty-part merge task:
        old docs part rows − deleted urls + extracted delta rows
        → dedup-keep-latest → rank → rewrite docs + SPIMI runs
    delete-only parts run the same merge as individual Ray tasks.
    index: dirty parts map to dirty doc-range BUCKETS; only those
        buckets' runs re-enter the ``groupby(shard, bucket)`` merge
        and only their ``shard=*/seg=*`` files are rewritten — every
        clean segment is untouched on disk (Lucene-segment analog).

Deletes are recorded in a tombstone ledger
(``out_dir/tombstones.jsonl`` — the DATEDELETED trace-doc analog).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..functions.hashing import part_for
from ..functions.ids import PART_STRIDE
from ..stages.docs_writer import DOCS_SCHEMA, DocsPartWriter, part_dir
from ..stages.extract import ExtractPages
from ..state.manifest import load_manifest
from .build import (
    _bucketing,
    _collect_docs_manifest,
    _job_fp,
    _merge_runs,
    _part_fp_map,
    _resolve_pages,
    _segment_fps,
    _write_index_manifest,
    runs_part_path,
)

__all__ = ["apply_updates", "update_doc", "delete_by_query"]

_DELTA_COLS = [f.name for f in DOCS_SCHEMA if f.name != "local_rank"]


class _BuildLock:
    """Exclusive per-build-dir lock for updates.

    Two concurrent ``apply_updates`` on one build would interleave
    part rewrites and manifest writes (the reference serializes
    records globally via the ``currentIndexer`` guard,
    ``helper/Hotfolder.java:479``, and warns against multiple daemon
    instances, ``Indexer.java:377-380``).  ``fcntl.flock`` on a
    persistent lockfile: kernel-released on process death (no stale-
    lock breaking races), exclusive across processes AND threads (each
    holder has its own fd).  Waiters poll ``LOCK_NB`` until
    ``timeout``.  Single-filesystem scope — on a multi-node cluster
    the build dir lives on shared storage and updates are routed
    through one coordinator, exactly as the reference mandates one
    daemon instance.
    """

    def __init__(self, out_dir: str, timeout: float = 600.0, poll: float = 0.05):
        self.path = os.path.join(out_dir, ".update_lock")
        self.timeout = timeout
        self.poll = poll
        self._fd: int | None = None

    def __enter__(self):
        import fcntl

        deadline = time.time() + self.timeout
        fd = os.open(self.path, os.O_CREAT | os.O_WRONLY)
        while True:
            try:  # ONLY contention is retried; any other error propagates
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:  # EWOULDBLOCK = held by someone else
                if time.time() > deadline:
                    os.close(fd)
                    raise TimeoutError(f"update lock busy: {self.path}")
                time.sleep(self.poll)
                continue
            except OSError:  # ENOLCK/EINVAL etc: locking itself broken
                os.close(fd)
                raise
            try:  # holder stamp is best-effort diagnostics (may ENOSPC)
                os.truncate(fd, 0)
                os.write(fd, f"{os.getpid()} {time.time()}".encode())
            except OSError:
                pass
            self._fd = fd
            return self

    def __exit__(self, *exc):
        import fcntl

        if self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None


def _deleted_url_set(deleted_urls: list[str] | str) -> pa.Array | pa.ChunkedArray:
    """Deletes arrive either as an explicit url list or as a tombstone
    PART DIRECTORY of parquet fragments written by a distributed pass
    (``delete_by_query``) — in the latter case the urls are read here,
    INSIDE the per-part merge task, so broad deletes never materialize
    on the driver."""
    if isinstance(deleted_urls, str):
        import glob as _glob

        frags = sorted(_glob.glob(os.path.join(deleted_urls, "*.parquet")))
        if not frags:
            return pa.array([], pa.string())
        return pq.read_table(frags, columns=["url"]).column("url")
    return pa.array(deleted_urls, pa.string())


def _merge_one_part(part: int, out_dir: str, fp: str, num_shards: int,
                    delta_rows: pa.Table | None,
                    deleted_urls: list[str] | str) -> int:
    """Merge one dirty partition: old rows − deletes + delta → rewrite."""
    docs_dir = os.path.join(out_dir, "docs")
    old_path = os.path.join(part_dir(docs_dir, part), "data.parquet")
    pieces = []
    if os.path.exists(old_path):
        old = pq.read_table(old_path, columns=_DELTA_COLS)
        if deleted_urls:
            import pyarrow.compute as pc

            gone = pc.is_in(old.column("url"),
                            value_set=_deleted_url_set(deleted_urls))
            old = old.filter(pc.invert(pc.fill_null(gone, False)))
        if old.num_rows:
            pieces.append(old)
    if delta_rows is not None and delta_rows.num_rows:
        pieces.append(delta_rows.select(_DELTA_COLS).cast(
            pa.schema([f for f in DOCS_SCHEMA if f.name != "local_rank"])))

    writer = DocsPartWriter(docs_dir, os.path.join(out_dir, "runs"), fp, num_shards)
    if pieces:
        writer(pa.concat_tables(pieces), part=part)
    else:  # partition emptied
        writer(pa.table({f.name: pa.array([], f.type) for f in DOCS_SCHEMA
                         if f.name != "local_rank"}), part=part)
    return part


_merge_part_task = ray.remote(_merge_one_part)


class _DeltaPartMerger:
    """groupby(part) group fn: one dirty part's extracted delta rows →
    merged part rewrite (runs inside the group task — the delta
    streams through the shuffle, never through the driver)."""

    def __init__(self, out_dir: str, fp: str, num_shards: int,
                 deletes_by_part: dict[int, list[str]]):
        self.out_dir = out_dir
        self.fp = fp
        self.num_shards = num_shards
        self.deletes_by_part = deletes_by_part

    def __call__(self, g: pa.Table) -> pa.Table:
        part = int(g.column("part")[0].as_py())
        _merge_one_part(part, self.out_dir, self.fp, self.num_shards, g,
                        self.deletes_by_part.get(part, []))
        return pa.table({"part": pa.array([part], pa.int32())})


def apply_updates(
    out_dir: str,
    delta_pages: str | list[str] | None = None,
    deleted_urls: list[str] | None = None,
    *,
    reason: str = "update",
    auto_optimize: bool = False,
    trace: bool = True,
) -> dict:
    """Apply new/updated pages and url deletions to an existing build.

    Returns the new index manifest.  Clean partitions' docs and run
    files AND clean index segments are untouched on disk
    (byte-identical, verified in tests).  Concurrent updates on one
    build are serialized by an exclusive build-dir lockfile
    (:class:`_BuildLock`) — racing calls queue, they never interleave
    manifest writes.

    ``trace=False`` is the ``.purge`` analog: same deletion, no
    DATEDELETED tombstone-ledger rows
    (``Hotfolder.removeFromIndex(createTraceDoc=false)``).

    ``auto_optimize`` transposes the reference's
    ``performance.autoOptimize`` (Configuration.java:441-443 — the
    hotfolder optimizes Solr after each record): compact the index to
    one segment per shard after the update commits.  It runs AFTER
    this update's lock releases (the optimize pass takes the same
    non-reentrant lock itself and re-reads the manifest under it, so
    an interleaved writer is handled, not corrupted).
    """
    with _BuildLock(out_dir):
        man = _apply_updates_locked(out_dir, delta_pages, deleted_urls,
                                    reason=reason, trace=trace)
    if auto_optimize:
        from ..stages.optimize import optimize_index

        man = optimize_index(out_dir)
    return man


def _apply_updates_locked(
    out_dir: str,
    delta_pages: str | list[str] | None = None,
    deleted_urls: list[str] | None = None,
    *,
    reason: str = "update",
    tombstones: str | None = None,
    deletes_fp: str = "",
    trace: bool = True,
) -> dict:
    """``tombstones``/``deletes_fp`` are the streaming delete path
    (:func:`delete_by_query`): a directory of ``part=P/*.parquet`` url
    fragments written by a distributed pass.  Only the PART NUMBERS
    (directory names) touch the driver; each dirty part's merge task
    reads its own fragment files.  ``deletes_fp`` is the caller's
    deterministic identity for the delete set (the url list is not
    driver-resident to be hashed here)."""
    import ray.data as rd

    deleted_urls = list(deleted_urls or [])
    docs_man = load_manifest(os.path.join(out_dir, "docs_manifest.json"))
    if docs_man is None:
        raise FileNotFoundError("no existing build under out_dir")
    num_parts = int(docs_man["num_parts"])
    num_shards = int(docs_man["num_shards"])
    old_index_man = load_manifest(os.path.join(out_dir, "index_manifest.json"))
    index_man_usable = bool(old_index_man and "segments" in old_index_man
                            and "bucket_size_docs" in old_index_man)
    if index_man_usable:
        bucket_size_docs = int(old_index_man["bucket_size_docs"])
        ppb = max(1, bucket_size_docs // PART_STRIDE)
    else:
        # missing/corrupt/pre-v3 manifest: the clean-segment records it
        # would contribute are unavailable — fall back to a FULL
        # re-merge (all buckets dirty) rather than silently serving an
        # index that lists only the delta's buckets
        ppb, bucket_size_docs = _bucketing(num_parts, None)

    delta_id = ""
    if delta_pages is not None:
        paths = _resolve_pages(delta_pages)
        from ..state.manifest import input_fingerprint

        delta_id = input_fingerprint(paths)

    fp = _job_fp(
        docs_man["fingerprint"],
        delta=delta_id,
        deletes=deletes_fp if tombstones else sorted(deleted_urls),
        op="update",
    )

    # partition routing honors a persisted strategy ledger when the
    # build used one (functions/partition.py): sticky urls keep their
    # recorded part; everything else falls back to the url hash.
    # The ledger must MATCH the manifest's recorded strategy — a stale
    # file surviving a hash rebuild (crash between manifest commit and
    # ledger cleanup) is ignored rather than trusted (review finding)
    from ..functions.partition import load_ledger

    ledger = load_ledger(out_dir)
    if ledger is not None and docs_man.get(
        "partition_strategy", "hash"
    ) != ledger.fingerprint():
        ledger = None

    def _part_of(u: str) -> int:
        if ledger is not None:
            got = ledger.assign_map.get(u)
            if got is not None:
                return int(got)
        return part_for(u, num_parts)

    deletes_by_part: dict[int, list[str] | str] = {}
    for u in deleted_urls:
        deletes_by_part.setdefault(_part_of(u), []).append(u)  # type: ignore[union-attr]
    if tombstones:
        for name in sorted(os.listdir(tombstones)):
            if not name.startswith("part="):
                continue
            p = int(name.split("=", 1)[1])
            if p in deletes_by_part:
                raise ValueError("explicit deletes and tombstones may not "
                                 "target the same partition in one update")
            deletes_by_part[p] = os.path.join(tombstones, name)

    dirty: set[int] = set()
    if delta_pages is not None:
        # streaming delta: extract → shuffle by part → merge in-place
        ds = rd.read_parquet(_resolve_pages(delta_pages),
                             columns=["url", "warc_ts", "html", "lang"])
        part_map = None
        if ledger is not None:
            # extend the sticky ledger over the delta's NEW urls (the
            # delta is the small side of an update) and re-persist —
            # the reference's "previous repository wins" rule
            from .build import _plan_partition_map

            part_map = _plan_partition_map(
                _resolve_pages(delta_pages), out_dir, ledger
            )  # _plan_partition_map re-persists the extended ledger
        ds = ds.map_batches(ExtractPages(num_parts, part_map),
                            batch_format="pyarrow")
        merger = _DeltaPartMerger(out_dir, fp, num_shards, deletes_by_part)

        def merge_delta_part(g: pa.Table) -> pa.Table:
            return merger(g)

        done = ds.groupby("part").map_groups(merge_delta_part, batch_format="pyarrow").to_pandas()
        if "part" in done.columns:  # empty delta → empty, column-less frame
            dirty |= {int(p) for p in done["part"]}

    # delete-only parts (no delta rows → no shuffle group): parallel tasks
    pending = [p for p in sorted(deletes_by_part) if p not in dirty]
    if pending:
        ray.get([
            _merge_part_task.remote(p, out_dir, fp, num_shards, None,
                                    deletes_by_part.get(p, []))
            for p in pending
        ])
        dirty |= set(pending)

    if deleted_urls and trace:  # tombstone ledger (DATEDELETED trace-doc
        # analog).  ``trace=False`` is the PURGE semantics
        # (Hotfolder.java:752-761 -> removeFromIndex(createTraceDoc=false)):
        # the docs/index rewrite is identical, only the DATEDELETED
        # trace rows are skipped.
        with open(os.path.join(out_dir, "tombstones.jsonl"), "a") as f:
            for u in sorted(deleted_urls):
                f.write(json.dumps({"url": u, "part": _part_of(u),
                                    "reason": reason, "deleted_at": time.time()}) + "\n")

    # expected per-part fingerprints: dirty parts carry the update fp,
    # clean parts keep whatever fp the current manifest recorded — so a
    # stale part=* dir from an older layout can never re-enter the index
    part_fps = _part_fp_map(docs_man)
    for p in dirty:
        part_fps[int(p)] = fp
    new_docs_man = _collect_docs_manifest(
        out_dir, fp, num_parts, num_shards, part_fps=part_fps,
        strategy_fp=docs_man.get("partition_strategy", "hash"),
    )

    # ---- index: re-merge ONLY the dirty doc-range buckets ----
    seg_fps = _segment_fps(num_parts, ppb, num_shards, _part_fp_map(new_docs_man))
    dirty_buckets = {int(p) // ppb for p in dirty}
    if not index_man_usable:  # no trustworthy clean-segment records
        dirty_buckets = {int(p["part"]) // ppb for p in new_docs_man["parts"]}
    runs_dir = os.path.join(out_dir, "runs")
    new_part_fp = _part_fp_map(new_docs_man)
    dirty_runs = []
    for p in new_docs_man["parts"]:
        pid = int(p["part"])
        if pid // ppb not in dirty_buckets:
            continue
        path = runs_part_path(runs_dir, pid)
        rm = load_manifest(os.path.join(os.path.dirname(path), "_manifest.json"))
        if rm is None or rm.get("fingerprint") != new_part_fp[pid]:
            raise FileNotFoundError(f"run cache for part {pid} missing/stale ({path})")
        dirty_runs.append(path)

    index_fp = _job_fp(fp, num_shards=num_shards, ppb=ppb)
    index_dir = os.path.join(out_dir, "index")
    if dirty_runs:
        seg_rows = _merge_runs(rd.read_parquet(dirty_runs), index_dir, index_fp,
                               bucket_size_docs=bucket_size_docs, seg_fps=seg_fps)
    else:
        import pandas as pd

        seg_rows = pd.DataFrame(columns=["shard", "bucket", "fp", "n_terms",
                                         "n_postings", "bytes", "seconds", "skipped"])

    # clean segments carry over from the previous index manifest
    preserved = [
        s for s in (old_index_man or {}).get("segments", [])
        if int(s["bucket"]) not in dirty_buckets
    ]
    # a dirty bucket whose parts all emptied produces no new segments —
    # its old segment files are dead; they are excluded from the
    # manifest (and thus invisible to segment_paths/LocalIndex)
    return _write_index_manifest(out_dir, index_fp, num_shards, bucket_size_docs,
                                 seg_rows, new_docs_man, extra_segments=preserved)


def update_doc(out_dir: str, url: str, html: bytes,
               warc_ts=None, lang: str = "") -> dict:
    """Single-document upsert (the ``.docupdate`` analog,
    ``DocUpdateIndexer.java:78``): wraps :func:`apply_updates` with a
    one-row in-memory delta — rewrites exactly one docs partition and
    its doc-range bucket's index segments."""
    import datetime

    import pyarrow.parquet as _pq

    if warc_ts is None:
        warc_ts = datetime.datetime.now(datetime.timezone.utc)
    # unique per call: concurrent update_doc invocations on the same
    # build must not clobber each other's delta file
    tmp = os.path.join(out_dir, f"_docupdate_{os.getpid()}_{time.time_ns()}")
    os.makedirs(tmp, exist_ok=True)
    path = os.path.join(tmp, "delta.parquet")
    _pq.write_table(
        pa.table(
            {
                "url": pa.array([url], pa.string()),
                "warc_ts": pa.array([warc_ts], pa.timestamp("us", tz="UTC")),
                "html": pa.array([html], pa.binary()),
                "lang": pa.array([lang], pa.string()),
            }
        ),
        path,
    )
    try:
        return apply_updates(out_dir, [path], None, reason="docupdate")
    finally:
        try:
            os.remove(path)
            os.rmdir(tmp)
        except OSError:
            pass


def delete_by_query(out_dir: str, *, must: list[str],
                    must_not: list[str] | None = None,
                    reason: str = "delete-by-query") -> tuple[dict, int]:
    """Solr ``deleteByQuery`` analog: remove every doc matching a
    boolean term query from an existing build.

    Reference: the hotfolder's ``.delete``/``.purge`` command files and
    the indexer's own cascade deletes are all delete-by-query strings
    against Solr (``SolrSearchIndex.deleteByQuery``, invoked from
    ``Indexer.java:365-473`` and ``Hotfolder.java``).  Here the query
    runs against OUR index (posting-list boolean algebra), the matched
    doc-id set — bounded by the query's df, the natural small side —
    is broadcast into a distributed semi-join over the docs table, and
    each task writes its matched urls straight into PER-PARTITION
    tombstone fragments (``part = doc_id // PART_STRIDE``); only
    per-part counts return to the driver — a corpus-wide delete never
    pulls a url column through it.  The deletion itself reuses the
    incremental update path (only dirty partitions/segments rewritten,
    clean ones byte-untouched), with each dirty part's merge task
    reading its own fragment files.

    Match + apply run under ONE build lock: a concurrent update can no
    longer commit between the query evaluation and the deletion
    (TOCTOU), it either precedes the match or queues behind the whole
    delete.

    Returns ``(new index manifest, n_deleted)``.
    """
    import hashlib
    import shutil

    import numpy as np
    import pyarrow.compute as pc

    import ray

    from .build import read_docs
    from .query import LocalIndex
    from .search_ops import boolean_docs

    with _BuildLock(out_dir):
        idx = LocalIndex(out_dir)
        docs = boolean_docs(idx, must=must, must_not=must_not)
        if docs.size == 0:
            # no-op: keep the promised (manifest, 0) shape even when the
            # index manifest is missing (a state apply_updates tolerates
            # by full re-merge — but a no-match delete shouldn't rebuild)
            man = load_manifest(os.path.join(out_dir, "index_manifest.json"))
            return (man if man is not None else {}), 0
        ids = np.sort(np.asarray(docs, dtype=np.int64))
        # deterministic identity of the delete set for the job
        # fingerprint (the urls themselves never reach the driver)
        deletes_fp = hashlib.blake2b(ids.tobytes(), digest_size=16).hexdigest()
        ids_ref = ray.put(pa.array(ids, pa.int64()))
        tomb_dir = os.path.join(
            out_dir, f"_tombstones_{os.getpid()}_{time.time_ns()}"
        )
        os.makedirs(tomb_dir, exist_ok=True)

        def write_fragments(t: pa.Table) -> pa.Table:
            sub = t.filter(pc.is_in(t.column("doc_id"),
                                    value_set=ray.get(ids_ref)))
            counts: list[tuple[int, int]] = []
            if sub.num_rows:
                part_arr = pc.divide(sub.column("doc_id"), PART_STRIDE)
                for p in pc.unique(part_arr).to_pylist():
                    rows = sub.filter(pc.equal(part_arr, p)).select(["url"])
                    pdir = os.path.join(tomb_dir, f"part={int(p)}")
                    os.makedirs(pdir, exist_ok=True)
                    frag = os.path.join(
                        pdir, f"frag-{os.getpid()}-{time.time_ns()}.parquet"
                    )
                    pq.write_table(rows, frag)
                    counts.append((int(p), rows.num_rows))
            return pa.table(
                {
                    "part": pa.array([c[0] for c in counts], pa.int64()),
                    "n": pa.array([c[1] for c in counts], pa.int64()),
                }
            )

        try:
            n_deleted = int(
                read_docs(out_dir, columns=["url"])  # doc_id auto-attached
                .map_batches(write_fragments, batch_format="pyarrow")
                .sum(on="n")
                or 0
            )
            man = _apply_updates_locked(out_dir, None, None, reason=reason,
                                        tombstones=tomb_dir,
                                        deletes_fp=deletes_fp)
            # ledger: ONE summary line per query delete (the per-url
            # DATEDELETED analog would re-materialize the url column)
            with open(os.path.join(out_dir, "tombstones.jsonl"), "a") as f:
                f.write(json.dumps({
                    "query_must": sorted(must),
                    "query_must_not": sorted(must_not or []),
                    "n_deleted": n_deleted,
                    "deletes_fp": deletes_fp,
                    "reason": reason,
                    "deleted_at": time.time(),
                }) + "\n")
        finally:
            shutil.rmtree(tomb_dir, ignore_errors=True)
    return man, n_deleted
