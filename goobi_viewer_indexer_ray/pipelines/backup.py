"""Snapshot backup / restore — the Solr replication-handler analog.

The reference's Solr core exposes backup/restore through the
replication handler (``/replication?command=backup``); operators rely
on it before risky reindexes.  This module transposes it to the
engine's parquet layout: a backup copies EXACTLY the manifest-pinned
live file set (never scratch runs, never stale segment files an
optimize pass left behind), so a snapshot of a just-optimized index
is the optimized view alone, and restore brings back a byte-identical
serving tree.

Consistency: the live index is only ever mutated through atomic
manifest swaps (build/updates/optimize all commit by ONE manifest
write), so reading the three manifests first and then copying the
files they name yields a consistent snapshot even if a writer commits
mid-backup — the snapshot is simply the pre-commit view.

Scale shape: the file copies are embarrassingly parallel
(``from_items(files) → map_batches`` with bytes streamed per file);
the manifest set is constant-size.  At 100 TB the same plan holds
with object-store puts instead of ``shutil.copy``.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa

from ..state.manifest import load_manifest
from ..stages.index_merge import segment_dir

__all__ = ["backup_index", "gc_index", "restore_index", "live_files"]

_TOP = ("stats.json", "docs_manifest.json", "index_manifest.json")


def live_files(out_dir: str) -> list[str]:
    """Relative paths of the manifest-pinned live file set."""
    files = [f for f in _TOP if os.path.exists(os.path.join(out_dir, f))]
    dman = load_manifest(os.path.join(out_dir, "docs_manifest.json")) or {}
    for p in dman.get("parts", []):
        d = f"docs/part={int(p['part']):05d}"
        for name in ("data.parquet", "_manifest.json"):
            rel = f"{d}/{name}"
            if os.path.exists(os.path.join(out_dir, rel)):
                files.append(rel)
    iman = load_manifest(os.path.join(out_dir, "index_manifest.json")) or {}
    for s in iman.get("segments", []):
        d = os.path.relpath(
            segment_dir(os.path.join(out_dir, "index"),
                        int(s["shard"]), int(s["bucket"])), out_dir)
        for name in (s.get("file") or "terms.parquet", "_manifest.json"):
            rel = f"{d}/{name}"
            if os.path.exists(os.path.join(out_dir, rel)):
                files.append(rel)
    return files


def _copy_tree(src_root: str, dst_root: str, rel_files: list[str]) -> int:
    """Parallel file copy via one Ray fan-out; returns bytes copied."""
    import ray.data

    if not rel_files:
        return 0

    def cp(batch: pa.Table) -> pa.Table:
        n = []
        for i in range(batch.num_rows):
            rel = batch.column("rel")[i].as_py()
            dst = os.path.join(dst_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copyfile(os.path.join(src_root, rel), dst)
            n.append(os.path.getsize(dst))
        return pa.table({"bytes": pa.array(n, pa.int64())})

    return int(
        ray.data.from_items([{"rel": f} for f in rel_files])
        .map_batches(cp, batch_format="pyarrow")
        .sum("bytes") or 0)


def backup_index(out_dir: str, dest: str) -> dict:
    """Snapshot the live view of ``out_dir`` into ``dest`` (fails if
    ``dest`` already holds a snapshot).  Returns
    ``{files, bytes, fingerprint}``."""
    if os.path.exists(os.path.join(dest, "_SNAPSHOT")):
        raise ValueError(f"backup destination already holds a snapshot: {dest}")
    files = live_files(out_dir)
    if not files:
        raise ValueError(f"nothing to back up under {out_dir}")
    n_bytes = _copy_tree(out_dir, dest, files)
    iman = load_manifest(os.path.join(out_dir, "index_manifest.json")) or {}
    meta = {"files": files, "bytes": n_bytes,
            "fingerprint": iman.get("fingerprint")}
    tmp = os.path.join(dest, "_SNAPSHOT.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(dest, "_SNAPSHOT"))  # atomic commit
    return meta


def restore_index(snapshot: str, out_dir: str) -> dict:
    """Replace ``out_dir``'s live view with the snapshot's file set.
    The copy lands in full before the three manifests are moved into
    place (manifests LAST — a reader or a crash mid-restore still
    sees a consistent tree)."""
    snap_meta_path = os.path.join(snapshot, "_SNAPSHOT")
    if not os.path.exists(snap_meta_path):
        raise ValueError(f"no snapshot at {snapshot}")
    with open(snap_meta_path) as f:
        meta = json.load(f)
    files = meta["files"]
    data_files = [f for f in files if f not in _TOP]
    manifests = [f for f in files if f in _TOP]
    _copy_tree(snapshot, out_dir, data_files)
    for rel in manifests:  # commit: constant-size, last
        shutil.copyfile(os.path.join(snapshot, rel),
                        os.path.join(out_dir, rel))
    return meta


def gc_index(out_dir: str, *, dry_run: bool = False) -> dict:
    """Garbage-collect files the live manifests no longer reference —
    stale ``terms-<fp>.parquet`` left by optimize swaps, segments of
    shrunk builds, parts dropped by updates.  (Lucene's
    ``IndexFileDeleter`` role.)  Scratch caches (``runs/``) and the
    manifests themselves are never touched; deletion is the only
    mutation and each deleted path is returned, so a ``dry_run``
    report is the exact plan."""
    live = set(live_files(out_dir)) | {"_SNAPSHOT"}
    doomed: list[str] = []
    for sub in ("docs", "index"):
        root = os.path.join(out_dir, sub)
        for dirpath, _, names in os.walk(root):
            for n in names:
                rel = os.path.relpath(os.path.join(dirpath, n), out_dir)
                if rel not in live:
                    doomed.append(rel)
    if not dry_run:
        for rel in doomed:
            os.remove(os.path.join(out_dir, rel))
        # prune now-empty segment/part directories
        for sub in ("docs", "index"):
            for dirpath, dirs, names in os.walk(
                    os.path.join(out_dir, sub), topdown=False):
                if not dirs and not names:
                    os.rmdir(dirpath)
    return {"deleted": sorted(doomed), "n_deleted": len(doomed)}
