"""Continuous ingest — the hotfolder daemon transposed.

Reference: ``SolrIndexerDaemon.java:247-259`` (the forever poll loop)
and ``helper/Hotfolder.java:431-503`` (per-tick folder scan with
file-stability checks and a priority queue that serves re-index
requests before regular arrivals).  The reference *consumes* files by
moving them out of the hotfolder; this engine treats the input dir as
READ-ONLY and keeps a snapshot ledger instead, so the same contract
works on object-store-style listings where "move" doesn't exist.

Model
-----

Each poll tick (:func:`watch_once`) takes a directory snapshot
(name → (size, mtime_ns)), diffs it against the ledger persisted at
``out_dir/_watch_state.json``, and routes:

1. **Re-index commands first** (the priority-queue analog,
   ``Hotfolder.java:466-480``): a ``*.reindex`` file lists data-file
   names (one per line) to force through :func:`apply_updates` even
   if unchanged.  Each command file is processed exactly once (its
   fingerprint is recorded).
2. **New / changed data files** (``*.parquet`` page shards): indexed
   via ONE :func:`apply_updates` call.  A file is only eligible once
   it is STABLE — identical (size, mtime_ns) across two consecutive
   polls (the reference's growing-upload guard,
   ``Hotfolder.java:431-449``); unstable files wait in ``pending``.
3. **Deletes**: a ``*.delete`` command file lists urls (one per
   line); a data file REMOVED from the folder deletes the urls it
   contributed — except urls still contributed by a surviving file
   (dedup-keep-latest means the survivor's copy is authoritative).

Per-file url sidecars (``out_dir/_watch/urls/<name>.parquet``, url
column only) record each shard's contribution at ingest time — one
small parquet per input shard, written from the shard alone.  The
removal path reads ONLY the removed shard's sidecar plus an
``is_in`` anti-join against live sidecars; nothing corpus-wide ever
transits the driver (the deletion itself reuses the incremental
update path: dirty partitions only, clean ones byte-untouched).

The loop (:func:`watch`) is ``watch_once`` on an interval with an
injectable sleep — tests drive discrete ticks, production passes a
real interval.  All mutation goes through :func:`apply_updates`,
which already serializes concurrent writers with the build lock.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .updates import apply_updates

__all__ = ["watch_once", "watch", "load_state"]

_STATE = "_watch_state.json"
_URLS_DIR = os.path.join("_watch", "urls")


def load_state(out_dir: str) -> dict:
    p = os.path.join(out_dir, _STATE)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"files": {}, "commands": {}, "pending": {}}


def _save_state(out_dir: str, state: dict) -> None:
    p = os.path.join(out_dir, _STATE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, sort_keys=True)
    os.replace(tmp, p)  # atomic — a crashed tick never half-writes


def _snapshot(pages_dir: str) -> dict[str, list[int]]:
    out = {}
    for p in sorted(glob.glob(os.path.join(pages_dir, "*"))):
        try:  # a file may vanish between listing and stat — that IS
            st = os.stat(p)  # the concurrent workload a hotfolder serves
        except FileNotFoundError:
            continue
        if not os.path.isdir(p):
            out[os.path.basename(p)] = [st.st_size, st.st_mtime_ns]
    return out


def _sidecar_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, _URLS_DIR, name)


def _write_sidecar(out_dir: str, pages_dir: str, name: str) -> None:
    """Record the shard's url contribution (url column only — the
    shard-bounded small side)."""
    os.makedirs(os.path.join(out_dir, _URLS_DIR), exist_ok=True)
    t = pq.read_table(os.path.join(pages_dir, name), columns=["url"])
    pq.write_table(
        pa.table({"url": t.column("url").cast(pa.string())}),
        _sidecar_path(out_dir, name),
    )


def _removed_urls(out_dir: str, removed: list[str], live: list[str]) -> list[str]:
    """Urls contributed by removed shards and by NO surviving shard.
    Read-only: the sidecars are deleted by the caller only AFTER the
    deletion commits, so a failed delete retries with the evidence
    intact."""
    import pyarrow.compute as pc

    gone: set[str] = set()
    for name in removed:
        p = _sidecar_path(out_dir, name)
        if os.path.exists(p):
            gone.update(pq.read_table(p).column("url").to_pylist())
    if not gone:
        return []
    gone_arr = pa.array(sorted(gone), pa.string())
    for name in live:  # anti-join, one sidecar at a time — bounded
        p = _sidecar_path(out_dir, name)
        if not os.path.exists(p) or len(gone_arr) == 0:
            continue
        alive = pq.read_table(p).column("url")
        keep = pc.invert(pc.is_in(gone_arr, value_set=alive.combine_chunks()))
        gone_arr = gone_arr.filter(keep)
    return gone_arr.to_pylist()


def watch_once(out_dir: str, pages_dir: str, *, state: dict | None = None,
               auto_optimize: bool = False) -> dict:
    """One poll tick.  Returns a report
    ``{reindexed, indexed, deleted_urls, pending, removed}``; the
    ledger is persisted to ``out_dir/_watch_state.json``."""
    state = state if state is not None else load_state(out_dir)
    files: dict = state.setdefault("files", {})
    commands: dict = state.setdefault("commands", {})
    pending: dict = state.setdefault("pending", {})
    snap = _snapshot(pages_dir)

    data = {n: fp for n, fp in snap.items() if n.endswith(".parquet")}
    cmds = {n: fp for n, fp in snap.items()
            if n.endswith((".reindex", ".delete"))}

    stable_memo: dict[str, bool] = {}

    def stable(name: str, fp: list[int]) -> bool:
        """Unchanged since the previous tick (growing-upload guard).
        Memoized per tick: multiple lanes may ask about the same file,
        and the pending-entry consume must happen exactly once."""
        if name in stable_memo:
            return stable_memo[name]
        if pending.get(name) == fp:
            del pending[name]
            ok = True
        else:
            pending[name] = fp
            ok = False
        stable_memo[name] = ok
        return ok

    report = {"reindexed": [], "indexed": [], "deleted_urls": 0,
              "pending": [], "removed": []}

    built = os.path.exists(os.path.join(out_dir, "docs_manifest.json"))

    # ---- 1. priority: re-index commands (Hotfolder.java:466-480) ----
    reindex_names: list[str] = []
    for name, fp in sorted(cmds.items()):
        if not name.endswith(".reindex") or commands.get(name) == fp:
            continue
        if not stable(name, fp):
            report["pending"].append(name)
            continue
        with open(os.path.join(pages_dir, name)) as f:
            wanted = [ln.strip() for ln in f if ln.strip()]
        # the growing-upload guard applies to the TARGETS too: a file
        # unchanged since indexing is trivially stable; a new/changed
        # target must sit still for one tick.  Any unready target
        # defers the WHOLE command (fingerprint not recorded → the
        # command is re-read next tick).
        present = [n for n in wanted if n in data]
        ready = all(
            data[n] == files.get(n) or stable(n, data[n]) for n in present
        )
        if not ready:
            report["pending"].append(name)
            continue
        reindex_names.extend(present)
        commands[name] = fp
    reindex_names = sorted(set(reindex_names))
    if reindex_names and built:
        apply_updates(
            out_dir,
            [os.path.join(pages_dir, n) for n in reindex_names],
            reason="watch-reindex",
            auto_optimize=auto_optimize,
        )
        for n in reindex_names:
            files[n] = data[n]
            _write_sidecar(out_dir, pages_dir, n)
        report["reindexed"] = reindex_names
    elif reindex_names:
        # nothing built yet — the files fold into the bootstrap below
        for n in reindex_names:
            files.pop(n, None)
        reindex_names = []

    # ---- 2. new / changed data files ----
    fresh: list[str] = []
    for name, fp in sorted(data.items()):
        if files.get(name) == fp or name in reindex_names:
            continue
        if not stable(name, fp):
            report["pending"].append(name)
            continue
        fresh.append(name)
    if fresh:
        if built:
            apply_updates(
                out_dir,
                [os.path.join(pages_dir, n) for n in fresh],
                reason="watch-ingest",
                auto_optimize=auto_optimize,
            )
        else:  # first tick on an empty output dir: bootstrap build
            from .build import build_all

            build_all([os.path.join(pages_dir, n) for n in fresh], out_dir)
        for n in fresh:
            files[n] = data[n]
            _write_sidecar(out_dir, pages_dir, n)
        report["indexed"] = fresh

    # ---- 3. deletes: command files + removed shards ----
    # Processed only against an EXISTING build: before anything is
    # built there is nothing to delete FROM, and consuming a command
    # then would silently lose it — so unbuilt ticks leave commands
    # untouched (re-read once the bootstrap has happened).
    built = os.path.exists(os.path.join(out_dir, "docs_manifest.json"))
    del_urls: list[str] = []
    if built:
        for name, fp in sorted(cmds.items()):
            if not name.endswith(".delete") or commands.get(name) == fp:
                continue
            if not stable(name, fp):
                report["pending"].append(name)
                continue
            with open(os.path.join(pages_dir, name)) as f:
                del_urls.extend(ln.strip() for ln in f if ln.strip())
            commands[name] = fp
    removed = [n for n in list(files) if n not in data] if built else []
    if removed:
        live = [n for n in files if n in data]
        del_urls.extend(_removed_urls(out_dir, removed, live))
    if del_urls:
        del_urls = sorted(set(del_urls))
        apply_updates(out_dir, None, del_urls, reason="watch-delete",
                      auto_optimize=auto_optimize)
        report["deleted_urls"] = len(del_urls)
    # the delete committed: NOW retire the removed shards' ledger
    # entries and sidecars (an exception above leaves both intact, so
    # the next tick retries with the evidence still on disk)
    for n in removed:
        del files[n]
        p = _sidecar_path(out_dir, n)
        if os.path.exists(p):
            os.remove(p)
    report["removed"] = removed

    # forget pending entries whose file vanished before stabilizing
    for name in [n for n in pending if n not in snap]:
        del pending[name]

    _save_state(out_dir, state)
    return report


def watch(out_dir: str, pages_dir: str, *, interval_s: float = 5.0,
          max_polls: int | None = None, auto_optimize: bool = False,
          sleep=None):
    """The daemon loop: ``watch_once`` every ``interval_s`` seconds,
    ``max_polls`` ticks (None = forever).  A GENERATOR yielding one
    report per tick — run-forever mode holds no unbounded report
    list, and callers (the CLI) stream-print each tick.  ``sleep`` is
    injectable so tests drive discrete ticks without wall-clock
    waits."""
    import time as _time

    sleep = sleep or _time.sleep
    n = 0
    while max_polls is None or n < max_polls:
        yield watch_once(out_dir, pages_dir, auto_optimize=auto_optimize)
        n += 1
        if max_polls is not None and n >= max_polls:
            break
        sleep(interval_s)
