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
4. **Purges** (``*.purge``, ``Hotfolder.java:752-761``): same url-list
   format and deletion path as ``.delete`` but WITHOUT the DATEDELETED
   tombstone-ledger rows (``removeFromIndex(createTraceDoc=false)``).
5. **Single-doc updates** (``*.docupdate``,
   ``DocUpdateIndexer.java:78``): a JSON object (or list of objects)
   ``{"url": ..., "html": str | "html_b64": base64, "lang"?: ...,
   "warc_ts"?: iso8601}`` routed through :func:`~.updates.update_doc`
   — exactly one docs partition and its doc-range bucket rewritten per
   url.
6. **Anchor acknowledgements** (``*.UPDATED``,
   ``MetsIndexer.ANCHOR_UPDATE_EXTENSION``): the reference's
   superupdate is a file-move into the data repository; with a
   read-only hotfolder this is an exactly-once acknowledgement
   recorded in the ledger (``report["acknowledged"]``), no index
   mutation.
7. **Config hot-reload** (``config_path=``, the
   ``helper/Configuration.java`` reload-timer analog): the JSON config
   is re-read every tick.  ``auto_optimize`` takes effect immediately;
   each entry of ``rules`` is hashed individually and scoped by its
   ``applies_to`` glob (default ``*``) — when a rule is added, removed
   or modified, exactly the ledgered data files matching the CHANGED
   rules' globs are forced back through :func:`apply_updates`
   ("affected records only"); untouched files keep their partitions
   byte-identical.  The first tick with a config only records the
   baseline hashes.

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

from .updates import apply_updates, update_doc

__all__ = ["watch_once", "watch", "load_state", "load_watch_config"]

_STATE = "_watch_state.json"
_URLS_DIR = os.path.join("_watch", "urls")


def load_state(out_dir: str) -> dict:
    p = os.path.join(out_dir, _STATE)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"files": {}, "commands": {}, "pending": {}}


def load_watch_config(config_path: str | None) -> dict | None:
    """Read the (optional) watch config JSON; missing path → ``{}``;
    MALFORMED file → ``None`` (a daemon polling while the operator
    half-writes the config must neither crash nor read "no rules" and
    storm-reindex everything — the tick just skips config processing
    and retries next poll)."""
    if not config_path or not os.path.exists(config_path):
        return {}
    try:
        with open(config_path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def _rule_hashes(cfg: dict) -> dict[str, dict]:
    """name → {hash, glob} for each config rule.  The per-rule
    granularity (and remembering each rule's ``applies_to`` glob, so a
    REMOVED rule still scopes to its own files) is what makes
    "affected records only" possible."""
    from hashlib import blake2b

    out = {}
    for i, rule in enumerate(cfg.get("rules", []) or []):
        name = str(rule.get("name", f"rule{i}"))
        out[name] = {
            "hash": blake2b(
                json.dumps(rule, sort_keys=True).encode(), digest_size=16
            ).hexdigest(),
            "glob": str(rule.get("applies_to", "*")),
        }
    return out


def _config_affected(old_rules: dict[str, dict], new_rules: dict[str, dict],
                     ledgered: list[str]) -> list[str]:
    """Data files matching any ADDED/REMOVED/CHANGED rule's
    ``applies_to`` glob (a removed rule's glob comes from the ledger's
    recorded copy)."""
    import fnmatch

    def h(m, n):
        e = m.get(n)
        return e.get("hash") if isinstance(e, dict) else e

    changed = {n for n in set(old_rules) | set(new_rules)
               if h(old_rules, n) != h(new_rules, n)}
    if not changed:
        return []
    pats = []
    for n in changed:
        # a MODIFIED rule contributes BOTH its old and new globs: a
        # file that only matched the old scope leaves the rule's
        # governance and must be re-processed too (review finding)
        for e in (old_rules.get(n), new_rules.get(n)):
            if e is not None:
                pats.append(e.get("glob", "*") if isinstance(e, dict) else "*")
    return sorted({f for f in ledgered for p in pats if fnmatch.fnmatch(f, p)})


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
               auto_optimize: bool = False,
               config_path: str | None = None,
               notify=None) -> dict:
    """One poll tick.  Returns a report
    ``{reindexed, indexed, deleted_urls, purged_urls, updated_docs,
    acknowledged, config_reindexed, pending, removed}``; the ledger is
    persisted to ``out_dir/_watch_state.json``."""
    state = state if state is not None else load_state(out_dir)
    files: dict = state.setdefault("files", {})
    commands: dict = state.setdefault("commands", {})
    pending: dict = state.setdefault("pending", {})
    snap = _snapshot(pages_dir)

    cfg = load_watch_config(config_path)
    if cfg is None:  # half-written config: skip config lane this tick
        cfg, config_path = {}, None
    if cfg.get("auto_optimize") is not None:
        auto_optimize = bool(cfg["auto_optimize"])

    data = {n: fp for n, fp in snap.items() if n.endswith(".parquet")}
    cmds = {n: fp for n, fp in snap.items()
            if n.endswith((".reindex", ".delete", ".purge", ".docupdate",
                           ".UPDATED"))}

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
              "purged_urls": 0, "updated_docs": [], "acknowledged": [],
              "config_reindexed": [], "pending": [], "removed": [],
              "errors": []}

    built = os.path.exists(os.path.join(out_dir, "docs_manifest.json"))

    # ---- 0. config hot-reload (Configuration.java reload-timer analog)
    # Per-rule hashes: only files matching a CHANGED rule's
    # ``applies_to`` glob are forced back through apply_updates.  The
    # new hash baseline commits only when the affected set is empty or
    # after the reindex below succeeds (an exception leaves the old
    # hashes → next tick retries).
    config_forced: list[str] = []
    if config_path:
        new_hashes = _rule_hashes(cfg)
        old_hashes = state.get("config_rules")
        if old_hashes is None:
            state["config_rules"] = new_hashes  # first sighting: baseline
        elif old_hashes != new_hashes:
            affected = [
                n for n in _config_affected(old_hashes, new_hashes,
                                            sorted(files))
                if n in data
            ] if built else []
            # the growing-upload guard applies to config targets too
            # (review finding): any unstable target defers the WHOLE
            # config change — hashes stay old, next tick retries
            ready = all(
                data[n] == files.get(n) or stable(n, data[n])
                for n in affected
            )
            if not ready:
                report["pending"].extend(
                    n for n in affected
                    if data[n] != files.get(n) and not stable_memo.get(n, False)
                )
            elif affected:
                config_forced = affected
            else:  # nothing indexed under the old rules yet
                state["config_rules"] = new_hashes

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
    reindex_names = sorted(set(reindex_names) | set(config_forced))
    if reindex_names and built:
        apply_updates(
            out_dir,
            [os.path.join(pages_dir, n) for n in reindex_names],
            reason="watch-config" if config_forced else "watch-reindex",
            auto_optimize=auto_optimize,
        )
        for n in reindex_names:
            files[n] = data[n]
            _write_sidecar(out_dir, pages_dir, n)
        report["reindexed"] = sorted(set(reindex_names) - set(config_forced))
        report["config_reindexed"] = config_forced
        if config_forced:  # reindex committed → adopt the new baseline
            state["config_rules"] = _rule_hashes(cfg)
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

    # ---- 2b. single-doc updates (.docupdate, DocUpdateIndexer.java:78)
    # Processed only against an EXISTING build (update_doc requires
    # one); unbuilt ticks leave the command unconsumed for later.
    built = os.path.exists(os.path.join(out_dir, "docs_manifest.json"))
    if built:
        for name, fp in sorted(cmds.items()):
            if not name.endswith(".docupdate") or commands.get(name) == fp:
                continue
            if not stable(name, fp):
                report["pending"].append(name)
                continue
            # two phases (review finding): PARSE errors mean the file
            # itself is bad — consume it exactly once and surface the
            # error (the reference deletes bad files and continues,
            # Hotfolder.java:782-790).  APPLY errors are infrastructure
            # (stale run cache, ENOSPC, crash recovery) — propagate
            # like every other lane so the un-consumed command retries
            # next tick instead of being silently dropped.
            try:
                with open(os.path.join(pages_dir, name)) as f:
                    spec = json.load(f)
                parsed = []
                for entry in spec if isinstance(spec, list) else [spec]:
                    url = entry["url"]
                    if "html_b64" in entry:
                        import base64

                        html = base64.b64decode(entry["html_b64"])
                    else:
                        html = str(entry.get("html", "")).encode()
                    warc_ts = None
                    if entry.get("warc_ts"):
                        import datetime

                        warc_ts = datetime.datetime.fromisoformat(
                            entry["warc_ts"])
                    parsed.append((url, html, warc_ts,
                                   str(entry.get("lang", ""))))
            except (json.JSONDecodeError, KeyError, ValueError,
                    TypeError) as ex:
                report["errors"].append(f"{name}: {type(ex).__name__}: {ex}")
                commands[name] = fp  # bad file: consumed exactly once
                continue
            for url, html, warc_ts, lang in parsed:
                update_doc(out_dir, url, html, warc_ts=warc_ts, lang=lang)
                report["updated_docs"].append(url)
            commands[name] = fp  # consumed exactly once

    # ---- 2c. anchor acknowledgements (.UPDATED — superupdate analog)
    # The reference moves the updated anchor file into the data
    # repository (MetsIndexer.anchorSuperupdate); with a read-only
    # hotfolder the exactly-once acknowledgement IS the move.
    for name, fp in sorted(cmds.items()):
        if not name.endswith(".UPDATED") or commands.get(name) == fp:
            continue
        if not stable(name, fp):
            report["pending"].append(name)
            continue
        commands[name] = fp
        report["acknowledged"].append(name)

    # ---- 3. deletes: command files + removed shards; purges ----
    # Processed only against an EXISTING build: before anything is
    # built there is nothing to delete FROM, and consuming a command
    # then would silently lose it — so unbuilt ticks leave commands
    # untouched (re-read once the bootstrap has happened).
    built = os.path.exists(os.path.join(out_dir, "docs_manifest.json"))
    del_urls: list[str] = []
    purge_urls: list[str] = []
    if built:
        for name, fp in sorted(cmds.items()):
            if not name.endswith((".delete", ".purge")) or commands.get(name) == fp:
                continue
            if not stable(name, fp):
                report["pending"].append(name)
                continue
            with open(os.path.join(pages_dir, name)) as f:
                urls = [ln.strip() for ln in f if ln.strip()]
            (del_urls if name.endswith(".delete") else purge_urls).extend(urls)
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
    if purge_urls:  # same deletion, NO DATEDELETED trace rows
        purge_urls = sorted(set(purge_urls))
        apply_updates(out_dir, None, purge_urls, reason="watch-purge",
                      auto_optimize=auto_optimize, trace=False)
        report["purged_urls"] = len(purge_urls)
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

    # one report line per pending file even when two lanes saw it
    # (config lane + ingest lane — review finding)
    report["pending"] = sorted(set(report["pending"]))

    _save_state(out_dir, state)

    # success callback (Utils.submitDataToViewer, Hotfolder.java:737
    # and the per-record calls at :762,:770,:780): after a tick that
    # changed the index, notify the viewer-side consumer with what
    # changed and how many record/command files remain in the
    # hotfolder (countRecordFiles analog).  ``notify`` is a pluggable
    # callable — no network in this engine; the REST POST is one
    # requests.post away at this integration point.  Exceptions are
    # swallowed (the reference logs-and-continues on notify failure;
    # indexing must never roll back because the viewer is down).
    if notify is not None and (
        report["indexed"] or report["reindexed"] or report["updated_docs"]
        or report["config_reindexed"] or report["deleted_urls"]
        or report["purged_urls"] or report["removed"]
    ):
        remaining = sum(
            1 for n, fp_ in snap.items()
            if (n in data and files.get(n) != fp_)
            or (n in cmds and commands.get(n) != fp_)
        )
        try:
            notify(dict(report), remaining)
        except Exception:  # noqa: BLE001 - notify is best-effort
            pass
    return report


def watch(out_dir: str, pages_dir: str, *, interval_s: float = 5.0,
          max_polls: int | None = None, auto_optimize: bool = False,
          config_path: str | None = None, notify=None, sleep=None):
    """The daemon loop: ``watch_once`` every ``interval_s`` seconds,
    ``max_polls`` ticks (None = forever).  A GENERATOR yielding one
    report per tick — run-forever mode holds no unbounded report
    list, and callers (the CLI) stream-print each tick.  ``sleep`` is
    injectable so tests drive discrete ticks without wall-clock
    waits.  With ``config_path``, ``interval_s``/``auto_optimize``
    are re-read from the config every tick (hot-reload), and rule
    changes trigger scoped re-indexing inside :func:`watch_once`."""
    import time as _time

    sleep = sleep or _time.sleep
    n = 0
    while max_polls is None or n < max_polls:
        yield watch_once(out_dir, pages_dir, auto_optimize=auto_optimize,
                         config_path=config_path, notify=notify)
        n += 1
        if max_polls is not None and n >= max_polls:
            break
        cfg = load_watch_config(config_path)
        sleep(float((cfg or {}).get("interval_s", interval_s)))
