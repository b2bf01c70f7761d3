"""Partition-level lineage manifests — the engine's checkpoint/resume unit.

Reference analog: the hotfolder file-state machine (record files move
through ``hotfolder → indexed_* / error_*`` and a crashed record is
simply retried on the next scan, ``MetsIndexer.java:176-262``,
``helper/Hotfolder.java`` queues).  Ray Data gives task retry but no
cross-run job resume (SURVEY.md §4.1), so this module is our own
machinery:

- every pipeline stage writes its outputs as **atomic per-partition
  files** (write to ``<name>.tmp-<pid>``, ``os.replace`` into place);
- each stage records a manifest JSON: input fingerprint, engine spec
  version, per-partition row counts / bytes / timings;
- on resume, a stage whose manifest matches the current input
  fingerprint + spec version is skipped wholesale, and a partially
  complete stage recomputes only partitions without valid entries.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any

from .. import ENGINE_SPEC_VERSION

__all__ = [
    "atomic_write_bytes",
    "atomic_write_json",
    "input_fingerprint",
    "load_manifest",
    "write_manifest",
    "manifest_valid",
]


def atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".tmp-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def atomic_write_json(path: str, obj: Any) -> None:
    atomic_write_bytes(path, json.dumps(obj, indent=1, sort_keys=True).encode())


def input_fingerprint(paths: list[str]) -> str:
    """Cheap, stable fingerprint of a set of input files.

    basename + size + mtime_ns — mtime catches same-size in-place edits
    (an edited input must invalidate resume; content hashing a 100 TB
    input is not an option, so mtime is the standard proxy).
    """
    items = []
    for p in paths:
        st = os.stat(p)
        items.append((os.path.basename(p), st.st_size, st.st_mtime_ns))
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for name, size, mtime in sorted(items):
        h.update(f"{name}:{size}:{mtime};".encode())
    return h.hexdigest()


def load_manifest(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def write_manifest(path: str, *, stage: str, fingerprint: str, extra: dict | None = None) -> dict:
    m = {
        "stage": stage,
        "fingerprint": fingerprint,
        "spec_version": ENGINE_SPEC_VERSION,
        "completed_at": time.time(),
    }
    if extra:
        m.update(extra)
    atomic_write_json(path, m)
    return m


def manifest_valid(path: str, fingerprint: str) -> dict | None:
    """Return the manifest if it matches fingerprint + spec version."""
    m = load_manifest(path)
    if m and m.get("fingerprint") == fingerprint and m.get("spec_version") == ENGINE_SPEC_VERSION:
        return m
    return None
