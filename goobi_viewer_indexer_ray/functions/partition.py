"""Pluggable data-repository partition strategies (SURVEY §2 —
round-4 verdict "missing #3").

The reference selects a data repository per record through a
configured strategy (``model/datarepository/strategy/``):

- ``RemainingSpaceStrategy.java:81-170`` — STICKY (a record already
  indexed keeps its previous repository), else the repository with the
  SMALLEST sufficient free space (usable minus a configured buffer)
  for the record's byte size; fatal error when nothing fits.
- ``MaxRecordNumberStrategy.java:55-120`` — sticky, else the first
  repository with fewer than ``maxRecords`` records (default 10 000,
  ``config_indexer.xml:26``).

Transposed: a partition strategy assigns ``url → part`` for the docs
table.  The default engine path stays the stateless
:func:`..functions.hashing.part_for` hash (the only shape that needs
no coordination at 10¹² docs); the stateful strategies below are the
hotfolder-scale policy surface — assignment happens on the driver over
the (url, size) SMALL SIDE of an ingest batch (the reference assigns
per record file as it arrives; a handful of repositories × bounded
ingest batch, never the whole corpus), and the resulting ledger is
persisted next to the build manifests so reruns and incremental
updates reuse it (the sticky rule, resume-safe).

Ledger file (``out_dir/partition_ledger.json``)::

    {"strategy": ..., "params": {...}, "used": [bytes or records per
     part], "assign": {url: part}}
"""

from __future__ import annotations

import json
import os

import numpy as np

from .hashing import part_array

__all__ = [
    "HashStrategy",
    "RemainingSpaceStrategy",
    "MaxRecordNumberStrategy",
    "load_ledger",
    "LEDGER_NAME",
]

LEDGER_NAME = "partition_ledger.json"


class HashStrategy:
    """Stateless hash assignment — the default engine path
    (coordination-free, uniform, resume-safe by construction)."""

    name = "hash"

    def __init__(self, num_parts: int):
        self.num_parts = int(num_parts)

    def assign(self, urls, sizes=None) -> np.ndarray:
        return part_array(list(urls), self.num_parts).astype(np.int64)

    def fingerprint(self) -> str:
        return f"hash:{self.num_parts}"

    # stateless: nothing to persist
    def to_state(self) -> dict:
        return {"strategy": self.name, "params": {"num_parts": self.num_parts},
                "used": [], "assign": {}}


class RemainingSpaceStrategy:
    """Per-partition BYTE budgets with the reference's selection rule.

    ``budgets[p]`` is partition p's capacity in bytes; ``buffer`` is
    subtracted from every partition's remaining space before the fit
    test (``RemainingSpaceStrategy.generateRepositorySpaceMap`` —
    "should subtract the buffer size from available space").  A record
    goes to the partition with the SMALLEST remaining space that still
    fits it ("should select repository with the smallest sufficient
    space"); a url seen before keeps its recorded partition without
    re-charging its bytes (sticky + idempotent ⇒ reruns are no-ops).
    Raises ``RuntimeError`` when no partition fits (the reference's
    FatalIndexerException)."""

    name = "remaining_space"

    def __init__(self, budgets: list[int], *, buffer: int = 0,
                 used: list[int] | None = None,
                 assign_map: dict[str, int] | None = None):
        self.budgets = [int(b) for b in budgets]
        self.buffer = int(buffer)
        self.used = [int(u) for u in (used or [0] * len(self.budgets))]
        self.assign_map: dict[str, int] = dict(assign_map or {})

    @property
    def num_parts(self) -> int:
        return len(self.budgets)

    def assign(self, urls, sizes) -> np.ndarray:
        out = np.empty(len(urls), np.int64)
        for i, (u, sz) in enumerate(zip(urls, sizes)):
            prev = self.assign_map.get(u)
            if prev is not None:  # sticky: previous repository wins
                out[i] = prev
                continue
            sz = int(sz)
            best, best_rem = -1, None
            for p in range(self.num_parts):
                rem = self.budgets[p] - self.used[p] - self.buffer
                if rem >= sz and (best_rem is None or rem < best_rem):
                    best, best_rem = p, rem
            if best < 0:
                raise RuntimeError(
                    f"no partition has {sz} bytes available "
                    f"(budgets={self.budgets}, used={self.used}, "
                    f"buffer={self.buffer}) — configure more partitions"
                )
            self.used[best] += sz
            self.assign_map[u] = best
            out[i] = best
        return out

    def fingerprint(self) -> str:
        return f"remaining_space:{self.budgets}:{self.buffer}"

    def to_state(self) -> dict:
        return {
            "strategy": self.name,
            "params": {"budgets": self.budgets, "buffer": self.buffer},
            "used": self.used,
            "assign": self.assign_map,
        }

    @classmethod
    def from_state(cls, st: dict) -> "RemainingSpaceStrategy":
        return cls(st["params"]["budgets"], buffer=st["params"].get("buffer", 0),
                   used=st.get("used"), assign_map=st.get("assign"))


class MaxRecordNumberStrategy:
    """At most ``max_records`` records per partition; sticky, else the
    FIRST partition with room (``MaxRecordNumberStrategy.java`` —
    declaration order)."""

    name = "max_records"

    def __init__(self, num_parts: int, *, max_records: int = 10_000,
                 used: list[int] | None = None,
                 assign_map: dict[str, int] | None = None):
        self.num_parts_ = int(num_parts)
        self.max_records = int(max_records)
        self.used = [int(u) for u in (used or [0] * self.num_parts_)]
        self.assign_map: dict[str, int] = dict(assign_map or {})

    @property
    def num_parts(self) -> int:
        return self.num_parts_

    def assign(self, urls, sizes=None) -> np.ndarray:
        out = np.empty(len(urls), np.int64)
        for i, u in enumerate(urls):
            prev = self.assign_map.get(u)
            if prev is not None:
                out[i] = prev
                continue
            for p in range(self.num_parts_):
                if self.used[p] < self.max_records:
                    self.used[p] += 1
                    self.assign_map[u] = p
                    out[i] = p
                    break
            else:
                raise RuntimeError(
                    f"every partition is at max_records={self.max_records}"
                )
        return out

    def fingerprint(self) -> str:
        return f"max_records:{self.num_parts_}:{self.max_records}"

    def to_state(self) -> dict:
        return {
            "strategy": self.name,
            "params": {"num_parts": self.num_parts_,
                       "max_records": self.max_records},
            "used": self.used,
            "assign": self.assign_map,
        }

    @classmethod
    def from_state(cls, st: dict) -> "MaxRecordNumberStrategy":
        return cls(st["params"]["num_parts"],
                   max_records=st["params"].get("max_records", 10_000),
                   used=st.get("used"), assign_map=st.get("assign"))


_BY_NAME = {
    RemainingSpaceStrategy.name: RemainingSpaceStrategy,
    MaxRecordNumberStrategy.name: MaxRecordNumberStrategy,
}


def load_ledger(out_dir: str):
    """Rehydrate the persisted strategy (or ``None`` if the build used
    the default hash assignment)."""
    p = os.path.join(out_dir, LEDGER_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        st = json.load(f)
    cls = _BY_NAME.get(st.get("strategy"))
    return cls.from_state(st) if cls else None


def save_ledger(out_dir: str, strategy) -> None:
    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, LEDGER_NAME)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(strategy.to_state(), f, sort_keys=True)
    os.replace(tmp, p)  # atomic — a crashed build never half-writes
