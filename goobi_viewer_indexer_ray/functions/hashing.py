"""Stable, versioned hashing for partitioning and fingerprints.

The reference partitions records into "data repositories" via pluggable
strategies (``model/datarepository/strategy/*``); our analog is a pure
function ``key → partition`` that must be identical across workers,
Python versions and runs (SURVEY.md §2.10).  blake2b (stdlib, seeded by
construction) — NOT ``hash()``, which is salted per process.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

__all__ = ["hash64", "hash64_array", "part_for", "part_array", "shard_for"]


def hash64(s: str | bytes) -> int:
    """Stable unsigned 64-bit hash of a string/bytes."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(blake2b(s, digest_size=8).digest(), "little")


def hash64_array(values) -> np.ndarray:
    """Stable 64-bit hashes of an iterable of strings → uint64 array."""
    h = blake2b  # local bind for the tight loop
    return np.fromiter(
        (int.from_bytes(h(v.encode("utf-8"), digest_size=8).digest(), "little") for v in values),
        dtype=np.uint64,
        count=len(values),
    )


def part_for(url: str, num_parts: int) -> int:
    """url → doc partition id (the data-repository-strategy analog)."""
    return hash64(url) % num_parts


def part_array(urls, num_parts: int) -> np.ndarray:
    return (hash64_array(urls) % np.uint64(num_parts)).astype(np.int32)


def shard_for(term: str, num_shards: int) -> int:
    """term → index term-shard id."""
    return hash64(term) % num_shards
