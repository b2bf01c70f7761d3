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

__all__ = ["hash64", "hash64_array", "md5_hash64_array", "part_for", "part_array",
           "shard_for"]


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


def md5_hash64_array(values) -> np.ndarray:
    """64-bit hashes from the md5 prefix → uint64 array.

    Big-endian first 8 digest bytes == ``hexdigest()[:16]`` parsed as
    hex — exactly reproducible in ANSI SQL as
    ``('0x' || substr(md5(t), 1, 16))::UBIGINT``, which is what lets
    SimHash fingerprints be value-checked by the DuckDB oracle
    (blake2b has no SQL equivalent).
    """
    from hashlib import md5

    return np.fromiter(
        (int.from_bytes(md5(v.encode("utf-8")).digest()[:8], "big") for v in values),
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
