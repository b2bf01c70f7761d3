"""Bloom-filter membership for crawl-frontier dedup.

The webtext ingest loop's cheapest question — "have we (probably)
crawled this URL already?" — answered without shipping the full
seen-set to every worker: a bit array of ``m_bits`` with ``k_hashes``
md5-derived probes per key.  False positives only (a new URL may be
skipped at the documented rate), never false negatives — the safe
direction for dedup.

Hashes follow the repo's md5-prefix convention
(``functions.hashing.md5_hash64_array``), position ``i`` of key ``u``
being ``md5_64(u ‖ ':b' ‖ i) % m_bits`` — exactly replicable in SQL
(`('0x'||substr(md5(..),1,16))::UBIGINT % m`), so the catalog entry
can hash-compare every probe verdict, FPs included, against a DuckDB
replay.

Scale shape
-----------

- **Build**: one ``map_batches`` pass emits a per-block bitmap partial
  (``m_bits/8`` bytes each); partials OR together on the driver —
  #blocks × m/8 bytes of driver traffic, the price of a dense filter.
  At frontier scale (m in the billions) swap in the sharded layout:
  split the keyspace by ``hash % n_shards`` into n smaller blooms
  built by a ``groupby(shard)`` and probe-routed the same way — the
  per-shard build is this same function.
- **Probe**: the bitmap is broadcast ONCE (``ray.put``) and each batch
  tests vectorized — numpy gather on the packed uint64 words, no
  Python per-row work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_hash64_array

__all__ = ["bloom_build", "bloom_positions", "bloom_probe"]


def bloom_positions(keys, *, m_bits: int, k_hashes: int, salt: str = "b") -> np.ndarray:
    """(n, k_hashes) int64 bit positions for the given string keys."""
    out = np.empty((len(keys), k_hashes), np.int64)
    for i in range(k_hashes):
        out[:, i] = (
            md5_hash64_array([f"{u}:{salt}{i}" for u in keys]) % np.uint64(m_bits)
        ).astype(np.int64)
    return out


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(
        bitmap, pos // 64, np.left_shift(np.uint64(1), (pos % 64).astype(np.uint64))
    )


def bloom_build(ds, *, key_col: str, m_bits: int = 1 << 20, k_hashes: int = 4,
                salt: str = "b") -> np.ndarray:
    """Seen-set → packed uint64 bitmap (length ``m_bits/64``).  One
    streaming pass; per-block partials OR-fold on the driver."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")

    words = m_bits // 64

    def part(t: pa.Table) -> pa.Table:
        bm = np.zeros(words, np.uint64)
        keys = t.column(key_col).cast(pa.string()).to_pylist()
        if keys:
            _set_bits(bm, bloom_positions(keys, m_bits=m_bits, k_hashes=k_hashes,
                                          salt=salt).ravel())
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    acc = np.zeros(words, np.uint64)
    for row in ds.map_batches(part, batch_format="pyarrow").take_all():
        acc |= np.frombuffer(row["bm"], np.uint64)
    return acc


def bloom_probe(ds, bitmap: np.ndarray, *, key_col: str, m_bits: int | None = None,
                k_hashes: int = 4, salt: str = "b", out_col: str = "maybe_seen"):
    """Candidate stream → same stream + boolean ``out_col`` (true iff
    every probe bit is set).  The bitmap ships via ``ray.put`` once."""
    import ray

    m = int(bitmap.size * 64) if m_bits is None else m_bits
    bm_ref = ray.put(bitmap)

    def probe(t: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        keys = t.column(key_col).cast(pa.string()).to_pylist()
        if not keys:
            hit = np.zeros(0, bool)
        else:
            pos = bloom_positions(keys, m_bits=m, k_hashes=k_hashes, salt=salt)
            bits = (bm[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
            hit = bits.astype(bool).all(axis=1)
        return t.append_column(out_col, pa.array(hit, pa.bool_()))

    return ds.map_batches(probe, batch_format="pyarrow")
