"""Lookup-enrichment actor with a per-actor TTL cache (ST1 analog).

The reference enriches metadata from external authority stores
(GND/VIAF) through an in-process TTL cache
(``helper/MetadataHelper.java:475-555``, cache ``:82``, TTL 24 h).
Transposed: a ``map_batches`` actor pool where each actor holds

- a broadcast base table (``ray.put`` once, fetched in ``__init__``) —
  the small-side lookup pattern, and
- a bounded per-actor TTL dict for *computed* enrichments, so repeated
  keys within an actor's lifetime skip recomputation.

The "external fetch" is a pluggable pure function here (no network in
this environment); the Ray-side shape — broadcast ref, actor cache,
hit/miss accounting — is the real, tested part.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from collections.abc import Callable

import pyarrow as pa

__all__ = ["TTLCache", "EnrichDocs"]


class TTLCache:
    """Bounded TTL map (MetadataHelper authority-cache analog).

    ``clock`` is injectable (monotonic seconds) so tests can drive
    expiry deterministically without wall-clock sleeps."""

    def __init__(self, max_size: int = 1000, ttl_seconds: float = 24 * 3600,
                 clock: Callable[[], float] = time.monotonic):
        self.max_size = max_size
        self.ttl = ttl_seconds
        self.clock = clock
        self._d: OrderedDict[object, tuple[float, object]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key):
        item = self._d.get(key)
        if item is not None and (self.clock() - item[0]) <= self.ttl:
            self._d.move_to_end(key)
            self.hits += 1
            return item[1]
        if item is not None:
            del self._d[key]
        self.misses += 1
        return None

    def put(self, key, value) -> None:
        self._d[key] = (self.clock(), value)
        self._d.move_to_end(key)
        while len(self._d) > self.max_size:
            self._d.popitem(last=False)


class EnrichDocs:
    """Actor stage: add an enrichment column by key.

    ``ds.map_batches(EnrichDocs, fn_constructor_kwargs={"base_ref": ref,
    "key_col": "lang"}, concurrency=N, batch_size=B)``.
    """

    def __init__(self, base_ref, key_col: str, out_col: str = "enriched",
                 compute: Callable[[object], str] | None = None,
                 cache_size: int = 1000, ttl_seconds: float = 24 * 3600):
        import ray

        self.base: dict = ray.get(base_ref)  # broadcast small side
        self.key_col = key_col
        self.out_col = out_col
        self.compute = compute or (lambda k: f"unknown:{k}")
        self.cache = TTLCache(cache_size, ttl_seconds)

    def _resolve(self, key):
        if key in self.base:
            return self.base[key]
        cached = self.cache.get(key)
        if cached is not None:
            return cached
        value = self.compute(key)
        self.cache.put(key, value)
        return value

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_pylist()
        return batch.append_column(
            self.out_col, pa.array([self._resolve(k) for k in keys], pa.string())
        )
