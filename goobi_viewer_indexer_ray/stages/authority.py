"""Authority-record enrichment stage (GND/VIAF NORM_* synthesis).

The Ray side of :mod:`functions.authority`: an actor-pool
``map_batches`` stage that resolves each row's authority url through a
pluggable transport (``RecordedTransport`` in tests — no network in
this sandbox), caches records per actor with a TTL (the reference's
``authorityDataCache``, ``MetadataHelper.java:504-516``), and explodes
the parsed NORM_* fields into long-format rows.

Scale shape: authority fetches are I/O-bound and highly repetitive
(the same GND ids recur across a corpus) — run as an actor pool sized
by connection budget (``concurrency=N, num_cpus≈0.25``) so the
per-actor TTL cache absorbs the repeats; output is a long (id, field,
value) relation, one row per synthesized field, which downstream
joins back to docs by id (or aggregates into bags).

Record wire format: JSON ``[[key, value], ...]`` — the transposed
``NormData`` list (the reference's MarcXML/EAD authority payloads are
parsed by the intranda normdata lib; the list-of-pairs is that lib's
output shape, which is where this engine's contract starts).
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pyarrow as pa

from ..functions.authority import parse_authority_fields, sanitize_authority_url
from .enrich import TTLCache

__all__ = ["NormalizeAuthority"]


class NormalizeAuthority:
    """``ds.map_batches(NormalizeAuthority, fn_constructor_kwargs={...},
    concurrency=N, batch_size=B)`` — one actor per slot, cache in
    ``__init__``, work in ``__call__``."""

    def __init__(
        self,
        transport: Callable[[str], bytes],
        *,
        id_col: str = "doc_id",
        url_col: str = "authority_url",
        label_field: str = "",
        add_to_default: tuple[str, ...] = (),
        replace_rules: list[tuple[str, str]] | None = None,
        cache_size: int = 10_000,
        ttl_seconds: float = 24 * 3600,
        clock: Callable[[], float] | None = None,
    ):
        self.transport = transport
        self.id_col = id_col
        self.url_col = url_col
        self.label_field = label_field
        self.add_to_default = tuple(add_to_default)
        self.replace_rules = replace_rules or []
        kw = {"clock": clock} if clock is not None else {}
        self.cache = TTLCache(max_size=cache_size, ttl_seconds=ttl_seconds, **kw)

    def _record(self, url: str) -> list[tuple[str, str | None]] | None:
        u = sanitize_authority_url(url)
        if not u:
            return None
        cached = self.cache.get(u)
        if cached is None:
            try:
                raw = self.transport(u)
            except Exception:
                return None  # unresolvable record → no fields (ref: warn+skip)
            cached = [(k, v) for k, v in json.loads(raw)]
            if not cached:
                return None  # "No authority data fields found."
            self.cache.put(u, cached)
        return cached

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        urls = batch.column(self.url_col).to_pylist()
        out_id, out_field, out_value, out_pos = [], [], [], []
        for rid, url in zip(ids, urls):
            rec = self._record(url) if url else None
            if rec is None:
                continue
            rows, default_bag, terms_bag = parse_authority_fields(
                rec,
                label_field=self.label_field,
                add_to_default=self.add_to_default,
                replace_rules=self.replace_rules,
            )
            if default_bag:
                rows.append(("DEFAULT", default_bag))
            if terms_bag:
                rows.append(("NORMDATATERMS", terms_bag))
            for pos, (f, v) in enumerate(rows):
                out_id.append(rid)
                out_field.append(f)
                out_value.append(v)
                out_pos.append(pos)
        return pa.table(
            {
                "id": pa.array(out_id, pa.int64()),
                "pos": pa.array(out_pos, pa.int64()),
                "field": pa.array(out_field, pa.string()),
                "value": pa.array(out_value, pa.string()),
            }
        )
