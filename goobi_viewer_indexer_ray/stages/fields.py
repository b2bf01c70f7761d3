"""Field-extraction stage: pages → per-doc metadata field table.

Ray wrapper for the M2 DSL (``functions/fields.py``): a stateless
``map_batches`` over the pages table emitting one row per (url, field,
value) — the tall/skinny layout keeps the schema fixed while the rule
set varies (the reference's ``LuceneField`` list, flattened).

The rule set rides to workers inside the function closure (it is a
small plain-data list — the ST2 broadcast pattern); swap in a custom
``rules`` list to reconfigure, exactly like editing
``config_indexer.xml``.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.extract import decode_html
from ..functions.fields import DEFAULT_RULES, EntitySpec, FieldRule, apply_rules

__all__ = ["ExtractFields", "ExtractTextEntities", "FIELDS_SCHEMA"]

FIELDS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("field", pa.string()),
        ("pos", pa.int32()),
        ("value", pa.string()),
    ]
)


class ExtractFields:
    def __init__(self, rules: list[FieldRule] | None = None):
        self.rules = rules or DEFAULT_RULES

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls_out, fields_out, pos_out, values_out = [], [], [], []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            fields = apply_rules(decode_html(html), self.rules)
            for name in sorted(fields):
                for i, v in enumerate(fields[name]):
                    urls_out.append(url)
                    fields_out.append(name)
                    pos_out.append(i)
                    values_out.append(v)
        return pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "field": pa.array(fields_out, pa.string()),
                "pos": pa.array(pos_out, pa.int32()),
                "value": pa.array(values_out, pa.string()),
            }
        )


class ExtractTextEntities:
    """Grouped-entity extraction over a text table (the
    ``group_entity`` / GroupedMetadata analog for corpora that arrive
    as plain text): one child entity row per pattern match, named
    groups as columns, linked to the owner by ``doc_id`` + ``pos``
    (the reference links METADATA docs to their owner record,
    ``model/GroupedMetadata.java:143-227``).

    Callable-class actor/task stage — the pattern compiles once per
    worker in ``__init__``; ``__call__`` scans each batch with the
    compiled regex (C-level ``finditer``).
    """

    def __init__(self, spec: EntitySpec):
        import re

        self.spec = spec
        self._re = re.compile(spec.pattern)
        self._groups = sorted(self._re.groupindex)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        pos_out: list[int] = []
        val_out: list[str] = []
        grp_out: dict[str, list[str]] = {g: [] for g in self._groups}
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for i, m in enumerate(self._re.finditer(text or "")):
                ids_out.append(did)
                pos_out.append(i)
                val_out.append(m.group(0))
                gd = m.groupdict()
                for g in self._groups:
                    grp_out[g].append(gd.get(g) or "")
        cols = {
            "doc_id": pa.array(ids_out, pa.int64()),
            "pos": pa.array(pos_out, pa.int64()),
            "value": pa.array(val_out, pa.string()),
        }
        for g in self._groups:
            cols[g] = pa.array(grp_out[g], pa.string())
        return pa.table(cols)
