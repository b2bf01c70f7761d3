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
from ..functions.fields import DEFAULT_RULES, FieldRule, apply_rules

__all__ = ["ExtractFields", "FIELDS_SCHEMA"]

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
