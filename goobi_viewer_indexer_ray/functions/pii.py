"""PII scrubbing — redact emails / phone numbers / IPv4 addresses from
a text column.

A first-class stage of any web-corpus curation pipeline (the privacy
counterpart of the quality/language filters in pipelines/curate.py);
the reference's nearest analog is its value-normalization rule chain
(``MetadataHelper.applyReplaceRules``, ``ValueNormalizer`` — SURVEY.md
M6/M9), which this generalizes to pattern-class redaction.

The three patterns are deliberately RE2-compatible (no lookaround, no
backreferences) and are applied in a FIXED order (email → IPv4 →
phone), so the exact same rules run in DuckDB ``regexp_replace`` —
the SQL oracle and the engine share these pattern constants via
:func:`sql_scrub_expr` and can never diverge.  The Python side
compiles with ``re.ASCII`` because RE2's ``\\d``/``\\b`` are
ASCII-only — without the flag, Arabic-Indic/Devanagari digits would
match ``\\d`` in the engine but not in the oracle.

Everything is vectorized pandas ``.str`` kernels (C regex across the
whole column); counts are taken BEFORE redaction so they report what
was found.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["EMAIL_RE", "IPV4_RE", "PHONE_RE", "scrub_pii", "sql_scrub_expr",
           "sql_count_expr"]

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# international-ish: optional +, then 8..16 digits with single spaces
# or dashes between groups (kept simple enough to be bit-identical
# between Python re and RE2)
PHONE_RE = r"\+?\d[\d \-]{6,14}\d"

# (pattern, replacement) in application order — email first so its
# digits can't be half-eaten by the phone rule, IPv4 before phone so
# dotted quads don't count as phone digits
RULES = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def scrub_pii(texts: pd.Series) -> pd.DataFrame:
    """``(scrubbed, n_emails, n_ips, n_phones)`` for a text column."""
    import re

    s = texts.fillna("")
    counts = []
    for rx, repl in RULES:
        pat = re.compile(rx, re.ASCII)  # RE2 parity: \d/\b stay ASCII
        counts.append(s.str.count(pat).astype("int64"))
        # count on the CURRENT text, then redact before the next rule —
        # identical staging to the SQL oracle's nested replaces
        s = s.str.replace(pat, repl, regex=True)
    return pd.DataFrame(
        {
            "scrubbed": s,
            "n_emails": counts[0],
            "n_ips": counts[1],
            "n_phones": counts[2],
        }
    )


def _sql_quote(rx: str) -> str:
    return rx.replace("'", "''")


def sql_scrub_expr(col: str) -> str:
    """DuckDB expression applying the SAME rules in the SAME order."""
    expr = col
    for rx, repl in RULES:
        expr = (f"regexp_replace({expr}, '{_sql_quote(rx)}', "
                f"'{repl}', 'g')")
    return expr


def sql_count_expr(col: str, rule_idx: int) -> str:
    """DuckDB count of rule ``rule_idx`` matches, staged like the
    engine: earlier rules' matches are redacted first."""
    expr = col
    for rx, repl in RULES[:rule_idx]:
        expr = (f"regexp_replace({expr}, '{_sql_quote(rx)}', "
                f"'{repl}', 'g')")
    rx = RULES[rule_idx][0]
    return f"length(regexp_extract_all({expr}, '{_sql_quote(rx)}'))::BIGINT"
