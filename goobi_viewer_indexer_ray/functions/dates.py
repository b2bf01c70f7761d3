"""Date normalization — ``DateTools.normalizeDate`` parity.

Decision-for-decision transposition of the reference's date-string
normalizer (`helper/DateTools.java:91-196`), the function behind
every ``DATE*`` / ``YEAR*`` Solr field the indexer writes:

1. a fixed FORMAT CHAIN is tried in order, first hit wins and yields
   exactly one (year, month, day):
   ISO local datetime (``2020-05-03T10:11:12``), ISO instant
   (``...Z``), German ``dd.MM.yyyy``, ISO date ``yyyy-MM-dd``,
   year-month ``yyyy-MM`` (day defaults to 1 —
   ``DateTools.java:56-59``), US ``MM/dd/yyyy``, CN ``yyyy.MM.dd``,
   JP ``yyyy/MM/dd``;
2. else, if the string contains ``-`` and does not START with ``-``,
   it is treated as a YEAR RANGE: every match of the (faithfully
   quirky) pattern ``[\\d+]\\d+`` — a digit or ``+`` followed by
   digits — whose length is within
   ``[normalize_year_min_digits, 5]`` becomes a year-only date
   (`DateTools.java:159-175`);
3. else every match of ``-?\\d+`` whose DIGIT length (sign excluded)
   is within the same bounds becomes a (possibly negative) year-only
   date (`DateTools.java:176-193`).

``normalize_year_min_digits < 1`` raises ``ValueError`` (the
reference's ``IllegalArgumentException``).
"""

from __future__ import annotations

import re
from datetime import datetime

__all__ = ["normalize_date"]

MAX_YEAR_DIGITS = 5  # DateTools.java:89

_RANGE_RE = re.compile(r"[\d+]\d+")
_NUM_RE = re.compile(r"-?\d+")

# (regex gate, strptime format) — gates keep strptime's leniency from
# accepting what Java's fixed-width patterns would reject
_CHAIN: list[tuple[re.Pattern, str]] = [
    (re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$"),
     "%Y-%m-%dT%H:%M:%S"),                                   # ISO local dt
    (re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$"),
     "%Y-%m-%dT%H:%M:%SZ"),                                  # ISO instant
    (re.compile(r"^\d{2}\.\d{2}\.\d{4}$"), "%d.%m.%Y"),      # DE
    (re.compile(r"^\d{4}-\d{2}-\d{2}$"), "%Y-%m-%d"),        # ISO date
    (re.compile(r"^\d{4}-\d{2}$"), "%Y-%m"),                 # year-month
    (re.compile(r"^\d{2}/\d{2}/\d{4}$"), "%m/%d/%Y"),        # US
    (re.compile(r"^\d{4}\.\d{2}\.\d{2}$"), "%Y.%m.%d"),      # CN
    (re.compile(r"^\d{4}/\d{2}/\d{2}$"), "%Y/%m/%d"),        # JP
]


def normalize_date(date_string: str,
                   normalize_year_min_digits: int = 4
                   ) -> list[tuple[int, int | None, int | None]]:
    """String → list of (year, month, day); month/day ``None`` for
    year-only hits.  Mirrors ``DateTools.normalizeDate`` exactly."""
    if normalize_year_min_digits < 1:
        raise ValueError("normalizeYearMinDigits must be at least 1")
    for gate, fmt in _CHAIN:
        if gate.match(date_string):
            try:
                d = datetime.strptime(date_string, fmt)
            except ValueError:
                continue  # e.g. month 13 — Java falls through too
            return [(d.year, d.month, d.day)]
    out: list[tuple[int, int | None, int | None]] = []
    if "-" in date_string and not date_string.startswith("-"):
        for m in _RANGE_RE.finditer(date_string):
            sub = m.group()
            if (normalize_year_min_digits <= len(sub) <= MAX_YEAR_DIGITS):
                try:
                    out.append((int(sub), None, None))
                except ValueError:
                    pass  # a '+123' parses fine; kept for parity shape
        return out
    for m in _NUM_RE.finditer(date_string):
        sub = m.group()
        digits = len(sub) - 1 if sub.startswith("-") else len(sub)
        if normalize_year_min_digits <= digits <= MAX_YEAR_DIGITS:
            out.append((int(sub), None, None))
    return out
