"""Canonical tokenizer — the part the reference delegates to Solr.

The reference only pre-normalizes strings before shipping them to Solr's
analyzer: ``DEFAULT`` cleanup replaces ``,;:`` with spaces
(``Indexer.java:492-498``); ``FACET_DEFAULT`` splits on space,
lowercases and dedups (``AbstractWriteStrategy.java:225-241``);
one-token normalization strips non-word chars
(``MetadataHelper.java:961-973``).  Our tokenizer owns the full
analyzer semantics, mirroring those rules:

    NFC-normalize → Unicode lowercase → tokens = maximal runs of
    Unicode alphanumerics (underscore excluded).

Must be bit-stable across workers; pure stdlib ``re`` (pinned by
``tests/test_tokenize.py``).
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter

__all__ = ["tokenize", "token_counts", "TOKEN_RE"]

# Maximal runs of Unicode letters/digits; `[^\W_]` = \w minus underscore.
TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """Text → ordered token list (lowercased, NFC)."""
    return TOKEN_RE.findall(unicodedata.normalize("NFC", text).lower())


def token_counts(text: str) -> tuple[dict[str, int], int]:
    """Text → (term→tf map, doc length in tokens)."""
    toks = tokenize(text)
    return dict(Counter(toks)), len(toks)
