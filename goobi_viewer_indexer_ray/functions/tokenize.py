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

__all__ = ["tokenize", "token_counts", "TOKEN_RE", "STOPWORDS", "tokenize_lang",
           "analyzer_for", "register_analyzer"]

# Maximal runs of Unicode letters/digits; `[^\W_]` = \w minus underscore.
TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """Text → ordered token list (lowercased, NFC)."""
    return TOKEN_RE.findall(unicodedata.normalize("NFC", text).lower())


def token_counts(text: str) -> tuple[dict[str, int], int]:
    """Text → (term→tf map, doc length in tokens)."""
    toks = tokenize(text)
    return dict(Counter(toks)), len(toks)


# ---------------------------------------------------- per-language analyzers
# The reference routes ``*_LANG_XX`` fields through per-language Solr
# analyzers (``helper/language/LanguageHelper.java``; SURVEY.md §2.4).
# Transposed: a registry of language → analyzer callables.  The default
# per-language analysis is base tokenization minus that language's
# stopwords; unknown languages fall back to the global tokenizer, and
# deployments register custom analyzers (stemmers etc.) per language.

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the a and of to in is for on with data".split()),
    "de": frozenset("der die das und ist ein zu mit von nicht".split()),
    "fr": frozenset("le la les et est un une pour dans avec".split()),
}

_ANALYZERS: dict[str, "callable"] = {}


def register_analyzer(lang: str, fn) -> None:
    """Register a custom ``text → tokens`` analyzer for a language."""
    _ANALYZERS[lang] = fn


def analyzer_for(lang: str | None):
    """Analyzer callable for ``lang`` (registry → stopword default →
    global tokenizer)."""
    if lang in _ANALYZERS:
        return _ANALYZERS[lang]
    sw = STOPWORDS.get(lang or "")
    if sw is None:
        return tokenize
    return lambda text: [t for t in tokenize(text) if t not in sw]


def tokenize_lang(text: str, lang: str | None) -> list[str]:
    """Language-aware tokenization (the ``*_LANG_XX`` analyzer analog)."""
    return analyzer_for(lang)(text)
