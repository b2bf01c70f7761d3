"""Term-dictionary suffix array — infix/leading-wildcard term search.

The reference's Solr layer answers leading/infix wildcards
(``*foo*``) by scanning or by indexing reversed tokens
(``ReversedWildcardFilterFactory``, enabled through the schema the
viewer ships); a suffix array over the (per-shard) term dictionary
answers the same queries in ``O(|pattern| · log Σ|term|)`` with no
second token stream.  Build cost is one sort of all suffixes —
``Σ|term|`` entries, linear in dictionary bytes, done ONCE per query
actor next to the postings load (the ``__init__``-not-``__call__``
actor-pool contract).

Scale shape: term dictionaries are hash-sharded, so each searcher
actor builds the SA only for its own shard's vocab; an infix query
fans out per shard exactly like a term lookup and unions the hits.
"""

from __future__ import annotations

from bisect import bisect_left

import numpy as np

__all__ = ["TermSuffixArray"]

# one past the largest code point — upper bound for the half-open
# pattern range [pat, pat + MAXCHAR)
_MAXCHAR = chr(0x10FFFF)


class TermSuffixArray:
    """Suffix array over a term dictionary (terms need not be sorted).

    ``infix(pat)`` returns the SORTED unique indices (into the
    constructor's ``terms``) of the terms containing ``pat`` — exact
    substring semantics, matching SQL ``LIKE '%pat%'`` for patterns
    without wildcard metacharacters.
    """

    def __init__(self, terms: list[str]):
        pairs: list[tuple[str, int]] = []
        for ti, t in enumerate(terms):
            for off in range(len(t)):
                pairs.append((t[off:], ti))
        pairs.sort()
        self._suf = [p[0] for p in pairs]
        self._tid = np.array([p[1] for p in pairs], np.int64)
        self.n_terms = len(terms)

    def infix(self, pat: str) -> np.ndarray:
        if not pat:
            return np.arange(self.n_terms, dtype=np.int64)
        lo = bisect_left(self._suf, pat)
        hi = bisect_left(self._suf, pat + _MAXCHAR)
        return np.unique(self._tid[lo:hi])
