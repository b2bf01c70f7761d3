"""BM25 scoring spec — the math the reference delegates to Lucene.

Fixed parameters k1=1.2, b=0.75 (``BASELINE.json:north_star``).

Score spec (rank-identity contract, used by the index scorer, the
distributed no-index pipeline, the pure-Python oracle, and mirrored by
the DuckDB oracle SQL):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))          # Lucene BM25
    impact(t,d) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(q,d)  = Σ_{t ∈ distinct(q) ∧ t ∈ d} idf(t)*impact(t,d)

- all arithmetic in float64; the Σ runs over the query's distinct
  terms in ascending unicode order (fixed association order → bit-
  stable across differently-merged partials, SURVEY.md §7.4.2);
- ``avgdl = total_tokens / N`` as float64;
- ranking: score desc, ``doc_id`` asc tie-break.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["K1", "B", "idf", "impact"]

K1 = 1.2
B = 0.75


def idf(n_docs: int, df) -> np.ndarray | float:
    """Lucene-style BM25 idf, float64; accepts scalars or arrays.

    Pinned to libm's ``math.log1p`` (NOT ``np.log1p``, which differs by
    1 ulp on some inputs) so the pure-Python oracle and the engine are
    bit-identical.  idf is evaluated once per (query, term) — never in
    a hot loop — so the scalar call costs nothing.
    """
    df_arr = np.asarray(df, dtype=np.float64)
    x = (float(n_docs) - df_arr + 0.5) / (df_arr + 0.5)
    if x.shape:
        return np.array([math.log1p(v) for v in x.tolist()], dtype=np.float64)
    return math.log1p(float(x))


def impact(tf, dl, avgdl: float, k1: float = K1, b: float = B):
    """Per-posting BM25 term impact (idf excluded), float64."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / float(avgdl)))


