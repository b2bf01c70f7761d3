"""Slow, pure-Python reference implementation (the test oracle).

Plays the role the live Solr index plays for the reference's tests
(``AbstractSolrEnabledTest.java``): an independent implementation the
engine must match exactly — byte-identical extracted text per url,
identical deterministic doc_ids, identical df/cf, and rank-identical
BM25 top-k (score desc, doc_id asc).  Deliberately written with plain
dicts/loops and ``math.log`` — no numpy, no sharing of the engine's
vectorized paths (the shared pure functions are only the *spec*
primitives: extractor, tokenizer, partition hash).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from ..functions.extract import extract_text
from ..functions.hashing import part_for
from ..functions.ids import PART_STRIDE
from ..functions.scoring import B, K1
from ..functions.tokenize import tokenize

__all__ = ["OracleCorpus", "build_oracle", "oracle_topk", "REFERENCE_QUERIES"]


@dataclass
class OracleDoc:
    url: str
    doc_id: int
    text: str
    tf: dict[str, int]
    dl: int


@dataclass
class OracleCorpus:
    docs: list[OracleDoc] = field(default_factory=list)
    by_url: dict[str, OracleDoc] = field(default_factory=dict)
    df: dict[str, int] = field(default_factory=dict)
    n_docs: int = 0
    avgdl: float = 0.0


def build_oracle(pages_rows: list[dict], num_parts: int) -> OracleCorpus:
    """pages rows (url, warc_ts, html) → fully scored-ready corpus.

    Reproduces the engine's dedup-keep-latest and two-phase doc_id
    assignment with independent plain-Python code.
    """
    from ..functions.hashing import hash64

    def _tie_key(row: dict) -> tuple:
        # mirrors dedup_and_rank's deterministic survivor rule:
        # (warc_ts, hash64(extracted text), lang) — max wins
        return (row["warc_ts"], hash64(extract_text(row["html"])), row.get("lang") or "")

    latest: dict[str, dict] = {}
    for row in pages_rows:
        cur = latest.get(row["url"])
        if cur is None or row["warc_ts"] > cur["warc_ts"]:
            latest[row["url"]] = row
        elif row["warc_ts"] == cur["warc_ts"] and _tie_key(row) > _tie_key(cur):
            latest[row["url"]] = row

    parts: dict[int, list[str]] = {}
    for url in latest:
        parts.setdefault(part_for(url, num_parts), []).append(url)

    corpus = OracleCorpus()
    for p in sorted(parts):
        for rank, url in enumerate(sorted(parts[p])):
            text = extract_text(latest[url]["html"])
            toks = tokenize(text)
            doc = OracleDoc(url=url, doc_id=p * PART_STRIDE + rank, text=text,
                            tf=dict(Counter(toks)), dl=len(toks))
            corpus.docs.append(doc)
            corpus.by_url[url] = doc

    corpus.n_docs = len(corpus.docs)
    total = 0
    for doc in corpus.docs:
        total += doc.dl
        for t in doc.tf:
            corpus.df[t] = corpus.df.get(t, 0) + 1
    corpus.avgdl = total / corpus.n_docs if corpus.n_docs else 0.0
    return corpus


def oracle_topk(corpus: OracleCorpus, query: str, k: int) -> list[tuple[int, float]]:
    """Exact BM25 per the scoring spec → [(doc_id, score)] of length ≤ k."""
    terms = sorted(set(tokenize(query)))
    scores: dict[int, float] = {}
    for t in terms:  # ascending → the spec's fixed association order
        df = corpus.df.get(t)
        if not df:
            continue
        # log1p, matching functions/scoring.py's np.log1p bit-for-bit
        w = math.log1p((corpus.n_docs - df + 0.5) / (df + 0.5))
        for doc in corpus.docs:
            tf = doc.tf.get(t)
            if tf:
                contrib = w * (tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * doc.dl / corpus.avgdl)))
                scores[doc.doc_id] = scores.get(doc.doc_id, 0.0) + contrib
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


# The reference query set (FIXTURES.md §3): head terms / mid / tail /
# absent / accented / mixed case / multi-term, over the synthetic
# corpus vocabulary (sources/corpus.py `_word`: rank-0 words are "baba",
# "beba", ... and every 997th word carries accents).
REFERENCE_QUERIES: list[dict] = [
    {"query_id": 0, "query": "baba", "k": 10},
    {"query_id": 1, "query": "beba bibo", "k": 10},
    {"query_id": 2, "query": "BABA", "k": 10},  # case folding
    {"query_id": 3, "query": "kuna mule", "k": 100},
    {"query_id": 4, "query": "zzzneverseen", "k": 10},  # absent term
    {"query_id": 5, "query": "baba zzzneverseen", "k": 10},
    {"query_id": 6, "query": "rurode saba baba beba", "k": 100},
    {"query_id": 7, "query": "kobá málo", "k": 10},  # accented vocab forms
    {"query_id": 8, "query": "hyphenated", "k": 10},  # edge-case fixture row
    {"query_id": 9, "query": "café", "k": 10},
    {"query_id": 10, "query": "visible", "k": 10},
    {"query_id": 11, "query": "updated crawl version", "k": 100},
    {"query_id": 12, "query": "baba baba baba", "k": 10},  # dup terms
    {"query_id": 13, "query": "nili keba", "k": 1},
]
