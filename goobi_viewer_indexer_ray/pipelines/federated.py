"""Federated (doc-partitioned) exact BM25 search — the distributed-Solr
serving shape for an index too large for one node.

Reference analog: the viewer's Solr can serve as a sharded collection
(distributed search), where each shard holds a doc partition and the
coordinator merges per-shard top-k.  Stock distributed Lucene scores
each shard with its LOCAL idf (inexact unless distributed-IDF is
enabled); this implementation does the exact two-phase protocol:

1. **DF exchange** — each member reports its local ``df`` per query
   term (one tiny dict per member); the coordinator sums them into the
   GLOBAL df and computes one idf per term from the global corpus
   stats.
2. **Scatter-score-gather** — every member scores its own postings
   with the COORDINATOR-SUPPLIED weights (so all members use identical
   idf/avgdl) and returns its local top-k; members cover disjoint
   doc ranges, so the gather is a concat + rank (no per-doc combine).

The result is bit-identical to scoring the whole index on one node
(pinned in tests against ``topk_exact``/``topk_wand`` on the unsplit
index), which stock per-shard-idf distributed search is not.

Members map 1:1 onto the index's doc-range buckets (format v3): a
member loads only its buckets' segment files — at 10^12 docs each
serving node holds ``1/members`` of the postings, and the only
cross-node traffic per query is ``O(terms)`` integers up and ``O(k)``
rows back.  Ray actors hold the members (one index load per actor
lifetime — the standard actor-pool serving pattern).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq

import ray

from ..functions.scoring import idf as _idf
from ..functions.tokenize import tokenize
from .query import LocalIndex, _rank_topk
from ..stages.index_merge import segment_paths

__all__ = ["FederatedSearch", "member_bucket_plan"]


def member_bucket_plan(out_dir: str, n_members: int) -> list[list[int]]:
    """Contiguous doc-range bucket groups, one per member (doc order
    preserved inside a member, disjoint across members)."""
    buckets = sorted({s["bucket"] for s in segment_paths(os.path.join(out_dir, "index"))})
    if not buckets:
        raise FileNotFoundError(f"no index segments under {out_dir}")
    n_members = min(n_members, len(buckets))
    # balanced contiguous split (sizes differ by at most 1) — naive
    # ceil-sized slicing can silently produce FEWER members than
    # requested (6 buckets / 4 members → 3 groups of 2), idling
    # provisioned serving nodes
    return [part.tolist() for part in np.array_split(np.asarray(buckets), n_members)]


@ray.remote
class _Member:
    """One doc-range member: loads ONLY its buckets' segments."""

    def __init__(self, out_dir: str, buckets: list[int]):
        with open(os.path.join(out_dir, "stats.json")) as f:
            stats = json.load(f)
        want = set(buckets)
        tables = [
            (s["shard"], s["bucket"], pq.read_table(s["path"]))
            for s in segment_paths(os.path.join(out_dir, "index"))
            if s["bucket"] in want
        ]
        # global stats ride along so avgdl (a corpus constant) is the
        # same on every member; idf comes from the coordinator instead
        self.index = LocalIndex(tables=tables, stats=stats)

    def df(self, terms: list[str]) -> dict[str, int]:
        out = {}
        for t in terms:
            ref = self.index.lookup(t)
            if ref is not None:
                out[t] = ref.df
        return out

    def score(self, weights: dict[str, float], k: int):
        """Local exact top-k with coordinator-supplied per-term idf —
        the SAME accumulation kernel as ``topk_exact`` (shared helper,
        ascending term order), so federated == single-node is bit-
        exact by construction."""
        from .query import _score_weighted_terms

        terms = [
            (weights[t], ref)
            for t in sorted(weights)
            if (ref := self.index.lookup(t)) is not None
        ]
        return _score_weighted_terms(self.index, terms, k)


class FederatedSearch:
    """Coordinator over doc-range member actors (exact global idf)."""

    def __init__(self, out_dir: str, n_members: int = 2):
        with open(os.path.join(out_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.members = [
            _Member.remote(out_dir, bl)
            for bl in member_bucket_plan(out_dir, n_members)
        ]

    def topk(self, query: str, k: int = 10):
        terms = sorted(set(tokenize(query)))
        if not terms:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # phase 1: O(terms) integers per member → global df
        dfs = ray.get([m.df.remote(terms) for m in self.members])
        df_g: dict[str, int] = {}
        for d in dfs:
            for t, v in d.items():
                df_g[t] = df_g.get(t, 0) + v
        weights = {
            t: float(_idf(int(self.stats["n_docs"]), df))
            for t, df in df_g.items()
        }
        if not weights:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # phase 2: scatter identical weights, gather disjoint top-k
        parts = ray.get([m.score.remote(weights, k) for m in self.members])
        docs = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        return _rank_topk(docs, scores, k)

    def shutdown(self) -> None:
        """Release the member actors (and their CPU slots) — callers
        that keep running Dataset work after serving should call this
        so the pool doesn't hold scheduler capacity."""
        for m in self.members:
            ray.kill(m)
        self.members = []
