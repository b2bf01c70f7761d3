"""BM25 top-k query engine over the compressed term-sharded index.

The query-side counterpart of the work the reference delegates to
Solr/Lucene (SURVEY.md §2.3 ST5, §2.7 O5): a stateful actor-pool stage
— each actor loads the compressed index once in ``__init__`` and scores
query batches in ``__call__`` (``ds.map_batches(SearchEngine,
concurrency=N)``).

Two scorers, both producing EXACT float64 scores per the spec in
``functions/scoring.py`` (rank-identity contract):

- :func:`topk_exact` — vectorized term-at-a-time over fully decoded
  postings; the correctness reference.
- :func:`topk_wand` — **block-max interval-sweep pruning** (a BMW
  variant suited to vectorized execution): the elementary intervals
  induced by all block boundaries partition doc-id space; for each
  interval the sum of covering blocks' ``idf·max_impact`` is an
  admissible upper bound on any doc's score inside it.  Intervals are
  processed in descending bound order, so once the bound falls below
  the current top-k threshold θ every remaining interval is pruned and
  the sweep stops.  Surviving intervals decode only their covering
  blocks and score exactly.  Verified ``== topk_exact`` in tests.

Scale note: ``SearchEngine`` holds every shard of the index (fine at
single-node scale, and each actor mmaps compressed parquet).  At
10^12-doc scale the same actor class is deployed per *shard group*:
either document-partitioned replicas (each serving its doc range,
driver merges per-shard top-k — the classic search-serving layout), or
a two-phase gather (terms → posting fetch from term-sharded storage →
scoring actor).  The scoring core is identical; only the partitioning
assumption changes, and it is documented here per SURVEY.md's custom-
operator rule.
"""

from __future__ import annotations

import heapq
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import decode_block, decode_term
from ..functions.scoring import idf as idf_fn
from ..functions.scoring import impact
from ..functions.tokenize import tokenize
from ..stages.index_merge import shard_paths

__all__ = ["LocalIndex", "SearchEngine", "topk_exact", "topk_wand", "search"]

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
    ]
)


class LocalIndex:
    """In-memory term dictionary over compressed shard files."""

    def __init__(self, out_dir: str, shards: list[int] | None = None):
        self.out_dir = out_dir
        with open(os.path.join(out_dir, "stats.json")) as f:
            stats = json.load(f)
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"]) or 1.0
        self.terms: dict[str, dict] = {}
        index_dir = os.path.join(out_dir, "index")
        for path in shard_paths(index_dir):
            if shards is not None:
                sid = int(os.path.basename(os.path.dirname(path)).split("=")[1])
                if sid not in shards:
                    continue
            t = pq.read_table(path)
            for row in t.to_pylist():
                self.terms[row["term"]] = row

    def lookup(self, term: str) -> dict | None:
        return self.terms.get(term)


def _query_terms(index: LocalIndex, query: str) -> list[tuple[float, dict]]:
    """Distinct query terms present in the index, ascending unicode order
    (the spec's fixed association order), with their idf."""
    out = []
    for t in sorted(set(tokenize(query))):
        row = index.lookup(t)
        if row is not None:
            out.append((float(idf_fn(index.n_docs, row["df"])), row))
    return out


def _rank_topk(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def topk_exact(index: LocalIndex, query: str, k: int):
    """Exact term-at-a-time scoring (decodes all postings of all terms)."""
    terms = _query_terms(index, query)
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    doc_parts, contrib_parts = [], []
    for w, row in terms:  # ascending term order → spec association order
        docs, tfs, dls = decode_term(row["blocks"])
        doc_parts.append(docs)
        contrib_parts.append(w * impact(tfs, dls, index.avgdl))
    all_docs = np.concatenate(doc_parts)
    all_contrib = np.concatenate(contrib_parts)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(uniq.size, np.float64)
    np.add.at(scores, inv, all_contrib)
    return _rank_topk(uniq, scores, k)


def topk_wand(index: LocalIndex, query: str, k: int):
    """Block-max interval-sweep pruning; exact scores (== topk_exact)."""
    terms = _query_terms(index, query)
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    # flat block table over all query terms
    b_term, b_idx, b_first, b_max, b_ub = [], [], [], [], []
    for ti, (w, row) in enumerate(terms):
        for bi, blk in enumerate(row["blocks"]):
            b_term.append(ti)
            b_idx.append(bi)
            b_first.append(blk["first_doc"])
            b_max.append(blk["max_doc"])
            b_ub.append(w * float(blk["max_impact"]))
    b_term = np.array(b_term, np.int64)
    b_idx = np.array(b_idx, np.int64)
    b_first = np.array(b_first, np.int64)
    b_max = np.array(b_max, np.int64)
    b_ub = np.array(b_ub, np.float64)

    # elementary intervals from block boundaries; Σ ub per interval
    bounds = np.unique(np.concatenate([b_first, b_max + 1]))
    lo = bounds[:-1]  # interval i = [lo[i], bounds[i+1]-1]
    start_idx = np.searchsorted(bounds, b_first)
    end_idx = np.searchsorted(bounds, b_max + 1)
    delta = np.zeros(bounds.size, np.float64)
    np.add.at(delta, start_idx, b_ub)
    np.add.at(delta, end_idx, -b_ub)
    ub_per_interval = np.cumsum(delta)[:-1]

    order = np.argsort(-ub_per_interval, kind="stable")
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    decoded: dict[tuple[int, int], tuple] = {}
    cand_scores: dict[int, float] = {}

    for ii in order:
        ub = ub_per_interval[ii]
        if len(heap) >= k and ub < heap[0][0]:
            break  # descending order → everything else is pruned too
        ilo, ihi = int(lo[ii]), int(bounds[ii + 1]) - 1
        covering = np.flatnonzero((b_first <= ilo) & (b_max >= ilo))
        if covering.size == 0:
            continue
        doc_parts, contrib_parts = [], []
        for ci in covering:  # covering is ascending → term-ascending order
            key = (int(b_term[ci]), int(b_idx[ci]))
            if key not in decoded:
                decoded[key] = decode_block(terms[key[0]][1]["blocks"][key[1]])
            docs, tfs, dls = decoded[key]
            s = np.searchsorted(docs, ilo, "left")
            e = np.searchsorted(docs, ihi, "right")
            if s == e:
                continue
            w = terms[key[0]][0]
            doc_parts.append(docs[s:e])
            contrib_parts.append(w * impact(tfs[s:e], dls[s:e], index.avgdl))
        if not doc_parts:
            continue
        all_docs = np.concatenate(doc_parts)
        all_contrib = np.concatenate(contrib_parts)
        uniq, inv = np.unique(all_docs, return_inverse=True)
        scores = np.zeros(uniq.size, np.float64)
        np.add.at(scores, inv, all_contrib)
        for d, s in zip(uniq.tolist(), scores.tolist()):
            item = (s, -d)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)

    if not heap:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    items = sorted(heap, key=lambda x: (-x[0], -x[1]))
    doc_ids = np.array([-d for _, d in items], np.int64)
    scores = np.array([s for s, _ in items], np.float64)
    return doc_ids, scores


class SearchEngine:
    """Actor-pool query scorer: ``map_batches(SearchEngine, concurrency=N)``.

    Batch in: ``(query_id:int64, query:string, k:int32)``;
    batch out: ``(query_id, rank, doc_id, score)``.
    """

    def __init__(self, out_dir: str, use_wand: bool = True):
        self.index = LocalIndex(out_dir)
        self.scorer = topk_wand if use_wand else topk_exact

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        ks = batch.column("k").to_pylist() if "k" in batch.column_names else None
        for i, (qid, q) in enumerate(
            zip(batch.column("query_id").to_pylist(), batch.column("query").to_pylist())
        ):
            k = int(ks[i]) if ks else 10
            d, s = self.scorer(self.index, q, k)
            for r in range(len(d)):
                qids.append(qid)
                ranks.append(r + 1)
                docs.append(int(d[r]))
                scores.append(float(s[r]))
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def search(out_dir: str, queries, *, use_wand: bool = True, concurrency: int = 2):
    """Queries (Dataset or list of dicts) → results Dataset.

    ``queries`` rows: ``{query_id, query, k}``.
    """
    import ray.data

    ds = queries
    if not hasattr(ds, "map_batches"):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([int(q["query_id"]) for q in queries], pa.int64()),
                    "query": pa.array([q["query"] for q in queries], pa.string()),
                    "k": pa.array([int(q.get("k", 10)) for q in queries], pa.int32()),
                }
            )
        )
    return ds.map_batches(
        SearchEngine,
        fn_constructor_kwargs={"out_dir": out_dir, "use_wand": use_wand},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        num_cpus=1,
    )
