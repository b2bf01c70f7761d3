"""Query-engine rank-identity (the north-rule correctness gate).

Engine top-k must be rank-identical — doc_ids AND exact float64 scores
— to the pure-Python oracle, for the whole reference query set; the
block-max pruned scorer must equal the exhaustive scorer.
"""

import numpy as np
import pyarrow as pa
import pytest

from goobi_viewer_indexer_ray.pipelines.oracle import REFERENCE_QUERIES, oracle_topk


@pytest.fixture(scope="module")
def index(tiny_build):
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex

    return LocalIndex(tiny_build)


def test_rank_identical_to_oracle(index, tiny_oracle):
    from goobi_viewer_indexer_ray.pipelines.query import topk_exact

    for q in REFERENCE_QUERIES:
        want = oracle_topk(tiny_oracle, q["query"], q["k"])
        d, s = topk_exact(index, q["query"], q["k"])
        got = [(int(a), float(b)) for a, b in zip(d, s)]
        assert got == want, f"query {q['query_id']}: {q['query']!r}"


def test_wand_equals_exact(index):
    from goobi_viewer_indexer_ray.pipelines.query import topk_exact, topk_wand

    for q in REFERENCE_QUERIES:
        for k in (1, 3, 10, 100):
            d_e, s_e = topk_exact(index, q["query"], k)
            d_w, s_w = topk_wand(index, q["query"], k)
            assert d_e.tolist() == d_w.tolist(), (q, k)
            assert s_e.tolist() == s_w.tolist(), (q, k)


def test_absent_and_empty_queries(index):
    from goobi_viewer_indexer_ray.pipelines.query import topk_exact, topk_wand

    for scorer in (topk_exact, topk_wand):
        d, s = scorer(index, "zzzneverseen qqqabsent", 10)
        assert d.size == 0 and s.size == 0
        d, s = scorer(index, "", 10)
        assert d.size == 0


def test_tie_break_doc_id_asc(index):
    # ties (identical tf+dl docs) must order by doc_id ascending
    from goobi_viewer_indexer_ray.pipelines.query import topk_exact

    d, s = topk_exact(index, "baba", 200)
    for i in range(1, len(d)):
        assert (s[i] < s[i - 1]) or (s[i] == s[i - 1] and d[i] > d[i - 1])


def test_ray_search_stage(ray_session, tiny_build, tiny_oracle):
    """Actor-pool map_batches path returns the same results."""
    from goobi_viewer_indexer_ray.pipelines.query import search

    res = search(tiny_build, REFERENCE_QUERIES, concurrency=2).to_pandas()
    for q in REFERENCE_QUERIES:
        want = oracle_topk(tiny_oracle, q["query"], q["k"])
        sub = res[res["query_id"] == q["query_id"]].sort_values("rank")
        got = list(zip(sub["doc_id"], sub["score"]))
        assert [(int(a), float(b)) for a, b in got] == want
        assert sub["rank"].tolist() == list(range(1, len(want) + 1))


def test_wand_prunes(index):
    """The sweep must never decode more blocks than exist, and results
    stay correct while pruning (equality already covered above)."""
    from goobi_viewer_indexer_ray.pipelines.query import TermRef, topk_wand

    calls = {"n": 0}
    orig = TermRef.decode_blocks

    def counting(self, sel):
        calls["n"] += len(list(sel))
        return orig(self, sel)

    TermRef.decode_blocks = counting
    try:
        topk_wand(index, "baba beba", 1)
    finally:
        TermRef.decode_blocks = orig
    total_blocks = index.lookup("baba").n_blocks + index.lookup("beba").n_blocks
    assert 0 < calls["n"] <= total_blocks


def test_query_result_cache(ray_session, tiny_build):
    """queryResultCache parity: a repeated (query, k) is served from
    the per-actor LRU with results identical to the scored path; the
    LRU evicts oldest beyond capacity; cache off by default."""
    from goobi_viewer_indexer_ray.pipelines.query import SearchEngine

    eng = SearchEngine(tiny_build, result_cache_size=2)
    plain = SearchEngine(tiny_build)
    assert plain._rcache is None

    def one(e, q):
        t = pa.table(
            {
                "query_id": pa.array([0], pa.int64()),
                "query": pa.array([q], pa.string()),
                "k": pa.array([5], pa.int32()),
            }
        )
        return e(t).to_pandas()

    first = one(eng, "baba")
    assert eng.cache_stats() == {"hits": 0, "misses": 1, "entries": 1}
    again = one(eng, "baba")
    assert eng.cache_stats()["hits"] == 1
    assert first.equals(again)
    assert first.equals(one(plain, "baba"))
    # capacity 2: touching two more keys evicts the oldest
    one(eng, "beba")
    one(eng, "bibo")
    assert eng.cache_stats()["entries"] == 2
    one(eng, "baba")  # evicted -> miss again
    assert eng.cache_stats()["misses"] == 4


def test_search_service_shutdown_releases_actors(ray_session, tiny_build):
    from goobi_viewer_indexer_ray.pipelines.query import SearchService

    svc = SearchService(tiny_build, n_actors=2)
    res = svc.query_table([{"query_id": 0, "query": "baba", "k": 3}])
    assert res.num_rows > 0
    svc.shutdown()
    assert svc.actors == []


def test_maxscore_equals_exact(index):
    """MaxScore (essential/non-essential term split) must be
    bit-identical to the exhaustive scorer at every k — including k
    small enough that the suffix-ub stop actually fires."""
    from goobi_viewer_indexer_ray.pipelines.query import topk_exact, topk_maxscore

    for q in REFERENCE_QUERIES:
        for k in (1, 3, 10, 100):
            d_e, s_e = topk_exact(index, q["query"], k)
            d_m, s_m = topk_maxscore(index, q["query"], k)
            assert d_e.tolist() == d_m.tolist(), (q, k)
            assert s_e.tolist() == s_m.tolist(), (q, k)


def test_maxscore_absent_and_empty(index):
    from goobi_viewer_indexer_ray.pipelines.query import topk_maxscore

    d, s = topk_maxscore(index, "zzzneverseen qqqabsent", 10)
    assert d.size == 0 and s.size == 0
    d, s = topk_maxscore(index, "", 10)
    assert d.size == 0


def test_filtered_equals_exact_on_allowed_subset(index):
    """fq semantics: the filtered scorer returns exactly the exact
    scorer's ranking restricted to the allowed set, with the SAME
    (corpus-global) scores for surviving docs."""
    from goobi_viewer_indexer_ray.pipelines.query import (
        topk_exact,
        topk_exact_filtered,
    )

    d_all, s_all = topk_exact(index, "baba beba", 10_000)
    allowed = np.sort(d_all[::2])  # every other hit
    d_f, s_f = topk_exact_filtered(index, "baba beba", allowed, 10_000)
    keep = np.isin(d_all, allowed)
    want = sorted(zip(d_all[keep], s_all[keep]),
                  key=lambda t: (-t[1], t[0]))
    assert [(int(a), float(b)) for a, b in zip(d_f, s_f)] == [
        (int(a), float(b)) for a, b in want
    ]
    # empty allowed set -> no hits
    d0, s0 = topk_exact_filtered(index, "baba", np.empty(0, np.int64), 10)
    assert d0.size == 0
