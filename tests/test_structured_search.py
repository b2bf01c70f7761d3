"""StructuredSearchEngine actor stage: mixed-kind batches must equal
the driver-side operator results."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from goobi_viewer_indexer_ray.pipelines import search_ops as so
from goobi_viewer_indexer_ray.pipelines.search_ops import parse_structured

def test_parse_structured():
    assert parse_structured("boolean", "a -b |c d") == {
        "must": ["a", "d"], "should": ["c"], "must_not": ["b"]
    }
    assert parse_structured("near", "a b ~3") == {"a": "a", "b": "b", "window": 3}
    assert parse_structured("near", "a b") == {"a": "a", "b": "b", "window": 1}
    with pytest.raises(ValueError):
        parse_structured("near", "a b c")
    with pytest.raises(ValueError):
        parse_structured("wat", "x")


def test_structured_engine_matches_driver_ops(ray_session, pos_index_dir):
    import ray

    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex, topk_exact

    queries = [
        {"query_id": 0, "kind": "boolean", "query": "alpha -gamma", "k": 10},
        {"query_id": 1, "kind": "phrase", "query": "alpha beta", "k": 10},
        {"query_id": 2, "kind": "near", "query": "beta alpha ~2", "k": 10},
        {"query_id": 3, "kind": "bm25", "query": "gamma", "k": 3},
        {"query_id": 4, "kind": "boolean", "query": "|solo |gamma", "k": 10},
    ]
    got = so.structured_search(pos_index_dir, queries, concurrency=2).to_pandas()
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)

    idx = LocalIndex(pos_index_dir)
    # q0: docs with alpha, without gamma
    q0 = got[got.query_id == 0]
    assert q0.doc_id.tolist() == so.boolean_docs(
        idx, must=["alpha"], must_not=["gamma"]
    ).tolist()
    # q1: phrase counts as scores, doc asc within equal counts
    q1 = got[got.query_id == 1]
    ph = so.phrase_docs_positional(idx, ["alpha beta"]).to_pandas()
    want = ph.sort_values(["n_matches", "doc_id"], ascending=[False, True])
    assert q1.doc_id.tolist() == want.doc_id.tolist()
    assert q1.score.tolist() == [float(x) for x in want.n_matches]
    # q2: near counts
    q2 = got[got.query_id == 2]
    pr = so.proximity_docs(idx, [("beta", "alpha", 2)]).to_pandas()
    assert set(q2.doc_id) == set(pr.doc_id)
    # q3: bm25 path identical to topk_exact
    q3 = got[got.query_id == 3]
    d, s = topk_exact(idx, "gamma", 3)
    assert q3.doc_id.tolist() == d.tolist()
    assert np.allclose(q3.score.to_numpy(), s)
    # q4: pure SHOULD union
    q4 = got[got.query_id == 4]
    assert q4.doc_id.tolist() == so.boolean_docs(
        idx, should=["solo", "gamma"]
    ).tolist()


def test_structured_engine_positions_required(tiny_build):
    eng = so.StructuredSearchEngine(tiny_build)
    term = sorted(eng.index._lookup)[0]  # a term that exists in the index
    batch = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "kind": pa.array(["phrase"], pa.string()),
            "query": pa.array([term], pa.string()),
            "k": pa.array([5], pa.int32()),
        }
    )
    with pytest.raises(ValueError, match="without positions"):
        eng(batch)
