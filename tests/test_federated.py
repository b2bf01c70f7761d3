"""Federated doc-partitioned search (pipelines/federated.py): the
two-phase global-idf protocol must be bit-identical to single-node
scoring — the property stock per-shard-idf distributed search lacks."""

from __future__ import annotations

import pytest

from tests.conftest import NUM_PARTS, NUM_SHARDS


@pytest.fixture(scope="module")
def fed_build(ray_session, tiny_paths, tmp_path_factory):
    from goobi_viewer_indexer_ray.pipelines.build import build_all

    out = str(tmp_path_factory.mktemp("fed") / "out")
    build_all(tiny_paths, out, num_parts=NUM_PARTS, num_shards=NUM_SHARDS,
              num_range_buckets=4)
    return out


def test_federated_equals_single_node(fed_build):
    from goobi_viewer_indexer_ray.pipelines.federated import FederatedSearch
    from goobi_viewer_indexer_ray.pipelines.oracle import REFERENCE_QUERIES
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex, topk_exact

    full = LocalIndex(fed_build)
    for n_members in (2, 4):
        fed = FederatedSearch(fed_build, n_members=n_members)
        for q in REFERENCE_QUERIES:
            d_f, s_f = fed.topk(q["query"], q["k"])
            d_e, s_e = topk_exact(full, q["query"], q["k"])
            assert d_f.tolist() == d_e.tolist(), (n_members, q["query"])
            assert s_f.tolist() == s_e.tolist(), (n_members, q["query"])
        d0, s0 = fed.topk("zzznosuchterm", 5)
        assert d0.size == 0 and s0.size == 0


def test_exchange_is_not_vacuous(fed_build, ray_session):
    """Local member df must actually differ from the global df for at
    least one reference-query term — otherwise the test above would
    pass even with (wrong) per-member idf."""
    import ray

    from goobi_viewer_indexer_ray.pipelines.federated import (
        FederatedSearch, member_bucket_plan,
    )
    from goobi_viewer_indexer_ray.pipelines.oracle import REFERENCE_QUERIES
    from goobi_viewer_indexer_ray.functions.tokenize import tokenize

    assert len(member_bucket_plan(fed_build, 2)) == 2
    fed = FederatedSearch(fed_build, n_members=2)
    terms = sorted({t for q in REFERENCE_QUERIES for t in tokenize(q["query"])})
    dfs = ray.get([m.df.remote(terms) for m in fed.members])
    glob = {}
    for d in dfs:
        for t, v in d.items():
            glob[t] = glob.get(t, 0) + v
    assert any(d.get(t, 0) != glob[t] for d in dfs for t in glob)


def test_member_plan_is_balanced():
    import numpy as np

    from goobi_viewer_indexer_ray.pipelines import federated

    # 6 buckets / 4 members must give 4 contiguous groups, sizes 2/2/1/1
    orig = federated.segment_paths
    try:
        federated.segment_paths = lambda _d: [{"bucket": b} for b in range(6)]
        plan = federated.member_bucket_plan("/nonexistent", 4)
    finally:
        federated.segment_paths = orig
    assert len(plan) == 4
    assert [len(p) for p in plan] == [2, 2, 1, 1]
    assert [b for p in plan for b in p] == list(range(6))
