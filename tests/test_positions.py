"""Positional index: positions payload round-trip + positional phrase
algebra vs the scan-verify path and vs raw tokenization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from goobi_viewer_indexer_ray.functions.tokenize import tokenize


from tests.conftest import POS_TEXTS as TEXTS


@pytest.fixture(scope="module")
def pos_index(pos_index_dir):
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex

    return LocalIndex(pos_index_dir)


def test_positions_roundtrip(pos_index):
    """positions_all() must reproduce tokenize() exactly, per doc."""
    want: dict[str, dict[int, list[int]]] = {}
    for d, text in TEXTS.items():
        for p, t in enumerate(tokenize(text)):
            want.setdefault(t, {}).setdefault(d, []).append(p)
    for term, by_doc in want.items():
        ref = pos_index.lookup(term)
        assert ref is not None, term
        docs, tfs, pos, offs = ref.positions_all()
        got = {
            int(docs[i]): pos[offs[i] : offs[i] + tfs[i]].tolist()
            for i in range(docs.size)
        }
        assert got == by_doc, term


def test_phrase_positional_matches_scan(ray_session, pos_index):
    import ray

    from goobi_viewer_indexer_ray.pipelines import search_ops as so

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(TEXTS), pa.int64()),
                "text": pa.array(list(TEXTS.values()), pa.string()),
            }
        )
    )
    phrases = ["alpha beta", "beta alpha", "gamma gamma", "alpha beta alpha",
               "solo", "alpha zzz"]
    a = so.phrase_docs_positional(pos_index, phrases).to_pandas()
    b = so.phrase_docs(pos_index, ds, phrases).to_pandas()
    assert a.equals(b)
    got = {(int(r.query_id), int(r.doc_id)): int(r.n_matches) for r in a.itertuples()}
    assert got == {
        (0, 100): 2, (0, 103): 3,
        (1, 101): 1, (1, 103): 2,
        (2, 102): 2,
        (3, 103): 2,
        (4, 104): 1,
    }


def test_proximity_pairs(pos_index):
    from goobi_viewer_indexer_ray.pipelines import search_ops as so

    out = so.proximity_docs(
        pos_index,
        [
            ("alpha", "beta", 1),   # ≡ adjacency
            ("alpha", "gamma", 2),  # gap-2 allowed
            ("beta", "alpha", 2),   # reversed direction
            ("alpha", "beta", 0),   # degenerate window → no rows
        ],
    ).to_pandas()
    got = {(int(r.query_id), int(r.doc_id)): int(r.n_matches) for r in out.itertuples()}
    # TEXTS: 100 "alpha beta gamma alpha beta": a@[0,3] b@[1,4] g@[2]
    #   (a,b,1): (0,1),(3,4) → 2 ; (a,g,2): (0,2) → 1
    #   (b,a,2): (1,3) → 1
    # 101 "beta alpha": (b,a,2): (0,1) → 1
    # 103 "alpha beta alpha beta alpha beta": a@[0,2,4] b@[1,3,5]
    #   (a,b,1): 3 ; (b,a,2): (1,2),(3,4) → 2
    assert got == {
        (0, 100): 2, (0, 103): 3,
        (1, 100): 1,
        (2, 100): 1, (2, 101): 1, (2, 103): 2,
    }


def test_positions_absent_raises(tiny_build):
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex

    idx = LocalIndex(tiny_build)  # default build: no positions payload
    ref = next(iter(idx._lookup.values()))
    with pytest.raises(ValueError, match="without positions"):
        ref.positions_all()


def test_positional_kernels_survive_huge_doc_ids(ray_session, tmp_path):
    """The engine's strided doc ids (part·2³⁶ + rank) exceed 2³²; the
    positional kernels pack per-query RANKS, not raw ids, so phrase and
    proximity results must be exact in that regime (a raw ``doc << 32``
    packing would wrap and collide)."""
    import ray

    from goobi_viewer_indexer_ray.pipelines import search_ops as so
    from goobi_viewer_indexer_ray.pipelines.build import build_text_index
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex

    big = 1 << 36  # one part stride
    texts = {
        big + 0: "alpha beta gamma",
        big + 1: "alpha beta",
        2 * big + 5: "beta alpha beta",  # same low 32 bits regime
        3: "alpha beta alpha beta",      # small id mixed in
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        )
    )
    out = str(tmp_path / "hugeidx")
    build_text_index(ds, out, "fp-huge", num_shards=1, bucket_size=4,
                     with_positions=True)
    idx = LocalIndex(out)

    ph = so.phrase_docs_positional(idx, ["alpha beta"]).to_pandas()
    got = {int(r.doc_id): int(r.n_matches) for r in ph.itertuples()}
    assert got == {big + 0: 1, big + 1: 1, 2 * big + 5: 1, 3: 2}

    pr = so.proximity_docs(idx, [("beta", "alpha", 1)]).to_pandas()
    got = {int(r.doc_id): int(r.n_matches) for r in pr.itertuples()}
    assert got == {2 * big + 5: 1, 3: 1}


def test_passage_topk_brute(pos_index):
    """passage_topk vs a per-doc brute force over POS_TEXTS: window
    counts, earliest-window tie rule, and the top-k cut, at several
    widths (width=1 degenerates to tf of the best single position)."""
    import pandas as pd

    from goobi_viewer_indexer_ray.pipelines import search_ops as so

    queries = [(0, "alpha beta"), (1, "gamma"), (2, "zzz"), (3, "solo alpha")]
    for width in (1, 2, 3, 5):
        got = so.passage_topk(pos_index, queries, width=width, k=3).to_pandas()
        rows = []
        for qid, q in queries:
            terms = set(tokenize(q))
            per_doc = []
            for d, text in TEXTS.items():
                occ = [p for p, t in enumerate(tokenize(text)) if t in terms]
                if not occ:
                    continue
                hits, neg_p = max(
                    (sum(1 for o in occ if p <= o < p + width), -p) for p in occ
                )
                per_doc.append((d, -neg_p, hits))
            per_doc.sort(key=lambda r: (-r[2], r[0]))
            for rank, (d, start, hits) in enumerate(per_doc[:3], 1):
                rows.append((qid, d, start, hits, rank))
        want = pd.DataFrame(
            rows, columns=["query_id", "doc_id", "best_start", "n_hits", "rank"]
        ).astype("int64")
        assert got.reset_index(drop=True).equals(want), f"width={width}"


def test_gap_phrase_exact_slots(pos_index):
    """'a * b' exact-gap semantics on the hand-built corpus (see
    TEXTS comments above): gap=1 means EXACTLY one token between."""
    from goobi_viewer_indexer_ray.pipelines import search_ops as so

    out = so.gap_phrase_docs(
        pos_index,
        [
            ("alpha", 0, "beta"),    # adjacency: same as phrase
            ("alpha", 1, "alpha"),   # one-slot self-gap
            ("alpha", 1, "gamma"),   # a _ g: beta fills the slot in 100
            ("alpha", 2, "beta"),    # a _ _ b
            ("alpha", 0, "zzznope"),
        ],
    ).to_pandas()
    got = {(int(r.query_id), int(r.doc_id)): int(r.n_matches)
           for r in out.itertuples()}
    # doc 100 "alpha beta gamma alpha beta": (a,0,b): (0,1),(3,4) -> 2
    #   (a,1,g): 0 -> 2 is gamma -> 1 ; (a,1,a): 0+2 gamma, no -> none
    #   (a,2,b): 0+3 alpha, 3+3 absent -> none
    # doc 103 "alpha beta alpha beta alpha beta": a@[0,2,4] b@[1,3,5]
    #   (a,0,b): 3 ; (a,1,a): 0->2, 2->4 -> 2 ; (a,2,b): 0->3, 2->5 -> 2
    assert got == {
        (0, 100): 2, (0, 103): 3,
        (1, 103): 2,
        (2, 100): 1,
        (3, 103): 2,
    }
