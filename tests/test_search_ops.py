"""Unit tests for pipelines/search_ops (the Solr-surface analogs).

The end-to-end oracle comparison lives in test_catalog.py
(search_boolean / search_prefix / search_fuzzy / search_facets); these
pin the set-algebra and closed-form-edit-distance semantics directly.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from goobi_viewer_indexer_ray.pipelines import search_ops as so


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class _FakeRef:
    def __init__(self, df, docs):
        self.df = df
        self.cf = df
        self._docs = np.asarray(docs, np.int64)

    def decode_all(self):
        return self._docs, None, None


class _FakeIndex:
    def __init__(self, postings: dict[str, list[int]]):
        self._lookup = {
            t: _FakeRef(len(d), sorted(d)) for t, d in postings.items()
        }

    def lookup(self, term):
        return self._lookup.get(term)


@pytest.fixture()
def fake():
    return _FakeIndex(
        {
            "hash": [1, 2, 3, 5],
            "join": [2, 3, 4],
            "slow": [3, 9],
            "spark": [7],
            "stream": [7, 8],
        }
    )


def test_boolean_must_intersects(fake):
    assert so.boolean_docs(fake, must=["hash join"]).tolist() == [2, 3]


def test_boolean_must_not_subtracts(fake):
    assert so.boolean_docs(fake, must=["hash"], must_not=["slow"]).tolist() == [1, 2, 5]


def test_boolean_should_unions(fake):
    assert so.boolean_docs(fake, should=["spark", "stream"]).tolist() == [7, 8]


def test_boolean_should_ignored_with_must(fake):
    # Lucene semantics: SHOULD is optional when a MUST exists
    got = so.boolean_docs(fake, must=["join"], should=["spark"])
    assert got.tolist() == [2, 3, 4]


def test_boolean_absent_term_and_empty(fake):
    assert so.boolean_docs(fake, must=["hash", "zzz"]).size == 0
    assert so.boolean_docs(fake).size == 0
    assert so.boolean_docs(fake, must_not=["hash"]).size == 0


def test_boolean_analyzes_query_text(fake):
    # tokenizer runs on the clause strings: case + punctuation fold away
    assert so.boolean_docs(fake, must=["Hash-JOIN!"]).tolist() == [2, 3]


def test_prefix_stats_counts(fake):
    s = so.prefix_stats(fake, "s")
    # slow, spark, stream
    assert s["n_terms"] == 3
    assert s["df_sum"] == 2 + 1 + 2
    assert s["n_docs"] == len({3, 9, 7, 8})
    assert so.prefix_stats(fake, "zz") == {
        "n_terms": 0, "df_sum": 0, "cf_sum": 0, "n_docs": 0
    }


def test_fuzzy_exact_and_one_edit(fake):
    got = dict(so.fuzzy_terms(fake, "strem"))
    assert got == {"stream": 2}
    assert dict(so.fuzzy_terms(fake, "hash")) == {"hash": 4}
    assert so.fuzzy_terms(fake, "zzzzzz") == []


def test_phrase_docs_adjacency(ray_session):
    """Exact adjacency, doc-boundary safety, multi-occurrence counts,
    single-term phrases, absent terms."""
    import pyarrow as pa
    import ray

    corpus = {
        10: "alpha beta gamma alpha beta",   # "alpha beta" ×2
        11: "beta alpha",                    # reversed — no match
        12: "alpha",                         # ends with alpha; next doc starts beta
        13: "beta alpha beta gamma",         # "alpha beta" ×1, "beta gamma" ×1
        14: "gamma gamma gamma",             # "gamma gamma" ×2 (overlapping)
    }
    postings: dict[str, set[int]] = {}
    for d, text in corpus.items():
        for t in text.split():
            postings.setdefault(t, set()).add(d)
    idx = _FakeIndex({t: sorted(d) for t, d in postings.items()})
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(corpus), pa.int64()),
                "text": pa.array(list(corpus.values()), pa.string()),
            }
        )
    )
    out = so.phrase_docs(
        idx, ds, ["alpha beta", "beta gamma", "gamma gamma", "alpha", "zzz beta"]
    ).to_pandas()
    got = {
        (int(r.query_id), int(r.doc_id)): int(r.n_matches)
        for r in out.itertuples()
    }
    assert got == {
        (0, 10): 2, (0, 13): 1,
        (1, 10): 1, (1, 13): 1,
        (2, 14): 2,
        (3, 10): 2, (3, 11): 1, (3, 12): 1, (3, 13): 1,
    }


def test_kwic_snippets_windows(ray_session):
    import pyarrow as pa
    import ray

    corpus = {
        1: "alpha beta gamma delta epsilon",  # mid-window
        2: "gamma starts here",               # hit at doc start
        3: "it ends with gamma",              # hit at doc end
        4: "no match here",
        5: "gamma early gamma late",          # first occurrence only
    }
    postings: dict[str, set[int]] = {}
    for d, text in corpus.items():
        for t in text.split():
            postings.setdefault(t, set()).add(d)
    idx = _FakeIndex({t: sorted(d) for t, d in postings.items()})
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(corpus), pa.int64()),
                "text": pa.array(list(corpus.values()), pa.string()),
            }
        )
    )
    out = so.kwic_snippets(ds, ["gamma"], width=2, index=idx).to_pandas()
    got = {int(r.doc_id): (int(r.pos), r.snippet) for r in out.itertuples()}
    assert got == {
        1: (3, "alpha beta gamma delta epsilon"),
        2: (1, "gamma starts here"),
        3: (4, "ends with gamma"),
        5: (1, "gamma early gamma"),
    }


def test_wildcard_terms(fake):
    assert [t for t, _ in so.wildcard_terms(fake, "s*")] == ["slow", "spark", "stream"]
    assert [t for t, _ in so.wildcard_terms(fake, "s?a*")] == ["spark"]
    assert [t for t, _ in so.wildcard_terms(fake, "????")] == ["hash", "join", "slow"]
    assert so.wildcard_terms(fake, "z*") == []
    # literal chars must be escaped, not treated as regex
    assert so.wildcard_terms(fake, "h.sh") == []


def test_term_cooccurrence(fake):
    rows = so.term_cooccurrence(fake, ["hash", "join", "slow"])
    got = {(a, b): (da, db, c) for a, b, da, db, c in rows}
    assert got == {
        ("hash", "join"): (4, 3, 2),   # docs {2,3}
        ("hash", "slow"): (4, 2, 1),   # doc {3}
        ("join", "slow"): (3, 2, 1),   # doc {3}
    }


def test_spellcheck_matches_brute_force_levenshtein():
    rng = random.Random(11)
    alpha = "abcd"
    vocab = sorted({"".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
                    for _ in range(300)})
    idx = _FakeIndex({t: list(range(i + 1)) for i, t in enumerate(vocab)})
    for q in ["abc", "dd", "abcdef", "zzz", "a"]:
        got = so.spellcheck_terms(idx, q, max_edits=2, top_n=1000)
        want = sorted(
            ((t, _lev(t, q), idx.lookup(t).df) for t in vocab if _lev(t, q) <= 2),
            key=lambda r: (r[1], -r[2], r[0]),
        )
        assert got == want, q


def test_spellcheck_ranking_and_topn(fake):
    # 'stream' df=2 at dist 2 of 'strem'... ranking: dist asc, df desc, term
    got = so.spellcheck_terms(fake, "strem", max_edits=2, top_n=2)
    assert got[0][0] == "stream" and got[0][1] == 1
    assert all(d <= 2 for _, d, _ in got)
    assert so.spellcheck_terms(fake, "zzzzzzzz") == []


def _docs_ds(rows):
    import ray.data

    import pyarrow as pa

    return ray.data.from_arrow(pa.table(rows)).repartition(3)


def test_stats_over(fake, ray_session):
    ds = _docs_ds({"doc_id": [1, 2, 3, 4, 5, 9],
                   "n_chars": [10, 20, 30, 40, 50, 90]})
    s = so.stats_over(fake, ds, must=["hash"], value_col="n_chars")
    assert s == {"n_docs": 4, "sum_v": 110, "min_v": 10, "max_v": 50,
                 "mean_v": 27.5}
    s0 = so.stats_over(fake, ds, must=["zzznope"], value_col="n_chars")
    assert s0["n_docs"] == 0 and s0["min_v"] is None


def test_collapse_top1(fake, ray_session):
    ds = _docs_ds({"doc_id": [1, 2, 3, 4, 5],
                   "lang": ["en", "de", "en", "de", "en"]})
    out = {r["lang"]: (r["head_doc"], r["n_in_group"])
           for r in so.collapse_top1(fake, ds, must=["hash"],
                                     group_col="lang").take_all()}
    assert out == {"en": (1, 3), "de": (2, 1)}


def test_range_facets(fake, ray_session):
    ds = _docs_ds({"doc_id": [1, 2, 3, 5, 9],
                   "n_chars": [5, 64, 65, 200, 300]})
    out = {r["bucket_lo"]: r["n_docs"]
           for r in so.range_facets(fake, ds, must=["hash"], value_col="n_chars",
                                    bucket_width=64).take_all()}
    assert out == {0: 1, 64: 2, 192: 1}


def test_more_like_this(fake, ray_session):
    # seed doc 3's text: terms hash, join, slow (tf 2/1/1)
    ds = _docs_ds({"doc_id": [1, 3, 7],
                   "text": ["hash", "hash hash join slow", "spark"]})
    out = so.more_like_this(fake, ds, seed_doc=3, top_terms=3, min_overlap=2)
    got = {d: o for d, o in zip(out.column("doc_id").to_pylist(),
                                out.column("overlap").to_pylist())}
    # interesting = {hash, join, slow}; doc2 has hash+join, doc9 slow only
    assert got == {2: 2}
    with pytest.raises(KeyError):
        so.more_like_this(fake, ds, seed_doc=42)


def test_fuzzy_matches_brute_force_levenshtein():
    rng = random.Random(7)
    alpha = "abcd"
    vocab = sorted(
        {"".join(rng.choice(alpha) for _ in range(rng.randint(1, 6))) for _ in range(600)}
    )
    idx = _FakeIndex({t: [i] for i, t in enumerate(vocab)})
    for q in ["a", "ab", "abca", "dcba", "abcdab", "bbbb", "xyz"]:
        got = [t for t, _ in so.fuzzy_terms(idx, q)]
        want = sorted(t for t in vocab if _lev(t, q) <= 1)
        assert got == want, q


def test_parse_querystring_grammar():
    """Classic-parser grammar: precedence NOT > AND > OR, implicit OR,
    nested parens, quoted phrases, '-' prefix."""
    from goobi_viewer_indexer_ray.pipelines.search_ops import parse_querystring as p

    assert p("a AND b OR c") == ("or", [("and", [("term", "a"), ("term", "b")]),
                                        ("term", "c")])
    assert p("a b") == ("or", [("term", "a"), ("term", "b")])
    assert p("-a") == ("not", ("term", "a"))
    assert p("NOT (a OR b)") == ("not", ("or", [("term", "a"), ("term", "b")]))
    assert p('"x y" AND z') == ("and", [("phrase", "x y"), ("term", "z")])
    assert p("((a))") == ("term", "a")


def test_parse_querystring_truncated_raises_valueerror():
    """Round-4 ADVICE: truncated/malformed query strings raise the
    module's documented ValueError, not an internal IndexError."""
    import pytest

    from goobi_viewer_indexer_ray.pipelines.search_ops import parse_querystring

    for bad in ("foo AND", "(", "NOT", "-", "a OR (b AND"):
        with pytest.raises(ValueError, match="unexpected end of query"):
            parse_querystring(bad)
    # well-formed queries still parse
    assert parse_querystring('a AND (b OR "c d")') == (
        "and", [("term", "a"), ("or", [("term", "b"), ("phrase", "c d")])])
