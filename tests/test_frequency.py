"""Unit pins for stages/frequency (heavy hitters) and the BPE-ish
subword counter; oracle parity lives in test_catalog.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from goobi_viewer_indexer_ray.stages import text_ops
from goobi_viewer_indexer_ray.stages.frequency import frequent_terms


def _tbl(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_subword_rule():
    t = text_ops.subword_count_batch(
        _tbl(["abcd", "abcde", "a b!  c?", "", "ABCDEFGH-ij"])
    )
    # abcd→1 chunk; abcde→2 (abcd|e); "a b!  c?"→3 alnum + 2 punct;
    # ""→0; ABCDEFGH-ij → 2 chunks + 1 punct + 1 chunk
    assert t.column("n_subwords").to_pylist() == [1, 2, 5, 0, 4]


def test_frequent_terms_exact_threshold(ray_session):
    import ray

    # skewed corpus: 'hot' ≈ 50%, 'warm' ≈ 10%, tail of rare terms.
    rng = np.random.default_rng(11)
    texts = []
    for i in range(300):
        toks = (
            ["hot"] * 10 + ["warm"] * 2 + [f"rare{rng.integers(0, 2000)}" for _ in range(8)]
        )
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    ds = ray.data.from_arrow(_tbl(texts)).repartition(6)
    out = frequent_terms(ds, sigma_bp=500)  # ≥5%
    total = 20 * 300
    # exact contract: terms with cf*10000 >= 500*total, nothing else
    assert set(out["term"]) == {"hot", "warm"}
    assert out.set_index("term")["cf"]["hot"] == 3000
    assert out.set_index("term")["cf"]["warm"] == 600
    assert (out["cf"].to_numpy() * 10_000 >= 500 * total).all()


def test_frequent_terms_no_hitters(ray_session):
    import ray

    ds = ray.data.from_arrow(_tbl(["a b c d e f g h", "i j k l m n o p"]))
    out = frequent_terms(ds, sigma_bp=9000)  # nothing reaches 90%
    assert len(out) == 0


def test_frequent_terms_empty_corpus(ray_session):
    import ray

    ds = ray.data.from_arrow(_tbl(["", ""]))
    out = frequent_terms(ds, sigma_bp=100)
    assert len(out) == 0


def test_kmv_modes_identical_and_exact_below_k(ray_session):
    import ray.data

    from goobi_viewer_indexer_ray.stages.frequency import kmv_distinct_bigrams

    t = pa.table(
        {
            "text": pa.array(
                ["the quick brown fox " * 5, "jumps over the lazy dog", "the quick fox"]
                * 10,
                pa.string(),
            ),
            "source": pa.array((["a"] * 2 + ["b"]) * 10, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    full = (
        kmv_distinct_bigrams(ds, k=4, with_exact=True)
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    prod = (
        kmv_distinct_bigrams(ds, k=4, with_exact=False)
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    # production bottom-k truncation never changes the estimate
    assert full["kmv_est"].tolist() == prod["kmv_est"].tolist()
    assert "n_exact" not in prod.columns
    # source b has 2 distinct bigrams < k=4 -> sketch is exact
    b = full[full["source"] == "b"].iloc[0]
    assert b["kmv_est"] == b["n_exact"] == 2


def test_hll_registers_match_bruteforce(ray_session):
    import ray.data

    from goobi_viewer_indexer_ray.functions.hashing import md5_hash64_array
    from goobi_viewer_indexer_ray.functions.tokenize import TOKEN_RE
    from goobi_viewer_indexer_ray.stages.frequency import hll_registers_bigrams

    texts = (
        ["the quick brown fox " * 5, "jumps over the lazy dog", "the quick fox"]
        * 10
    )
    srcs = (["a"] * 2 + ["b"]) * 10
    t = pa.table(
        {"text": pa.array(texts, pa.string()), "source": pa.array(srcs, pa.string())}
    )
    p = 4
    out = (
        hll_registers_bigrams(ray.data.from_arrow(t).repartition(5), p=p)
        .to_pandas()
        .sort_values(["source", "bucket"])
        .reset_index(drop=True)
    )

    # brute-force replay: distinct (source, bigram) -> bucket/rho -> max
    want: dict[tuple[str, int], int] = {}
    pairs = set()
    for s, txt in zip(srcs, texts):
        toks = TOKEN_RE.findall(txt.lower())
        for a, b in zip(toks, toks[1:]):
            pairs.add((s, a + " " + b))
    for s, bg in pairs:
        hv = int(md5_hash64_array([bg])[0])
        bucket = hv >> (64 - p)
        rem = hv & ((1 << (64 - p)) - 1)
        rho = (64 - p + 1) - rem.bit_length()
        k = (s, bucket)
        want[k] = max(want.get(k, 0), rho)
    got = {
        (r.source, int(r.bucket)): int(r.max_rho) for r in out.itertuples()
    }
    assert got == want
    # registers only for buckets actually hit; rho within [1, 64-p+1]
    assert out["max_rho"].between(1, 64 - p + 1).all()


def test_cms_never_underestimates_and_exact_when_sparse(ray_session):
    """CMS property pins: est >= true count always; with a vocabulary
    far smaller than d*w cells and a single batch, the top terms'
    estimates still bound their exact counts, and partitioning the
    input never changes the merged sketch output (counter matrices are
    entrywise-addable)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.frequency import cms_heavy_hitters

    rng = np.random.default_rng(7)
    texts = [
        " ".join(rng.choice(["aa", "bb", "cc", "dd", "ee"],
                            p=[0.5, 0.2, 0.15, 0.1, 0.05], size=40))
        for _ in range(30)
    ]
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    one = cms_heavy_hitters(rd.from_arrow(tbl), top=5).to_pandas()
    many = cms_heavy_hitters(rd.from_arrow(tbl).repartition(4), top=5).to_pandas()
    assert one.equals(many)
    assert (one.cms_est >= one.cf).all()
    # exact counts recomputed independently
    from collections import Counter
    cnt = Counter(w for t in texts for w in t.split())
    for _, r in one.iterrows():
        assert cnt[r.term] == r.cf


def test_ks_drift_matches_scipy_style_reference(ray_session):
    """ks_num/denominator equals the classic two-sample KS statistic
    computed directly on the raw samples; identical distributions give
    0, disjoint ones approach 1."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.frequency import ks_drift

    rng = np.random.default_rng(3)
    a = rng.integers(0, 30, size=200)          # src "a": uniform 0..29
    b = rng.integers(20, 60, size=100)         # src "b": shifted
    tbl = pa.table(
        {
            "source": pa.array(["a"] * a.size + ["b"] * b.size, pa.string()),
            "n_chars": pa.array(np.r_[a, b], pa.int64()),
        }
    )
    out = ks_drift(rd.from_arrow(tbl).repartition(3)).to_pandas()
    out = out.set_index("source")
    allv = np.r_[a, b]
    n = allv.size
    for name, s in (("a", a), ("b", b)):
        d_ref = max(
            abs(int((s <= v).sum()) * n - int((allv <= v).sum()) * s.size)
            for v in np.unique(allv)
        )
        assert int(out.loc[name, "ks_num"]) == d_ref
        assert int(out.loc[name, "n_docs"]) == s.size
        assert int(out.loc[name, "ks_bp"]) == 10000 * d_ref // (n * s.size)
    # the shifted source must show real drift
    assert out.loc["b", "ks_bp"] > 2000
