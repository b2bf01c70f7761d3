"""Postings index structures over the documents table (skip layer).

The codec byte-exact roundtrips live in test_codec.py; this file pins
the structural entries built on top of the postings relation.
"""

def test_skip_entries_land_every_fourth_posting(ray_session):
    """Skip entries must be the 0th,4th,8th... postings of each
    qualifying term's doc-id-sorted list, with sub-threshold terms
    absent entirely."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from goobi_viewer_indexer_ray.pipelines.catalog import (
        _SKIP_EVERY,
        _SKIP_MIN_DF,
        q_postings_skips,
    )

    # build a corpus where term "hot" appears in 10 docs, "cold" in 3
    rows = []
    for i in range(10):
        rows.append((i, "hot filler" + (" cold" if i < 3 else "")))
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string())})
    import os, tempfile
    import pyarrow.parquet as pq
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    out = q_postings_skips(d).to_pandas()
    assert set(out.term) == {"hot", "filler"}  # df=10 each; "cold" df=3 < 8
    hot = out[out.term == "hot"].sort_values("skip_idx")
    assert list(hot.doc_id) == [0, 4, 8]
    assert list(hot.skip_idx) == [0, 1, 2]
    assert (hot.df == 10).all()


def test_head_dedup_flags_planted_template(ray_session):
    """Three docs sharing an 8-token intro flag as dup heads; a doc
    differing at token 8 does not; a tokenless doc gets df 0."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.pipelines.catalog import q_head_dedup

    intro = "one two three four five six seven eight"
    texts = [
        intro + " alpha beta",
        intro + " gamma",
        intro,
        "one two three four five six seven NINE tail",
        "???",  # tokenizes to nothing
    ]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    out = q_head_dedup(d).to_pandas().set_index("doc_id").sort_index()
    assert list(out.head_df) == [3, 3, 3, 1, 0]
    assert list(out.dup_head) == [1, 1, 1, 0, 0]


def test_tiered_topk_agreement_semantics(ray_session):
    """Tier-1 results must be a candidate-restricted BM25: every row's
    exact_rank is either 0 or the exhaustive rank of that doc, and for
    single-term queries whose df <= m the tiers agree perfectly."""
    from goobi_viewer_indexer_ray.pipelines.catalog import (
        documents_bm25_topk,
        q_search_tiered_topk,
    )

    SF = "/root/testdata/sf0.001"
    t1 = q_search_tiered_topk(SF).to_pandas()
    full = documents_bm25_topk(SF).to_pandas()
    fx = {(q, d): r for q, d, r in zip(full.query_id, full.doc_id, full["rank"])}
    for _, row in t1.iterrows():
        assert row.exact_rank == fx.get((row.query_id, row.doc_id), 0)
    # scores in tier-1 are the true BM25 scores (prune candidates, not
    # stats): any doc present in both tiers carries the same score
    fs = {(q, d): s for q, d, s in zip(full.query_id, full.doc_id, full.score_r)}
    both = t1[t1.exact_rank > 0]
    assert len(both) > 0
    for _, row in both.iterrows():
        assert abs(fs[(row.query_id, row.doc_id)] - row.score_r) < 1e-9


def test_rescore_bonus_monotone_in_proximity(ray_session):
    """A doc where the pair is adjacent must gain a strictly larger
    bonus than one where the pair is far apart, and docs missing a
    term keep their base score untouched."""
    from goobi_viewer_indexer_ray.pipelines.catalog import q_search_rescore

    out = q_search_rescore("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    got_bonus = out[out.min_dist > 0]
    assert len(got_bonus) > 0
    for _, r in out.iterrows():
        if r.min_dist == 0:  # no co-occurrence -> base kept
            assert abs(r.score2_r - r.score_r) < 1e-9
        else:
            expect = round(float(r.score_r) + 0.5 / (1 + int(r.min_dist)), 4)
            assert abs(r.score2_r - expect) < 1e-9
    # ranks are 1..k dense per query
    for qid, g in out.groupby("query_id"):
        assert sorted(g.rank2) == list(range(1, len(g) + 1))


def test_redirect_resolve_semantics(ray_session):
    """Every resolved chain must land on a terminal node in exactly
    `hops` steps of the synthetic rule; unresolved rows sit at the
    16-hop cap on a node f^16(src)."""
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.pipelines.catalog import (
        _REDIR_HOPS,
        q_redirect_resolve,
    )

    SF = "/root/testdata/sf0.001"
    n = pq.read_metadata(SF + "/documents.parquet").num_rows
    out = q_redirect_resolve(SF).to_pandas()
    assert len(out) == n

    def f(x):
        return (3 * x + 7) % n

    def is_red(x):
        return x % 5 == 1 and f(x) != x

    for _, r in out.iterrows():
        if r.status == 0:
            assert not is_red(r.doc_id)
            assert r.final_id == r.doc_id and r.hops == 0
            continue
        x, steps = int(r.doc_id), 0
        while is_red(x) and steps < _REDIR_HOPS:
            x = f(x)
            steps += 1
        assert x == r.final_id, r.doc_id
        assert steps == r.hops
        assert (r.status == 1) == (not is_red(x))


def test_blockmax_is_wand_consistent(ray_session):
    """Block-max metadata must upper-bound every posting it covers:
    re-derive the blocks from the raw postings of one term and check
    the WAND pruning invariants (max_tf >= any tf in block, last_doc
    is the block's final docid, blocks partition the list)."""
    import duckdb

    from goobi_viewer_indexer_ray.pipelines.catalog import (
        _BMAX_BLOCK,
        q_postings_blockmax,
    )

    SF = "/root/testdata/sf0.001"
    out = q_postings_blockmax(SF).to_pandas()
    term = out.term.iloc[0]
    con = duckdb.connect()
    raw = con.execute(f"""
        SELECT doc_id, count(*) AS tf
        FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text),
              '[a-z0-9]+')) AS t FROM '{SF}/documents.parquet')
        WHERE t = '{term}' GROUP BY doc_id ORDER BY doc_id
    """).fetchdf()
    g = out[out.term == term].sort_values("blk")
    assert g.n.sum() == len(raw)
    for _, b in g.iterrows():
        lo, hi = int(b.blk) * _BMAX_BLOCK, int(b.blk) * _BMAX_BLOCK + int(b.n)
        chunk = raw.iloc[lo:hi]
        assert int(b.max_tf) == chunk.tf.max()
        assert int(b.last_doc) == chunk.doc_id.iloc[-1]


def test_host_budget_is_exact_apportionment(ray_session):
    """Largest-remainder invariants: allocations sum exactly to the
    budget, every host within 1 of its ideal share, monotone in
    backlog (a strictly larger backlog never gets a smaller alloc)."""
    from goobi_viewer_indexer_ray.pipelines.catalog import (
        _HOST_BUDGET,
        q_host_budget,
    )

    out = q_host_budget("/root/testdata/sf0.001").to_pandas()
    assert out.alloc.sum() == _HOST_BUDGET
    tot = out.backlog.sum()
    ideal = _HOST_BUDGET * out.backlog / tot
    assert ((out.alloc - ideal).abs() < 1).all()
    m = out.sort_values(["backlog", "alloc"])
    assert m.groupby("backlog").alloc.max().is_monotonic_increasing


def test_ccnet_buckets_are_balanced_terciles(ray_session):
    """Tercile semantics: buckets are ordered by surprisal (every head
    doc <= every middle doc <= every tail doc) and each holds ~N/3
    within the tie-granularity of the threshold values."""
    from goobi_viewer_indexer_ray.pipelines.catalog import q_ccnet_buckets

    out = q_ccnet_buckets("/root/testdata/sf0.001").to_pandas()
    assert set(out.bucket) == {0, 1, 2}
    assert out[out.bucket == 0].ce_micro.max() <= out[out.bucket == 1].ce_micro.min()
    assert out[out.bucket == 1].ce_micro.max() <= out[out.bucket == 2].ce_micro.min()
    n = len(out)
    assert out.bucket.value_counts().max() <= n // 3 + (out.ce_micro.duplicated().sum() + 1)


def test_bbit_estimator_tracks_true_jaccard(ray_session):
    """On near-identical docs the 2-bit estimator must read high; the
    collision-floor correction keeps unrelated-ish pairs low.  Also
    pins the estimator formula from the match counts."""
    from goobi_viewer_indexer_ray.pipelines.catalog import (
        _BBIT_PERMS,
        q_dedup_bbit,
    )

    out = q_dedup_bbit("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    for _, r in out.iterrows():
        expect = 10000 * max(4 * int(r.m_bbit) - _BBIT_PERMS, 0) // (3 * _BBIT_PERMS)
        assert r.r_bbit_scaled == expect
    hi = out[out.j_bp >= 9000]
    if len(hi):
        assert (hi.r_bbit_scaled >= 7000).all()


def test_reuse_spans_finds_planted_run(ray_session):
    """A verbatim 20-token block shared by two docs must surface as a
    max_run_tokens >= 20 span for that pair."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.pipelines.catalog import q_reuse_spans

    rng = np.random.default_rng(5)
    block = " ".join(f"b{i}" for i in range(20))
    filler = lambda: " ".join(f"w{rng.integers(0, 40)}" for _ in range(30))
    texts = [
        filler() + " " + block + " " + filler(),
        block + " " + filler(),
        filler(),
    ]
    tbl = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    out = q_reuse_spans(d).to_pandas()
    hit = out[(out.doc_a == 0) & (out.doc_b == 1)]
    assert len(hit) == 1
    assert int(hit.max_run_tokens.iloc[0]) >= 20


def test_dhash_brightness_invariance_vs_ahash(ray_session):
    """The defining property split: a uniform +delta on every pixel
    leaves the dHash unchanged (row gradients preserved) while aHash
    may flip bits near the mean.  Pinned directly on the stage."""
    import numpy as np
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.multimodal import AHash, DHash

    rng = np.random.default_rng(2)
    img = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
    bright = np.minimum(img.astype(np.int64) + 40, 255).astype(np.uint8)

    def ppm(a):
        return b"P6\n16 16\n255\n" + a.tobytes()

    tbl = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([ppm(img), ppm(bright)], pa.binary()),
        }
    )
    d = DHash()(tbl).to_pandas().set_index("media_id")
    assert d.loc[0, "hash_hi"] == d.loc[1, "hash_hi"]
    assert d.loc[0, "hash_lo"] == d.loc[1, "hash_lo"]


def test_silence_segments_hand_built(ray_session):
    """Hand-built WAV: loud / silent / loud / silent-silent frames →
    2 segments, longest run 2, trailing partial frame ignored."""
    import numpy as np
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.multimodal import (
        SilenceSegments,
        encode_wav_pcm16,
    )

    loud = np.full(256, 5000, np.int64)
    quiet = np.zeros(256, np.int64)
    x = np.concatenate([loud, quiet, loud, quiet, quiet, loud[:100]])
    tbl = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([encode_wav_pcm16(x, 8000)], pa.binary()),
        }
    )
    out = SilenceSegments()(tbl).to_pandas()
    assert out.iloc[0].n_frames == 5  # partial 100-sample tail dropped
    assert out.iloc[0].n_silent == 3
    assert out.iloc[0].n_segments == 2
    assert out.iloc[0].longest_run == 2


def test_stupid_backoff_semantics(ray_session):
    """Seen bigrams score -log2(c_bg/c_head); unseen back off to the
    0.4-weighted unigram; backoff share is 0 for a pure model-slice
    doc and 10000 for a fully out-of-model doc."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.stages.lm import (
        stupid_backoff_model,
        stupid_backoff_score,
    )
    import ray.data as rd

    texts = [
        ("a b a b a b", "src0"),   # model slice
        ("a b a b", "srcX"),       # all bigrams seen
        ("q r q r", "srcX"),       # nothing seen
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array([t for t, _ in texts], pa.string()),
            "source": pa.array([s for _, s in texts], pa.string()),
        }
    )
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    ds = rd.read_parquet(os.path.join(d, "documents.parquet"))
    m = stupid_backoff_model(ds, model_source="src0")
    out = stupid_backoff_score(ds, m).to_pandas().set_index("doc_id")
    assert out.loc[1, "backoff_bp"] == 0
    assert out.loc[2, "backoff_bp"] == 10000
    # doc 1: bigrams (a,b) x2, (b,a) x1; heads a=3,b=2; c(a,b)=3, c(b,a)=2
    la = round(np.log2(3 / 3) * 1e6)   # 0
    lb = round(np.log2(2 / 2) * 1e6)   # 0
    assert out.loc[1, "sb_micro"] == (2 * la + lb) // 3 == 0
    # doc 2: unseen everywhere; cu(r)=0, cu(q)=0, T=6, V=2
    lu = round(np.log2((5.0 * (6 + 2)) / (2.0 * 1)) * 1e6)
    assert out.loc[2, "sb_micro"] == lu


def test_impacts_are_pareto_frontier(ray_session):
    """No surviving pair may be dominated (another pair with >= tf and
    <= norm, strict in one) and every term keeps its max-tf pair."""
    from goobi_viewer_indexer_ray.pipelines.catalog import q_postings_impacts

    out = q_postings_impacts("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    for term, g in out.groupby("term"):
        tf = g.tf.to_numpy()
        nc = g.norm_code.to_numpy()
        for i in range(len(g)):
            dom = (tf >= tf[i]) & (nc <= nc[i]) & ((tf > tf[i]) | (nc < nc[i]))
            assert not dom.any(), (term, tf[i], nc[i])
        assert tf.max() == g.tf.max()


def test_doc_novelty_planted_duplicate(ray_session):
    """An exact copy with a higher doc_id owns nothing (novelty 0);
    the original owns everything it doesn't share with earlier docs."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.pipelines.catalog import q_doc_novelty

    base = " ".join(f"w{i}" for i in range(30))
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([base, base], pa.string()),
        }
    )
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    out = q_doc_novelty(d).to_pandas().set_index("doc_id")
    assert out.loc[0, "novelty_bp"] == 10000
    assert out.loc[1, "novelty_bp"] == 0
    assert out.loc[1, "n_sh"] == out.loc[0, "n_sh"]


def test_doc_length_pctile_monotone(ray_session):
    """pct_bp is monotone in n_chars and tops out at 10000."""
    from goobi_viewer_indexer_ray.pipelines.catalog import q_doc_length_pctile

    out = (
        q_doc_length_pctile("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("n_chars")
    )
    assert out.pct_bp.is_monotonic_increasing
    assert out.pct_bp.iloc[-1] == 10000
    assert out.decile.between(0, 9).all()


def test_pfor_roundtrip_fuzz():
    """NewPFD encode/decode roundtrip across widths, exception rates,
    and block sizes — incl. the one-outlier block plain FOR loses on."""
    import numpy as np

    from goobi_viewer_indexer_ray.functions.codec import (
        decode_pfor_block, encode_pfor_block, for_encoded_size,
        pfor_encoded_size)

    rng = np.random.default_rng(11)
    for _ in range(200):
        n = int(rng.integers(1, 129))
        gaps = rng.choice(
            [1, 2, 3, 7, 63, 4097, 1 << 30],
            size=n - 1, p=[.35, .2, .15, .1, .1, .07, .03],
        ) if n > 1 else np.empty(0, np.int64)
        ids = np.cumsum(
            np.concatenate(([int(rng.integers(0, 10_000))], gaps))
        ).astype(np.uint64)
        back = decode_pfor_block(encode_pfor_block(ids), n)
        assert np.array_equal(back, ids.astype(np.int64))
    # skewed block: 126 unit gaps + one 10^9 outlier — the patched
    # codec must not pay the 30-bit frame for every value
    ids = np.cumsum([5] + [1] * 126 + [10 ** 9]).astype(np.uint64)
    assert pfor_encoded_size(ids) < for_encoded_size(ids) // 10


def test_pfor_corrupt_raises():
    import numpy as np
    import pytest

    from goobi_viewer_indexer_ray.functions.codec import (
        decode_pfor_block, encode_pfor_block)

    ids = np.cumsum([3] + [5] * 40).astype(np.uint64)
    buf = encode_pfor_block(ids)
    with pytest.raises(ValueError):
        decode_pfor_block(buf[:6], 41)
    with pytest.raises(ValueError):
        decode_pfor_block(buf[:12], 41)


def test_gamma_roundtrip_fuzz_and_truncation():
    import numpy as np
    import pytest

    from goobi_viewer_indexer_ray.functions.codec import (
        decode_gamma, encode_gamma)

    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(1, 200))
        vals = rng.integers(0, 2**40, n).astype(np.uint64)
        assert np.array_equal(decode_gamma(encode_gamma(vals), n), vals)
    # zero and dense-gap extremes
    z = np.zeros(64, np.uint64)
    assert np.array_equal(decode_gamma(encode_gamma(z), 64), z)
    with pytest.raises(ValueError, match="truncated"):
        decode_gamma(encode_gamma(np.array([2**40], np.uint64))[:2], 1)
