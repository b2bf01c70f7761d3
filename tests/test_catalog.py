"""Mirror of the driver's correctness gate: every ``queries()`` entry
vs its DuckDB ``oracle_sql()`` (row count + schema names + sorted
value hash), at sf0.001 for speed.  The driver runs the same protocol
at sf0.01.
"""

import hashlib
import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata missing")


def _to_df(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _vhash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e


def test_entry_smoke(contract):
    res = _to_df(contract.entry())
    assert len(res) >= 0
    assert list(res.columns) == ["query_id", "doc_id", "score_r", "rank"]


def test_oracle_keys_subset(contract):
    qs, sqls = contract.queries(), contract.oracle_sql()
    assert set(sqls) <= set(qs)
    # the sole non-SQL op left: the e2e pipeline over its own corpus
    # (self-checks WAND == exact in-process instead)
    assert set(qs) - set(sqls) == {"pages_engine_e2e"}


def _check(contract, con, name):
    got = _canon(_to_df(contract.queries()[name](SF)))
    want = _canon(con.execute(contract.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    assert _vhash(got) == _vhash(want), name


@pytest.mark.parametrize(
    "name",
    [
        "index_stats",
        "federated_topk",
        "dsir_select",
        "hll_estimate",
        "search_earlyterm",
        "nb_lang_classify",
        "postings_pfor",
        "kneser_ney",
        "crawl_opic",
        "bm25_param_sweep",
        "link_components",
        "link_trustrank",
        "postings_intersect",
        "terms_suffix_infix",
        "search_jm",
        "host_ratelimit",
        "geo_quadkey",
        "geo_nearest",
        "link_communities",
        "q5_local_volume",
        "events_decayed_counts",
        "fuzzy_robustness",
        "table_profile",
        "events_value_hist",
        "link_kcore",
        "events_mad",
        "query_segmentation",
        "orders_cohort_ltv",
        "doc_term_vectors",
        "embedding_whiten",
        "alto_extract",
        "date_normalize",
        "search_phrase_gap",
        "events_benford",
        "supplier_returns",
        "events_window_distinct",
        "interleave_teamdraft",
        "html_canonical",
        "postings_gamma",
        "index_diff",
        "events_attribution",
        "idf_variants",
        "revenue_concentration",
        "promo_revenue_share",
        "shipmode_priority",
        "events_top_users_ties",
        "events_trigram_paths",
        "embedding_mrl_overlap",
        "events_ewma",
        "csv_ingest",
        "text_grep",
        "user_bot_score",
        "shard_balance",
        "source_vocab_jaccard",
        "serp_redundancy",
        "term_position_profile",
        "stopword_gain",
        "customer_cube",
        "order_size_hist",
        "idn_homograph",
        "lsh_scurve",
        "dict_encoding_gain",
        "sitemap_gen",
        "chunk_dedup",
        "discount_lift",
        "shipdelay_quantiles",
        "customer_churn",
        "tax_discount_cov",
        "nation_trade_balance",
        "fusion_combmnz",
        "events_error_ratio",
        "search_dismax",
        "search_boost_fn",
        "term_df_top100",
        "bm25_topk",
        "doc_token_count",
        "norm_quantize",
        "lexical_diversity",
        "postings_roaring",
        "champion_lists",
        "zipf_slope",
        "term_dispersion",
        "readability",
        "char_entropy",
        "kmeans_silhouette",
        "events_cusum",
        "source_cap",
        "image_entropy",
        "tfidf_topk",
        "oov_rate",
        "bigram_pmi",
        "doc_fingerprint",
        "langid",
        "quality_signals",
        "grouped_entities",
        "dedup_exact",
        "dedup_jaccard_pairs",
        "dedup_jaccard_capped",
        "dedup_containment_capped",
        "partition_max_records",
        "crawl_diff",
        "dedup_minhash_lsh",
        "dup_ngrams",
        "doc_packing",
        "mixture_resample",
        "quality_classifier",
        "video_frames",
        "link_pagerank",
        "link_anchors",
        "distinct_kmv",
        "cms_heavy_hitters",
        "source_ks",
        "term_burstiness",
        "nextword_index",
        "docid_remap",
        "index_prune",
        "query_clarity",
        "ranker_agreement",
        "bm25_maxscore",
        "search_fq",
        "phrase_selectivity",
        "head_dedup",
        "search_tiered_topk",
        "search_rescore",
        "doc_rarity",
        "redirect_resolve",
        "source_keyness",
        "postings_blockmax",
        "events_iat",
        "host_budget",
        "doc_length_pctile",
        "terms_trie_stats",
        "embedding_drift",
        "ccnet_buckets",
        "dedup_bbit",
        "reuse_spans",
        "video_scene_cuts",
        "image_dhash",
        "audio_silence",
        "orders_rfm",
        "host_linkstats",
        "doc_novelty",
        "recrawl_policy",
        "lang_source_chi2",
        "stupid_backoff",
        "postings_impacts",
        "distinct_hll",
        "sample_weighted",
        "ann_pq_codes",
        "ann_pq_adc",
        "url_bloom",
        "dedup_simhash",
        "dedup_embedding_pairs",
        "ann_cosine_topk",
        "ann_lsh_topk",
        "lineitem_agg",
        "customer_order_revenue",
        "top_orders",
        "events_hourly",
        "events_date_parts",
        "events_sessions",
        "events_asof_click",
        "events_sliding_windows",
        "part_price_band_pairs",
        "top_orders_per_customer",
        "event_type_users",
        "events_value_median",
        "events_props_json",
        "region_customer_counts",
        "lang_source_counts",
        "parent_rollup",
        "hierarchy_rollup",
        "authority_norm",
        "quality_gopher",
        "boilerplate_blocks",
        "postings_ef",
        "audio_energy",
        "robots_filter",
        "search_elevate",
        "blocklist_filter",
        "terms_frontcode",
        "search_facet_pivot",
        "link_degree_stats",
        "search_querystring",
        "events_outliers",
        "search_terms_regex",
        "lang_mismatch",
        "percolate_queries",
        "dedup_containment",
        "link_cocitation",
        "search_highlight",
        "image_png_ahash",
        "filter_chain",
        "warc_gzip_ingest",
        "dedup_eval",
        "search_ltr",
        "page_label_sort",
        "year_gap_fill",
        "shard_plan",
        "link_coupling",
        "events_markov",
        "crawl_depth",
        "cooc_window",
        "ann_eval",
        "search_facet_query",
        "geo_wkt",
        "mixed_format_ingest",
        "ugc_annotations",
        "usage_stats",
        "media_dims",
        "merge_sources",
        "dedup_clusters",
        "quality_repetition",
        "url_normalize",
        "fetch_docs",
        "dedup_keep_canonical",
        "ann_ivf_assign",
        "embedding_quantize",
        "search_boolean",
        "search_prefix",
        "search_fuzzy",
        "search_facets",
        "search_phrase",
        "search_kwic",
        "search_phrase_positional",
        "search_proximity",
        "search_wildcard",
        "term_cooccurrence",
        "search_spellcheck",
        "search_stats",
        "search_collapse",
        "search_range_facet",
        "more_like_this",
        "pii_scrub",
        "doc_chunks",
        "bigram_counts",
        "contamination",
        "sample_docs",
        "sample_stratified",
        "token_count_quantiles",
        "grouped_quantiles",
        "subword_counts",
        "frequent_terms",
        "curation_pipeline",
        "perplexity_filter",
        "cdc_chunks",
        "search_synonyms",
        "bm25f_topk",
        "embedding_kmeans",
        "semantic_dedup",
        "postings_varint",
        "winnow_fingerprints",
        "winnow_pairs",
        "search_lmdirichlet",
        "budget_select",
        "search_suggest",
        "search_mmr",
        "passage_topk",
        "rrf_fusion",
        "ranking_eval",
        "search_group_topn",
        "vocab_growth",
        "link_hits",
        "search_prf",
        "term_stem_groups",
        "events_funnel",
        "collection_facets",
        "search_boost",
        "doc_keywords",
        "link_triangles",
        "bpe_train",
        "search_geo",
        "search_join",
        "bpe_encode",
        "embedding_classify",
        "search_cursor",
        "postings_for",
        "postings_skips",
        "search_mm",
        "crawl_schedule",
        "image_ahash",
        "warc_ingest",
        "search_explain",
        "host_stats",
        "search_collate",
        "events_retention",
    ],
)
def test_vs_duckdb(contract, con, name):
    _check(contract, con, name)


def test_minhash_lsh_recall(contract):
    """LSH candidates must reproduce the exact-Jaccard pairs on this
    corpus (recall check at threshold 0.1 with 64 perms / 16 bands)."""
    exact = _canon(_to_df(contract.queries()["dedup_jaccard_pairs"](SF)))
    lsh = _canon(_to_df(contract.queries()["dedup_minhash_lsh"](SF)))
    e = set(zip(exact["doc_a"], exact["doc_b"]))
    l = set(zip(lsh["doc_a"], lsh["doc_b"]))
    assert l <= e  # verified pairs are never false positives
    assert len(l) >= 0.9 * len(e)  # high recall on the gate corpus


def test_ann_lsh_overlap(contract):
    """LSH ANN must be a reasonable approximation of brute force."""
    bf = _to_df(contract.queries()["ann_cosine_topk"](SF))
    ls = _to_df(contract.queries()["ann_lsh_topk"](SF))
    for qid in bf["query_vec_id"].unique():
        top_bf = set(bf[bf["query_vec_id"] == qid]["vec_id"])
        top_ls = set(ls[ls["query_vec_id"] == qid]["vec_id"])
        assert len(top_bf & top_ls) >= 3  # @10, modest recall floor


def test_ann_ivf_probe(contract):
    """IVF with nprobe == num_cells must equal exact brute force;
    with a partial probe it must keep reasonable overlap."""
    from goobi_viewer_indexer_ray.pipelines.catalog import _ANN_QUERY_IDS, _embeddings
    from goobi_viewer_indexer_ray.stages.ann import brute_force_topk, ivf_topk

    ds = _embeddings(SF)
    bf = brute_force_topk(ds, _ANN_QUERY_IDS, k=10)
    full = ivf_topk(ds, _ANN_QUERY_IDS, k=10, num_cells=16, nprobe=16)
    pd.testing.assert_frame_equal(
        bf.reset_index(drop=True), full.reset_index(drop=True)
    )
    part = ivf_topk(ds, _ANN_QUERY_IDS, k=10, num_cells=16, nprobe=4)
    for qid in bf["query_vec_id"].unique():
        top_bf = set(bf[bf["query_vec_id"] == qid]["vec_id"])
        top_iv = set(part[part["query_vec_id"] == qid]["vec_id"])
        assert len(top_bf & top_iv) >= 3  # @10, modest recall floor


def test_ann_quantized_recall(contract):
    """int8-quantized cosine top-k must track exact brute force: high
    overlap @10, and the top-1 hit must survive quantization."""
    from goobi_viewer_indexer_ray.pipelines.catalog import _ANN_QUERY_IDS, _embeddings
    from goobi_viewer_indexer_ray.stages.ann import brute_force_topk, quantized_topk

    ds = _embeddings(SF)
    bf = brute_force_topk(ds, _ANN_QUERY_IDS, k=10)
    qz = quantized_topk(ds, _ANN_QUERY_IDS, k=10)
    for qid in bf["query_vec_id"].unique():
        top_bf = bf[bf["query_vec_id"] == qid].sort_values("rank")
        top_qz = qz[qz["query_vec_id"] == qid].sort_values("rank")
        assert len(set(top_bf["vec_id"]) & set(top_qz["vec_id"])) >= 8
        # the query vector itself (cos=1) must stay rank-1
        assert top_qz.iloc[0]["vec_id"] == top_bf.iloc[0]["vec_id"]


def test_ann_ivf_partitioned_identity(contract, tmp_path):
    """The cell-partitioned IO-pruned probe must return exactly what
    the in-compute ivf_topk returns on the same data."""
    from goobi_viewer_indexer_ray.pipelines.catalog import _ANN_QUERY_IDS, _embeddings
    from goobi_viewer_indexer_ray.stages.ann import (
        ivf_topk,
        ivf_topk_partitioned,
        write_ivf_partitions,
    )

    ds = _embeddings(SF)
    out = str(tmp_path / "ivf_store")
    write_ivf_partitions(ds, out, num_cells=16)
    # only the probed cells' directories are read — with nprobe=4 the
    # path list must be a strict subset of all 16 cells
    a = ivf_topk(ds, _ANN_QUERY_IDS, k=10, num_cells=16, nprobe=4)
    b = ivf_topk_partitioned(out, ds, _ANN_QUERY_IDS, k=10, num_cells=16, nprobe=4)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_ann_pq_adc_recall(contract):
    """ADC over 4-bit PQ codes is the coarsest approximation in the ANN
    family — it must still place the query vector itself (exact dist
    to its own code) at rank 1 and keep meaningful overlap with exact
    brute force."""
    from goobi_viewer_indexer_ray.pipelines.catalog import _ANN_QUERY_IDS, _embeddings
    from goobi_viewer_indexer_ray.stages.ann import brute_force_topk, pq_adc_topk

    ds = _embeddings(SF)
    bf = brute_force_topk(ds, _ANN_QUERY_IDS, k=10)
    pq = pq_adc_topk(ds, _ANN_QUERY_IDS, k=10)
    overlaps = []
    for qid in bf["query_vec_id"].unique():
        top_bf = bf[bf["query_vec_id"] == qid]
        top_pq = pq[pq["query_vec_id"] == qid].sort_values("rank")
        # the query's own code has ADC dist == its reconstruction LUT
        # minimum — it must appear in its own top-10
        assert qid in set(top_pq["vec_id"])
        overlaps.append(len(set(top_bf["vec_id"]) & set(top_pq["vec_id"])))
    # untrained formula codebook on near-random synthetic vectors: the
    # honest bar is self-hit + nonzero mean overlap (a k-means-trained
    # codebook is the documented production swap-in)
    assert sum(overlaps) >= len(overlaps)  # mean overlap >= 1/10


def test_ann_pq_code_packing(contract):
    """Packed code words must round-trip to the per-subspace argmins."""
    import pyarrow as pa
    import ray.data

    from goobi_viewer_indexer_ray.pipelines.catalog import _embeddings
    from goobi_viewer_indexer_ray.stages.ann import (
        _as_matrix,
        _pq_codes,
        _quantize_int,
        pq_assign,
        pq_codebook,
    )

    t = _embeddings(SF).limit(32).to_pandas()
    tab = pa.Table.from_pandas(t)
    mat = _as_matrix(tab.column("embedding"))
    C = pq_codebook(mat.shape[1])
    codes, _ = _pq_codes(_quantize_int(mat), C)
    out = pq_assign(ray.data.from_arrow(tab)).to_pandas()
    out = out.set_index("vec_id").loc[t["vec_id"]]
    packed = out["pq_code"].to_numpy()
    for s in range(8):
        assert (((packed >> (4 * s)) & 0xF) == codes[:, s]).all()


def test_rrf_empty_lexical_leg(contract):
    """rrf_fusion qid 4 (zzznope) has no lexical hits — its fused
    ranking must equal the dense cosine ranking (same docs, same
    order), and every fused score must be a single-leg RRF point."""
    from goobi_viewer_indexer_ray.pipelines.catalog import (
        RRF_K, RRF_SCALE, RRF_TOP)

    fused = _to_df(contract.queries()["rrf_fusion"](SF))
    dense = _to_df(contract.queries()["ann_cosine_topk"](SF))
    f4 = fused[fused.query_id == 4].sort_values("rank")
    d4 = dense[dense.query_vec_id == 4].sort_values("rank")
    assert list(f4.doc_id)[:RRF_TOP] == list(d4.vec_id)[:RRF_TOP]
    want = [RRF_SCALE // (RRF_K + r) for r in range(1, len(f4) + 1)]
    assert list(f4.rrf_score) == want


def test_ranking_eval_invariants(contract):
    """Metric algebra pins: DCG never exceeds the true ideal, nDCG is
    bounded by 10^6, P@10 by 10, and the zero-result query (qid 4,
    zzznope) scores 0 on every run metric but keeps a positive ideal
    (its qrels exist even though retrieval found nothing)."""
    df = _to_df(contract.queries()["ranking_eval"](SF)).set_index("query_id")
    assert (df.dcg_u <= df.idcg_u).all()
    assert df.ndcg_u.between(0, 10**6).all()
    assert df.p_at_10.between(0, 10).all()
    assert (df.mrr_u <= 10**6).all()
    z = df.loc[4]
    assert z.p_at_10 == 0 and z.mrr_u == 0 and z.dcg_u == 0 and z.ndcg_u == 0
    assert z.idcg_u > 0


def test_group_topn_partition_invariance(contract, ray_session):
    """grouped_topn's per-batch candidate truncation + count partials
    must be invariant to input partitioning (1 vs 16 blocks)."""
    import ray

    from goobi_viewer_indexer_ray.pipelines.catalog import (
        DOC_QUERIES, GROUP_TOPN_QUERY_IDS, ensure_documents_index)
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex
    from goobi_viewer_indexer_ray.pipelines.search_ops import grouped_topn

    idx = LocalIndex(ensure_documents_index(SF))
    qmap = {q["query_id"]: q["query"] for q in DOC_QUERIES}
    qs = [(qid, qmap[qid]) for qid in GROUP_TOPN_QUERY_IDS]
    base = ray.data.read_parquet(SF + "/documents.parquet",
                                 columns=["doc_id", "lang"])
    a = grouped_topn(idx, base.repartition(1), qs, group_col="lang", n=2)
    b = grouped_topn(idx, base.repartition(16), qs, group_col="lang", n=2)
    assert a.to_pandas().equals(b.to_pandas())


def test_vocab_growth_properties(contract, ray_session):
    """Growth curves are monotone in the checkpoint; the 10^9
    checkpoint equals the exact full-corpus distinct counts; and the
    result is invariant to the prefix-scan bucket size (1 doc per
    bucket vs the default)."""
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.functions.tokenize import tokenize
    from goobi_viewer_indexer_ray.pipelines.catalog import (
        VOCAB_CHECKPOINTS, _documents)
    from goobi_viewer_indexer_ray.stages.text_ops import vocab_growth

    df = _to_df(contract.queries()["vocab_growth"](SF))
    for unit, g in df.groupby("unit"):
        v = g.sort_values("checkpoint")["vocab"].tolist()
        assert v == sorted(v), unit
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    unis, bis = set(), set()
    for text in t.column("text").to_pylist():
        toks = tokenize(text)
        unis.update(toks)
        bis.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    full = df[df.checkpoint == 10**9].set_index("unit")["vocab"]
    assert full["unigram"] == len(unis)
    assert full["bigram"] == len(bis)
    tiny = _to_df(
        vocab_growth(_documents(SF), VOCAB_CHECKPOINTS, bucket_size=1)
    )
    assert _canon(tiny).equals(_canon(df))


def test_prf_expands_beyond_base(contract):
    """PRF must actually change retrieval: the expanded top-10 for at
    least one query differs from the unexpanded BM25 top-10 (else the
    feedback loop is a no-op), and the result schema matches bm25."""
    base = _to_df(contract.queries()["bm25_topk"](SF))
    prf = _to_df(contract.queries()["search_prf"](SF))
    assert list(prf.columns) == ["query_id", "doc_id", "score_r", "rank"]
    changed = False
    for qid in prf.query_id.unique():
        b = base[base.query_id == qid].sort_values("rank").doc_id.tolist()
        p = prf[prf.query_id == qid].sort_values("rank").doc_id.tolist()
        if b != p:
            changed = True
    assert changed


def test_funnel_monotone_attrition(contract):
    """Windowed funnel counts must be non-increasing down the steps and
    strictly attriting on this corpus (a saturated funnel would mean
    the window constraint is dead code)."""
    df = _to_df(contract.queries()["events_funnel"](SF)).sort_values("step_idx")
    v = df.n_users.tolist()
    assert all(a >= b for a, b in zip(v, v[1:]))
    assert v[0] > v[-1]


def test_collection_facets_tree_invariant(contract):
    """Every depth-2 node's count must equal the sum of its depth-3
    children, and each depth level must sum to the corpus size — the
    tree-consistency property CollectionView relies on."""
    import pyarrow.parquet as pq

    df = _to_df(contract.queries()["collection_facets"](SF))
    n_docs = pq.read_metadata(SF + "/documents.parquet").num_rows
    for d in (1, 2, 3):
        assert df[df.depth == d].n_docs.sum() == n_docs, d
    d2 = df[df.depth == 2].set_index("node")["n_docs"]
    d3 = df[df.depth == 3].copy()
    d3["parent"] = d3.node.str.rsplit(".", n=1).str[0]
    child_sums = d3.groupby("parent")["n_docs"].sum()
    assert child_sums.to_dict() == d2.to_dict()


def test_boost_reranks_vs_bm25(contract):
    """The function-query boost must rerank: for at least one query the
    boosted order differs from plain BM25, and every boosted score is
    <= its BM25 score (the recip multiplier is < 1)."""
    base = _to_df(contract.queries()["bm25_topk"](SF))
    boost = _to_df(contract.queries()["search_boost"](SF))
    changed = False
    for qid in boost.query_id.unique():
        b = base[base.query_id == qid].sort_values("rank").doc_id.tolist()
        p = boost[boost.query_id == qid].sort_values("rank").doc_id.tolist()
        if b != p:
            changed = True
        merged = boost[boost.query_id == qid].merge(
            base[base.query_id == qid], on=["query_id", "doc_id"],
            suffixes=("_boost", "_bm25"),
        )
        assert (merged.score_r_boost <= merged.score_r_bm25 + 1e-9).all()
    assert changed


def test_elevate_forces_and_reorders(contract):
    """QueryElevationComponent: elevated docs sit at ranks 1-2 in
    config order even for the zero-hit query (score 0), and the
    excluded doc never appears in the organic tail."""
    df = _to_df(contract.queries()["search_elevate"](SF))
    n = 500
    for qid in df.query_id.unique():
        g = df[df.query_id == qid].sort_values("rank")
        elev = [(qid * 37 + 11) % n, (qid * 91 + 3) % n]
        assert g.iloc[0].doc_id == elev[0] and g.iloc[1].doc_id == elev[1]
        excl = (qid * 53 + 7) % n
        organic = g.iloc[2:]
        assert excl not in set(organic.doc_id) or excl in elev
    g4 = df[df.query_id == 4]
    assert len(g4) == 2 and set(g4.score_r) == {0.0}


def test_containment_catches_asymmetric_pair(ray_session):
    """A short doc fully embedded in a long one has low Jaccard but
    containment 1.0 — the pair the symmetric entry misses."""
    import ray.data

    from goobi_viewer_indexer_ray.stages.dedup import containment_pairs

    small = " ".join(f"w{i}" for i in range(12))
    filler = " ".join(f"f{i}" for i in range(200))
    rows = [
        {"doc_id": 1, "text": small},
        {"doc_id": 2, "text": small + " " + filler},
        {"doc_id": 3, "text": " ".join(f"z{i}" for i in range(40))},
    ]
    out = containment_pairs(ray.data.from_items(rows)).take_all()
    assert len(out) == 1
    p = out[0]
    assert (p["doc_small"], p["doc_big"]) == (1, 2)
    assert p["inter"] == p["n_small"] == 8   # all 8 shingles of doc 1
    # symmetric Jaccard on the same pair is far below any dedup bar
    assert p["inter"] / (8 + 208 - 8) < 0.05


def test_hot_shingle_cap_bounds_pair_emission(ray_session):
    """Round-4 verdict #1: a planted boilerplate shingle with df = 10⁴
    must NOT emit O(df²) ≈ 5·10⁷ pair rows.  With ``max_df`` set the
    hot group emits one O(1) sentinel instead, the drop is ACCOUNTED
    in-band (one row per distinct dropped df, counting the shingles
    dropped at that df), and pairs supported by rare shingles still
    come out exact."""
    import ray.data

    from goobi_viewer_indexer_ray.stages.dedup import containment_pairs, jaccard_pairs

    n_docs = 10_000
    boiler = "alpha beta gamma delta epsilon"  # one 5-gram, df = n_docs
    rows = [
        {"doc_id": i, "text": f"{boiler} u{i}a u{i}b u{i}c u{i}d u{i}e"}
        for i in range(n_docs)
    ]
    # one genuine near-dup pair sharing rare shingles on top
    rows[0]["text"] = f"{boiler} same rare tail here one two three"
    rows[1]["text"] = f"{boiler} same rare tail here one two nine"
    ds = ray.data.from_items(rows).repartition(8)
    out = pd.DataFrame(jaccard_pairs(ds, n=5, threshold=0.05, max_df=100).take_all())
    drops = out[out.doc_a == -1]
    pairs = out[out.doc_a != -1]
    # bounded output: no df² blowup anywhere near 5·10⁷
    assert len(out) < 50_000
    # drop accounting: exactly the boiler 5-gram has df > 100 (the
    # bridging windows mix unique tokens, so their df stays small)
    assert len(drops) == 1
    assert int(drops.iloc[0]["uni"]) == n_docs  # the dropped shingle's df
    assert int(drops.iloc[0]["inter"]) == 1  # one shingle dropped at that df
    # rare-shingle pairs survive with exact FULL set sizes in uni
    p01 = pairs[(pairs.doc_a == 0) & (pairs.doc_b == 1)]
    assert len(p01) == 1
    # docs 0/1: 12 tokens → 8 distinct shingles each; shared rare
    # shingles = windows 1..6 (window 0 is the capped boiler gram,
    # window 7 differs in the last token)
    assert int(p01.iloc[0]["inter"]) == 6
    assert int(p01.iloc[0]["uni"]) == 8 + 8 - 6

    cont = pd.DataFrame(
        containment_pairs(ds.filter(lambda r: r["doc_id"] < 500),
                          n=5, num=1, den=3, max_df=100).take_all()
    )
    cdrops = cont[cont.doc_small == -1]
    assert len(cdrops) == 1 and int(cdrops.iloc[0]["n_small"]) == 500
    c01 = cont[(cont.doc_small == 0) & (cont.doc_big == 1)]
    assert len(c01) == 1 and int(c01.iloc[0]["inter"]) == 6


def test_ltr_reranks_vs_bm25(contract):
    """The linear model must actually rerank: at least one query's
    LTR order differs from plain BM25 (the verbosity/recency features
    have nonzero weight)."""
    base = _to_df(contract.queries()["bm25_topk"](SF))
    ltr = _to_df(contract.queries()["search_ltr"](SF))
    changed = False
    for qid in ltr.query_id.unique():
        b = base[base.query_id == qid].sort_values("rank").doc_id.tolist()
        p = ltr[ltr.query_id == qid].sort_values("rank").doc_id.tolist()
        if b[: len(p)] != p:
            changed = True
    assert changed
