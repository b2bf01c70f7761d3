#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...extras}

Headline = full pages pipeline (synthesize-once cached corpus →
extract → dedup → doc ids → compressed inverted index) + a BM25 query
throughput/latency pass, sized from the sf dir's lineitem row count.

``--scaling``: runs the same bench twice in fresh interpreters at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the north
rule's N vs 4N cluster sizes).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SEED = 42


def _bench_queries(n: int = 200) -> list[dict]:
    """Deterministic query mix: head/mid/tail/absent, 1-3 terms."""
    from goobi_viewer_indexer_ray.sources.corpus import _VOCAB

    ranks = [0, 1, 2, 3, 5, 8, 13, 21, 50, 100, 200, 500, 1000, 2000, 5000, 9999]
    out = []
    for i in range(n):
        k = 1 + (i % 3)
        terms = [str(_VOCAB[ranks[(i * 7 + j * 13) % len(ranks)]]) for j in range(k)]
        if i % 17 == 0:
            terms.append("zzzabsent")
        out.append({"query_id": i, "query": " ".join(terms), "k": 10})
    return out


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np

    from goobi_viewer_indexer_ray.pipelines import catalog
    from goobi_viewer_indexer_ray.pipelines.build import build_all, load_stats
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex, search, topk_wand
    from goobi_viewer_indexer_ray.sources.corpus import ensure_pages

    import duckdb

    lineitem_rows = duckdb.sql(
        f"select count(*) from '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    scale = int(os.environ.get("GRAFT_BENCH_SCALE", "1"))
    n_pages = max(500, int(lineitem_rows) // 15) * scale

    # corpus synthesis + OS cache warm are untimed (we measure the engine)
    pages_dir = ensure_pages(n_pages, seed=SEED)
    for f in sorted(os.listdir(pages_dir)):
        if f.endswith(".parquet"):
            with open(os.path.join(pages_dir, f), "rb") as fh:
                fh.read()

    # untimed warmup: spawn Ray's FULL worker pool + import our modules
    # in every worker (one-time per-cluster cost, not per-job
    # throughput) — a tiny low-parallelism build leaves most workers
    # cold and the first timed build pays their spawn+import cost
    warm_dir = f"/tmp/gvi_bench/warm_{os.getpid()}"
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_all(ensure_pages(4096, seed=SEED), warm_dir,
              num_parts=max(4, NUM_CPUS), num_shards=max(4, NUM_CPUS))
    shutil.rmtree(warm_dir, ignore_errors=True)

    timings: dict[str, float] = {}

    # partition counts scale with the corpus (≥ cores, ≤ ~5k docs/part)
    # — low key cardinality skews Ray's sort-based shuffle
    num_parts = max(32, n_pages // 5000)
    # min-of-N timed builds (fresh out_dirs): the same noise-robust
    # estimator the scaling path uses — this Firecracker host shows
    # ±50% run-to-run variance on identical binaries+input
    trials = int(os.environ.get("GRAFT_BUILD_TRIALS", "2"))
    t_build = None
    out_dir = ""
    for trial in range(max(1, trials)):
        out_dir = f"/tmp/gvi_bench/run_{os.getpid()}_{trial}"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_all(
            pages_dir,
            out_dir,
            num_parts=num_parts,
            num_shards=num_parts,
            concurrency=max(1, NUM_CPUS - 2),
        )
        t_try = time.perf_counter() - t0
        t_build = t_try if t_build is None else min(t_build, t_try)
        if trial < max(1, trials) - 1:
            shutil.rmtree(out_dir, ignore_errors=True)
    stats = load_stats(out_dir)
    timings["pages_index_build"] = round(t_build, 3)

    # query throughput against a warm persistent serving pool
    # (service creation = index broadcast + actor warmup, untimed;
    # the north-star metric is steady-state queries/s and p50)
    queries = _bench_queries(200)
    from goobi_viewer_indexer_ray.pipelines.query import SearchService

    # query throughput saturates on memory bandwidth well below one
    # actor per core on this host; 8 actors is the knee
    service = SearchService(out_dir, n_actors=max(2, min(8, NUM_CPUS // 2)))
    t_q, n_res = None, 0
    for _ in range(2):  # steady-state: best of two batches (first batch
        t0 = time.perf_counter()  # absorbs residual per-actor warmup)
        res = service.query_table(queries)
        n_res = res.num_rows
        t_try = time.perf_counter() - t0
        t_q = t_try if t_q is None else min(t_q, t_try)
    timings["bm25_query_batch"] = round(t_q, 3)

    # repeated-query workload against the queryResultCache serving mode
    # (Solr queryResultCache parity): second pass is all cache hits
    cached = SearchService(
        out_dir,
        n_actors=max(2, min(8, NUM_CPUS // 2)),
        result_cache_size=512,
    )
    cached.query_table(queries)  # populate (untimed)
    t0 = time.perf_counter()
    cached.query_table(queries)
    timings["bm25_query_batch_cached"] = round(time.perf_counter() - t0, 3)
    cached.shutdown()
    service.shutdown()  # free both pools' CPU slots before federated/catalog

    # per-query latency on a loaded index (p50)
    idx = LocalIndex(out_dir)
    lat = []
    for q in queries[:100]:
        t0 = time.perf_counter()
        topk_wand(idx, q["query"], q["k"])
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1000)

    # federated doc-partitioned serving (n=4 members): the measured
    # answer to the single-node head-term latency wall — per-query
    # latency over the same query mix, exact two-phase global-idf
    from goobi_viewer_indexer_ray.pipelines.federated import FederatedSearch

    fed = FederatedSearch(out_dir, n_members=4)
    fed.topk(queries[0]["query"], 10)  # warm the member actors (untimed)
    fed_lat = []
    t0 = time.perf_counter()
    for q in queries[:100]:
        tq = time.perf_counter()
        fed.topk(q["query"], q["k"])
        fed_lat.append(time.perf_counter() - tq)
    timings["federated_topk"] = round(time.perf_counter() - t0, 3)
    fed_p50_ms = float(np.median(fed_lat) * 1000)
    fed_p90_ms = float(np.percentile(fed_lat, 90) * 1000)
    fed.shutdown()  # free the member actors' CPU slots for the catalog runs

    # forceMerge-to-one compaction of the build (after the query
    # benchmarks so it can't flatter them)
    from goobi_viewer_indexer_ray.stages.optimize import optimize_index

    t0 = time.perf_counter()
    optimize_index(out_dir)
    timings["index_optimize"] = round(time.perf_counter() - t0, 3)

    # catalog pipelines over the sf tables (cold: drop the doc-index cache)
    catalog_names = [] if os.environ.get("GRAFT_SKIP_CATALOG") else [
        "bm25_topk",
        "term_df_top100",
        "dedup_exact",
        "dedup_jaccard_pairs",
        "dedup_minhash_lsh",
        "dup_ngrams",
        "doc_packing",
        "mixture_resample",
        "quality_classifier",
        "dedup_embedding_pairs",
        "ann_cosine_topk",
        "lineitem_agg",
        "customer_order_revenue",
        "events_hourly",
        "events_asof_click",
        "grouped_entities",
        "part_price_band_pairs",
        "dedup_simhash",
        "parent_rollup",
        "hierarchy_rollup",
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
        "pii_scrub",
        "doc_chunks",
        "bigram_counts",
        "contamination",
        "search_boolean",
        "search_fuzzy",
        "search_phrase",
        "search_phrase_positional",
        "search_kwic",
        "search_wildcard",
        "search_spellcheck",
        "search_stats",
        "search_collapse",
        "search_range_facet",
        "term_cooccurrence",
        "more_like_this",
        "sample_stratified",
        "token_count_quantiles",
        "frequent_terms",
        "subword_counts",
        "perplexity_filter",
        "cdc_chunks",
        "search_synonyms",
        "bm25f_topk",
        "embedding_kmeans",
        "semantic_dedup",
        "postings_varint",
        "winnow_fingerprints",
        "search_lmdirichlet",
        "budget_select",
        "search_suggest",
        "search_mmr",
        "search_geo",
        "search_join",
        "search_cursor",
        "bpe_encode",
        "embedding_classify",
        "quality_gopher",
        "boilerplate_blocks",
        "postings_ef",
        "audio_energy",
        "robots_filter",
        "blocklist_filter",
        "terms_frontcode",
        "search_facet_pivot",
        "link_degree_stats",
        "search_querystring",
        "events_outliers",
        "percolate_queries",
        "lang_mismatch",
        "search_elevate",
        "search_terms_regex",
        "dedup_containment",
        "dedup_jaccard_capped",
        "dedup_containment_capped",
        "partition_max_records",
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
        "norm_quantize",
        "lexical_diversity",
        "distinct_hll",
        "crawl_diff",
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
        "winnow_pairs",
        "cms_heavy_hitters",
        "source_ks",
        "postings_skips",
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
    ]
    if catalog_names:
        shutil.rmtree("/tmp/gvi_catalog", ignore_errors=True)
    for name in catalog_names:
        t0 = time.perf_counter()
        r = catalog.QUERIES[name](SF_DIR)
        if hasattr(r, "map_batches"):  # a Ray Dataset → force execution
            r.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    shutil.rmtree(out_dir, ignore_errors=True)

    headline = timings["pages_index_build"] + timings["bm25_query_batch"]
    return {
        "metric": "pages_index_build+bm25_query_batch",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_pages": n_pages,
        "n_docs": stats["n_docs"],
        "docs_per_sec": round(stats["n_docs"] / t_build, 1),
        "queries_per_sec": round(len(queries) / t_q, 1),
        "query_p50_ms": round(p50_ms, 2),
        "federated_p50_ms": round(fed_p50_ms, 2),
        "federated_p90_ms": round(fed_p90_ms, 2),
        "n_results": int(n_res),
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        # 16× corpus for the scaling comparison so per-core work
        # dominates fixed costs (same input at BOTH levels)
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_SCALE=os.environ.get("GRAFT_BENCH_SCALE", "16"),
                   GRAFT_SKIP_CATALOG="1",
                   # one timed build per leg — keeps the leg definition
                   # identical to the recorded r2 runs (frozen metric)
                   GRAFT_BUILD_TRIALS=os.environ.get("GRAFT_BUILD_TRIALS", "1"))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # pre-generate the shared corpus at full parallelism (untimed) so
    # the first (8-cpu) leg doesn't pay slow corpus synthesis
    scale = int(os.environ.get("GRAFT_BENCH_SCALE", "16"))
    gen_code = (
        "import ray, duckdb, os;"
        "ray.init(address='local', num_cpus=32, include_dashboard=False, logging_level='ERROR');"
        "from goobi_viewer_indexer_ray.sources.corpus import ensure_pages;"
        f"rows = duckdb.sql(\"select count(*) from '{SF_DIR}/lineitem.parquet'\").fetchone()[0];"
        f"ensure_pages(max(500, int(rows) // 15) * {scale}, seed={SEED});"
        "ensure_pages(512, seed=%d);" % SEED + "ray.shutdown()"
    )
    subprocess.run([sys.executable, "-c", gen_code], check=True, capture_output=True)

    # host timing variance on this sandbox is ±20-30%; min-of-N per leg
    # is the standard noise-robust estimator (N=1 by default for time)
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "1"))
    r_lo = min((run(lo) for _ in range(trials)), key=lambda r: r["value"])
    r_hi = min((run(hi) for _ in range(trials)), key=lambda r: r["value"])
    eff_build = (r_lo["queries"]["pages_index_build"] / r_hi["queries"]["pages_index_build"]) / (hi / lo)
    eff_total = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "queries_per_sec_lo": r_lo["queries_per_sec"],
        "queries_per_sec_hi": r_hi["queries_per_sec"],
        "build_scaling_efficiency": round(eff_build, 3),
        "total_scaling_efficiency": round(eff_total, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
