"""End-to-end build parity vs the pure-Python oracle + resume semantics.

The transposition of the reference's golden-field indexing tests
(``MetsIndexerTest.index_shouldIndexRecordCorrectly``): build the tiny
corpus, then assert exact equality of every doc's text/id and every
term's df against the independent oracle.
"""

import glob
import hashlib
import os

import pyarrow.parquet as pq

from tests.conftest import NUM_PARTS, NUM_SHARDS


def _dirhash(d):
    h = hashlib.blake2b(digest_size=12)
    for f in sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)):
        h.update(f.encode())
        h.update(open(f, "rb").read())
    return h.hexdigest()


def test_docs_match_oracle(tiny_build, tiny_oracle):
    from goobi_viewer_indexer_ray.pipelines.build import read_docs

    docs = read_docs(tiny_build).to_pandas()
    assert len(docs) == tiny_oracle.n_docs
    by_url = tiny_oracle.by_url
    for r in docs.itertuples():
        od = by_url[r.url]
        assert od.doc_id == r.doc_id
        assert od.text == r.text  # byte-identical invariant
        assert od.dl == r.doc_len
    # doc_id = part*PART_STRIDE + local_rank: unique, strided
    from goobi_viewer_indexer_ray.functions.ids import PART_STRIDE

    assert docs["doc_id"].is_unique
    assert (docs["doc_id"] // PART_STRIDE == docs["part"]).all()
    assert (docs["doc_id"] % PART_STRIDE == docs["local_rank"]).all()


def test_dedup_keep_latest(tiny_build, tiny_oracle):
    from goobi_viewer_indexer_ray.pipelines.build import read_docs
    from goobi_viewer_indexer_ray.sources.corpus import gen_pages
    from tests.conftest import TINY_N, TINY_SEED

    pages = gen_pages(TINY_N, TINY_SEED)
    n_dups = TINY_N - len(set(pages.column("url").to_pylist()))
    assert n_dups > 0, "corpus must contain url duplicates"
    docs = read_docs(tiny_build).to_pandas()
    assert len(docs) == TINY_N - n_dups
    # the kept row per duplicated url is the latest warc_ts
    latest = {}
    for row in pages.to_pylist():
        cur = latest.get(row["url"])
        if cur is None or row["warc_ts"] > cur["warc_ts"]:
            latest[row["url"]] = row
    got_ts = dict(zip(docs["url"], docs["warc_ts"]))
    for url, row in latest.items():
        assert got_ts[url].to_pydatetime() == row["warc_ts"]


def test_stats_and_df_match_oracle(tiny_build, tiny_oracle):
    from goobi_viewer_indexer_ray.pipelines.build import load_stats
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex

    stats = load_stats(tiny_build)
    assert stats["n_docs"] == tiny_oracle.n_docs
    assert stats["avgdl"] == tiny_oracle.avgdl
    idx = LocalIndex(tiny_build)
    assert idx.n_terms == len(tiny_oracle.df)
    for t, df in tiny_oracle.df.items():
        assert idx.lookup(t).df == df, t
    # cf parity on a few heavy terms
    for t in ["baba", "beba"]:
        cf = sum(d.tf.get(t, 0) for d in tiny_oracle.docs)
        assert idx.lookup(t).cf == cf


def test_postings_sorted_and_blocked(tiny_build, tiny_oracle):
    import numpy as np

    from goobi_viewer_indexer_ray.functions.codec import BLOCK_SIZE
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex

    idx = LocalIndex(tiny_build)
    for t in list(tiny_oracle.df)[:200]:
        ref = idx.lookup(t)
        docs, tfs, dls = ref.decode_all()
        assert (np.diff(docs) > 0).all()  # strictly increasing doc ids
        assert docs.size == ref.df
        assert (ref.shard.b_n[ref._s : ref._e] <= BLOCK_SIZE).all()


def test_full_resume_noop(tiny_build, tiny_paths):
    from goobi_viewer_indexer_ray.pipelines.build import build_all

    h_docs = _dirhash(os.path.join(tiny_build, "docs"))
    h_idx = _dirhash(os.path.join(tiny_build, "index"))
    build_all(tiny_paths, tiny_build, num_parts=NUM_PARTS, num_shards=NUM_SHARDS)
    assert _dirhash(os.path.join(tiny_build, "docs")) == h_docs
    assert _dirhash(os.path.join(tiny_build, "index")) == h_idx


def test_partition_level_resume(tiny_build, tiny_paths):
    """Kill-after-partition-k simulation: lose files, resume, byte-compare."""
    from goobi_viewer_indexer_ray.pipelines.build import build_docs, build_index

    docs_dir = os.path.join(tiny_build, "docs")
    idx_dir = os.path.join(tiny_build, "index")
    h_docs, h_idx = _dirhash(docs_dir), _dirhash(idx_dir)

    os.remove(os.path.join(tiny_build, "docs_manifest.json"))
    os.remove(os.path.join(docs_dir, "part=00001", "_manifest.json"))
    os.remove(os.path.join(docs_dir, "part=00002", "data.parquet"))
    build_docs(tiny_paths, tiny_build, num_parts=NUM_PARTS, num_shards=NUM_SHARDS)
    assert _dirhash(docs_dir) == h_docs

    os.remove(os.path.join(idx_dir, "shard=00001", "seg=00001", "terms.parquet"))
    build_index(tiny_build, num_shards=NUM_SHARDS)
    assert _dirhash(idx_dir) == h_idx


def test_docs_parquet_layout(tiny_build):
    """Resumable layout: one directory per partition, atomic files."""
    parts = sorted(glob.glob(os.path.join(tiny_build, "docs", "part=*")))
    assert len(parts) == NUM_PARTS
    for p in parts:
        assert os.path.exists(os.path.join(p, "data.parquet"))
        assert os.path.exists(os.path.join(p, "_manifest.json"))
        t = pq.read_table(os.path.join(p, "data.parquet"))
        assert t.column("local_rank").to_pylist() == list(range(t.num_rows))


def test_auto_sizing_helpers():
    """num_parts derives from input bytes when not given; bucketing maps
    contiguous parts to doc-range buckets."""
    from goobi_viewer_indexer_ray.functions.ids import PART_STRIDE
    from goobi_viewer_indexer_ray.pipelines.build import (
        PART_INPUT_BUDGET, _auto_parts, _bucketing,
    )

    # explicit value passes through untouched
    assert _auto_parts(["/nonexistent"], 7) == 7
    # derived: >= ceil(bytes/budget); tmp files to measure
    import tempfile

    with tempfile.NamedTemporaryFile() as f:
        f.write(b"x" * 1024)
        f.flush()
        n = _auto_parts([f.name], None)
        assert n >= 1  # tiny input → floor at cpu count

    ppb, width = _bucketing(32, None)
    assert ppb == 4 and width == 4 * PART_STRIDE  # 8 default buckets
    ppb, width = _bucketing(4, None)
    assert ppb == 1 and width == PART_STRIDE  # fewer parts than buckets
    ppb, width = _bucketing(100, 8)
    assert ppb == 13  # ceil(100/8)
    assert PART_INPUT_BUDGET == 128 << 20


def test_build_writes_metrics_sidecar(ray_session, tiny_build):
    """A fresh build leaves per-stage metrics next to the manifests."""
    import json
    import os

    with open(os.path.join(tiny_build, "metrics.json")) as f:
        m = json.load(f)
    assert m["total_s"] >= m["docs_stage_s"] >= 0
    assert m["n_docs"] > 0
    assert m["docs_per_sec"] > 0
