"""Lineage-guard tests: stale partition/shard dirs never re-enter an
index, fingerprints catch same-size in-place edits, dedup survivor is a
pure function of content (not arrival order)."""

import datetime
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from goobi_viewer_indexer_ray.state.manifest import input_fingerprint
from tests.conftest import NUM_PARTS, NUM_SHARDS, TINY_N, TINY_SEED


def test_fingerprint_detects_same_size_edit(tmp_path):
    p = tmp_path / "in.parquet"
    p.write_bytes(b"aaaa")
    fp1 = input_fingerprint([str(p)])
    os.utime(p, ns=(1_000_000_000, 2_000_000_000))
    p2 = input_fingerprint([str(p)])
    assert fp1 != p2  # same name+size, different mtime → different fp


def test_rebuild_with_fewer_parts_ignores_stale_dirs(ray_session, tiny_paths, tmp_path_factory):
    """Build at num_parts=8, rebuild the same out_dir at num_parts=4:
    stale part/shard dirs must not contribute phantom docs."""
    from goobi_viewer_indexer_ray.pipelines.build import build_all, read_docs
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex

    out = str(tmp_path_factory.mktemp("stale") / "out")
    build_all(tiny_paths, out, num_parts=8, num_shards=8)
    n8 = len(read_docs(out).to_pandas())

    build_all(tiny_paths, out, num_parts=NUM_PARTS, num_shards=NUM_SHARDS)
    docs = read_docs(out).to_pandas()
    assert len(docs) == n8  # same logical corpus, no phantom rows
    assert docs["doc_id"].is_unique
    # stale dirs exist on disk but are excluded via manifests
    assert os.path.isdir(os.path.join(out, "docs", "part=00007"))
    idx = LocalIndex(out)
    assert idx.n_docs == n8


def test_dedup_tie_break_is_content_deterministic():
    from goobi_viewer_indexer_ray.stages.docs_writer import dedup_and_rank

    ts = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)

    def tbl(order):
        rows = [
            {"url": "u", "warc_ts": ts, "lang": "en", "text": t, "doc_len": 1, "part": 0}
            for t in order
        ]
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows]),
                "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us", tz="UTC")),
                "lang": pa.array([r["lang"] for r in rows]),
                "text": pa.array([r["text"] for r in rows]),
                "doc_len": pa.array([r["doc_len"] for r in rows], pa.int32()),
                "part": pa.array([r["part"] for r in rows], pa.int32()),
            }
        )

    a = dedup_and_rank(tbl(["alpha", "beta"]))
    b = dedup_and_rank(tbl(["beta", "alpha"]))  # reversed arrival order
    assert a.column("text").to_pylist() == b.column("text").to_pylist()
    assert a.num_rows == 1
