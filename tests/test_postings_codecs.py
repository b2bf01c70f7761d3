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
