"""check_index (CheckIndex parity): clean pass + corruption detection."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq


def test_check_index_clean(ray_session, tiny_build):
    from goobi_viewer_indexer_ray.pipelines.check import check_index

    r = check_index(tiny_build)
    assert r["segments"] > 0
    assert r["checks"] > 1000
    assert r["failures"] == []


def _first_segment(out_dir: str) -> str:
    from goobi_viewer_indexer_ray.stages.index_merge import segment_paths

    return segment_paths(os.path.join(out_dir, "index"))[0]["path"]


def test_check_index_detects_corruption(ray_session, tiny_build, tmp_path):
    """Flip one df and swap two terms out of order — both must be
    caught, and strict mode must raise."""
    import pytest

    from goobi_viewer_indexer_ray.pipelines.check import check_index

    bad = str(tmp_path / "bad")
    shutil.copytree(tiny_build, bad)
    seg = _first_segment(bad)
    t = pq.read_table(seg)
    df = t.column("df").to_pylist()
    df[0] += 1  # df no longer matches the decoded postings
    terms = t.column("term").to_pylist()
    terms[1], terms[2] = terms[2], terms[1]  # break the sort order
    import pyarrow as pa

    t2 = t.set_column(t.schema.get_field_index("term"), "term",
                      pa.array(terms, pa.string()))
    t2 = t2.set_column(t2.schema.get_field_index("df"), "df",
                       pa.array(df, pa.int64()))
    pq.write_table(t2, seg)

    r = check_index(bad)
    msgs = "\n".join(r["failures"])
    assert "df" in msgs
    assert "not strictly sorted" in msgs
    with pytest.raises(ValueError, match="check_index failed"):
        check_index(bad, strict=True)


def test_check_index_detects_manifest_drift(ray_session, tiny_build,
                                            tmp_path):
    """A stats.json whose n_docs disagrees with the docs manifest is a
    cross-file failure."""
    from goobi_viewer_indexer_ray.pipelines.check import check_index

    bad = str(tmp_path / "drift")
    shutil.copytree(tiny_build, bad)
    with open(os.path.join(bad, "stats.json")) as f:
        stats = json.load(f)
    stats["n_docs"] += 1
    with open(os.path.join(bad, "stats.json"), "w") as f:
        json.dump(stats, f)
    r = check_index(bad)
    assert any("n_docs" in m for m in r["failures"])
