"""backup_index / restore_index (Solr replication-handler parity)."""

from __future__ import annotations

import hashlib
import os
import shutil


def _tree_hashes(root: str) -> dict[str, str]:
    out = {}
    for dirpath, _, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            rel = os.path.relpath(p, root)
            with open(p, "rb") as f:
                out[rel] = hashlib.md5(f.read()).hexdigest()
    return out


def test_backup_restore_byte_identity(ray_session, tiny_build, tmp_path):
    from goobi_viewer_indexer_ray.pipelines.backup import (
        backup_index, restore_index)
    from goobi_viewer_indexer_ray.pipelines.check import check_index

    live = str(tmp_path / "live")
    shutil.copytree(tiny_build, live)
    # scratch run cache must NOT ride along
    before = _tree_hashes(live)
    snap = str(tmp_path / "snap")
    meta = backup_index(live, snap)
    assert meta["bytes"] > 0
    assert all(not f.startswith("runs/") for f in meta["files"])

    # damage the live tree: delete a segment and corrupt stats
    from goobi_viewer_indexer_ray.stages.index_merge import segment_paths

    victim = segment_paths(os.path.join(live, "index"))[0]["path"]
    os.remove(victim)
    with open(os.path.join(live, "stats.json"), "w") as f:
        f.write("{}")

    restore_index(snap, live)
    after = _tree_hashes(live)
    pinned = set(meta["files"])
    assert {k: v for k, v in before.items() if k in pinned} == \
           {k: v for k, v in after.items() if k in pinned}
    assert check_index(live)["failures"] == []


def test_backup_refuses_overwrite_and_missing(ray_session, tiny_build,
                                              tmp_path):
    import pytest

    from goobi_viewer_indexer_ray.pipelines.backup import (
        backup_index, restore_index)

    snap = str(tmp_path / "s2")
    backup_index(tiny_build, snap)
    with pytest.raises(ValueError, match="already holds a snapshot"):
        backup_index(tiny_build, snap)
    with pytest.raises(ValueError, match="no snapshot"):
        restore_index(str(tmp_path / "nope"), tiny_build)


def test_gc_removes_only_orphans(ray_session, tiny_build, tmp_path):
    from goobi_viewer_indexer_ray.pipelines.backup import gc_index
    from goobi_viewer_indexer_ray.pipelines.check import check_index

    live = str(tmp_path / "gc")
    shutil.copytree(tiny_build, live)
    orphan = os.path.join(live, "index", "shard=00000", "seg=00000",
                          "terms-deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"stale optimize leftover")
    stale_dir = os.path.join(live, "index", "shard=00099", "seg=00000")
    os.makedirs(stale_dir)
    with open(os.path.join(stale_dir, "terms.parquet"), "wb") as f:
        f.write(b"segment of a dead build")

    before = _tree_hashes(live)
    plan = gc_index(live, dry_run=True)
    assert _tree_hashes(live) == before  # dry run mutates nothing
    assert sorted(plan["deleted"]) == [
        "index/shard=00000/seg=00000/terms-deadbeef.parquet",
        "index/shard=00099/seg=00000/terms.parquet",
    ]
    res = gc_index(live)
    assert res["n_deleted"] == 2
    assert not os.path.exists(orphan)
    assert not os.path.exists(stale_dir)
    assert check_index(live)["failures"] == []
