"""Trained k-means + SemDeDup (stages/kmeans.py) — partition
invariance (the integer-recurrence contract) and the dedup semantics
on a corpus with planted duplicates."""

import numpy as np
import pyarrow as pa
import pytest

from goobi_viewer_indexer_ray.stages.kmeans import kmeans_assign, semantic_dedup


def _vecs(n: int, dim: int = 16, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in m.astype(np.float32)]),
        }
    )


def _as_df(ds):
    return ds.to_pandas().sort_values("vec_id").reset_index(drop=True)


def test_kmeans_partition_invariant(ray_session):
    """1 block vs 13 blocks: bit-identical (cluster AND dist2) — the
    whole point of the integer Lloyd recurrence."""
    import ray.data as rd

    t = _vecs(200)
    one = _as_df(kmeans_assign(rd.from_arrow(t)))
    many = _as_df(kmeans_assign(rd.from_arrow(t).repartition(13)))
    assert one.equals(many)
    assert set(one.columns) == {"vec_id", "cluster", "dist2"}
    assert one.cluster.nunique() > 1  # it actually clustered


def test_semantic_dedup_planted_duplicates(ray_session):
    """Exact copies land in the same cluster and every copy points at
    the LOWEST-id original; originals keep."""
    import ray.data as rd

    t = _vecs(60)
    emb = t.column("embedding").to_pylist()
    # plant: vecs 60/61 duplicate vec 3; vec 62 duplicates vec 10
    emb = emb + [emb[3], emb[3], emb[10]]
    t2 = pa.table(
        {
            "vec_id": pa.array(np.arange(len(emb), dtype=np.int64)),
            "embedding": pa.array(emb),
        }
    )
    # strict threshold (cos ≥ 0.95) so only the planted copies match
    out = _as_df(
        semantic_dedup(rd.from_arrow(t2).repartition(5), num=9025, den=10000)
    )
    row = out.set_index("vec_id")
    assert row.loc[60, "dup_of"] == 3 and not row.loc[60, "keep"]
    assert row.loc[61, "dup_of"] == 3 and not row.loc[61, "keep"]
    assert row.loc[62, "dup_of"] == 10 and not row.loc[62, "keep"]
    assert row.loc[3, "keep"] and row.loc[10, "keep"]
    # clusters agree with the assignment operator
    km = _as_df(kmeans_assign(rd.from_arrow(t2)))
    assert (out.cluster.values == km.cluster.values).all()


def test_semantic_dedup_threshold_is_exact(ray_session):
    """A pair exactly AT the integer threshold counts as a duplicate
    (>= semantics), one unit above does not — the reason the test is
    cross-multiplied integers instead of a float compare."""
    import ray.data as rd

    # quantized: a → (127, 0), b → (floor(.75·127+.5), 127) = (95, 127)
    t = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [3.0, 4.0]]),
        }
    )
    ip, aa, bb = 127 * 95, 127 * 127, 95 * 95 + 127 * 127
    out = _as_df(
        semantic_dedup(rd.from_arrow(t), k=1, iters=1, num=ip * ip, den=aa * bb)
    )
    assert out.dup_of.tolist() == [-1, 0]
    strict = _as_df(
        semantic_dedup(
            rd.from_arrow(t), k=1, iters=1, num=ip * ip + 1, den=aa * bb
        )
    )
    assert strict.dup_of.tolist() == [-1, -1]
