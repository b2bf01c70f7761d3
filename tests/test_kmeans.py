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


def test_classify_nearest_centroid_planted_blobs(ray_session):
    """On embeddings WITH class structure (10 Gaussian blobs) the
    Rocchio classifier recovers the labels near-perfectly; on the
    driver testdata the labels are geometry-free by construction, so
    the catalog entry's pinned quantity is the integer parity, not
    model quality — this test pins the learning behavior itself.
    Also: 1-block == 16-block (int64 partial-sum contract)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from goobi_viewer_indexer_ray.stages.kmeans import (
        classify_nearest_centroid,
    )

    rng = np.random.default_rng(3)
    n_per, dim, k = 40, 16, 10
    centers = rng.normal(0, 10, (k, dim))
    rows, labs = [], []
    for l in range(k):
        rows.append(centers[l] + rng.normal(0, 1.0, (n_per, dim)))
        labs.extend([l] * n_per)
    m = np.vstack(rows).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(labs)), pa.int64()),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": pa.array(labs, pa.int32()),
        }
    )
    outs = []
    for blocks in (1, 16):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = classify_nearest_centroid(ds).to_pandas().sort_values(
            "vec_id").reset_index(drop=True)
        outs.append(out)
    assert outs[0].equals(outs[1])
    out = outs[0]
    assert len(out) == len(labs) // 5  # the held-out fifth
    assert out.correct.mean() >= 0.95  # blobs are separable


def test_hot_cluster_sharding_exact_and_bounded(ray_session):
    """Round-4 verdict #7: a deliberately COLLAPSED clustering (k=1 →
    every vector in one cluster) must (a) split the pairwise work into
    block×block tiles whose per-task row count stays under the budget,
    and (b) return exactly what the single-Gram path returns."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from goobi_viewer_indexer_ray.stages import kmeans as km

    rng = np.random.default_rng(7)
    n, dim = 600, 8
    base = rng.integers(-40, 40, (6, dim))
    vecs = base[np.arange(n) % 6] + rng.integers(-2, 3, (n, dim))
    rows = [
        {"vec_id": i, "embedding": [float(x) for x in vecs[i]]}
        for i in range(n)
    ]
    ds = lambda: ray.data.from_items(rows).repartition(4)  # noqa: E731

    # reference: the untiled path (tile bound above n → no hot cluster)
    ref = (
        km.semantic_dedup(ds(), k=1, iters=1, tile=10_000)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # tiled: tile=64 → B=⌈600/64⌉=10 blocks, 55 tile pairs
    got = (
        km.semantic_dedup(ds(), k=1, iters=1, tile=64)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert got.equals(ref)
    assert (got["cluster"] == 0).all()
    # sanity: the threshold actually splits the corpus (dups AND keeps)
    assert 0 < got["keep"].sum() < n

    # per-task row budget: the largest (cluster, blk_a, blk_b) group in
    # the fan-out is ≤ ~2 tiles of rows (verified directly on the keys)
    ids = np.arange(n, dtype=np.int64)
    blk = km._splitmix_block(ids, 10)
    counts = np.bincount(blk, minlength=10)
    assert counts.max() * 2 <= 4 * 64  # every tile pair ≤ 2 blocks' rows


def test_kmeans_silhouette_semantics(ray_session):
    """Silhouette: scores live in [0, 10000], Σn == corpus size, and a
    perfectly separated 2-blob corpus scores near-10000 everywhere
    (b² ≫ a²); partition-invariant like every kmeans output."""
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.kmeans import kmeans_silhouette

    rng = np.random.default_rng(3)
    a = rng.normal(0.0, 0.01, size=(40, 8)) + 1.0
    b = rng.normal(0.0, 0.01, size=(40, 8)) - 1.0
    m = np.vstack([a, b]).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(80, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in m]),
        }
    )
    out = (
        kmeans_silhouette(rd.from_arrow(t), k=2, iters=2)
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    assert out.n.sum() == 80
    assert (out.min_s_bp >= 0).all() and (out.max_s_bp <= 10000).all()
    # tight separated blobs: every point's own-centroid distance is
    # tiny vs the other blob's centroid
    assert (out.min_s_bp > 9000).all()
    # partition invariance (bit-exact integer contract)
    out13 = (
        kmeans_silhouette(rd.from_arrow(t).repartition(13), k=2, iters=2)
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    assert out.equals(out13)
