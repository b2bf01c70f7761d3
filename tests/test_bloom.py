"""Bloom filter: no false negatives, documented false positives,
partition-invariant build."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(keys):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"url": pa.array(keys, pa.string())})
    )


def test_bloom_no_false_negatives(ray_session):
    from goobi_viewer_indexer_ray.stages.bloom import bloom_build, bloom_probe

    ins = [f"https://h/{i}" for i in range(500)]
    bm = bloom_build(_ds(ins), key_col="url", m_bits=1 << 14)
    out = bloom_probe(_ds(ins), bm, key_col="url").to_pandas()
    assert out["maybe_seen"].all()  # every inserted key probes true


def test_bloom_fp_rate_bounded(ray_session):
    from goobi_viewer_indexer_ray.stages.bloom import bloom_build, bloom_probe

    ins = [f"https://h/{i}" for i in range(500)]
    other = [f"https://x/{i}" for i in range(2000)]
    bm = bloom_build(_ds(ins), key_col="url", m_bits=1 << 14)
    out = bloom_probe(_ds(other), bm, key_col="url").to_pandas()
    # m/n = 32.8 bits/key, k=4 -> theoretical fp ~0.24%; allow 5x slack
    assert out["maybe_seen"].mean() < 0.012


def test_bloom_build_partition_invariant(ray_session):
    from goobi_viewer_indexer_ray.stages.bloom import bloom_build

    ins = [f"https://h/{i}" for i in range(300)]
    one = bloom_build(_ds(ins), key_col="url", m_bits=1 << 13)
    many = bloom_build(_ds(ins).repartition(8), key_col="url", m_bits=1 << 13)
    assert np.array_equal(one, many)


def test_bloom_rejects_bad_m(ray_session):
    from goobi_viewer_indexer_ray.stages.bloom import bloom_build

    with pytest.raises(ValueError):
        bloom_build(_ds(["a"]), key_col="url", m_bits=100)
