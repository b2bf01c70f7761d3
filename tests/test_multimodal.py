"""Multimodal plumbing tests: real Ray actor-pool stage over binary
payloads; decode stubbed behind a deterministic fake (no media libs in
this environment — the stub raises NotImplementedError when asked for
the real decoder)."""

import numpy as np
import pyarrow as pa
import pytest

from goobi_viewer_indexer_ray.stages.multimodal import (
    MEDIA_FEATURES_SCHEMA,
    MediaFeatureExtractor,
    sniff_mime,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
JPG = b"\xff\xd8\xff\xe0" + b"\x01" * 128
WAV = b"RIFF" + b"\x02" * 32


def _media_table(n=30):
    payloads = [(PNG, "a"), (JPG, "b"), (WAV, "c")]
    rows = [(i, f"s3://bucket/{payloads[i % 3][1]}{i}", payloads[i % 3][0] + bytes([i % 251]))
            for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "uri": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
            "mime": pa.array(["" for _ in rows], pa.string()),
        }
    )


def test_sniff():
    assert sniff_mime(PNG) == "image/png"
    assert sniff_mime(JPG) == "image/jpeg"
    assert sniff_mime(WAV) == "audio/wav"
    assert sniff_mime(b"junk") == "application/octet-stream"


def test_real_decoder_is_stubbed():
    ex = MediaFeatureExtractor(deterministic_fake=False)
    with pytest.raises(NotImplementedError):
        ex(_media_table(3))


def test_fake_features_deterministic():
    ex = MediaFeatureExtractor(dim=16)
    t1, t2 = ex(_media_table()), ex(_media_table())
    assert t1.equals(t2)
    assert t1.schema.equals(MEDIA_FEATURES_SCHEMA)
    feats = np.array(t1.column("feature").to_pylist())
    assert feats.shape == (30, 16)
    # distinct payloads → distinct features
    assert len({tuple(f) for f in feats}) == 30


def test_actor_pool_stage(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_media_table(64)).repartition(4)
    out = ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"dim": 8},
        batch_format="pyarrow",
        batch_size=8,  # media rows are wide: small batches (memory-aware)
        concurrency=2,
        num_cpus=1,
    ).to_pandas()
    assert len(out) == 64
    assert set(out["mime_sniffed"]) == {"image/png", "image/jpeg", "audio/wav"}
    assert out["payload_sha1"].nunique() == 64
