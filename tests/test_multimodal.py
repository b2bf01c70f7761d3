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
    # JPEG has no stdlib decoder → the stub raises; PNG/BMP/PPM/WAV
    # are REAL decoders now (see decode_png_pixels), and a garbage
    # PNG payload raises ValueError (corrupt), not NotImplementedError
    ex = MediaFeatureExtractor(deterministic_fake=False)
    jpg_only = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "uri": pa.array(["j"], pa.string()),
            "payload": pa.array([JPG], pa.binary()),
            "mime": pa.array([""], pa.string()),
        }
    )
    with pytest.raises(NotImplementedError):
        ex(jpg_only)
    with pytest.raises(ValueError):
        ex(_media_table(3))  # row 0 is a garbage PNG → corrupt error


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


def _wav_bytes(freq=440.0, rate=8000, secs=0.25):
    import io
    import wave

    import numpy as _np

    t = _np.arange(int(rate * secs)) / rate
    samples = (_np.sin(2 * _np.pi * freq * t) * 32000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _bmp_bytes(w=8, h=6):
    import struct

    import numpy as _np

    img = _np.zeros((h, w, 3), _np.uint8)
    img[:, : w // 2] = (255, 0, 0)  # left half red
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][:, ::-1].tobytes()  # RGB→BGR
        rows += row + b"\x00" * (stride - len(row))
    pix_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pix_off + len(rows), 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + dib + rows


def test_real_wav_decode():
    from goobi_viewer_indexer_ray.stages.multimodal import decode_wav

    a, rate = decode_wav(_wav_bytes())
    assert rate == 8000 and a.size == 2000
    assert 0.6 < np.sqrt(np.mean(a**2)) < 0.8  # sine RMS ≈ 0.69


def test_real_bmp_ppm_decode():
    from goobi_viewer_indexer_ray.stages.multimodal import decode_bmp, decode_ppm, resize_gray

    img = decode_bmp(_bmp_bytes())
    assert img.shape == (6, 8, 3)
    assert (img[0, 0] == [255, 0, 0]).all() and (img[0, 7] == [0, 0, 0]).all()
    ppm = b"P6 8 6 255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(ppm), img)
    g = resize_gray(img, 4, 4)
    assert g.shape == (4, 4)
    assert g[0, 0] > g[0, 3]  # red half brighter than black half


def test_real_mode_features():
    from goobi_viewer_indexer_ray.stages.multimodal import MediaFeatureExtractor

    from goobi_viewer_indexer_ray.stages.imagesize import encode_png_rgb

    wav, bmp = _wav_bytes(), _bmp_bytes()
    png_img = np.zeros((8, 8, 3), np.uint8)
    png_img[:, :4] = 255  # left half bright, right dark
    real_png = encode_png_rgb(png_img)
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2, 3], pa.int64()),
            "uri": pa.array(["w", "b", "p", "g"], pa.string()),
            "payload": pa.array([wav, bmp, real_png, PNG], pa.binary()),
            "mime": pa.array(["", "", "", ""], pa.string()),
        }
    )
    out = MediaFeatureExtractor(dim=8, mode="auto")(t)
    assert out.column("mime_sniffed").to_pylist() == [
        "audio/wav", "image/bmp", "image/png", "image/png",
    ]
    feats = np.array(out.column("feature").to_pylist())
    assert abs(feats[0][0] - 0.25) < 1e-6  # wav duration seconds
    assert 0.6 < feats[0][2] < 0.8  # rms
    # bmp: first pooled cell bright (red half), last dark
    assert feats[1][0] > 0.2 and feats[1][3] < 0.05
    # REAL png decode: left pooled cells bright, right dark (dim=8
    # keeps only the first two pooled rows of the 4×4 grid)
    assert feats[2][0] > 0.9 and feats[2][3] < 0.05
    # garbage PNG: real mode raises corrupt error; auto fell back above
    with pytest.raises(ValueError):
        MediaFeatureExtractor(dim=8, mode="real")(t.slice(3, 1))
    # JPEG is still the documented stub
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(dim=8, mode="real")(
            pa.table({"media_id": pa.array([9], pa.int64()),
                      "uri": pa.array(["j"], pa.string()),
                      "payload": pa.array([JPG], pa.binary()),
                      "mime": pa.array([""], pa.string())}))


def test_rawv_roundtrip_and_header():
    from goobi_viewer_indexer_ray.stages.multimodal import decode_rawv_header, encode_rawv

    frames = (np.arange(3 * 4 * 5) % 256).astype(np.uint8).reshape(3, 4, 5)
    payload = encode_rawv(frames)
    assert decode_rawv_header(payload) == (3, 4, 5)
    back = np.frombuffer(payload[16:], np.uint8).reshape(3, 4, 5)
    assert np.array_equal(back, frames)
    with pytest.raises(NotImplementedError):
        decode_rawv_header(b"\x1a\x45\xdf\xa3webm-ish")  # compressed container
    with pytest.raises(ValueError):
        decode_rawv_header(payload[:-1])  # truncated plane


def test_frame_sampler_stride_and_skip():
    from goobi_viewer_indexer_ray.stages.multimodal import FrameSampler, encode_rawv

    frames = np.stack([np.full((2, 3), v, np.uint8) for v in (10, 20, 30, 40, 50)])
    t = pa.table(
        {
            "media_id": pa.array([7, 8], pa.int64()),
            "payload": pa.array([encode_rawv(frames), b"notvideo"], pa.binary()),
        }
    )
    out = FrameSampler(every_k=2)(t)
    assert out.column("media_id").to_pylist() == [7, 7, 7]  # corrupt row 8 skipped
    assert out.column("frame_idx").to_pylist() == [0, 2, 4]
    assert out.column("sum_px").to_pylist() == [60, 180, 300]  # v * h * w
    assert out.column("height").to_pylist() == [2, 2, 2]
    assert out.column("width").to_pylist() == [3, 3, 3]


def test_ahash_noise_invariance_and_dup_stats(ray_session):
    """aHash erases sparse low-amplitude noise (same hash), separates
    a structurally different image (different hash), skips corrupt
    payloads, and the dup-stats fold is partition-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from goobi_viewer_indexer_ray.stages.multimodal import (
        AHash,
        ahash_dup_stats,
    )

    j = np.arange(768, dtype=np.int64)
    # bimodal base (left half dark, right half bright): block sums sit
    # far from the global mean, so sparse +17 noise cannot flip a bit
    col = (j // 3) % 16
    base = np.where(col < 8, 20 + (j % 31), 220 + (j % 23))
    noisy = np.where(j % 53 == 1, np.minimum(base + 17, 255), base)
    other = np.where(col < 8, 220 + (j % 23), 20 + (j % 31))  # mirrored
    def ppm(vals):
        return b"P6\n16 16\n255\n" + vals.astype(np.uint8).tobytes()
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3, 4], pa.int64()),
            "payload": pa.array(
                [ppm(base), ppm(noisy), ppm(other), b"P6 corrupt"],
                pa.binary()),
        }
    )
    outs = []
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        hashed = ds.map_batches(AHash, concurrency=1,
                                batch_format="pyarrow")
        out = ahash_dup_stats(hashed).to_pandas().sort_values(
            "media_id").reset_index(drop=True)
        outs.append(out)
    assert outs[0].equals(outs[1])
    out = outs[0].set_index("media_id")
    assert list(out.index) == [1, 2, 3]  # corrupt skipped
    assert (out.loc[1, ["hash_hi", "hash_lo"]].to_numpy()
            == out.loc[2, ["hash_hi", "hash_lo"]].to_numpy()).all()
    assert (out.loc[1, ["hash_hi", "hash_lo"]].to_numpy()
            != out.loc[3, ["hash_hi", "hash_lo"]].to_numpy()).any()
    assert out.loc[1, "is_dup"] == 0 and out.loc[2, "is_dup"] == 1
    assert out.loc[2, "canon"] == 1 and out.loc[2, "n_same"] == 2
    assert out.loc[3, "is_dup"] == 0 and out.loc[3, "n_same"] == 1


def test_audio_features_known_signal():
    """AudioFeatures on a hand-built signal: planted loud frame wins,
    zero-crossing count exact, corrupt + non-PCM16 payloads skipped."""
    import numpy as np
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.multimodal import (
        AudioFeatures,
        encode_wav_pcm16,
    )

    # 3 frames of 256: quiet, loud (planted peak), quiet; x alternates
    # sign every sample → zc = n - 1
    x = np.full(768, 1, np.int64)
    x[1::2] = -1
    x[256:512] *= 1000
    wav = encode_wav_pcm16(x, 8000)
    batch = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([wav, b"RIFFgarbage"], pa.binary()),
    })
    out = AudioFeatures()(batch).to_pydict()
    assert out["media_id"] == [0]          # corrupt decoy skipped
    assert out["n_samples"] == [768] and out["sample_rate"] == [8000]
    assert out["zero_crossings"] == [767]
    assert out["peak_frame"] == [1]
    assert out["peak_energy"] == [256 * 1000 * 1000]
    assert out["sum_abs"] == [512 + 256 * 1000]
    assert out["max_abs"] == [1000]


def test_audio_peak_tie_lowest_frame():
    import numpy as np
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.multimodal import (
        AudioFeatures,
        encode_wav_pcm16,
    )

    x = np.full(512, 7, np.int64)          # two identical-energy frames
    batch = pa.table({"media_id": pa.array([5], pa.int64()),
                      "payload": pa.array([encode_wav_pcm16(x, 12000)],
                                          pa.binary())})
    out = AudioFeatures()(batch).to_pydict()
    assert out["peak_frame"] == [0] and out["zero_crossings"] == [0]


def test_tiff_feeds_media_extractor():
    import numpy as np
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.imagesize import encode_tiff_gray
    from goobi_viewer_indexer_ray.stages.multimodal import MediaFeatureExtractor

    img = np.zeros((8, 8), np.uint8)
    img[:, :4] = 255
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "uri": pa.array(["t"], pa.string()),
        "payload": pa.array([encode_tiff_gray(img)], pa.binary()),
        "mime": pa.array([""], pa.string()),
    })
    out = MediaFeatureExtractor(dim=8, mode="real")(t)
    assert out.column("mime_sniffed").to_pylist() == ["image/tiff"]
    feats = np.array(out.column("feature").to_pylist())[0]
    assert feats[0] > 0.9 and feats[3] < 0.05


def test_ahash_batch_decoder_matches_per_payload(ray_session):
    """AHash(batch_decoder=...) must hash identically to the
    per-payload decoder path, and skip corrupt payloads the same way."""
    import numpy as np
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.imagesize import (
        decode_png_pixels,
        decode_png_pixels_batch,
        encode_png_rgb,
    )
    from goobi_viewer_indexer_ray.stages.multimodal import AHash

    rng = np.random.default_rng(21)
    payloads = [encode_png_rgb(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
                for _ in range(9)]
    payloads.insert(4, b"\x89PNG\r\n\x1a\nbogus")
    t = pa.table({"media_id": pa.array(list(range(10)), pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    a1 = AHash(decoder=decode_png_pixels)(t)
    a2 = AHash(batch_decoder=decode_png_pixels_batch)(t)
    assert a1.equals(a2)
    assert 4 not in a1.column("media_id").to_pylist()  # corrupt skipped


def test_pil_decoder_plumbing():
    """decoder='pil' (round-4 verdict #3): when Pillow is installed the
    PIL path must be pixel-identical to the self-contained codecs;
    without it, actor construction fails LOUDLY with ImportError (the
    documented gate), never silently falls back."""
    import pytest

    from goobi_viewer_indexer_ray.stages.multimodal import AHash, MediaFeatureExtractor

    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False

    if not has_pil:
        with pytest.raises(ImportError, match="Pillow"):
            AHash(decoder="pil")
        with pytest.raises(ImportError, match="Pillow"):
            MediaFeatureExtractor(mode="pil")
        return

    import numpy as np
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.imagesize import decode_png_pixels, encode_png_rgb

    rng = np.random.default_rng(31)
    payloads = [encode_png_rgb(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
                for _ in range(6)]
    t = pa.table({"media_id": pa.array(list(range(6)), pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    ours = AHash(decoder=decode_png_pixels)(t)
    pil = AHash(decoder="pil")(t)
    assert ours.equals(pil)  # pixel-identical → hash-identical
    mfe_real = MediaFeatureExtractor(mode="real")(t)
    mfe_pil = MediaFeatureExtractor(mode="pil")(t)
    assert mfe_real.column("feature").equals(mfe_pil.column("feature"))


def test_image_entropy_semantics():
    """ImageEntropy: solid image → 0 bits / 1 distinct level;
    half-half two-level image → exactly 1 bit; corrupt payload
    skipped; batch decoder path identical to per-payload."""
    import numpy as np
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.imagesize import (
        decode_png_pixels,
        decode_png_pixels_batch,
        encode_png_rgb_batch,
    )
    from goobi_viewer_indexer_ray.stages.multimodal import ImageEntropy

    solid = np.full((16, 16, 3), 100, np.uint8)
    half = np.full((16, 16, 3), 10, np.uint8)
    half[8:] = 200
    payloads = encode_png_rgb_batch(np.stack([solid, half]))
    batch = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array(list(payloads) + [b"\x89PNGbogus"], pa.binary()),
        }
    )
    out = ImageEntropy(batch_decoder=decode_png_pixels_batch)(batch).to_pydict()
    assert out["media_id"] == [1, 2]  # corrupt decoy skipped
    assert out["n_px"] == [256, 256]
    assert out["n_distinct"] == [1, 2]
    assert out["modal_n"] == [256, 128]
    assert out["entropy_bits"] == [0.0, 1.0]
    # per-payload decoder path agrees
    out2 = ImageEntropy(decoder=decode_png_pixels)(batch).to_pydict()
    assert out == out2
