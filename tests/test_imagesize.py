"""Header-only image dims (ImageSizeReader.java transposition)."""

import struct

import pytest

from goobi_viewer_indexer_ray.stages.imagesize import (
    encode_bmp,
    encode_gif_shell,
    encode_jp2_shell,
    encode_jpeg_shell,
    encode_png,
    encode_ppm,
    encode_tiff_shell,
    image_dims,
    image_orientation,
)
from goobi_viewer_indexer_ray.stages.multimodal import decode_bmp, sniff_mime

ENCODERS = {
    "png": encode_png,
    "jpeg": encode_jpeg_shell,
    "gif": encode_gif_shell,
    "bmp": encode_bmp,
    "ppm": encode_ppm,
    "tiff": encode_tiff_shell,
    "jp2": encode_jp2_shell,
}


@pytest.mark.parametrize("fmt", sorted(ENCODERS))
@pytest.mark.parametrize("w,h", [(1, 1), (16, 9), (640, 480), (33, 257)])
def test_roundtrip_dims(fmt, w, h):
    assert image_dims(ENCODERS[fmt](w, h)) == (w, h)


def test_bmp_writer_is_decodable():
    img = decode_bmp(encode_bmp(7, 5))
    assert img.shape == (5, 7, 3)


def test_bmp_topdown_negative_height():
    p = bytearray(encode_bmp(6, 4))
    struct.pack_into("<i", p, 22, -4)
    assert image_dims(bytes(p)) == (6, 4)


def test_jpeg_skips_non_sof_segments():
    # writer already inserts APP0 before SOF0; add a COM segment too
    p = encode_jpeg_shell(100, 50)
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    p = p[:2] + com + p[2:]
    assert image_dims(p) == (100, 50)


def test_jpeg_progressive_sof2():
    p = bytearray(encode_jpeg_shell(31, 17))
    i = bytes(p).find(b"\xff\xc0")
    p[i + 1] = 0xC2  # progressive DCT frame marker
    assert image_dims(bytes(p)) == (31, 17)


def test_tiff_both_byte_orders_and_orientation():
    for be in (False, True):
        p = encode_tiff_shell(123, 45, orientation=6, big_endian=be)
        assert image_dims(p) == (123, 45)
        assert image_orientation(p) == 6


def test_ppm_comment_header():
    assert image_dims(b"P6 # c\n# more\n12 8 255 " + b"\x00" * (12 * 8 * 3)) == (12, 8)


def test_unknown_and_truncated_return_none():
    assert image_dims(b"") is None
    assert image_dims(b"not an image at all") is None
    assert image_dims(b"\x89PNG\r\n\x1a\n\x00\x00") is None  # truncated PNG
    assert image_dims(b"\xff\xd8\xff\xe0\x00") is None  # truncated JPEG
    assert image_orientation(b"GIF89a") is None


def test_writers_sniff_as_expected():
    assert sniff_mime(encode_png(2, 2)) == "image/png"
    assert sniff_mime(encode_jpeg_shell(2, 2)) == "image/jpeg"
    assert sniff_mime(encode_gif_shell(2, 2)) == "image/gif"
    assert sniff_mime(encode_bmp(2, 2)) == "image/bmp"
    assert sniff_mime(encode_ppm(2, 2)) == "image/x-portable-pixmap"


def test_png_codec_roundtrip_all_filters():
    """Real PNG codec: 40-image fuzz through BOTH the mixed-filter
    writer (every unfilter path: None/Sub/Up/Average/Paeth) and the
    trivial-filter writer; exact pixel equality."""
    import numpy as np

    from goobi_viewer_indexer_ray.stages.imagesize import (
        decode_png_pixels,
        encode_png_rgb,
    )

    rng = np.random.default_rng(11)
    for _ in range(40):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for mf in (True, False):
            back = decode_png_pixels(encode_png_rgb(img, mixed_filters=mf))
            assert back.shape == (h, w, 3)
            assert np.array_equal(back, img)


def test_png_decoder_rejects_variants():
    import pytest

    from goobi_viewer_indexer_ray.stages.imagesize import decode_png_pixels

    with pytest.raises(ValueError):
        decode_png_pixels(b"not a png at all")
    with pytest.raises(ValueError):
        decode_png_pixels(b"\x89PNG\r\n\x1a\ntruncated")


def test_png_decoder_gray_and_rgba():
    """Hand-built filter-0 PNGs for color types 0 (gray) and 6
    (RGBA) — the decoder's non-RGB paths."""
    import struct
    import zlib

    import numpy as np

    from goobi_viewer_indexer_ray.stages.imagesize import (
        _png_chunk,
        decode_png_pixels,
    )

    def build(w, h, ctype, channels, pix):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        raw = b"".join(b"\x00" + pix[y].tobytes() for y in range(h))
        return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(raw))
                + _png_chunk(b"IEND", b""))

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_png_pixels(build(4, 3, 0, 1, gray))
    assert out.shape == (3, 4, 1) and np.array_equal(out[:, :, 0], gray)
    rgba = (np.arange(3 * 2 * 4) % 256).astype(np.uint8).reshape(2, 3 * 4)
    out = decode_png_pixels(build(3, 2, 6, 4, rgba))
    assert out.shape == (2, 3, 4)
    assert np.array_equal(out.reshape(2, 12), rgba)


def test_gif_lzw_codec_roundtrip():
    """Real GIF LZW: 60-image fuzz across palette sizes, plus a
    repetitive image large enough to force 4096-entry dictionary
    resets, plus variant rejection."""
    import numpy as np
    import pytest

    from goobi_viewer_indexer_ray.stages.imagesize import (
        decode_gif_pixels,
        encode_gif_lzw,
    )

    rng = np.random.default_rng(5)
    for _ in range(60):
        h, w = int(rng.integers(1, 60)), int(rng.integers(1, 60))
        ncol = int(rng.choice([2, 4, 16, 64, 256]))
        img = rng.integers(0, ncol, (h, w)).astype(np.uint8)
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        back, bpal = decode_gif_pixels(encode_gif_lzw(img, pal))
        assert np.array_equal(back, img)
        assert np.array_equal(bpal[:ncol], pal)
    big = np.tile(np.arange(16, dtype=np.uint8), (200, 50))
    back, _ = decode_gif_pixels(encode_gif_lzw(big))
    assert np.array_equal(back, big)
    with pytest.raises(ValueError):
        decode_gif_pixels(b"GIF89a\x00\x00")
    with pytest.raises(ValueError):
        decode_gif_pixels(b"not a gif")


def test_gif_feeds_media_extractor():
    """image/gif now takes the REAL decode path in auto/real mode."""
    import numpy as np
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.imagesize import encode_gif_lzw
    from goobi_viewer_indexer_ray.stages.multimodal import MediaFeatureExtractor

    img = np.zeros((8, 8), np.uint8)
    img[:, :4] = 255  # left bright on the gray-ramp palette
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "uri": pa.array(["g"], pa.string()),
        "payload": pa.array([encode_gif_lzw(img)], pa.binary()),
        "mime": pa.array([""], pa.string()),
    })
    out = MediaFeatureExtractor(dim=8, mode="real")(t)
    assert out.column("mime_sniffed").to_pylist() == ["image/gif"]
    feats = np.array(out.column("feature").to_pylist())[0]
    assert feats[0] > 0.9 and feats[3] < 0.05


def test_tiff_gray_codec_roundtrip():
    """Baseline uncompressed-strip TIFF: 40-image fuzz, dims-probe
    agreement, and variant rejection."""
    import numpy as np
    import pytest

    from goobi_viewer_indexer_ray.stages.imagesize import (
        decode_tiff_gray,
        encode_tiff_gray,
        image_dims,
        image_format,
    )

    rng = np.random.default_rng(9)
    for _ in range(40):
        h, w = int(rng.integers(1, 80)), int(rng.integers(1, 80))
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        buf = encode_tiff_gray(img)
        assert np.array_equal(decode_tiff_gray(buf), img)
        assert image_format(buf) == "tiff" and image_dims(buf) == (w, h)
    with pytest.raises(ValueError):
        decode_tiff_gray(b"II*\x00bogus")
    with pytest.raises(ValueError):
        decode_tiff_gray(b"not a tiff")


def test_png_batch_codec_identity():
    """Round-5: the vectorized batch paths must be byte/pixel-identical
    to the per-image codecs — encode_png_rgb_batch writes the SAME
    bytes, decode_png_pixels_batch recovers the SAME pixels, and
    corrupt payloads map to None (error-folder skip), never raise."""
    import numpy as np

    from goobi_viewer_indexer_ray.stages.imagesize import (
        decode_png_pixels,
        decode_png_pixels_batch,
        encode_png_rgb,
        encode_png_rgb_batch,
    )

    rng = np.random.default_rng(11)
    imgs = np.stack(
        [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(37)]
    )
    singles = [encode_png_rgb(im) for im in imgs]
    batch = encode_png_rgb_batch(imgs)
    assert singles == batch  # byte-identical payloads
    # mixed shapes + corrupt entries through the batch decoder
    big = rng.integers(0, 256, (24, 10, 3), dtype=np.uint8)
    payloads = [batch[0], b"\x89PNG\r\n\x1a\nbogus", encode_png_rgb(big),
                batch[1], b"not a png at all"]
    out = decode_png_pixels_batch(payloads)
    assert np.array_equal(out[0], imgs[0])
    assert out[1] is None and out[4] is None
    assert np.array_equal(out[2], big)
    assert np.array_equal(out[3], imgs[1])
    # batch result equals the single-image decoder on every good payload
    for p, o in zip(payloads, out):
        if o is not None:
            assert np.array_equal(decode_png_pixels(p), o)


def test_png_unfilter_heterogeneous_filters():
    """Images in one batch group may use DIFFERENT filters on the same
    row index — the vectorized kernel masks per filter type."""
    import numpy as np

    from goobi_viewer_indexer_ray.stages.imagesize import (
        decode_png_pixels_batch,
        encode_png_rgb,
    )

    rng = np.random.default_rng(12)
    imgs = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(6)]
    # alternate mixed-filter and all-None payloads: same shape, so they
    # land in one _unfilter_rows group with heterogeneous filter bytes
    payloads = [
        encode_png_rgb(im, mixed_filters=(i % 2 == 0))
        for i, im in enumerate(imgs)
    ]
    out = decode_png_pixels_batch(payloads)
    for im, o in zip(imgs, out):
        assert np.array_equal(o, im)
