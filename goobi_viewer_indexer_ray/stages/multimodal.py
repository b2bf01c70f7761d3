"""Multimodal (image/audio/video) columns as opaque binary + metadata.

Driver-brief first-class operator family: treat media payloads as
``binary`` columns with typed metadata, and run decode / feature
extraction / resize / frame-sampling as actor-pool ``map_batches``
stages.  REAL stdlib-only decode kernels cover PCM WAV (``wave``),
uncompressed 24-bit BMP and binary PPM (numpy header parsing) — with a
block-mean ``resize_gray`` kernel; compressed formats (JPEG/PNG/MP3/
WebM) have no codec in this environment and raise
``NotImplementedError`` at the documented integration point (swap in
PIL/soundfile there), with a deterministic fake fallback in ``auto``
mode.  Everything Ray-side is real and tested: schema, batch sizing
for large payloads, actor signature, zero-copy binary handling, and
output layout.

Batch-size note (SURVEY.md "memory-aware"): media rows are wide —
size ``batch_size`` so ``batch_size × avg_payload × concurrency``
fits worker heaps (e.g. 8-32 rows for multi-MB images), and keep
``batch_format="pyarrow"`` so payloads stay off the Python heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "MEDIA_SCHEMA",
    "MEDIA_FEATURES_SCHEMA",
    "FrameSampler",
    "AHash",
    "DHash",
    "ahash_dup_stats",
    "SilenceSegments",
    "MediaFeatureExtractor",
    "decode_rawv_header",
    "encode_rawv",
    "sniff_mime",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("uri", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
    ]
)

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime_sniffed", pa.string()),
        ("n_bytes", pa.int64()),
        ("payload_sha1", pa.string()),
        ("feature", pa.list_(pa.float32())),  # decoder embedding (fake/stub)
    ]
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"BM", "image/bmp"),
    (b"P6", "image/x-portable-pixmap"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
    (b"<svg", "image/svg+xml"),
]


def sniff_mime(payload: bytes) -> str:
    """Magic-byte mime sniffing (the reference's mime probing analog,
    ``Indexer.java:1032-1177`` / ``ImageSizeReader.java``)."""
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


# ------------------------------------------------ stdlib-only decoders
# No image/audio libraries exist in this environment, so the REAL
# decode path covers the formats decodable with stdlib + numpy alone:
# PCM WAV (``wave``), uncompressed 24-bit BMP, and binary PPM (P6).
# Compressed formats (JPEG/PNG/GIF/MP3/WebM) still raise
# NotImplementedError from ``_real_decode`` — swap in PIL/soundfile
# at the same integration point when available.


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (mono float64 samples in [-1, 1], sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        n, ch, width, rate = w.getnframes(), w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(n)
    if width == 1:
        a = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        a = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif width == 4:
        a = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    if ch > 1:
        a = a.reshape(-1, ch).mean(axis=1)
    return a, rate


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP bytes → (h, w, 3) uint8 RGB."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr = struct.unpack_from("<iihh I", payload, 18)  # w, h, planes, bpp, compression
    w, h, _planes, bpp, comp = hdr
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp}, comp={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=stride * h, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return img[::-1] if flip else img


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) bytes → (h, w, 3) uint8 RGB.

    The header is parsed POSITIONALLY (walk 4 whitespace-separated
    tokens, then exactly one whitespace byte) — never by searching for
    the maxval's byte string, which can match the width/height token
    first (e.g. width 255, maxval 255) and shift every pixel.
    ``#`` comment lines (allowed anywhere in the header per the netpbm
    spec) are skipped.
    """
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    from .imagesize import ppm_header_ints  # the ONE header tokenizer

    vals, pos = ppm_header_ints(payload, 3)
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    head = pos + 1  # exactly ONE whitespace byte after maxval per spec
    return np.frombuffer(payload, np.uint8, count=w * h * 3, offset=head).reshape(h, w, 3)


def resize_gray(img: np.ndarray, out_h: int = 4, out_w: int = 4) -> np.ndarray:
    """(h, w[, 3]) image → (out_h, out_w) block-mean grayscale in [0, 1]
    (the resize kernel; vectorized bucketed mean, no interpolation lib)."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    h, w = img.shape
    ys = (np.arange(h) * out_h) // max(h, 1)
    xs = (np.arange(w) * out_w) // max(w, 1)
    out = np.zeros((out_h, out_w), np.float64)
    cnt = np.zeros((out_h, out_w), np.float64)
    np.add.at(out, (ys[:, None], xs[None, :]), img)
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
    return out / np.maximum(cnt, 1.0) / 255.0


def _pad(v: np.ndarray, dim: int) -> np.ndarray:
    out = np.zeros(dim, np.float32)
    out[: min(dim, v.size)] = v[:dim]
    return out


def _real_decode(payload: bytes, mime: str, dim: int) -> np.ndarray:
    """Decode + featurize the stdlib-decodable formats.

    Features are deterministic hand-rolled descriptors (4×4 mean-pool
    grayscale for images; duration/rate/energy stats for audio) —
    the model-embedding integration point at cluster scale, with the
    same actor signature.
    """
    if mime == "audio/wav":
        a, rate = decode_wav(payload)
        n = a.size
        zc = float(np.mean(np.signbit(a[1:]) != np.signbit(a[:-1]))) if n > 1 else 0.0
        v = np.array(
            [n / max(rate, 1), rate / 1e5, float(np.sqrt(np.mean(a**2))) if n else 0.0,
             float(np.mean(np.abs(a))) if n else 0.0, zc,
             float(np.max(np.abs(a))) if n else 0.0],
            np.float64,
        )
        return _pad(v, dim)
    if mime in ("image/bmp", "image/x-portable-pixmap", "image/png",
                "image/gif", "image/tiff"):
        if mime == "image/bmp":
            img = decode_bmp(payload)
        elif mime == "image/png":
            from .imagesize import decode_png_pixels

            img = decode_png_pixels(payload)
            if img.shape[2] == 1:  # gray → replicate to RGB contract
                img = np.repeat(img, 3, axis=2)
            img = img[:, :, :3]  # drop alpha for the gray pool
        elif mime == "image/gif":
            from .imagesize import decode_gif_pixels

            idx, pal = decode_gif_pixels(payload)
            img = pal[idx]  # palette gather → (h, w, 3)
        elif mime == "image/tiff":
            from .imagesize import decode_tiff_gray

            img = np.repeat(decode_tiff_gray(payload)[:, :, None], 3, axis=2)
        else:
            img = decode_ppm(payload)
        return _pad(resize_gray(img, 4, 4).reshape(-1), dim)
    raise NotImplementedError(
        f"no stdlib decoder for {mime}; plug a codec library into "
        "_real_decode (or use the deterministic fake for plumbing tests)"
    )


def _image_feature(img: np.ndarray, dim: int) -> np.ndarray:
    """RGB array → the same 4×4 mean-pool grayscale descriptor
    :func:`_real_decode` produces — so a Pillow-decoded image yields
    features identical to the self-contained codecs on the formats
    both can read (the pytest pin for ``mode="pil"``)."""
    return _pad(resize_gray(img, 4, 4).reshape(-1), dim)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in 'embedding': bytes → seeded vector.

    Pure function of the payload so tests and resumes are stable.
    """
    h = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "little"))
    return rng.standard_normal(dim).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize media payloads.

    Use as ``ds.map_batches(MediaFeatureExtractor,
    fn_constructor_kwargs={...}, concurrency=N, batch_size=8-32,
    num_cpus=1)`` — a callable class because real decoders load models
    in ``__init__`` (ST4 pattern).
    """

    def __init__(self, dim: int = 16, deterministic_fake: bool = True,
                 mode: str | None = None):
        """``mode``: "fake" (deterministic stand-in features), "real"
        (stdlib decoders; raises for undecodable formats), "auto"
        (real where a decoder exists, fake fallback otherwise — the
        robust pipeline default), or "pil" (Pillow decodes the image
        formats — including JPEG/WebP, which the self-contained codecs
        can't — loaded once per actor here in ``__init__``; audio
        still routes through the stdlib WAV path).
        ``deterministic_fake`` is the back-compat boolean alias for
        fake/real."""
        self.dim = dim
        self.mode = mode or ("fake" if deterministic_fake else "real")
        self._pil = _pil_decode_rgb() if self.mode == "pil" else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        feats, mimes, sizes, shas = [], [], [], []
        for buf in batch.column("payload"):
            payload = buf.as_py()
            mimes.append(sniff_mime(payload))
            sizes.append(len(payload))
            shas.append(hashlib.sha1(payload).hexdigest())
            if self.mode == "fake":
                feats.append(_fake_feature(payload, self.dim).tolist())
            elif self.mode == "pil":
                if mimes[-1].startswith("image/"):
                    feats.append(
                        _image_feature(self._pil(payload), self.dim).tolist()
                    )
                else:
                    feats.append(_real_decode(payload, mimes[-1], self.dim).tolist())
            elif self.mode == "real":
                feats.append(_real_decode(payload, mimes[-1], self.dim).tolist())
            else:  # auto
                import struct
                import wave

                try:
                    feats.append(_real_decode(payload, mimes[-1], self.dim).tolist())
                except (NotImplementedError, ValueError, EOFError, OSError,
                        IndexError, struct.error, wave.Error):
                    # undecodable format or corrupt payload → stand-in
                    # feature; genuine programming errors still propagate
                    feats.append(_fake_feature(payload, self.dim).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mime_sniffed": pa.array(mimes, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "payload_sha1": pa.array(shas, pa.string()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


# ------------------------------------------------------------- video

RAWV_MAGIC = b"RAWV"


def encode_rawv(frames: np.ndarray) -> bytes:
    """(n_frames, h, w) uint8 grayscale → RAWV container bytes.

    The engine's raw uncompressed video format: 16-byte header
    (``RAWV`` + uint32-LE n_frames, h, w) followed by the frame planes
    back to back.  It exists so the FRAME-SAMPLING plumbing — header
    parse, plane offsets, stride selection, per-frame stats — is real
    and testable without any codec; compressed containers (mp4/webm)
    raise at the documented integration point like compressed images
    do."""
    import struct

    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    return RAWV_MAGIC + struct.pack("<III", n, h, w) + f.tobytes()


def decode_rawv_header(payload: bytes) -> tuple[int, int, int]:
    """RAWV header → (n_frames, h, w); loud on anything else."""
    import struct

    if payload[:4] != RAWV_MAGIC or len(payload) < 16:
        raise NotImplementedError(
            "compressed video decode is an integration point — only the "
            "RAWV raw-frame container decodes in this environment"
        )
    n, h, w = struct.unpack("<III", payload[4:16])
    if len(payload) < 16 + n * h * w:
        raise ValueError("RAWV payload truncated")
    return n, h, w


class FrameSampler:
    """Actor-pool stage: sample every ``every_k``-th frame of RAWV
    video payloads and emit per-frame stats (uniform stride sampling —
    the standard video-curation move before a vision encoder).

    ``ds.map_batches(FrameSampler, fn_constructor_kwargs={"every_k": 4},
    concurrency=N, batch_size=4-16, num_cpus=1)`` — video payloads are
    large: keep ``batch_size × concurrency × payload`` inside the
    worker heap and let the object store spill the rest.  Frames are
    read by OFFSET from the payload buffer (one zero-copy
    ``np.frombuffer`` per sampled frame) — unsampled frames are never
    materialized.

    Emits one row per sampled frame: ``(media_id, frame_idx, height,
    width, sum_px)`` (integer pixel sum keeps downstream checks
    exact).  Undecodable payloads are SKIPPED (the reference moves bad
    records aside rather than crashing the indexer —
    ``Hotfolder.java`` error-folder behavior).
    """

    def __init__(self, every_k: int = 4):
        if every_k < 1:
            raise ValueError("every_k must be >= 1")
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        out_id, out_f, out_h, out_w, out_sum = [], [], [], [], []
        for mid, buf in zip(ids, batch.column("payload")):
            payload = buf.as_py()
            try:
                n, h, w = decode_rawv_header(payload)
            except (NotImplementedError, ValueError):
                continue  # undecodable → skipped (error-folder analog)
            plane = h * w
            mv = memoryview(payload)
            for fi in range(0, n, self.every_k):
                off = 16 + fi * plane
                frame = np.frombuffer(mv[off : off + plane], dtype=np.uint8)
                out_id.append(mid)
                out_f.append(fi)
                out_h.append(h)
                out_w.append(w)
                out_sum.append(int(frame.sum(dtype=np.int64)))
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_f, pa.int64()),
                "height": pa.array(out_h, pa.int64()),
                "width": pa.array(out_w, pa.int64()),
                "sum_px": pa.array(out_sum, pa.int64()),
            }
        )


def _pil_decode_rgb():
    """Pillow-backed image decoder factory (the ``decoder="pil"`` fast
    path): returns ``payload -> (h, w, 3) uint8`` or raises
    ImportError when Pillow is absent (this container ships no image
    libs — the plumbing is real and tested, the import is the gate)."""
    import io

    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "decoder='pil' requires Pillow; install it or use the "
            "self-contained codecs (decode_png_pixels / decode_ppm)"
        ) from e

    def decode(payload: bytes):
        import numpy as np

        try:
            with Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"), dtype=np.uint8)
        except Exception as e:  # PIL raises many types → uniform contract
            raise ValueError(f"pil decode failed: {e}") from e

    return decode


class AHash:
    """Actor-pool stage: image payload → 64-bit average hash — the
    image-modality member of the dedup family (aHash: 8×8 block means
    thresholded at the global mean; the integer-exact cousin of pHash
    used for near-dup image blocking at crawl scale).

    ALL arithmetic is integer (gray = channel SUM, block value = pixel
    SUM, bit = 64·block > total — no divisions), so every hash bit is
    bit-exact under any partitioning and replayable by a SQL oracle.
    The 64 bits pack into ``(hash_hi, hash_lo)`` int32 halves (signed
    BIGINT has no 64th bit).

    Decode runs through ``batch_decoder`` when given (one vectorized
    call for the whole batch — e.g.
    :func:`..stages.imagesize.decode_png_pixels_batch`, which
    unfilters all same-shape images in one numpy pass), else
    per-payload ``decoder``.  ``decoder="pil"`` selects a
    Pillow-backed fast path (loaded once per actor in ``__init__`` —
    the ST4 model-load pattern); it raises ``ImportError`` at actor
    construction when Pillow isn't installed, and is pytest-pinned
    pixel-identical to the self-contained codecs where it is.
    Corrupt payloads are skipped (error-folder analog).
    """

    def __init__(self, grid: int = 8, decoder=None, batch_decoder=None):
        self.grid = grid
        if decoder == "pil":
            decoder = _pil_decode_rgb()  # ImportError here = actor init
        self.decoder = decoder or decode_ppm
        self.batch_decoder = batch_decoder

    def _bits(self, bs: np.ndarray) -> np.ndarray:
        g = self.grid
        return (g * g * bs.ravel() > bs.sum()).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        ids = batch.column("media_id").to_numpy()
        payloads = batch.column("payload")
        out_id, out_hi, out_lo = [], [], []
        if self.batch_decoder is not None:
            try:
                imgs = self.batch_decoder([p.as_py() for p in payloads])
            except (ValueError, NotImplementedError):
                # a batch decoder that rejects the whole batch must
                # degrade to skip-all, not fail the Ray task (the
                # error-folder contract)
                imgs = [None] * len(payloads)
        else:
            imgs = None
        for i in range(len(ids)):
            if imgs is not None:
                img = imgs[i]
                if img is None:
                    continue  # corrupt decoy → skipped, not fatal
            else:
                try:
                    img = self.decoder(payloads[i].as_py())
                except (ValueError, NotImplementedError, IndexError):
                    continue  # corrupt decoy → skipped, not fatal
            h, w, _ = img.shape
            if h % g or w % g:
                continue
            gray = img.astype(np.int64).sum(axis=2)
            bs = gray.reshape(g, h // g, g, w // g).sum(axis=(1, 3))
            bits = self._bits(bs)
            lo = int((bits[:32] << np.arange(32, dtype=np.int64)).sum())
            hi = int((bits[32:] << np.arange(32, dtype=np.int64)).sum())
            out_id.append(int(ids[i]))
            out_hi.append(hi)
            out_lo.append(lo)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "hash_hi": pa.array(out_hi, pa.int64()),
                "hash_lo": pa.array(out_lo, pa.int64()),
            }
        )


class DHash(AHash):
    """Gradient (difference) hash over the same block grid: bit(r, c)
    = block[r][c] > block[r][(c+1) mod g] — the row-wise gradient
    signature.  Invariant to global brightness shifts (a +d on every
    pixel flips no dHash bit, while aHash bits near the mean can
    flip), which is why crawl-scale image dedup runs both.  Same
    decode paths, skip contract, and (hash_hi, hash_lo) packing as
    :class:`AHash`."""

    def _bits(self, bs: np.ndarray) -> np.ndarray:
        return (bs > np.roll(bs, -1, axis=1)).ravel().astype(np.int64)


def ahash_dup_stats(hashed):
    """Hash-bucket dup stats over an :class:`AHash` output Dataset:
    per image, the bucket size and canonical (min) member id — ONE
    ``groupby(hash)`` (the blocking unit IS the hash, exactly like
    exact text dedup; Hamming-radius widening would band the halves,
    the ``dedup_simhash`` pattern)."""

    def fold(t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_numpy()
        canon = int(ids.min())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "hash_hi": t.column("hash_hi"),
                "hash_lo": t.column("hash_lo"),
                "n_same": pa.array(
                    np.full(ids.size, ids.size, np.int64), pa.int64()),
                "canon": pa.array(
                    np.full(ids.size, canon, np.int64), pa.int64()),
                "is_dup": pa.array(
                    (ids != canon).astype(np.int64), pa.int64()),
            }
        )

    return hashed.groupby(["hash_hi", "hash_lo"]).map_groups(
        fold, batch_format="pyarrow"
    )


# ------------------------------------------------------------- audio

class SilenceSegments:
    """Actor-pool stage: PCM WAV payload → silence segmentation (the
    VAD pre-pass a speech-curation pipeline runs before transcription:
    how much of this clip is dead air, and in how many stretches?).

    A full ``frame_size``-sample frame is SILENT when ``Σ|x| <
    frame_size · amp_floor`` (mean amplitude below the floor — integer
    compare, no division); the trailing partial frame is ignored so
    every frame has equal weight.  Per decodable payload:
    ``(media_id, n_frames, n_silent, n_segments, longest_run)`` where
    segments are maximal silent runs.  Same skip contract as
    :class:`AudioFeatures`."""

    def __init__(self, frame_size: int = 256, amp_floor: int = 100):
        self.frame_size = frame_size
        self.amp_floor = amp_floor

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        fs = self.frame_size
        ids = batch.column("media_id").to_numpy()
        payloads = batch.column("payload")
        rows: list[tuple[int, ...]] = []
        for i in range(len(ids)):
            try:
                with wave.open(io.BytesIO(payloads[i].as_py())) as w:
                    if w.getsampwidth() != 2 or w.getnchannels() != 1:
                        continue
                    x = np.frombuffer(w.readframes(w.getnframes()), "<i2")
            except (wave.Error, EOFError, ValueError):
                continue  # corrupt decoy → skipped, not fatal
            nf = x.size // fs
            if nf == 0:
                continue
            xi = np.abs(x[: nf * fs].astype(np.int64)).reshape(nf, fs)
            silent = xi.sum(axis=1) < fs * self.amp_floor
            starts = silent & ~np.r_[False, silent[:-1]]
            n_seg = int(starts.sum())
            longest = 0
            if n_seg:
                idx = np.flatnonzero(np.r_[~silent, True])
                prev = -1
                for j in idx:
                    longest = max(longest, j - prev - 1)
                    prev = j
            rows.append((int(ids[i]), nf, int(silent.sum()), n_seg, longest))
        cols = list(zip(*rows)) if rows else [[]] * 5
        names = ["media_id", "n_frames", "n_silent", "n_segments",
                 "longest_run"]
        return pa.table({n: pa.array(list(c), pa.int64())
                         for n, c in zip(names, cols)})



class ImageEntropy:
    """Task/actor-pool stage: image payload → gray-histogram features
    — the flat/synthetic-image screen of the multimodal quality family
    (a solid-color banner scores 0 bits; a natural photo scores high):
    per image the pixel count, distinct gray levels, modal-level
    count, and 4 dp Shannon entropy ``Σ c(ln N − ln c)/(N ln 2)`` over
    the integer gray channel ``(r+g+b)//3``.  Same decode plumbing
    and corrupt-skip contract as :class:`AHash` (shared
    ``batch_decoder`` fast path); the histogram is ONE ``bincount``
    per image — no per-pixel Python."""

    def __init__(self, decoder=None, batch_decoder=None):
        if decoder == "pil":
            decoder = _pil_decode_rgb()
        self.decoder = decoder or decode_ppm
        self.batch_decoder = batch_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        payloads = batch.column("payload")
        out = {"media_id": [], "n_px": [], "n_distinct": [],
               "modal_n": [], "entropy_bits": []}
        if self.batch_decoder is not None:
            try:
                imgs = self.batch_decoder([p.as_py() for p in payloads])
            except (ValueError, NotImplementedError):
                imgs = [None] * len(payloads)
        else:
            imgs = None
        for i in range(len(ids)):
            if imgs is not None:
                img = imgs[i]
                if img is None:
                    continue
            else:
                try:
                    img = self.decoder(payloads[i].as_py())
                except (ValueError, NotImplementedError, IndexError):
                    continue
            gray = img.astype(np.int64).sum(axis=2) // img.shape[2]
            c = np.bincount(gray.ravel(), minlength=256)
            c = c[c > 0]
            n = int(gray.size)
            ent = float((c * (np.log(n) - np.log(c))).sum() / (n * np.log(2.0)))
            out["media_id"].append(int(ids[i]))
            out["n_px"].append(n)
            out["n_distinct"].append(int(c.size))
            out["modal_n"].append(int(c.max()))
            out["entropy_bits"].append(round(ent, 4))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "n_px": pa.array(out["n_px"], pa.int64()),
                "n_distinct": pa.array(out["n_distinct"], pa.int64()),
                "modal_n": pa.array(out["modal_n"], pa.int64()),
                "entropy_bits": pa.array(out["entropy_bits"], pa.float64()),
            }
        )


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE writer — struct-level, deliberately
    independent of the stdlib ``wave`` module the READER uses, so the
    audio pipeline is a true writer/parser round-trip (same contract
    as :mod:`stages.imagesize`'s encoders vs parsers)."""
    import struct

    data = samples.astype("<i2").tobytes()
    return b"".join([
        b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16),
        b"data", struct.pack("<I", len(data)), data,
    ])


class AudioFeatures:
    """Actor-pool stage: PCM WAV payload → integer frame-level audio
    features (the audio-modality twin of :class:`FrameSampler` — the
    standard energy/ZCR pass a speech-data curation pipeline runs
    before VAD or an acoustic encoder).

    Per decodable payload: header fields (``n_samples``,
    ``sample_rate``), corpus-exact integer signals — ``sum_abs`` (Σ|x|
    over raw int16 samples), ``max_abs``, ``zero_crossings``
    (sign-bit flips between consecutive samples) — and the peak
    ``frame_size``-sample frame (``peak_frame`` index, lowest-index
    tie; ``peak_energy`` = Σx² in that frame, int64-exact: ≤ 2³⁸ per
    256-sample frame).  Corrupt payloads are skipped (error-folder
    analog).  Decode is per-payload; every feature after the
    ``np.frombuffer`` is one vectorized pass."""

    def __init__(self, frame_size: int = 256):
        self.frame_size = frame_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        fs = self.frame_size
        ids = batch.column("media_id").to_numpy()
        payloads = batch.column("payload")
        rows: list[tuple[int, ...]] = []
        for i in range(len(ids)):
            try:
                with wave.open(io.BytesIO(payloads[i].as_py())) as w:
                    if w.getsampwidth() != 2 or w.getnchannels() != 1:
                        continue
                    rate = w.getframerate()
                    x = np.frombuffer(w.readframes(w.getnframes()), "<i2")
            except (wave.Error, EOFError, ValueError):
                continue  # corrupt decoy → skipped, not fatal
            if x.size == 0:
                continue
            xi = x.astype(np.int64)
            neg = xi < 0
            zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
            nf = (x.size + fs - 1) // fs
            e = np.zeros(nf, np.int64)
            np.add.at(e, np.arange(x.size) // fs, xi * xi)
            pk = int(np.argmax(e))  # first max == lowest-index tie
            rows.append((int(ids[i]), x.size, rate,
                         int(np.abs(xi).sum()), int(np.abs(xi).max()),
                         zc, pk, int(e[pk])))
        cols = list(zip(*rows)) if rows else [[]] * 8
        names = ["media_id", "n_samples", "sample_rate", "sum_abs",
                 "max_abs", "zero_crossings", "peak_frame", "peak_energy"]
        return pa.table({n: pa.array(list(c), pa.int64())
                         for n, c in zip(names, cols)})
