"""Header-only image tech-metadata: (width, height) without decoding.

Transposes the reference's ``ImageSizeReader.java`` (229 LoC: reads
image dimensions for WIDTH/HEIGHT tech fields by parsing container
headers — via content-type-specific readers — rather than decoding
pixels).  Here the same capability is a pure stdlib/struct parse over
the payload's leading bytes, so it stays cheap inside a
``map_batches`` stage even for multi-MB payloads: only the header
region is touched, the Arrow binary buffer is never copied.

Formats covered (all parseable without any codec library):

- PNG   — IHDR chunk, big-endian u32 pair at offset 16
- JPEG  — marker walk to the first SOF0-SOF15 frame header
- GIF   — logical screen descriptor, little-endian u16 pair
- BMP   — BITMAPINFOHEADER, little-endian i32 pair (height signed:
  top-down BMPs store it negative)
- PPM   — P6 whitespace-token header (comments allowed)
- TIFF  — IFD walk for tags 256/257 (+ 274 orientation), both byte
  orders; this is also the EXIF container format, so the same walker
  reads EXIF-style IFDs
- JP2   — box scan for the ``ihdr`` image-header box (big-endian
  height then width)

``image_dims`` returns ``None`` (never raises) for unparseable or
non-image payloads, so the batch kernel can route unknowns to null
columns without per-row try/except in the hot path.

Writers (``encode_png`` etc.) build minimal VALID files for the same
formats; they exist so the ``media_dims`` catalog operator and the
tests can synthesize deterministic payloads whose expected dimensions
an independent SQL oracle can recompute from the row id alone.
Parser and writer deliberately share no code: the writers emit bytes
by spec-constant layout, the parsers re-derive offsets by walking the
container structure, so a layout bug in either side breaks the
round-trip check.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "image_dims",
    "image_format",
    "image_orientation",
    "ppm_header_ints",
    "encode_png",
    "encode_jpeg_shell",
    "encode_gif_shell",
    "encode_bmp",
    "encode_ppm",
    "encode_tiff_shell",
    "encode_jp2_shell",
    "encode_png_rgb",
    "decode_png_pixels",
    "encode_gif_lzw",
    "decode_gif_pixels",
    "encode_tiff_gray",
    "decode_tiff_gray",
]


# --------------------------------------------------------------- parsers


def _dims_png(p: bytes) -> tuple[int, int] | None:
    # 8-byte signature, then the IHDR chunk MUST be first:
    # len(4) + b"IHDR" + width(4 BE) + height(4 BE)
    if len(p) < 24 or p[12:16] != b"IHDR":
        return None
    w, h = struct.unpack_from(">II", p, 16)
    return (w, h) if w and h else None  # 0-dim IHDR is not a real image


def _dims_jpeg(p: bytes) -> tuple[int, int] | None:
    # Walk marker segments from after SOI until a frame header (SOFn).
    # SOF payload: length(2) precision(1) height(2 BE) width(2 BE).
    i, n = 2, len(p)
    while i + 3 < n:
        if p[i] != 0xFF:  # desynchronized — not a well-formed stream
            return None
        while i < n and p[i] == 0xFF:  # fill bytes are legal padding
            i += 1
        if i >= n:
            return None
        marker = p[i]
        i += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length
        if i + 1 >= n:
            return None
        seglen = struct.unpack_from(">H", p, i)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 6 >= n:
                return None
            h, w = struct.unpack_from(">HH", p, i + 3)
            return (w, h)
        i += seglen
    return None


def _dims_gif(p: bytes) -> tuple[int, int] | None:
    if len(p) < 10:
        return None
    w, h = struct.unpack_from("<HH", p, 6)
    return (w, h)


def _dims_bmp(p: bytes) -> tuple[int, int] | None:
    if len(p) < 26:
        return None
    w, h = struct.unpack_from("<ii", p, 18)
    return (w, abs(h))  # negative height = top-down row order


def ppm_header_ints(p: bytes, count: int) -> tuple[list[int], int]:
    """Walk ``count`` whitespace-separated integer tokens after the
    ``P6`` magic, skipping ``#`` comment lines (allowed anywhere in
    the header per the netpbm spec); returns ``(values, position just
    past the last token)``.  Raises ``ValueError`` on truncation or a
    non-numeric token.  Shared by the dims probe here and the pixel
    decoder in ``stages/multimodal.py`` — ONE tokenizer, so a header
    parsing fix cannot silently diverge between them."""
    pos, vals = 2, []
    while len(vals) < count:
        while pos < len(p):
            c = p[pos : pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":  # comment runs to EOL
                while pos < len(p) and p[pos : pos + 1] not in (b"\n", b"\r"):
                    pos += 1
            else:
                break
        start = pos
        while pos < len(p) and not p[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tok = p[start:pos]
        if not tok.isdigit():
            raise ValueError(f"bad PPM header token {tok!r}")
        vals.append(int(tok))
    return vals, pos


def _dims_ppm(p: bytes) -> tuple[int, int] | None:
    try:
        vals, _ = ppm_header_ints(p, 2)
    except ValueError:
        return None
    return (vals[0], vals[1])


_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}


def _tiff_ifd_tags(p: bytes, want: set[int]) -> dict[int, int] | None:
    """Walk the first IFD of a TIFF/EXIF container, return inline
    integer values for the requested tags (SHORT/LONG only)."""
    if len(p) < 8:
        return None
    if p[:4] == b"II*\x00":
        end = "<"
    elif p[:4] == b"MM\x00*":
        end = ">"
    else:
        return None
    (ifd_off,) = struct.unpack_from(end + "I", p, 4)
    if ifd_off + 2 > len(p):
        return None
    (n_entries,) = struct.unpack_from(end + "H", p, ifd_off)
    out: dict[int, int] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(p):
            return None
        tag, typ = struct.unpack_from(end + "HH", p, off)
        if tag in want and typ in (3, 4):
            if typ == 3:  # SHORT — value left-justified in the 4-byte slot
                out[tag] = struct.unpack_from(end + "H", p, off + 8)[0]
            else:
                out[tag] = struct.unpack_from(end + "I", p, off + 8)[0]
    return out


def _dims_tiff(p: bytes) -> tuple[int, int] | None:
    tags = _tiff_ifd_tags(p, {256, 257})
    if not tags or 256 not in tags or 257 not in tags:
        return None
    return (tags[256], tags[257])


def _dims_jp2(p: bytes) -> tuple[int, int] | None:
    # JP2 is an ISO box container; the image-header box payload is
    # height(4 BE) then width(4 BE) right after the 'ihdr' type tag.
    if p[:12] != b"\x00\x00\x00\x0cjP  \r\n\x87\n":
        return None
    idx = p.find(b"ihdr")
    if idx < 0 or idx + 12 > len(p):
        return None
    h, w = struct.unpack_from(">II", p, idx + 4)
    return (w, h)


def image_format(payload: bytes) -> str | None:
    """Container format name from magic bytes (the ``sniff_mime``
    rule set); None for non-image payloads."""
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload.startswith(b"GIF8"):
        return "gif"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload.startswith(b"P6"):
        return "ppm"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if payload.startswith(b"\x00\x00\x00\x0cjP  "):
        return "jp2"
    return None


_DIMS_BY_FORMAT = {
    "png": _dims_png,
    "jpeg": _dims_jpeg,
    "gif": _dims_gif,
    "bmp": _dims_bmp,
    "ppm": _dims_ppm,
    "tiff": _dims_tiff,
    "jp2": _dims_jp2,
}


def image_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from container headers only; None if unknown.

    Dispatches on magic bytes (the ``sniff_mime`` rule set), then
    parses the format's own header structure — no pixel decode, no
    codec dependency (``ImageSizeReader.java`` transposed)."""
    fmt = image_format(payload)
    return _DIMS_BY_FORMAT[fmt](payload) if fmt else None


def image_orientation(payload: bytes) -> int | None:
    """EXIF/TIFF orientation (tag 274) for TIFF-container payloads;
    None when absent or not a TIFF."""
    tags = _tiff_ifd_tags(payload, {274})
    return tags.get(274) if tags else None


# --------------------------------------------------------------- writers
# Minimal VALID files per format.  Layouts are written out
# spec-constant-by-spec-constant (no shared helpers with the parsers
# above) so the catalog round-trip actually exercises both sides.


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(w: int, h: int) -> bytes:
    """Valid zero-pixel-row PNG (8-bit RGB, empty zlib IDAT)."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"")
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def encode_jpeg_shell(w: int, h: int) -> bytes:
    """JPEG shell: SOI + JFIF APP0 + SOF0 frame header + EOI (no scan
    data — dimensions live entirely in SOF0)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 72, 72
    ) + b"\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def encode_gif_shell(w: int, h: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HHBBB", w, h, 0x00, 0, 0) + b"\x3b"


def encode_bmp(w: int, h: int) -> bytes:
    """Complete uncompressed 24-bit BMP with zeroed pixel rows (the
    only writer that emits real pixel data — ``decode_bmp`` can read
    it back)."""
    stride = (w * 3 + 3) & ~3
    pixels = b"\x00" * (stride * h)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    hdr_len = 14 + 40
    file_hdr = b"BM" + struct.pack("<IHHI", hdr_len + len(pixels), 0, 0, hdr_len)
    return file_hdr + info + pixels


def encode_ppm(w: int, h: int) -> bytes:
    """Binary P6 PPM with a comment line and zeroed pixels."""
    return b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + b"\x00" * (w * h * 3)


def encode_tiff_shell(w: int, h: int, orientation: int = 1, big_endian: bool = False) -> bytes:
    """TIFF header + one IFD carrying ImageWidth/ImageLength (LONG)
    and Orientation (SHORT); no strip data."""
    end = ">" if big_endian else "<"
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    entries = [
        (256, 4, 1, struct.pack(end + "I", w)),
        (257, 4, 1, struct.pack(end + "I", h)),
        (274, 3, 1, struct.pack(end + "H", orientation) + b"\x00\x00"),
    ]
    ifd = struct.pack(end + "H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(end + "HHI", tag, typ, cnt) + val
    ifd += struct.pack(end + "I", 0)  # next-IFD pointer: none
    return magic + struct.pack(end + "I", 8) + ifd


def encode_jp2_shell(w: int, h: int) -> bytes:
    """JP2 signature + ftyp + jp2h(ihdr) box chain (no codestream)."""
    sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    ftyp = struct.pack(">I", 20) + b"ftypjp2 " + struct.pack(">I", 0) + b"jp2 "
    ihdr_body = struct.pack(">IIHBBBB", h, w, 3, 7, 7, 0, 0)
    ihdr = struct.pack(">I", 8 + len(ihdr_body)) + b"ihdr" + ihdr_body
    jp2h = struct.pack(">I", 8 + len(ihdr)) + b"jp2h" + ihdr
    return sig + ftyp + jp2h


# ----------------------------------------------------- real PNG codec

def encode_png_rgb(img, *, mixed_filters: bool = True) -> bytes:
    """REAL full-pixel PNG writer (8-bit RGB, one IDAT): each
    scanline gets a filter byte and the filter TRANSFORM applied —
    ``mixed_filters`` cycles through all five spec filters
    (None/Sub/Up/Average/Paeth, ``row % 5``) so a round-trip
    exercises every decoder unfilter path, not just the trivial one.
    Upgrades M12 beyond the header-only shells: with
    :func:`decode_png_pixels` this is a true compressed-format codec
    pair (zlib is stdlib — no external image lib needed)."""
    import numpy as np

    a = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        row = a[y].reshape(-1).astype(np.int64)
        f = (y % 5) if mixed_filters else 0
        left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
        if f == 0:
            out = row
        elif f == 1:
            out = row - left
        elif f == 2:
            out = row - prev
        elif f == 3:
            out = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc_ = np.abs(p - upleft)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, upleft))
            out = row - pred
        raw.append(f)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _parse_png(payload: bytes):
    """Header + inflated scanline bytes of one PNG →
    ``(h, w, channels, data)`` with ``data`` shaped ``(h, stride+1)``.
    Raises ``ValueError`` on corrupt/unsupported input (interlace,
    palette, 16-bit — the documented integration point for exotic
    variants)."""
    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    w = h = depth = ctype = None
    interlace = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None or depth != 8 or interlace != 0:
        raise ValueError("unsupported PNG variant")
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported color type {ctype}")
    stride = w * channels
    try:
        data = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    except zlib.error as e:  # corrupt stream → uniform corrupt-payload error
        raise ValueError(f"bad IDAT stream: {e}") from e
    if data.size != h * (stride + 1):
        raise ValueError("scanline payload size mismatch")
    return h, w, channels, data.reshape(h, stride + 1)


def _unfilter_rows(data, bpp: int):
    """Vectorized PNG unfilter over a STACK of same-shape images:
    ``data`` is ``(n, h, stride+1)`` uint8 (filter byte + scanline per
    row, filters may differ per image per row) → ``(n, h, stride)``
    uint8.

    Row loop is sequential (each row references the previous — the
    PNG data dependence); within a row everything is vectorized
    ACROSS IMAGES: None/Up are single array ops, Sub is one cumsum
    per row, and Average/Paeth — sequential only in x — run a
    w-length loop over ``(k_images, bpp)`` lanes instead of the old
    per-byte Python loop (round-4 ADVICE item; per-row work drops
    from ``stride`` interpreted steps per image to ``w`` vector steps
    per batch)."""
    import numpy as np

    n, h, s1 = data.shape
    stride = s1 - 1
    f = data[:, :, 0]
    rows = data[:, :, 1:]
    out = np.empty((n, h, stride), np.uint8)
    prev = np.zeros((n, stride), np.int64)
    known = f <= 4
    if not known.all():
        i, y = np.argwhere(~known)[0]
        raise ValueError(f"bad filter {int(f[i, y])}")
    for y in range(h):
        fy = f[:, y]
        row = rows[:, y, :].astype(np.int64)
        rec = np.empty((n, stride), np.int64)
        m = fy == 0
        if m.any():
            rec[m] = row[m]
        m = fy == 1
        if m.any():
            r = row[m].reshape(-1, stride // bpp, bpp)
            rec[m] = (np.cumsum(r, axis=1) % 256).reshape(-1, stride)
        m = fy == 2
        if m.any():
            rec[m] = (row[m] + prev[m]) % 256
        m = fy >= 3
        if m.any():
            k = int(m.sum())
            r = row[m].reshape(k, -1, bpp)
            pv = prev[m].reshape(k, -1, bpp)
            is4 = (fy[m] == 4)[:, None]
            rc = np.empty_like(r)
            left = np.zeros((k, bpp), np.int64)
            ul = np.zeros((k, bpp), np.int64)
            for x in range(r.shape[1]):
                up = pv[:, x]
                p = left + up - ul
                pa_ = np.abs(p - left)
                pb = np.abs(p - up)
                pc_ = np.abs(p - ul)
                paeth = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, ul)
                )
                cur = (r[:, x] + np.where(is4, paeth, (left + up) // 2)) % 256
                rc[:, x] = cur
                left = cur
                ul = up
            rec[m] = rc.reshape(k, stride)
        out[:, y] = rec
        prev = rec
    return out


def decode_png_pixels(payload: bytes):
    """REAL PNG pixel decoder (8-bit, color types 0/2/6; all five
    scanline filters; multi-IDAT) → ``(h, w, channels)`` uint8 array.
    One-image front of the vectorized :func:`_unfilter_rows` kernel
    (batch decode over many same-shape images:
    :func:`decode_png_pixels_batch`)."""
    h, w, channels, data = _parse_png(payload)
    return _unfilter_rows(data[None], channels)[0].reshape(h, w, channels)


def encode_png_rgb_batch(imgs, *, mixed_filters: bool = True) -> list[bytes]:
    """Vectorized many-image PNG writer: ``imgs`` is ``(n, h, w, 3)``
    uint8 (same shape — the synth-corpus case) → list of PNG bytes.
    The filter transform runs ONCE per row across all images (filters
    depend only on y in mixed mode); only the zlib deflate stays
    per-image (C speed).  Byte-identical to per-image
    :func:`encode_png_rgb`."""
    import numpy as np

    a = np.ascontiguousarray(imgs, dtype=np.uint8)
    n, h, w, c = a.shape
    assert c == 3
    bpp = 3
    stride = w * bpp
    rows = a.reshape(n, h, stride).astype(np.int64)
    raw = np.empty((n, h, stride + 1), np.uint8)
    zero = np.zeros((n, bpp), np.int64)
    prev = np.zeros((n, stride), np.int64)
    for y in range(h):
        row = rows[:, y]
        f = (y % 5) if mixed_filters else 0
        left = np.concatenate([zero, row[:, :-bpp]], axis=1)
        if f == 0:
            out = row
        elif f == 1:
            out = row - left
        elif f == 2:
            out = row - prev
        elif f == 3:
            out = row - (left + prev) // 2
        else:  # Paeth
            upleft = np.concatenate([zero, prev[:, :-bpp]], axis=1)
            p = left + prev - upleft
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc_ = np.abs(p - upleft)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, upleft))
            out = row - pred
        raw[:, y, 0] = f
        raw[:, y, 1:] = (out % 256).astype(np.uint8)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    head = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    tail = _png_chunk(b"IEND", b"")
    return [
        head + _png_chunk(b"IDAT", zlib.compress(raw[i].tobytes())) + tail
        for i in range(n)
    ]


def decode_png_pixels_batch(payloads):
    """Many PNG payloads → list of ``(h, w, c)`` uint8 arrays (``None``
    for corrupt/unsupported ones — the error-folder skip contract).

    Parses and inflates each payload individually (zlib is C-speed),
    then groups images by shape and unfilters each group through ONE
    vectorized :func:`_unfilter_rows` call — the per-image Python cost
    collapses to the parse.  This is the hot path for actor-pool
    media stages (``AHash(batch_decoder=...)``)."""
    import numpy as np

    groups: dict = {}
    for i, payload in enumerate(payloads):
        try:
            h, w, c, data = _parse_png(payload)
        except (ValueError, struct.error):
            continue
        if (data[:, 0] > 4).any():
            # invalid filter byte = corrupt payload: reject it HERE so
            # one bad image can't abort its whole shape group (review
            # finding; _unfilter_rows keeps raising for direct misuse)
            continue
        groups.setdefault((h, w, c), []).append((i, data))
    out: list = [None] * len(payloads)
    for (h, w, c), items in groups.items():
        stack = np.stack([d for _, d in items])
        imgs = _unfilter_rows(stack, c).reshape(len(items), h, w, c)
        for (i, _), img in zip(items, imgs):
            out[i] = img
    return out


# ----------------------------------------------------- real GIF codec

def encode_gif_lzw(img, palette=None) -> bytes:
    """REAL GIF89a writer with a genuine LZW compressor (variable
    code width, dictionary growth, 4096-entry reset — not the
    "uncompressed GIF" trick): ``img`` is an (h, w) uint8 array of
    palette indices; ``palette`` an (n, 3) uint8 array (defaults to
    the 256-gray ramp).  Third real compressed codec next to PNG and
    WAV — everything stdlib/numpy."""
    import numpy as np

    a = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = a.shape
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    nbits = max(2, int(len(pal) - 1).bit_length())
    pal_full = np.zeros((1 << nbits, 3), np.uint8)
    pal_full[:len(pal)] = pal
    lsd = struct.pack("<HHBBB", w, h, 0x80 | ((nbits - 1) << 4) | (nbits - 1), 0, 0)
    idesc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    min_code = max(2, nbits)
    clear, end = 1 << min_code, (1 << min_code) + 1
    # --- LZW compress ---
    codes: list[int] = [clear]
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    next_code = end + 1
    width = min_code + 1
    widths: list[int] = [width]
    cur = b""
    for px in a.reshape(-1).tobytes():
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
            continue
        codes.append(table[cur])
        widths.append(width)
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            codes.append(clear)
            widths.append(width)
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = end + 1
            width = min_code + 1
        cur = bytes([px])
    if cur:
        codes.append(table[cur])
        widths.append(width)
    codes.append(end)
    widths.append(width)
    # pack LSB-first variable-width codes
    bits = bytearray()
    acc = nacc = 0
    out = bytearray()
    for c, wd in zip(codes, widths):
        acc |= c << nacc
        nacc += wd
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    blocks = bytearray([min_code])
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return (b"GIF89a" + lsd + pal_full.tobytes() + idesc + bytes(blocks)
            + b"\x3b")


def decode_gif_pixels(payload: bytes):
    """REAL GIF LZW decoder → (index array (h, w), palette (n, 3)).
    Full variable-width LZW incl. the KwKwK case, dictionary resets,
    and sub-block reassembly; interlace/local-palette/extension
    blocks raise ``ValueError`` (documented integration points)."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        w, h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    except struct.error as e:  # truncated header → uniform corrupt error
        raise ValueError(f"truncated GIF header: {e}") from e
    if not flags & 0x80:
        raise ValueError("no global color table")
    nbits = (flags & 0x07) + 1
    pos = 13
    pal = np.frombuffer(payload[pos:pos + 3 * (1 << nbits)], np.uint8)
    pal = pal.reshape(-1, 3).copy()
    pos += 3 * (1 << nbits)
    if pos >= len(payload) or payload[pos] != 0x2C:
        raise ValueError("unsupported or missing image descriptor")
    try:
        _, left, top, iw, ih, iflags = struct.unpack("<BHHHHB",
                                                     payload[pos:pos + 10])
    except struct.error as e:
        raise ValueError(f"truncated image descriptor: {e}") from e
    if left or top or iw != w or ih != h or iflags & 0xC0:
        raise ValueError("unsupported image descriptor variant")
    pos += 10
    if pos >= len(payload):
        raise ValueError("truncated before LZW data")
    min_code = payload[pos]
    pos += 1
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated LZW sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            break
        data.extend(payload[pos:pos + ln])
        pos += ln
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    out = bytearray()
    acc = nacc = di = 0
    prev: bytes | None = None
    while True:
        while nacc < width:
            if di >= len(data):
                raise ValueError("LZW stream ended without end code")
            acc |= data[di] << nacc
            di += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            table = table[: (1 << min_code) + 2]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        out.extend(entry)
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry
    if len(out) != w * h:
        raise ValueError(f"decoded {len(out)} pixels, expected {w * h}")
    return np.frombuffer(bytes(out), np.uint8).reshape(h, w), pal


# ------------------------------------------------ real TIFF gray codec

def encode_tiff_gray(img) -> bytes:
    """Minimal REAL baseline-TIFF writer: 8-bit grayscale, no
    compression, ONE strip, little-endian — every tag value inline
    (SHORT/LONG), so the file round-trips through the same IFD walker
    the dims probe uses."""
    import numpy as np

    a = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = a.shape
    data = a.tobytes()
    # header(8) + count(2) + 8 tags * 12 + next(4) = 110 → strip at 110
    strip_off = 8 + 2 + 8 * 12 + 4
    def tag(t, typ, val):
        return struct.pack("<HHI4s", t, typ, 1,
                           struct.pack("<I", val) if typ == 4
                           else struct.pack("<HH", val, 0))
    ifd = b"".join([
        tag(256, 4, w),            # ImageWidth
        tag(257, 4, h),            # ImageLength
        tag(258, 3, 8),            # BitsPerSample
        tag(259, 3, 1),            # Compression = none
        tag(262, 3, 1),            # Photometric = BlackIsZero
        tag(273, 4, strip_off),    # StripOffsets
        tag(278, 4, h),            # RowsPerStrip
        tag(279, 4, len(data)),    # StripByteCounts
    ])
    return (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 8)
            + ifd + struct.pack("<I", 0) + data)


def decode_tiff_gray(payload: bytes):
    """REAL baseline-TIFF decoder (8-bit gray, uncompressed, one
    strip, either byte order) → (h, w) uint8 array; anything else
    raises ``ValueError`` (compressed/tiled/multi-strip TIFFs are the
    documented integration point)."""
    import numpy as np

    tags = _tiff_ifd_tags(payload, {256, 257, 258, 259, 262, 273, 278, 279})
    if not tags:
        raise ValueError("not a TIFF")
    for t in (256, 257, 273, 279):
        if t not in tags:
            raise ValueError(f"missing required tag {t}")
    if tags.get(259, 1) != 1:
        raise ValueError(f"unsupported compression {tags.get(259)}")
    if tags.get(258, 8) != 8:
        raise ValueError("only 8-bit samples supported")
    w, h = tags[256], tags[257]
    off, cnt = tags[273], tags[279]
    if cnt != w * h or off + cnt > len(payload):
        raise ValueError("strip does not cover exactly one gray plane")
    return np.frombuffer(payload[off:off + cnt], np.uint8).reshape(h, w)
