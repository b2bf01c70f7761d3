"""Posting-list compression: delta + LEB128 varint, fixed-size blocks.

The reference ships postings to Solr and lets Lucene encode them; here
we own the codec (SURVEY.md §2.6 A8).  Layout per term::

    term row = (term, df, cf, blocks)
    block    = struct(n:int32, first_doc:int64, max_doc:int64,
                      max_tf:int32, min_dl:int32, docs:binary,
                      tfs:binary, dls:binary)

- ``docs``: LEB128 varints — first value absolute, then gaps
  (``doc_id[i] - doc_id[i-1]``, always ≥ 1 since ids are strictly
  increasing within a term).
- ``tfs`` / ``dls``: LEB128 varints of the raw term frequency and the
  document token length (so query-time scoring is exact float64 — no
  quantized impacts).  ``(max_tf, min_dl)`` give the block-max WAND
  pruning bound ``impact(max_tf, min_dl, avgdl) ≥ impact(tf_i, dl_i)``
  (impact is monotone ↑tf, ↓dl); storing the two ints instead of a
  float means block metadata needs NO global stats at encode time —
  which is what lets the docs+index build run as one fused pipeline.
- Blocks hold at most ``BLOCK_SIZE`` postings and are independently
  decodable, so pre-compressed runs from the salted two-stage merge
  (SURVEY.md §4.1) concatenate without re-encoding.

All encode/decode paths are numpy-vectorized (no per-int Python loop).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "BLOCK_SIZE",
    "encode_varints",
    "encode_varints_segmented",
    "decode_varints",
    "encode_term_blocks",
    "decode_block",
    "decode_term",
    "encode_for_block",
    "encode_pfor_block",
    "decode_pfor_block",
    "pfor_encoded_size",
    "decode_for_block",
    "for_encoded_size",
    "encode_ef",
    "decode_ef",
    "encode_frontcoded_block",
    "decode_frontcoded_block",
    "ROARING_ARRAY_MAX",
    "encode_roaring",
    "decode_roaring",
    "roaring_container_stats",
           "encode_gamma", "decode_gamma"]

BLOCK_SIZE = 128

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def _varint_encode_raw(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(byte buffer, per-value end offsets) for LEB128 encoding of ``a``."""
    lengths = np.ones(a.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        lengths += a >= t
    ends = np.cumsum(lengths)
    starts = ends - lengths
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_len = int(lengths.max())
    for k in range(max_len):
        mask = lengths > k
        chunk = (a[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (lengths[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out, ends


def encode_varints(values: np.ndarray) -> bytes:
    """Vectorized unsigned LEB128 encoding of a 1-D array of ints ≥ 0."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    out, _ = _varint_encode_raw(a)
    return out.tobytes()


def encode_varints_segmented(values: np.ndarray, seg_starts: np.ndarray) -> list[bytes]:
    """Encode ``values`` once, return one bytes object per segment.

    ``seg_starts`` are value indices (first must be 0).  One vectorized
    encode pass for ALL segments — this is what keeps map-side SPIMI
    run generation off the per-term Python path.
    """
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return []
    out, ends = _varint_encode_raw(a)
    buf = out.tobytes()
    seg_starts = np.ascontiguousarray(seg_starts, dtype=np.int64)
    byte_starts = np.where(seg_starts > 0, ends[seg_starts - 1], 0)
    byte_ends = np.append(byte_starts[1:], len(buf))
    return [buf[s:e] for s, e in zip(byte_starts.tolist(), byte_ends.tolist())]




def decode_varints(buf: bytes | memoryview) -> np.ndarray:
    """Vectorized LEB128 decode → uint64 array.

    No scatter-add: values are assembled with ≤10 masked gathers (one
    per byte position), which is several times faster than
    ``np.add.at`` on large posting lists.
    """
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (raw & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    payload = (raw & 0x7F).astype(np.uint64)
    values = np.zeros(ends.size, dtype=np.uint64)
    max_len = int(lengths.max())
    if max_len == 1:  # fast path: every value is a single byte
        return payload
    mask = np.ones(ends.size, dtype=bool)
    for k in range(max_len):
        if k:
            mask = lengths > k
        values[mask] |= payload[starts[mask] + k] << np.uint64(7 * k)
    return values


def encode_term_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
) -> list[dict]:
    """Sorted per-term postings → list of block structs (Arrow-ready dicts).

    ``doc_ids`` must be strictly increasing int64; ``tfs``/``dls``
    positive ints.  Returns ``[{n, first_doc, max_doc, max_tf, min_dl,
    docs, tfs, dls}, ...]`` with ≤ ``BLOCK_SIZE`` postings per block.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    blocks: list[dict] = []
    for s in range(0, doc_ids.size, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, doc_ids.size)
        d = doc_ids[s:e]
        gaps = np.empty(d.shape, dtype=np.uint64)
        gaps[0] = np.uint64(d[0])
        np.subtract(d[1:], d[:-1], out=gaps[1:], casting="unsafe")
        blocks.append(
            {
                "n": np.int32(e - s),
                "first_doc": np.int64(d[0]),
                "max_doc": np.int64(d[-1]),
                "max_tf": np.int32(tfs[s:e].max()),
                "min_dl": np.int32(dls[s:e].min()),
                "docs": encode_varints(gaps),
                "tfs": encode_varints(tfs[s:e]),
                "dls": encode_varints(dls[s:e]),
            }
        )
    return blocks


def decode_block(block: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Block struct → (doc_ids:int64, tfs:int64, dls:int64)."""
    gaps = decode_varints(block["docs"]).astype(np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = decode_varints(block["tfs"]).astype(np.int64)
    dls = decode_varints(block["dls"]).astype(np.int64)
    return doc_ids, tfs, dls


def decode_term(blocks: list[dict]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All blocks of a term → concatenated (doc_ids, tfs, dls)."""
    if not blocks:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    parts = [decode_block(b) for b in blocks]
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
    )


# ------------------------------------------------------- FOR bit-packing

def _bit_width(gaps: np.ndarray) -> int:
    """Max bit length of the (non-empty, ≥1) gap array — bounded
    shift loop, vectorized compares, no per-int Python."""
    w = 1
    g = gaps.astype(np.uint64, copy=False)
    while bool(np.any(g >> np.uint64(w))):
        w += 1
    return w


def encode_for_block(doc_ids: np.ndarray) -> bytes:
    """Frame-of-reference bit-packing of ONE ≤``BLOCK_SIZE`` block of
    strictly-increasing doc ids (the Lucene ``Lucene*PostingsFormat``
    FOR analog; the north-star codec family next to LEB128):

        [width: u8][first_doc: u64 LE][gaps bit-packed at ``width``
        bits each, value-major, LSB-first]

    Size is exactly ``9 + ceil((m-1)·w / 8)`` bytes for ``m`` postings
    at width ``w`` (``w = 0`` for single-posting blocks).  Packing is
    one (m-1, w) bit-matrix + ``np.packbits`` — fully vectorized.
    """
    d = np.asarray(doc_ids, dtype=np.uint64)
    gaps = np.diff(d)
    head = np.empty(9, np.uint8)
    head[1:] = np.frombuffer(d[:1].tobytes(), np.uint8)  # first_doc LE
    if gaps.size == 0:
        head[0] = 0
        return head.tobytes()
    w = _bit_width(gaps)
    head[0] = w
    bits = (
        (gaps[:, None] >> np.arange(w, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.uint8)
    packed = np.packbits(bits.ravel(), bitorder="little")
    return head.tobytes() + packed.tobytes()


def decode_for_block(buf: bytes | memoryview, n: int) -> np.ndarray:
    """Inverse of :func:`encode_for_block` for a block of ``n``
    postings → int64 doc ids."""
    b = np.frombuffer(buf, np.uint8)
    w = int(b[0])
    first = int(np.frombuffer(b[1:9].tobytes(), np.uint64)[0])
    if n == 1:
        return np.array([first], np.int64)
    m = n - 1
    bits = np.unpackbits(b[9:], bitorder="little")[: m * w].reshape(m, w)
    gaps = (
        bits.astype(np.uint64)
        * (np.uint64(1) << np.arange(w, dtype=np.uint64))[None, :]
    ).sum(axis=1)
    return (first + np.concatenate(([0], np.cumsum(gaps)))).astype(np.int64)


def for_encoded_size(doc_ids: np.ndarray, block_size: int = BLOCK_SIZE) -> int:
    """Total FOR-encoded bytes of a strictly-increasing doc-id stream
    split into ``block_size`` blocks — computed by ENCODING with the
    real codec (pins the packer, not just the formula)."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    total = 0
    for i in range(0, d.size, block_size):
        total += len(encode_for_block(d[i:i + block_size]))
    return total


def _pfor_size_at(bls: np.ndarray, m: int, w: int) -> int:
    """Exact NewPFD block size at candidate width ``w`` for gap
    bit-lengths ``bls``: header 10 (width u8, n_exc u8, first_doc u64)
    + ``ceil(m·w/8)`` packed low bits + per exception 1 position byte
    + ``ceil((bl−w)/7)`` LEB128 bytes for the high part."""
    exc = bls > w
    exc_bytes = int((1 + (bls[exc] - w + 6) // 7).sum())
    return 10 + (m * w + 7) // 8 + exc_bytes


def encode_pfor_block(doc_ids: np.ndarray) -> bytes:
    """NewPFD patched frame-of-reference (Yan/Ding/Suel, WWW'09 — the
    PForDelta member of the north-star codec family): ONE
    ≤``BLOCK_SIZE`` block of strictly-increasing doc ids as::

        [width: u8][n_exc: u8][first_doc: u64 LE]
        [gap LOW ``width`` bits, value-major LSB-first — exceptions
         store their low bits in place]
        [exception positions: u8 each, ascending]
        [exception HIGH parts (gap >> width): LEB128 each]

    ``width`` is chosen by exhaustive argmin of the EXACT size formula
    (ties → smallest width) — unlike plain FOR the frame width no
    longer pays for one outlier gap, the classic skewed-gap win.
    ``n_exc ≤ m ≤ BLOCK_SIZE−1 ≤ 127`` fits the u8 by construction.
    """
    d = np.asarray(doc_ids, dtype=np.uint64)
    gaps = np.diff(d)
    head = np.empty(10, np.uint8)
    head[2:] = np.frombuffer(d[:1].tobytes(), np.uint8)  # first_doc LE
    if gaps.size == 0:
        head[0] = head[1] = 0
        return head.tobytes()
    m = gaps.size
    bls = np.array([int(g).bit_length() for g in gaps], np.int64)
    max_bl = int(bls.max())
    best_w, best_sz = 0, None
    for w in range(max_bl + 1):
        sz = _pfor_size_at(bls, m, w)
        if best_sz is None or sz < best_sz:
            best_w, best_sz = w, sz
    w = best_w
    exc_pos = np.flatnonzero(bls > w)
    head[0] = w
    head[1] = exc_pos.size
    out = bytearray(head.tobytes())
    if w:
        lows = gaps & np.uint64((1 << w) - 1)
        bits = (
            (lows[:, None] >> np.arange(w, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.uint8)
        out += np.packbits(bits.ravel(), bitorder="little").tobytes()
    out += exc_pos.astype(np.uint8).tobytes()
    if exc_pos.size:
        out += encode_varints(gaps[exc_pos] >> np.uint64(w))
    assert len(out) == best_sz, (len(out), best_sz)
    return bytes(out)


def decode_pfor_block(buf: bytes | memoryview, n: int) -> np.ndarray:
    """Inverse of :func:`encode_pfor_block` for ``n`` postings →
    int64 doc ids.  Raises ``ValueError`` on truncated input (the
    fail-loud codec contract)."""
    b = np.frombuffer(buf, np.uint8)
    if b.size < 10:
        raise ValueError("pfor block: truncated header")
    w = int(b[0])
    n_exc = int(b[1])
    first = int(np.frombuffer(b[2:10].tobytes(), np.uint64)[0])
    if n == 1:
        return np.array([first], np.int64)
    m = n - 1
    low_bytes = (m * w + 7) // 8
    if b.size < 10 + low_bytes + n_exc:
        raise ValueError("pfor block: truncated body")
    if w:
        bits = np.unpackbits(b[10:10 + low_bytes],
                             bitorder="little")[: m * w].reshape(m, w)
        gaps = (
            bits.astype(np.uint64)
            * (np.uint64(1) << np.arange(w, dtype=np.uint64))[None, :]
        ).sum(axis=1)
    else:
        gaps = np.zeros(m, np.uint64)
    pos = b[10 + low_bytes:10 + low_bytes + n_exc].astype(np.int64)
    if n_exc:
        highs = decode_varints(
            b[10 + low_bytes + n_exc:].tobytes()
        )[:n_exc].astype(np.uint64)
        gaps[pos] |= highs << np.uint64(w)
    if np.any(gaps == 0):
        raise ValueError("pfor block: zero gap (corrupt)")
    return (first + np.concatenate(([0], np.cumsum(gaps)))).astype(np.int64)


def pfor_encoded_size(doc_ids: np.ndarray, block_size: int = BLOCK_SIZE) -> int:
    """Total NewPFD bytes of a doc-id stream in ``block_size`` blocks —
    computed by ENCODING with the real codec (pins the packer)."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    total = 0
    for i in range(0, d.size, block_size):
        total += len(encode_pfor_block(d[i:i + block_size]))
    return total


def encode_ef(doc_ids: np.ndarray) -> bytes:
    """Plain Elias-Fano over a strictly-increasing non-negative id
    sequence (Vigna, "Quasi-succinct indices", WSDM 2013 — the codec
    behind Lucene's ``Lucene90PostingsFormat`` skip data and the
    north-star family's third member next to LEB128 and FOR):

        [l: u8][n: u32 LE][last: u64 LE]
        [high: unary bitmap, bit (x_i >> l) + i set, packed LSB-first]
        [low: n·l bits, value-major LSB-first]

    with ``l = floor(log2(u / n))`` for universe ``u = last + 1``
    (``l = 0`` when ``u < 2n``).  Total size is exactly
    ``13 + ceil((n + (last >> l) + 1) / 8) + ceil(n·l / 8)`` bytes —
    the integer formula a SQL oracle can replay via
    ``length(bin(u // n)) - 1``.  Fully vectorized: one scatter into
    the high bitmap + one (n, l) bit-matrix, both ``np.packbits``.
    """
    d = np.asarray(doc_ids, dtype=np.uint64)
    n = d.size
    if n == 0:
        raise ValueError("empty sequence")
    last = int(d[-1])
    l = ((last + 1) // n).bit_length() - 1  # floor(log2(u/n)), >= 0
    head = np.empty(13, np.uint8)
    head[0] = l
    head[1:5] = np.frombuffer(np.uint32(n).tobytes(), np.uint8)
    head[5:13] = np.frombuffer(np.uint64(last).tobytes(), np.uint8)
    high_len = n + (last >> l) + 1
    bitmap = np.zeros(high_len, np.uint8)
    bitmap[(d >> np.uint64(l)) + np.arange(n, dtype=np.uint64)] = 1
    out = [head.tobytes(), np.packbits(bitmap, bitorder="little").tobytes()]
    if l:
        lows = d & np.uint64((1 << l) - 1)
        bits = (
            (lows[:, None] >> np.arange(l, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.uint8)
        out.append(np.packbits(bits.ravel(), bitorder="little").tobytes())
    return b"".join(out)


def decode_ef(buf: bytes | memoryview) -> np.ndarray:
    """Inverse of :func:`encode_ef` → int64 id array."""
    b = np.frombuffer(buf, np.uint8)
    l = int(b[0])
    n = int(np.frombuffer(b[1:5].tobytes(), np.uint32)[0])
    last = int(np.frombuffer(b[5:13].tobytes(), np.uint64)[0])
    high_len = n + (last >> l) + 1
    nh = (high_len + 7) // 8
    bitmap = np.unpackbits(b[13:13 + nh], bitorder="little")[:high_len]
    pos = np.flatnonzero(bitmap).astype(np.uint64)
    high = pos - np.arange(n, dtype=np.uint64)
    if l == 0:
        return high.astype(np.int64)
    bits = np.unpackbits(b[13 + nh:], bitorder="little")[: n * l].reshape(n, l)
    lows = (
        bits.astype(np.uint64)
        * (np.uint64(1) << np.arange(l, dtype=np.uint64))[None, :]
    ).sum(axis=1)
    return ((high << np.uint64(l)) | lows).astype(np.int64)


def encode_frontcoded_block(terms: list[str]) -> bytes:
    """Front-coded term-dictionary block (the Lucene BlockTree terms
    dict / ``Lucene90BlockTreeTermsWriter`` prefix-sharing analog —
    the structure that keeps a billion-term vocab readable): sorted
    terms in one block as

        [n: u8][len₀: u8][term₀ bytes]
        then per term: [lcp: u8][suffix_len: u8][suffix bytes]

    with ``lcp`` = longest common prefix with the PREVIOUS term.
    Exact size: ``2 + len(term₀) + Σ (2 + len_i − lcp_i)`` bytes —
    the integer formula a SQL oracle replays from consecutive-pair
    prefix comparison."""
    if not 0 < len(terms) <= 255:
        raise ValueError("block must hold 1..255 terms")
    enc = [t.encode("utf-8") for t in terms]
    if any(len(e) > 255 for e in enc):
        raise ValueError("term longer than 255 bytes")
    out = [bytes([len(enc)]), bytes([len(enc[0])]), enc[0]]
    for prev, cur in zip(enc, enc[1:]):
        if cur <= prev:
            raise ValueError("terms must be strictly sorted")
        lcp = 0
        for a, b in zip(prev, cur):
            if a != b:
                break
            lcp += 1
        out.append(bytes([lcp, len(cur) - lcp]))
        out.append(cur[lcp:])
    return b"".join(out)


def decode_frontcoded_block(buf: bytes | memoryview) -> list[str]:
    """Inverse of :func:`encode_frontcoded_block`.

    Corrupt input (truncated bytes, zero term count, an lcp longer
    than the previous term, trailing garbage) raises ``ValueError`` —
    the same fail-loud contract as the sibling decoders
    (``decode_ef``, ``decode_png_pixels``, ``decode_gif_pixels``)."""
    b = bytes(buf)
    if len(b) < 2:
        raise ValueError("frontcoded block: truncated header")
    n = b[0]
    if n == 0:
        raise ValueError("frontcoded block: zero term count")
    ln = b[1]
    pos = 2 + ln
    if pos > len(b):
        raise ValueError("frontcoded block: truncated first term")
    terms = [b[2:pos]]
    for _ in range(n - 1):
        if pos + 2 > len(b):
            raise ValueError("frontcoded block: truncated entry header")
        lcp, sl = b[pos], b[pos + 1]
        if lcp > len(terms[-1]):
            raise ValueError(
                f"frontcoded block: lcp {lcp} exceeds previous term "
                f"length {len(terms[-1])}"
            )
        pos += 2
        if pos + sl > len(b):
            raise ValueError("frontcoded block: truncated suffix bytes")
        terms.append(terms[-1][:lcp] + b[pos:pos + sl])
        pos += sl
    if pos != len(b):
        raise ValueError("frontcoded block: trailing bytes after last term")
    return [t.decode("utf-8") for t in terms]


ROARING_ARRAY_MAX = 4096  # array→bitmap container switch cardinality


def encode_roaring(doc_ids: np.ndarray) -> bytes:
    """Roaring bitmap over a strictly-increasing doc-id set < 2³²
    (Chambi/Lemire/Kaser/Godin, "Better bitmap performance with
    Roaring bitmaps", SPE 2016 — the doc-id-set container Lucene uses
    for live-docs / filter caches, fourth member of the posting codec
    family next to LEB128/FOR/Elias-Fano):

        [n_containers: u32 LE]
        per container (ascending key):
          [key: u16 LE][card-1: u16 LE]
          array container  (card ≤ 4096): card × u16 LE sorted low bits
          bitmap container (card > 4096): 8192 bytes, LSB-first bits

    so the total size is exactly
    ``4 + Σ (4 + (2·card if card ≤ 4096 else 8192))`` — the integer
    formula a SQL oracle can replay from per-``doc_id // 65536``
    cardinalities.  Fully vectorized: one ``np.unique`` on the high
    halves, ``tobytes`` per array container, one boolean scatter +
    ``np.packbits`` per bitmap container."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        raise ValueError("empty sequence")
    if d.size > 1 and not (d[1:] > d[:-1]).all():
        raise ValueError("doc ids must be strictly increasing")
    if int(d[-1]) >> 32:
        raise ValueError("roaring requires ids < 2**32")
    high = (d >> np.uint64(16)).astype(np.uint32)
    low = (d & np.uint64(0xFFFF)).astype("<u2")
    keys, starts = np.unique(high, return_index=True)
    ends = np.append(starts[1:], d.size)
    out = [np.uint32(keys.size).tobytes()]
    for key, s, e in zip(keys, starts, ends):
        card = int(e - s)
        hdr = np.empty(2, "<u2")
        hdr[0] = key
        hdr[1] = card - 1
        out.append(hdr.tobytes())
        if card <= ROARING_ARRAY_MAX:
            out.append(low[s:e].tobytes())
        else:
            bits = np.zeros(65536, np.uint8)
            bits[low[s:e]] = 1
            out.append(np.packbits(bits, bitorder="little").tobytes())
    return b"".join(out)


def decode_roaring(buf: bytes | memoryview) -> np.ndarray:
    """Inverse of :func:`encode_roaring` → strictly-increasing int64
    id array.  Corrupt input (truncation, unsorted/duplicate container
    keys, non-increasing array values, trailing bytes, bitmap
    popcount ≠ card) raises ``ValueError`` — the module's fail-loud
    decoder contract."""
    b = np.frombuffer(buf, np.uint8)
    if b.size < 4:
        raise ValueError("roaring: truncated header")
    n_cont = int(np.frombuffer(b[:4].tobytes(), np.uint32)[0])
    if n_cont == 0:
        raise ValueError("roaring: zero containers")
    pos = 4
    parts: list[np.ndarray] = []
    prev_key = -1
    for _ in range(n_cont):
        if pos + 4 > b.size:
            raise ValueError("roaring: truncated container header")
        key = int(np.frombuffer(b[pos:pos + 2].tobytes(), "<u2")[0])
        card = int(np.frombuffer(b[pos + 2:pos + 4].tobytes(), "<u2")[0]) + 1
        if key <= prev_key:
            raise ValueError("roaring: container keys not ascending")
        prev_key = key
        pos += 4
        if card <= ROARING_ARRAY_MAX:
            if pos + 2 * card > b.size:
                raise ValueError("roaring: truncated array container")
            lows = np.frombuffer(b[pos:pos + 2 * card].tobytes(), "<u2")
            if card > 1 and not (lows[1:] > lows[:-1]).all():
                raise ValueError("roaring: array container not increasing")
            pos += 2 * card
        else:
            if pos + 8192 > b.size:
                raise ValueError("roaring: truncated bitmap container")
            lows = np.flatnonzero(
                np.unpackbits(b[pos:pos + 8192], bitorder="little")
            )
            if lows.size != card:
                raise ValueError(
                    f"roaring: bitmap popcount {lows.size} != card {card}"
                )
            pos += 8192
        parts.append(
            (np.uint64(key) << np.uint64(16))
            | lows.astype(np.uint64)
        )
    if pos != b.size:
        raise ValueError("roaring: trailing bytes")
    return np.concatenate(parts).astype(np.int64)


def roaring_container_stats(doc_ids: np.ndarray) -> tuple[int, int]:
    """(n array containers, n bitmap containers) the REAL encoder
    would emit — accounting twin of :func:`encode_roaring` for the
    catalog's storage meter."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    high = (d >> np.uint64(16)).astype(np.uint32)
    _, counts = np.unique(high, return_counts=True)
    n_bitmap = int((counts > ROARING_ARRAY_MAX).sum())
    return int(counts.size) - n_bitmap, n_bitmap


# ------------------------------------------------------- Elias gamma

def encode_gamma(values: np.ndarray) -> bytes:
    """Elias-gamma code over uint64 values (Elias 1975 — the classic
    parameter-free gap code; the third codec family next to LEB128
    and FOR/PFOR).  Zero-able inputs map through ``m = v + 1``:
    ``m``'s bit length L yields L−1 unary zeros then the L bits of
    ``m`` MSB-first — 2·⌊log₂(v+1)⌋+1 bits per value, padded to a
    byte boundary with zeros."""
    vals = np.asarray(values, np.uint64)
    bits: list[int] = []
    for v in vals.tolist():
        m = int(v) + 1
        L = m.bit_length()
        bits.extend([0] * (L - 1))
        for i in range(L - 1, -1, -1):
            bits.append((m >> i) & 1)
    if len(bits) % 8:
        bits.extend([0] * (8 - len(bits) % 8))
    return np.packbits(np.array(bits, np.uint8)).tobytes()


def decode_gamma(buf: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`encode_gamma` — decodes exactly ``n`` values;
    raises ``ValueError`` on truncated input (the codec-family
    fail-loud contract)."""
    bits = np.unpackbits(np.frombuffer(buf, np.uint8))
    out = np.empty(n, np.uint64)
    pos = 0
    for i in range(n):
        z = 0
        while pos < bits.size and bits[pos] == 0:
            z += 1
            pos += 1
        if pos + z + 1 > bits.size:
            raise ValueError("gamma: truncated input")
        m = 1
        pos += 1  # the leading 1 bit
        for _ in range(z):
            m = (m << 1) | int(bits[pos])
            pos += 1
        out[i] = m - 1
    return out
