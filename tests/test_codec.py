import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from goobi_viewer_indexer_ray.functions.codec import (
    BLOCK_SIZE,
    decode_block,
    decode_term,
    decode_varints,
    encode_term_blocks,
    encode_varints,
)
from goobi_viewer_indexer_ray.functions.scoring import impact


def test_varint_edges():
    vals = [0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**63, 2**64 - 1]
    arr = np.array(vals, dtype=np.uint64)
    assert decode_varints(encode_varints(arr)).tolist() == vals
    assert encode_varints(np.empty(0, np.uint64)) == b""
    assert decode_varints(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = decode_varints(encode_varints(arr))
    assert out.tolist() == vals


def test_block_roundtrip_and_metadata():
    rng = np.random.default_rng(7)
    docs = np.sort(rng.choice(10**7, 1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 40, 1000).astype(np.int64)
    dls = rng.integers(5, 3000, 1000).astype(np.int64)
    avgdl = 387.5
    blocks = encode_term_blocks(docs, tfs, dls)
    assert len(blocks) == (1000 + BLOCK_SIZE - 1) // BLOCK_SIZE
    d, t, l = decode_term(blocks)
    assert (d == docs).all() and (t == tfs).all() and (l == dls).all()
    for b in blocks:
        bd, bt, bl = decode_block(b)
        assert b["first_doc"] == bd[0] and b["max_doc"] == bd[-1] and b["n"] == bd.size
        # impact(max_tf, min_dl) is an admissible (>=) pruning bound
        true_max = float(np.max(impact(bt, bl, avgdl)))
        bound = float(impact(np.array([b["max_tf"]]), np.array([b["min_dl"]]), avgdl)[0])
        assert bound >= true_max


def test_single_posting():
    blocks = encode_term_blocks(np.array([5]), np.array([2]), np.array([10]))
    d, t, l = decode_term(blocks)
    assert d.tolist() == [5] and t.tolist() == [2] and l.tolist() == [10]


def test_for_block_roundtrip_fuzz():
    """FOR bit-packing: decode(encode(x)) == x over 200 random
    strictly-increasing streams spanning widths 1..40+, incl. the
    single-posting (w=0) block, and the size is exactly
    9 + ceil(gaps·w/8) per block."""
    import numpy as np

    from goobi_viewer_indexer_ray.functions.codec import (
        BLOCK_SIZE,
        decode_for_block,
        encode_for_block,
        for_encoded_size,
    )

    rng = np.random.default_rng(1)
    for trial in range(200):
        n = int(rng.integers(1, 300))
        hi = int(rng.choice([2, 10, 1000, 2**20, 2**40]))
        gaps = rng.integers(1, hi, n - 1) if n > 1 else np.array([], np.int64)
        d = np.concatenate(
            ([rng.integers(0, 2**40)], gaps)).cumsum().astype(np.int64)
        expect_size = 0
        for i in range(0, n, BLOCK_SIZE):
            blk = d[i:i + BLOCK_SIZE]
            buf = encode_for_block(blk)
            assert (decode_for_block(buf, blk.size) == blk).all(), trial
            g = np.diff(blk.astype(np.uint64))
            w = max((int(x).bit_length() for x in g), default=0)
            assert len(buf) == 9 + (g.size * w + 7) // 8, trial
            expect_size += len(buf)
        assert for_encoded_size(d) == expect_size, trial


def test_ef_roundtrip_and_size_formula():
    """Elias-Fano: 300-stream roundtrip fuzz across density regimes +
    the exact byte-size formula the SQL oracle replays (l via
    bit_length, high bitmap n + (last >> l) + 1 bits)."""
    import numpy as np

    from goobi_viewer_indexer_ray.functions.codec import decode_ef, encode_ef

    rng = np.random.default_rng(7)
    for _ in range(300):
        n = int(rng.integers(1, 400))
        u = int(rng.integers(n, n * int(rng.choice([1, 2, 10, 1000, 10**6])) + 1))
        d = np.sort(rng.choice(u, size=n, replace=False)).astype(np.uint64)
        buf = encode_ef(d)
        assert np.array_equal(decode_ef(buf), d.astype(np.int64))
        last = int(d[-1])
        l = ((last + 1) // n).bit_length() - 1
        assert len(buf) == 13 + (n + (last >> l) + 1 + 7) // 8 + (n * l + 7) // 8
    for d in (np.array([0], np.uint64), np.arange(100, dtype=np.uint64),
              np.array([2**40], np.uint64)):
        assert np.array_equal(decode_ef(encode_ef(d)), d.astype(np.int64))


def test_ef_beats_varint_on_dense_streams():
    """The reason EF is in the codec family: dense postings (u ≈ n)
    cost ~2 bits/posting vs LEB128's 8-bit floor."""
    import numpy as np

    from goobi_viewer_indexer_ray.functions.codec import encode_ef, encode_varints

    d = np.arange(0, 20_000, 2, dtype=np.uint64)   # every 2nd doc
    gaps = np.concatenate(([d[0]], np.diff(d)))
    assert len(encode_ef(d)) < len(encode_varints(gaps)) / 2


def test_frontcode_roundtrip_and_size():
    """Front-coded terms-dict block: roundtrip fuzz + the exact size
    formula the SQL oracle replays, plus the strict-sort guard."""
    import numpy as np
    import pytest

    from goobi_viewer_indexer_ray.functions.codec import (
        decode_frontcoded_block,
        encode_frontcoded_block,
    )

    rng = np.random.default_rng(3)
    words = ["merge", "hash", "join", "scan", "sort", "key"]
    for _ in range(200):
        k = int(rng.integers(1, 40))
        terms = sorted({
            f"{rng.choice(words)} {rng.choice(words)}{int(rng.integers(0, 99))}"
            for _ in range(k)
        })
        buf = encode_frontcoded_block(terms)
        assert decode_frontcoded_block(buf) == terms
        enc = [t.encode() for t in terms]
        exp = 2 + len(enc[0])
        for p, c in zip(enc, enc[1:]):
            lcp = 0
            for a, b in zip(p, c):
                if a != b:
                    break
                lcp += 1
            exp += 2 + len(c) - lcp
        assert len(buf) == exp
    with pytest.raises(ValueError):
        encode_frontcoded_block(["b", "a"])
    with pytest.raises(ValueError):
        encode_frontcoded_block([])


def test_frontcoded_corrupt_inputs_raise():
    """Round-4 ADVICE: corrupt buffers must raise ValueError like the
    sibling decoders, never silently return wrong terms."""
    import pytest

    from goobi_viewer_indexer_ray.functions.codec import (
        decode_frontcoded_block,
        encode_frontcoded_block,
    )

    good = encode_frontcoded_block(["alpha", "alphabet", "beta"])
    assert decode_frontcoded_block(good) == ["alpha", "alphabet", "beta"]
    cases = [
        b"",                       # truncated header
        b"\x00",                   # truncated header
        bytes([0, 1]) + b"a",      # zero term count
        good[:-1],                 # truncated suffix bytes
        good + b"x",               # trailing garbage
        bytes([2, 1]) + b"a" + bytes([5, 0]),  # lcp > previous term
        bytes([3, 1]) + b"a",      # truncated entry header
    ]
    for c in cases:
        with pytest.raises(ValueError):
            decode_frontcoded_block(c)


def test_roaring_roundtrip_and_size_formula():
    import numpy as np

    from goobi_viewer_indexer_ray.functions.codec import (
        decode_roaring,
        encode_roaring,
        roaring_container_stats,
    )

    rng = np.random.default_rng(11)
    # sparse (array containers), boundary 4096/4097, multi-container,
    # and dense (bitmap containers) streams
    cases = [
        np.array([0], np.uint64),
        np.array([65535, 65536], np.uint64),  # container boundary
        np.sort(rng.choice(1_000_000, 4096, replace=False)).astype(np.uint64),
        np.sort(rng.choice(200_000, 9000, replace=False)).astype(np.uint64),
        np.arange(100_000, 170_000, dtype=np.uint64),  # dense → bitmap
    ]
    for ids in cases:
        buf = encode_roaring(ids)
        assert (decode_roaring(buf) == ids.astype(np.int64)).all()
        # exact size formula: 4 + per-container (4 + payload)
        high = ids >> np.uint64(16)
        _, cards = np.unique(high, return_counts=True)
        want = 4 + sum(
            4 + (2 * int(c) if c <= 4096 else 8192) for c in cards
        )
        assert len(buf) == want
        n_array, n_bitmap = roaring_container_stats(ids)
        assert n_array == int((cards <= 4096).sum())
        assert n_bitmap == int((cards > 4096).sum())
    # a single 65536-dense container is exactly 4 + 4 + 8192 bytes
    full = np.arange(65536, dtype=np.uint64)
    assert len(encode_roaring(full)) == 4 + 4 + 8192


def test_roaring_corrupt_inputs_raise():
    import numpy as np
    import pytest

    from goobi_viewer_indexer_ray.functions.codec import (
        decode_roaring,
        encode_roaring,
    )

    good = encode_roaring(np.array([1, 2, 70000], np.uint64))
    assert (decode_roaring(good) == [1, 2, 70000]).all()
    bad = [
        b"",                      # truncated header
        b"\x00\x00\x00\x00",      # zero containers
        good[:-1],                # truncated payload
        good + b"\x00",           # trailing bytes
        # keys not ascending: swap the two container records
        good[:4] + good[4 + 8:] + good[4:4 + 8],
    ]
    for c in bad:
        with pytest.raises(ValueError):
            decode_roaring(c)
    with pytest.raises(ValueError):
        encode_roaring(np.array([], np.uint64))
    with pytest.raises(ValueError):
        encode_roaring(np.array([5, 5], np.uint64))  # not increasing
    with pytest.raises(ValueError):
        encode_roaring(np.array([1 << 33], np.uint64))  # ≥ 2³²


@settings(max_examples=50, deadline=None)
@given(
    st.sets(
        st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=400
    )
)
def test_roaring_roundtrip_property(vals):
    from goobi_viewer_indexer_ray.functions.codec import (
        decode_roaring,
        encode_roaring,
    )

    ids = np.array(sorted(vals), np.uint64)
    assert (decode_roaring(encode_roaring(ids)) == ids.astype(np.int64)).all()
