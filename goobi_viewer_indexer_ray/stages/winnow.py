"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003
— the MOSS algorithm): position-robust local fingerprinting for text
reuse / plagiarism / decontamination sweeps.

Per document: token k-grams (k=3) are hashed (md5 prefix, 40 bits);
every window of w=4 consecutive k-gram hashes selects its MINIMUM,
ties broken by the RIGHTMOST position.  The guarantee the paper
proves: any shared substring of ≥ w+k−1 tokens yields at least one
shared fingerprint, while expected density is 2/(w+1) — sublinear
storage with a detection floor, which is why it beats both "hash every
k-gram" (dup_ngrams' exhaustive mode) and single-hash fingerprints for
reuse detection.

Exactness trick: the min-with-rightmost-tie selection packs into ONE
integer key per k-gram::

    key = h · 2²⁴ + (2²⁴ − 1 − (i − 1))        (h < 2⁴⁰, i = 1-based pos)

so ``min(key)`` over a window IS (min h, rightmost i) — replayable in
SQL as a plain windowed ``min()`` with a ``ROWS BETWEEN w−1 PRECEDING``
frame.  Docs shorter than w k-grams contribute their single partial
window (the window ending at the last k-gram); docs with < k tokens
have no fingerprints.

Output per doc: ``(doc_id, n_kgrams, n_fps, fp_xor)`` — fingerprint
count (distinct selected keys) and their XOR masked to 63 bits (the
set checksum that makes the oracle comparison pin every selected
fingerprint, not just the count).

Scale shape: one stateless ``map_batches`` pass — k-gram hashing is
one md5 per DISTINCT code triple per batch, window minima are w−1
vectorized ``np.minimum`` shifts over the batch-flat key array with
doc boundaries masked, per-doc dedup/XOR is one ``np.unique`` +
segmented fold.  No shuffle at all; the fingerprints themselves would
feed the existing ``groupby(hash)`` reuse join (``dup_ngrams``) at
2/(w+1) the volume.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .text_ops import _flat_token_codes

__all__ = ["winnow_fingerprints", "winnow_hash_rows", "WIN_K", "WIN_W"]

WIN_K = 3          # tokens per k-gram
WIN_W = 4          # k-gram hashes per window
_HEX = 10          # md5 prefix hex chars → 40-bit hash
_POS_BITS = 24     # position field: docs up to 2²⁴ k-grams
_POS_MASK = (1 << _POS_BITS) - 1


def _kgram_hashes(counts: np.ndarray, codes: np.ndarray, uniq: np.ndarray):
    """Batch-flat k-gram hash array + per-doc k-gram counts.

    Hashing cost is one md5 per DISTINCT (c₀,c₁,c₂) triple in the
    batch, never per occurrence."""
    n_docs = counts.size
    nkg = np.maximum(counts - (WIN_K - 1), 0)
    if codes.size == 0 or int(nkg.sum()) == 0:
        return np.empty(0, np.uint64), nkg
    starts = np.cumsum(counts) - counts
    # flat indices of each doc's k-gram start positions
    kg_starts = np.repeat(starts, nkg) + (
        np.arange(int(nkg.sum())) - np.repeat(np.cumsum(nkg) - nkg, nkg)
    )
    v = np.int64(uniq.size)
    packed = (
        codes[kg_starts] * v * v + codes[kg_starts + 1] * v + codes[kg_starts + 2]
    )
    upacked, inv = np.unique(packed, return_inverse=True)
    c0 = (upacked // (v * v)).astype(np.int64)
    c1 = ((upacked // v) % v).astype(np.int64)
    c2 = (upacked % v).astype(np.int64)
    md5 = hashlib.md5
    hs = np.fromiter(
        (
            int(md5(f"{uniq[a]} {uniq[b]} {uniq[c]}".encode()).hexdigest()[:_HEX], 16)
            for a, b, c in zip(c0, c1, c2)
        ),
        dtype=np.uint64,
        count=upacked.size,
    )
    return hs[inv], nkg


def _selected_keys(t: pa.Table):
    """Batch-flat winnow selection shared by both output shapes:
    ``(out_ids, out_nkg, sel_doc, sel_key)`` where ``sel_doc`` indexes
    into ``out_ids`` and ``sel_key`` are the selected (NOT yet
    deduplicated) packed ``h·2²⁴ + pos`` window-min keys."""
    ids, counts, codes, uniq = _flat_token_codes(t)
    h, nkg = _kgram_hashes(counts, codes, uniq)
    keep = nkg > 0
    out_ids, out_nkg = ids[keep], nkg[keep]
    if h.size == 0:
        return out_ids, out_nkg, np.empty(0, np.int64), np.empty(0, np.uint64)
    kg_starts = np.cumsum(out_nkg) - out_nkg
    pos = np.arange(h.size, dtype=np.uint64) - np.repeat(
        kg_starts.astype(np.uint64), out_nkg
    )  # 0-based local k-gram index (= i−1)
    key = (h << np.uint64(_POS_BITS)) + (np.uint64(_POS_MASK) - pos)
    doc_of = np.repeat(np.arange(out_ids.size, dtype=np.int64), out_nkg)

    # windowed min over the last WIN_W keys, doc boundaries masked:
    # shift j contributes key[i−j] when both indices are in-doc
    wmin = key.copy()
    for j in range(1, WIN_W):
        shifted = np.empty_like(key)
        shifted[:j] = np.uint64(0xFFFFFFFFFFFFFFFF)
        shifted[j:] = key[:-j]
        same = np.zeros(key.size, bool)
        same[j:] = doc_of[j:] == doc_of[:-j]
        wmin = np.where(same, np.minimum(wmin, shifted), wmin)
    # windows that count: position ≥ min(w, n_kg) − 1  (full windows,
    # plus the single partial window of a short doc)
    cutoff = np.minimum(out_nkg, WIN_W).astype(np.uint64) - np.uint64(1)
    valid = pos >= np.repeat(cutoff, out_nkg)
    return out_ids, out_nkg, doc_of[valid], wmin[valid]


def winnow_batch(t: pa.Table) -> pa.Table:
    out_ids, out_nkg, sel_doc, sel_key = _selected_keys(t)
    if sel_key.size == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_kgrams": pa.array([], pa.int64()),
                "n_fps": pa.array([], pa.int64()),
                "fp_xor": pa.array([], pa.int64()),
            }
        )
    # per-doc distinct selected keys → count + 63-bit-masked XOR
    order = np.lexsort((sel_key, sel_doc))
    sd, sk = sel_doc[order], sel_key[order]
    first = np.ones(sd.size, bool)
    first[1:] = (sd[1:] != sd[:-1]) | (sk[1:] != sk[:-1])
    sd, sk = sd[first], sk[first]
    seg = np.flatnonzero(np.r_[True, sd[1:] != sd[:-1]])
    n_fps = np.diff(np.r_[seg, sd.size])
    fp_xor = np.bitwise_xor.reduceat(sk, seg) & np.uint64((1 << 63) - 1)
    return pa.table(
        {
            "doc_id": pa.array(out_ids[sd[seg]], pa.int64()),
            "n_kgrams": pa.array(out_nkg[sd[seg]], pa.int64()),
            "n_fps": pa.array(n_fps, pa.int64()),
            "fp_xor": pa.array(fp_xor.astype(np.int64), pa.int64()),
        }
    )


def winnow_fingerprints(ds):
    """Dataset of ``(doc_id, n_kgrams, n_fps, fp_xor)`` — see module
    docstring.  One stateless vectorized pass, no shuffle."""
    return ds.map_batches(winnow_batch, batch_format="pyarrow")


def winnow_hash_rows_batch(t: pa.Table) -> pa.Table:
    """Selected fingerprints as join rows: ``(doc_id, sh, n)``.

    ``sh`` is the POSITION-STRIPPED 40-bit k-gram hash (``key ≫ 24``)
    — cross-doc matching must compare hashes, not packed keys, since
    the position field differs between documents; ``n`` is the doc's
    distinct selected-hash count, riding every row so the pair reducer
    gets both set sizes for free (the ``_verify_pairs`` contract in
    :mod:`stages.dedup`)."""
    out_ids, out_nkg, sel_doc, sel_key = _selected_keys(t)
    if sel_key.size == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "sh": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    h = (sel_key >> np.uint64(_POS_BITS)).astype(np.int64)
    order = np.lexsort((h, sel_doc))
    sd, sk = sel_doc[order], h[order]
    first = np.ones(sd.size, bool)
    first[1:] = (sd[1:] != sd[:-1]) | (sk[1:] != sk[:-1])
    sd, sk = sd[first], sk[first]
    seg = np.flatnonzero(np.r_[True, sd[1:] != sd[:-1]])
    n_per_doc = np.diff(np.r_[seg, sd.size])
    return pa.table(
        {
            "doc_id": pa.array(out_ids[sd], pa.int64()),
            "sh": pa.array(sk, pa.int64()),
            "n": pa.array(np.repeat(n_per_doc, n_per_doc), pa.int64()),
        }
    )


def winnow_hash_rows(ds):
    """Dataset of ``(doc_id, sh, n)`` selected-hash rows — the
    2/(w+1)-density input to the MOSS-style reuse pair join
    (``catalog.q_winnow_pairs``)."""
    return ds.map_batches(winnow_hash_rows_batch, batch_format="pyarrow")
