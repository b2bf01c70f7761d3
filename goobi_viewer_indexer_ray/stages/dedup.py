"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Training-data-pipeline first-class operators (driver brief).  All are
Ray-Data-native compositions:

- **exact**: content hash per batch → ``groupby(hash)`` keep first
  (the URN-collision / prepareUpdate analog,
  ``AbstractWriteStrategy.java:158-195``).
- **jaccard pairs (exact)**: shingle blocking has full recall for any
  J > 0 (two docs with a common shingle share a block), so
  shingle-join + exact verify reproduces ALL pairs with J ≥ t —
  SQL-checkable.  Cost grows with shingle co-occurrence; the scale
  path is the MinHash-LSH variant below.
- **MinHash-LSH**: signature → banded buckets → ``groupby(band)`` →
  candidate pairs → exact-Jaccard verify.  Probabilistic recall,
  tunable via (num_perm, bands).
- **SimHash**: 64-bit fingerprints + 16-bit band blocking for
  near-pairs by Hamming distance.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64
from .text_ops import shingles_batch, simhash_batch

__all__ = [
    "content_hash_batch",
    "exact_dedup_groups",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
]

_MERSENNE = (1 << 61) - 1


def content_hash_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    hs = [hashlib.md5((t or "").encode()).hexdigest() for t in batch.column("text").to_pylist()]
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text_md5": pa.array(hs, pa.string())}
    )


def exact_dedup_groups(ds):
    """documents → (text_md5, n_docs, min_doc_id): duplicate clusters.

    ``groupby(hash)`` + per-group aggregate — the hash-partitioned
    exact dedup; `keep = min_doc_id` is the deterministic survivor.
    """
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(content_hash_batch, batch_format="pyarrow")
    return hashed.groupby("text_md5").aggregate(
        Count(alias_name="n_docs"), Min("doc_id", alias_name="min_doc_id")
    )


def jaccard_pairs(ds, *, n: int = 5, threshold: float = 0.1):
    """All doc pairs with shingle-set Jaccard ≥ threshold (exact).

    shingle → groupby(sh) pair generation → groupby(pair) intersection
    count → broadcast set-size lookup → exact J filter.  Returns
    (doc_a, doc_b, inter, uni) with integer set algebra (exact compare
    vs the SQL oracle — no float rounding in the output).
    """
    import ray
    from ray.data.aggregate import Count

    sh = ds.map_batches(lambda t: shingles_batch(t, n), batch_format="pyarrow")
    sizes_df = sh.groupby("doc_id").aggregate(Count(alias_name="n")).to_pandas()
    sizes_ref = ray.put(dict(zip(sizes_df["doc_id"], sizes_df["n"])))

    def emit_pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("doc_id").to_numpy())
        if ids.size < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        a, b = np.triu_indices(ids.size, k=1)
        return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b])})

    pairs = sh.groupby("sh").map_groups(emit_pairs, batch_format="pyarrow")
    inter = pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="inter"))

    def finalize(t: pa.Table) -> pa.Table:
        sizes = ray.get(sizes_ref)
        da = t.column("doc_a").to_numpy()
        db = t.column("doc_b").to_numpy()
        it = t.column("inter").to_numpy().astype(np.int64)
        na = np.array([sizes[int(x)] for x in da], dtype=np.int64)
        nb = np.array([sizes[int(x)] for x in db], dtype=np.int64)
        uni = na + nb - it
        keep = (it.astype(np.float64) / uni) >= threshold
        return pa.table(
            {
                "doc_a": pa.array(da[keep]),
                "doc_b": pa.array(db[keep]),
                "inter": pa.array(it[keep]),
                "uni": pa.array(uni[keep]),
            }
        )

    return inter.map_batches(finalize, batch_format="pyarrow")


def _minhash_params(num_perm: int, seed: int = 1234567):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(ds, *, n: int = 5, num_perm: int = 64):
    """(doc_id, sig:list<uint64>) MinHash signatures over n-gram shingles."""
    a, b = _minhash_params(num_perm)

    def sig_batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        from ..functions.tokenize import tokenize

        out_ids, out_sigs = [], []
        for did, txt in zip(ids, texts):
            ts = tokenize(txt or "")
            sh = {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}
            if not sh:
                continue
            hv = np.array([hash64(s) % _MERSENNE for s in sh], dtype=np.uint64)
            # sig_i = min over shingles of (a_i * h + b_i) mod p
            prods = (a[:, None] * hv[None, :] + b[:, None]) % np.uint64(_MERSENNE)
            out_ids.append(did)
            out_sigs.append(prods.min(axis=1).tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "sig": pa.array(out_sigs, pa.list_(pa.uint64())),
            }
        )

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def minhash_lsh_pairs(ds, *, n: int = 5, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5):
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    Scale path of :func:`jaccard_pairs`: candidates only from docs
    sharing an LSH band bucket.  Verification joins candidate doc ids
    back to their shingle sets (driver-side pandas for the final small
    candidate set — documented partitioning assumption: candidates ≪
    corpus; at cluster scale verify via a bucketed join instead).
    Returns (doc_a, doc_b, inter, uni).
    """
    from ray.data.aggregate import Count  # noqa: F401  (parallel import path warm)

    r = num_perm // bands
    sigs = minhash_signatures(ds, n=n, num_perm=num_perm)

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        sigs_l = t.column("sig").to_pylist()
        b_ids, b_hash, b_doc = [], [], []
        for did, sig in zip(ids, sigs_l):
            for bi in range(bands):
                chunk = tuple(sig[bi * r : (bi + 1) * r])
                b_ids.append(bi)
                b_hash.append(hash64(repr(chunk)))
                b_doc.append(did)
        return pa.table(
            {
                "band": pa.array(b_ids, pa.int32()),
                "bhash": pa.array(b_hash, pa.uint64()),
                "doc_id": pa.array(b_doc, pa.int64()),
            }
        )

    def emit(g: pa.Table) -> pa.Table:
        ids = np.sort(np.unique(g.column("doc_id").to_numpy()))
        if ids.size < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        a, b = np.triu_indices(ids.size, k=1)
        return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b])})

    cands = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "bhash"])
        .map_groups(emit, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    if cands.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "inter": pd.Series([], dtype="int64"),
                             "uni": pd.Series([], dtype="int64")})

    needed = set(cands["doc_a"]) | set(cands["doc_b"])
    sh = (
        ds.map_batches(lambda t: shingles_batch(t, n), batch_format="pyarrow")
        .to_pandas()
    )
    sets = {did: set(g["sh"]) for did, g in sh[sh["doc_id"].isin(needed)].groupby("doc_id")}
    rows = []
    for a_, b_ in zip(cands["doc_a"], cands["doc_b"]):
        sa, sb = sets.get(int(a_), set()), sets.get(int(b_), set())
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        uni = len(sa | sb)
        if inter / uni >= threshold:
            rows.append((int(a_), int(b_), inter, uni))
    rows.sort()
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "inter", "uni"]).astype("int64")


def simhash_pairs(ds, *, max_hamming: int = 3):
    """SimHash near-pairs: 4×16-bit band blocking, Hamming-verified.

    Returns (doc_a, doc_b, hamming).  A pair with Hamming distance ≤ 3
    over 64 bits must agree on at least one of the 4 16-bit bands
    (pigeonhole), so band blocking has full recall for the cutoff.
    """
    sigs = ds.map_batches(simhash_batch, batch_format="pyarrow").to_pandas()
    sigs["sig"] = sigs["simhash_hex"].apply(lambda h: int(h, 16))
    buckets: dict[tuple[int, int], list[int]] = {}
    by_id = dict(zip(sigs["doc_id"].astype(int), sigs["sig"]))
    for did, sig in by_id.items():
        for b in range(4):
            key = (b, (sig >> (16 * b)) & 0xFFFF)
            buckets.setdefault(key, []).append(did)
    seen = set()
    rows = []
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                p = (ids[i], ids[j])
                if p in seen:
                    continue
                seen.add(p)
                h = bin(by_id[p[0]] ^ by_id[p[1]]).count("1")
                if h <= max_hamming:
                    rows.append((p[0], p[1], h))
    rows.sort()
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype("int64")
