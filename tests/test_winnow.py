"""Winnowing (stages/winnow.py): the paper's detection guarantee,
density bound, and partition invariance."""

import numpy as np
import pyarrow as pa

from goobi_viewer_indexer_ray.stages.winnow import (
    WIN_K,
    WIN_W,
    winnow_batch,
    winnow_fingerprints,
)


def _tbl(texts: dict[int, str]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )


def _selected_keys(text: str) -> set[int]:
    """Run winnow_batch on a single doc and recover the selected key
    set from (n_fps, fp_xor) being insufficient — so recompute selected
    keys directly with the same packed-key rule, as the reference
    implementation for property checks."""
    import hashlib

    toks = text.split()
    n = len(toks) - (WIN_K - 1)
    keys = []
    for i in range(n):
        g = " ".join(toks[i : i + WIN_K])
        h = int(hashlib.md5(g.encode()).hexdigest()[:10], 16)
        keys.append((h << 24) + ((1 << 24) - 1 - i))
    sel = set()
    for j in range(min(WIN_W, n) - 1, n):
        lo = max(0, j - WIN_W + 1)
        sel.add(min(keys[lo : j + 1]))
    return sel


def test_shared_substring_guarantee(ray_session):
    """Any shared run of ≥ w+k−1 tokens must yield ≥ 1 shared
    fingerprint HASH between the two docs (theorem 1 of the paper)."""
    shared = " ".join(f"s{i}" for i in range(WIN_W + WIN_K - 1))
    a = "alpha beta gamma " + shared + " delta epsilon"
    b = "one two three four five " + shared + " six"
    ka = {k >> 24 for k in _selected_keys(a)}
    kb = {k >> 24 for k in _selected_keys(b)}
    assert ka & kb, "no shared fingerprint for a shared w+k-1 run"


def test_density_and_engine_matches_reference(ray_session):
    """Engine output (n_fps, fp_xor) equals the reference selection;
    fingerprint density stays within the paper's expectation band."""
    rng = np.random.default_rng(11)
    texts = {
        i: " ".join(f"w{rng.integers(0, 50)}" for _ in range(200))
        for i in range(20)
    }
    out = winnow_batch(_tbl(texts))
    got = {
        int(r["doc_id"]): (int(r["n_fps"]), int(r["fp_xor"]))
        for r in out.to_pylist()
    }
    for i, txt in texts.items():
        sel = _selected_keys(txt)
        xor = 0
        for k in sel:
            xor ^= k
        assert got[i] == (len(sel), xor & ((1 << 63) - 1)), i
        # density: 2/(w+1) expected; allow a generous band
        nkg = len(txt.split()) - (WIN_K - 1)
        assert len(sel) <= nkg and len(sel) >= nkg // (2 * WIN_W)


def test_partition_invariance_and_short_docs(ray_session):
    import ray.data as rd

    texts = {
        0: "a b c d e f g h i j",
        1: "a b c",          # exactly k tokens → 1 k-gram, 1 fp
        2: "a b",            # < k tokens → no row
        3: "x y z w x y z w x y z w",
    }
    one = winnow_fingerprints(rd.from_arrow(_tbl(texts))).to_pandas()
    many = winnow_fingerprints(
        rd.from_arrow(_tbl(texts)).repartition(3)
    ).to_pandas()
    one = one.sort_values("doc_id").reset_index(drop=True)
    many = many.sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)
    assert set(one.doc_id) == {0, 1, 3}
    assert one.set_index("doc_id").loc[1, "n_fps"] == 1


def test_hash_rows_match_selection_and_pairs(ray_session):
    """winnow_hash_rows emits exactly the position-stripped distinct
    selected hashes with full per-doc counts; two docs sharing a long
    run surface as a winnow_pairs candidate with shared >= 2."""
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.winnow import winnow_hash_rows

    shared = " ".join(f"s{i}" for i in range(12))
    texts = {
        0: "alpha beta gamma " + shared + " delta",
        1: "one two three " + shared + " four",
        2: "totally unrelated words here none common",
    }
    rows = winnow_hash_rows(rd.from_arrow(_tbl(texts))).to_pandas()
    for i, txt in texts.items():
        want = {k >> 24 for k in _selected_keys(txt)}
        got = set(rows[rows.doc_id == i].sh)
        assert got == want, i
        assert (rows[rows.doc_id == i].n == len(want)).all(), i
    h0 = set(rows[rows.doc_id == 0].sh)
    h1 = set(rows[rows.doc_id == 1].sh)
    assert len(h0 & h1) >= 2  # the 12-token shared run guarantees it
