"""Unit pins for stages/sampling (deterministic sampling + quantiles).

Oracle parity is in test_catalog.py (sample_docs / sample_stratified /
token_count_quantiles / grouped_quantiles); these pin the pure
semantics without Ray.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from goobi_viewer_indexer_ray.stages import sampling


def _kept(ids, fraction, salt="s0"):
    thr = sampling.sample_threshold(fraction)
    return {
        i for i in ids
        if hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:8] < thr
    }


def test_threshold_edges():
    assert sampling.sample_threshold(0.0) == "00000000"
    assert sampling.sample_threshold(1.0) == "g"  # above every digest
    assert sampling.sample_threshold(0.5) == "80000000"
    with pytest.raises(ValueError):
        sampling.sample_threshold(1.5)


def test_rate_zero_and_one():
    ids = range(1000)
    assert _kept(ids, 0.0) == set()
    assert _kept(ids, 1.0) == set(ids)


def test_nested_samples_and_rate():
    """Smaller rate is a SUBSET of a larger rate (tunable without
    churn), and the realized rate is near nominal."""
    ids = range(20_000)
    small, big = _kept(ids, 0.05), _kept(ids, 0.2)
    assert small <= big
    assert abs(len(big) / 20_000 - 0.2) < 0.02


def test_salt_decorrelates():
    ids = range(5000)
    a = {i for i in ids if hashlib.md5(f"{i}:a".encode()).hexdigest()[:8]
         < sampling.sample_threshold(0.1)}
    b = {i for i in ids if hashlib.md5(f"{i}:b".encode()).hexdigest()[:8]
         < sampling.sample_threshold(0.1)}
    inter = len(a & b) / max(1, len(a))
    assert 0.0 < inter < 0.35  # ≈ independent 10% samples overlap ~10%


def test_cdf_pick_matches_sorted_definition():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, 10_000)
    uniq, counts = np.unique(vals, return_counts=True)
    srt = np.sort(vals)
    for q in [0.01, 0.25, 0.5, 0.9, 0.999, 1.0]:
        got = sampling._cdf_pick(uniq, counts, [q])[0]
        # min{v : F(v) >= q} over the sorted sample
        cd = np.arange(1, srt.size + 1) / srt.size
        want = srt[int(np.searchsorted(cd, q, side="left"))]
        assert got == want, q


def test_grouped_quantiles_pandas_parity():
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 3000),
            "v": rng.integers(0, 40, 3000),
        }
    )

    class FakeGrouped:
        def __init__(self, frame, keys):
            self.frame, self.keys = frame, keys

        def count(self):
            out = (
                self.frame.groupby(self.keys, as_index=False).size()
                .rename(columns={"size": "count()"})
            )
            outer = self

            class R:
                def to_pandas(self):
                    return out

            return R()

    class FakeDs:
        def __init__(self, frame):
            self.frame = frame

        def groupby(self, keys):
            return FakeGrouped(self.frame, keys)

    t = sampling.grouped_quantiles(
        FakeDs(df), group_col="g", col="v", qs=[0.5, 0.9]
    ).to_pandas()
    for g, sub in df.groupby("g"):
        srt = np.sort(sub["v"].to_numpy())
        cd = np.arange(1, srt.size + 1) / srt.size
        for q in [0.5, 0.9]:
            want = srt[int(np.searchsorted(cd, q, side="left"))]
            got = t[(t["g"] == g) & (t["q"] == q)]["value"].iloc[0]
            assert got == want, (g, q)


def test_temperature_resample_skewed(ray_session):
    """Heavy stratum downsampled toward sqrt share; lightest keeps all;
    T=1 is a no-op."""
    import pyarrow as pa
    import ray.data

    from goobi_viewer_indexer_ray.stages.sampling import temperature_resample

    n_heavy, n_light = 4000, 40
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_heavy + n_light), pa.int64()),
            "src": pa.array(["heavy"] * n_heavy + ["light"] * n_light),
            "n_tokens": pa.array([10] * (n_heavy + n_light), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = temperature_resample(
        ds, key_col="doc_id", strata_col="src", weight_col="n_tokens",
        temperature=2.0,
    ).to_pandas()
    by = out.groupby("src").size()
    assert by.get("light", 0) == n_light  # lightest stratum keeps all
    # heavy rate = sqrt(40/4000) = 0.1 → ~400 kept (md5 is uniform)
    assert 300 < by["heavy"] < 500
    # T=1: rates w_min/w — heavy keeps ~1%... for a no-op check use
    # equal weights instead
    eq = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "src": pa.array(["a"] * 50 + ["b"] * 50),
            "n_tokens": pa.array([7] * 100, pa.int64()),
        }
    )
    kept = temperature_resample(
        ray.data.from_arrow(eq), key_col="doc_id", strata_col="src",
        weight_col="n_tokens", temperature=2.0,
    ).count()
    assert kept == 100  # equal weights → every stratum is the min → keep all


def test_stratified_null_and_nonstring_strata(ray_session):
    """Null strata take the default rate (no crash); int strata match
    stringified fraction keys (review findings)."""
    import pyarrow as pa
    import ray.data

    from goobi_viewer_indexer_ray.stages.sampling import stratified_sample

    tbl = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "grp": pa.array([7] * 100 + [8] * 50 + [None] * 50, pa.int64()),
        }
    )
    out = stratified_sample(
        ray.data.from_arrow(tbl), key_col="doc_id", strata_col="grp",
        fractions={"7": 1.0, "8": 0.0}, default=1.0,
    ).to_pandas()
    by = out.groupby("grp", dropna=False).size()
    assert by.get(7.0, 0) == 100      # rate 1.0 via stringified int key
    assert by.get(8.0, 0) == 0        # rate 0.0
    assert len(out) - 100 == 50       # nulls kept at default 1.0


def test_temperature_resample_zero_weight_stratum(ray_session):
    """An all-empty stratum (weight 0) keeps everything (w == w_min),
    heavier strata get rate 0 — no ZeroDivisionError (review
    finding)."""
    import pyarrow as pa
    import ray.data

    from goobi_viewer_indexer_ray.stages.sampling import temperature_resample

    tbl = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "src": pa.array(["empty"] * 10 + ["full"] * 50),
            "n_tokens": pa.array([0] * 10 + [5] * 50, pa.int64()),
        }
    )
    out = temperature_resample(
        ray.data.from_arrow(tbl), key_col="doc_id", strata_col="src",
        weight_col="n_tokens", temperature=2.0,
    ).to_pandas()
    by = out.groupby("src").size()
    assert by.get("empty", 0) == 10   # w == w_min == 0 → keep all
    assert by.get("full", 0) == 0     # rate (0/250)^0.5 = 0


def test_weighted_bottom_k_partition_invariant(ray_session):
    import ray.data

    from goobi_viewer_indexer_ray.stages.sampling import weighted_bottom_k

    t = pa.table(
        {
            "doc_id": pa.array(range(1000), pa.int64()),
            "w": pa.array([(i % 50) + 1 for i in range(1000)], pa.int64()),
        }
    )
    one = weighted_bottom_k(
        ray.data.from_arrow(t), key_col="doc_id", weight_col="w", k=40
    ).to_pandas()
    many = weighted_bottom_k(
        ray.data.from_arrow(t).repartition(16), key_col="doc_id", weight_col="w", k=40
    ).to_pandas()
    # per-batch truncation never changes the global bottom-k
    assert one.equals(many)
    assert len(one) == 40
    assert one["priority"].is_monotonic_increasing
    # weight bias: the sample's mean weight is well above the population's
    assert one["w"].mean() > 1.3 * t.column("w").to_numpy().mean()


# ---------------------------------------------------------- budget_select


def _scored_tbl(rng, n=120):
    import pyarrow as pa

    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "score_num": pa.array(rng.integers(-300, 300, n).astype(np.int64)),
            "n_tokens": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        }
    )


def _budget_reference(t, budget):
    import pandas as pd

    df = t.to_pandas().sort_values(
        ["score_num", "doc_id"], ascending=[False, True]
    )
    run = df.n_tokens.cumsum()
    kept = dict(zip(df.doc_id, run <= budget))
    return kept


def test_budget_select_exact_cut(ray_session):
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.sampling import budget_select

    rng = np.random.default_rng(5)
    t = _scored_tbl(rng)
    total = int(t.column("n_tokens").to_numpy().sum())
    for budget in [0, total // 3, total - 1, total, total + 10]:
        out = budget_select(
            rd.from_arrow(t).repartition(7), budget=budget
        ).to_pandas()
        ref = _budget_reference(t, budget)
        got = dict(zip(out.doc_id, out.kept))
        assert got == ref, budget
        # spent tokens never exceed the budget
        spent = int(out[out.kept].n_tokens.sum())
        assert spent <= budget or budget >= total


def test_budget_select_partition_invariant(ray_session):
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.sampling import budget_select

    rng = np.random.default_rng(9)
    t = _scored_tbl(rng, n=200)
    b = int(t.column("n_tokens").to_numpy().sum()) // 2
    one = budget_select(rd.from_arrow(t), budget=b).to_pandas()
    many = budget_select(rd.from_arrow(t).repartition(16), budget=b).to_pandas()
    one = one.sort_values("doc_id").reset_index(drop=True)
    many = many.sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)
