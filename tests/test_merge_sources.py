"""Multi-source union-merge (D4) — precedence overlay semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from goobi_viewer_indexer_ray.stages.merge_sources import union_merge


def _ds(rows: dict):
    return ray.data.from_arrow(pa.table(rows))


def _merged_df(result) -> pd.DataFrame:
    return result.to_pandas().sort_values("key").reset_index(drop=True)


def test_basic_overlay():
    new = _ds({"key": [1, 2], "title": ["t1-new", None], "author": [None, "a2-new"]})
    old = _ds({"key": [1, 2, 3], "title": ["t1-old", "t2-old", "t3-old"],
               "author": ["a1-old", "a2-old", None]})
    df = _merged_df(union_merge([new, old], key_col="key", merge_cols=["title", "author"]))
    assert df["key"].tolist() == [1, 2, 3]
    # key 1: title from new (rank 0), author falls through to old (rank 1)
    assert df["title"].tolist() == ["t1-new", "t2-old", "t3-old"]
    assert df["title_src"].tolist() == [0, 1, 1]
    assert df["author"].tolist() == ["a1-old", "a2-new", None]
    assert df["author_src"][0] == 1 and df["author_src"][1] == 0
    assert pd.isna(df["author_src"][2])
    assert df["n_records"].tolist() == [2, 2, 1]


def test_three_sources_precedence_chain():
    s0 = _ds({"key": [7], "v": [None]})
    s1 = _ds({"key": [7], "v": [None]})
    s2 = _ds({"key": [7], "v": ["from-s2"]})
    df = _merged_df(union_merge([s0, s1, s2], key_col="key", merge_cols=["v"]))
    assert df["v"].tolist() == ["from-s2"] and df["v_src"].tolist() == [2]


def test_oracle_comparison_random():
    rng = np.random.default_rng(7)
    n_keys, n_src = 400, 3
    srcs, frames = [], []
    for r in range(n_src):
        keys = np.sort(rng.choice(n_keys, size=n_keys // 2 + 50, replace=False))
        vals = [None if rng.random() < 0.4 else f"s{r}k{k}" for k in keys]
        frames.append(pd.DataFrame({"key": keys, "val": vals, "rank": r}))
        srcs.append(_ds({"key": keys.tolist(), "val": vals}))
    allf = pd.concat(frames).sort_values(["key", "rank"], kind="stable")
    exp_val = allf.dropna(subset=["val"]).groupby("key")["val"].first()
    exp_n = allf.groupby("key").size()

    df = _merged_df(union_merge(srcs, key_col="key", merge_cols=["val"]))
    assert df["n_records"].tolist() == exp_n.tolist()
    got = dict(zip(df["key"], df["val"]))
    for k in exp_n.index:
        assert got[k] == exp_val.get(k, None), k


def test_many_batches_edge_keys():
    # force many small blocks so keys straddle batch boundaries
    n = 2000
    keys = np.repeat(np.arange(n // 4), 4)
    vals = [None if i % 3 == 0 else f"v{i}" for i in range(n)]
    src = ray.data.from_arrow(pa.table({"key": keys, "val": vals})).repartition(16)
    df = _merged_df(union_merge([src], key_col="key", merge_cols=["val"]))
    assert len(df) == n // 4
    assert df["n_records"].unique().tolist() == [4]
    # per key, first non-null of its 4 contiguous values
    for k in (0, 1, 123, 499):
        seg = vals[4 * k : 4 * k + 4]
        exp = next((v for v in seg if v is not None), None)
        assert df.loc[df["key"] == k, "val"].iloc[0] == exp


def test_empty_source_list_raises():
    with pytest.raises(ValueError):
        union_merge([], key_col="k", merge_cols=["v"])
