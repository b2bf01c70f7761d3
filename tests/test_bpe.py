"""BPE tokenizer training: hand-computed merges, exhaustion, and
partition invariance (the int64-sum contract)."""

import pyarrow as pa
import pytest


def _docs(ray_session, texts, blocks=1):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    return ds.repartition(blocks) if blocks > 1 else ds


def test_bpe_known_merges(ray_session):
    """Corpus: 'ab'×3 + 'abc'×1.  Every round hand-checked, including
    the (lft asc) tie in round 3 and early exhaustion (4 merges
    possible, 6 requested)."""
    from goobi_viewer_indexer_ray.stages.bpe import bpe_train

    out = bpe_train(
        _docs(ray_session, ["ab ab ab", "abc"]), n_merges=6
    ).to_pydict()
    assert out["rank"] == [1, 2, 3, 4]
    assert list(zip(out["lft"], out["rgt"])) == [
        ("a", "b"), ("ab", "§"), ("ab", "c"), ("abc", "§")
    ]
    assert out["pair_count"] == [4, 3, 1, 1]
    assert out["merged"] == ["ab", "ab§", "abc", "abc§"]
    assert out["n_words"] == [2, 1, 1, 1]


def test_bpe_partition_invariant(ray_session):
    """1 block vs 6 blocks: identical merge table (all statistics are
    int64 sums; the argmax tie rule is total)."""
    from goobi_viewer_indexer_ray.stages.bpe import bpe_train

    texts = [
        "low low low lower lowest",
        "new newer newest newest",
        "wide wider widest low new",
        "er er er est est",
    ] * 3
    a = bpe_train(_docs(ray_session, texts, blocks=1), n_merges=5)
    b = bpe_train(_docs(ray_session, texts, blocks=6), n_merges=5)
    assert a.equals(b)
    assert a.num_rows == 5


def test_bpe_single_symbol_words(ray_session):
    """Fully-merged single-symbol sequences stop contributing pairs
    without erroring (the s[1:0] empty-slice path)."""
    from goobi_viewer_indexer_ray.stages.bpe import bpe_train

    out = bpe_train(_docs(ray_session, ["a a a"]), n_merges=3).to_pydict()
    # 'a §' → merge ('a','§',3) → vocab is the single symbol 'a§'
    assert out["rank"] == [1]
    assert (out["lft"][0], out["rgt"][0], out["pair_count"][0]) == ("a", "§", 3)


def test_bpe_encode_hand_checked(ray_session):
    """Encode with the hand-known merges of the 'ab ab ab / abc'
    corpus: after [(a,b),(ab,§),(ab,c),(abc,§)] the word 'ab' encodes
    to 1 symbol ('ab§') and 'abc' to 1 ('abc§'); with only the first
    merge, 'ab' → 'ab §' (2) and 'abc' → 'ab c §' (3)."""
    from goobi_viewer_indexer_ray.stages.bpe import bpe_encode

    docs = _docs(ray_session, ["ab ab ab", "abc"])
    full = bpe_encode(
        docs, [("a", "b"), ("ab", "§"), ("ab", "c"), ("abc", "§")]
    ).to_pandas().set_index("doc_id").sort_index()
    assert list(full.n_words) == [3, 1]
    assert list(full.n_bpe) == [3, 1]

    one = bpe_encode(docs, [("a", "b")]).to_pandas().set_index(
        "doc_id").sort_index()
    assert list(one.n_bpe) == [6, 3]

    none = bpe_encode(docs, []).to_pandas().set_index(
        "doc_id").sort_index()
    # raw char symbols + end marker: 'ab'→3, 'abc'→4
    assert list(none.n_bpe) == [9, 4]


def test_bpe_encode_drops_empty_and_partition_invariant(ray_session):
    from goobi_viewer_indexer_ray.stages.bpe import bpe_encode, bpe_train

    texts = ["low low lower", "", "newest newer", "low new est"] * 4
    docs1 = _docs(ray_session, texts)
    docs6 = _docs(ray_session, texts, blocks=6)
    m = bpe_train(docs1, n_merges=5).to_pydict()
    merges = list(zip(m["lft"], m["rgt"]))
    a = bpe_encode(docs1, merges).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    b = bpe_encode(docs6, merges).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert a.equals(b)
    # empty docs (ids 1, 5, 9, 13) are dropped
    assert set(a.doc_id) == set(range(len(texts))) - {1, 5, 9, 13}


def test_local_and_distributed_rounds_identical(ray_session):
    """Round-5: the driver-local merge-round fast path must be
    bit-identical to the distributed groupby rounds (same merges, same
    counts, same tie-breaks), and the returned vocab's n_bpe must match
    what encode's merge replay derives."""
    import ray.data

    from goobi_viewer_indexer_ray.stages.bpe import bpe_encode, bpe_train

    rows = [
        {"doc_id": i,
         "text": f"banana bandana {'spam ' * (i % 4)}band banal {i}"}
        for i in range(60)
    ]
    docs = lambda: ray.data.from_items(rows).repartition(4)  # noqa: E731
    local = bpe_train(docs(), n_merges=6)  # vocab tiny → local path
    dist = bpe_train(docs(), n_merges=6, local_threshold=0)  # forced dist
    assert local.equals(dist)

    merges_t, vocab = bpe_train(docs(), n_merges=6, return_vocab=True)
    assert merges_t.equals(local)
    merges = list(zip(merges_t.column("lft").to_pylist(),
                      merges_t.column("rgt").to_pylist()))
    via_vocab = bpe_encode(docs(), merges, vocab=vocab).to_pandas()
    via_replay = bpe_encode(docs(), merges).to_pandas()
    key = ["doc_id"]
    assert via_vocab.sort_values(key).reset_index(drop=True).equals(
        via_replay.sort_values(key).reset_index(drop=True))
    # OOV fallback: encode a corpus with words the vocab never saw
    other = ray.data.from_items(
        [{"doc_id": 900, "text": "zzzunseen banana wordsz"}])
    a = bpe_encode(other, merges, vocab=vocab).to_pandas()
    b = bpe_encode(other, merges).to_pandas()
    assert a.equals(b)
