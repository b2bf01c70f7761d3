"""Unit tests for the round-3 operators: GeoJSON/WKT conversion (M13),
multi-format sniffing ingest (S2), and the hierarchical parent roll-up
(J2/A2)."""

import json
import os

import pyarrow as pa
import pytest

from goobi_viewer_indexer_ray.stages.geo import convert_coords, coords_type
from goobi_viewer_indexer_ray.sources.multiformat import sniff_format

# ----------------------------------------------------------------- geo


def test_coords_type_sniffing():
    # GeoJSONTools.getCoordinatesType analog
    assert coords_type("12 34") == "point"
    assert coords_type("0 0 10 0 10 10") == "polygon"
    assert coords_type("0 0 10 0 10 10 0 10") == "polygon"
    assert coords_type("1 2 3") == "unknown"  # odd count
    assert coords_type("1 2 3 4") == "unknown"  # 4 numbers: neither
    assert coords_type("not coordinates") == "unknown"
    assert coords_type("") == "unknown"


def test_convert_point():
    kind, wkt, n, minx, miny, maxx, maxy, flag = convert_coords("12 -34")
    assert (kind, wkt, n, flag) == ("point", "POINT (12 -34)", 1, "true")
    assert (minx, miny, maxx, maxy) == (12.0, -34.0, 12.0, -34.0)


def test_convert_polygon_closes_ring():
    kind, wkt, n, minx, miny, maxx, maxy, flag = convert_coords("0 0 10 0 10 10")
    assert kind == "polygon"
    assert wkt == "POLYGON ((0 0, 10 0, 10 10, 0 0))"
    assert n == 4  # ring closed by the converter
    assert (minx, miny, maxx, maxy) == (0.0, 0.0, 10.0, 10.0)
    # pre-closed ring is not double-closed
    _, wkt2, n2, *_ = convert_coords("0 0 10 0 10 10 0 0")
    assert wkt2 == wkt and n2 == 4


def test_convert_floats_and_unknown():
    _, wkt, *_ = convert_coords("1.5 -2.25")
    assert wkt == "POINT (1.5 -2.25)"
    kind, wkt, n, *_rest, flag = convert_coords("garbage")
    assert (kind, wkt, n, flag) == ("unknown", "", 0, "false")


# --------------------------------------------------------- multiformat


def test_sniff_format_magic():
    assert sniff_format(b"PAR1\x00\x00") == "parquet"
    assert sniff_format(b'{"doc_id"') == "jsonl"
    assert sniff_format(b"<?xml ve") == "xml"
    assert sniff_format(b"  <docs>") == "xml"  # leading whitespace ok
    assert sniff_format(b"\x00\x01junk") == "unknown"
    assert sniff_format(b"plain text") == "unknown"


def test_read_any_roundtrip(ray_session, tmp_path):
    """Mixed dir round-trips every row (content-routed, decoy skipped)."""
    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.sources.multiformat import (
        read_any,
        write_mixed_corpus,
    )

    rows = [
        # \r and \r\n exercise XML end-of-line normalization (escaped
        # as &#13; on write so the round-trip stays byte-exact)
        {"doc_id": i, "text": f"text <&> 'q' {i}\nline2\rcr\r\ncrlf", "lang": "en",
         "source": f"s{i % 2}", "n_chars": 10 + i}
        for i in range(12)
    ]
    src = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = write_mixed_corpus(src, str(tmp_path / "mixed"), files_per_format=2)
    ds, skipped = read_any(out)
    assert len(skipped) == 1 and skipped[0].endswith("decoy.bin")
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 12
    for r in rows:
        g = got[got["doc_id"] == r["doc_id"]].iloc[0]
        assert g["text"] == r["text"], r["doc_id"]  # escaping round-trip
        assert g["fmt"] == {0: "parquet", 1: "jsonl", 2: "xml"}[r["doc_id"] % 3]
        assert g["n_chars"] == r["n_chars"]


# ---------------------------------------------------- access conditions


def test_access_condition_default_and_inherit():
    """M15: records default to OPENACCESS; declared conditions win;
    grouped entities inherit the owner's condition."""
    from goobi_viewer_indexer_ray.functions.fields import (
        ACCESS_FIELD,
        DEFAULT_RULES,
        EntitySpec,
        FieldRule,
        apply_rules,
        apply_rules_with_entities,
    )

    out = apply_rules("<html><title>t</title></html>", DEFAULT_RULES)
    assert out[ACCESS_FIELD] == ["OPENACCESS"]

    restricted = apply_rules(
        '<html><meta name="access" content="RESTRICTED"><title>t</title></html>',
        DEFAULT_RULES,
    )
    assert restricted[ACCESS_FIELD] == ["RESTRICTED"]

    rules = DEFAULT_RULES + [
        FieldRule(name="MD_OPS", selectors=["p"],
                  group_entity=EntitySpec(pattern=r"hash \w+", type_name="OP"))
    ]
    _, ents = apply_rules_with_entities(
        '<html><meta name="access" content="CAMPUS"><body>'
        "<p>hash join here</p></body></html>",
        rules,
    )
    assert ents and all(e[ACCESS_FIELD] == "CAMPUS" for e in ents)

    # multiple owner conditions (via {SPLIT}) all propagate to children
    rules_mv = [
        FieldRule(name=ACCESS_FIELD, selectors=["meta.access"], split_separator=","),
        FieldRule(name="MD_OPS", selectors=["p"],
                  group_entity=EntitySpec(pattern=r"hash \w+", type_name="OP")),
    ]
    _, ents_mv = apply_rules_with_entities(
        '<html><meta name="access" content="CAMPUS,STAFF"><body>'
        "<p>hash join here</p></body></html>",
        rules_mv,
    )
    assert ents_mv and all(e[ACCESS_FIELD] == "CAMPUS; STAFF" for e in ents_mv)


# -------------------------------------------------------------- rollup


def test_parent_rollup_matches_pandas(ray_session):
    """Roll-up over multi-batch input == the single-process reference
    computation (ordered joins stitched across batch boundaries)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.rollup import parent_rollup

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame(
        {
            "p": rng.integers(0, 23, n),
            "k": rng.permutation(n),
            "lab": [f"L{i % 7}" for i in range(n)],
        }
    )
    ds = rd.from_pandas(df).repartition(7)  # force cross-batch parents
    got = (
        parent_rollup(ds, parent_col="p", order_col="k", rollup_col="lab")
        .to_pandas()
        .sort_values("parent")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["p", "k"])
        .groupby("p")
        .agg(
            num_children=("k", "size"),
            first_key=("k", "min"),
            last_key=("k", "max"),
            child_keys=("k", lambda s: ",".join(str(v) for v in s)),
            super_rollup=("lab", " ".join),
        )
        .reset_index()
        .rename(columns={"p": "parent"})
    )
    for col in ["num_children", "first_key", "last_key", "child_keys", "super_rollup"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_chunk_batch_windows():
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.text_ops import chunk_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [
            " ".join(f"w{i}" for i in range(20)),  # 3 windows: 0-15,8-19(12),16-19(4)
            "a b c",                                # 1 truncated window
            "",                                     # no chunks
            None,                                   # no chunks
        ],
    })
    out = chunk_batch(t, chunk=16, stride=8)
    rows = list(zip(out.column("doc_id").to_pylist(),
                    out.column("chunk_idx").to_pylist(),
                    out.column("start_tok").to_pylist(),
                    out.column("n_tok").to_pylist()))
    assert rows == [(1, 0, 0, 16), (1, 1, 8, 12), (1, 2, 16, 4), (2, 0, 0, 3)]
    texts = out.column("chunk_text").to_pylist()
    assert texts[0].startswith("w0 w1 ") and texts[0].endswith(" w15")
    assert texts[2] == "w16 w17 w18 w19"
    assert texts[3] == "a b c"


def test_contamination_zero_hits_and_short_docs(ray_session):
    import pyarrow as pa
    import ray.data

    from goobi_viewer_indexer_ray.stages.text_ops import contamination_hits

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            "one two three four five six",     # benchmark (0 % 2 == 0... use mod 4)
            "one two three four five tail",    # shares shingle "one..five"
            "totally different words here now",# zero hits
            "shrt",                            # shorter than n -> zero shingles
        ],
    })).repartition(2)
    out = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in contamination_hits(ds, bench_mod=4, n=5).take_all()}
    assert out == {1: (1, True), 2: (0, False), 3: (0, False)}


def test_chunk_batch_empty_batch():
    import pyarrow as pa

    from goobi_viewer_indexer_ray.stages.text_ops import chunk_batch

    out = chunk_batch(pa.table({"doc_id": pa.array([], pa.int64()),
                                "text": pa.array([], pa.string())}))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "chunk_idx", "start_tok", "n_tok",
                                "chunk_text"]


def test_dup_ngram_stats_semantics(ray_session):
    """Cross-doc duplicate n-grams: docs sharing an 8-gram count it in
    n_shared; unique docs and short docs report zeros."""
    import pyarrow as pa
    import ray.data

    from goobi_viewer_indexer_ray.stages.text_ops import dup_ngram_stats

    shared = "one two three four five six seven eight"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    shared + " alpha beta",      # grams 1-3 incl. shared
                    shared + " gamma delta",     # shares the first gram
                    "totally different words here that repeat nothing at all",
                    "short",                     # < 8 tokens → 0 grams
                ],
                pa.string(),
            ),
        }
    )
    out = (
        dup_ngram_stats(ray.data.from_arrow(docs), n=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # docs 1/2 share exactly the 8-gram "one ... eight"
    assert out.loc[1, "n_shared"] == 1 and out.loc[2, "n_shared"] == 1
    assert out.loc[1, "n_grams"] == 3 and out.loc[2, "n_grams"] == 3
    assert out.loc[3, "n_shared"] == 0 and out.loc[3, "n_grams"] == 2
    assert out.loc[4, "n_grams"] == 0 and out.loc[4, "n_shared"] == 0


def test_pack_assign_semantics(ray_session):
    """Sequence packing: global token offsets in doc_id order, packs
    cut every `budget` tokens, docs straddling boundaries span packs."""
    import pyarrow as pa
    import ray.data

    from goobi_viewer_indexer_ray.stages.text_ops import pack_assign

    docs = pa.table(
        {
            "doc_id": pa.array([10, 20, 30, 40], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f",       # 6 tokens → offset 0, pack 0
                    "",                  # 0 tokens → offset 6, pack 0
                    "g h i j k",         # 5 tokens → offset 6..10, packs 0-1
                    "l m",               # offset 11, pack 1
                ],
                pa.string(),
            ),
        }
    )
    out = (
        pack_assign(ray.data.from_arrow(docs), budget=8, bucket_size=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.tok_offset) == [0, 6, 6, 11]
    assert list(out.pack_first) == [0, 0, 0, 1]
    assert list(out.pack_last) == [0, 0, 1, 1]  # doc 30 straddles 0→1


def test_geo_radius_topk_brute_and_partition_invariance(ray_session):
    """geo_radius_topk == the O(n·q) brute force, and the answer is
    identical at 1 block and 16 blocks (partial top-k + count-marker
    fold is partition-invariant)."""
    import numpy as np
    import ray

    from goobi_viewer_indexer_ray.stages.geo import geo_radius_topk

    rng = np.random.default_rng(7)
    n = 500
    ids = np.arange(n, dtype=np.int64) * 3 + 1  # sparse, non-contiguous
    xs = rng.integers(-180, 180, n).astype(np.int64)
    ys = rng.integers(-90, 90, n).astype(np.int64)
    queries = [(0, 0, 0, 30), (1, -170, -80, 50), (2, 400, 400, 5)]
    k = 7

    # brute force
    want = []
    for qid, cx, cy, r in queries:
        d2 = (xs - cx) ** 2 + (ys - cy) ** 2
        hit = d2 <= r * r
        rows = sorted(zip(d2[hit].tolist(), ids[hit].tolist()))
        for rank, (dist2, doc) in enumerate(rows[:k], 1):
            want.append((qid, rank, doc, dist2, int(hit.sum())))

    tbl = pa.table({"doc_id": ids, "x": xs, "y": ys})
    outs = []
    for blocks in (1, 16):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = geo_radius_topk(ds, queries, k=k).to_pandas()
        outs.append([tuple(r) for r in out.itertuples(index=False)])
    assert outs[0] == outs[1] == want


def test_warc_roundtrip_framing_and_decoy(ray_session, tmp_path):
    """WARC parsing is Content-Length-FRAMED: payloads containing
    \\r\\n\\r\\n (the record separator) round-trip byte-exactly; the
    non-WARC decoy is sniffed out; a truncated tail raises in strict
    mode and degrades to skip-remainder with strict=False."""
    from goobi_viewer_indexer_ray.sources.warc import (
        _record_bytes,
        parse_warc_bytes,
        read_warc_dir,
    )

    nasty = "a\r\n\r\nWARC/1.0\r\nb"  # separator + magic INSIDE a payload
    recs = (
        _record_bytes("https://x/1", 1, "2024-01-05T00:00:00Z", "en",
                      nasty.encode())
        + _record_bytes("https://x/2", 2, "2024-01-06T00:00:00Z", "de",
                        b"plain")
    )
    (tmp_path / "a.warc").write_bytes(recs)
    (tmp_path / "decoy.txt").write_bytes(b"not a warc")
    out = read_warc_dir(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert list(out.doc_id) == [1, 2]
    assert out.loc[0, "text"] == nasty
    assert out.loc[1, "lang"] == "de"
    assert out.loc[0, "warc_date"] == "2024-01-05T00:00:00Z"

    truncated = recs[:-10]
    with pytest.raises(ValueError):
        parse_warc_bytes(truncated)
    lenient = parse_warc_bytes(truncated, strict=False)
    assert lenient["doc_id"] == [1]  # first record intact, tail skipped
    assert parse_warc_bytes(b"GIF89a whatever") is None


# ------------------------------------------------------ gopher rules


def test_gopher_rule_boundaries():
    """Every Gopher rule pinned at its exact threshold (Rae et al.
    2021 App. A1.1, integer cross-multiplied form)."""
    from goobi_viewer_indexer_ray.stages.text_ops import gopher_quality_batch

    w50 = " ".join(["word"] * 48) + " the of"          # 50 words, 2 stop
    docs = {
        0: w50,                                         # keep
        1: " ".join(["word"] * 47) + " the of",         # 49 words → r_count=0
        2: " ".join(["ab"] * 48) + " the of",           # mean len < 3
        3: w50 + " " + "... " * 5,                      # 55 words? recount below
        4: " ".join(["word"] * 38 + ["12"] * 10) + " the of",  # alpha 40/50
        5: " ".join(["word"] * 37 + ["12"] * 11) + " the of",  # alpha < 0.8
        6: " ".join(["word"] * 48) + " the the",        # 1 distinct stop
    }
    # doc 3: symbol boundary — '...' is NOT a token, so words stay 50;
    # 5 ellipsis runs → 10·5 = 50 ≤ 50 passes; build a failing twin
    docs[7] = w50 + " " + "... " * 6                    # 6 runs → fail
    t = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
        }
    )
    out = gopher_quality_batch(t).to_pydict()
    by = {d: {k: out[k][i] for k in out} for i, d in enumerate(out["doc_id"])}
    assert by[0]["keep"] == 1
    assert by[1]["r_count"] == 0 and by[1]["n_words"] == 49
    assert by[2]["r_wordlen"] == 0          # 48*2+3+2 = 101 < 150
    assert by[3]["r_sym"] == 1 and by[3]["n_sym"] == 5 and by[3]["keep"] == 1
    assert by[7]["r_sym"] == 0 and by[7]["n_sym"] == 6
    assert by[4]["r_alpha"] == 1 and by[4]["n_alpha_words"] == 40
    assert by[5]["r_alpha"] == 0
    assert by[6]["r_stop"] == 0 and by[6]["n_stop_distinct"] == 1
    # '…' and '#' count as symbols too
    t2 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "text": pa.array(["a # b … c"], pa.string())})
    assert gopher_quality_batch(t2).to_pydict()["n_sym"][0] == 2


def test_boilerplate_blocks_semantics(ray_session):
    """RefinedWeb line-dedup analog: a block shared by two docs is
    removed from both; a within-doc repeat alone is NOT boilerplate;
    the tail runt is its own unit; checksums pin kept identity."""
    import ray.data

    from goobi_viewer_indexer_ray.stages.text_ops import boilerplate_blocks

    shared = " ".join(f"s{i}" for i in range(10))        # one full block
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    rep = " ".join(f"r{i}" for i in range(10))
    rows = [
        {"doc_id": 0, "text": shared + " " + uniq_a + " tail runt"},
        {"doc_id": 1, "text": shared + " " + uniq_b},
        {"doc_id": 2, "text": rep + " " + rep},          # self-repeat only
    ]
    out = {r["doc_id"]: r for r in
           boilerplate_blocks(ray.data.from_items(rows)).take_all()}
    assert out[0]["n_blocks"] == 3 and out[0]["n_boiler_blocks"] == 1
    assert out[0]["n_tokens"] == 22 and out[0]["n_tokens_removed"] == 10
    assert out[1]["n_boiler_blocks"] == 1 and out[1]["n_tokens_removed"] == 10
    # self-repeat: both occurrences survive (df counts DISTINCT docs)
    assert out[2]["n_boiler_blocks"] == 0 and out[2]["n_tokens_removed"] == 0
    assert out[2]["n_blocks"] == 2
    # kept checksum: doc 2 keeps both copies → 2 × one block hash
    assert out[2]["kept_checksum"] % 2 == 0


def test_warc_gzip_member_framing():
    """Common Crawl invariant: one gzip member per record.  A stream
    with all records in ONE member must fail strict parsing; the
    per-member stream round-trips; trailing garbage is rejected."""
    import gzip

    import pytest

    from goobi_viewer_indexer_ray.sources.warc import (
        _record_bytes,
        gunzip_members,
        parse_warc_bytes,
    )

    recs = [_record_bytes(f"https://h/{i}", i, "2024-01-01T00:00:00Z",
                          "en", f"payload {i}".encode()) for i in range(3)]
    per_member = b"".join(gzip.compress(r, mtime=0) for r in recs)
    cols = parse_warc_bytes(per_member, strict=True)
    assert cols["doc_id"] == [0, 1, 2]
    assert cols["text"] == ["payload 0", "payload 1", "payload 2"]

    one_member = gzip.compress(b"".join(recs), mtime=0)
    with pytest.raises(ValueError, match="member"):
        parse_warc_bytes(one_member, strict=True)

    with pytest.raises(ValueError, match="trailing"):
        gunzip_members(per_member + b"junk")
    # gzipped NON-warc decoy: decompresses fine, sniffed out as None
    assert parse_warc_bytes(gzip.compress(b"not warc"), strict=True) is None


def test_snapshot_diff_semantics(ray_session):
    """snapshot_diff classifies by presence + hash inequality: a url in
    both snapshots with identical hashes is unchanged even when other
    urls around it change; absent sides surface h=0."""
    import ray

    from goobi_viewer_indexer_ray.stages.recrawl import snapshot_diff

    a_rows = [
        {"url": "u/keep", "doc_id": 1, "h": 11},
        {"url": "u/gone", "doc_id": 2, "h": 22},
        {"url": "u/edit", "doc_id": 3, "h": 33},
    ]
    b_rows = [
        {"url": "u/keep", "doc_id": 1, "h": 11},
        {"url": "u/edit", "doc_id": 3, "h": 34},
        {"url": "u/new", "doc_id": 4, "h": 44},
    ]
    out = snapshot_diff(
        ray.data.from_items(a_rows), ray.data.from_items(b_rows)
    ).to_pandas().set_index("url")
    assert out.loc["u/keep", "status"] == "unchanged"
    assert out.loc["u/gone", "status"] == "removed"
    assert out.loc["u/edit", "status"] == "changed"
    assert out.loc["u/new", "status"] == "added"
    assert out.loc["u/gone", "h_b"] == 0 and out.loc["u/new", "h_a"] == 0
    assert int(out.loc["u/edit", "h_a"]) == 33 and int(out.loc["u/edit", "h_b"]) == 34


def test_norm_quantize_semantics():
    """SmallFloat-style norm byte: exact below 32, 4-bit mantissa above;
    monotone code; decode is the floor of the quantization cell."""
    import numpy as np

    from goobi_viewer_indexer_ray.stages.text_ops import norm_quantize_batch

    dls = np.array([0, 1, 31, 32, 33, 63, 64, 100, 1023, 1024, 2**20 + 7])
    t = pa.table({"doc_id": pa.array(range(len(dls)), pa.int64()),
                  "n_tokens": pa.array(dls, pa.int64())})
    out = norm_quantize_batch(t)
    code = out.column("norm_code").to_numpy()
    lossy = out.column("dl_lossy").to_numpy()
    # exact region
    assert list(code[:3]) == [0, 1, 31] and list(lossy[:3]) == [0, 1, 31]
    # dl=32: bitlen 6, e=1, code = 16+16 = 32, decode 32 (exact power of two)
    assert code[3] == 32 and lossy[3] == 32
    # dl=33 rounds DOWN into the same cell
    assert code[4] == 32 and lossy[4] == 32
    # dl=63: 63>>1 = 31 -> code 47, decode 62
    assert code[5] == 47 and lossy[5] == 62
    # monotone in dl, decode never exceeds dl, relative error < 1/16
    assert (np.diff(code) >= 0).all()
    assert (lossy <= dls).all()
    big = dls >= 32
    assert ((dls[big] - lossy[big]) * 16 < dls[big]).all()


def test_lexical_diversity_semantics():
    """TTR/hapax: 'a a b' -> 3 tokens, 2 types, 1 hapax, ttr 6666bp;
    empty doc -> all zeros; all-distinct doc -> ttr 10000."""
    from goobi_viewer_indexer_ray.stages.text_ops import lexical_diversity_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["A a b", "", "one two three"], pa.string()),
    })
    out = lexical_diversity_batch(t).to_pydict()
    assert out["n_tokens"] == [3, 0, 3]
    assert out["n_types"] == [2, 0, 3]
    assert out["n_hapax"] == [1, 0, 3]
    assert out["ttr_bp"] == [6666, 0, 10000]


def test_readability_semantics():
    """FK basis: hand-counted words/sentences/vowel-run syllables and
    the exact integer numerator/denominator; zero-sentence and empty
    docs get fk_den 0 / fk_num 0."""
    from goobi_viewer_indexer_ray.stages.text_ops import readability_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(
            ["The cat sat. It purred!", "no punctuation here", ""],
            pa.string(),
        ),
    })
    out = readability_batch(t).to_pydict()
    # doc 1: words the/cat/sat/it/purred -> 5; sentences '.'+'!' -> 2;
    # syllables: e,a,a,i,u+e -> 1+1+1+1+2 = 6
    assert out["n_words"] == [5, 3, 0]
    assert out["n_sent"] == [2, 0, 0]
    assert out["n_syll"] == [6, 6, 0]  # no/punctuation/here: o + u,ua,io + e,e
    w, s, y = 5, 2, 6
    assert out["fk_num"][0] == 39 * w * w + 1180 * y * s - 1559 * w * s
    assert out["fk_den"] == [10, 0, 0]
    assert out["fk_num"][1:] == [0, 0]
    # '2024' is a word with no vowel runs -> clamped to 1 syllable
    t2 = pa.table({"doc_id": pa.array([9], pa.int64()),
                   "text": pa.array(["2024."], pa.string())})
    o2 = readability_batch(t2).to_pydict()
    assert o2["n_words"] == [1] and o2["n_syll"] == [1] and o2["n_sent"] == [1]


def test_char_entropy_semantics():
    """Entropy: uniform 2-symbol stream -> exactly 1 bit; single
    repeated char -> 0; empty/non-alnum docs -> zeros; punctuation and
    case are excluded/folded."""
    import math

    from goobi_viewer_indexer_ray.stages.text_ops import char_entropy_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["abab", "aaaa", "?! ..", "AbC"], pa.string()),
    })
    out = char_entropy_batch(t).to_pydict()
    assert out["n_chars"] == [4, 4, 0, 3]
    assert out["n_distinct"] == [2, 1, 0, 3]
    assert out["entropy_bits"][0] == 1.0
    assert out["entropy_bits"][1] == 0.0
    assert out["entropy_bits"][2] == 0.0
    assert out["entropy_bits"][3] == round(math.log2(3), 4)


def test_events_cusum_semantics(ray_session):
    """CUSUM recurrence: the vectorized cumsum-minus-running-min form
    equals the sequential max(0, S+n-drift) walk; a planted sustained
    shift trips the 8·drift alarm while baseline noise does not."""
    import numpy as np

    from goobi_viewer_indexer_ray.pipelines.catalog import q_events_cusum

    # 48 baseline hours at 10/hour, then 24 shifted hours at 20/hour
    # (drift = (480+480)//72 = 13; S_end = 24*(20-13) = 168 >= 8*13 =
    #  104 alarms; baseline 10-13 < 0 never accumulates)
    rows = []
    eid = 0
    for h in range(72):
        n = 10 if h < 48 else 20
        for i in range(n):
            rows.append({
                "event_type": "click",
                "ts": np.datetime64(h * 3600 * 10**6 + i, "us"),
            })
            eid += 1
    t = pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
    })
    import os
    import tempfile

    import pyarrow.parquet as pq
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = (
        q_events_cusum(d).to_pandas().sort_values("hour_id").reset_index(drop=True)
    )
    n = out.n.to_numpy()
    drift = int(n.sum()) // n.size  # 11
    # sequential reference walk
    s, ref = 0, []
    for x in n:
        s = max(0, s + int(x) - drift)
        ref.append(s)
    assert out.cusum.tolist() == ref
    assert not out.flagged[:48].any()      # baseline never alarms
    assert out.flagged.iloc[-1]            # sustained shift does
    assert (out.cusum >= 0).all()


def test_source_cap_semantics(ray_session):
    """Per-source cap: a 120-doc source keeps exactly its 50 lowest
    doc_ids with group_size 120 in-band; an under-cap source survives
    whole."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.pipelines.catalog import q_source_cap

    doc_id = list(range(120)) + list(range(1000, 1007))
    source = ["big"] * 120 + ["small"] * 7
    t = pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "source": pa.array(source, pa.string()),
        "text": pa.array(["x"] * 127, pa.string()),
    })
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = q_source_cap(d).to_pandas()
    big = out[out.source == "big"].sort_values("rank")
    small = out[out.source == "small"]
    assert len(big) == 50 and big.doc_id.tolist() == list(range(50))
    assert (big.group_size == 120).all()
    assert len(small) == 7 and (small.group_size == 7).all()


def test_tfidf_cosine_semantics(ray_session):
    """lnc.ltc cosine: a doc that is EXACTLY the query's live terms
    (tf=1 each) scores 1.0; a doc with the same match plus extra terms
    scores < 1 (the full-document norm at work — the part matched-only
    norms get wrong)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.pipelines.catalog import q_tfidf_topk

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(
            ["hash join",
             "hash join kitchen sink verbiage",
             "unrelated filler words entirely"],
            pa.string(),
        ),
    })
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = q_tfidf_topk(d).to_pandas()
    q0 = out[out.query_id == 0].sort_values("rank")
    assert q0.doc_id.tolist()[:2] == [1, 2]
    assert q0.score_r.iloc[0] == 1.0
    assert q0.score_r.iloc[1] < 1.0


def test_oov_rate_semantics(ray_session):
    """OOV against the top-16 cf vocab: a doc made entirely of rare
    singletons scores 10000 bp, a doc of head terms 0; empty doc 0."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.pipelines.catalog import q_oov_rate

    # 16 head terms (cf >= 3 each), plus singleton junk in doc 99
    head = " ".join(f"t{i:02d}" for i in range(16))
    rows = [{"doc_id": i, "text": head} for i in range(3)]
    rows.append({"doc_id": 99, "text": "zzq1 zzq2 zzq3 zzq4"})
    rows.append({"doc_id": 100, "text": ""})
    t = pa.Table.from_pylist(rows)
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = q_oov_rate(d).to_pandas().set_index("doc_id")
    assert out.loc[0, "oov_bp"] == 0 and out.loc[0, "n_oov"] == 0
    assert out.loc[99, "oov_bp"] == 10000 and out.loc[99, "n_oov"] == 4
    assert out.loc[100, "n_tokens"] == 0 and out.loc[100, "oov_bp"] == 0


def test_bigram_pmi_semantics(ray_session):
    """PMI ranks the exclusive collocation above the promiscuous one:
    'alpha beta' always adjacent beats 'the the' filler, with the
    integer-scaled score exact."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.pipelines.catalog import q_bigram_pmi

    rows = [{"doc_id": i, "text": "alpha beta " + "the " * 10} for i in range(5)]
    t = pa.Table.from_pylist(rows)
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = q_bigram_pmi(d).to_pandas()
    pairs = list(zip(out.w1, out.w2))
    assert ("alpha", "beta") in pairs and ("the", "the") in pairs
    ab = out[(out.w1 == "alpha") & (out.w2 == "beta")].iloc[0]
    tt = out[(out.w1 == "the") & (out.w2 == "the")].iloc[0]
    assert ab.pmi_scaled > tt.pmi_scaled
    # exact integer replay: n_bg = 5 docs * 11 bigrams
    n_bg = 5 * 11
    assert ab.pmi_scaled == 1_000_000 * n_bg * int(ab.n) // (int(ab.c1) * int(ab.c2))


def test_nextword_kernel_doc_boundaries():
    """A head word at a document's END must not pair with the next
    doc's first token; per-(doc, head, next) partial rows carry exact
    within-doc pair counts."""
    from goobi_viewer_indexer_ray.stages.text_ops import nextword_counts_batch

    t = pa.Table.from_pylist(
        [
            {"doc_id": 1, "text": "hash join hash"},
            {"doc_id": 2, "text": "sort hash"},
            {"doc_id": 3, "text": ""},
        ]
    )
    out = nextword_counts_batch(t, ["hash", "sort"]).to_pandas()
    rows = {(r.head, r.nxt, r.doc_id): r.n for r in out.itertuples()}
    # doc 1: 'hash join' once; trailing 'hash' pairs with NOTHING
    assert rows == {("hash", "join", 1): 1, ("sort", "hash", 2): 1}


def test_docid_rank_dense_permutation(ray_session):
    """docid_rank is a dense 0..n-1 permutation ordered by
    (lang, source, doc_id) — validated against a local sort."""
    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.remap import docid_rank

    rows = [
        {"doc_id": i, "lang": ["de", "en"][i % 2], "source": f"s{i % 3}"}
        for i in range(40)
    ]
    got = docid_rank(rd.from_items(rows)).to_pandas()
    want = sorted(rows, key=lambda r: (r["lang"], r["source"], r["doc_id"]))
    expect = {r["doc_id"]: i for i, r in enumerate(want)}
    assert dict(zip(got.doc_id, got.new_id)) == expect
    assert sorted(got.new_id) == list(range(40))


def test_index_prune_boundary_classes(ray_session):
    """cf_kept takes the boundary tf class exactly: with df=5 and tfs
    [5,3,3,1,1], k=1 keeps only tf=5."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from goobi_viewer_indexer_ray.pipelines.catalog import q_index_prune

    rows = [
        {"doc_id": 0, "text": "w w w w w"},
        {"doc_id": 1, "text": "w w w"},
        {"doc_id": 2, "text": "w w w"},
        {"doc_id": 3, "text": "w"},
        {"doc_id": 4, "text": "w"},
    ]
    t = pa.Table.from_pylist(rows)
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = q_index_prune(d).to_pandas()
    r = out[out.term == "w"].iloc[0]
    assert (r.df, r.kept, r.cf_kept) == (5, 1, 5)


# ------------------------------------------------------- suffix array

def test_suffix_array_matches_bruteforce():
    """SA infix == Python `in` substring scan on a mixed vocab,
    including unicode, repeats-inside-term, and absent patterns."""
    import numpy as np

    from goobi_viewer_indexer_ray.functions.suffix import TermSuffixArray

    vocab = ["banana", "bandana", "ana", "café", "fée", "zzz",
             "merge", "merger", "emerge", "a", "", "aa"]
    sa = TermSuffixArray(vocab)
    for pat in ["an", "ana", "na", "é", "merge", "zz", "q", "a", "aa",
                "banana", "bananas"]:
        want = np.array([i for i, t in enumerate(vocab) if pat in t],
                        np.int64)
        got = sa.infix(pat)
        assert np.array_equal(got, want), (pat, got, want)
    # empty pattern matches every term (LIKE '%%')
    assert sa.infix("").size == len(vocab)


def test_intersect_pairs_nonempty():
    from goobi_viewer_indexer_ray.pipelines.catalog import INTERSECT_PAIRS

    assert len(INTERSECT_PAIRS) >= 8
    assert all(a < b for a, b in INTERSECT_PAIRS)


def test_host_ratelimit_bucket_semantics(ray_session):
    """Planted replay: burst drains the bucket, refill restores at
    1 token / 2 s, clamp at capacity."""
    import pyarrow as pa
    import ray.data as rd

    from goobi_viewer_indexer_ray.pipelines.catalog import (
        RL_CAP_U, RL_COST_U, q_host_ratelimit)

    # 7 events at t=0 (burst: 5 allowed, 2 denied), one at +4 s
    # (2 tokens refilled -> allowed), one at +10 min (clamped refill
    # -> allowed)
    base = 1_700_000_000_000_000
    ts = [base] * 7 + [base + 4_000_000, base + 600_000_000]
    t = pa.table({
        "event_id": pa.array(list(range(9)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * 9, pa.int64()),
    })
    import tempfile, os
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = q_host_ratelimit(d).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert int(row["n_events"]) == 9
    assert int(row["n_allowed"]) == 7  # 5 burst + refill + clamped refill
    # last event drains from a full bucket
    assert int(row["tokens_end"]) == RL_CAP_U - RL_COST_U
