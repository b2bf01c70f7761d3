"""Random-access doc fetch (pipelines/docstore.py): id-addressed
lookups against the partitioned store must match the full scan, touch
only the referenced parts, and tolerate unknown ids."""

import glob

import pyarrow.parquet as pq


def test_docstore_lookup_matches_scan(ray_session, tiny_build):
    from goobi_viewer_indexer_ray.pipelines.docstore import DocStore

    store = DocStore(tiny_build)
    full = []
    for p in sorted(glob.glob(tiny_build + "/docs/part=*/data.parquet")):
        t = pq.read_table(p).to_pandas()
        part = int(p.split("part=")[1][:5])
        t["doc_id"] = (part << 36) + t["local_rank"]
        full.append(t)
    import pandas as pd

    scan = pd.concat(full).set_index("doc_id").sort_index()
    some = list(scan.index[:3]) + list(scan.index[-2:])
    got = store.get(some).to_pandas().set_index("doc_id")
    assert sorted(got.index) == sorted(some)
    for d in some:
        assert got.loc[d, "url"] == scan.loc[d, "url"]
        assert got.loc[d, "text"] == scan.loc[d, "text"]
    # unknown ids are silently absent; duplicates collapse
    got2 = store.get([some[0], some[0], 10**15 + 7]).to_pandas()
    assert list(got2.doc_id) == [some[0]]
    # empty request -> empty table with schema
    empty = store.get([])
    assert empty.num_rows == 0 and "doc_id" in empty.column_names


def test_docstore_search_roundtrip(ray_session, tiny_build):
    """Serving flow: query -> ids -> fetch; fetched urls are the
    scored docs' records."""
    from goobi_viewer_indexer_ray.pipelines.docstore import DocStore
    from goobi_viewer_indexer_ray.pipelines.query import LocalIndex, topk_exact

    idx = LocalIndex(tiny_build)
    d, _s = topk_exact(idx, "baba", 5)
    rows = DocStore(tiny_build).get(d.tolist())
    assert rows.num_rows == len(set(d.tolist()))
    assert set(rows.column("doc_id").to_pylist()) == set(int(x) for x in d)


def test_query_frontend_end_to_end(ray_session, tiny_build, tiny_oracle):
    """Facade flow: rank == oracle ranking, every hit carries its
    stored url and a snippet containing a query term (or the doc head
    for score-without-substring cases)."""
    from goobi_viewer_indexer_ray.pipelines.oracle import oracle_topk
    from goobi_viewer_indexer_ray.pipelines.serve import QueryFrontend

    fe = QueryFrontend(tiny_build, n_actors=2)
    out = fe.query("baba", k=5).to_pandas()
    want = oracle_topk(tiny_oracle, "baba", 5)
    assert list(out.doc_id) == [d for d, _ in want]
    assert list(out["rank"]) == list(range(1, len(want) + 1))
    assert (out.url.str.len() > 0).all()
    assert (out.snippet.str.len() > 0).all()
    assert out.snippet.str.lower().str.contains("baba").any()
    # cached second call is identical
    again = fe.query("baba", k=5).to_pandas()
    assert out.equals(again)
