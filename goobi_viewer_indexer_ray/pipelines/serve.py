"""Result-list serving facade: query → ranked stored records with
snippets — the viewer's search-results render path as ONE call.

The reference's flow is: viewer queries Solr (`SolrSearchIndex`),
gets ids + stored fields, renders a highlighted fragment per hit.
Here the same three steps compose the engine's own parts:

1. rank — :class:`pipelines.query.SearchService` (warm actor pool,
   optional queryResultCache);
2. fetch — :class:`pipelines.docstore.DocStore` (id-addressed parquet
   reads, one file per touched partition);
3. snippet — first-query-term character window over the STORED text
   (the cheap render-time fragmenter; the positional-index KWIC in
   ``search_ops`` is the index-side sibling for corpus-wide jobs).

Scale shape: per request the work is k fetches + k string scans —
independent of corpus size; the facade holds no per-corpus state
beyond the service actors and the store paths, so a deployment runs
one facade per replica group behind the load balancer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.tokenize import tokenize
from .docstore import DocStore
from .query import SearchService

__all__ = ["QueryFrontend", "snippet_for"]


def snippet_for(text: str, terms: list[str], width: int = 40) -> str:
    """±``width``-char window around the first occurrence of any query
    term (case-insensitive, token-ish boundary by lowercase match);
    falls back to the text head when no term occurs."""
    low = text.lower()
    best = -1
    for t in terms:
        i = low.find(t)
        if i >= 0 and (best < 0 or i < best):
            best = i
    if best < 0:
        return text[: 2 * width]
    s = max(0, best - width)
    e = min(len(text), best + width)
    return ("…" if s > 0 else "") + text[s:e] + ("…" if e < len(text) else "")


class QueryFrontend:
    """One-call search serving: ``query(q, k)`` → ranked records."""

    def __init__(self, out_dir: str, n_actors: int = 2,
                 result_cache_size: int = 256):
        self.service = SearchService(
            out_dir, n_actors=n_actors, result_cache_size=result_cache_size
        )
        self.store = DocStore(out_dir)

    def query(self, q: str, k: int = 10) -> pa.Table:
        """(rank, doc_id, score, url, snippet) for the top-k hits."""
        res = self.service.query_table([{"query_id": 0, "query": q, "k": k}])
        ids = res.column("doc_id").to_numpy().astype(np.int64)
        recs = self.store.get(ids.tolist())
        by_id = {
            int(d): (u, t)
            for d, u, t in zip(
                recs.column("doc_id").to_pylist(),
                recs.column("url").to_pylist(),
                recs.column("text").to_pylist(),
            )
        }
        terms = sorted(set(tokenize(q)))
        urls, snips = [], []
        for d in ids.tolist():
            u, t = by_id[d]  # the index only ranks stored docs
            urls.append(u)
            snips.append(snippet_for(t or "", terms))
        return pa.table(
            {
                "rank": res.column("rank"),
                "doc_id": pa.array(ids, pa.int64()),
                "score": res.column("score"),
                "url": pa.array(urls, pa.string()),
                "snippet": pa.array(snips, pa.string()),
            }
        )
