"""Structured (non-scored) query operators over the compressed index.

The reference delegates every structured lookup to Solr/Lucene via
``SolrSearchIndex.search(query, fields)`` (SolrSearchIndex.java:175,
189-205) and issues conjunctive / negated field queries throughout the
pipeline — e.g. ``ISANCHOR:true`` anchor sweeps and ``PI_PARENT:<pi>``
child checks (SolrSearchIndex.java:636-672), delete-by-query strings
(Hotfolder.java), and the viewer's facet/prefix/spellcheck requests
against the fields this indexer writes.  These operators are the
engine-native transposition of that query surface onto our own
compressed postings (pipelines/query.py), replacing the Solr
round-trip exactly like the BM25 scorer replaces Lucene ranking:

- :func:`boolean_docs` — Lucene ``BooleanQuery`` semantics over
  posting lists: MUST = vectorized sorted-array intersection, SHOULD =
  union, MUST_NOT = set difference (``np.intersect1d`` /
  ``np.union1d`` / ``np.setdiff1d`` on the decoded doc arrays; no
  per-doc Python).
- :func:`prefix_stats` — ``PrefixQuery`` analog: vocab range scan on
  the sorted term dictionary (``np.searchsorted`` on the prefix and
  its successor — O(log V) to locate, O(matches) to aggregate).
- :func:`fuzzy_terms` — ``FuzzyQuery(maxEdits=1)`` analog with a
  CLOSED-FORM edit-distance-≤1 test (equal | one substitution | one
  indel), fully vectorized over the length-bucketed vocab — no DP
  matrix, no per-candidate Python loop.
- :func:`facet_counts` — Solr facet analog: matched doc-id set from
  the index, broadcast once (``ray.put``) into a distributed
  ``pc.is_in`` semi-join over the metadata table, then a small
  ``groupby().count()``.  The corpus is never materialized; only the
  matched-id array (bounded by the query's df) leaves the driver.
- :func:`phrase_docs` — ``PhraseQuery`` (exact adjacency) without a
  positional index: index-pruned AND candidates + a distributed
  vectorized adjacency verify over candidate docs only.

Scale notes: boolean/prefix set algebra runs on the serving node per
shard exactly like BM25 (document-partitioned replicas each intersect
their own doc range; the driver concatenates disjoint ranges — no
merge cost).  Facet counting is filter-then-facet: the only
non-streaming object is the matched-id broadcast, the standard
small-side pattern everywhere else in this repo.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.tokenize import tokenize

__all__ = ["boolean_docs", "prefix_stats", "fuzzy_terms", "facet_counts",
           "gap_phrase_docs",
           "phrase_docs", "phrase_docs_positional", "proximity_docs",
           "kwic_snippets", "parse_structured", "StructuredSearchEngine",
           "structured_search", "wildcard_regex", "wildcard_terms",
           "term_cooccurrence", "spellcheck_terms", "stats_over",
           "collapse_top1", "range_facets", "more_like_this"]


# ------------------------------------------------------------- boolean

def _term_docs(index, term: str) -> np.ndarray:
    ref = index.lookup(term)
    if ref is None:
        return np.empty(0, np.int64)
    return ref.decode_all()[0]


def boolean_docs(index, *, must: list[str] | None = None,
                 should: list[str] | None = None,
                 must_not: list[str] | None = None) -> np.ndarray:
    """Sorted doc-id array matching a Lucene-style boolean query.

    Semantics (BooleanQuery): with MUST clauses, SHOULD clauses are
    optional (they only affect scoring, which this operator does not
    do); with no MUST, at least one SHOULD must match.  MUST_NOT
    removes.  Terms are tokenized with the index's own analyzer so
    ``must=["Hash-Join"]`` behaves like the indexed text did.
    """
    def toks(qs):
        out = []
        for q in qs or ():
            out.extend(tokenize(q))
        return sorted(set(out))

    m, s, n = toks(must), toks(should), toks(must_not)
    if m:
        # rarest term first: every later intersection is bounded by the
        # smallest df, and an absent term short-circuits immediately
        posts = sorted((_term_docs(index, t) for t in m), key=lambda d: d.size)
        docs: np.ndarray | None = None
        for d in posts:
            docs = d if docs is None else np.intersect1d(docs, d, assume_unique=True)
            if docs.size == 0:
                break
    elif s:
        docs = np.empty(0, np.int64)
    else:
        return np.empty(0, np.int64)
    if s and not m:
        parts = [_term_docs(index, t) for t in s]
        docs = np.unique(np.concatenate(parts)) if parts else docs
    for t in n:
        if docs.size == 0:
            break
        docs = np.setdiff1d(docs, _term_docs(index, t), assume_unique=True)
    return docs


# -------------------------------------------------------------- prefix

def _vocab_arrays(index):
    """(terms sorted unicode-ascending, df, cf) across shards, cached.

    The per-shard dictionaries are already sorted; this merges them
    once per LocalIndex (vocab is the small side of any index: ~1e6
    terms for 1e9 docs) and memoizes on the index object.
    """
    cached = getattr(index, "_vocab_cache", None)
    if cached is not None:
        return cached
    terms = np.array(sorted(index._lookup), dtype=object)
    df = np.fromiter((index._lookup[t].df for t in terms), np.int64, len(terms))
    cf = np.fromiter((index._lookup[t].cf for t in terms), np.int64, len(terms))
    index._vocab_cache = (terms, df, cf)
    return index._vocab_cache


def prefix_stats(index, prefix: str) -> dict:
    """PrefixQuery aggregate: vocab terms starting with ``prefix``.

    Returns ``n_terms`` (matching vocab size), ``df_sum`` (sum of
    per-term df — posting entries touched), ``cf_sum`` (total token
    occurrences) and ``n_docs`` (DISTINCT docs containing any matching
    term — the union of the matched posting lists).
    """
    terms, df, cf = _vocab_arrays(index)
    lo = int(np.searchsorted(terms, prefix, side="left"))
    hi = int(np.searchsorted(terms, prefix + chr(0x10FFFF), side="left"))
    sel = terms[lo:hi]
    if sel.size == 0:
        return {"n_terms": 0, "df_sum": 0, "cf_sum": 0, "n_docs": 0}
    parts = [_term_docs(index, t) for t in sel]
    n_docs = int(np.unique(np.concatenate(parts)).size)
    return {
        "n_terms": int(sel.size),
        "df_sum": int(df[lo:hi].sum()),
        "cf_sum": int(cf[lo:hi].sum()),
        "n_docs": n_docs,
    }


def wildcard_regex(pattern: str) -> str:
    """``*``/``?`` wildcard → anchored regex (shared by the engine and
    the SQL oracle so the two can never diverge)."""
    import re as _re

    return (
        "^"
        + "".join(
            ".*" if c == "*" else "." if c == "?" else _re.escape(c)
            for c in pattern
        )
        + "$"
    )


def wildcard_terms(index, pattern: str) -> list[tuple[str, int]]:
    """Lucene ``WildcardQuery`` analog: vocab terms matching a
    ``*``/``?`` pattern, with df.  A leading literal narrows the scan
    to its ``searchsorted`` dictionary range first (the
    :func:`prefix_stats` path — exactly Lucene's automaton seek);
    only the surviving range takes the compiled-regex test.  The
    vocab is the index's small side (≈10⁶ terms for 10⁹ docs)."""
    import re as _re

    rx = _re.compile(wildcard_regex(pattern))
    terms, df, _ = _vocab_arrays(index)
    lead = pattern.split("*", 1)[0].split("?", 1)[0]
    if lead:
        lo = int(np.searchsorted(terms, lead, side="left"))
        hi = int(np.searchsorted(terms, lead + chr(0x10FFFF), side="left"))
        terms, df = terms[lo:hi], df[lo:hi]
    return [(str(t), int(d)) for t, d in zip(terms, df) if rx.match(t)]


def term_cooccurrence(index, terms: list[str]) -> list[tuple[str, str, int, int, int]]:
    """Document co-occurrence counts for every pair of ``terms`` —
    ``(a, b, df_a, df_b, cooc)`` with ``cooc = |docs_a ∩ docs_b|``,
    pure posting-list algebra (consumers derive PMI/NPMI from the
    integer counts; integers keep the oracle comparison exact)."""
    toks = sorted({t for q in terms for t in tokenize(q)})
    posts = {t: _term_docs(index, t) for t in toks}
    out = []
    for i, a in enumerate(toks):
        for b in toks[i + 1 :]:
            inter = np.intersect1d(posts[a], posts[b], assume_unique=True)
            out.append((a, b, int(posts[a].size), int(posts[b].size), int(inter.size)))
    return out


# --------------------------------------------------------------- fuzzy

def _chars_matrix(terms: np.ndarray, width: int) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, zero-padded (vocab terms are
    short; one matrix per (query, length-bucket) is tiny)."""
    out = np.zeros((len(terms), width), np.uint32)
    for i, t in enumerate(terms):  # driver-side over ≤ vocab-bucket, not corpus
        out[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)
    return out


def _one_indel_ok(longer_m: np.ndarray, shorter_m: np.ndarray, ll: int) -> np.ndarray:
    """Row-wise: does deleting ONE char from ``longer_m[i]`` (length
    ``ll``) yield ``shorter_m[i]`` (length ``ll-1``)?  Closed form:
    with p = first mismatch position, require
    ``longer[p+1:] == shorter[p:]`` — both comparisons fully
    vectorized (the suffix test via a reversed running-OR so each row
    reads its own p without a Python loop)."""
    pre_mism = longer_m[:, :ll] != shorter_m[:, :ll]  # shorter padded at col ll-1
    p = np.where(pre_mism.any(axis=1), pre_mism.argmax(axis=1), ll - 1)
    # suf_mism[:, j] = longer[j+1] != shorter[j]; row ok iff no mismatch at j >= p
    suf_mism = longer_m[:, 1:ll] != shorter_m[:, : ll - 1]
    bad_from = np.flip(np.logical_or.accumulate(np.flip(suf_mism, 1), 1), 1)
    bad_from = np.pad(bad_from, ((0, 0), (0, 1)))  # p == ll-1 → empty suffix, ok
    return ~bad_from[np.arange(len(p)), p]


def fuzzy_terms(index, query: str, *, max_edits: int = 1) -> list[tuple[str, int]]:
    """Vocab terms within Levenshtein distance ``max_edits`` (=1) of
    ``query``, with df — Lucene ``FuzzyQuery`` / Solr spellcheck analog.

    Distance ≤ 1 has a closed form — strings are within one edit iff
    they are equal, OR same length with exactly one substitution, OR
    lengths differ by one and deleting one char from the longer yields
    the shorter — so the whole test vectorizes over a codepoint
    matrix; no DP matrix, no per-candidate Python in the compare.
    """
    if max_edits != 1:
        raise NotImplementedError("closed-form path implements max_edits=1")
    nq = len(query)
    terms, df, _ = _vocab_arrays(index)
    lens = np.fromiter((len(t) for t in terms), np.int64, len(terms))
    keep = np.abs(lens - nq) <= 1
    cand, clens = terms[keep], lens[keep]
    if cand.size == 0:
        return []
    width = nq + 2
    m = _chars_matrix(cand, width)
    qv = np.zeros(width, np.uint32)
    qv[:nq] = np.frombuffer(query.encode("utf-32-le"), np.uint32)

    out_mask = np.zeros(cand.size, bool)
    same = clens == nq
    if same.any():  # equal or one substitution (padded tails compare equal)
        out_mask[same] = (m[same] != qv).sum(axis=1) <= 1
    longer = clens == nq + 1
    if longer.any():
        qm = np.broadcast_to(qv, (int(longer.sum()), width))
        out_mask[longer] = _one_indel_ok(m[longer], qm, nq + 1)
    shorter = clens == nq - 1
    if shorter.any() and nq >= 1:
        qm = np.broadcast_to(qv, (int(shorter.sum()), width))
        out_mask[shorter] = _one_indel_ok(qm, m[shorter], nq)
    sel_idx = np.flatnonzero(keep)[out_mask]
    return sorted((str(terms[i]), int(df[i])) for i in sel_idx)


# ----------------------------------------------------------- synonyms

def expand_terms(tokens: list[str], groups: list[tuple[str, ...]]) -> list[str]:
    """Query-time synonym expansion — the SynonymGraphFilter analog.

    The reference delegates synonym handling to the Solr schema's
    query analyzer chain exactly as it delegates tokenization (SURVEY
    M5; the indexer ships raw strings, ``SolrSearchIndex.java`` issues
    the queries).  This transposes the *query-side* half: every query
    token expands to the union of its synonym groups (original always
    kept), the expanded set dedups, and each expanded term scores with
    weight 1 under BM25 — Solr's ``expand=true`` OR semantics.

    Groups are config (the ``synonyms.txt`` analog) and ride to
    workers as a broadcast closure like every other rule table (ST2).
    Returns the sorted, deduplicated expanded term list.
    """
    out: set[str] = set()
    for t in tokens:
        out.add(t)
        for g in groups:
            if t in g:
                out.update(g)
    return sorted(out)


# --------------------------------------------------------- spellcheck

def spellcheck_terms(index, query: str, *, max_edits: int = 2,
                     top_n: int = 5) -> list[tuple[str, int, int]]:
    """Solr SpellCheckComponent analog: the ``top_n`` vocab terms
    within Levenshtein distance ``max_edits`` of ``query``, ranked by
    ``(distance asc, df desc, term asc)`` — the collation order Solr's
    spellchecker uses (closest, then most frequent).

    Returns ``[(term, distance, df), ...]``.  Distance is CODEPOINT
    Levenshtein (Lucene semantics); note DuckDB's ``levenshtein()`` is
    byte-based — the SQL oracle is equivalent only because both sides'
    tokenizers restrict the compared vocab to ASCII (``[a-z0-9]+`` in
    the oracle's ``_TOKS``), where bytes == codepoints.  A non-ASCII
    vocab would need a codepoint oracle.  The distance is a full
    DP Levenshtein VECTORIZED ACROSS CANDIDATES: the vocab is first
    length-banded (``|len(t) - len(q)| <= max_edits``), the survivors
    become one codepoint matrix, and the DP runs its
    ``len(q) x max_len`` cell loop with every candidate advanced per
    cell in one numpy op — per-cell cost O(candidates), no per-string
    Python.  The vocab is the index's small side, so this is a
    serving-node scan exactly like :func:`fuzzy_terms` (which stays
    the fast path for ``max_edits=1``).
    """
    nq = len(query)
    terms, df, _ = _vocab_arrays(index)
    lens = np.fromiter((len(t) for t in terms), np.int64, len(terms))
    keep = np.abs(lens - nq) <= max_edits
    cand, clens, cdf = terms[keep], lens[keep], df[keep]
    if cand.size == 0:
        return []
    lmax = int(clens.max())
    m = _chars_matrix(cand, lmax)
    qv = np.frombuffer(query.encode("utf-32-le"), np.uint32)

    n = cand.size
    prev = np.broadcast_to(
        np.arange(lmax + 1, dtype=np.int64), (n, lmax + 1)
    ).copy()
    cur = np.empty_like(prev)
    for i in range(1, nq + 1):
        cur[:, 0] = i
        neq = m != qv[i - 1]  # (n, lmax) bool
        for j in range(1, lmax + 1):
            np.minimum(prev[:, j - 1] + neq[:, j - 1], prev[:, j] + 1,
                       out=cur[:, j])
            np.minimum(cur[:, j], cur[:, j - 1] + 1, out=cur[:, j])
        prev, cur = cur, prev
    dist = prev[np.arange(n), clens]
    ok = dist <= max_edits
    ranked = sorted(
        zip(cand[ok], dist[ok], cdf[ok]),
        key=lambda r: (int(r[1]), -int(r[2]), str(r[0])),
    )[:top_n]
    return [(str(t), int(d), int(f)) for t, d, f in ranked]


# ---------------------------------------- stats / collapse / range facet
# The three remaining Solr result-grouping surfaces the viewer calls on
# the fields this indexer writes: StatsComponent (stats.field=...),
# field collapsing (group=true / collapse qparser), and range facets
# (facet.range=...).  All three are filter-then-aggregate: the matched
# doc-id array (bounded by the query's df) is the ONLY driver-side
# object; the metadata Dataset streams through a broadcast `pc.is_in`
# semi-join exactly like facet_counts.

def _matched_stream(index, ds, must, must_not):
    """Semi-join ``ds`` to the docs matching a boolean query; returns
    (matched Dataset | None-if-empty, n_matched)."""
    import pyarrow.compute as pc

    import ray

    docs = boolean_docs(index, must=must, must_not=must_not)
    if docs.size == 0:
        return None, 0
    ids_ref = ray.put(pa.array(docs, pa.int64()))

    def semi(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("doc_id"), value_set=ray.get(ids_ref)))

    return ds.map_batches(semi, batch_format="pyarrow"), int(docs.size)


def stats_over(index, ds, *, must: list[str], value_col: str,
               must_not: list[str] | None = None) -> dict:
    """Solr StatsComponent analog over one numeric field: count / sum /
    min / max / mean of ``value_col`` across the docs matching a
    boolean query.  Per-batch integer partials (one tiny row per
    batch) stream back; the driver folds them — count/sum/min/max stay
    exact int64, mean is the one float (derived last).
    """
    matched, _ = _matched_stream(index, ds, must, must_not)
    if matched is None:
        return {"n_docs": 0, "sum_v": 0, "min_v": None, "max_v": None,
                "mean_v": None}

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy()
        return pa.table(
            {
                "n": pa.array([v.size], pa.int64()),
                "s": pa.array([int(v.sum()) if v.size else 0], pa.int64()),
                "mn": pa.array([int(v.min()) if v.size else None], pa.int64()),
                "mx": pa.array([int(v.max()) if v.size else None], pa.int64()),
            }
        )

    parts = matched.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    if n == 0:
        return {"n_docs": 0, "sum_v": 0, "min_v": None, "max_v": None,
                "mean_v": None}
    s = sum(p["s"] for p in parts)
    mn = min(p["mn"] for p in parts if p["mn"] is not None)
    mx = max(p["mx"] for p in parts if p["mx"] is not None)
    return {"n_docs": int(n), "sum_v": int(s), "min_v": int(mn),
            "max_v": int(mx), "mean_v": s / n}


def collapse_top1(index, ds, *, must: list[str], group_col: str,
                  must_not: list[str] | None = None):
    """Solr field-collapse analog (``group=true`` / the collapse
    qparser): matched docs grouped by ``group_col``, keeping the
    group's representative (min doc_id — Lucene's first-in-segment
    head for unscored collapse) plus the collapsed group size.
    Returns a Dataset of ``(group_col, head_doc, n_in_group)``.
    """
    from ray.data.aggregate import Count, Min

    matched, _ = _matched_stream(index, ds, must, must_not)
    if matched is None:
        import ray.data

        sch = ds.schema()
        gtype = dict(zip(sch.names, sch.types))[group_col]
        return ray.data.from_arrow(pa.table(
            {group_col: pa.array([], gtype),
             "head_doc": pa.array([], pa.int64()),
             "n_in_group": pa.array([], pa.int64())}
        ))
    return matched.groupby(group_col).aggregate(
        Min("doc_id", alias_name="head_doc"),
        Count(alias_name="n_in_group"),
    )


def range_facets(index, ds, *, must: list[str], value_col: str,
                 bucket_width: int,
                 must_not: list[str] | None = None):
    """Solr ``facet.range`` analog: matched docs counted into
    fixed-width buckets of ``value_col`` (``bucket_lo = floor(v / w) *
    w``).  Bucketing is one integer floordiv inside the semi-join
    batch; the shuffle carries only (bucket, count) partials.
    Returns a Dataset of ``(bucket_lo, n_docs)``.
    """
    from ray.data.aggregate import Count

    matched, _ = _matched_stream(index, ds, must, must_not)
    if matched is None:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"bucket_lo": pa.array([], pa.int64()),
             "n_docs": pa.array([], pa.int64())}
        ))

    def bucketize(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy()
        lo = (v // bucket_width) * bucket_width
        return pa.table({"bucket_lo": pa.array(lo.astype(np.int64))})

    return (
        matched.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket_lo")
        .aggregate(Count(alias_name="n_docs"))
    )


# ------------------------------------------------------- more-like-this

def more_like_this(index, ds, *, seed_doc: int, top_terms: int = 5,
                   min_overlap: int = 2) -> pa.Table:
    """Solr MoreLikeThis analog: read the seed doc's term vector, pick
    its ``top_terms`` "interesting" terms, then rank every other doc
    by how many of those terms it contains.

    Interesting-term selection is deterministic and integer-exact —
    ``(tf desc, df asc, term asc)`` — i.e. MLT's tf·idf ordering with
    idf's monotone-in-1/df core kept in integer form so the SQL oracle
    can reproduce the ranking bit-for-bit (no float idf ties).

    The seed's term vector comes from one semi-join row read of the
    corpus (Solr reads the stored document the same way); scoring is
    pure posting algebra: concatenate the interesting terms' posting
    lists and count multiplicity per doc (``np.unique``) — overlap ≥
    ``min_overlap`` docs survive.  Returns ``(doc_id, overlap)``.
    """
    import pyarrow.compute as pc

    seed_batches = list(
        ds.map_batches(
            lambda t: t.filter(pc.equal(t.column("doc_id"), seed_doc)),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    )
    if not seed_batches or sum(b.num_rows for b in seed_batches) == 0:
        raise KeyError(f"seed doc {seed_doc} not found")
    seed_tab = pa.concat_tables(seed_batches)
    toks = tokenize(seed_tab.column("text")[0].as_py() or "")
    if not toks:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "overlap": pa.array([], pa.int64())})
    uniq, tf = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    df = np.fromiter(
        ((r.df if (r := index.lookup(str(t))) else 0) for t in uniq),
        np.int64, uniq.size,
    )
    order = sorted(range(uniq.size),
                   key=lambda i: (-int(tf[i]), int(df[i]), str(uniq[i])))
    interesting = [str(uniq[i]) for i in order[:top_terms]]
    posts = [_term_docs(index, t) for t in interesting]
    posts = [p for p in posts if p.size]
    if not posts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "overlap": pa.array([], pa.int64())})
    docs, overlap = np.unique(np.concatenate(posts), return_counts=True)
    keep = (docs != seed_doc) & (overlap >= min_overlap)
    return pa.table({"doc_id": pa.array(docs[keep], pa.int64()),
                     "overlap": pa.array(overlap[keep].astype(np.int64))})


# -------------------------------------------------------------- phrase

def phrase_docs(index, ds, phrases: list[str]):
    """PhraseQuery (exact adjacency): per phrase, matching docs with
    occurrence counts — Lucene positional semantics WITHOUT a
    positional index.

    Two stages (match + verify, the candidate-restricted pattern used
    by every dedup verify in this repo):

    1. the index prunes: candidates = boolean AND over the phrase's
       terms (already the *intersection*, so the broadcast set is
       bounded by the rarest term's df, not the corpus);
    2. a distributed ``map_batches`` verify re-tokenizes ONLY candidate
       docs and tests adjacency fully vectorized — factorize the
       batch's flat token stream once, then one shifted integer
       compare per phrase position (``codes[i+j] == c_j`` ∧ same doc),
       count hits per doc with ``bincount``.  No per-token Python.

    Returns an Arrow table ``(query_id, doc_id, n_matches)``,
    ``n_matches ≥ 1``, sorted.  A doc lives in exactly one batch so
    per-batch counts are final — no post-aggregation shuffle.
    """
    import pyarrow.compute as pc

    import ray

    import unicodedata

    from ..functions.tokenize import TOKEN_RE  # same analyzer as the index

    terms_per: list[list[str]] = [tokenize(p) for p in phrases]
    cand_union: list[np.ndarray] = []
    for terms in terms_per:
        if terms:
            cand_union.append(boolean_docs(index, must=[" ".join(terms)]))
    if not cand_union:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "n_matches": pa.array([], pa.int64()),
            }
        )
    needed = ray.put(pa.array(np.unique(np.concatenate(cand_union)), pa.int64()))
    phrases_ref = ray.put(terms_per)

    def verify(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids_all = ray.get(needed)
        sub = t.filter(pc.is_in(t.column("doc_id"), value_set=ids_all))
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "n_matches": pa.array([], pa.int64()),
            }
        )
        if sub.num_rows == 0:
            return empty
        doc_ids = sub.column("doc_id").to_numpy()
        texts = sub.column("text").to_pylist()
        findall = TOKEN_RE.findall
        norm = unicodedata.normalize
        flat: list[str] = []
        counts = np.empty(len(texts), np.int64)
        for i, x in enumerate(texts):
            toks = findall(norm("NFC", x).lower()) if x else []
            counts[i] = len(toks)
            flat.extend(toks)
        if not flat:
            return empty
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=True)
        row = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        out_q, out_d, out_n = [], [], []
        for qid, terms in enumerate(ray.get(phrases_ref)):
            if not terms:
                continue
            tcodes = np.searchsorted(uniq, terms)
            if (tcodes >= len(uniq)).any() or (uniq[np.minimum(tcodes, len(uniq) - 1)] != terms).any():
                continue  # a phrase term absent from this batch
            k = len(terms)
            n = codes.size - k + 1
            if n <= 0:
                continue
            mask = codes[:n] == tcodes[0]
            for j in range(1, k):
                mask &= codes[j : j + n] == tcodes[j]
            mask &= row[:n] == row[k - 1 : k - 1 + n]  # no doc straddle
            if not mask.any():
                continue
            hit_rows = row[:n][mask]
            per_doc = np.bincount(hit_rows, minlength=len(texts))
            nz = np.flatnonzero(per_doc)
            out_q.append(np.full(nz.size, qid, np.int64))
            out_d.append(doc_ids[nz])
            out_n.append(per_doc[nz].astype(np.int64))
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "n_matches": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    out = ds.map_batches(verify, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _rank_union(doc_arrays):
    """Composite ``doc << 32 | pos`` keys would silently wrap for
    doc_ids >= 2**32 — and the engine's strided id scheme
    (``part * 2**36 + rank``) exceeds that from partition 1 on.  So the
    positional kernels never pack the raw id: they pack the doc's RANK
    in the per-query posting union (``searchsorted``), which is dense
    and bounded by the union size.  Returns the sorted union; a rank
    >= 2**32 would need >4 B distinct matching docs in ONE query on
    one serving node, which the per-node shard size rules out — fail
    loud if it ever happens."""
    union = np.unique(np.concatenate(doc_arrays))
    if union.size >= 1 << 32:
        raise OverflowError("positional rank packing requires < 2**32 "
                            "distinct docs per query per node")
    return union


def phrase_docs_positional(index, phrases: list[str]):
    """PhraseQuery over a POSITIONAL index — no text re-scan.

    The scale path of :func:`phrase_docs`: with positions stored in
    the index (``build_text_index(with_positions=True)``, Lucene-style
    positions payload), phrase matching is pure posting-list algebra —
    for phrase term j, build composite keys ``doc·2³² + (pos − j)``
    and chain ``np.intersect1d``; surviving keys ARE the phrase
    occurrences (doc = key >> 32, count per doc = matches).  Runs on
    the serving node per shard exactly like BM25 scoring; never
    touches the corpus text.

    Returns ``(query_id, doc_id, n_matches)`` (Arrow), identical to
    :func:`phrase_docs` output (pinned in tests).
    """
    SHIFT = np.uint64(32)
    out_q, out_d, out_n = [], [], []
    for qid, phrase in enumerate(phrases):
        terms = tokenize(phrase)
        if not terms:
            continue
        per_term = []
        for t in terms:
            ref = index.lookup(t)
            if ref is None:
                per_term = None
                break
            docs, tfs, pos, offs = ref.positions_all()
            per_term.append((docs, tfs, pos))
        if per_term is None:
            continue
        union = _rank_union([d for d, _, _ in per_term])
        keys: np.ndarray | None = None
        for j, (docs, tfs, pos) in enumerate(per_term):
            rank = np.searchsorted(union, docs).astype(np.uint64)
            occ_doc = np.repeat(rank, tfs)
            adj = pos - j
            ok = adj >= 0  # a phrase occurrence has term j at position ≥ j
            k = (occ_doc[ok] << SHIFT) | adj[ok].astype(np.uint64)
            keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
            if keys.size == 0:
                break
        if keys is None or keys.size == 0:
            continue
        hit_docs = union[(keys >> SHIFT).astype(np.int64)]
        uniq, cnt = np.unique(hit_docs, return_counts=True)
        out_q.append(np.full(uniq.size, qid, np.int64))
        out_d.append(uniq)
        out_n.append(cnt.astype(np.int64))
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "n_matches": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            "n_matches": pa.array(np.concatenate(out_n), pa.int64()),
        }
    )


def proximity_docs(index, pairs: list[tuple[str, str, int]]):
    """Ordered proximity (Lucene ``SpanNearQuery(inOrder=true)``
    analog): for each ``(a, b, window)``, docs where ``b`` occurs
    AFTER ``a`` within ``window`` tokens, with the exact count of
    (occurrence-of-a, occurrence-of-b) pairs.

    Positional-index algebra only: with composite keys
    ``doc·2³² + pos``, the matches at gap d are
    ``intersect1d(keys_a + d, keys_b)`` — ``window`` intersections of
    sorted unique arrays, no corpus access.  Window is expected to be
    a small constant (Lucene slop are single digits), so the loop is
    O(window · postings).

    Returns ``(query_id, doc_id, n_matches)``, sorted.
    """
    SHIFT = np.uint64(32)
    out_q, out_d, out_n = [], [], []
    for qid, (a, b, window) in enumerate(pairs):
        ta, tb = (tokenize(a) or [""])[0], (tokenize(b) or [""])[0]
        ra, rb = index.lookup(ta), index.lookup(tb)
        if ra is None or rb is None or window < 1:
            continue
        docs_a, tfs_a, pos_a, _ = ra.positions_all()
        docs_b, tfs_b, pos_b, _ = rb.positions_all()
        union = _rank_union([docs_a, docs_b])
        rank_a = np.searchsorted(union, docs_a).astype(np.uint64)
        rank_b = np.searchsorted(union, docs_b).astype(np.uint64)
        keys_a = (np.repeat(rank_a, tfs_a) << SHIFT) | pos_a.astype(np.uint64)
        keys_b = (np.repeat(rank_b, tfs_b) << SHIFT) | pos_b.astype(np.uint64)
        hit_docs = []
        for d in range(1, window + 1):
            m = np.intersect1d(keys_a + np.uint64(d), keys_b, assume_unique=True)
            if m.size:
                hit_docs.append(union[(m >> SHIFT).astype(np.int64)])
        if not hit_docs:
            continue
        alld = np.concatenate(hit_docs)
        uniq, cnt = np.unique(alld, return_counts=True)
        out_q.append(np.full(uniq.size, qid, np.int64))
        out_d.append(uniq)
        out_n.append(cnt.astype(np.int64))
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "n_matches": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            "n_matches": pa.array(np.concatenate(out_n), pa.int64()),
        }
    )


def passage_topk(index, queries: list[tuple[int, str]], *,
                 width: int = 16, k: int = 15):
    """Best-passage retrieval: for each query, over every doc holding
    at least one query term, the ``width``-token window with the most
    query-term occurrences (earliest window on ties), top-``k`` docs
    by (n_hits desc, doc_id asc).

    The RAG passage-selection / viewer best-snippet operator: the
    viewer asks Solr for the best highlight fragment per hit
    (reference `SolrSearchIndex` highlighting over the fields this
    indexer writes); at pipeline scale the same shape picks the
    passage to feed a retrieval-augmented prompt.

    Positional-index algebra only — never touches corpus text:
    occurrences of the query-term union become sorted composite keys
    ``rank·2³² + pos`` (rank = doc's index in the matched-doc union,
    so arbitrary 64-bit doc_ids never overflow the key); window
    counts for ALL occurrences are ONE two-pointer pass
    ``searchsorted(keys, keys + width) − arange`` (a key from the
    next doc is ≥ 2³² away, so windows can't leak across docs);
    per-doc best is ``maximum.reduceat`` over doc runs with a
    ``minimum.reduceat`` over masked positions for the earliest-tie
    rule.  Work is df-bounded (query-term postings only), exactly
    like phrase/proximity — runs per shard on the serving node.

    Returns ``(query_id, doc_id, best_start, n_hits, rank)``, int64.
    """
    SHIFT = np.uint64(32)
    out = {c: [] for c in ("query_id", "doc_id", "best_start", "n_hits", "rank")}
    for qid, query in queries:
        terms = sorted(set(tokenize(query)))
        occ = []
        for t in terms:
            ref = index.lookup(t)
            if ref is None:
                continue
            docs, tfs, pos, _ = ref.positions_all()
            occ.append((docs, tfs, pos))
        if not occ:
            continue
        union = _rank_union([d for d, _, _ in occ])
        keys_parts = []
        for docs, tfs, pos in occ:
            rank = np.searchsorted(union, docs).astype(np.uint64)
            keys_parts.append((np.repeat(rank, tfs) << SHIFT) | pos.astype(np.uint64))
        keys = np.sort(np.concatenate(keys_parts))
        hits = (
            np.searchsorted(keys, keys + np.uint64(width)) - np.arange(keys.size)
        ).astype(np.int64)
        doc_rank = (keys >> SHIFT).astype(np.int64)
        pos0 = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
        starts = np.flatnonzero(np.diff(doc_rank, prepend=doc_rank[0] - 1))
        best = np.maximum.reduceat(hits, starts)
        masked_pos = np.where(hits == np.repeat(best, np.diff(starts, append=keys.size)),
                              pos0, np.int64(1) << 60)
        best_pos = np.minimum.reduceat(masked_pos, starts)
        doc_ids = union[doc_rank[starts]]
        order = np.lexsort((doc_ids, -best))[:k]
        n = order.size
        out["query_id"].append(np.full(n, qid, np.int64))
        out["doc_id"].append(doc_ids[order])
        out["best_start"].append(best_pos[order])
        out["n_hits"].append(best[order])
        out["rank"].append(np.arange(1, n + 1, dtype=np.int64))
    if not out["query_id"]:
        return pa.table({c: pa.array([], pa.int64()) for c in out})
    return pa.table(
        {c: pa.array(np.concatenate(v), pa.int64()) for c, v in out.items()}
    )


def grouped_topn(index, ds, queries: list[tuple[int, str]], *,
                 group_col: str, n: int = 2):
    """Scored result grouping — Solr ``group=true&group.field=X&
    group.limit=n&sort=score desc`` (the generalization of
    :func:`collapse_top1` from 1 head to n scored heads per group):
    per (query, group), the top-``n`` matched docs by
    (round(BM25, 4) desc, doc_id) plus the exact group size.

    Scale shape: BM25 scoring stays df-bounded on the serving node;
    the per-query (doc, score) arrays broadcast ONCE via ``ray.put``;
    one streamed pass over ``ds`` (doc_id + group column only) does
    the semi-join per batch and emits ONLY ≤ n candidate rows per
    (query, group) per batch plus one count partial per (query,
    group) per batch — the final fold sees O(batches · groups · n)
    rows, never the matched set.

    Returns an Arrow table ``(query_id, group, doc_id, score_r,
    rank_in_group, n_in_group)`` sorted by (query_id, group, rank).
    """
    import ray

    per_q = {}
    for qid, query in queries:
        d, s = _score_query(index, query)
        per_q[qid] = (d, np.round(s, 4))
    ref = ray.put(per_q)
    n_keep = n

    def part(t: pa.Table) -> pa.Table:
        pq = ray.get(ref)
        docs = t.column("doc_id").to_numpy()
        groups = t.column(group_col).to_pandas().to_numpy()
        out = {"query_id": [], "group": [], "doc_id": [], "score_r": [],
               "cnt": []}
        for qid, (md, ms) in pq.items():
            pos = np.searchsorted(md, docs)
            pos_c = np.minimum(pos, md.size - 1) if md.size else pos
            hit = (md.size > 0) & (md[pos_c] == docs) if md.size else \
                np.zeros(docs.size, bool)
            if not hit.any():
                continue
            g_h, d_h, s_h = groups[hit], docs[hit], ms[pos_c[hit]]
            # per-group: count partial + top-n candidates (lexsort by
            # group, -score, doc; take first n of each group run)
            order = np.lexsort((d_h, -s_h, g_h))
            g_s, d_s, s_s = g_h[order], d_h[order], s_h[order]
            starts = np.flatnonzero(g_s[1:] != g_s[:-1]) + 1
            starts = np.concatenate(([0], starts))
            sizes = np.diff(starts, append=g_s.size)
            within = np.arange(g_s.size) - np.repeat(starts, sizes)
            keep = within < n_keep
            out["query_id"].extend([qid] * int(keep.sum()))
            out["group"].extend(g_s[keep].tolist())
            out["doc_id"].extend(d_s[keep].tolist())
            out["score_r"].extend(s_s[keep].tolist())
            out["cnt"].extend([0] * int(keep.sum()))
            # count partials (doc_id = -1 marker rows)
            heads = g_s[starts]
            out["query_id"].extend([qid] * heads.size)
            out["group"].extend(heads.tolist())
            out["doc_id"].extend([-1] * heads.size)
            out["score_r"].extend([0.0] * heads.size)
            out["cnt"].extend(sizes.tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "group": pa.array(out["group"], pa.string()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "score_r": pa.array(out["score_r"], pa.float64()),
                "cnt": pa.array(out["cnt"], pa.int64()),
            }
        )

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    cols = {c: [] for c in ("query_id", "group", "doc_id", "score_r",
                            "rank_in_group", "n_in_group")}
    if len(parts):
        counts = (
            parts[parts.doc_id < 0]
            .groupby(["query_id", "group"])["cnt"].sum()
        )
        cand = parts[parts.doc_id >= 0]
        for (qid, grp), g in cand.groupby(["query_id", "group"]):
            g = g.sort_values(["score_r", "doc_id"],
                              ascending=[False, True]).head(n_keep)
            for r, row in enumerate(g.itertuples(), 1):
                cols["query_id"].append(qid)
                cols["group"].append(grp)
                cols["doc_id"].append(int(row.doc_id))
                cols["score_r"].append(float(row.score_r))
                cols["rank_in_group"].append(r)
                cols["n_in_group"].append(int(counts.loc[(qid, grp)]))
    tbl = pa.table(
        {
            "query_id": pa.array(cols["query_id"], pa.int64()),
            "group": pa.array(cols["group"], pa.string()),
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "score_r": pa.array(cols["score_r"], pa.float64()),
            "rank_in_group": pa.array(cols["rank_in_group"], pa.int64()),
            "n_in_group": pa.array(cols["n_in_group"], pa.int64()),
        }
    )
    return tbl.sort_by([("query_id", "ascending"), ("group", "ascending"),
                        ("rank_in_group", "ascending")])


def _score_query(index, query: str):
    """Full BM25 ranking (docs, scores) for a query — sorted by doc."""
    from .query import topk_exact

    d, s = topk_exact(index, query, index.n_docs)
    order = np.argsort(d)
    return d[order], s[order]


# ---------------------------------------------------------------- kwic

def kwic_snippets(ds, terms: list[str], *, width: int = 2, index=None):
    """Keyword-in-context snippets: for each query term, every matching
    doc's FIRST occurrence with ±``width`` tokens of context — the
    engine-side analog of the Solr highlighting the viewer requests
    against the fields this indexer writes.

    One distributed ``map_batches`` pass; within a batch the match
    scan is vectorized (factorize once, one integer compare per term,
    ``np.unique(..., return_index=True)`` picks each doc's first hit);
    only snippet string assembly is per-HIT (output-sized, not
    corpus-sized).  When ``index`` is given, posting lists prune the
    scan to matching docs first (``pc.is_in`` semi-join), so rare-term
    KWIC over a huge corpus touches only the matching blocks' rows.

    Returns ``(term, doc_id, pos, snippet)``; ``pos`` is the 1-based
    token position (SQL ``list_position`` convention).
    """
    import unicodedata

    import pandas as pd
    import pyarrow.compute as pc

    import ray

    from ..functions.tokenize import TOKEN_RE

    qterms = sorted({t for q in terms for t in tokenize(q)})
    needed_ref = None
    if index is not None:
        cand = [boolean_docs(index, should=[t]) for t in qterms]
        cand = [c for c in cand if c.size]
        ids = np.unique(np.concatenate(cand)) if cand else np.empty(0, np.int64)
        needed_ref = ray.put(pa.array(ids, pa.int64()))
    terms_ref = ray.put(qterms)

    schema = pa.schema(
        [
            ("term", pa.string()),
            ("doc_id", pa.int64()),
            ("pos", pa.int64()),
            ("snippet", pa.string()),
        ]
    )

    def extract(t: pa.Table) -> pa.Table:
        if needed_ref is not None:
            t = t.filter(pc.is_in(t.column("doc_id"), value_set=ray.get(needed_ref)))
        if t.num_rows == 0:
            return schema.empty_table()
        doc_ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        findall = TOKEN_RE.findall
        norm = unicodedata.normalize
        toks_per: list[list[str]] = [
            findall(norm("NFC", x).lower()) if x else [] for x in texts
        ]
        counts = np.fromiter((len(x) for x in toks_per), np.int64, len(toks_per))
        flat = [tok for toks in toks_per for tok in toks]
        if not flat:
            return schema.empty_table()
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=True)
        row = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        out_t, out_d, out_p, out_s = [], [], [], []
        for q in ray.get(terms_ref):
            tc = np.searchsorted(uniq, q)
            if tc >= len(uniq) or uniq[tc] != q:
                continue
            hit = np.flatnonzero(codes == tc)
            if hit.size == 0:
                continue
            rows, first = np.unique(row[hit], return_index=True)
            fpos = hit[first] - starts[rows]  # 0-based pos of first hit per doc
            for r, p in zip(rows.tolist(), fpos.tolist()):  # per HIT, not per token
                toks = toks_per[r]
                out_t.append(q)
                out_d.append(int(doc_ids[r]))
                out_p.append(p + 1)
                out_s.append(" ".join(toks[max(p - width, 0) : p + width + 1]))
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
                "snippet": pa.array(out_s, pa.string()),
            }
        )

    out = ds.map_batches(extract, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["term", "doc_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ----------------------------------------------------- serving (actors)

def parse_structured(kind: str, query: str):
    """Mini Solr-ish query syntax → clause dict.

    - ``boolean``: bare terms are MUST, ``-term`` is MUST_NOT,
      ``|term`` is SHOULD (``SolrSearchIndex.search`` query strings,
      SolrSearchIndex.java:189-205, are this shape after field
      stripping).
    - ``phrase``: the string is the phrase.
    - ``near``: ``"a b ~3"`` — b after a within 3 tokens (``~w``
      defaults to 1 when absent).
    - ``bm25``: free text (scored path, handled by SearchEngine).
    """
    if kind == "boolean":
        must, should, must_not = [], [], []
        for w in query.split():
            if w.startswith("-"):
                must_not.append(w[1:])
            elif w.startswith("|"):
                should.append(w[1:])
            else:
                must.append(w)
        return {"must": must, "should": should, "must_not": must_not}
    if kind == "near":
        parts = query.split()
        window = 1
        if parts and parts[-1].startswith("~"):
            window = max(1, int(parts[-1][1:] or 1))
            parts = parts[:-1]
        if len(parts) != 2:
            raise ValueError(f"near query needs exactly 2 terms: {query!r}")
        return {"a": parts[0], "b": parts[1], "window": window}
    if kind in ("phrase", "bm25"):
        return {"q": query}
    raise ValueError(f"unknown query kind: {kind!r}")


class StructuredSearchEngine:
    """Actor-pool stage serving MIXED query batches — bm25 (scored),
    boolean, phrase, near — over one per-actor index load.

    The structured analog of :class:`~.query.SearchEngine` (same
    deployment story: document-partitioned replicas at scale, driver
    concatenates disjoint doc ranges).  Batch in: ``(query_id, kind,
    query, k)``; batch out: ``(query_id, rank, doc_id, score)`` where
    unscored kinds carry ``n_matches`` (boolean: 1.0) as the score and
    rank by (score desc, doc_id asc), top-k.

    Phrase/near need a positional index; a position-less index raises
    at query time with a clear message (fail loud, not wrong).
    """

    def __init__(self, out_dir: str | None = None, *, index=None):
        from .query import LocalIndex

        self.index = index if index is not None else LocalIndex(out_dir)

    def _one(self, kind: str, query: str, k: int):
        from .query import topk_exact

        if kind == "bm25":
            d, s = topk_exact(self.index, query, k)
            return d, s
        if kind == "boolean":
            c = parse_structured(kind, query)
            docs = boolean_docs(self.index, must=c["must"] or None,
                                should=c["should"] or None,
                                must_not=c["must_not"] or None)
            return docs[:k], np.ones(min(docs.size, k), np.float64)
        if kind == "phrase":
            t = phrase_docs_positional(self.index, [query])
            docs = t.column("doc_id").to_numpy()
            n = t.column("n_matches").to_numpy().astype(np.float64)
        elif kind == "near":
            c = parse_structured(kind, query)
            t = proximity_docs(self.index, [(c["a"], c["b"], c["window"])])
            docs = t.column("doc_id").to_numpy()
            n = t.column("n_matches").to_numpy().astype(np.float64)
        else:
            raise ValueError(f"unknown query kind: {kind!r}")
        order = np.lexsort((docs, -n))[:k]
        return docs[order], n[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("query_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        qs = batch.column("query").to_pylist()
        ks = (
            batch.column("k").to_pylist()
            if "k" in batch.column_names
            else [10] * len(qids)
        )
        qp, rp, dp, sp = [], [], [], []
        for qid, kind, q, k in zip(qids, kinds, qs, ks):
            d, s = self._one(kind, q, int(k))
            qp.append(np.full(d.size, qid, np.int64))
            rp.append(np.arange(1, d.size + 1, dtype=np.int32))
            dp.append(d.astype(np.int64, copy=False))
            sp.append(s)
        cat = lambda ps, dt: np.concatenate(ps) if ps else np.empty(0, dt)  # noqa: E731
        return pa.table(
            {
                "query_id": pa.array(cat(qp, np.int64)),
                "rank": pa.array(cat(rp, np.int32)),
                "doc_id": pa.array(cat(dp, np.int64)),
                "score": pa.array(cat(sp, np.float64)),
            }
        )


def structured_search(out_dir: str, queries: list[dict], *, concurrency: int = 2):
    """Mixed-kind query batch → results Dataset via an actor pool
    (each actor loads the index once in ``__init__``)."""
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([int(q["query_id"]) for q in queries], pa.int64()),
                "kind": pa.array([q.get("kind", "bm25") for q in queries], pa.string()),
                "query": pa.array([q["query"] for q in queries], pa.string()),
                "k": pa.array([int(q.get("k", 10)) for q in queries], pa.int32()),
            }
        )
    )
    if ds.num_blocks() < concurrency:
        ds = ds.repartition(concurrency)
    return ds.map_batches(
        StructuredSearchEngine,
        fn_constructor_kwargs={"out_dir": out_dir},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=concurrency,
        num_cpus=1,
    )


# --------------------------------------------------------------- facet

def facet_counts(index, ds, *, must: list[str], facets: list[str],
                 must_not: list[str] | None = None):
    """Facet counts over the docs matching a boolean query.

    ``ds`` is the metadata Dataset (``doc_id`` + facet columns).  The
    matched-id array is broadcast once (``ray.put``); each batch does a
    zero-copy ``pc.is_in`` semi-join; the counts come from one small
    ``groupby`` over facet values.  Returns a Dataset of
    ``(*facets, n_docs)``.
    """
    import pyarrow.compute as pc

    import ray
    from ray.data.aggregate import Count

    docs = boolean_docs(index, must=must, must_not=must_not)
    if docs.size == 0:  # all-empty blocks would drop the schema downstream
        import ray.data

        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        empty = pa.table(
            {**{f: pa.array([], types[f]) for f in facets},
             "n_docs": pa.array([], pa.int64())}
        )
        return ray.data.from_arrow(empty)
    ids_ref = ray.put(pa.array(docs, pa.int64()))

    def semi(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        return t.filter(pc.is_in(t.column("doc_id"), value_set=ids))

    matched = ds.map_batches(semi, batch_format="pyarrow")
    return matched.groupby(facets).aggregate(Count(alias_name="n_docs"))


# ----------------------------------------------------- query-string parser

def parse_querystring(s: str):
    """Classic Lucene/Solr query-string parser (the subset the
    viewer's search box produces after its own escaping —
    ``QueryParser`` classic syntax): ``AND`` / ``OR`` / ``NOT`` /
    ``-`` prefix / parentheses / ``"quoted phrases"``; implicit
    adjacency is ``OR`` (the classic parser's default operator);
    precedence NOT > AND > OR.

    Returns a nested AST of ``('term', str) | ('phrase', str) |
    ('and', [..]) | ('or', [..]) | ('not', node)``.
    """
    import re

    toks = re.findall(r'"[^"]*"|\(|\)|-|[^\s()"]+', s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        if pos >= len(toks):  # 'foo AND', '(', trailing NOT — fail with
            # the module's documented error type, not an IndexError
            raise ValueError("unexpected end of query")
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        parts = [parse_and()]
        while True:
            t = peek()
            if t == "OR":
                take()
                parts.append(parse_and())
            elif t is not None and t != ")" and t != "AND":
                parts.append(parse_and())  # implicit OR
            else:
                break
        return parts[0] if len(parts) == 1 else ("or", parts)

    def parse_and():
        parts = [parse_unary()]
        while peek() == "AND":
            take()
            parts.append(parse_unary())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def parse_unary():
        t = peek()
        if t in ("NOT", "-"):
            take()
            return ("not", parse_unary())
        return parse_primary()

    def parse_primary():
        t = take()
        if t == "(":
            node = parse_or()
            if peek() == ")":
                take()
            return node
        if t.startswith('"'):
            return ("phrase", t.strip('"'))
        return ("term", t)

    if not toks:
        return ("or", [])
    node = parse_or()
    return node


def querystring_docs(index, all_docs: np.ndarray, query: str) -> np.ndarray:
    """Evaluate :func:`parse_querystring` output to a sorted doc-id
    set via posting algebra: terms are analyzer-tokenized (a term
    that analyzes to several tokens becomes a phrase, the classic
    parser's behavior), phrases run on the positional index, ``NOT``
    complements against ``all_docs`` (per-shard universe — a
    top-level pure-negative query is corpus-sized by SEMANTICS, as in
    Solr's implicit ``*:*``)."""

    def phrase_set(p: str) -> np.ndarray:
        t = phrase_docs_positional(index, [p])
        return np.sort(t.column("doc_id").to_numpy().astype(np.int64))

    def ev(node) -> np.ndarray:
        kind = node[0]
        if kind == "term":
            ts = tokenize(node[1])
            if not ts:
                return np.empty(0, np.int64)
            if len(ts) > 1:
                return phrase_set(" ".join(ts))
            return _term_docs(index, ts[0])
        if kind == "phrase":
            ts = tokenize(node[1])
            if not ts:
                return np.empty(0, np.int64)
            if len(ts) == 1:
                return _term_docs(index, ts[0])
            return phrase_set(" ".join(ts))
        if kind == "not":
            return np.setdiff1d(all_docs, ev(node[1]), assume_unique=True)
        subs = [ev(n) for n in node[1]]
        if not subs:
            return np.empty(0, np.int64)
        out = subs[0]
        for d in subs[1:]:
            out = (np.intersect1d(out, d, assume_unique=True) if kind == "and"
                   else np.union1d(out, d))
        return out

    return ev(parse_querystring(query))


def regex_terms(index, pattern: str) -> list[tuple[str, int]]:
    """Solr TermsComponent ``terms.regex`` analog: vocab terms whose
    ENTIRE text matches ``pattern`` (``Pattern.matches`` semantics —
    full anchoring, unlike :func:`wildcard_terms`' translated glob),
    with df.  Same vocab-small-side scan shape; a literal prefix in
    the pattern could narrow the dictionary range exactly as in
    :func:`wildcard_terms` (not needed at this vocab size)."""
    import re as _re

    rx = _re.compile(pattern)
    terms, df, _ = _vocab_arrays(index)
    return [(str(t), int(d)) for t, d in zip(terms, df) if rx.fullmatch(t)]


def gap_phrase_docs(index, triples: list[tuple[str, int, str]]):
    """Wildcard-slot phrase matching — Solr ComplexPhrase ``"a * b"``
    / Lucene ``SpanNearQuery`` with an EXACT gap: for ``(a, gap, b)``
    docs where ``b`` occurs exactly ``gap + 1`` positions after ``a``
    (``gap`` arbitrary tokens between), with the exact slot-match
    count.  One composite-key ``intersect1d`` per query — the fixed-d
    special case of :func:`proximity_docs` (same positional algebra,
    no corpus access).

    Returns ``(query_id, doc_id, n_matches)``, sorted.
    """
    SHIFT = np.uint64(32)
    out_q, out_d, out_n = [], [], []
    for qid, (a, gap, b) in enumerate(triples):
        ta, tb = (tokenize(a) or [""])[0], (tokenize(b) or [""])[0]
        ra, rb = index.lookup(ta), index.lookup(tb)
        if ra is None or rb is None or gap < 0:
            continue
        docs_a, tfs_a, pos_a, _ = ra.positions_all()
        docs_b, tfs_b, pos_b, _ = rb.positions_all()
        union = _rank_union([docs_a, docs_b])
        rank_a = np.searchsorted(union, docs_a).astype(np.uint64)
        rank_b = np.searchsorted(union, docs_b).astype(np.uint64)
        keys_a = (np.repeat(rank_a, tfs_a) << SHIFT) | pos_a.astype(np.uint64)
        keys_b = (np.repeat(rank_b, tfs_b) << SHIFT) | pos_b.astype(np.uint64)
        m = np.intersect1d(keys_a + np.uint64(gap + 1), keys_b,
                           assume_unique=True)
        if not m.size:
            continue
        hits = union[(m >> SHIFT).astype(np.int64)]
        uniq, cnt = np.unique(hits, return_counts=True)
        out_q.append(np.full(uniq.size, qid, np.int64))
        out_d.append(uniq)
        out_n.append(cnt.astype(np.int64))
    if not out_q:
        return pa.table({
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n_matches": pa.array([], pa.int64()),
        })
    t = pa.table({
        "query_id": pa.array(np.concatenate(out_q), pa.int64()),
        "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
        "n_matches": pa.array(np.concatenate(out_n), pa.int64()),
    })
    return t.sort_by([("query_id", "ascending"), ("doc_id", "ascending")])
