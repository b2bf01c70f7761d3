"""Docid-reassignment compression study — the index-layout
optimization the reference delegates to Lucene's segment writer
(document order = ingest order, `indexer/Indexer.java` hands docs to
Solr as they arrive); a web-scale engine owns the permutation instead.

Reassigning document ids so similar documents (same language, same
source/host) receive ADJACENT ids shrinks the deltas every
delta-encoded postings codec stores — the classic docid-reordering
result (Silvestri, "Sorting out the document identifier assignment
problem", ECIR 2007; Dhulipala et al., KDD 2016).  Two operators:

:func:`docid_rank` — the permutation itself, computed distributed via
the canonical two-level scan (per-group counts → driver exclusive
offsets over the tiny group list → broadcast → per-group local rank).
No global sort, no O(N) driver state.

:func:`gap_bits_study` — for the heaviest terms, the postings delta
cost Σ bit_length(gap) (the codec-agnostic lower bound a
varint/FOR/EF layout pays) under the ORIGINAL vs the REMAPPED
ordering, via one hash join (tag → union → one ``groupby(doc_id)``)
and one ``groupby(term)`` reduce.

Partitioning assumptions (SURVEY §2.10 contract): one (lang, source)
slice fits a reduce task in ``docid_rank`` (salt by doc-range if a
slice outgrows it), and one heavy term's filtered postings fit a
reduce task in the study (top_terms bounds that side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["docid_rank", "gap_bits_study"]

_SEP = "\x1f"  # below every printable byte: gkey order == tuple order


def _bitlen(x: np.ndarray) -> np.ndarray:
    """Exact bit length of positive int64 (< 2^53): frexp's exponent
    (x = m·2^e, 0.5 ≤ m < 1 ⇒ e = bit_length) — no float-log2
    boundary risk at powers of two."""
    return np.frexp(x.astype(np.float64))[1].astype(np.int64)


def docid_rank(docs, order_cols: tuple[str, ...] = ("lang", "source")):
    """(doc_id, new_id): dense rank of documents by (*order_cols,
    doc_id) — the reassignment permutation, distributed."""
    import ray

    cols = list(order_cols)

    def add_key(t: pa.Table) -> pa.Table:
        key = t.column(cols[0]).cast(pa.string())
        for c in cols[1:]:
            key = pc.binary_join_element_wise(
                key, t.column(c).cast(pa.string()), _SEP
            )
        return pa.table(
            {"gkey": key, "doc_id": t.column("doc_id").cast(pa.int64())}
        )

    keyed = docs.map_batches(add_key, batch_format="pyarrow")

    from ray.data.aggregate import Count

    totals = pa.concat_tables(
        keyed.groupby("gkey")
        .aggregate(Count(alias_name="n"))
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("gkey")  # Arrow bytewise == SQL BINARY collation
    g_n = totals.column("n").to_numpy().astype(np.int64)
    g_off = np.concatenate([[0], np.cumsum(g_n)[:-1]])
    off_ref = ray.put(
        dict(zip(totals.column("gkey").to_pylist(), (int(v) for v in g_off)))
    )

    def rank_group(g: pa.Table) -> pa.Table:
        base = ray.get(off_ref)[g.column("gkey")[0].as_py()]
        d = g.column("doc_id").take(pc.sort_indices(g.column("doc_id")))
        return pa.table(
            {
                "doc_id": d,
                "new_id": pa.array(
                    base + np.arange(g.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    return keyed.groupby("gkey").map_groups(rank_group, batch_format="pyarrow")


def gap_bits_study(docs, *, top_terms: int = 50,
                   order_cols: tuple[str, ...] = ("lang", "source")):
    """Per heavy term: df and Σ bit_length(gap) of the sorted postings
    under original vs remapped docids (first gap anchored at -1, so
    every gap ≥ 1).  ``docs`` must carry doc_id, text and
    ``order_cols``."""
    import ray

    from .postings import TokenizePostings

    text_side = docs.select_columns(["doc_id", "text"])
    postings = text_side.map_batches(
        TokenizePostings(num_shards=1), batch_format="pyarrow"
    )
    from ray.data.aggregate import Count

    # vocab-bounded per-term stats; only the top slice hits the driver
    top_rows = (
        postings.groupby("term")
        .aggregate(Count(alias_name="df"))
        .sort(["df", "term"], descending=[True, False])
        .limit(top_terms)
        .take_all()
    )
    terms_ref = ray.put(sorted(r["term"] for r in top_rows))

    def filt(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("term"),
            value_set=pa.array(ray.get(terms_ref), pa.string()),
        )
        t = t.filter(keep)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "term": t.column("term"),
                "new_id": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    post_side = postings.map_batches(filt, batch_format="pyarrow")

    def tag_rank(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "term": pa.nulls(t.num_rows, pa.string()),
                "new_id": t.column("new_id"),
            }
        )

    rank_side = docid_rank(
        docs.select_columns(["doc_id", *order_cols]), order_cols
    ).map_batches(tag_rank, batch_format="pyarrow")

    def attach(g: pa.Table) -> pa.Table:
        nid = g.column("new_id").to_numpy(zero_copy_only=False)
        have = ~pd_isnan(nid)
        new_id = int(nid[have][0])
        tm = g.column("term")
        post = pc.is_valid(tm)
        t = g.filter(post)
        return pa.table(
            {
                "term": t.column("term"),
                "doc_id": t.column("doc_id"),
                "new_id": pa.array(
                    np.full(t.num_rows, new_id, np.int64), pa.int64()
                ),
            }
        )

    joined = (
        rank_side.union(post_side)
        .groupby("doc_id")
        .map_groups(attach, batch_format="pyarrow")
    )

    def cost(g: pa.Table) -> pa.Table:
        d = np.sort(g.column("doc_id").to_numpy())
        n = np.sort(g.column("new_id").to_numpy())
        gd = np.diff(np.concatenate([[-1], d]))
        gn = np.diff(np.concatenate([[-1], n]))
        return pa.table(
            {
                "term": pa.array([g.column("term")[0].as_py()], pa.string()),
                "df": pa.array([g.num_rows], pa.int64()),
                "bits_orig": pa.array([int(_bitlen(gd).sum())], pa.int64()),
                "bits_remap": pa.array([int(_bitlen(gn).sum())], pa.int64()),
            }
        )

    return (
        joined.groupby("term")
        .map_groups(cost, batch_format="pyarrow")
        .sort("term")
    )


def pd_isnan(a: np.ndarray) -> np.ndarray:
    """NaN mask for a float array produced by a nullable int column."""
    return np.isnan(a.astype(np.float64))
