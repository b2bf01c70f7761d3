"""End-to-end corpus curation: quality → language → dedup → sample →
partitioned write.

The composed training-data shape (the reason the individual operators
exist): one streaming Dataset pipeline that

1. computes per-doc signals in ONE fused ``map_batches`` pass —
   quality counts, stopword language-ID and the content hash share a
   single tokenize/factorize (``text_ops._flat_token_codes``), so the
   corpus is read once, not three times;
2. filters locally (integer threshold rules — no floats, so the SQL
   oracle compares exactly) BEFORE the shuffle, shrinking the dedup
   exchange to quality-passing docs only;
3. exact-dedups on the content hash (``groupby(text_md5)``, keep the
   min-doc_id row — the same keep-first rule as ``stages/dedup``);
4. applies the deterministic hash sample (``stages/sampling`` rule:
   coordination-free, retry-stable) AFTER dedup, so the sampling rate
   applies to unique documents;
5. optionally writes partitioned parquet (one directory per
   ``lang_pred``) — the resumable-output layout.

Every rule is exact/deterministic, so the WHOLE pipeline has a single
SQL oracle (signals CTE → threshold WHERE → ``row_number() OVER
(PARTITION BY md5)`` → sample predicate) despite being five composed
distributed stages.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..stages.sampling import sample_threshold
from ..stages.text_ops import STOPWORDS, _flat_token_codes, _vocab_hits

__all__ = ["curate", "CURATE_DEFAULTS"]

CURATE_DEFAULTS = dict(
    min_tokens=30,          # drop stubs
    max_tokens=5000,        # drop megapages
    distinct_x1000=80,      # n_distinct/n_tokens ≥ 8% (repetition guard)
    punct_x1000=300,        # punct_hits/n_chars ≤ 30% (boilerplate guard)
    langs=("en", "de"),
    sample_fraction=0.5,
    salt="cur0",
)

_LANG_ORDER = ("en", "de", "fr")


def _signals_batch(batch: pa.Table) -> pa.Table:
    """Fused per-doc signals: ONE tokenize/factorize feeding quality
    counts, language-ID and the content hash."""
    import pyarrow.compute as pc

    ids, counts, codes, uniques = _flat_token_codes(batch)
    mat = np.zeros((ids.size, len(_LANG_ORDER)), dtype=np.int64)
    for li, lang in enumerate(_LANG_ORDER):
        mat[:, li] = _vocab_hits(uniques, codes, counts, STOPWORDS[lang])
    best = np.argmax(mat, axis=1)
    langs = np.asarray(_LANG_ORDER, dtype=object)
    preds = np.where(mat.max(axis=1, initial=0) > 0, langs[best], "und")

    if codes.size:
        rows = np.repeat(np.arange(ids.size, dtype=np.int64), counts)
        key = rows * np.int64(max(1, uniques.size)) + codes
        u_rows = np.unique(key) // max(1, uniques.size)
        n_distinct = np.bincount(u_rows, minlength=ids.size).astype(np.int64)
    else:
        n_distinct = np.zeros(ids.size, dtype=np.int64)

    txt = pc.fill_null(batch.column("text"), "")
    n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
    punct = pc.cast(
        pc.utf8_length(
            pc.replace_substring_regex(txt, pattern="[a-zA-Z0-9 ]+", replacement="")
        ),
        pa.int64(),
    )
    md5s = [
        hashlib.md5((t or "").encode()).hexdigest()
        for t in batch.column("text").to_pylist()
    ]  # oracle-pinned hash (DuckDB md5) — same precedent as stages/dedup
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang_pred": pa.array(preds, pa.string()),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "n_chars_c": n_chars,
            "punct_hits": punct,
            "text_md5": pa.array(md5s, pa.string()),
        }
    )


def curate(ds, *, min_tokens: int, max_tokens: int, distinct_x1000: int,
           punct_x1000: int, langs: tuple[str, ...], sample_fraction: float,
           salt: str, out_dir: str | None = None):
    """Run the curation pipeline; returns the curated Dataset of
    ``(doc_id, lang_pred, n_tokens)`` and, with ``out_dir``, also
    writes it as parquet partitioned by ``lang_pred``."""
    import pyarrow.compute as pc

    lang_set = pa.array(sorted(langs), pa.string())
    thr = sample_threshold(sample_fraction)
    salt_s = str(salt)

    def keep(t: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("n_tokens"), pa.scalar(min_tokens)),
                pc.less_equal(t.column("n_tokens"), pa.scalar(max_tokens)),
            ),
            pc.and_(
                pc.greater_equal(
                    pc.multiply(t.column("n_distinct"), pa.scalar(1000)),
                    pc.multiply(t.column("n_tokens"), pa.scalar(distinct_x1000)),
                ),
                pc.less_equal(
                    pc.multiply(t.column("punct_hits"), pa.scalar(1000)),
                    pc.multiply(t.column("n_chars_c"), pa.scalar(punct_x1000)),
                ),
            ),
        )
        ok = pc.and_(ok, pc.is_in(t.column("lang_pred"), value_set=lang_set))
        return t.filter(ok)

    def keep_min_doc(g: pa.Table) -> pa.Table:
        i = int(np.argmin(g.column("doc_id").to_numpy()))
        return g.take([i])

    def sample(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        h = np.fromiter(
            (hashlib.md5(f"{i}:{salt_s}".encode()).hexdigest()[:8] for i in ids),
            dtype="U8",
            count=ids.size,
        )
        mask = h < np.array(thr, dtype="U8")
        return t.filter(pa.array(mask))

    cur = (
        ds.map_batches(_signals_batch, batch_format="pyarrow")
        .map_batches(keep, batch_format="pyarrow")
        .groupby("text_md5")
        .map_groups(keep_min_doc, batch_format="pyarrow")
        .map_batches(sample, batch_format="pyarrow")
        .map_batches(
            lambda t: t.select(["doc_id", "lang_pred", "n_tokens"]),
            batch_format="pyarrow",
        )
    )
    if out_dir is not None:
        cur = cur.materialize()  # write + return without recompute
        cur.write_parquet(out_dir, partition_cols=["lang_pred"])
    return cur
