"""goobi_viewer_indexer_ray — a Ray-Data-native full-text index engine.

A from-scratch reimplementation of the data-processing capabilities of
``intranda/goobi-viewer-indexer`` (reference, read-only at
``/root/reference/``) built on ``ray.data.Dataset`` pipelines, including
the part the reference delegates to Solr: tokenization, inverted-index
(posting list) construction, compression, and BM25 top-k scoring.

Layout
------
- ``functions/``  pure, deterministic scalar/batch functions (extractor,
  tokenizer, codecs, scoring math).  These define the engine *spec*; the
  Ray stages and the test oracles both call them, which is how the
  byte-identical / rank-identical invariants are pinned.
- ``sources/``    corpus synthesis + parquet readers.
- ``stages/``     Ray Data ``map_batches`` stages (stateless fns and
  actor-pool classes).
- ``pipelines/``  end-to-end Dataset pipelines (docs build, index build,
  query) and the driver-facing operator catalog.
- ``state/``      manifests, lineage, resume logic.
"""

__version__ = "0.1.0"


def _silence_known_ray_noise() -> None:
    """Filter one known-harmless Ray Data warning out of worker logs.

    ``transform_pyarrow.unify_schemas`` logs "Failed to hash the
    schemas (for deduplication): unhashable type: 'dict'" on every
    reduce task whose schemas carry dict metadata — cosmetic (it falls
    back to full unification) but it floods bench/driver output.  This
    module is imported in every Ray worker that deserializes our
    callables, so installing the filter here covers the whole pool.
    """
    import logging

    class _Drop(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_Drop())


_silence_known_ray_noise()

ENGINE_SPEC_VERSION = 3
"""Bump whenever extractor/tokenizer/codec/scoring semantics change;
recorded in every partition manifest (reference analog: the Solr schema
version gate, ``SolrIndexerDaemon.java:48``)."""
