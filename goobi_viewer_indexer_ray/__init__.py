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

ENGINE_SPEC_VERSION = 3
"""Bump whenever extractor/tokenizer/codec/scoring semantics change;
recorded in every partition manifest (reference analog: the Solr schema
version gate, ``SolrIndexerDaemon.java:48``)."""
