"""Driver contract for the Ray-Data-native full-text index engine.

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init``/``ray.shutdown`` here or in anything these call.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the compressed
    inverted index over `documents` with the Ray engine, run the
    reference BM25 query set, return the top-k result table."""
    from goobi_viewer_indexer_ray.pipelines.catalog import documents_bm25_topk

    return documents_bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from goobi_viewer_indexer_ray.pipelines.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from goobi_viewer_indexer_ray.pipelines.catalog import ORACLE_SQL

    return dict(ORACLE_SQL)
