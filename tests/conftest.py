"""Session-scoped Ray + tiny-corpus fixtures (one ray.init per session)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TINY_N = 200
TINY_SEED = 42
NUM_PARTS = 4
NUM_SHARDS = 4


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_paths(tmp_path_factory):
    """Tiny pages corpus on disk (no Ray needed)."""
    from goobi_viewer_indexer_ray.sources.corpus import write_pages

    d = tmp_path_factory.mktemp("corpus") / "pages"
    write_pages(str(d), TINY_N, seed=TINY_SEED, rows_per_file=64)
    return str(d)


@pytest.fixture(scope="session")
def tiny_build(ray_session, tiny_paths, tmp_path_factory):
    """Full engine build over the tiny corpus; returns the out_dir."""
    from goobi_viewer_indexer_ray.pipelines.build import build_all

    out = str(tmp_path_factory.mktemp("engine") / "out")
    build_all(tiny_paths, out, num_parts=NUM_PARTS, num_shards=NUM_SHARDS)
    return out


@pytest.fixture(scope="session")
def tiny_oracle():
    from goobi_viewer_indexer_ray.pipelines.oracle import build_oracle
    from goobi_viewer_indexer_ray.sources.corpus import gen_pages

    return build_oracle(gen_pages(TINY_N, TINY_SEED).to_pylist(), num_parts=NUM_PARTS)


# Shared positional-index fixture corpus (tests/test_positions.py,
# tests/test_structured_search.py)
POS_TEXTS = {
    100: "alpha beta gamma alpha beta",
    101: "beta alpha",
    102: "gamma gamma gamma beta",
    103: "alpha beta alpha beta alpha beta",
    104: "solo",
}


@pytest.fixture(scope="session")
def pos_index_dir(ray_session, tmp_path_factory):
    import pyarrow as pa
    import ray

    from goobi_viewer_indexer_ray.pipelines.build import build_text_index

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(POS_TEXTS), pa.int64()),
                "text": pa.array(list(POS_TEXTS.values()), pa.string()),
            }
        )
    ).repartition(3)  # multiple runs per term exercise the merge path
    out = str(tmp_path_factory.mktemp("posidx") / "out")
    build_text_index(ds, out, "fp-pos-test", num_shards=2, bucket_size=4,
                     with_positions=True)
    return out
