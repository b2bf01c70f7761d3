"""Incremental upsert / delete — the reference's update machinery.

Reference analogs: ``prepareUpdate`` delete-before-insert upsert
(``Indexer.java:1695-1756``), ``.delete``/``.purge`` command files with
cascade delete + ``DATEDELETED`` trace docs (``Indexer.java:365-473``,
SURVEY.md §3.2), and ``.docupdate`` single-doc updates.

Our transposition is partition-level incremental rebuild (SURVEY.md
§2.9): a delta of new/updated pages plus a list of deleted urls dirties
only the url-hash partitions it touches.

    dirty parts = hash(urls in delta ∪ deletes) % num_parts
    per dirty part (parallel Ray tasks):
        old docs part rows − deleted urls + extracted delta rows
        → dedup-keep-latest → rank → rewrite docs + SPIMI runs
    index: groupby(shard) merge over ALL per-part run caches
        (clean parts' run files are reused byte-for-byte — no
        re-extraction, no re-tokenization; only the cheap
        compressed-run shuffle reruns)

Deletes are recorded in a tombstone ledger
(``out_dir/tombstones.jsonl`` — the DATEDELETED trace-doc analog).

Scale note: the run-merge shuffle rewrites all shards, because a dirty
doc's terms hash anywhere.  At 10^12 docs the same layout supports
segment-per-update with query-time merge; at the scales tested the
full run merge is cheap relative to extraction.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..functions.hashing import part_for
from ..stages.docs_writer import DOCS_SCHEMA, DocsPartWriter, part_dir
from ..stages.extract import ExtractPages
from ..state.manifest import load_manifest
from .build import (
    _collect_docs_manifest,
    _job_fp,
    _manifest_runs_files,
    _merge_runs,
    _resolve_pages,
    _write_index_manifest,
)

__all__ = ["apply_updates"]

_DELTA_COLS = [f.name for f in DOCS_SCHEMA if f.name != "local_rank"]


@ray.remote
def _rebuild_part(part: int, out_dir: str, fp: str, num_shards: int,
                  delta_rows: pa.Table | None, deleted_urls: list[str]) -> int:
    """Merge one dirty partition: old rows − deletes + delta → rewrite."""
    docs_dir = os.path.join(out_dir, "docs")
    old_path = os.path.join(part_dir(docs_dir, part), "data.parquet")
    pieces = []
    if os.path.exists(old_path):
        old = pq.read_table(old_path, columns=_DELTA_COLS)
        if deleted_urls:
            gone = set(deleted_urls)
            mask = [u not in gone for u in old.column("url").to_pylist()]
            old = old.filter(pa.array(mask))
        if old.num_rows:
            pieces.append(old)
    if delta_rows is not None and delta_rows.num_rows:
        pieces.append(delta_rows.select(_DELTA_COLS))

    writer = DocsPartWriter(docs_dir, os.path.join(out_dir, "runs"), fp, num_shards)
    if pieces:
        writer(pa.concat_tables(pieces), part=part)
    else:  # partition emptied
        writer(pa.table({f.name: pa.array([], f.type) for f in DOCS_SCHEMA
                         if f.name != "local_rank"}), part=part)
    return part


def apply_updates(
    out_dir: str,
    delta_pages: str | list[str] | None = None,
    deleted_urls: list[str] | None = None,
    *,
    reason: str = "update",
) -> dict:
    """Apply new/updated pages and url deletions to an existing build.

    Returns the new index manifest.  Clean partitions' docs and run
    files are untouched on disk (byte-identical, verified in tests).
    """
    import ray.data as rd

    deleted_urls = list(deleted_urls or [])
    docs_man = load_manifest(os.path.join(out_dir, "docs_manifest.json"))
    if docs_man is None:
        raise FileNotFoundError("no existing build under out_dir")
    num_parts = int(docs_man["num_parts"])
    num_shards = int(docs_man["num_shards"])

    delta_tbl = None
    delta_id = ""
    if delta_pages is not None:
        paths = _resolve_pages(delta_pages)
        from ..state.manifest import input_fingerprint

        delta_id = input_fingerprint(paths)
        from ..stages.extract import DOCS_RAW_SCHEMA

        ds = rd.read_parquet(paths, columns=["url", "warc_ts", "html", "lang"])
        ds = ds.map_batches(ExtractPages(num_parts), batch_format="pyarrow")
        tables = [
            t.select(DOCS_RAW_SCHEMA.names).cast(DOCS_RAW_SCHEMA)
            for t in (ray.get(r) for r in ds.to_arrow_refs())
            if t.num_rows
        ]
        delta_tbl = pa.concat_tables(tables) if tables else None

    fp = _job_fp(
        docs_man["fingerprint"],
        delta=delta_id,
        deletes=sorted(deleted_urls),
        op="update",
    )

    dirty: set[int] = {part_for(u, num_parts) for u in deleted_urls}
    delta_by_part: dict[int, pa.Table] = {}
    if delta_tbl is not None and delta_tbl.num_rows:
        import pyarrow.compute as pc

        for p in sorted(set(delta_tbl.column("part").to_pylist())):
            delta_by_part[int(p)] = delta_tbl.filter(
                pc.equal(delta_tbl.column("part"), pa.scalar(p, pa.int32()))
            )
        dirty |= set(delta_by_part)

    deletes_by_part: dict[int, list[str]] = {}
    for u in deleted_urls:
        deletes_by_part.setdefault(part_for(u, num_parts), []).append(u)

    ray.get(
        [
            _rebuild_part.remote(
                p, out_dir, fp, num_shards, delta_by_part.get(p), deletes_by_part.get(p, [])
            )
            for p in sorted(dirty)
        ]
    )

    if deleted_urls:  # tombstone ledger (DATEDELETED trace-doc analog)
        with open(os.path.join(out_dir, "tombstones.jsonl"), "a") as f:
            for u in sorted(deleted_urls):
                f.write(json.dumps({"url": u, "part": part_for(u, num_parts),
                                    "reason": reason, "deleted_at": time.time()}) + "\n")

    # expected per-part fingerprints: dirty parts carry the update fp,
    # clean parts keep whatever fp the current manifest recorded — so a
    # stale part=* dir from an older layout can never re-enter the index
    part_fps = {int(p["part"]): p.get("fp", docs_man["fingerprint"])
                for p in docs_man["parts"]}
    for p in dirty:
        part_fps[int(p)] = fp
    new_docs_man = _collect_docs_manifest(out_dir, fp, num_parts, num_shards,
                                          part_fps=part_fps)

    # index rebuild from the manifest's run caches (clean parts reused untouched)
    runs_files = _manifest_runs_files(out_dir, new_docs_man)
    index_fp = _job_fp(fp, num_shards=num_shards)
    shard_rows = _merge_runs(rd.read_parquet(runs_files), os.path.join(out_dir, "index"), index_fp)
    return _write_index_manifest(out_dir, index_fp, num_shards, shard_rows, new_docs_man)
