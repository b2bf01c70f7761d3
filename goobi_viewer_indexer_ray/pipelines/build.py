"""Index-build pipelines (SURVEY.md §3.4 lifecycle).

The flagship path is ONE fused streaming execution:

    pages parquet ──extract──► groupby(url-part)
        ──dedup + doc_id──► docs/part=*/data.parquet   (side write)
        ──tokenize + map-side SPIMI run encode──►
        groupby(term-shard) ──► index/shard=*/terms.parquet
        └─► docs_manifest.json / stats.json / index_manifest.json

Fusion is possible because nothing in the chain needs global state:
doc ids are strided per partition (``functions/ids.py``) and block-max
metadata is ``(max_tf, min_dl)`` ints, so the BM25 ``avgdl`` is only
needed at query time (computed from the per-part manifests afterwards).

Scale notes (sized for ~10^12 docs / 100 TB multi-node, tested
single-node):

- ``html`` never leaves the extract stage; the posting shuffle carries
  only compressed SPIMI runs (≈5-15× smaller than raw postings).  The
  two groupbys are the only all-to-all exchanges, and they run inside
  one streaming execution.
- head-term skew: a head term reaches its reducer as many doc-range
  runs (the map batch is the salt), never as raw posting rows; the
  reducer decodes a shard with three vectorized varint passes.
- ``num_parts`` / ``num_shards`` are the deployment knobs.  Keep them
  ≥ the cluster's total cores and ≥ data_size/partition-budget; low
  cardinality (≪ sort partitions) skews Ray's sort-based shuffle.
- resume: docs parts and index shards are atomic files with per-file
  manifests.  A rerun recomputes upstream work but rewrites only
  missing/invalid partitions, byte-identically (outputs are pure
  functions of logical content, independent of Ray's batching).
"""

from __future__ import annotations

import glob
import os
from hashlib import blake2b

import numpy as np
import pyarrow as pa

import ray.data

from .. import ENGINE_SPEC_VERSION
from ..functions.ids import PART_STRIDE
from ..stages.docs_writer import DocsPartWriter, part_dir, runs_part_path
from ..stages.extract import ExtractPages
from ..stages.index_merge import SegmentWriter, segment_dir
from ..stages.postings import TokenizeEncodeRuns
from ..state.manifest import (
    atomic_write_json,
    input_fingerprint,
    load_manifest,
    manifest_valid,
    write_manifest,
)

__all__ = ["build_docs", "build_index", "build_all", "build_text_index", "read_docs", "load_stats"]

# deployment sizing budgets (SURVEY.md "memory-aware"): one docs
# partition per ~PART_BUDGET of compressed input, so a groupby(part)
# task's working set is bounded regardless of corpus size
PART_INPUT_BUDGET = 128 << 20  # compressed input bytes per docs partition
DEFAULT_RANGE_BUCKETS = 8  # segments per shard (see _bucketing)


def _cpus() -> int:
    import ray

    try:
        return max(1, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


def _auto_parts(paths: list[str], num_parts: int | None) -> int:
    """Derive ``num_parts`` from input bytes when not given: ≥ cores
    (shuffle parallelism) and ≥ bytes/budget (bounded per-task state).
    A fixed default invites 3 TB groups at 100 TB — the knob must
    follow the data."""
    if num_parts is not None:
        return num_parts
    total = sum(os.path.getsize(p) for p in paths)
    return max(_cpus(), -(-total // PART_INPUT_BUDGET))


def _bucketing(num_parts: int, num_range_buckets: int | None) -> tuple[int, int]:
    """(parts_per_bucket, bucket_size_docs) for the segmented merge.

    ``bucket = doc_id // bucket_size_docs`` groups ``parts_per_bucket``
    consecutive url-hash partitions (doc ids are strided per part, so
    contiguous parts = contiguous doc ranges).  No reduce task then
    holds more than ``corpus / (num_shards × num_buckets)`` postings —
    the head-term guarantee.  Default 8 buckets balances that bound
    against segment-file count; raise it for bigger corpora."""
    nrb = num_range_buckets or min(num_parts, DEFAULT_RANGE_BUCKETS)
    ppb = max(1, -(-num_parts // nrb))
    return ppb, ppb * PART_STRIDE


def _part_fp_map(docs_man: dict) -> dict[int, str]:
    return {int(p["part"]): p.get("fp", docs_man["fingerprint"])
            for p in docs_man["parts"]}


def _segment_fps(num_parts: int, parts_per_bucket: int, num_shards: int,
                 part_fps: dict[int, str]) -> dict[int, str]:
    """bucket → fingerprint, derived from the run fingerprints of the
    bucket's parts — an update that dirties one part changes ONLY its
    bucket's segment fingerprints, so every other segment resumes
    (skips) untouched.  Only parts present in ``part_fps`` (i.e.
    listed in the docs manifest) contribute."""
    out = {}
    for b in range(-(-num_parts // parts_per_bucket)):
        h = blake2b(digest_size=16)
        for p in range(b * parts_per_bucket, min((b + 1) * parts_per_bucket, num_parts)):
            if p in part_fps:
                h.update(f"{p}:{part_fps[p]};".encode())
        h.update(f"s{num_shards}v{ENGINE_SPEC_VERSION}".encode())
        out[b] = h.hexdigest()
    return out


def _job_fp(input_fp: str, **params) -> str:
    h = blake2b(digest_size=16)
    h.update(input_fp.encode())
    h.update(repr(sorted(params.items())).encode())
    h.update(str(ENGINE_SPEC_VERSION).encode())
    return h.hexdigest()


def _resolve_pages(pages: str | list[str]) -> list[str]:
    if isinstance(pages, str):
        if os.path.isdir(pages):
            return sorted(glob.glob(os.path.join(pages, "*.parquet")))
        return [pages]
    return sorted(pages)


def _plan_partition_map(paths, out_dir, strategy):
    """Assign every input url a partition through a STATEFUL strategy
    (functions/partition.py) and persist the ledger.

    The (url, nbytes) pairs are computed by a pruned distributed scan;
    the sequential smallest-sufficient-space fold then runs on the
    driver in (url-sorted) deterministic order — the reference assigns
    per record file on its single hotfolder thread, and this is the
    same hotfolder-scale policy surface (bounded by the ingest batch,
    NOT a corpus-wide materialization: the default hash strategy skips
    all of this).  Sticky: urls already in the ledger keep their
    partition; the extended ledger is re-persisted atomically."""
    from ..functions.partition import save_ledger

    def sizes(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "url": t.column("url"),
                "nbytes": pc.cast(pc.binary_length(t.column("html")), pa.int64()),
            }
        )

    small = (
        ray.data.read_parquet(paths, columns=["url", "html"])
        .map_batches(sizes, batch_format="pyarrow")
        .to_pandas()
        .sort_values("url", kind="stable")
    )
    strategy.assign(small["url"].tolist(), small["nbytes"].tolist())
    save_ledger(out_dir, strategy)
    return dict(strategy.assign_map)


def _fresh_part_map(paths, out_dir, partition_strategy):
    """Partition map for a FRESH (non-resumed) build: plan + persist
    the ledger when a strategy is given, else None (hash)."""
    if partition_strategy is not None:
        return _plan_partition_map(paths, out_dir, partition_strategy)
    return None


def _clear_stale_ledger(out_dir: str, partition_strategy) -> None:
    """AFTER a hash build commits its manifest, remove any ledger a
    previous strategy build left behind.  Deleting before the commit
    would open a crash window (old strategy-era docs still live, no
    ledger → deletes misroute); update routing ALSO validates the
    ledger against the manifest's recorded strategy
    (updates.py:_apply_updates_locked), so even a failed deletion
    can't resurrect stale routing."""
    from ..functions.partition import LEDGER_NAME

    if partition_strategy is None:
        stale = os.path.join(out_dir, LEDGER_NAME)
        if os.path.exists(stale):
            os.remove(stale)


def _docs_pipeline(paths, out_dir, fp, num_parts, num_shards, batch_size,
                   use_actors, concurrency, part_map=None):
    """pages files → Dataset of compressed per-part SPIMI run rows,
    writing docs/part=* and runs/part=* files as side effects."""
    ds = ray.data.read_parquet(paths, columns=["url", "warc_ts", "html", "lang"])
    if use_actors:
        pool = concurrency or max(1, _cpus() - 2)
        ds = ds.map_batches(
            ExtractPages,
            fn_constructor_kwargs={"num_parts": num_parts,
                                   "part_map": part_map},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=pool,
            num_cpus=1,
        )
    else:
        ds = ds.map_batches(
            ExtractPages(num_parts, part_map), batch_format="pyarrow",
            batch_size=batch_size
        )
    writer = DocsPartWriter(
        os.path.join(out_dir, "docs"), os.path.join(out_dir, "runs"), fp, num_shards
    )

    def write_docs_part(g: pa.Table) -> pa.Table:
        return writer(g)

    return ds.groupby("part").map_groups(write_docs_part, batch_format="pyarrow")


def _collect_docs_manifest(out_dir: str, fp: str, num_parts: int, num_shards: int,
                           part_fps: dict[int, str] | None = None,
                           strategy=None, strategy_fp: str | None = None) -> dict:
    """Fold per-part manifests into the docs manifest.

    Enumerates part ids ``0..num_parts-1`` (NEVER a ``part=*`` glob —
    stale directories from an earlier build with different num_parts
    must not leak phantom docs into the manifest) and accepts a part
    only when its manifest fingerprint matches the expected one:
    ``fp`` for a fresh build, or ``part_fps[part]`` on the incremental
    path, where clean parts keep their original build fingerprint.
    """
    docs_dir = os.path.join(out_dir, "docs")
    parts = []
    for p in range(num_parts):
        m = load_manifest(os.path.join(part_dir(docs_dir, p), "_manifest.json"))
        expected = (part_fps or {}).get(p, fp)
        if m and m.get("fingerprint") == expected:
            parts.append(m)
    n_docs = int(sum(p["n_rows"] for p in parts))
    total_tokens = int(sum(p["sum_dl"] for p in parts))
    return write_manifest(
        os.path.join(out_dir, "docs_manifest.json"),
        stage="docs",
        fingerprint=fp,
        extra={
            "num_parts": num_parts,
            "num_shards": num_shards,
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "n_dups_removed": int(sum(p["n_dups_removed"] for p in parts)),
            # explicit per-call-site policy record: build paths pass
            # their own strategy; the updates refold passes the prior
            # manifest's value through (NEVER inferred from a ledger
            # file, which may be stale after a hash rebuild)
            "partition_strategy": (
                strategy_fp if strategy_fp is not None
                else (strategy.fingerprint() if strategy is not None else "hash")
            ),
            "parts": [
                {"part": int(p["part"]), "n_rows": int(p["n_rows"]),
                 "fp": p["fingerprint"]}
                for p in parts
            ],
        },
    )


def _manifest_runs_files(out_dir: str, docs_man: dict) -> list[str]:
    """Run-cache files for exactly the parts in the docs manifest,
    validated against each part's recorded fingerprint (stale
    ``part=*`` dirs from an earlier layout are never merged)."""
    runs_dir = os.path.join(out_dir, "runs")
    files = []
    for p in docs_man["parts"]:
        path = runs_part_path(runs_dir, int(p["part"]))
        rm = load_manifest(os.path.join(os.path.dirname(path), "_manifest.json"))
        if rm is None or rm.get("fingerprint") != p.get("fp", docs_man["fingerprint"]):
            raise FileNotFoundError(
                f"run cache for part {p['part']} is missing or stale ({path}); "
                "rebuild docs"
            )
        files.append(path)
    return files


def _docs_manifest_ok(out_dir: str, fp: str) -> dict | None:
    """Valid rollup manifest AND every listed part intact: data file
    present and the per-part manifest readable with the recorded
    fingerprint — a deleted/corrupt part manifest must trigger the
    heal path (rewriting that part byte-identically), not a no-op
    that leaves the tree inconsistent for a later incremental run."""
    m = manifest_valid(os.path.join(out_dir, "docs_manifest.json"), fp)
    if not m:
        return None
    docs_dir = os.path.join(out_dir, "docs")
    for p in m["parts"]:
        pdir = part_dir(docs_dir, int(p["part"]))
        if not os.path.exists(os.path.join(pdir, "data.parquet")):
            return None
        pm = load_manifest(os.path.join(pdir, "_manifest.json"))
        if pm is None or pm.get("fingerprint") != p.get("fp", fp):
            return None
    return m


def _index_manifest_ok(out_dir: str, fp: str) -> dict | None:
    m = manifest_valid(os.path.join(out_dir, "index_manifest.json"), fp)
    if m and all(
        os.path.exists(
            os.path.join(
                segment_dir(os.path.join(out_dir, "index"), int(s["shard"]), int(s["bucket"])),
                s.get("file") or "terms.parquet",
            )
        )
        for s in m.get("segments", [])
    ):
        return m
    return None


def _merge_runs(runs_ds, index_dir: str, default_fp: str, *, bucket_size_docs: int,
                seg_fps: dict[int, str] | None = None):
    """groupby(term-shard, doc-range-bucket) merge of compressed SPIMI
    runs → segment files.  The two-key reduce is the head-term
    defense: one term's postings land on ``num_range_buckets``
    independent tasks instead of one."""
    writer = SegmentWriter(index_dir, default_fp, seg_fps)

    def attach_bucket(t: pa.Table) -> pa.Table:
        b = (t.column("first_doc").to_numpy() // bucket_size_docs).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def write_segment(g: pa.Table) -> pa.Table:
        return writer(g)

    return (
        runs_ds.map_batches(attach_bucket, batch_format="pyarrow")
        .groupby(["shard", "bucket"])
        .map_groups(write_segment, batch_format="pyarrow")
        .to_pandas()
    )


def _write_index_manifest(out_dir, fp, num_shards, bucket_size_docs, seg_rows,
                          docs_man, extra_segments: list[dict] | None = None) -> dict:
    atomic_write_json(
        os.path.join(out_dir, "stats.json"),
        {
            "n_docs": docs_man["n_docs"],
            "total_tokens": docs_man["total_tokens"],
            "avgdl": float(docs_man["avgdl"]) or 1.0,
            "num_shards": num_shards,
        },
    )
    segments = seg_rows.drop(columns=["seconds", "skipped"], errors="ignore").to_dict("records")
    segments += list(extra_segments or [])
    segments.sort(key=lambda s: (int(s["shard"]), int(s["bucket"])))
    return write_manifest(
        os.path.join(out_dir, "index_manifest.json"),
        stage="index",
        fingerprint=fp,
        extra={
            "num_shards": num_shards,
            "bucket_size_docs": int(bucket_size_docs),
            "n_terms": int(sum(s["n_terms"] for s in segments)),
            "n_postings": int(sum(s["n_postings"] for s in segments)),
            "index_bytes": int(sum(s["bytes"] for s in segments)),
            "segments": segments,
        },
    )


def build_docs(
    pages: str | list[str],
    out_dir: str,
    *,
    num_parts: int | None = None,
    num_shards: int | None = None,
    concurrency: int | None = None,
    batch_size: int = 256,
    use_actors: bool = False,
    resume: bool = True,
    partition_strategy=None,
) -> dict:
    """pages parquet → deduped docs table + per-part SPIMI run cache.

    Single streaming pass: extract → ``groupby(part)`` → per-part
    dedup/id/atomic write.  Part files are the checkpoint unit: a rerun
    recomputes extraction but rewrites only missing parts (the price of
    not staging a second full copy of the corpus — the reference makes
    the same call by re-reading a crashed record's source file).

    ``use_actors``: the extract stage's per-worker setup today is just
    compiled stdlib regexes (amortized by module import), so stateless
    tasks — zero pool-spawn cost on warm workers — are the default.
    Set True for an actor pool (the shape for a heavier extractor:
    charset models, ML scorers — SURVEY.md §2.3 ST4).
    """
    paths = _resolve_pages(pages)
    if partition_strategy is not None:
        num_parts = partition_strategy.num_parts
    else:
        num_parts = _auto_parts(paths, num_parts)
    num_shards = num_shards or num_parts
    # the strategy kwarg enters the fingerprint ONLY when a strategy
    # is in play, so hash builds keep their pre-round-5 fingerprints
    # and resume byte-identically (an interim revision briefly hashed
    # strategy="" unconditionally; builds made at that revision rebuild
    # once)
    fp_kw = ({"strategy": partition_strategy.fingerprint()}
             if partition_strategy is not None else {})
    fp = _job_fp(input_fingerprint(paths), num_parts=num_parts,
                 num_shards=num_shards, **fp_kw)
    if resume and (m := _docs_manifest_ok(out_dir, fp)):
        return m
    part_map = _fresh_part_map(paths, out_dir, partition_strategy)
    rows = _docs_pipeline(paths, out_dir, fp, num_parts, num_shards, batch_size,
                          use_actors, concurrency, part_map=part_map)
    rows.count()  # drive the stream; outputs land as side-effect files
    man = _collect_docs_manifest(out_dir, fp, num_parts, num_shards,
                                 strategy=partition_strategy)
    _clear_stale_ledger(out_dir, partition_strategy)
    return man


def read_docs(out_dir: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """docs table with the deterministic global ``doc_id`` attached.

    Partition discovery goes through the docs manifest (never a
    ``part=*`` glob), so stale directories from an earlier build with a
    different ``num_parts`` are ignored rather than read as phantom docs.
    """
    docs_dir = os.path.join(out_dir, "docs")
    man = load_manifest(os.path.join(out_dir, "docs_manifest.json"))
    if man is None:
        raise FileNotFoundError(f"no docs manifest under {out_dir}")
    files = [
        os.path.join(part_dir(docs_dir, int(p["part"])), "data.parquet")
        for p in man["parts"]
        if int(p["n_rows"]) > 0
    ]
    if not files:
        raise FileNotFoundError(f"no docs partitions under {docs_dir}")
    read_cols = sorted(set(columns) | {"part", "local_rank"}) if columns else None
    ds = ray.data.read_parquet(files, columns=read_cols)

    def attach(t: pa.Table) -> pa.Table:
        doc_id = (
            t.column("part").to_numpy().astype(np.int64) * PART_STRIDE
            + t.column("local_rank").to_numpy()
        )
        t = t.append_column("doc_id", pa.array(doc_id))
        if columns:
            return t.select(["doc_id", *columns])
        return t

    return ds.map_batches(attach, batch_format="pyarrow")


def load_stats(out_dir: str) -> dict:
    m = load_manifest(os.path.join(out_dir, "docs_manifest.json"))
    if m is None:
        raise FileNotFoundError(f"no docs manifest under {out_dir}")
    return {"n_docs": m["n_docs"], "total_tokens": m["total_tokens"], "avgdl": m["avgdl"]}


def build_index(
    out_dir: str,
    *,
    num_shards: int = 32,
    num_range_buckets: int | None = None,
    resume: bool = True,
) -> dict:
    """docs (already built) → compressed term-sharded, doc-range-
    segmented inverted index.

    The standalone/index-only rebuild path; ``build_all`` fuses this
    with the docs stage in one execution.
    """
    docs_man = load_manifest(os.path.join(out_dir, "docs_manifest.json"))
    if docs_man is None:
        raise FileNotFoundError("build_docs must run first")
    if docs_man.get("num_shards") not in (None, num_shards):
        raise ValueError(
            f"runs were encoded for num_shards={docs_man['num_shards']}; "
            "rebuild docs to change the shard count"
        )
    num_parts = int(docs_man["num_parts"])
    ppb, bucket_size_docs = _bucketing(num_parts, num_range_buckets)
    fp = _job_fp(docs_man["fingerprint"], num_shards=num_shards, ppb=ppb)
    if resume and (m := _index_manifest_ok(out_dir, fp)):
        return m
    seg_fps = _segment_fps(num_parts, ppb, num_shards, _part_fp_map(docs_man))
    runs_files = _manifest_runs_files(out_dir, docs_man)
    runs = ray.data.read_parquet(runs_files)
    seg_rows = _merge_runs(runs, os.path.join(out_dir, "index"), fp,
                           bucket_size_docs=bucket_size_docs, seg_fps=seg_fps)
    return _write_index_manifest(out_dir, fp, num_shards, bucket_size_docs,
                                 seg_rows, docs_man)


def build_all(
    pages: str | list[str],
    out_dir: str,
    *,
    num_parts: int | None = None,
    num_shards: int | None = None,
    num_range_buckets: int | None = None,
    concurrency: int | None = None,
    use_actors: bool = False,
    resume: bool = True,
    partition_strategy=None,
) -> dict:
    """Fused pipeline: pages → docs → index in ONE streaming execution.

    Returns the index manifest.  ``partition_strategy`` swaps the
    default url-hash partitioner for a stateful policy
    (``functions/partition.py`` — RemainingSpace / MaxRecordNumber,
    the reference's data-repository strategies); its ledger persists
    under ``out_dir`` and the strategy fingerprint enters the job
    fingerprint, so a policy change invalidates resume while a rerun
    under the same policy is a byte-identical no-op.
    """
    paths = _resolve_pages(pages)
    if partition_strategy is not None:
        num_parts = partition_strategy.num_parts
    else:
        num_parts = _auto_parts(paths, num_parts)
    num_shards = num_shards or num_parts
    ppb, bucket_size_docs = _bucketing(num_parts, num_range_buckets)
    fp_kw = ({"strategy": partition_strategy.fingerprint()}
             if partition_strategy is not None else {})
    docs_fp = _job_fp(input_fingerprint(paths), num_parts=num_parts,
                      num_shards=num_shards, **fp_kw)
    index_fp = _job_fp(docs_fp, num_shards=num_shards, ppb=ppb)

    docs_ok = _docs_manifest_ok(out_dir, docs_fp) if resume else None
    index_ok = _index_manifest_ok(out_dir, index_fp) if resume else None
    if docs_ok and index_ok:
        return index_ok
    if docs_ok:  # docs complete → index-only rebuild from disk
        return build_index(out_dir, num_shards=num_shards,
                           num_range_buckets=num_range_buckets, resume=resume)

    import time as _time

    t0 = _time.monotonic()
    part_map = _fresh_part_map(paths, out_dir, partition_strategy)
    seg_fps = _segment_fps(num_parts, ppb, num_shards,
                           {p: docs_fp for p in range(num_parts)})
    runs_rows = _docs_pipeline(paths, out_dir, docs_fp, num_parts, num_shards, 256,
                               use_actors, concurrency, part_map=part_map)
    t_docs = _time.monotonic()
    seg_rows = _merge_runs(runs_rows, os.path.join(out_dir, "index"), index_fp,
                           bucket_size_docs=bucket_size_docs, seg_fps=seg_fps)
    t_merge = _time.monotonic()
    docs_man = _collect_docs_manifest(out_dir, docs_fp, num_parts, num_shards,
                                      strategy=partition_strategy)
    # reconcile: the fused path seeded segment fps assuming every part
    # produces docs; if any part came up empty, the canonical fp (from
    # the collected manifest's part list — what build_index/apply_updates
    # recompute later) differs.  Patch those segment manifests so the
    # segment-level resume/skip invariant holds across paths (content is
    # identical — an absent part contributes no postings).
    canon = _segment_fps(num_parts, ppb, num_shards, _part_fp_map(docs_man))
    index_dir = os.path.join(out_dir, "index")
    for i, rec in seg_rows.iterrows():
        want = canon[int(rec["bucket"])]
        if rec["fp"] != want:
            man_path = os.path.join(
                segment_dir(index_dir, int(rec["shard"]), int(rec["bucket"])),
                "_manifest.json",
            )
            m = load_manifest(man_path)
            if m is not None:
                m["fingerprint"] = want
                atomic_write_json(man_path, m)
            seg_rows.at[i, "fp"] = want
    man = _write_index_manifest(out_dir, index_fp, num_shards, bucket_size_docs,
                                seg_rows, docs_man)
    _clear_stale_ledger(out_dir, partition_strategy)
    # per-stage metrics sidecar (NOT part of any fingerprint or the
    # live snapshot file set — a resumed no-op build leaves it alone)
    total_s = _time.monotonic() - t0
    atomic_write_json(os.path.join(out_dir, "metrics.json"), {
        "docs_stage_s": round(t_docs - t0, 3),
        "merge_stage_s": round(t_merge - t_docs, 3),
        "total_s": round(total_s, 3),
        "n_docs": int(docs_man["n_docs"]),
        "docs_per_sec": round(docs_man["n_docs"] / total_s, 1)
        if total_s > 0 else None,
        "n_parts": num_parts,
        "num_shards": num_shards,
    })
    return man


def build_text_index(
    ds_docs,
    out_dir: str,
    fingerprint: str,
    *,
    num_shards: int = 4,
    bucket_size: int = 1 << 18,
    resume: bool = True,
    with_positions: bool = False,
) -> dict:
    """Index a pre-extracted text table ``(doc_id:int64, text:string)``.

    Adapter for corpora that arrive as text (e.g. the driver's
    ``documents`` table) — skips extract/dedup, reuses the SPIMI
    shuffle.  Two streaming passes over the input (stats aggregate,
    then the run shuffle) — nothing materializes the corpus.
    ``bucket_size`` is the doc-range segment width (docs per bucket
    per shard); runs are split at bucket boundaries map-side.

    ONE tokenize pass: global stats come for free from the merge
    (``total_tokens = Σ segment cf``) plus a metadata-only row count —
    no separate stats scan of the corpus.
    """
    fp_params = {"num_shards": num_shards, "bucket": bucket_size}
    if with_positions:  # keep default-build fingerprints byte-stable
        fp_params["positions"] = True
    fp = _job_fp(fingerprint, **fp_params)
    man_path = os.path.join(out_dir, "index_manifest.json")
    if resume and (m := manifest_valid(man_path, fp)):
        return m

    n_docs = ds_docs.count()  # parquet-metadata count: no data scan
    runs = ds_docs.map_batches(
        TokenizeEncodeRuns(num_shards, bucket_size=bucket_size,
                           with_positions=with_positions),
        batch_format="pyarrow",
        batch_size=1024,
    )
    seg_rows = _merge_runs(runs, os.path.join(out_dir, "index"), fp,
                           bucket_size_docs=bucket_size)
    total_tokens = int(seg_rows["sum_cf"].sum())
    atomic_write_json(
        os.path.join(out_dir, "stats.json"),
        {"n_docs": n_docs, "total_tokens": total_tokens,
         "avgdl": (total_tokens / n_docs) if n_docs else 1.0, "num_shards": num_shards},
    )
    return write_manifest(
        man_path,
        stage="text_index",
        fingerprint=fp,
        extra={
            "num_shards": num_shards,
            "bucket_size_docs": int(bucket_size),
            "n_terms": int(seg_rows["n_terms"].sum()),
            "n_postings": int(seg_rows["n_postings"].sum()),
            "segments": seg_rows.drop(columns=["seconds", "skipped"], errors="ignore").to_dict("records"),
        },
    )
