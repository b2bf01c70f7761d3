"""Index-build pipelines (SURVEY.md §3.4 lifecycle).

Stage graph (each stage checkpointed by a manifest; rerunning the job
skips completed stages and, inside the docs stage, completed
partitions — the hotfolder-file-state-machine analog, SURVEY.md §4.1):

    pages parquet ──extract (actor pool)──► docs_raw/part=*       [stage 1]
    docs_raw ──groupby(part): dedup+rank──► docs/part=*/data.parquet
              └─► docs_manifest.json (N, avgdl, per-part offsets)  [stage 2]
    docs ──tokenize──► (term, doc_id, tf, dl, shard, bucket)
        ──groupby(shard,bucket): encode runs──► compressed runs
        ──groupby(shard): concat runs──► index/shard=*/terms.parquet
              └─► index_manifest.json + stats.json                 [stage 3]

Scale notes (sized for ~10^12 docs / 100 TB on a multi-node cluster,
tested single-node):

- ``html`` never leaves stage 1; everything downstream is text/ints.
- the only all-to-all exchanges are the two groupbys of stage 3; the
  second one moves *compressed runs* (≈5–10× smaller than postings).
- head-term skew is bounded by ``bucket_bits`` (doc-range salting):
  no reducer ever holds more than one doc-range's postings for one
  term shard (SURVEY.md §4.1).
- ``num_parts`` / ``num_shards`` are the deployment knobs: at cluster
  scale use e.g. 65 536 parts / 16 384 shards; defaults here are
  single-node-sized.
"""

from __future__ import annotations

import glob
import os
from hashlib import blake2b

import numpy as np
import pyarrow as pa

import ray.data

from .. import ENGINE_SPEC_VERSION
from ..stages.docs_writer import DocsPartWriter, part_dir
from ..stages.extract import ExtractPages
from ..stages.index_merge import EncodeRuns, ShardWriter
from ..stages.postings import TokenizePostings
from ..state.manifest import (
    atomic_write_json,
    input_fingerprint,
    load_manifest,
    manifest_valid,
    write_manifest,
)

__all__ = ["build_docs", "build_index", "build_all", "read_docs", "load_stats"]


def _cpus() -> int:
    import ray

    try:
        return max(1, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


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


def build_docs(
    pages: str | list[str],
    out_dir: str,
    *,
    num_parts: int = 16,
    concurrency: int | None = None,
    batch_size: int = 128,
    resume: bool = True,
) -> dict:
    """pages parquet → deduped docs table with deterministic ids.

    Returns the docs manifest (also persisted at
    ``out_dir/docs_manifest.json``).
    """
    paths = _resolve_pages(pages)
    fp = _job_fp(input_fingerprint(paths), num_parts=num_parts)
    raw_dir = os.path.join(out_dir, "docs_raw")
    docs_dir = os.path.join(out_dir, "docs")
    raw_man_path = os.path.join(out_dir, "docs_raw_manifest.json")
    docs_man_path = os.path.join(out_dir, "docs_manifest.json")

    if resume and (m := manifest_valid(docs_man_path, fp)):
        return m

    # ---- stage 1: extract (actor pool), checkpointed wholesale ----
    if not (resume and manifest_valid(raw_man_path, fp)):
        import shutil

        shutil.rmtree(raw_dir, ignore_errors=True)
        ds = ray.data.read_parquet(paths, columns=["url", "warc_ts", "html", "lang"])
        pool = concurrency or max(1, _cpus() - 2)
        ds = ds.map_batches(
            ExtractPages,
            fn_constructor_kwargs={"num_parts": num_parts},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=pool,
            num_cpus=1,
        )
        ds.write_parquet(raw_dir, partition_cols=["part"])
        write_manifest(raw_man_path, stage="extract", fingerprint=fp)

    # ---- stage 2: per-part dedup + rank, partition-level resume ----
    present = sorted(
        int(d.split("=")[1]) for d in os.listdir(raw_dir) if d.startswith("part=")
    )
    done: dict[int, dict] = {}
    if resume:
        for p in present:
            pm = load_manifest(os.path.join(part_dir(docs_dir, p), "_manifest.json"))
            if (
                pm
                and pm.get("fingerprint") == fp
                and os.path.exists(os.path.join(part_dir(docs_dir, p), "data.parquet"))
            ):
                done[p] = pm
    todo = [p for p in present if p not in done]

    rows: list[dict] = [
        {"part": p, "n_rows": m["n_rows"], "sum_dl": m["sum_dl"],
         "n_dups_removed": m["n_dups_removed"], "skipped": True}
        for p, m in done.items()
    ]
    if todo:
        todo_files = []
        for p in todo:
            todo_files += sorted(glob.glob(os.path.join(raw_dir, f"part={p}", "*.parquet")))
        ds2 = ray.data.read_parquet(todo_files)
        # ensure `part` exists regardless of whether the writer kept the
        # partition column in the data files or hoisted it into the dir
        # name — re-derivable from url (same pure function) either way.
        from ..functions.hashing import part_array

        def with_part(t: pa.Table) -> pa.Table:
            if "part" in t.column_names:
                import pyarrow.compute as pc

                i = t.column_names.index("part")
                return t.set_column(i, "part", pc.cast(t.column("part"), pa.int32()))
            return t.append_column(
                "part", pa.array(part_array(t.column("url").to_pylist(), num_parts))
            )

        ds2 = ds2.map_batches(with_part, batch_format="pyarrow")
        writer = DocsPartWriter(docs_dir, fp)

        def write_docs_part(g: pa.Table) -> pa.Table:
            return writer(g)

        out = ds2.groupby("part").map_groups(write_docs_part, batch_format="pyarrow")
        rows += out.to_pandas().to_dict("records")

    rows.sort(key=lambda r: r["part"])
    offsets, acc = {}, 0
    for r in rows:
        offsets[int(r["part"])] = acc
        acc += int(r["n_rows"])
    n_docs = acc
    total_tokens = int(sum(r["sum_dl"] for r in rows))
    manifest = write_manifest(
        docs_man_path,
        stage="docs",
        fingerprint=fp,
        extra={
            "num_parts": num_parts,
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "n_dups_removed": int(sum(r["n_dups_removed"] for r in rows)),
            "parts": [
                {"part": int(r["part"]), "n_rows": int(r["n_rows"]),
                 "offset": offsets[int(r["part"])]}
                for r in rows
            ],
        },
    )
    return manifest


def read_docs(out_dir: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """docs table with the deterministic global ``doc_id`` attached."""
    manifest = load_manifest(os.path.join(out_dir, "docs_manifest.json"))
    if manifest is None:
        raise FileNotFoundError(f"no docs manifest under {out_dir}")
    offsets = {p["part"]: p["offset"] for p in manifest["parts"]}
    docs_dir = os.path.join(out_dir, "docs")
    files = sorted(glob.glob(os.path.join(docs_dir, "part=*", "data.parquet")))
    need = set(columns or [])
    read_cols = sorted(need | {"part", "local_rank"}) if columns else None
    ds = ray.data.read_parquet(files, columns=read_cols)

    def attach(t: pa.Table) -> pa.Table:
        part = t.column("part").to_numpy()
        off = np.array([offsets[int(p)] for p in np.unique(part)], dtype=np.int64)
        lookup = dict(zip([int(p) for p in np.unique(part)], off))
        doc_id = np.fromiter((lookup[int(p)] for p in part), np.int64, len(part)) + t.column(
            "local_rank"
        ).to_numpy()
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
    num_shards: int = 16,
    bucket_bits: int = 16,
    resume: bool = True,
) -> dict:
    """docs → compressed term-sharded inverted index (the A8 shuffle)."""
    docs_man = load_manifest(os.path.join(out_dir, "docs_manifest.json"))
    if docs_man is None:
        raise FileNotFoundError("build_docs must run first")
    fp = _job_fp(docs_man["fingerprint"], num_shards=num_shards, bucket_bits=bucket_bits)
    index_dir = os.path.join(out_dir, "index")
    man_path = os.path.join(out_dir, "index_manifest.json")
    if resume and (m := manifest_valid(man_path, fp)):
        from ..stages.index_merge import shard_dir

        if all(
            os.path.exists(os.path.join(shard_dir(index_dir, int(s["shard"])), "terms.parquet"))
            for s in m.get("shards", [])
        ):
            return m

    avgdl = float(docs_man["avgdl"]) or 1.0
    docs = read_docs(out_dir, columns=["text", "doc_len"])
    postings = docs.map_batches(
        TokenizePostings(num_shards, bucket_bits), batch_format="pyarrow"
    )
    encoder = EncodeRuns(avgdl)
    shard_writer = ShardWriter(index_dir, fp)

    def encode_runs(g: pa.Table) -> pa.Table:
        return encoder(g)

    def write_shard(g: pa.Table) -> pa.Table:
        return shard_writer(g)

    runs = postings.groupby(["shard", "bucket"]).map_groups(
        encode_runs, batch_format="pyarrow"
    )
    shard_rows = (
        runs.groupby("shard").map_groups(write_shard, batch_format="pyarrow").to_pandas()
    )
    stats = {
        "n_docs": docs_man["n_docs"],
        "total_tokens": docs_man["total_tokens"],
        "avgdl": avgdl,
        "num_shards": num_shards,
    }
    atomic_write_json(os.path.join(out_dir, "stats.json"), stats)
    manifest = write_manifest(
        man_path,
        stage="index",
        fingerprint=fp,
        extra={
            "num_shards": num_shards,
            "bucket_bits": bucket_bits,
            "n_terms": int(shard_rows["n_terms"].sum()),
            "n_postings": int(shard_rows["n_postings"].sum()),
            "index_bytes": int(shard_rows["bytes"].sum()),
            "shards": shard_rows.drop(columns=["seconds"]).to_dict("records"),
        },
    )
    return manifest


def build_text_index(
    ds_docs,
    out_dir: str,
    fingerprint: str,
    *,
    num_shards: int = 4,
    bucket_bits: int = 10,
    resume: bool = True,
) -> dict:
    """Index a pre-extracted text table ``(doc_id:int64, text:string)``.

    The adapter for corpora that arrive as text rather than HTML (e.g.
    the driver's ``documents`` table) — skips the extract/dedup stages
    and reuses the tokenize → salted-merge shuffle.  The input is
    materialized once for the stats pass; callers use this for
    small/medium side corpora — the full pages pipeline (build_docs +
    build_index) is the streaming 100 TB path.
    """
    from ray.data.aggregate import Count, Sum

    from ..functions.tokenize import tokenize as _tok

    fp = _job_fp(fingerprint, num_shards=num_shards, bucket_bits=bucket_bits)
    man_path = os.path.join(out_dir, "index_manifest.json")
    if resume and (m := manifest_valid(man_path, fp)):
        return m

    def with_len(t: pa.Table) -> pa.Table:
        lens = [len(_tok(x)) for x in t.column("text").to_pylist()]
        return t.append_column("doc_len", pa.array(lens, pa.int32()))

    docs = ds_docs.map_batches(with_len, batch_format="pyarrow").materialize()
    agg = docs.aggregate(Count(), Sum("doc_len", alias_name="total_tokens"))
    n_docs = int(agg["count()"])
    total_tokens = int(agg["total_tokens"])
    avgdl = (total_tokens / n_docs) if n_docs else 1.0

    atomic_write_json(
        os.path.join(out_dir, "stats.json"),
        {"n_docs": n_docs, "total_tokens": total_tokens, "avgdl": avgdl,
         "num_shards": num_shards},
    )
    index_dir = os.path.join(out_dir, "index")
    postings = docs.map_batches(
        TokenizePostings(num_shards, bucket_bits), batch_format="pyarrow"
    )
    encoder = EncodeRuns(avgdl)
    shard_writer = ShardWriter(index_dir, fp)

    def encode_runs(g: pa.Table) -> pa.Table:
        return encoder(g)

    def write_shard(g: pa.Table) -> pa.Table:
        return shard_writer(g)

    runs = postings.groupby(["shard", "bucket"]).map_groups(encode_runs, batch_format="pyarrow")
    shard_rows = runs.groupby("shard").map_groups(write_shard, batch_format="pyarrow").to_pandas()
    return write_manifest(
        man_path,
        stage="text_index",
        fingerprint=fp,
        extra={
            "num_shards": num_shards,
            "bucket_bits": bucket_bits,
            "n_terms": int(shard_rows["n_terms"].sum()),
            "n_postings": int(shard_rows["n_postings"].sum()),
            "shards": shard_rows.drop(columns=["seconds"]).to_dict("records"),
        },
    )


def build_all(
    pages: str | list[str],
    out_dir: str,
    *,
    num_parts: int = 16,
    num_shards: int = 16,
    bucket_bits: int = 16,
    concurrency: int | None = None,
    resume: bool = True,
) -> dict:
    """Full pipeline: pages → docs → index.  Returns the index manifest."""
    build_docs(pages, out_dir, num_parts=num_parts, concurrency=concurrency, resume=resume)
    return build_index(out_dir, num_shards=num_shards, bucket_bits=bucket_bits, resume=resume)
