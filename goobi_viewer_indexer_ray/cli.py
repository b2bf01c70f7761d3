"""Job entry points (`ray job submit -- python -m goobi_viewer_indexer_ray.cli ...`).

The only module that owns a Ray session (besides bench.py and the test
fixture): the driver contract in ``__ray_entry__.py`` and the library
never call ``ray.init``.

Commands::

    build  --pages DIR --out DIR [--num-parts N] [--num-shards N]
    update --out DIR [--delta DIR] [--delete URL ...]
    query  --out DIR --q "terms" [--k K] [--exact]
    bench-corpus --out DIR --n N [--seed S]
    optimize --out DIR
    delete-query --out DIR --must "terms" [--must-not "terms"]
    check-index --out DIR [--strict]
    stats --out DIR
    backup --out DIR --dest DIR
    restore --snapshot DIR --out DIR
    watch --out DIR --pages DIR [--interval S] [--max-polls N] [--config F]
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="goobi_viewer_indexer_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="pages parquet → docs + inverted index")
    b.add_argument("--pages", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--num-parts", type=int, default=None,
                   help="default: derived from input bytes (128 MiB/part)")
    b.add_argument("--num-shards", type=int, default=None)
    b.add_argument("--num-range-buckets", type=int, default=None,
                   help="doc-range segments per shard (default 8)")
    b.add_argument("--no-resume", action="store_true")

    u = sub.add_parser("update", help="incremental upsert / delete")
    u.add_argument("--out", required=True)
    u.add_argument("--delta", default=None)
    u.add_argument("--delete", action="append", default=[])

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--out", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--exact", action="store_true")

    c = sub.add_parser("bench-corpus", help="synthesize a deterministic pages corpus")
    c.add_argument("--out", required=True)
    c.add_argument("--n", type=int, required=True)
    c.add_argument("--seed", type=int, default=42)

    o = sub.add_parser("optimize", help="forceMerge(k) segment compaction")
    o.add_argument("--out", required=True)
    o.add_argument("--max-segments", type=int, default=1,
                   help="target doc-range segments per shard (default 1)")

    dq = sub.add_parser("delete-query", help="delete every doc matching a boolean query")
    dq.add_argument("--out", required=True)
    dq.add_argument("--must", action="append", default=[], required=True)
    dq.add_argument("--must-not", action="append", default=[])

    st = sub.add_parser("stats", help="index stats JSON (docs, terms, "
                        "postings, per-shard segment sizes)")
    st.add_argument("--out", required=True)

    bk = sub.add_parser("backup", help="snapshot the manifest-pinned "
                        "live file set (Solr replication-handler backup)")
    bk.add_argument("--out", required=True)
    bk.add_argument("--dest", required=True)

    rs = sub.add_parser("restore", help="restore a snapshot into a live dir")
    rs.add_argument("--snapshot", required=True)
    rs.add_argument("--out", required=True)

    ci = sub.add_parser("check-index", help="CheckIndex-style integrity "
                        "audit of every segment + manifest totals")
    ci.add_argument("--out", required=True)
    ci.add_argument("--strict", action="store_true",
                    help="exit non-zero on any failed invariant")

    w = sub.add_parser("watch", help="hotfolder poll loop: snapshot-diff "
                       "an input dir, route new/changed/deleted records")
    w.add_argument("--out", required=True)
    w.add_argument("--pages", required=True)
    w.add_argument("--interval", type=float, default=5.0)
    w.add_argument("--max-polls", type=int, default=None,
                   help="stop after N ticks (default: run forever)")
    w.add_argument("--auto-optimize", action="store_true")
    w.add_argument("--config", default=None,
                   help="watch config JSON, hot-reloaded every tick "
                        "(interval_s, auto_optimize, rules[] with "
                        "applies_to globs)")

    args = ap.parse_args(argv)
    ray = _init_ray()
    try:
        if args.cmd == "build":
            from .pipelines.build import build_all

            m = build_all(args.pages, args.out, num_parts=args.num_parts,
                          num_shards=args.num_shards,
                          num_range_buckets=args.num_range_buckets,
                          resume=not args.no_resume)
            print(json.dumps({"n_terms": m["n_terms"], "n_postings": m["n_postings"],
                              "index_bytes": m["index_bytes"]}))
        elif args.cmd == "update":
            from .pipelines.updates import apply_updates

            m = apply_updates(args.out, args.delta, args.delete)
            print(json.dumps({"n_terms": m["n_terms"], "n_postings": m["n_postings"]}))
        elif args.cmd == "query":
            from .pipelines.query import LocalIndex, topk_exact, topk_wand

            idx = LocalIndex(args.out)
            scorer = topk_exact if args.exact else topk_wand
            d, s = scorer(idx, args.q, args.k)
            print(json.dumps({"hits": [
                {"rank": i + 1, "doc_id": int(di), "score": float(si)}
                for i, (di, si) in enumerate(zip(d, s))
            ]}))
        elif args.cmd == "bench-corpus":
            from .sources.corpus import write_pages

            paths = write_pages(args.out, args.n, seed=args.seed)
            print(json.dumps({"files": len(paths), "rows": args.n}))
        elif args.cmd == "optimize":
            from .stages.optimize import optimize_index

            m = optimize_index(args.out,
                               max_segments_per_shard=args.max_segments)
            print(json.dumps({"segments": len(m["segments"]),
                              "n_terms": m["n_terms"],
                              "index_bytes": m["index_bytes"]}))
        elif args.cmd == "delete-query":
            from .pipelines.updates import delete_by_query

            m, n = delete_by_query(args.out, must=args.must,
                                   must_not=args.must_not)
            print(json.dumps({"n_deleted": n, "n_terms": m.get("n_terms")}))
        elif args.cmd == "stats":
            import os as _os

            from .state.manifest import load_manifest

            with open(_os.path.join(args.out, "stats.json")) as f:
                stats = json.load(f)
            iman = load_manifest(
                _os.path.join(args.out, "index_manifest.json")) or {}
            shards = {}
            for s_ in iman.get("segments", []):
                k = int(s_["shard"])
                shards[k] = shards.get(k, 0) + int(s_.get("bytes", 0))
            print(json.dumps({
                "n_docs": stats.get("n_docs"),
                "avgdl": stats.get("avgdl"),
                "n_terms": iman.get("n_terms"),
                "n_postings": iman.get("n_postings"),
                "index_bytes": iman.get("index_bytes"),
                "segments": len(iman.get("segments", [])),
                "shard_bytes": shards,
            }))
        elif args.cmd == "backup":
            from .pipelines.backup import backup_index

            m = backup_index(args.out, args.dest)
            print(json.dumps({"files": len(m["files"]),
                              "bytes": m["bytes"]}))
        elif args.cmd == "restore":
            from .pipelines.backup import restore_index

            m = restore_index(args.snapshot, args.out)
            print(json.dumps({"files": len(m["files"])}))
        elif args.cmd == "check-index":
            from .pipelines.check import check_index

            r = check_index(args.out, strict=args.strict)
            print(json.dumps({"segments": r["segments"],
                              "checks": r["checks"],
                              "failures": r["failures"][:20],
                              "ok": not r["failures"]}))
        elif args.cmd == "watch":
            from .pipelines.watch import watch

            for r in watch(args.out, args.pages,
                           interval_s=args.interval,
                           max_polls=args.max_polls,
                           auto_optimize=args.auto_optimize,
                           config_path=args.config):
                print(json.dumps(r), flush=True)
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
