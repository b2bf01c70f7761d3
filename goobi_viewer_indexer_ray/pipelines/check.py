"""Index integrity validation — the Lucene ``CheckIndex`` analog.

The reference stack leans on Lucene's ``CheckIndex`` (and Solr's
``/admin/segments``) to audit a possibly-damaged index before serving
it; this module is the same audit over the engine's parquet segment
format (``index/shard=S/seg=B/terms.parquet``, schema
``stages/index_merge.py:TERMS_SCHEMA``).

Checked invariants, per segment:

- terms strictly ascending and unique;
- every term hash-routes to its segment's shard
  (``functions/hashing.py:shard_for``);
- ``df == Σ block.n == #decoded docs``; ``cf == Σ decoded tfs``;
- per block: decoded docids strictly ascending; ``first_doc`` /
  ``max_doc`` / ``max_tf`` / ``min_dl`` / ``n`` all match the decoded
  payload; consecutive blocks doc-disjoint and ascending;
- every docid lies in the segment's doc-range bucket
  (``doc // bucket_size_docs == bucket``);
- document length consistency: a doc appearing under many terms
  carries the SAME dl everywhere in the segment;
- segment totals match the index manifest (``n_terms``,
  ``n_postings``, ``sum_cf``).

Cross-file: Σ segment totals == manifest totals, and
``stats.json.n_docs`` / ``avgdl`` agree with ``docs_manifest.json``.

Scale shape: segments are independent, so the audit is one
``from_items(segments) → map_batches`` fan-out (each task decodes one
segment with the same codec the searcher uses) plus a constant-size
driver reduce of failure strings — no segment's postings ever leave
its task.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import decode_varints
from ..functions.hashing import shard_for
from ..stages.index_merge import segment_paths

__all__ = ["check_index", "check_segment"]


def check_segment(path: str, shard: int, bucket: int, *,
                  num_shards: int, bucket_size: int,
                  seg_meta: dict | None = None) -> tuple[int, list[str]]:
    """Audit ONE segment file.  Returns (checks_run, failures)."""
    tag = f"shard={shard}/seg={bucket}"
    checks = 0
    fails: list[str] = []

    def ck(ok: bool, msg: str):
        nonlocal checks
        checks += 1
        if not ok:
            fails.append(f"{tag}: {msg}")

    t = pq.read_table(path)
    terms = t.column("term").to_pylist()
    df = t.column("df").to_numpy()
    cf = t.column("cf").to_numpy()
    blocks = t.column("blocks").combine_chunks()

    ck(all(terms[i] < terms[i + 1] for i in range(len(terms) - 1)),
       "terms not strictly sorted")
    bad_shard = [x for x in terms if shard_for(x, num_shards) != shard]
    ck(not bad_shard, f"terms routed to wrong shard: {bad_shard[:3]}")

    n_postings = 0
    sum_cf = 0
    dl_of: dict[int, int] = {}
    lo, hi = bucket * bucket_size, (bucket + 1) * bucket_size
    for row in range(len(terms)):
        blist = blocks[row].as_py()
        row_docs = []
        row_tfs = []
        prev_max = -1
        for b in blist:
            docs = np.cumsum(decode_varints(b["docs"]).astype(np.int64))
            tfs = decode_varints(b["tfs"]).astype(np.int64)
            dls = decode_varints(b["dls"]).astype(np.int64)
            ck(docs.size == b["n"] and tfs.size == b["n"]
               and dls.size == b["n"],
               f"term {terms[row]!r}: block n mismatch")
            if docs.size:
                ck(bool(np.all(np.diff(docs) > 0)),
                   f"term {terms[row]!r}: docids not strictly ascending")
                ck(int(docs[0]) == b["first_doc"]
                   and int(docs[-1]) == b["max_doc"],
                   f"term {terms[row]!r}: first/max_doc mismatch")
                ck(int(tfs.max()) == b["max_tf"],
                   f"term {terms[row]!r}: max_tf mismatch")
                ck(int(dls.min()) == b["min_dl"],
                   f"term {terms[row]!r}: min_dl mismatch")
                ck(int(docs[0]) > prev_max,
                   f"term {terms[row]!r}: blocks overlap / out of order")
                prev_max = int(docs[-1])
                ck(lo <= int(docs[0]) and int(docs[-1]) < hi,
                   f"term {terms[row]!r}: doc outside bucket range")
            row_docs.append(docs)
            row_tfs.append(tfs)
            for d_, l_ in zip(docs.tolist(), dls.tolist()):
                seen = dl_of.setdefault(d_, l_)
                if seen != l_:
                    ck(False, f"doc {d_}: inconsistent dl {seen} vs {l_}")
        nd = int(sum(d.size for d in row_docs))
        ck(nd == int(df[row]), f"term {terms[row]!r}: df {df[row]} != {nd}")
        ck(int(sum(int(x.sum()) for x in row_tfs)) == int(cf[row]),
           f"term {terms[row]!r}: cf mismatch")
        n_postings += nd
        sum_cf += int(cf[row])

    if seg_meta is not None:
        ck(len(terms) == int(seg_meta.get("n_terms", len(terms))),
           f"manifest n_terms {seg_meta.get('n_terms')} != {len(terms)}")
        ck(n_postings == int(seg_meta.get("n_postings", n_postings)),
           f"manifest n_postings {seg_meta.get('n_postings')} != {n_postings}")
        ck(sum_cf == int(seg_meta.get("sum_cf", sum_cf)),
           f"manifest sum_cf {seg_meta.get('sum_cf')} != {sum_cf}")
    return checks, fails


def check_index(out_dir: str, *, strict: bool = False) -> dict:
    """Audit a whole index directory.  Returns a report dict
    ``{segments, checks, failures}``; with ``strict=True`` raises
    ``ValueError`` listing the failures instead of returning them."""
    import ray.data

    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    man_path = os.path.join(out_dir, "index_manifest.json")
    man = {}
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
    num_shards = int(man.get("num_shards", stats["num_shards"]))
    bucket_size = int(man.get("bucket_size_docs", 2**63 - 1))
    seg_meta = {(int(s["shard"]), int(s["bucket"])): s
                for s in man.get("segments", [])}

    segs = segment_paths(os.path.join(out_dir, "index"))
    items = [{"path": s["path"], "shard": int(s["shard"]),
              "bucket": int(s["bucket"])} for s in segs]

    def audit(batch: pa.Table) -> pa.Table:
        rows_c, rows_f = [], []
        for i in range(batch.num_rows):
            p = batch.column("path")[i].as_py()
            sh = batch.column("shard")[i].as_py()
            bu = batch.column("bucket")[i].as_py()
            c, f = check_segment(p, sh, bu, num_shards=num_shards,
                                 bucket_size=bucket_size,
                                 seg_meta=seg_meta.get((sh, bu)))
            rows_c.append(c)
            rows_f.append(json.dumps(f))
        return pa.table({"checks": pa.array(rows_c, pa.int64()),
                         "fails": pa.array(rows_f, pa.string())})

    out = (ray.data.from_items(items)
           .map_batches(audit, batch_format="pyarrow")
           .take_all())
    checks = sum(r["checks"] for r in out)
    failures: list[str] = []
    for r in out:
        failures.extend(json.loads(r["fails"]))

    # cross-file totals (driver-side, constant size)
    if man.get("segments"):
        checks += 2
        if sum(int(s["n_terms"]) for s in man["segments"]) != int(man["n_terms"]):
            failures.append("manifest: Σ segment n_terms != n_terms")
        if sum(int(s["n_postings"]) for s in man["segments"]) != int(man["n_postings"]):
            failures.append("manifest: Σ segment n_postings != n_postings")
    docs_man_path = os.path.join(out_dir, "docs_manifest.json")
    if os.path.exists(docs_man_path):
        with open(docs_man_path) as f:
            dman = json.load(f)
        checks += 2
        if int(dman["n_docs"]) != int(stats["n_docs"]):
            failures.append("stats.n_docs != docs_manifest.n_docs")
        if abs(float(dman["avgdl"]) - float(stats["avgdl"])) > 1e-9:
            failures.append("stats.avgdl != docs_manifest.avgdl")

    report = {"segments": len(items), "checks": int(checks),
              "failures": failures}
    if strict and failures:
        raise ValueError("check_index failed: " + "; ".join(failures[:10]))
    return report
