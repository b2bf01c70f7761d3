"""Web link-graph operators — PageRank + anchor-text aggregation.

The reference indexes web-published records one at a time and never
sees the cross-document LINK structure; a web-scale corpus pipeline
needs it for crawl prioritization and quality weighting (the classic
companion signals to the per-document quality scores in
``stages/text_ops.py``).  Two operators over a flat ``(src, dst)``
edge table:

- :func:`pagerank` — INTEGER FIXED-POINT PageRank.  All arithmetic is
  int64 with floor division, so the result is bit-exact across any
  execution order / partitioning — and exactly replicable in SQL
  (``//``), which is what lets the catalog entry carry a real
  value-hash oracle instead of a float-tolerance check.  Per node
  ``v`` with total node count ``n`` and scale ``S``::

      pr_0(v)   = S
      share(u)  = pr_i(u) // out_deg(u)            (out_deg > 0)
      dang_i    = Σ pr_i(u) over out_deg(u) == 0   (dangling mass)
      pr_{i+1}(v) = (15*S)//100
                  + (85 * (Σ_in share(u) + dang_i // n)) // 100

  (the standard d=0.85 damped walk with dangling redistribution,
  quantized to 1/S units; floor-quantization error is ≤ iters·n/S of
  total mass — irrelevant for ranking at S = 1e9).

- :func:`anchor_stats` — per-target in-link aggregation: in-degree,
  distinct source hosts, and the modal anchor text (min-anchor
  tiebreak).  The web-search signal the reference's UGC/annotation
  join (``stages/ugc.py``) is to a DAM corpus.

Scale shape
-----------

``pagerank`` is power iteration = ``iters`` rounds of one
hash-partitioned ``Dataset.join`` (edges ⋈ ranks on ``src``) + one
``groupby(dst).sum`` — the same loop shape as
``stages/cluster.py:connected_components`` / ``stages/hierarchy.py``
peeling, with the edge table re-used every round (materialized once).
The dangling mass is one scalar fold per round (O(1) to the driver).
A ≤``small_graph_threshold``-edge fast path runs the identical
recurrence as vectorized ``np.add.at`` scatter-adds on the driver;
pytest pins fast == distributed.

``anchor_stats`` pre-aggregates per batch (map-side combine: one row
per (dst, anchor) per batch, hosts folded into a bitmask), then ONE
``groupby(dst).map_groups`` finalizes — groups are per-page in-link
summaries, already tiny after the combine.  Hot targets (a site's
front page) are the documented skew caveat; the partial combine is
what keeps their group rows bounded by (#anchors × #batches), not
in-degree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["anchor_stats", "connected_components", "hits", "kcore",
           "label_propagation", "opic", "pagerank", "synth_edges",
           "triangles", "trustrank"]


# --------------------------------------------------------------- synth

def synth_edges(doc_ids: np.ndarray, n_docs: int) -> pa.Table:
    """Deterministic link graph over contiguous doc ids (the catalog's
    test fixture, mirroring ``q_media_dims``-style key arithmetic):
    doc ``u`` links to ``(7u + j + 1) % n`` for ``j in [0, u % 4)``,
    self-links dropped — so out-degree varies 0..4 and ``u % 4 == 0``
    docs are DANGLING (the PageRank edge case worth testing).  Anchor
    text for an edge is ``'a' + str((src + dst) % 20)`` and the source
    host is ``src % 10``."""
    u = np.asarray(doc_ids, np.int64)
    reps = u % 4
    src = np.repeat(u, reps)
    j = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(reps)[:-1])), reps
    )
    dst = (7 * src + j + 1) % n_docs
    keep = dst != src
    src, dst = src[keep], dst[keep]
    anchor = np.char.add("a", ((src + dst) % 20).astype("U2"))
    return pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "anchor": pa.array(anchor.tolist(), pa.string()),
        }
    )


# ------------------------------------------------------------ pagerank

def _pagerank_numpy(
    nodes: np.ndarray, src: np.ndarray, dst: np.ndarray,
    *, iters: int, scale: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Driver fast path: the identical integer recurrence, vectorized.
    Node ids may be sparse — positions come from searchsorted over the
    sorted node array."""
    order = np.argsort(nodes, kind="stable")
    nid = nodes[order]
    n = nid.size
    si = np.searchsorted(nid, src)
    di = np.searchsorted(nid, dst)
    out_deg = np.bincount(si, minlength=n).astype(np.int64)
    in_deg = np.bincount(di, minlength=n).astype(np.int64)
    pr = np.full(n, scale, np.int64)
    teleport = (15 * scale) // 100
    linked = out_deg > 0
    for _ in range(iters):
        share = np.zeros(n, np.int64)
        share[linked] = pr[linked] // out_deg[linked]
        insum = np.zeros(n, np.int64)
        np.add.at(insum, di, share[si])
        de = int(pr[~linked].sum()) // n
        pr = teleport + (85 * (insum + de)) // 100
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    # un-sort back to the caller's node order
    return pr[inv], out_deg[inv], in_deg[inv]


def pagerank(
    nodes,
    edges,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
    scale: int = 10**9,
    method: str = "auto",
    small_graph_threshold: int = 2_000_000,
    num_partitions: int = 16,
    checkpoint_dir: str | None = None,
):
    """Integer fixed-point PageRank over ``edges`` (Datasets in, Dataset
    out: ``(node, pr, out_deg, in_deg)``).  ``method`` = ``"auto"``
    (fast path when #edges + #nodes fits the threshold), ``"numpy"``,
    or ``"distributed"`` (force the join loop — what a 100 TB edge set
    uses; each round is one edges ⋈ ranks hash join + one
    ``groupby.sum``, both partitioned the same way).

    ``checkpoint_dir`` (distributed path only): after each round the
    state is written to ``iter=<i>/`` parquet with a completion marker,
    and a fresh call with the same dir RESUMES from the newest complete
    round — bit-exact because the recurrence is integer (a resumed run
    is indistinguishable from an uninterrupted one; pytest pins it).
    On a multi-day 100 TB power iteration this is the difference
    between losing a node and losing one round."""
    import ray

    n_edges = edges.count()
    n_nodes = nodes.count()
    if method not in ("auto", "numpy", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    if checkpoint_dir is not None and method == "numpy":
        raise ValueError("checkpoint_dir requires the distributed path")
    if method == "numpy" or (
        method == "auto"
        and checkpoint_dir is None
        and n_edges + n_nodes <= small_graph_threshold
    ):
        nt = nodes.select_columns([node_col]).to_arrow_refs()
        et = edges.select_columns([src_col, dst_col]).to_arrow_refs()
        nid = pa.concat_tables(ray.get(nt)).column(node_col).to_numpy()
        etab = pa.concat_tables(ray.get(et))
        pr, od, idg = _pagerank_numpy(
            nid,
            etab.column(src_col).to_numpy(),
            etab.column(dst_col).to_numpy(),
            iters=iters,
            scale=scale,
        )
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(nid, pa.int64()),
                    "pr": pa.array(pr, pa.int64()),
                    "out_deg": pa.array(od, pa.int64()),
                    "in_deg": pa.array(idg, pa.int64()),
                }
            )
        )

    return _pagerank_distributed(
        nodes, edges,
        node_col=node_col, src_col=src_col, dst_col=dst_col,
        iters=iters, scale=scale, num_partitions=num_partitions,
        checkpoint_dir=checkpoint_dir,
    )


def _ckpt_path(d: str, i: int) -> str:
    import os

    return os.path.join(d, f"iter={i}")


def _latest_checkpoint(d: str, iters: int) -> int:
    """Newest round ≤ iters with a completion marker, or -1."""
    import os

    best = -1
    for i in range(iters + 1):
        if os.path.exists(os.path.join(_ckpt_path(d, i), "_COMPLETE")):
            best = i
    return best


def _pagerank_distributed(
    nodes, edges, *, node_col, src_col, dst_col, iters, scale, num_partitions,
    checkpoint_dir=None,
):
    """Power-iteration join loop.  State = materialized
    ``(node, out_deg, in_deg, pr)``; edges are materialized ONCE and
    re-joined every round (ranks move, the graph doesn't)."""
    e = edges.map_batches(
        lambda t, s=src_col, d=dst_col: pa.table(
            {"esrc": t.column(s).cast(pa.int64()), "edst": t.column(d).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    # degree tables via per-batch partial counts + one groupby each
    def _deg(col_in: str, col_out: str):
        def part(t: pa.Table) -> pa.Table:
            vals, counts = np.unique(t.column(col_in).to_numpy(), return_counts=True)
            return pa.table(
                {"node": pa.array(vals, pa.int64()), col_out: pa.array(counts, pa.int64())}
            )

        return e.map_batches(part, batch_format="pyarrow").groupby("node").sum(col_out)

    od = _deg("esrc", "out_deg").map_batches(
        lambda t: pa.table(
            {"node": t.column("node"), "out_deg": t.column("sum(out_deg)")}
        ),
        batch_format="pyarrow",
    )
    idg = _deg("edst", "in_deg").map_batches(
        lambda t: pa.table(
            {"dnode": t.column("node"), "in_deg": t.column("sum(in_deg)")}
        ),
        batch_format="pyarrow",
    )

    base = nodes.map_batches(
        lambda t, c=node_col: pa.table({"node": t.column(c).cast(pa.int64())}),
        batch_format="pyarrow",
    )
    state = (
        base.join(od, join_type="left_outer", num_partitions=num_partitions, on=("node",))
        .join(
            idg,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("node",),
            right_on=("dnode",),
        )
        .map_batches(
            lambda t, s=scale: pa.table(
                {
                    "node": t.column("node"),
                    "out_deg": pc.coalesce(t.column("out_deg"), pa.scalar(0, pa.int64())),
                    "in_deg": pc.coalesce(t.column("in_deg"), pa.scalar(0, pa.int64())),
                    "pr": pa.array(np.full(t.num_rows, s, np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n = state.count()
    teleport = (15 * scale) // 100

    start = 0
    if checkpoint_dir is not None:
        import os

        import ray.data as rd

        done = _latest_checkpoint(checkpoint_dir, iters)
        if done >= 0:
            state = rd.read_parquet(_ckpt_path(checkpoint_dir, done)).materialize()
            start = done
        else:
            os.makedirs(checkpoint_dir, exist_ok=True)
        if start == iters:
            return state

    for it in range(start, iters):
        # O(1) scalar to the driver: the round's dangling mass
        dang = state.map_batches(
            lambda t: pa.table(
                {
                    "d": pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.if_else(
                                        pc.equal(t.column("out_deg"), 0),
                                        t.column("pr"),
                                        pa.scalar(0, pa.int64()),
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("d")
        de = int(dang or 0) // n

        shares = state.map_batches(
            lambda t: (
                lambda k: pa.table(
                    {
                        "snode": k.column("node"),
                        "share": pc.divide(k.column("pr"), k.column("out_deg")),
                    }
                )
            )(t.filter(pc.greater(t.column("out_deg"), 0))),
            batch_format="pyarrow",
        )
        contrib = e.join(
            shares,
            join_type="inner",
            num_partitions=num_partitions,
            on=("esrc",),
            right_on=("snode",),
        ).map_batches(
            lambda t: pa.table({"cnode": t.column("edst"), "c": t.column("share")}),
            batch_format="pyarrow",
        )
        insum = contrib.groupby("cnode").sum("c")
        state = (
            state.join(
                insum,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("node",),
                right_on=("cnode",),
            )
            .map_batches(
                lambda t, de=de, tp=teleport: pa.table(
                    {
                        "node": t.column("node"),
                        "out_deg": t.column("out_deg"),
                        "in_deg": t.column("in_deg"),
                        "pr": pc.add(
                            pa.scalar(tp, pa.int64()),
                            pc.divide(
                                pc.multiply(
                                    pa.scalar(85, pa.int64()),
                                    pc.add(
                                        pc.coalesce(
                                            t.column("sum(c)"), pa.scalar(0, pa.int64())
                                        ),
                                        pa.scalar(de, pa.int64()),
                                    ),
                                ),
                                pa.scalar(100, pa.int64()),
                            ),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if checkpoint_dir is not None:
            import os

            p = _ckpt_path(checkpoint_dir, it + 1)
            if not os.path.exists(os.path.join(p, "_COMPLETE")):
                tmp = p + ".tmp"
                if os.path.exists(tmp):
                    import shutil

                    shutil.rmtree(tmp)
                state.write_parquet(tmp)
                os.replace(tmp, p)  # atomic publish, marker last
                with open(os.path.join(p, "_COMPLETE"), "w") as f:
                    f.write("ok\n")
    return state


# ------------------------------------------------------------- OPIC

def opic(nodes, edges, *, node_col: str = "node", src_col: str = "src",
         dst_col: str = "dst", iters: int = 6, scale: int = 10**6,
         method: str = "auto", small_graph_threshold: int = 2_000_000,
         num_partitions: int = 16):
    """On-line Page Importance Computation (Abiteboul/Preda/Cobena,
    WWW 2003) — the crawl-frontier importance estimator that needs no
    convergence before it's useful: every node starts with equal CASH;
    each (synchronous) round a node banks its cash into HISTORY and
    distributes it equally over its out-links; dangling cash and the
    integer-division remainders pool and redistribute uniformly
    (``pool // n`` each — total cash is conserved up to the dropped
    ``pool % n``, a documented floor artifact that keeps the
    recurrence INTEGER and therefore bit-exact under any partitioning,
    the ``pagerank`` contract).  Returns ``(node, hist, cash,
    out_deg)`` after ``iters`` rounds; ``hist`` is the importance
    signal a crawler schedules by.

    Distributed path: per round ONE edges ⋈ cash hash join + one
    ``groupby(dst).sum`` — O(|E|) rows moved per round, nothing
    corpus-sized on the driver (the pool is a scalar)."""
    import ray

    n_edges = edges.count()
    n_nodes = nodes.count()
    if method not in ("auto", "numpy", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    if method == "numpy" or (
        method == "auto" and n_edges + n_nodes <= small_graph_threshold
    ):
        nt = nodes.select_columns([node_col]).to_arrow_refs()
        et = edges.select_columns([src_col, dst_col]).to_arrow_refs()
        nid = pa.concat_tables(ray.get(nt)).column(node_col).to_numpy()
        etab = pa.concat_tables(ray.get(et))
        hist, cash, od = _opic_numpy(
            nid, etab.column(src_col).to_numpy(),
            etab.column(dst_col).to_numpy(), iters=iters, scale=scale,
        )
        import ray.data

        return ray.data.from_arrow(pa.table({
            "node": pa.array(np.sort(nid), pa.int64()),
            "hist": pa.array(hist, pa.int64()),
            "cash": pa.array(cash, pa.int64()),
            "out_deg": pa.array(od, pa.int64()),
        }))
    return _opic_distributed(
        nodes, edges, node_col=node_col, src_col=src_col, dst_col=dst_col,
        iters=iters, scale=scale, num_partitions=num_partitions,
    )


def _opic_numpy(nid, src, dst, *, iters: int, scale: int):
    order = np.argsort(nid)
    ns = nid[order]
    n = ns.size
    s_idx = np.searchsorted(ns, src)
    d_idx = np.searchsorted(ns, dst)
    for idx, ep, what in ((s_idx, src, "src"), (d_idx, dst, "dst")):
        bad = (idx >= n) | (ns[np.minimum(idx, n - 1)] != ep)
        if bad.any():
            raise ValueError(f"opic: edge {what} endpoint not in nodes")
    od = np.bincount(s_idx, minlength=n).astype(np.int64)
    cash = np.full(n, scale, np.int64)
    hist = np.zeros(n, np.int64)
    for _ in range(iters):
        hist += cash
        gv = np.where(od > 0, cash // np.maximum(od, 1), 0)
        pool = int(cash[od == 0].sum()) + int((cash - od * gv)[od > 0].sum())
        inc = np.zeros(n, np.int64)
        np.add.at(inc, d_idx, gv[s_idx])
        cash = inc + pool // n
    return hist, cash, od


def _opic_distributed(nodes, edges, *, node_col, src_col, dst_col,
                      iters, scale, num_partitions):
    """The join-loop twin of :func:`_opic_numpy` — same integers by
    construction (integer recurrence, association-free sums)."""
    e = edges.map_batches(
        lambda t, s=src_col, d=dst_col: pa.table(
            {"esrc": t.column(s).cast(pa.int64()),
             "edst": t.column(d).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    def part_od(t: pa.Table) -> pa.Table:
        vals, counts = np.unique(t.column("esrc").to_numpy(), return_counts=True)
        return pa.table({"node": pa.array(vals, pa.int64()),
                         "od_p": pa.array(counts, pa.int64())})

    od = e.map_batches(part_od, batch_format="pyarrow").groupby("node").sum("od_p")
    base = nodes.map_batches(
        lambda t, c=node_col: pa.table({"node": t.column(c).cast(pa.int64())}),
        batch_format="pyarrow",
    )
    state = (
        base.join(od, join_type="left_outer", num_partitions=num_partitions,
                  on=("node",))
        .map_batches(
            lambda t, s=scale: pa.table({
                "node": t.column("node"),
                "out_deg": pc.coalesce(t.column("sum(od_p)"),
                                       pa.scalar(0, pa.int64())),
                "cash": pa.array(np.full(t.num_rows, s, np.int64)),
                "hist": pa.array(np.zeros(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n = state.count()
    for _ in range(iters):
        # the round's redistribution pool — one scalar to the driver
        def pool_part(t: pa.Table) -> pa.Table:
            odv = t.column("out_deg").to_numpy()
            ca = t.column("cash").to_numpy()
            gv = np.where(odv > 0, ca // np.maximum(odv, 1), 0)
            p = int(ca[odv == 0].sum()) + int((ca - odv * gv)[odv > 0].sum())
            return pa.table({"p": pa.array([p], pa.int64())})

        pool = int(state.map_batches(pool_part, batch_format="pyarrow")
                   .sum("p") or 0)
        share = pool // n
        shares = state.map_batches(
            lambda t: (
                lambda k: pa.table({
                    "snode": k.column("node"),
                    "gv": pc.divide(k.column("cash"), k.column("out_deg")),
                })
            )(t.filter(pc.greater(t.column("out_deg"), 0))),
            batch_format="pyarrow",
        )
        inc = (
            e.join(shares, join_type="inner", num_partitions=num_partitions,
                   on=("esrc",), right_on=("snode",))
            .map_batches(
                lambda t: pa.table({"cnode": t.column("edst"),
                                    "c": t.column("gv")}),
                batch_format="pyarrow",
            )
            .groupby("cnode").sum("c")
        )
        state = (
            state.join(inc, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("node",), right_on=("cnode",))
            .map_batches(
                lambda t, sh=share: pa.table({
                    "node": t.column("node"),
                    "out_deg": t.column("out_deg"),
                    "cash": pc.add(
                        pc.coalesce(t.column("sum(c)"),
                                    pa.scalar(0, pa.int64())),
                        pa.scalar(sh, pa.int64()),
                    ),
                    "hist": pc.add(t.column("hist"), t.column("cash")),
                }),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return state.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "hist": t.column("hist"),
            "cash": t.column("cash"),
            "out_deg": t.column("out_deg"),
        }),
        batch_format="pyarrow",
    ).sort("node")


# -------------------------------------------------------- anchor stats

def anchor_stats(edges, *, src_col="src", dst_col="dst", anchor_col="anchor",
                 host_mod: int = 10):
    """Per-target anchor aggregation: ``(doc_id, in_deg, n_hosts,
    top_anchor, top_anchor_n)``.  Source host = ``src % host_mod``
    (the synthetic registered-domain of the fixture graph; swap in a
    real host column upstream for production edges).  Map-side combine
    collapses each batch to one row per (dst, anchor) carrying a count
    and a host BITMASK (host_mod ≤ 63), so the single
    ``groupby(dst).map_groups`` touches per-page summaries, never raw
    in-links."""
    if host_mod > 63:
        raise ValueError("host bitmask supports host_mod <= 63")

    def part(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "dst": t.column(dst_col).to_numpy(),
                "anchor": t.column(anchor_col).to_pylist(),
                "mask": np.left_shift(
                    np.int64(1), t.column(src_col).to_numpy() % host_mod
                ),
            }
        )
        g = df.groupby(["dst", "anchor"], sort=False).agg(
            cnt=("mask", "size"), mask=("mask", lambda s: np.bitwise_or.reduce(s.values))
        )
        g = g.reset_index()
        return pa.table(
            {
                "dst": pa.array(g["dst"], pa.int64()),
                "anchor": pa.array(g["anchor"], pa.string()),
                "cnt": pa.array(g["cnt"], pa.int64()),
                "mask": pa.array(g["mask"], pa.int64()),
            }
        )

    def final(df):
        import pandas as pd

        per = df.groupby("anchor", sort=False)["cnt"].sum()
        # max count, min-anchor tiebreak: sort by (-cnt, anchor), take head
        ordered = per.reset_index().sort_values(
            ["cnt", "anchor"], ascending=[False, True], kind="stable"
        )
        n_hosts = int(np.bitwise_or.reduce(df["mask"].values)).bit_count()
        return pd.DataFrame(
            {
                "doc_id": [int(df["dst"].iloc[0])],
                "in_deg": [int(df["cnt"].sum())],
                "n_hosts": [n_hosts],
                "top_anchor": [ordered["anchor"].iloc[0]],
                "top_anchor_n": [int(ordered["cnt"].iloc[0])],
            }
        )

    return (
        edges.map_batches(part, batch_format="pyarrow")
        .groupby("dst")
        .map_groups(final, batch_format="pandas")
    )


# ----------------------------------------------------------------- hits

def _hits_numpy(
    nodes: np.ndarray, src: np.ndarray, dst: np.ndarray,
    *, iters: int, scale: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Driver fast path for :func:`hits` — the identical integer
    recurrence via ``np.add.at`` scatter adds."""
    order = np.argsort(nodes, kind="stable")
    nid = nodes[order]
    n = nid.size
    si = np.searchsorted(nid, src)
    di = np.searchsorted(nid, dst)
    h = np.full(n, scale, np.int64)
    a = np.zeros(n, np.int64)
    for _ in range(iters):
        ar = np.zeros(n, np.int64)
        np.add.at(ar, di, h[si])
        q = max(1, (int(ar.max(initial=0)) + scale - 1) // scale)
        a = ar // q
        hr = np.zeros(n, np.int64)
        np.add.at(hr, si, a[di])
        q2 = max(1, (int(hr.max(initial=0)) + scale - 1) // scale)
        h = hr // q2
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    return a[inv], h[inv]


def hits(
    nodes,
    edges,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    scale: int = 10**6,
    method: str = "auto",
    small_graph_threshold: int = 2_000_000,
    num_partitions: int = 16,
):
    """Integer fixed-point HITS (Kleinberg 1999) hubs & authorities —
    the companion ranking to :func:`pagerank` (authorities ≈ pages
    worth indexing richly, hubs ≈ link directories worth crawling).

    The float algorithm L2-normalizes each half-round; the integer
    transposition rescales by the round MAX instead::

        h_0(u)   = S
        a_i(v)   = (Σ_{u→v} h_{i-1}(u)) // ceil(max_raw / S)
        h_i(u)   = (Σ_{u→v} a_i(v))     // ceil(max_raw / S)

    — max-rescaling keeps every value in [0, S] and, being pure int64
    floor arithmetic, the result is bit-exact under any partitioning
    and exactly replayable as chained SQL CTEs (the
    :func:`pagerank` oracle contract).  Overflow bound: a node's raw
    sum is ≤ degree·S, so int64 is safe for degree < 2⁶³/S (9·10¹² at
    the default S = 10⁶ — beyond any real in-degree).

    ``method`` as in :func:`pagerank`: ``"numpy"`` driver fast path,
    ``"distributed"`` = per half-round one edges ⋈ state hash join +
    one ``groupby.sum`` + one O(1) max fold (what a 100 TB edge set
    uses), ``"auto"`` picks by size.  Returns a Dataset
    ``(node, auth, hub)``.
    """
    import ray
    import ray.data

    if method not in ("auto", "numpy", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    n_edges = edges.count()
    n_nodes = nodes.count()
    if method == "numpy" or (
        method == "auto" and n_edges + n_nodes <= small_graph_threshold
    ):
        nt = nodes.select_columns([node_col]).to_arrow_refs()
        et = edges.select_columns([src_col, dst_col]).to_arrow_refs()
        nid = pa.concat_tables(ray.get(nt)).column(node_col).to_numpy()
        etab = pa.concat_tables(ray.get(et))
        a, h = _hits_numpy(
            nid,
            etab.column(src_col).to_numpy(),
            etab.column(dst_col).to_numpy(),
            iters=iters,
            scale=scale,
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(nid, pa.int64()),
                    "auth": pa.array(a, pa.int64()),
                    "hub": pa.array(h, pa.int64()),
                }
            )
        )

    e = edges.map_batches(
        lambda t, s=src_col, d=dst_col: pa.table(
            {"esrc": t.column(s).cast(pa.int64()),
             "edst": t.column(d).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    def _half_round(state, score_col: str, join_on: str, group_as: str):
        """One HITS half-round: scatter ``score_col`` along edges
        (joined on ``join_on``), sum per ``group_as`` node, rescale by
        the round max.  Returns the new per-node score Dataset
        ``(node, s)`` aligned to ``state``'s nodes (missing → 0)."""
        other = "edst" if join_on == "esrc" else "esrc"
        contrib = e.join(
            state.map_batches(
                lambda t, c=score_col: pa.table(
                    {"jnode": t.column("node"), "js": t.column(c)}
                ),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=(join_on,),
            right_on=("jnode",),
        ).map_batches(
            lambda t, o=other: pa.table(
                {"gnode": t.column(o), "c": t.column("js")}
            ),
            batch_format="pyarrow",
        )
        raw = contrib.groupby("gnode").sum("c").materialize()
        mx = raw.max("sum(c)") if raw.count() else 0
        q = max(1, (int(mx or 0) + scale - 1) // scale)
        return (
            state.join(
                raw,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("node",),
                right_on=("gnode",),
            )
            .map_batches(
                lambda t, q=q: pa.table(
                    {
                        "node": t.column("node"),
                        "s": pc.divide(
                            pc.coalesce(t.column("sum(c)"),
                                        pa.scalar(0, pa.int64())),
                            pa.scalar(q, pa.int64()),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )

    state = nodes.map_batches(
        lambda t, c=node_col, s=scale: pa.table(
            {
                "node": t.column(c).cast(pa.int64()),
                "auth": pa.array(np.zeros(t.num_rows, np.int64)),
                "hub": pa.array(np.full(t.num_rows, s, np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        a_new = _half_round(state, "hub", "esrc", "edst")
        state = (
            state.select_columns(["node", "hub"])
            .join(a_new, join_type="inner",
                  num_partitions=num_partitions, on=("node",))
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "auth": t.column("s"),
                     "hub": t.column("hub")}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        h_new = _half_round(state, "auth", "edst", "esrc")
        state = (
            state.select_columns(["node", "auth"])
            .join(h_new, join_type="inner",
                  num_partitions=num_partitions, on=("node",))
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "auth": t.column("auth"),
                     "hub": t.column("s")}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return state.select_columns(["node", "auth", "hub"])


# ------------------------------------------------------------ triangles

def _triangles_numpy(a: np.ndarray, b: np.ndarray):
    """In-process replica of the distributed wedge-check plan (see
    :func:`triangles`): canonical edges arrive as ``a < b`` int64
    arrays (possibly with duplicates across batches); the sorted
    composite-key array plays the role of both hash joins."""
    if a.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    SHIFT = np.uint64(32)
    ukey = np.unique((a.astype(np.uint64) << SHIFT) | b.astype(np.uint64))
    ea = (ukey >> SHIFT).astype(np.int64)
    eb = (ukey & np.uint64(0xFFFFFFFF)).astype(np.int64)
    m = ea.size
    # ukey sort ⇒ a-major, b-minor: contiguous groups per low endpoint
    starts = np.concatenate(([0], np.flatnonzero(np.diff(ea)) + 1))
    sizes = np.diff(starts, append=m)
    loc = np.arange(m) - np.repeat(starts, sizes)  # local index in group
    total = int(loc.sum())  # number of wedges (pairs within groups)
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # wedge (i, j): position j pairs with every earlier same-group
    # position; b sorted-unique within the group ⇒ eb[i] < eb[j]
    j_idx = np.repeat(np.arange(m), loc)
    cum = np.concatenate(([0], np.cumsum(loc)))
    grp_start = np.repeat(starts, sizes)
    i_idx = (np.arange(total) - np.repeat(cum[:-1], loc)) + np.repeat(
        grp_start, loc
    )
    wb, wc = eb[i_idx], eb[j_idx]
    wkey = (wb.astype(np.uint64) << SHIFT) | wc.astype(np.uint64)
    pos = np.searchsorted(ukey, wkey)
    hit = (pos < m) & (ukey[np.minimum(pos, m - 1)] == wkey)
    corners = np.concatenate([ea[i_idx][hit], wb[hit], wc[hit]])
    vals, cnt = np.unique(corners, return_counts=True)
    return vals.astype(np.int64), cnt.astype(np.int64)


def triangles(edges, *, src_col: str = "src", dst_col: str = "dst",
              method: str = "auto",
              small_graph_threshold: int = 2_000_000,
              num_partitions: int | None = None):
    """Exact triangle counting over the undirected simple graph
    (direction and multi-edges collapsed) — the clustering-coefficient
    numerator, the classic link-spam / community-density signal.

    ``method`` mirrors :func:`pagerank`: ``"auto"`` takes the
    driver-side numpy fast path when the deduped edge set fits
    ``small_graph_threshold``; ``"distributed"`` forces the join plan
    a 100 TB edge set uses.  Both produce identical output (pytest
    pins it) — triangle counting is exact integer arithmetic, so the
    plan choice can't change a single count.

    Distributed wedge-check join plan, all Ray-Data native:

    1. canonicalize every edge to ``(a=min, b=max)`` and dedupe with
       one ``groupby``;
    2. wedge join: edges ⋈ edges on the common LOW endpoint ``a``
       (one hash join) keeping ``b < c`` — each wedge once;
    3. close the wedge: candidates ⋈ edges on the composite key
       ``b·2³² + c`` (node ids < 2³² asserted — the fixture ids are
       doc_ids; swap a hash-pair key for wider ids) — one more hash
       join;
    4. per-node counts: each triangle emits its 3 corners, one
       ``groupby(node)``.

    The numpy fast path runs the SAME plan in-process: sorted
    composite keys stand in for the hash joins (wedge membership is a
    ``searchsorted`` against the edge-key array instead of a shuffle).

    The high-degree-node wedge blowup is the documented skew caveat
    (degree-ordered orientation already bounds it: every wedge pivots
    at its SMALLEST id, the standard mitigation).  Returns a Dataset
    ``(node, n_triangles)`` for nodes in ≥ 1 triangle.
    """
    import ray

    if method not in ("auto", "numpy", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    if num_partitions is None:
        # Ray's hash-join actor pools deadlock when partitions far
        # exceed available CPUs (two joins in this DAG); size to the
        # cluster, floor 2 so the shuffle path is always exercised.
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, cpus // 2))
    SHIFT = np.uint64(32)

    def canon(t: pa.Table) -> pa.Table:
        s = t.column(src_col).cast(pa.int64()).to_numpy()
        d = t.column(dst_col).cast(pa.int64()).to_numpy()
        assert (s < (1 << 32)).all() and (d < (1 << 32)).all(), \
            "triangle composite key needs node ids < 2^32"
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        keep = a != b
        return pa.table(
            {"a": pa.array(a[keep], pa.int64()),
             "b": pa.array(b[keep], pa.int64())}
        )

    if method == "numpy" or (
        method == "auto" and edges.count() <= small_graph_threshold
    ):
        flat = pa.concat_tables(
            [canon(t) for t in edges.iter_batches(batch_format="pyarrow")]
        ) if edges.count() else pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        node, n_tri = _triangles_numpy(
            flat.column("a").to_numpy(zero_copy_only=False),
            flat.column("b").to_numpy(zero_copy_only=False),
        )
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array(node, pa.int64()),
                 "n_triangles": pa.array(n_tri, pa.int64())}
            )
        )

    ue = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .materialize()
    )
    right = ue.map_batches(
        lambda t: pa.table({"a2": t.column("a"), "c": t.column("b")}),
        batch_format="pyarrow",
    )
    wedges = (
        ue.join(right, join_type="inner", num_partitions=num_partitions,
                on=("a",), right_on=("a2",))
        .map_batches(
            lambda t: (
                lambda k: pa.table(
                    {
                        "a": k.column("a"),
                        "b": k.column("b"),
                        "c": k.column("c"),
                        "bc": pa.array(
                            (k.column("b").to_numpy().astype(np.uint64) << SHIFT)
                            | k.column("c").to_numpy().astype(np.uint64),
                            pa.uint64(),
                        ),
                    }
                )
            )(t.filter(pc.less(t.column("b"), t.column("c")))),
            batch_format="pyarrow",
        )
    )
    closing = ue.map_batches(
        lambda t: pa.table(
            {
                "bc2": pa.array(
                    (t.column("a").to_numpy().astype(np.uint64) << SHIFT)
                    | t.column("b").to_numpy().astype(np.uint64),
                    pa.uint64(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    tri = wedges.join(closing, join_type="inner",
                      num_partitions=num_partitions,
                      on=("bc",), right_on=("bc2",))

    def corners(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [t.column("a").to_numpy(), t.column("b").to_numpy(),
             t.column("c").to_numpy()]
        )
        vals, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {"node": pa.array(vals, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    from ray.data.aggregate import Sum

    return (
        tri.map_batches(corners, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("n", alias_name="n_triangles"))
    )


def bfs_depth(nodes, edges, *, seed_mod: int = 97, rounds: int = 5,
              node_col: str = "node", src_col: str = "src",
              dst_col: str = "dst"):
    """Bounded-depth BFS over the link graph — crawl-depth assignment
    from a seed set (the frontier-expansion primitive next to
    PageRank/HITS/CC: a crawler budgets by DEPTH from its seeds; docs
    beyond the horizon are depth −1).  Seeds are ``node % seed_mod ==
    0``; depth is the minimum hop count within ``rounds`` hops.

    Distributed shape (the per-round loop the other iterative graph
    operators use): each round is one frontier ⋈ edges hash join +
    one ``groupby(node).min`` — O(|frontier-out-edges|) per round, no
    whole-graph state on the driver.  Here the fixture fits the numpy
    fast path (same integers — the recurrence is integral, so the
    two paths are bit-identical by construction, exactly the
    ``pagerank`` contract)."""
    import pyarrow as pa

    nt = _collect_column(nodes, node_col)
    src, dst = _collect_edges(edges, src_col, dst_col)
    order = np.argsort(nt)
    nodes_sorted = nt[order]
    depth = np.full(nodes_sorted.size, -1, np.int64)
    depth[nodes_sorted % seed_mod == 0] = 0
    s_idx = np.searchsorted(nodes_sorted, src)
    d_idx = np.searchsorted(nodes_sorted, dst)
    # endpoint validation (ADVICE r4): an edge touching a node absent
    # from the node table must not silently alias into a neighbor slot
    # (or index past the array for endpoints > max(node)) — the other
    # graph operators' node-closed contract, enforced
    for idx, ep, what in ((s_idx, src, "src"), (d_idx, dst, "dst")):
        bad = (idx >= nodes_sorted.size) | (
            nodes_sorted[np.minimum(idx, nodes_sorted.size - 1)] != ep
        )
        if bad.any():
            raise ValueError(
                f"bfs_depth: {int(bad.sum())} edge {what} endpoints are "
                f"not in the node table (first: {int(ep[bad.argmax()])}) — "
                "the edge set must be node-closed"
            )
    for r in range(1, rounds + 1):
        at_prev = depth[s_idx] == r - 1
        cand = d_idx[at_prev]
        if cand.size == 0:
            break
        hit = np.unique(cand[depth[cand] == -1])
        if hit.size == 0:
            continue
        depth[hit] = r
        if r == rounds:
            break
    return pa.table({
        "doc_id": pa.array(nodes_sorted, pa.int64()),
        "depth": pa.array(depth, pa.int64()),
    })


def _collect_column(ds, col):
    import pyarrow as pa

    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    return t.column(col).cast(pa.int64()).to_numpy()


def _collect_edges(ds, src_col, dst_col):
    import pyarrow as pa

    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    return (t.column(src_col).cast(pa.int64()).to_numpy(),
            t.column(dst_col).cast(pa.int64()).to_numpy())


# ------------------------------------------------- connected components

def _cc_numpy(nid, src, dst):
    """Hash-min labels over the UNDIRECTED closure of (src, dst) with
    pointer-jumping shortcuts — converges in O(log diameter) sweeps.
    Labels are node IDs (min reachable id), so the fixpoint is unique
    and partition-independent."""
    order = np.argsort(nid)
    ns = nid[order]
    n = ns.size
    s_idx = np.searchsorted(ns, src)
    d_idx = np.searchsorted(ns, dst)
    for idx, ep, what in ((s_idx, src, "src"), (d_idx, dst, "dst")):
        bad = (idx >= n) | (ns[np.minimum(idx, n - 1)] != ep)
        if bad.any():
            raise ValueError(
                f"connected_components: edge {what} endpoint not in nodes")
    a = np.concatenate([s_idx, d_idx])
    b = np.concatenate([d_idx, s_idx])
    lab = ns.copy()
    while True:
        new = lab.copy()
        np.minimum.at(new, b, lab[a])          # hash-min over neighbors
        new = np.minimum(new, lab[np.searchsorted(ns, new)])  # shortcut
        if np.array_equal(new, lab):
            break
        lab = new
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    return lab[inv]


def connected_components(nodes, edges, *, node_col: str = "node",
                         src_col: str = "src", dst_col: str = "dst",
                         method: str = "auto",
                         small_graph_threshold: int = 2_000_000,
                         num_partitions: int = 16,
                         max_rounds: int = 64):
    """Connected components of the UNDIRECTED link graph (Datasets in,
    Dataset out: ``(node, comp)`` with ``comp`` = min node id in the
    component — the canonical label, identical under any partitioning).
    The web-graph dedup primitive: near-dup edge sets, mirror clusters
    and redirect families all reduce to CC.

    Distributed path = BSP hash-min (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 family): per round
    ONE undirected-edges ⋈ labels hash join + ``groupby(node).min``
    + a label-of-label shortcut join (pointer jumping), so rounds
    grow with log(diameter), not diameter.  Per-round driver traffic
    is one scalar (the changed-label count)."""
    import ray

    n_edges = edges.count()
    n_nodes = nodes.count()
    if method not in ("auto", "numpy", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    if method == "numpy" or (
        method == "auto" and n_edges + n_nodes <= small_graph_threshold
    ):
        nid = _collect_column(nodes, node_col)
        src, dst = _collect_edges(edges, src_col, dst_col)
        lab = _cc_numpy(nid, src, dst)
        import ray.data

        return ray.data.from_arrow(pa.table({
            "node": pa.array(nid, pa.int64()),
            "comp": pa.array(lab, pa.int64()),
        }))
    return _cc_distributed(
        nodes, edges, node_col=node_col, src_col=src_col, dst_col=dst_col,
        num_partitions=num_partitions, max_rounds=max_rounds,
    )


def _cc_distributed(nodes, edges, *, node_col, src_col, dst_col,
                    num_partitions, max_rounds):
    """Join-loop twin of :func:`_cc_numpy` — min is associative and
    commutative, so the fixpoint labels are bit-identical."""
    ue = edges.map_batches(
        lambda t, s=src_col, d=dst_col: pa.table({
            "ea": pa.concat_arrays([
                t.column(s).cast(pa.int64()).combine_chunks(),
                t.column(d).cast(pa.int64()).combine_chunks()]),
            "eb": pa.concat_arrays([
                t.column(d).cast(pa.int64()).combine_chunks(),
                t.column(s).cast(pa.int64()).combine_chunks()]),
        }),
        batch_format="pyarrow",
    ).materialize()
    state = nodes.map_batches(
        lambda t, c=node_col: (
            lambda ids: pa.table({"node": ids, "comp": ids}))(
                t.column(c).cast(pa.int64())),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(max_rounds):
        msgs = (
            ue.join(state, join_type="inner", num_partitions=num_partitions,
                    on=("ea",), right_on=("node",))
            .map_batches(
                lambda t: pa.table({"mnode": t.column("eb"),
                                    "mlab": t.column("comp")}),
                batch_format="pyarrow",
            )
            .groupby("mnode").min("mlab")
        )
        merged = (
            state.join(msgs, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("node",), right_on=("mnode",))
            .map_batches(
                lambda t: pa.table({
                    "node": t.column("node"),
                    "old": t.column("comp"),
                    "comp": pc.min_element_wise(
                        t.column("comp"),
                        pc.coalesce(t.column("min(mlab)"),
                                    t.column("comp"))),
                }),
                batch_format="pyarrow",
            )
            # merged feeds TWO consumers below — materialize, or each
            # join re-executes every prior round's lineage (exponential)
            .materialize()
        )
        # pointer jumping: comp <- min(comp, comp[comp]) via one join
        # of the label column against the state keyed by node
        state2 = (
            merged
            .join(merged.map_batches(
                      lambda t: pa.table({"lnode": t.column("node"),
                                          "llab": t.column("comp")}),
                      batch_format="pyarrow"),
                  join_type="inner", num_partitions=num_partitions,
                  on=("comp",), right_on=("lnode",))
            .map_batches(
                lambda t: pa.table({"node": t.column("node"),
                                    "old": t.column("old"),
                                    "comp": pc.min_element_wise(
                                        t.column("comp"),
                                        t.column("llab"))}),
                batch_format="pyarrow",
            )
            .materialize()
        )

        def changed_part(t: pa.Table) -> pa.Table:
            ch = pc.sum(pc.cast(pc.not_equal(t.column("comp"),
                                             t.column("old")),
                                pa.int64())).as_py() or 0
            return pa.table({"c": pa.array([ch], pa.int64())})

        changed = int(state2.map_batches(changed_part,
                                         batch_format="pyarrow").sum("c") or 0)
        state = state2.select_columns(["node", "comp"]).materialize()
        if changed == 0:
            break
    return state


# --------------------------------------------------------- TrustRank

def trustrank(nodes, edges, *, node_col: str = "node",
              src_col: str = "src", dst_col: str = "dst",
              seed_mod: int = 50, iters: int = 6, scale: int = 10**9,
              method: str = "auto",
              small_graph_threshold: int = 2_000_000,
              num_partitions: int = 16):
    """TrustRank (Gyöngyi/Garcia-Molina/Pedersen, VLDB'04): PageRank
    with teleport AND dangling mass restricted to a trusted seed set
    (``node % seed_mod == 0``) — spam demotion by trust attenuation
    along links.  Integer fixed-point recurrence (the ``pagerank``
    contract: floor divisions only, so any partitioning produces the
    same bits):

        gv      = trust // out_deg              (linked nodes)
        dang    = Σ trust[out_deg == 0]
        trust'  = is_seed * (15*scale)//100
                + (85 * (insum + is_seed * dang//|seeds|)) // 100

    Returns ``(node, trust, is_seed, out_deg)``."""
    import ray

    n_edges = edges.count()
    n_nodes = nodes.count()
    if method not in ("auto", "numpy", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    if method == "numpy" or (
        method == "auto" and n_edges + n_nodes <= small_graph_threshold
    ):
        nid = _collect_column(nodes, node_col)
        src, dst = _collect_edges(edges, src_col, dst_col)
        tr, seed, od = _trustrank_numpy(nid, src, dst, seed_mod=seed_mod,
                                        iters=iters, scale=scale)
        import ray.data

        return ray.data.from_arrow(pa.table({
            "node": pa.array(nid, pa.int64()),
            "trust": pa.array(tr, pa.int64()),
            "is_seed": pa.array(seed, pa.int64()),
            "out_deg": pa.array(od, pa.int64()),
        }))
    return _trustrank_distributed(
        nodes, edges, node_col=node_col, src_col=src_col, dst_col=dst_col,
        seed_mod=seed_mod, iters=iters, scale=scale,
        num_partitions=num_partitions,
    )


def _trustrank_numpy(nid, src, dst, *, seed_mod, iters, scale):
    order = np.argsort(nid)
    ns = nid[order]
    n = ns.size
    s_idx = np.searchsorted(ns, src)
    d_idx = np.searchsorted(ns, dst)
    for idx, ep, what in ((s_idx, src, "src"), (d_idx, dst, "dst")):
        bad = (idx >= n) | (ns[np.minimum(idx, n - 1)] != ep)
        if bad.any():
            raise ValueError(f"trustrank: edge {what} endpoint not in nodes")
    od = np.bincount(s_idx, minlength=n).astype(np.int64)
    seed = (ns % seed_mod == 0).astype(np.int64)
    nseeds = int(seed.sum())
    if nseeds == 0:
        raise ValueError("trustrank: empty seed set")
    linked = od > 0
    tr = seed * scale
    base = seed * ((15 * scale) // 100)
    for _ in range(iters):
        gv = np.zeros(n, np.int64)
        gv[linked] = tr[linked] // od[linked]
        dang = int(tr[~linked].sum())
        insum = np.zeros(n, np.int64)
        np.add.at(insum, d_idx, gv[s_idx])
        tr = base + (85 * (insum + seed * (dang // nseeds))) // 100
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    return tr[inv], seed[inv], od[inv]


def _trustrank_distributed(nodes, edges, *, node_col, src_col, dst_col,
                           seed_mod, iters, scale, num_partitions):
    """Join-loop twin of :func:`_trustrank_numpy` (same integers)."""
    e = edges.map_batches(
        lambda t, s=src_col, d=dst_col: pa.table(
            {"esrc": t.column(s).cast(pa.int64()),
             "edst": t.column(d).cast(pa.int64())}),
        batch_format="pyarrow",
    ).materialize()

    def part_od(t: pa.Table) -> pa.Table:
        vals, counts = np.unique(t.column("esrc").to_numpy(),
                                 return_counts=True)
        return pa.table({"node": pa.array(vals, pa.int64()),
                         "od_p": pa.array(counts, pa.int64())})

    od = e.map_batches(part_od, batch_format="pyarrow") \
          .groupby("node").sum("od_p")
    state = (
        nodes.map_batches(
            lambda t, c=node_col: pa.table(
                {"node": t.column(c).cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .join(od, join_type="left_outer", num_partitions=num_partitions,
              on=("node",))
        .map_batches(
            lambda t, sm=seed_mod, s=scale: (
                lambda ids, odv: pa.table({
                    "node": t.column("node"),
                    "out_deg": pc.coalesce(t.column("sum(od_p)"),
                                           pa.scalar(0, pa.int64())),
                    "is_seed": pa.array((ids % sm == 0).astype(np.int64)),
                    "trust": pa.array(
                        np.where(ids % sm == 0, s, 0).astype(np.int64)),
                }))(t.column("node").to_numpy(), None),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def seeds_part(t: pa.Table) -> pa.Table:
        return pa.table({"s": pa.array(
            [pc.sum(t.column("is_seed")).as_py() or 0], pa.int64())})

    nseeds = int(state.map_batches(seeds_part,
                                   batch_format="pyarrow").sum("s") or 0)
    if nseeds == 0:
        raise ValueError("trustrank: empty seed set")
    for _ in range(iters):
        def dang_part(t: pa.Table) -> pa.Table:
            m = pc.equal(t.column("out_deg"), pa.scalar(0, pa.int64()))
            d = pc.sum(pc.if_else(m, t.column("trust"),
                                  pa.scalar(0, pa.int64()))).as_py() or 0
            return pa.table({"d": pa.array([d], pa.int64())})

        dang = int(state.map_batches(dang_part,
                                     batch_format="pyarrow").sum("d") or 0)
        per_seed = dang // nseeds
        shares = state.map_batches(
            lambda t: (
                lambda k: pa.table({
                    "snode": k.column("node"),
                    "gv": pc.divide(k.column("trust"), k.column("out_deg")),
                })
            )(t.filter(pc.greater(t.column("out_deg"), 0))),
            batch_format="pyarrow",
        )
        inc = (
            e.join(shares, join_type="inner", num_partitions=num_partitions,
                   on=("esrc",), right_on=("snode",))
            .map_batches(
                lambda t: pa.table({"cnode": t.column("edst"),
                                    "c": t.column("gv")}),
                batch_format="pyarrow",
            )
            .groupby("cnode").sum("c")
        )
        state = (
            state.join(inc, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("node",), right_on=("cnode",))
            .map_batches(
                lambda t, ps=per_seed, s=scale: pa.table({
                    "node": t.column("node"),
                    "out_deg": t.column("out_deg"),
                    "is_seed": t.column("is_seed"),
                    "trust": pc.add(
                        pc.multiply(t.column("is_seed"),
                                    pa.scalar((15 * s) // 100, pa.int64())),
                        pc.divide(
                            pc.multiply(
                                pa.scalar(85, pa.int64()),
                                pc.add(
                                    pc.coalesce(t.column("sum(c)"),
                                                pa.scalar(0, pa.int64())),
                                    pc.multiply(t.column("is_seed"),
                                                pa.scalar(ps, pa.int64())))),
                            pa.scalar(100, pa.int64()))),
                }),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return state.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "trust": t.column("trust"),
            "is_seed": t.column("is_seed"),
            "out_deg": t.column("out_deg"),
        }),
        batch_format="pyarrow",
    ).sort("node")


# ------------------------------------------------ label propagation

def _lpa_numpy(nid, src, dst, *, iters: int):
    """Synchronous label propagation (Raghavan et al. 2007, made
    deterministic): new label = most frequent neighbor label, ties to
    the SMALLEST label, isolated nodes keep their own.  All updates
    are simultaneous (labels read from the previous round), so the
    result is partition-independent."""
    order = np.argsort(nid)
    ns = nid[order]
    n = ns.size
    s_idx = np.searchsorted(ns, src)
    d_idx = np.searchsorted(ns, dst)
    for idx, ep, what in ((s_idx, src, "src"), (d_idx, dst, "dst")):
        bad = (idx >= n) | (ns[np.minimum(idx, n - 1)] != ep)
        if bad.any():
            raise ValueError(
                f"label_propagation: edge {what} endpoint not in nodes")
    a = np.concatenate([s_idx, d_idx])
    b = np.concatenate([d_idx, s_idx])
    lab = ns.copy().astype(np.int64)
    big = np.int64(ns.max()) + 1 if n else np.int64(1)
    for _ in range(iters):
        key = a.astype(np.int64) * big + lab[b]
        ukey, cnt = np.unique(key, return_counts=True)
        knode = ukey // big
        klab = ukey % big
        # priority = (count desc, label asc): packed so ONE max decides
        packed = cnt.astype(np.int64) * big * big + (big - 1 - klab)
        best = np.full(n, -1, np.int64)
        np.maximum.at(best, knode, packed)
        new = lab.copy()
        has = best >= 0
        new[has] = big - 1 - (best[has] % (big * big)) % big
        lab = new
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    return lab[inv]


def label_propagation(nodes, edges, *, node_col: str = "node",
                      src_col: str = "src", dst_col: str = "dst",
                      iters: int = 3, method: str = "auto",
                      small_graph_threshold: int = 2_000_000,
                      num_partitions: int = 16):
    """Community detection by synchronous label propagation over the
    UNDIRECTED graph (Datasets in, Dataset out ``(node, label)``).

    Distributed path per round: ONE undirected-edges ⋈ labels hash
    join emits (node, neighbor-label) pairs, ``groupby(node,
    label).count`` folds them, and a PACKED integer max
    (``count·B² + (B−1−label)``) picks the winner per node in a
    second small ``groupby(node).max`` — never a per-node
    ``map_groups`` (the 2-row-group antipattern).  Ties and isolated
    nodes are deterministic, so both paths emit identical labels."""
    import ray

    n_edges = edges.count()
    n_nodes = nodes.count()
    if method not in ("auto", "numpy", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    if method == "numpy" or (
        method == "auto" and n_edges + n_nodes <= small_graph_threshold
    ):
        nid = _collect_column(nodes, node_col)
        src, dst = _collect_edges(edges, src_col, dst_col)
        lab = _lpa_numpy(nid, src, dst, iters=iters)
        import ray.data

        return ray.data.from_arrow(pa.table({
            "node": pa.array(nid, pa.int64()),
            "label": pa.array(lab, pa.int64()),
        }))
    return _lpa_distributed(
        nodes, edges, node_col=node_col, src_col=src_col, dst_col=dst_col,
        iters=iters, num_partitions=num_partitions,
    )


def _lpa_distributed(nodes, edges, *, node_col, src_col, dst_col,
                     iters, num_partitions):
    """Join-loop twin of :func:`_lpa_numpy` — identical labels (the
    packed-max argmax is associative)."""
    ue = edges.map_batches(
        lambda t, s=src_col, d=dst_col: pa.table({
            "ea": pa.concat_arrays([
                t.column(s).cast(pa.int64()).combine_chunks(),
                t.column(d).cast(pa.int64()).combine_chunks()]),
            "eb": pa.concat_arrays([
                t.column(d).cast(pa.int64()).combine_chunks(),
                t.column(s).cast(pa.int64()).combine_chunks()]),
        }),
        batch_format="pyarrow",
    ).materialize()
    state = nodes.map_batches(
        lambda t, c=node_col: (
            lambda ids: pa.table({"node": ids, "label": ids}))(
                t.column(c).cast(pa.int64())),
        batch_format="pyarrow",
    ).materialize()
    big = int(state.max("node") or 0) + 1
    for _ in range(iters):
        pairs = (
            ue.join(state, join_type="inner", num_partitions=num_partitions,
                    on=("eb",), right_on=("node",))
            .map_batches(
                lambda t: pa.table({"pnode": t.column("ea"),
                                    "plab": t.column("label")}),
                batch_format="pyarrow",
            )
        )
        counted = pairs.groupby(["pnode", "plab"]).count()
        best = (
            counted.map_batches(
                lambda t, b=big: pa.table({
                    "bnode": t.column("pnode"),
                    "packed": pc.add(
                        pc.multiply(t.column("count()").cast(pa.int64()),
                                    pa.scalar(b * b, pa.int64())),
                        pc.subtract(pa.scalar(b - 1, pa.int64()),
                                    t.column("plab"))),
                }),
                batch_format="pyarrow",
            )
            .groupby("bnode").max("packed")
        )
        state = (
            state.join(best, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("node",), right_on=("bnode",))
            .map_batches(
                lambda t, b=big: pa.table({
                    "node": t.column("node"),
                    "label": pc.coalesce(
                        pc.subtract(
                            pa.scalar(b - 1, pa.int64()),
                            pc.subtract(
                                t.column("max(packed)"),
                                pc.multiply(
                                    pc.divide(t.column("max(packed)"),
                                              pa.scalar(b * b, pa.int64())),
                                    pa.scalar(b * b, pa.int64())))),
                        t.column("label")),
                }),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return state


# ----------------------------------------------------------- k-core

def _kcore_numpy(nid, src, dst, *, k: int, rounds: int):
    order = np.argsort(nid)
    ns = nid[order]
    n = ns.size
    s_idx = np.searchsorted(ns, src)
    d_idx = np.searchsorted(ns, dst)
    for idx, ep, what in ((s_idx, src, "src"), (d_idx, dst, "dst")):
        bad = (idx >= n) | (ns[np.minimum(idx, n - 1)] != ep)
        if bad.any():
            raise ValueError(f"kcore: edge {what} endpoint not in nodes")
    a = np.concatenate([s_idx, d_idx])
    b = np.concatenate([d_idx, s_idx])
    alive = np.ones(n, bool)
    for _ in range(rounds):
        both = alive[a] & alive[b]
        deg = np.bincount(a[both], minlength=n)
        alive = alive & (deg >= k)
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    return alive[inv].astype(np.int64)


def kcore(nodes, edges, *, node_col: str = "node", src_col: str = "src",
          dst_col: str = "dst", k: int = 2, rounds: int = 8,
          method: str = "auto", small_graph_threshold: int = 2_000_000,
          num_partitions: int = 16):
    """k-core membership by ``rounds`` synchronous peeling sweeps
    (Seidman 1983): each round removes every node whose degree within
    the surviving UNDIRECTED subgraph is below ``k``.  A truncated
    recurrence — identical on both paths, convergent once a sweep
    removes nothing.  Returns ``(node, in_core)``.

    Distributed round: undirected edges ⋈ alive (src side) ⋈ alive
    (dst side) → ``groupby.count`` → threshold filter — the same
    join-loop shape as :func:`pagerank`, O(|E|) rows per round."""
    import ray

    n_edges = edges.count()
    n_nodes = nodes.count()
    if method not in ("auto", "numpy", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    if method == "numpy" or (
        method == "auto" and n_edges + n_nodes <= small_graph_threshold
    ):
        nid = _collect_column(nodes, node_col)
        src, dst = _collect_edges(edges, src_col, dst_col)
        inc = _kcore_numpy(nid, src, dst, k=k, rounds=rounds)
        import ray.data

        return ray.data.from_arrow(pa.table({
            "node": pa.array(nid, pa.int64()),
            "in_core": pa.array(inc, pa.int64()),
        }))
    return _kcore_distributed(
        nodes, edges, node_col=node_col, src_col=src_col, dst_col=dst_col,
        k=k, rounds=rounds, num_partitions=num_partitions,
    )


def _kcore_distributed(nodes, edges, *, node_col, src_col, dst_col,
                       k, rounds, num_partitions):
    """Join-free twin of :func:`_kcore_numpy`.  Ray's hash-shuffle
    ``Dataset.join`` builds SCHEMA-LESS empty tables for hash
    partitions that receive no rows and then fails the Arrow join
    (observed on 2.49); since the alive set SHRINKS every round,
    empty partitions are the common case here — so the semi-joins are
    expressed as tagged-union ``groupby(key).map_groups`` cogroups
    (the classic MR reduce-side join), which tolerate empty
    partitions.  Per-group rows = node degree + 1; the hot-page skew
    caveat of ``anchor_stats`` applies."""
    del num_partitions  # cogroup path shuffles by groupby, not join

    ue = edges.map_batches(
        lambda t, s=src_col, d=dst_col: pa.table({
            "ea": pa.concat_arrays([
                t.column(s).cast(pa.int64()).combine_chunks(),
                t.column(d).cast(pa.int64()).combine_chunks()]),
            "eb": pa.concat_arrays([
                t.column(d).cast(pa.int64()).combine_chunks(),
                t.column(s).cast(pa.int64()).combine_chunks()]),
        }),
        batch_format="pyarrow",
    ).materialize()
    all_nodes = nodes.map_batches(
        lambda t, c=node_col: pa.table(
            {"node": t.column(c).cast(pa.int64())}),
        batch_format="pyarrow",
    ).materialize()

    def _tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "ea": t.column("ea"), "eb": t.column("eb"),
            "flag": pa.array(np.zeros(t.num_rows, np.int64)),
        })

    def _tag_keys(t: pa.Table, side: str) -> pa.Table:
        n = t.num_rows
        node = t.column("node")
        minus = pa.array(np.full(n, -1, np.int64))
        return pa.table({
            "ea": node if side == "ea" else minus,
            "eb": node if side == "eb" else minus,
            "flag": pa.array(np.ones(n, np.int64)),
        })

    def _semi(es, alive, side: str):
        """Edges of ``es`` whose ``side`` endpoint is in ``alive`` —
        reduce-side semi-join on the tagged union."""
        tagged = es.map_batches(_tag_edges, batch_format="pyarrow").union(
            alive.map_batches(lambda t, s=side: _tag_keys(t, s),
                              batch_format="pyarrow"))

        def emit(g: pa.Table) -> pa.Table:
            f = g.column("flag")
            if pc.max(f).as_py() != 1:  # key absent -> drop the group
                g = g.slice(0, 0)
            g = g.filter(pc.equal(g.column("flag"),
                                  pa.scalar(0, pa.int64())))
            return pa.table({"ea": g.column("ea"), "eb": g.column("eb")})

        return tagged.groupby(side).map_groups(emit, batch_format="pyarrow")

    alive = all_nodes
    for _ in range(rounds):
        both = _semi(_semi(ue, alive, "ea"), alive, "eb")
        deg = both.groupby("ea").count()
        alive = deg.map_batches(
            lambda t, kk=k: pa.table({"node": t.column("ea")})
                .filter(pc.greater_equal(
                    t.column("count()").cast(pa.int64()),
                    pa.scalar(kk, pa.int64()))),
            batch_format="pyarrow",
        ).materialize()

    # membership = union(all tagged 0, alive tagged 1) -> groupby.max
    mark = all_nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "in_p": pa.array(np.zeros(t.num_rows, np.int64))}),
        batch_format="pyarrow",
    ).union(alive.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "in_p": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow",
    ))
    return (
        mark.groupby("node").max("in_p")
        .map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "in_core": t.column("max(in_p)").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .sort("node")
    )
