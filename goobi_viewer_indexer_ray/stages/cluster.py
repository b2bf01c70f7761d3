"""Near-dup cluster assignment: distributed connected components.

The dedup family (``stages/dedup.py``) emits PAIRS — (doc_a, doc_b)
edges from exact-shingle, MinHash-LSH, SimHash or embedding-cosine
comparison.  A training-data pipeline then needs the transitive
closure: every document labeled with a canonical cluster id so one
representative per cluster survives.  The reference's analog is the
group-doc dedup / URN keep-latest family (``Indexer.java`` group-doc
handling), which collapses groups by a shared key; here the group key
is not given but *derived* from the pair graph.

Two regimes, both ending in the same per-node labeling:

**Small pair graph (the common dedup case)** — the pair list is the
documented small side of this engine's dedup family (the same
argument as the MinHash-LSH candidate list): one row per *duplicate
relation*, not per document.  Up to ``small_graph_threshold`` edges
the closure runs as a driver-side union-find over the pair list and
the resulting label map is broadcast once (``ray.put``) for a
zero-shuffle ``map_batches`` assignment over the node stream.

**Large pair graph** — iterative min-label propagation, fully
distributed:

- state: a ``(node, lbl)`` Dataset over edge ENDPOINTS only,
  initialized ``lbl = node`` — nodes touching no edge are singletons
  whose label can never change, so they skip the loop entirely and
  rejoin at assignment time (each round shuffles O(|E|), not O(|V|));
- per round: symmetric edges hash-JOIN labels on ``src`` (Ray Data's
  ``Dataset.join``), every edge forwards its source's label to
  ``dst``, the forwarded messages union the current labels, and ONE
  ``groupby(node).min(lbl)`` produces the next state;
- convergence: labels only ever decrease, so the state sum is a
  monotone potential — the loop stops the first round the sum is
  unchanged (one tiny driver-side scalar per round, never the data).

Rounds needed = graph diameter (near-dup graphs are shallow: dup
clusters are cliques or short chains, so 2-4 rounds in practice).
For adversarially long paths at 100 TB the published alternative is
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) which converges in O(log n) rounds
over the same join+groupby primitives; the state/round shape below is
deliberately the same so that swap is local.

Scale notes: the loop state is one row per edge endpoint (ints only —
strings never enter the loop); each round is one hash join + one
groupby on the SAME integer key, so a fixed ``num_partitions`` keeps
partitioning stable across rounds; per-round ``materialize()``
checkpoints the state so lineage does not grow with iteration count.
Final assignment: ``assign="join"`` (one left-outer hash join, no
size assumption) or ``assign="broadcast"`` (zero-shuffle lookup,
valid when the label map fits the object store — implied by the
small-side argument above).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["connected_components"]


def _minroot_union_find(src: np.ndarray, dst: np.ndarray) -> dict[int, int]:
    """Driver-side closure over an edge list: node → min(component).
    Union by min-root with path compression; O(E α(E))."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(
    nodes,
    edges,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 8,
    max_rounds: int = 25,
    assign: str = "join",
    with_size: bool = False,
    small_graph_threshold: int = 1_000_000,
):
    """Label every node with ``min(node id over its component)``.

    ``nodes``: Dataset with ``node_col`` (one row per node; nodes
    absent from every edge keep their own id as the label).
    ``edges``: Dataset with ``src_col``/``dst_col`` (undirected; any
    orientation, duplicates tolerated).

    Returns a Dataset ``(node, cluster_id[, cluster_size])``, one row
    per input node.  ``with_size`` needs the label map on the driver,
    so it IMPLIES ``assign="broadcast"`` (validated here, up front —
    not after the propagation loop has burned its rounds).
    """
    import ray

    if with_size:
        assign = "broadcast"

    def to_sym(t: pa.Table) -> pa.Table:
        a = t.column(src_col).cast(pa.int64())
        b = t.column(dst_col).cast(pa.int64())
        return pa.table(
            {
                "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    sym = edges.map_batches(to_sym, batch_format="pyarrow").materialize()
    n_sym = sym.count()

    def self_labels(t: pa.Table) -> pa.Table:
        n = t.column(node_col).cast(pa.int64())
        out = {"node": n, "cluster_id": n}
        if with_size:
            out["cluster_size"] = pa.array(np.ones(len(n), np.int64))
        return pa.table(out)

    if n_sym == 0:  # no edges at all — every node a singleton
        return nodes.map_batches(self_labels, batch_format="pyarrow")

    def assign_broadcast(keys0: np.ndarray, vals0: np.ndarray):
        """Zero-shuffle assignment: ship the (sorted) label map once,
        stream nodes through a searchsorted lookup.  Cluster sizes are
        fully determined by the map (every member of a non-trivial
        cluster IS an edge endpoint; singletons have size 1)."""
        order = np.argsort(keys0, kind="stable")
        keys0, vals0 = keys0[order], vals0[order]
        su, sc = np.unique(vals0, return_counts=True) if with_size else (None, None)
        map_ref = ray.put((keys0, vals0, su, sc))

        def lookup(t: pa.Table) -> pa.Table:
            keys, vals, szk, szv = ray.get(map_ref)
            n = t.column(node_col).cast(pa.int64()).to_numpy()
            pos = np.clip(np.searchsorted(keys, n), 0, keys.size - 1)
            hit = keys[pos] == n
            cid = np.where(hit, vals[pos], n)
            out = {
                "node": pa.array(n, pa.int64()),
                "cluster_id": pa.array(cid, pa.int64()),
            }
            if szk is not None:
                sp = np.clip(np.searchsorted(szk, cid), 0, szk.size - 1)
                out["cluster_size"] = pa.array(
                    np.where(szk[sp] == cid, szv[sp], 1), pa.int64()
                )
            return pa.table(out)

        return nodes.map_batches(lookup, batch_format="pyarrow")

    if n_sym <= 2 * small_graph_threshold:
        # pair list is the documented small side: closure driver-side
        pairs = pa.concat_tables(
            sym.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        lbl = _minroot_union_find(
            pairs.column("src").to_numpy(), pairs.column("dst").to_numpy()
        )
        keys0 = np.fromiter(lbl.keys(), dtype=np.int64, count=len(lbl))
        vals0 = np.fromiter(lbl.values(), dtype=np.int64, count=len(lbl))
        return assign_broadcast(keys0, vals0)

    # ---- distributed min-label propagation over edge endpoints ----

    def seed(t: pa.Table) -> pa.Table:
        # batch-LOCAL distinct is enough: duplicate (node, node) seeds
        # across batches are idempotent under the loop's groupby-min,
        # so no dedicated distinct shuffle is spent on seeding
        n = np.unique(t.column("src").cast(pa.int64()).to_numpy())
        return pa.table({"node": pa.array(n, pa.int64()), "lbl": pa.array(n, pa.int64())})

    labels = (
        sym.map_batches(seed, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )

    def fwd(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("dst"), "lbl": t.column("lbl")})

    def rename_min(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "lbl": t.column("min(lbl)").cast(pa.int64()),
            }
        )

    prev_sum = None
    for _ in range(max_rounds):
        msgs = sym.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).map_batches(fwd, batch_format="pyarrow")
        labels = (
            labels.union(msgs)
            .groupby("node")
            .min("lbl")
            .map_batches(rename_min, batch_format="pyarrow")
            # groupby can emit zero-row blocks with an EMPTY schema;
            # pyarrow's join rejects such blocks on the build side
            # ("no match for FieldRef"), and repartition (a coalesce,
            # not a shuffle) squashes them before the next round's join
            .repartition(num_partitions)
            .materialize()
        )
        # monotone potential: sum(lbl) strictly decreases until fixpoint
        cur_sum = labels.sum("lbl")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")

    if assign == "broadcast":
        lbl_tbl = pa.concat_tables(
            labels.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        return assign_broadcast(
            lbl_tbl.column("node").to_numpy(), lbl_tbl.column("lbl").to_numpy()
        )

    def node_key(t: pa.Table) -> pa.Table:
        return pa.table({"n_": t.column(node_col).cast(pa.int64())})

    joined = nodes.map_batches(node_key, batch_format="pyarrow").join(
        labels,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("n_",),
        right_on=("node",),
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n_").cast(pa.int64())
        return pa.table(
            {
                "node": n,
                "cluster_id": pc.coalesce(t.column("lbl").cast(pa.int64()), n),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")
