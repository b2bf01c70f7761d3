"""Near-dup cluster assignment: distributed connected components.

The dedup family (``stages/dedup.py``) emits PAIRS — (doc_a, doc_b)
edges from exact-shingle, MinHash-LSH, SimHash or embedding-cosine
comparison.  A training-data pipeline then needs the transitive
closure: every document labeled with a canonical cluster id so one
representative per cluster survives.  The reference's analog is the
group-doc dedup / URN keep-latest family (``Indexer.java`` group-doc
handling), which collapses groups by a shared key; here the group key
is not given but *derived* from the pair graph.

Algorithm — iterative min-label propagation, fully distributed:

- state: a ``(node, lbl)`` Dataset over edge ENDPOINTS only,
  initialized ``lbl = node`` — nodes touching no edge are singletons
  whose label can never change, so they skip the loop entirely and
  rejoin through one final left-outer join (at corpus scale most
  documents are not near-dups: each round shuffles O(|E|), not
  O(|V|));
- per round: symmetric edges hash-JOIN labels on ``src`` (Ray Data's
  ``Dataset.join``, an all-to-all on the join key), every edge
  forwards its source's label to ``dst``, the forwarded messages
  union the current labels, and ONE ``groupby(node).min(lbl)``
  produces the next state;
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

Scale notes: the state is one row per node (ints only — strings never
enter the loop); each round is one hash join + one groupby, both on
the SAME integer key, so a fixed ``num_partitions`` keeps partitioning
stable across rounds; per-round ``materialize()`` checkpoints the
state so lineage does not grow with iteration count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["connected_components"]


def connected_components(
    nodes,
    edges,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 8,
    max_rounds: int = 25,
):
    """Label every node with ``min(node id over its component)``.

    ``nodes``: Dataset with ``node_col`` (one row per node; nodes
    absent from every edge keep their own id as the label).
    ``edges``: Dataset with ``src_col``/``dst_col`` (undirected; any
    orientation, duplicates tolerated).

    Returns a Dataset ``(node, cluster_id)``, one row per input node.
    """

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

    # Only edge ENDPOINTS enter the propagation loop: nodes touching no
    # edge are singletons whose label never changes, so at corpus scale
    # (most documents are not near-dups) every round shuffles O(|E|)
    # rows, not O(|V|); singletons rejoin once at the end.
    def seed(t: pa.Table) -> pa.Table:
        n = t.column("src").cast(pa.int64())
        return pa.table({"node": n, "lbl": n})

    labels = (
        sym.groupby("src")
        .min("dst")  # distinct-endpoints pass; the min(dst) is discarded
        .map_batches(seed, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )

    def self_labels(t: pa.Table) -> pa.Table:
        n = t.column(node_col).cast(pa.int64())
        return pa.table({"node": n, "cluster_id": n})

    if labels.count() == 0:  # no edges at all — every node a singleton
        return nodes.map_batches(self_labels, batch_format="pyarrow")

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

    # singletons rejoin: one left-outer join of the full node set
    # against the (edge-endpoint-only) fixpoint labels
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
