"""Iterative distributed graph algorithms over edge datasets.

``connected_components``: min-label propagation with pointer jumping —
the classic MapReduce/Pregel connected-components shape (hash-to-min
family, Rastogi et al. 2013, public).  Each round is a bounded set of
dataset-native shuffles; NOTHING graph-sized ever lands on the driver:

- propagate: each edge offers its source's current label to its target
  and vice versa (two hash joins on the label table);
- contract:  ``groupby(node).min(label)`` folds the offers;
- jump:      ``label ← label(label)`` (one self-join) halves chain
  depth, turning O(diameter) rounds into O(log diameter);
- converge:  labels only DECREASE under min-propagation, so the global
  ``sum(label)`` is strictly monotone until fixpoint — one tiny
  aggregate per round is the whole convergence check (no change-join).

Per-round ``materialize()`` is deliberate and required: an iterative
dataset algorithm must cut lineage at every round barrier or the lazy
plan re-executes all previous rounds per consumer; the materialized
table is O(nodes) rows of two int64 columns, the smallest state the
algorithm can carry.  Each round ALSO repartitions the label table to a
fixed block count before the barrier — the round's unions multiply
block counts, and without the repartition the per-round sort cost grows
geometrically with the accumulated (tiny) blocks (measured: rounds went
4 s → 30 s → 485 s on a 64-node chain before the fix).

Node ids are int64 (graph pipelines here key nodes by integer ids;
string-keyed graphs map ids to dense ints first — at web scale you
want that anyway so labels shuffle as fixed-width ints, not text).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_LBL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def _label_sum(labels) -> int:
    def part(b: pa.Table) -> pa.Table:
        s = pc.sum(b.column("label")).as_py() if b.num_rows else 0
        return pa.table({"s": pa.array([s or 0], pa.int64())})

    return sum(r["s"] for r in labels.map_batches(
        part, batch_format="pyarrow").take_all())


def _min_fold(pairs):
    """(node, label) rows → per-node min label."""
    return (
        pairs.groupby("node").min("label")
        .map_batches(lambda t: t.rename_columns(["node", "label"])
                     .cast(_LBL_SCHEMA),
                     batch_format="pyarrow")
    )


def connected_components(edges, *, src_col: str = "src",
                         dst_col: str = "dst", max_rounds: int = 25,
                         label_blocks: int = 8):
    """Edge dataset → ``(node, component)`` rows, component = the
    minimum node id reachable from the node (undirected semantics).

    Isolated nodes don't exist in an edge list; callers needing them
    union ``(n, n)`` rows for their node table afterwards."""
    import ray  # noqa: F401  (documented dependency of materialize)

    def endpoints(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or src_col not in b.schema.names:
            return _LBL_SCHEMA.empty_table()
        s = b.column(src_col).cast(pa.int64())
        d = b.column(dst_col).cast(pa.int64())
        return pa.table({
            "node": pa.concat_arrays([s.combine_chunks(),
                                      d.combine_chunks()]),
            "label": pa.concat_arrays([s.combine_chunks(),
                                       d.combine_chunks()]),
        }).cast(_LBL_SCHEMA)

    labels = _min_fold(
        edges.map_batches(endpoints, batch_format="pyarrow")
    ).repartition(label_blocks).materialize()
    prev_sum = _label_sum(labels)

    from docling_graph_ray.stages.joins import lookup_join

    def edge_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or src_col not in b.schema.names:
            return pa.schema([("a", pa.int64()),
                              ("b", pa.int64())]).empty_table()
        return pa.table({
            "a": b.column(src_col).cast(pa.int64()),
            "b": b.column(dst_col).cast(pa.int64()),
        })

    epairs = edges.map_batches(edge_pairs, batch_format="pyarrow")

    for _ in range(max_rounds):
        # propagate: attach each endpoint's label, offer it to the peer
        with_a = lookup_join(epairs, labels, on="a", key_col="node",
                             value_cols=["label"])

        def offers(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "label" not in b.schema.names:
                return _LBL_SCHEMA.empty_table()
            return pa.table({
                "node": b.column("b").cast(pa.int64()),
                "label": b.column("label").cast(pa.int64()),
            }).cast(_LBL_SCHEMA)

        with_b = lookup_join(epairs, labels, on="b", key_col="node",
                             value_cols=["label"])

        def offers_rev(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "label" not in b.schema.names:
                return _LBL_SCHEMA.empty_table()
            return pa.table({
                "node": b.column("a").cast(pa.int64()),
                "label": b.column("label").cast(pa.int64()),
            }).cast(_LBL_SCHEMA)

        # barrier: the pointer jump consumes prop TWICE (left + lookup
        # side of the self-join); without the materialize its 3-shuffle
        # plan executes twice per round
        prop = _min_fold(
            labels.union(
                with_a.map_batches(offers, batch_format="pyarrow"),
                with_b.map_batches(offers_rev, batch_format="pyarrow"),
            )
        ).repartition(label_blocks).materialize()

        # pointer jump: label <- label(label)
        jumped = lookup_join(
            prop.map_batches(
                lambda t: t.rename_columns(["node", "ptr"]),
                batch_format="pyarrow"),
            prop, on="ptr", key_col="node", value_cols=["label"],
        )

        def resolve(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "label" not in b.schema.names:
                return _LBL_SCHEMA.empty_table()
            lbl = pc.min_element_wise(
                pc.coalesce(b.column("label").cast(pa.int64()),
                            b.column("ptr").cast(pa.int64())),
                b.column("ptr").cast(pa.int64()),
            )
            return pa.table({
                "node": b.column("node").cast(pa.int64()),
                "label": lbl,
            }).cast(_LBL_SCHEMA)

        labels = jumped.map_batches(
            resolve, batch_format="pyarrow"
        ).repartition(label_blocks).materialize()

        cur = _label_sum(labels)
        if cur == prev_sum:
            break
        prev_sum = cur

    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow",
    )
