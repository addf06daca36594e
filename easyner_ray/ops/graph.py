"""Distributed PageRank over an edge list — the iterative-graph-algorithm
shape (power iteration) expressed entirely in Dataset ops, the same way
``ops.dedup.dup_groups`` expresses label propagation.

Per iteration: one equi-join (edges x ranks on src — size-gated
broadcast/hash via :func:`~easyner_ray.ops.relational.adaptive_join`, so
a node table under the gate never shuffles and a corpus-scale one takes
the hash path), one grouped sum per dst, one map applying the damping
formula. The driver holds only scalars (node count, per-iteration
dangling mass); rank tables are node-sized datasets, materialized once
per iteration because each is consumed twice (join side + dangling-mass
aggregate).

Determinism device (shared with ``ops.similarity.kmeans``): every rank is
rounded with Python ``round`` at ``round_digits`` after each iteration,
so float sum-order differences across block layouts (~1e-16 per term)
never accumulate past the rounding grain — engine output is bit-equal to
a straight-line single-process recompute of the same spec
(``sources.gold_derived.write_pagerank_gold``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def pagerank(edges, *, damping: float = 0.85, iters: int = 10,
             src_col: str = "src", dst_col: str = "dst",
             round_digits: int = 9):
    """-> (node, rank) after ``iters`` power iterations with uniform
    teleport. Dangling nodes (no out-edges) redistribute their mass
    uniformly each iteration (the standard correction). ``edges`` is a
    DIRECTED pair list; parallel duplicate edges should be deduplicated
    by the caller (each row contributes once). Rows with a NULL endpoint
    are dropped (a half-specified edge has no graph meaning and would
    silently skew the source's out-degree).
    """
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    edges = edges.select_columns([src_col, dst_col]).map_batches(
        lambda t: t.drop_null(), batch_format="pyarrow").materialize()

    # out-degree per source; node set = distinct(src) U distinct(dst)
    deg = grouped_agg(edges, [src_col], [(dst_col, "count", "deg")])

    def half(col, name):
        return edges.map_batches(
            lambda t, c=col, n=name: pa.Table.from_arrays(
                [t.column(c)], names=[n]),
            batch_format="pyarrow")

    nodes = grouped_agg(
        half(src_col, "node").union(half(dst_col, "node")),
        ["node"], [("node", "count", "__c")],
    ).select_columns(["node"])

    # nodes ⟕ deg: dangling nodes carry deg NULL
    nd = adaptive_join(nodes, deg, on="node", right_on=src_col,
                       how="left").materialize()
    n_nodes = nd.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.float64())],
            names=["node", "rank"]))

    init = round(1.0 / n_nodes, round_digits)
    ranks = nd.map_batches(
        lambda t: t.append_column("rank", pa.array([init] * len(t),
                                                   pa.float64())),
        batch_format="pyarrow").materialize()

    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        # dangling mass: one scalar aggregate over the node-sized table
        dm_parts = ranks.map_batches(
            lambda t: pa.Table.from_pydict({"m": [float(pc.sum(
                t.filter(pc.is_null(t.column("deg"))).column("rank")
            ).as_py() or 0.0)]}),
            batch_format="pyarrow").take_all()
        dangling = sum(p["m"] for p in dm_parts)

        # per-edge contribution rank/deg, summed per destination
        def contrib(t: pa.Table) -> pa.Table:
            share = pc.divide(t.column("rank"),
                              t.column("deg").cast(pa.float64()))
            return pa.Table.from_arrays([t.column(dst_col), share],
                                        names=["node", "share"])

        incoming = grouped_agg(
            adaptive_join(edges, ranks, on=src_col, right_on="node")
            .map_batches(contrib, batch_format="pyarrow"),
            ["node"], [("share", "sum", "inc")])

        def apply_damping(t: pa.Table, d=damping, b=base, dg=dangling,
                          n=n_nodes) -> pa.Table:
            inc = t.column("inc").combine_chunks().fill_null(0.0)
            vals = [round(b + d * (v + dg / n), round_digits)
                    for v in inc.to_pylist()]
            i = t.schema.get_field_index("rank")
            t = t.set_column(i, "rank", pa.array(vals, pa.float64()))
            return t.drop(["inc"])

        # nodes with no inbound edges keep only teleport + dangling share
        ranks = adaptive_join(
            ranks.select_columns(["node", "deg", "rank"]), incoming,
            on="node", how="left",
        ).map_batches(apply_damping, batch_format="pyarrow").materialize()

    return ranks.select_columns(["node", "rank"])
