"""Distributed PageRank over an edge list — the iterative-graph-algorithm
shape (power iteration) expressed Ray-Data-first, the same way
``ops.dedup.dup_groups`` expresses label propagation.

Three adaptive execution paths, gated by MEASURED byte sizes (the same
device as ``relational.adaptive_semi_join`` and ``dup_groups``'s driver
union-find cutoff):

* **indexed-driver** — when the integer-indexed edge list fits under
  ``edge_driver_cutoff`` bytes, collect it ONCE and run every power
  iteration in pure numpy on the driver: zero Ray executions in the
  loop. Edges are indexed distributedly first (``pc.index_in`` against a
  broadcast node array), so the driver holds two int32 columns, never
  the string keys.
* **indexed-broadcast** — edges too big to collect, node set under
  ``node_gate`` bytes: the rank vector lives on the driver and is
  ``ray.put`` each iteration; every edge block contributes a SPARSE
  per-destination partial (``np.unique`` + ``np.bincount`` — vectorized,
  no join), finished by one node-sized ``grouped_agg``. Per-iteration
  cost is one map + one small aggregate — no per-iteration join, no
  edge shuffle ever (edges are indexed once and re-read from the object
  store).
* **join** — open keyspace (node set exceeds the gate): the fallback
  keeps everything as Dataset ops — one size-gated equi-join
  (edges x ranks), one grouped sum, one damping map per iteration; the
  driver holds only scalars.

Determinism device (shared with ``ops.similarity.kmeans``): every rank is
rounded with the vectorized ``np.round`` kernel (:func:`_round_vec`) at
``round_digits`` after each iteration, so float sum-order differences
across block layouts / paths (~1e-16 per term) never accumulate past the
rounding grain — all three paths are bit-equal to a straight-line
single-process recompute of the same spec
(``sources.gold_derived.write_pagerank_gold``, same kernel), and tests
force each path and compare exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pagerank(edges, *, damping: float = 0.85, iters: int = 10,
             src_col: str = "src", dst_col: str = "dst",
             round_digits: int = 9, seeds=None,
             edge_driver_cutoff: int = 64 << 20,
             node_gate: int = 64 << 20):
    """-> (node, rank) after ``iters`` power iterations with uniform
    teleport. Dangling nodes (no out-edges) redistribute their mass
    uniformly each iteration (the standard correction). ``edges`` is a
    DIRECTED pair list; parallel duplicate edges should be deduplicated
    by the caller (each row contributes once). Rows with a NULL endpoint
    are dropped (a half-specified edge has no graph meaning and would
    silently skew the source's out-degree).

    ``seeds`` switches to PERSONALIZED PageRank (Haveliwala 2002):
    teleport and dangling mass land uniformly on the seed set instead of
    all nodes — relevance ranking AROUND a watchlist rather than global
    importance. Seeds absent from the graph are ignored; raises
    ``ValueError`` if none remain (an empty teleport distribution has no
    meaning).

    ``edge_driver_cutoff`` / ``node_gate`` pick the execution path (see
    module docstring); pass 0 to force the next-wider path (both 0 =
    join path, the pure-Dataset shape).
    """
    import ray.data as rd

    from easyner_ray.ops.relational import grouped_agg

    edges = edges.select_columns([src_col, dst_col]).map_batches(
        lambda t: t.drop_null(), batch_format="pyarrow").materialize()

    def half(col, name):
        return edges.map_batches(
            lambda t, c=col, n=name: pa.Table.from_arrays(
                [t.column(c)], names=[n]),
            batch_format="pyarrow")

    nodes_ds = grouped_agg(
        half(src_col, "node").union(half(dst_col, "node")),
        ["node"], [("node", "count", "__c")],
    ).select_columns(["node"]).materialize()
    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.float64())],
            names=["node", "rank"]))

    if nodes_ds.size_bytes() > node_gate:
        return _pagerank_join(edges, nodes_ds, n_nodes, damping=damping,
                              iters=iters, src_col=src_col,
                              dst_col=dst_col, round_digits=round_digits,
                              seeds=seeds)

    # ---- node set fits: build the integer index (sorted for a stable
    # node->idx assignment regardless of block layout), index the edges
    # distributedly, and never touch the string keys again.
    import ray

    node_arr = _collect_column(nodes_ds, "node")
    node_arr = node_arr.take(pc.sort_indices(node_arr))
    node_ref = ray.put(node_arr)

    tele = None  # dense teleport vector (seeded runs only)
    if seeds is not None:
        mask = pc.is_in(node_arr, value_set=pa.array(
            sorted(set(seeds)), pa.string())).to_numpy(zero_copy_only=False)
        if not mask.any():
            raise ValueError("personalized pagerank: no seed is in the graph")
        tele = mask.astype(np.float64) / float(mask.sum())

    def index_edges(t: pa.Table, ref=node_ref, s=src_col, d=dst_col):
        nodes = ray.get(ref)  # plasma-cached, zero-copy per worker
        return pa.Table.from_arrays(
            [pc.index_in(t.column(s), value_set=nodes).cast(pa.int64()),
             pc.index_in(t.column(d), value_set=nodes).cast(pa.int64())],
            names=["s", "d"])

    edges_idx = edges.map_batches(index_edges,
                                  batch_format="pyarrow").materialize()
    base = (1.0 - damping) / n_nodes

    if edges_idx.size_bytes() <= edge_driver_cutoff:
        # indexed-driver: one collect of two int64 columns, then the
        # whole power iteration is numpy — zero Ray executions in the loop
        et = pa.concat_tables([ray.get(r) for r in edges_idx.to_arrow_refs()])
        s = et.column("s").combine_chunks().to_numpy(zero_copy_only=False)
        d = et.column("d").combine_chunks().to_numpy(zero_copy_only=False)
        deg = np.bincount(s, minlength=n_nodes).astype(np.float64)
        rank = (np.full(n_nodes, _round_scalar(1.0 / n_nodes, round_digits))
                if tele is None else _round_vec(tele, round_digits))
        live = deg > 0
        for _ in range(iters):
            dangling = float(rank[~live].sum())
            share = np.zeros(n_nodes)
            share[live] = rank[live] / deg[live]
            inc = np.bincount(d, weights=share[s], minlength=n_nodes)
            if tele is None:
                rank = _round_vec(base + damping * (inc + dangling / n_nodes),
                                  round_digits)
            else:
                rank = _round_vec((1.0 - damping) * tele
                                  + damping * (inc + dangling * tele),
                                  round_digits)
        return rd.from_arrow(pa.Table.from_arrays(
            [node_arr, pa.array(rank, pa.float64())], names=["node", "rank"]))

    # indexed-broadcast: rank vector on the driver (node-sized, under the
    # gate), re-broadcast each iteration; per-block SPARSE bincount
    # partials + one node-sized grouped sum — no join, no edge shuffle.
    deg_tbl = pa.concat_tables([ray.get(r) for r in grouped_agg(
        edges_idx, ["s"], [("d", "count", "deg")]).to_arrow_refs()])
    deg = np.zeros(n_nodes)
    deg[deg_tbl.column("s").combine_chunks().to_numpy(zero_copy_only=False)] = \
        deg_tbl.column("deg").combine_chunks().to_numpy(zero_copy_only=False)
    live = deg > 0

    rank = (np.full(n_nodes, _round_scalar(1.0 / n_nodes, round_digits))
            if tele is None else _round_vec(tele, round_digits))
    for _ in range(iters):
        dangling = float(rank[~live].sum())
        share = np.zeros(n_nodes)
        share[live] = rank[live] / deg[live]
        share_ref = ray.put(share)

        def partial(t: pa.Table, ref=share_ref) -> pa.Table:
            sh = ray.get(ref)
            s_i = t.column("s").combine_chunks().to_numpy(zero_copy_only=False)
            d_i = t.column("d").combine_chunks().to_numpy(zero_copy_only=False)
            u, inv = np.unique(d_i, return_inverse=True)
            return pa.Table.from_arrays(
                [pa.array(u, pa.int64()),
                 pa.array(np.bincount(inv, weights=sh[s_i]), pa.float64())],
                names=["i", "inc"])

        inc_tbl = pa.concat_tables([ray.get(r) for r in grouped_agg(
            edges_idx.map_batches(partial, batch_format="pyarrow"),
            ["i"], [("inc", "sum", "inc")]).to_arrow_refs()])
        inc = np.zeros(n_nodes)
        inc[inc_tbl.column("i").combine_chunks().to_numpy(zero_copy_only=False)] = \
            inc_tbl.column("inc").combine_chunks().to_numpy(zero_copy_only=False)
        if tele is None:
            rank = _round_vec(base + damping * (inc + dangling / n_nodes),
                              round_digits)
        else:
            rank = _round_vec((1.0 - damping) * tele
                              + damping * (inc + dangling * tele),
                              round_digits)

    return rd.from_arrow(pa.Table.from_arrays(
        [node_arr, pa.array(rank, pa.float64())], names=["node", "rank"]))


def _collect_column(ds, col: str) -> pa.Array:
    """Materialized node-sized dataset -> one combined Arrow array on the
    driver (callers gate on ``size_bytes()`` first)."""
    import ray

    tbl = pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])
    return tbl.column(col).combine_chunks()


def _round_vec(vals: np.ndarray, digits: int) -> np.ndarray:
    """The shared rounding grain, as a whole-column numpy kernel.

    ``np.round`` (scale, rint half-even, unscale) can be one ulp off
    Python's decimal-correct ``round`` on some halfway values — but the
    grain is self-imposed (it only exists to absorb ~1e-16 sum-order
    noise across block layouts), so WHICH half-even kernel is used is
    arbitrary as long as the engine, the gold recompute
    (``sources.gold_derived.write_pagerank_gold``) and the tests all use
    the SAME one. numpy's is vectorized; Python's is a per-element loop
    that dominated the join path's per-iteration map at scale."""
    return np.round(np.asarray(vals, dtype=np.float64), digits)


def _round_scalar(v: float, digits: int) -> float:
    """Scalar form of :func:`_round_vec` (same kernel, bit-identical)."""
    return float(np.round(np.float64(v), digits))


def _pagerank_join(edges, nodes_ds, n_nodes, *, damping, iters,
                   src_col, dst_col, round_digits, seeds=None):
    """Open-keyspace fallback: every structure stays a Dataset; one
    size-gated join + one grouped sum + one damping map per iteration.
    Seeded (personalized) runs carry a per-node ``__tele`` column —
    is_seed/n_seeds — instead of a dense driver-held vector."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    deg = grouped_agg(edges, [src_col], [(dst_col, "count", "deg")])

    # nodes ⟕ deg: dangling nodes carry deg NULL
    nd = adaptive_join(nodes_ds, deg, on="node", right_on=src_col,
                       how="left").materialize()

    if seeds is not None:
        seed_arr = pa.array(sorted(set(seeds)), pa.string())
        nd = nd.map_batches(
            lambda t: t.append_column(
                "__seed", pc.is_in(t.column("node"), value_set=seed_arr)
                .cast(pa.int64())),
            batch_format="pyarrow").materialize()
        n_seeds = sum(p["m"] for p in nd.map_batches(
            lambda t: pa.Table.from_pydict(
                {"m": [int(pc.sum(t.column("__seed")).as_py() or 0)]}),
            batch_format="pyarrow").take_all())
        if n_seeds == 0:
            raise ValueError("personalized pagerank: no seed is in the graph")

        def init_tele(t: pa.Table) -> pa.Table:
            tele = pc.divide(t.column("__seed").cast(pa.float64()),
                             float(n_seeds))
            t = t.append_column("__tele", tele)
            return t.append_column("rank", pa.array(_round_vec(
                tele.combine_chunks().to_numpy(zero_copy_only=False),
                round_digits), pa.float64())).drop(["__seed"])

        ranks = nd.map_batches(init_tele,
                               batch_format="pyarrow").materialize()
        carry = ["node", "deg", "__tele", "rank"]
    else:
        init = _round_scalar(1.0 / n_nodes, round_digits)
        ranks = nd.map_batches(
            lambda t: t.append_column("rank", pa.array([init] * len(t),
                                                       pa.float64())),
            batch_format="pyarrow").materialize()
        carry = ["node", "deg", "rank"]

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
            inc = t.column("inc").combine_chunks().fill_null(0.0).to_numpy(
                zero_copy_only=False)
            if seeds is None:
                vals = _round_vec(b + d * (inc + dg / n), round_digits)
            else:
                tv = t.column("__tele").combine_chunks().to_numpy(
                    zero_copy_only=False)
                vals = _round_vec((1.0 - d) * tv + d * (inc + dg * tv),
                                  round_digits)
            i = t.schema.get_field_index("rank")
            t = t.set_column(i, "rank", pa.array(vals, pa.float64()))
            return t.drop(["inc"])

        # nodes with no inbound edges keep only teleport + dangling share
        ranks = adaptive_join(
            ranks.select_columns(carry), incoming,
            on="node", how="left",
        ).map_batches(apply_damping, batch_format="pyarrow").materialize()

    return ranks.select_columns(["node", "rank"])


def eigencentrality(edges, *, weight_col: str | None = None,
                    iters: int = 20, src_col: str = "src",
                    dst_col: str = "dst", round_digits: int = 9,
                    edge_driver_cutoff: int = 64 << 20,
                    node_gate: int = 64 << 20):
    """Eigenvector centrality by shifted power iteration:
    ``x <- (A + I) x / ||(A + I) x||_2`` for ``iters`` rounds from the
    uniform unit vector -> ``(node, score)``. The identity shift keeps
    the eigenvectors of ``A`` while making the dominant eigenvalue
    strictly largest in magnitude, so bipartite graphs (eigenvalues
    ±λ) converge instead of oscillating with period 2 — the standard
    power-iteration regularization. ``edges`` is a directed pair list
    (pass both orientations for an undirected graph — the KG edge table
    already is); an optional ``weight_col`` weights the adjacency
    (Bonacich 1972 / weighted Newman form); the shift itself is always
    unit. Rows with a NULL endpoint are dropped.

    Same three adaptive execution paths and byte gates as
    :func:`pagerank` (module docstring), and the same determinism
    device: every score is re-rounded with :func:`_round_vec` after each
    normalize, so ~1e-16 sum-order noise (including the join path's
    block-ordered norm reduce) never accumulates past the grain — all
    paths bit-equal to the straight-line gold recompute
    (``sources.gold_derived.write_eigencentrality_gold``)."""
    import ray.data as rd

    from easyner_ray.ops.relational import grouped_agg

    keep = [src_col, dst_col] + ([weight_col] if weight_col else [])
    edges = edges.select_columns(keep).map_batches(
        lambda t: t.drop_null(), batch_format="pyarrow").materialize()

    def half(col, name):
        return edges.map_batches(
            lambda t, c=col, n=name: pa.Table.from_arrays(
                [t.column(c)], names=[n]),
            batch_format="pyarrow")

    nodes_ds = grouped_agg(
        half(src_col, "node").union(half(dst_col, "node")),
        ["node"], [("node", "count", "__c")],
    ).select_columns(["node"]).materialize()
    n_nodes = nodes_ds.count()
    empty = pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.float64())],
        names=["node", "score"])
    if n_nodes == 0:
        return rd.from_arrow(empty)

    if nodes_ds.size_bytes() > node_gate:
        return _eigencentrality_join(
            edges, nodes_ds, n_nodes, weight_col=weight_col, iters=iters,
            src_col=src_col, dst_col=dst_col, round_digits=round_digits)

    import ray

    node_arr = _collect_column(nodes_ds, "node")
    node_arr = node_arr.take(pc.sort_indices(node_arr))
    node_ref = ray.put(node_arr)

    def index_edges(t: pa.Table, ref=node_ref, s=src_col, d=dst_col,
                    w=weight_col):
        nodes = ray.get(ref)
        cols = [pc.index_in(t.column(s), value_set=nodes).cast(pa.int64()),
                pc.index_in(t.column(d), value_set=nodes).cast(pa.int64())]
        cols.append(t.column(w).cast(pa.float64()) if w else
                    pa.array(np.ones(len(t)), pa.float64()))
        return pa.Table.from_arrays(cols, names=["s", "d", "w"])

    edges_idx = edges.map_batches(index_edges,
                                  batch_format="pyarrow").materialize()
    x = np.full(n_nodes, _round_scalar(1.0 / np.sqrt(n_nodes),
                                       round_digits))

    if edges_idx.size_bytes() <= edge_driver_cutoff:
        # indexed-driver: numpy loop, zero Ray executions per iteration
        et = pa.concat_tables([ray.get(r) for r in edges_idx.to_arrow_refs()])
        s = et.column("s").combine_chunks().to_numpy(zero_copy_only=False)
        d = et.column("d").combine_chunks().to_numpy(zero_copy_only=False)
        w = et.column("w").combine_chunks().to_numpy(zero_copy_only=False)
        for _ in range(iters):
            inc = np.bincount(d, weights=w * x[s], minlength=n_nodes) + x
            nrm = float(np.sqrt(np.sum(inc * inc)))
            if nrm == 0.0:
                break
            x = _round_vec(inc / nrm, round_digits)
        return rd.from_arrow(pa.Table.from_arrays(
            [node_arr, pa.array(x, pa.float64())], names=["node", "score"]))

    # indexed-broadcast: x on the driver, re-broadcast per iteration;
    # sparse per-block bincount partials + one node-sized grouped sum.
    for _ in range(iters):
        x_ref = ray.put(x)

        def partial(t: pa.Table, ref=x_ref) -> pa.Table:
            xv = ray.get(ref)
            s_i = t.column("s").combine_chunks().to_numpy(zero_copy_only=False)
            d_i = t.column("d").combine_chunks().to_numpy(zero_copy_only=False)
            w_i = t.column("w").combine_chunks().to_numpy(zero_copy_only=False)
            u, inv = np.unique(d_i, return_inverse=True)
            return pa.Table.from_arrays(
                [pa.array(u, pa.int64()),
                 pa.array(np.bincount(inv, weights=w_i * xv[s_i]),
                          pa.float64())],
                names=["i", "inc"])

        inc_tbl = pa.concat_tables([ray.get(r) for r in grouped_agg(
            edges_idx.map_batches(partial, batch_format="pyarrow"),
            ["i"], [("inc", "sum", "inc")]).to_arrow_refs()])
        inc = np.zeros(n_nodes)
        inc[inc_tbl.column("i").combine_chunks().to_numpy(
            zero_copy_only=False)] = \
            inc_tbl.column("inc").combine_chunks().to_numpy(
                zero_copy_only=False)
        inc += x  # identity shift
        nrm = float(np.sqrt(np.sum(inc * inc)))
        if nrm == 0.0:
            break
        x = _round_vec(inc / nrm, round_digits)

    return rd.from_arrow(pa.Table.from_arrays(
        [node_arr, pa.array(x, pa.float64())], names=["node", "score"]))


def _eigencentrality_join(edges, nodes_ds, n_nodes, *, weight_col, iters,
                          src_col, dst_col, round_digits):
    """Open-keyspace fallback: one size-gated join + one grouped sum +
    one normalize map per iteration; the driver holds only the norm
    scalar (block-ordered reduce — differences vs the dense paths are
    ~1e-16 relative and absorbed by the rounding grain)."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    init = _round_scalar(1.0 / np.sqrt(n_nodes), round_digits)
    xs = nodes_ds.map_batches(
        lambda t: t.append_column("score", pa.array([init] * len(t),
                                                    pa.float64())),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        def contrib(t: pa.Table, w=weight_col) -> pa.Table:
            val = t.column("score")
            if w:
                val = pc.multiply(val, t.column(w).cast(pa.float64()))
            return pa.Table.from_arrays([t.column(dst_col), val],
                                        names=["node", "val"])

        incoming = grouped_agg(
            adaptive_join(edges, xs, on=src_col, right_on="node")
            .map_batches(contrib, batch_format="pyarrow"),
            ["node"], [("val", "sum", "inc")])

        def shift(t: pa.Table) -> pa.Table:
            # identity shift: y = (A x)[node] + x[node], nodes with no
            # inbound contribution carry the shift term alone
            inc = pc.coalesce(t.column("inc"), 0.0)
            y = pc.add(inc, t.column("score"))
            return pa.Table.from_arrays([t.column("node"), y],
                                        names=["node", "y"])

        ys = adaptive_join(
            xs.select_columns(["node", "score"]), incoming,
            on="node", how="left",
        ).map_batches(shift, batch_format="pyarrow").materialize()

        sq_parts = ys.map_batches(
            lambda t: pa.Table.from_pydict({"m": [float(pc.sum(
                pc.multiply(t.column("y"), t.column("y"))
            ).as_py() or 0.0)]}),
            batch_format="pyarrow").take_all()
        nrm = float(np.sqrt(sum(p["m"] for p in sq_parts)))
        if nrm == 0.0:
            break

        def normalize(t: pa.Table, nv=nrm) -> pa.Table:
            vals = _round_vec(t.column("y").combine_chunks().to_numpy(
                zero_copy_only=False) / nv, round_digits)
            return pa.Table.from_arrays(
                [t.column("node"), pa.array(vals, pa.float64())],
                names=["node", "score"])

        xs = ys.map_batches(normalize, batch_format="pyarrow").materialize()

    return xs.select_columns(["node", "score"])


def hits(edges, *, weight_col: str | None = None, iters: int = 20,
         src_col: str = "src", dst_col: str = "dst",
         round_digits: int = 9, edge_driver_cutoff: int = 64 << 20,
         node_gate: int = 64 << 20):
    """HITS hubs and authorities (Kleinberg 1999) over a DIRECTED edge
    list -> ``(node, hub, authority)``. Per iteration, authorities pull
    from the hubs pointing AT them, then hubs pull from the authorities
    they point TO, each L2-normalized::

        a <- A^T h / ||A^T h||_2 ;  h <- A a / ||A a||_2

    Unlike :func:`eigencentrality` no identity shift is needed: the
    implicit iteration matrices ``A^T A`` / ``A A^T`` are positive
    semidefinite, so power iteration cannot oscillate. An optional
    ``weight_col`` weights the adjacency; rows with a NULL endpoint are
    dropped. Nodes with no in-edges hold authority 0, no out-edges hub
    0. Meaningful only on a genuinely directed graph (on a symmetric
    edge table hub == authority == eigenvector centrality); the KG's
    directed surface is the turn-transition graph
    (``graph_analytics.transition_edges``).

    Same three adaptive execution paths and byte gates as
    :func:`pagerank` / :func:`eigencentrality` (indexed-driver under
    ``edge_driver_cutoff``, indexed-broadcast under ``node_gate``,
    open-keyspace join fallback above), and the same determinism
    device: both vectors re-round through :func:`_round_vec` after
    every normalize, so block-order sum noise never accumulates past
    the grain — all paths bit-equal to the straight-line gold
    (``sources.gold_derived.write_hits_gold``)."""
    import ray.data as rd

    from easyner_ray.ops.relational import grouped_agg

    keep = [src_col, dst_col] + ([weight_col] if weight_col else [])
    edges = edges.select_columns(keep).map_batches(
        lambda t: t.drop_null(), batch_format="pyarrow").materialize()

    def half(col, name):
        return edges.map_batches(
            lambda t, c=col, n=name: pa.Table.from_arrays(
                [t.column(c)], names=[n]),
            batch_format="pyarrow")

    nodes_ds = grouped_agg(
        half(src_col, "node").union(half(dst_col, "node")),
        ["node"], [("node", "count", "__c")],
    ).select_columns(["node"]).materialize()
    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.float64()),
             pa.array([], pa.float64())],
            names=["node", "hub", "authority"]))

    if nodes_ds.size_bytes() > node_gate:
        return _hits_join(edges, nodes_ds, n_nodes, weight_col=weight_col,
                          iters=iters, src_col=src_col, dst_col=dst_col,
                          round_digits=round_digits)

    import ray

    node_arr = _collect_column(nodes_ds, "node")
    node_arr = node_arr.take(pc.sort_indices(node_arr))
    node_ref = ray.put(node_arr)

    def index_edges(t: pa.Table, ref=node_ref, s=src_col, d=dst_col,
                    w=weight_col):
        nodes = ray.get(ref)
        cols = [pc.index_in(t.column(s), value_set=nodes).cast(pa.int64()),
                pc.index_in(t.column(d), value_set=nodes).cast(pa.int64())]
        cols.append(t.column(w).cast(pa.float64()) if w else
                    pa.array(np.ones(len(t)), pa.float64()))
        return pa.Table.from_arrays(cols, names=["s", "d", "w"])

    edges_idx = edges.map_batches(index_edges,
                                  batch_format="pyarrow").materialize()
    init = _round_scalar(1.0 / np.sqrt(n_nodes), round_digits)
    h = np.full(n_nodes, init)
    a = np.full(n_nodes, init)

    def out(hv, av):
        return rd.from_arrow(pa.Table.from_arrays(
            [node_arr, pa.array(hv, pa.float64()),
             pa.array(av, pa.float64())],
            names=["node", "hub", "authority"]))

    if edges_idx.size_bytes() <= edge_driver_cutoff:
        # indexed-driver: numpy loop, zero Ray executions per iteration
        et = pa.concat_tables([ray.get(r) for r in edges_idx.to_arrow_refs()])
        s = et.column("s").combine_chunks().to_numpy(zero_copy_only=False)
        d = et.column("d").combine_chunks().to_numpy(zero_copy_only=False)
        w = et.column("w").combine_chunks().to_numpy(zero_copy_only=False)
        for _ in range(iters):
            inc_a = np.bincount(d, weights=w * h[s], minlength=n_nodes)
            na = float(np.sqrt(np.sum(inc_a * inc_a)))
            if na == 0.0:
                break
            a = _round_vec(inc_a / na, round_digits)
            inc_h = np.bincount(s, weights=w * a[d], minlength=n_nodes)
            nh = float(np.sqrt(np.sum(inc_h * inc_h)))
            if nh == 0.0:
                break
            h = _round_vec(inc_h / nh, round_digits)
        return out(h, a)

    # indexed-broadcast: both vectors on the driver, re-broadcast per
    # half-step; sparse per-block bincount partials + a grouped sum.
    def pull(vec_ref, from_col, to_col):
        def partial(t: pa.Table, ref=vec_ref) -> pa.Table:
            xv = ray.get(ref)
            f = t.column(from_col).combine_chunks().to_numpy(
                zero_copy_only=False)
            g = t.column(to_col).combine_chunks().to_numpy(
                zero_copy_only=False)
            w_i = t.column("w").combine_chunks().to_numpy(
                zero_copy_only=False)
            u, inv = np.unique(g, return_inverse=True)
            return pa.Table.from_arrays(
                [pa.array(u, pa.int64()),
                 pa.array(np.bincount(inv, weights=w_i * xv[f]),
                          pa.float64())],
                names=["i", "inc"])

        inc_tbl = pa.concat_tables([ray.get(r) for r in grouped_agg(
            edges_idx.map_batches(partial, batch_format="pyarrow"),
            ["i"], [("inc", "sum", "inc")]).to_arrow_refs()])
        inc = np.zeros(n_nodes)
        inc[inc_tbl.column("i").combine_chunks().to_numpy(
            zero_copy_only=False)] = \
            inc_tbl.column("inc").combine_chunks().to_numpy(
                zero_copy_only=False)
        return inc

    for _ in range(iters):
        inc_a = pull(ray.put(h), "s", "d")
        na = float(np.sqrt(np.sum(inc_a * inc_a)))
        if na == 0.0:
            break
        a = _round_vec(inc_a / na, round_digits)
        inc_h = pull(ray.put(a), "d", "s")
        nh = float(np.sqrt(np.sum(inc_h * inc_h)))
        if nh == 0.0:
            break
        h = _round_vec(inc_h / nh, round_digits)
    return out(h, a)


def _hits_join(edges, nodes_ds, n_nodes, *, weight_col, iters,
               src_col, dst_col, round_digits):
    """Open-keyspace fallback: per half-step one size-gated join + one
    grouped sum + one normalize map; the driver holds only the norm
    scalar (block-ordered reduce — ~1e-16 relative noise absorbed by
    the rounding grain, same argument as ``_eigencentrality_join``)."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    init = _round_scalar(1.0 / np.sqrt(n_nodes), round_digits)

    def const_vec(name):
        return nodes_ds.map_batches(
            lambda t, nm=name: t.append_column(
                nm, pa.array([init] * len(t), pa.float64())),
            batch_format="pyarrow").materialize()

    hs, as_ = const_vec("hub"), const_vec("authority")

    def half_step(vec_ds, vec_name, join_col, emit_col, out_name):
        """vec on ``join_col`` endpoints -> normalized pull onto
        ``emit_col`` endpoints, returned as (node, out_name)."""
        def contrib(t: pa.Table, w=weight_col) -> pa.Table:
            val = t.column(vec_name)
            if w:
                val = pc.multiply(val, t.column(w).cast(pa.float64()))
            return pa.Table.from_arrays([t.column(emit_col), val],
                                        names=["node", "val"])

        incoming = grouped_agg(
            adaptive_join(edges, vec_ds, on=join_col, right_on="node")
            .map_batches(contrib, batch_format="pyarrow"),
            ["node"], [("val", "sum", "inc")])

        ys = adaptive_join(
            nodes_ds, incoming, on="node", how="left",
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node"), pc.coalesce(t.column("inc"), 0.0)],
                names=["node", "y"]),
            batch_format="pyarrow").materialize()

        sq_parts = ys.map_batches(
            lambda t: pa.Table.from_pydict({"m": [float(pc.sum(
                pc.multiply(t.column("y"), t.column("y"))
            ).as_py() or 0.0)]}),
            batch_format="pyarrow").take_all()
        nrm = float(np.sqrt(sum(p["m"] for p in sq_parts)))
        if nrm == 0.0:
            return None

        def normalize(t: pa.Table, nv=nrm) -> pa.Table:
            vals = _round_vec(t.column("y").combine_chunks().to_numpy(
                zero_copy_only=False) / nv, round_digits)
            return pa.Table.from_arrays(
                [t.column("node"), pa.array(vals, pa.float64())],
                names=["node", out_name])

        return ys.map_batches(normalize,
                              batch_format="pyarrow").materialize()

    for _ in range(iters):
        na = half_step(hs, "hub", src_col, dst_col, "authority")
        if na is None:
            break
        as_ = na
        nh = half_step(as_, "authority", dst_col, src_col, "hub")
        if nh is None:
            break
        hs = nh

    joined = adaptive_join(hs, as_.map_batches(
        lambda t: t.rename_columns(["__n", "authority"]),
        batch_format="pyarrow"), on="node", right_on="__n")
    return joined.select_columns(["node", "hub", "authority"])
