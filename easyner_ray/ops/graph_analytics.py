"""Graph analytics over the materialized knowledge graph.

The KG build (reference: EasyNER's analysis module stops at entity
frequency tables, ``analysis.py``) emits a node table and a weighted
co-occurrence edge table; this module adds the graph-side queries a KG
consumer runs NEXT: degree/strength profiles, 2-hop neighborhood sizes,
per-node triangle participation, connected components, and temporally
annotated edges (first/last co-occurrence from the transcript ``ts``
column).

Scale model: every function here consumes the EDGE table, not the
corpus. The edge keyspace is bounded by vocab^2 (and in practice by the
observed co-occurrence sparsity), so it is orders of magnitude smaller
than the mention stream that produced it — the expensive work (NER +
pair aggregation) already happened upstream. Joins therefore ride
:func:`easyner_ray.ops.relational.adaptive_join`: broadcast under the
64 MB gate, hash-shuffle partitioned above it. The one structural skew
risk — hub nodes fanning out in the wedge/2-hop joins — is the classic
one; the triangle kernel applies the standard degree-ordered orientation
so every wedge is rooted at its LOWEST-degree vertex, which bounds wedge
count by sum(min-degree per edge) instead of sum(degree^2).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "degree_stats",
    "two_hop_counts",
    "triangle_counts",
    "components",
    "temporal_edges",
]

_SEP = "\x1f"  # key joiner; never appears in normalized entity surface forms


def degree_stats(edges, *, src: str = "subj", dst: str = "obj",
                 weight: str = "weight"):
    """Per-node degree profile over a directed edge list that contains
    both orientations of each co-occurrence (the ``aggregate_edges``
    contract): -> (norm, degree, strength, max_edge_weight).

    ``degree`` counts distinct neighbors (the edge table is already
    grouped on (src, dst), so a plain count), ``strength`` sums edge
    weights. One two-phase grouped aggregate on a vocab-bounded keyspace
    — no corpus-sized shuffle."""
    from easyner_ray.ops.relational import grouped_agg

    out = grouped_agg(
        edges.map_batches(lambda t: t.select([src, dst, weight]),
                          batch_format="pyarrow"),
        [src],
        [(dst, "count", "degree"), (weight, "sum", "strength"),
         (weight, "max", "max_edge_weight")],
    )
    return out.map_batches(
        lambda t: t.rename_columns(["norm", "degree", "strength",
                                    "max_edge_weight"]),
        batch_format="pyarrow")


def two_hop_counts(edges, *, src: str = "subj", dst: str = "obj",
                   broadcast_bytes: int = 64 << 20):
    """Per-node count of DISTINCT nodes reachable in at most two hops
    (self excluded): -> (norm, n_within_2).

    Distinct pairs join distinct pairs on the middle node
    (:func:`adaptive_join`: broadcast under the gate, hash-shuffle
    above), union the direct edges, then a two-phase distinct + count.
    Hub middles fan out quadratically — on an open keyspace cap or
    sample hub adjacency before calling (the edge table here is
    vocab-bounded, which bounds the blowup by construction)."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    pairs = edges.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column(src), t.column(dst)], names=["a", "mid"]),
        batch_format="pyarrow").materialize()  # two consumers below

    right = pairs.map_batches(
        lambda t: t.rename_columns(["mid", "c"]), batch_format="pyarrow")
    hop2 = adaptive_join(pairs, right, on="mid",
                         broadcast_bytes=broadcast_bytes)
    hop2 = hop2.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("a"),
                                              t.column("c"))))
                   .select(["a", "c"]),
        batch_format="pyarrow")
    direct = pairs.map_batches(
        lambda t: t.rename_columns(["a", "c"]), batch_format="pyarrow")
    reach = hop2.union(direct)
    distinct = grouped_agg(reach, ["a", "c"], [("c", "count", "__n")]) \
        .select_columns(["a", "c"])
    counted = grouped_agg(distinct, ["a"], [("c", "count", "n_within_2")])
    return counted.map_batches(
        lambda t: t.rename_columns(["norm", "n_within_2"]),
        batch_format="pyarrow")


def _oriented(edges, src: str, dst: str):
    """Distinct undirected edges oriented low-degree -> high-degree
    (ties by name), as one driver-held Arrow table. The edge list is the
    GROUPED co-occurrence table (vocab^2-bounded), not the corpus; the
    orientation needs global degrees, so it runs where the degree table
    already fits. -> (table with columns a, b, key='a<SEP>b')."""
    import numpy as np
    import ray

    blocks = [b for b in ray.get(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow").to_arrow_refs())
        if len(b)]
    if not blocks:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string())})
    t = pa.concat_tables(blocks).combine_chunks()
    lo = pc.min_element_wise(t.column(src), t.column(dst))
    hi = pc.max_element_wise(t.column(src), t.column(dst))
    und = pa.table({"lo": lo, "hi": hi}) \
        .group_by(["lo", "hi"]).aggregate([]).combine_chunks()
    und = und.filter(pc.invert(pc.equal(und.column("lo"),
                                        und.column("hi"))))
    # degree over the undirected edge set
    nodes = pa.concat_arrays([und.column("lo").combine_chunks(),
                              und.column("hi").combine_chunks()])
    enc = nodes.dictionary_encode()
    deg = np.bincount(np.asarray(enc.indices),
                      minlength=len(enc.dictionary))
    codes = np.asarray(enc.indices)
    n = len(und)
    dlo, dhi = deg[codes[:n]], deg[codes[n:]]
    names_lo = und.column("lo").to_numpy(zero_copy_only=False)
    names_hi = und.column("hi").to_numpy(zero_copy_only=False)
    first_lo = (dlo < dhi) | ((dlo == dhi) & (names_lo < names_hi))
    a = np.where(first_lo, names_lo, names_hi)
    b = np.where(first_lo, names_hi, names_lo)
    return pa.table({"a": pa.array(a, pa.string()),
                     "b": pa.array(b, pa.string())})


def triangle_counts(edges, *, src: str = "subj", dst: str = "obj",
                    pair_budget: int = 1 << 22):
    """Per-node triangle participation count: -> (norm, n_triangles).

    Standard degree-ordered node-iterator: orient each undirected edge
    from its lower-degree endpoint, enumerate wedges (a->b, a->c) rooted
    at the low vertex, close them against the undirected edge-key set.
    Orientation bounds the wedge count by sum over edges of
    min(deg) — the arboricity bound — instead of the hub-quadratic
    sum(deg^2) a naive join pays.

    The oriented edge table is vocab^2-bounded (it is the GROUPED
    co-occurrence output, not the corpus), so it int-codes once on the
    driver and broadcasts via ``ray.put``; wedge enumeration + closure
    run distributed over root ranges in ``map_batches``, fully
    vectorized — per root: ``np.triu_indices`` neighbor pairs, one
    packed-uint64 ``searchsorted`` against the sorted undirected edge-key
    array for closure, ``np.bincount`` scatter into a vocab-sized count
    vector (no per-pair Python)."""
    import numpy as np
    import ray
    import ray.data as rd

    ot = _oriented(edges, src, dst)
    if len(ot) == 0:
        return rd.from_arrow(pa.table(
            {"norm": pa.array([], pa.string()),
             "n_triangles": pa.array([], pa.int64())}))

    # int-code the (vocab-bounded) node names once; sort by root code so
    # each root's neighbor run is contiguous
    enc = pa.concat_arrays(
        [ot.column("a").combine_chunks(),
         ot.column("b").combine_chunks()]).dictionary_encode()
    vocab = enc.dictionary  # codes < 2^32 by vocab bound (packing below)
    codes = np.asarray(enc.indices, dtype=np.int64)
    n = len(ot)
    a_codes, b_codes = codes[:n], codes[n:]
    order = np.lexsort((b_codes, a_codes))
    a_codes, b_codes = a_codes[order], b_codes[order]
    und_keys = np.sort(
        (np.minimum(a_codes, b_codes).astype(np.uint64) << np.uint64(32))
        | np.maximum(a_codes, b_codes).astype(np.uint64))
    starts = np.flatnonzero(np.concatenate(
        [[True], a_codes[1:] != a_codes[:-1]]))
    bounds = np.append(starts, n)
    state_ref = ray.put((a_codes, b_codes, bounds, und_keys,
                         len(vocab)))
    n_tasks = min(32, len(starts)) or 1

    def wedge_task(batch: pa.Table) -> pa.Table:
        a_col, b_col, bnd, keys, n_vocab = ray.get(state_ref)
        counts = np.zeros(n_vocab, dtype=np.int64)
        # pair_budget bounds per-chunk scratch (default ~4M pairs)
        for gi in batch.column("gi").to_numpy():
            s, e = int(bnd[gi]), int(bnd[gi + 1])
            nbrs = b_col[s:e]
            k = len(nbrs)
            if k < 2:
                continue
            # wedge pairs (i<j) in pair-budget chunks over the FIRST
            # index, so hub roots never allocate O(k^2) at once
            lens = (k - 1) - np.arange(k - 1, dtype=np.int64)
            cum = np.cumsum(lens)
            i0 = 0
            while i0 < k - 1:
                base = cum[i0 - 1] if i0 else 0
                i1 = int(np.searchsorted(cum, base + pair_budget)) + 1
                i1 = min(max(i1, i0 + 1), k - 1)
                ii = np.arange(i0, i1, dtype=np.int64)
                reps = lens[i0:i1]
                i_rep = np.repeat(ii, reps)
                row_start = np.repeat(np.cumsum(reps) - reps, reps)
                j_rep = (np.arange(len(i_rep), dtype=np.int64)
                         - row_start + i_rep + 1)
                bi, cj = nbrs[i_rep], nbrs[j_rep]
                wk = ((np.minimum(bi, cj).astype(np.uint64)
                       << np.uint64(32))
                      | np.maximum(bi, cj).astype(np.uint64))
                pos = np.searchsorted(keys, wk)
                pos_c = np.minimum(pos, len(keys) - 1)
                hit = keys[pos_c] == wk
                n_hit = int(hit.sum())
                if n_hit:
                    counts[a_col[s]] += n_hit
                    counts += np.bincount(bi[hit], minlength=n_vocab)
                    counts += np.bincount(cj[hit], minlength=n_vocab)
                i0 = i1
        nz = np.flatnonzero(counts)
        return pa.table({
            "norm": vocab.take(pa.array(nz, pa.int64())),
            "n_triangles": pa.array(counts[nz], pa.int64())})

    group_ids = rd.from_arrow(pa.table(
        {"gi": pa.array(np.arange(len(starts)), pa.int64())}))
    partials = group_ids.map_batches(
        wedge_task, batch_format="pyarrow",
        batch_size=max(1, (len(starts) + n_tasks - 1) // n_tasks))
    from easyner_ray.ops.relational import grouped_agg

    return grouped_agg(partials, ["norm"],
                       [("n_triangles", "sum", "n_triangles")],
                       final="tree")


def components(edges, *, src: str = "subj", dst: str = "obj",
               max_iters: int = 25, small_edge_cutoff: int = 2_000_000):
    """Connected components over the KG edge table: -> (norm, component)
    where ``component`` is the lexicographically SMALLEST entity surface
    form reachable from the node — the deterministic cluster
    representative (string analog of ``ops.dedup.dup_groups``' min-id
    label).

    Edge lists under ``small_edge_cutoff`` (the COUNTED, grouped edge
    table — vocab^2-bounded, not the corpus) short-circuit to one
    union-find pass; above it, distributed min-label propagation: each
    round joins the symmetric edge list against the current labels
    (:func:`adaptive_join`) and takes per-node min(own, neighbor
    labels); converges in O(diameter) rounds with the driver holding
    only the changed-row counter."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    sym = edges.map_batches(
        lambda t: pa.Table.from_arrays(
            [pa.concat_arrays([t.column(src).combine_chunks(),
                               t.column(dst).combine_chunks()]),
             pa.concat_arrays([t.column(dst).combine_chunks(),
                               t.column(src).combine_chunks()])],
            names=["node", "nbr"]),
        batch_format="pyarrow").materialize()

    n_edges = sym.count()
    empty = pa.table({"norm": pa.array([], pa.string()),
                      "component": pa.array([], pa.string())})
    if n_edges == 0:
        return rd.from_arrow(empty)

    if n_edges <= small_edge_cutoff:
        import ray

        parent: dict[str, str] = {}

        def find(x: str) -> str:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for blk in ray.get(sym.to_arrow_refs()):
            for a, b in zip(blk.column("node").to_pylist(),
                            blk.column("nbr").to_pylist()):
                ra, rb = find(a), find(b)
                if ra != rb:  # smaller string wins as root
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        nodes = sorted(parent)
        roots = {x: find(x) for x in nodes}
        # include self-rooted nodes that never lost a union
        all_nodes = sorted(set(nodes) | set(roots.values()))
        return rd.from_arrow(pa.table(
            {"norm": pa.array(all_nodes, pa.string()),
             "component": pa.array([roots.get(x, x) for x in all_nodes],
                                   pa.string())}))

    # ---- distributed min-label propagation
    labels = grouped_agg(
        sym.map_batches(lambda t: t.select(["node"]),
                        batch_format="pyarrow"),
        ["node"], [("node", "count", "__c")]) \
        .map_batches(lambda t: pa.Table.from_arrays(
            [t.column("node"), t.column("node")],
            names=["node", "component"]), batch_format="pyarrow") \
        .materialize()
    for _ in range(max_iters):
        nbr_lab = adaptive_join(
            sym, labels.map_batches(
                lambda t: t.rename_columns(["nbr", "__nc"]),
                batch_format="pyarrow"),
            on="nbr").map_batches(
                lambda t: pa.Table.from_arrays(
                    [t.column("node"), t.column("__nc")],
                    names=["node", "component"]),
                batch_format="pyarrow")
        new_labels = grouped_agg(
            nbr_lab.union(labels.select_columns(["node", "component"])),
            ["node"], [("component", "min", "component")]).materialize()
        changed = adaptive_join(
            new_labels,
            labels.map_batches(
                lambda t: t.rename_columns(["node", "__old"]),
                batch_format="pyarrow"),
            on="node").map_batches(
                lambda t: pa.table({"d": pa.array(
                    [pc.sum(pc.cast(pc.invert(pc.equal(
                        t.column("component"), t.column("__old"))),
                        pa.int64())).as_py() or 0], pa.int64())}),
                batch_format="pyarrow") \
            .sum("d")
        labels = new_labels
        if not changed:
            break
    return labels.map_batches(
        lambda t: t.rename_columns(["norm", "component"]),
        batch_format="pyarrow")


def temporal_edges(triples, transcripts, *, broadcast_bytes: int = 64 << 20):
    """Temporally annotated co-occurrence edges: undirected pairs
    (norm_a < norm_b) with co-occurrence count and FIRST/LAST observed
    transcript timestamp -> (norm_a, norm_b, n_cooc, first_seen,
    last_seen, active_span_s).

    ``triples`` is the sentence-level distinct pair stream
    (``stages.triples.sentence_triples``); the turn timestamp joins in
    through the composite (conv_id, turn_idx) key against the PRUNED
    3-column transcript read — both sides corpus-sized, so the join is
    :func:`adaptive_join`'s hash-shuffle path at scale (broadcast under
    the gate at bench scale). The final aggregate collapses to the
    vocab^2-bounded pair keyspace (count + min/max ts), two-phase as
    always."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    def pair_key(t: pa.Table) -> pa.Table:
        keep = pc.less(t.column("subj"), t.column("obj"))
        t = t.filter(keep)
        k = pc.binary_join_element_wise(
            t.column("conv_id"),
            pc.cast(t.column("turn_idx"), pa.string()), _SEP)
        return pa.Table.from_arrays(
            [t.column("subj"), t.column("obj"), k],
            names=["norm_a", "norm_b", "__k"])

    left = triples.map_batches(pair_key, batch_format="pyarrow")

    def turn_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"),
            pc.cast(t.column("turn_idx"), pa.string()), _SEP)
        return pa.Table.from_arrays([k, t.column("ts")],
                                    names=["__k", "ts"])

    right = transcripts.map_batches(turn_key, batch_format="pyarrow")
    joined = adaptive_join(left, right, on="__k",
                           broadcast_bytes=broadcast_bytes)
    agg = grouped_agg(
        joined.map_batches(lambda t: t.select(["norm_a", "norm_b", "ts"]),
                           batch_format="pyarrow"),
        ["norm_a", "norm_b"],
        [("ts", "count", "n_cooc"), ("ts", "min", "first_seen"),
         ("ts", "max", "last_seen")],
    )

    def span(t: pa.Table) -> pa.Table:
        us = pc.subtract(pc.cast(t.column("last_seen"), pa.int64()),
                         pc.cast(t.column("first_seen"), pa.int64()))
        return t.append_column(
            "active_span_s",
            pc.divide(pc.cast(us, pa.float64()), 1_000_000.0))

    return agg.map_batches(span, batch_format="pyarrow")
