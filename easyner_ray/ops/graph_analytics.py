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
pair aggregation) already happened upstream. Relational-shaped steps
ride :func:`easyner_ray.ops.relational.adaptive_join` (broadcast under
the 64 MB gate, hash-shuffle partitioned above it); the neighborhood
kernels (triangles, 2-hop, Jaccard) instead int-code the adjacency once
on the driver, broadcast it via ``ray.put``, and fan tasks over root
ranges with pure-numpy per-root work — turning what a join would pay as
a Σdeg²-row exchange into zero exchange. The structural skew risk — hub
nodes fanning out in wedge/2-hop enumeration — is handled per kernel:
triangles orient every wedge at its LOWEST-degree vertex (arboricity
bound), Jaccard/2-hop chunk hub fan-out at a pair/index budget so no
task materializes a hub's full quadratic scratch at once.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "degree_stats",
    "two_hop_counts",
    "triangle_counts",
    "clustering_coeff",
    "neighbor_jaccard",
    "components",
    "bfs_hops",
    "temporal_edges",
    "edge_activity",
    "edge_evidence",
    "kcore",
    "canonical_map",
    "rewrite_edges",
    "entity_trends",
    "edges_diff",
    "component_stats",
    "label_propagation",
    "negative_samples",
    "betweenness",
    "eccentricity",
    "integrity_report",
]

_SEP = "\x1f"  # key joiner; never appears in normalized entity surface forms


def _round_away(vals, digits: int = 4):
    """Vectorized round-half-AWAY-from-zero — DuckDB's ``round(x, d)``
    semantics (``std::round(x * 10^d) / 10^d``), which Python's
    decimal-correct half-even ``round`` diverges from on binary-exact
    halfway ratios (1/32 -> .0312 vs SQL .0313). Ratio columns here are
    small-integer quotients, so exact halves actually occur."""
    import numpy as np

    s = 10.0 ** digits
    y = np.asarray(vals, dtype=np.float64) * s
    return np.copysign(np.floor(np.abs(y) + 0.5), y) / s


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
                   chunk: int = 1 << 22):
    """Per-node count of DISTINCT nodes reachable in at most two hops
    (self excluded): -> (norm, n_within_2).

    Same kernel family as :func:`triangle_counts` /
    :func:`neighbor_jaccard`: the distinct pair table int-codes once on
    the driver (vocab-bounded by the edge-table contract) and broadcasts
    via ``ray.put``; tasks over root ranges compute each root's reach
    set — N(a) ∪ N(N(a)) minus self — with one vectorized ranges->index
    gather + sorted-unique per root, chunked at ``chunk`` gathered
    indices so a hub root (reach work = Σ deg(m) over its neighbors)
    never materializes its full two-hop multiset at once. Output is one
    (root, count) row per node — no exchange at all beyond the final
    concat (a first cut joined pairs-on-middle and paid a
    Σdeg²-row DISTINCT shuffle; 30 s vs <1 s at sf0.1)."""
    import numpy as np
    import ray
    import ray.data as rd

    empty = pa.table({"norm": pa.array([], pa.string()),
                      "n_within_2": pa.array([], pa.int64())})
    blocks = [b for b in ray.get(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow").to_arrow_refs())
        if len(b)]
    if not blocks:
        return rd.from_arrow(empty)
    t = pa.concat_tables(blocks).combine_chunks() \
        .group_by([src, dst]).aggregate([]).combine_chunks()
    t = t.filter(pc.invert(pc.equal(t.column(src), t.column(dst))))
    if len(t) == 0:
        return rd.from_arrow(empty)
    enc = pa.concat_arrays([t.column(src).combine_chunks(),
                            t.column(dst).combine_chunks()]) \
        .dictionary_encode()
    vocab = enc.dictionary
    codes = np.asarray(enc.indices, dtype=np.int64)
    n = len(t)
    node_c, nbr_c = codes[:n], codes[n:]
    order = np.lexsort((nbr_c, node_c))
    node_c, nbr_c = node_c[order], nbr_c[order]
    starts = np.flatnonzero(np.concatenate(
        [[True], node_c[1:] != node_c[:-1]]))
    roots = node_c[starts]
    bounds = np.append(starts, n)
    # root code -> position in bounds (the symmetric table gives every
    # node a run, but look up defensively)
    root_pos = np.full(len(vocab), -1, dtype=np.int64)
    root_pos[roots] = np.arange(len(roots))
    state_ref = ray.put((nbr_c, bounds, roots, root_pos, vocab))
    n_tasks = min(32, len(roots)) or 1

    def reach_task(batch: pa.Table) -> pa.Table:
        nbrs_all, bnd, roots_, rpos, voc = ray.get(state_ref)
        out_root, out_cnt = [], []
        for gi in batch.column("gi").to_numpy():
            a = roots_[gi]
            s, e = int(bnd[gi]), int(bnd[gi + 1])
            nbrs = nbrs_all[s:e]
            pos_idx = rpos[nbrs]
            pos_idx = pos_idx[pos_idx >= 0]
            seg_start = bnd[pos_idx]
            seg_len = bnd[pos_idx + 1] - seg_start
            reach = np.unique(nbrs)  # direct hop
            # gather 2-hop segments, segment-aligned chunks of ~`chunk`
            # gathered indices (one segment = one neighbor's adjacency
            # run; a single over-budget segment is gathered whole — it
            # is already a contiguous view of the broadcast array)
            csum = np.cumsum(seg_len)
            n_seg = len(seg_len)
            i0 = 0
            while i0 < n_seg:
                base = int(csum[i0 - 1]) if i0 else 0
                i1 = int(np.searchsorted(csum, base + chunk,
                                         side="right"))
                i1 = max(i1, i0 + 1)
                st, ln = seg_start[i0:i1], seg_len[i0:i1]
                flat = np.arange(int(ln.sum()), dtype=np.int64)
                idx = (flat - np.repeat(np.cumsum(ln) - ln, ln)
                       + np.repeat(st, ln))
                reach = np.union1d(reach, nbrs_all[idx])
                i0 = i1
            p = int(np.searchsorted(reach, a))
            cnt = len(reach) - int(p < len(reach) and reach[p] == a)
            out_root.append(a)
            out_cnt.append(cnt)
        return pa.table({
            "norm": voc.take(pa.array(out_root, pa.int64())),
            "n_within_2": pa.array(out_cnt, pa.int64())})

    group_ids = rd.from_arrow(pa.table(
        {"gi": pa.array(np.arange(len(roots)), pa.int64())}))
    return group_ids.map_batches(
        reach_task, batch_format="pyarrow",
        batch_size=max(1, (len(roots) + n_tasks - 1) // n_tasks))


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


def _coded_neighbors(t, src: str, dst: str):
    """Int-code the distinct directed pair table with LEXICOGRAPHIC
    codes (so packed-key order matches the string order the pair
    contracts promise) and sort by (node, neighbor).
    -> ``(node_c, nbr_c, bounds, starts, deg, vocab)``: per-node
    neighbor segments for the wedge kernels (``nbr_c[bounds[i]:
    bounds[i+1]]`` is the sorted neighbor list of the i-th node with
    any neighbors; ``deg`` is indexed by code)."""
    import numpy as np

    enc = pa.concat_arrays([t.column(src).combine_chunks(),
                            t.column(dst).combine_chunks()]) \
        .dictionary_encode()
    sort_idx = pc.sort_indices(enc.dictionary)
    vocab = enc.dictionary.take(sort_idx)
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[np.asarray(sort_idx)] = np.arange(len(vocab))
    codes = rank[np.asarray(enc.indices, dtype=np.int64)]
    n = len(t)
    node_c, nbr_c = codes[:n], codes[n:]
    deg = np.bincount(node_c, minlength=len(vocab)).astype(np.int64)
    order = np.lexsort((nbr_c, node_c))
    node_c, nbr_c = node_c[order], nbr_c[order]
    starts = np.flatnonzero(np.concatenate(
        [[True], node_c[1:] != node_c[:-1]]))
    bounds = np.append(starts, n)
    return node_c, nbr_c, bounds, starts, deg, vocab


def _pair_chunks(k: int, pair_budget: int):
    """Yield ``(i_rep, j_rep)`` int64 index arrays covering every pair
    ``i < j`` over ``range(k)``, chunked over the FIRST index so no chunk
    materializes more than ~``pair_budget`` pairs at once — the hub guard
    shared by the wedge kernels (:func:`triangle_counts`,
    :func:`neighbor_jaccard`): a hub root never allocates O(k^2) scratch
    in one shot."""
    import numpy as np

    if k < 2:
        return
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
        yield i_rep, j_rep
        i0 = i1


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
            for i_rep, j_rep in _pair_chunks(k, pair_budget):
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


def clustering_coeff(edges, *, src: str = "subj", dst: str = "obj",
                     round_digits: int = 4, pair_budget: int = 1 << 22):
    """Local clustering coefficient per node over the co-occurrence
    graph: -> (norm, degree, n_triangles, clustering) with
    ``clustering = 2T / (d * (d - 1))`` (0.0 when d < 2) — the standard
    "how clique-like is this entity's neighborhood" signal; in a KG it
    separates topical hub entities (low cc, star-shaped) from members of
    tight co-mention clusters (high cc).

    Pure composition: :func:`degree_stats` (the edge table carries both
    orientations, so its per-``src`` row count IS the undirected distinct
    degree) left-joined with :func:`triangle_counts` (nodes in no
    triangle fill 0). Both inputs are vocab-bounded, so the join rides
    :func:`adaptive_join`'s broadcast path and the ratio computes in one
    whole-column kernel; the round grain is :func:`_round_away` (SQL
    half-away semantics — small-integer ratio columns DO land on exact
    binary halves, where half-even rounding diverges)."""
    from easyner_ray.ops.relational import adaptive_join

    deg = degree_stats(edges, src=src, dst=dst) \
        .select_columns(["norm", "degree"])
    tri = triangle_counts(edges, src=src, dst=dst,
                          pair_budget=pair_budget).map_batches(
        lambda t: t.rename_columns(["norm", "__t"]), batch_format="pyarrow")
    joined = adaptive_join(deg, tri, on="norm", how="left")

    def score(t: pa.Table, rd_=round_digits) -> pa.Table:
        import numpy as np

        d = t.column("degree").combine_chunks().to_numpy(
            zero_copy_only=False).astype("float64")
        tr = t.column("__t").combine_chunks().fill_null(0)
        trn = tr.to_numpy(zero_copy_only=False).astype("float64")
        safe = np.maximum(d * (d - 1.0), 1.0)
        cc = pa.array(np.where(d < 2, 0.0,
                               _round_away(2.0 * trn / safe, rd_)),
                      pa.float64())
        return pa.Table.from_arrays(
            [t.column("norm"), t.column("degree"), tr.cast(pa.int64()),
             cc],
            names=["norm", "degree", "n_triangles", "clustering"])

    return joined.map_batches(score, batch_format="pyarrow")


def neighbor_jaccard(edges, *, src: str = "subj", dst: str = "obj",
                     min_shared: int = 2, round_digits: int = 4,
                     pair_budget: int = 1 << 22,
                     max_middle_degree: int | None = None):
    """Neighborhood-Jaccard similarity between entity pairs:
    -> (norm_a, norm_b, n_shared, jaccard) for pairs (a < b) sharing at
    least ``min_shared`` neighbors, where
    ``jaccard = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|``.

    THE alias-candidate generator for canonicalization: two surface forms
    of one real-world entity co-occur with the same third entities even
    when their strings never match — high neighborhood Jaccard surfaces
    exactly those merge candidates (the string-free complement of
    ``stages/canonicalize.py``'s normalized-surface merge).

    Kernel: intersection counts come from wedge enumeration — every
    middle node m contributes one count to each pair of its neighbors —
    over the int-coded, node-sorted distinct pair table (vocab-bounded,
    broadcast once via ``ray.put``), distributed over middle-node ranges.
    Each task packs neighbor pairs into uint64 keys in
    :func:`_pair_chunks` budget chunks and sort-compresses its
    accumulator whenever it outgrows the budget, so per-task scratch
    stays O(pair_budget) even through hub middles. Per-pair partials then
    take one vocab^2-bounded grouped sum. Unlike triangles, wedge work
    here cannot be degree-orientation-bounded (ALL wedges count);
    ``max_middle_degree`` is the documented 100 TB escape hatch — skip
    super-hub middles (their shared-neighbor signal is uninformative:
    everything co-occurs with a stopword-like hub) at the cost of exact
    oracle parity, so it defaults OFF."""
    import numpy as np
    import ray
    import ray.data as rd

    from easyner_ray.ops.relational import grouped_agg

    blocks = [b for b in ray.get(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow").to_arrow_refs())
        if len(b)]
    empty = pa.table({"norm_a": pa.array([], pa.string()),
                      "norm_b": pa.array([], pa.string()),
                      "n_shared": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if not blocks:
        return rd.from_arrow(empty)
    t = pa.concat_tables(blocks).combine_chunks() \
        .group_by([src, dst]).aggregate([]).combine_chunks()
    t = t.filter(pc.invert(pc.equal(t.column(src), t.column(dst))))
    if len(t) == 0:
        return rd.from_arrow(empty)
    node_c, nbr_c, bounds, starts, deg, vocab = _coded_neighbors(
        t, src, dst)
    n = len(t)
    state_ref = ray.put((nbr_c, bounds, deg, vocab))
    n_tasks = min(32, len(starts)) or 1

    def wedge_task(batch: pa.Table) -> pa.Table:
        nbrs_all, bnd, _deg, _vocab = ray.get(state_ref)
        acc_k: list = []
        acc_c: list = []
        acc_n = 0

        def compress() -> int:
            k = np.concatenate(acc_k)
            c = np.concatenate(acc_c)
            o = np.argsort(k, kind="stable")
            k, c = k[o], c[o]
            firsts = np.flatnonzero(np.concatenate(
                [[True], k[1:] != k[:-1]]))
            acc_k[:] = [k[firsts]]
            acc_c[:] = [np.add.reduceat(c, firsts)]
            return len(acc_k[0])

        for gi in batch.column("gi").to_numpy():
            s, e = int(bnd[gi]), int(bnd[gi + 1])
            nbrs = nbrs_all[s:e]          # sorted ascending by lexsort
            k = len(nbrs)
            if max_middle_degree is not None and k > max_middle_degree:
                continue
            for i_rep, j_rep in _pair_chunks(k, pair_budget):
                # nbrs sorted -> a < b without a min/max pass
                wk = ((nbrs[i_rep].astype(np.uint64) << np.uint64(32))
                      | nbrs[j_rep].astype(np.uint64))
                acc_k.append(wk)
                acc_c.append(np.ones(len(wk), dtype=np.int64))
                acc_n += len(wk)
                if acc_n > 2 * pair_budget:
                    acc_n = compress()
        if not acc_k:
            return pa.table({"__pk": pa.array([], pa.int64()),
                             "__n": pa.array([], pa.int64())})
        compress()
        return pa.table({
            "__pk": pa.array(acc_k[0].astype(np.int64), pa.int64()),
            "__n": pa.array(acc_c[0], pa.int64())})

    group_ids = rd.from_arrow(pa.table(
        {"gi": pa.array(np.arange(len(starts)), pa.int64())}))
    partials = group_ids.map_batches(
        wedge_task, batch_format="pyarrow",
        batch_size=max(1, (len(starts) + n_tasks - 1) // n_tasks))
    shared = grouped_agg(partials, ["__pk"], [("__n", "sum", "n_shared")])

    def score(tbl: pa.Table, rd_=round_digits, lo=min_shared) -> pa.Table:
        _nbrs, _bnd, deg_arr, voc = ray.get(state_ref)
        tbl = tbl.filter(pc.greater_equal(tbl.column("n_shared"), lo))
        pk = tbl.column("__pk").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
        a = (pk >> np.uint64(32)).astype(np.int64)
        b = (pk & np.uint64(0xFFFFFFFF)).astype(np.int64)
        ns = tbl.column("n_shared").combine_chunks().to_numpy(
            zero_copy_only=False)
        union = (deg_arr[a] + deg_arr[b] - ns).astype("float64")
        jac = pa.array(_round_away(ns.astype("float64") / union, rd_),
                       pa.float64())
        return pa.Table.from_arrays(
            [voc.take(pa.array(a, pa.int64())),
             voc.take(pa.array(b, pa.int64())),
             tbl.column("n_shared"), jac],
            names=["norm_a", "norm_b", "n_shared", "jaccard"])

    return shared.map_batches(score, batch_format="pyarrow")


def link_predict(edges, *, src: str = "subj", dst: str = "obj",
                 min_common: int = 3, round_digits: int = 4,
                 pair_budget: int = 1 << 22,
                 max_middle_degree: int | None = None):
    """Link prediction over the co-occurrence graph: for every
    NON-ADJACENT candidate pair (a < b) sharing at least ``min_common``
    neighbors -> ``(norm_a, norm_b, n_common, adamic_adar,
    pref_attach)`` where ``adamic_adar = Σ_z 1/ln(|N(z)|)`` over shared
    neighbors z and ``pref_attach = |N(a)|·|N(b)|`` (Liben-Nowell &
    Kleinberg 2003). The missing-edge complement of
    :func:`neighbor_jaccard`: alias candidates score pairs that SHOULD
    merge; link prediction scores pairs that should probably CONNECT —
    the KG-completion shape (which entity pairs does the corpus imply
    but never state in one sentence?).

    Kernel: same wedge enumeration as :func:`neighbor_jaccard` (middle
    node z of degree k contributes weight 1/ln(k) to each of its
    neighbor pairs; k >= 2 for any wedge middle so ln(k) > 0), with a
    float weight accumulator beside the count, sort-compressed under
    the same ``pair_budget`` hub guard. Direct edges are excluded by
    packed-key membership against the sorted distinct-edge array
    (broadcast once; vocab^2-bounded). ``max_middle_degree`` is the
    same documented 100 TB hub escape hatch, default OFF (exact)."""
    import numpy as np
    import ray
    import ray.data as rd

    from easyner_ray.ops.relational import grouped_agg

    blocks = [b for b in ray.get(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow").to_arrow_refs())
        if len(b)]
    empty = pa.table({"norm_a": pa.array([], pa.string()),
                      "norm_b": pa.array([], pa.string()),
                      "n_common": pa.array([], pa.int64()),
                      "adamic_adar": pa.array([], pa.float64()),
                      "pref_attach": pa.array([], pa.int64())})
    if not blocks:
        return rd.from_arrow(empty)
    t = pa.concat_tables(blocks).combine_chunks() \
        .group_by([src, dst]).aggregate([]).combine_chunks()
    t = t.filter(pc.invert(pc.equal(t.column(src), t.column(dst))))
    if len(t) == 0:
        return rd.from_arrow(empty)
    node_c, nbr_c, bounds, starts, deg, vocab = _coded_neighbors(
        t, src, dst)
    up = node_c < nbr_c           # each undirected edge once, a < b
    direct = np.unique((node_c[up].astype(np.uint64) << np.uint64(32))
                       | nbr_c[up].astype(np.uint64))
    state_ref = ray.put((nbr_c, bounds, deg, vocab, direct))
    n_tasks = min(32, len(starts)) or 1

    def wedge_task(batch: pa.Table) -> pa.Table:
        nbrs_all, bnd, _deg, _vocab, _direct = ray.get(state_ref)
        acc_k: list = []
        acc_c: list = []
        acc_w: list = []
        acc_n = 0

        def compress() -> int:
            k = np.concatenate(acc_k)
            c = np.concatenate(acc_c)
            w = np.concatenate(acc_w)
            o = np.argsort(k, kind="stable")
            k, c, w = k[o], c[o], w[o]
            firsts = np.flatnonzero(np.concatenate(
                [[True], k[1:] != k[:-1]]))
            acc_k[:] = [k[firsts]]
            acc_c[:] = [np.add.reduceat(c, firsts)]
            acc_w[:] = [np.add.reduceat(w, firsts)]
            return len(acc_k[0])

        for gi in batch.column("gi").to_numpy():
            s, e = int(bnd[gi]), int(bnd[gi + 1])
            nbrs = nbrs_all[s:e]          # sorted ascending
            k = len(nbrs)
            if max_middle_degree is not None and k > max_middle_degree:
                continue
            if k < 2:
                continue
            wt = 1.0 / np.log(k)
            for i_rep, j_rep in _pair_chunks(k, pair_budget):
                wk = ((nbrs[i_rep].astype(np.uint64) << np.uint64(32))
                      | nbrs[j_rep].astype(np.uint64))
                acc_k.append(wk)
                acc_c.append(np.ones(len(wk), dtype=np.int64))
                acc_w.append(np.full(len(wk), wt, dtype=np.float64))
                acc_n += len(wk)
                if acc_n > 2 * pair_budget:
                    acc_n = compress()
        if not acc_k:
            return pa.table({"__pk": pa.array([], pa.int64()),
                             "__n": pa.array([], pa.int64()),
                             "__aa": pa.array([], pa.float64())})
        compress()
        return pa.table({
            "__pk": pa.array(acc_k[0].astype(np.int64), pa.int64()),
            "__n": pa.array(acc_c[0], pa.int64()),
            "__aa": pa.array(acc_w[0], pa.float64())})

    group_ids = rd.from_arrow(pa.table(
        {"gi": pa.array(np.arange(len(starts)), pa.int64())}))
    partials = group_ids.map_batches(
        wedge_task, batch_format="pyarrow",
        batch_size=max(1, (len(starts) + n_tasks - 1) // n_tasks))
    shared = grouped_agg(partials, ["__pk"],
                         [("__n", "sum", "n_common"),
                          ("__aa", "sum", "adamic_adar")])

    def score(tbl: pa.Table, rd_=round_digits, lo=min_common) -> pa.Table:
        _nbrs, _bnd, deg_arr, voc, direct_arr = ray.get(state_ref)
        tbl = tbl.filter(pc.greater_equal(tbl.column("n_common"), lo))
        pk = tbl.column("__pk").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
        # keep only MISSING edges: drop pairs in the direct-edge set
        pos = np.searchsorted(direct_arr, pk)
        pos[pos >= len(direct_arr)] = max(len(direct_arr) - 1, 0)
        is_direct = (len(direct_arr) > 0) & (direct_arr[pos] == pk)
        keep = ~is_direct
        pk = pk[keep]
        a = (pk >> np.uint64(32)).astype(np.int64)
        b = (pk & np.uint64(0xFFFFFFFF)).astype(np.int64)
        aa = tbl.column("adamic_adar").combine_chunks().to_numpy(
            zero_copy_only=False)[keep]
        return pa.Table.from_arrays(
            [voc.take(pa.array(a, pa.int64())),
             voc.take(pa.array(b, pa.int64())),
             tbl.column("n_common").take(pa.array(
                 np.flatnonzero(keep), pa.int64())),
             pa.array(_round_away(aa, rd_), pa.float64()),
             pa.array(deg_arr[a] * deg_arr[b], pa.int64())],
            names=["norm_a", "norm_b", "n_common", "adamic_adar",
                   "pref_attach"])

    return shared.map_batches(score, batch_format="pyarrow")


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


def bfs_hops(edges, seeds, *, src: str = "subj", dst: str = "obj",
             max_hops: int = 3):
    """Minimum hop distance from a seed entity set, bounded by
    ``max_hops``: -> (norm, hop) for every node reachable within the
    bound (seeds themselves at hop 0; seeds absent from the graph are
    dropped). The bounded-neighborhood query a KG consumer runs around a
    watchlist — "everything within 3 hops of these drugs".

    Frontier-expansion BFS as ``max_hops`` rounds of
    :func:`adaptive_join` against the symmetric edge list (vocab-bounded
    -> broadcast path; hash-shuffle above the gate at open keyspace),
    each followed by a grouped min — the same exchange shape as
    :func:`components` but with a hop counter instead of a label, and it
    terminates early when a frontier comes back empty. Per round the
    JOIN side is only the current frontier, not all labels, so the work
    is output-sensitive (sum of frontier adjacency), not
    rounds x graph."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    empty = pa.table({"norm": pa.array([], pa.string()),
                      "hop": pa.array([], pa.int64())})
    seed_set = sorted(set(seeds))
    if not seed_set:
        return rd.from_arrow(empty)

    sym = edges.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column(src).combine_chunks(), t.column(dst).combine_chunks()],
            names=["node", "nbr"]),
        batch_format="pyarrow").materialize()

    labels = sym.map_batches(
        lambda t: (lambda f: pa.table(
            {"node": f.column("node"),
             "hop": pa.array([0] * len(f), pa.int64())}))(
                 t.filter(pc.is_in(t.column("node"),
                                   value_set=pa.array(seed_set)))),
        batch_format="pyarrow")
    labels = grouped_agg(labels, ["node"], [("hop", "min", "hop")]) \
        .materialize()
    if labels.count() == 0:
        return rd.from_arrow(empty)

    frontier = labels
    for h in range(1, max_hops + 1):
        reached = adaptive_join(
            sym,
            frontier.map_batches(
                lambda t: pa.table({"node": t.column("node"),
                                    "__f": t.column("hop")}),
                batch_format="pyarrow"),
            on="node").map_batches(
                lambda t, hh=h: pa.table(
                    {"node": t.column("nbr"),
                     "hop": pa.array([hh] * len(t), pa.int64())}),
                batch_format="pyarrow")
        new_labels = grouped_agg(reached.union(labels), ["node"],
                                 [("hop", "min", "hop")]).materialize()
        frontier = new_labels.filter(
            lambda r, hh=h: r["hop"] == hh).materialize()
        labels = new_labels
        if frontier.count() == 0:
            break
    return labels.map_batches(
        lambda t: t.rename_columns(["norm", "hop"]),
        batch_format="pyarrow")


def weighted_hops(edges, seeds, *, src: str = "subj", dst: str = "obj",
                  weight_col: str = "weight", max_hops: int = 3):
    """Minimum WEIGHTED distance from a seed set over paths of at most
    ``max_hops`` edges, with per-edge cost ``1/weight`` (strong edges
    are short) -> ``(norm, dist)`` for every node reachable within the
    bound; seeds at 0.0. The strength-aware complement of
    :func:`bfs_hops`: two entities three weak hops apart can be
    "farther" than one strong direct edge.

    Bounded Bellman-Ford as ``max_hops`` relaxation rounds: per round
    one :func:`adaptive_join` of the improvement frontier against the
    symmetric cost edge list, a grouped min over the union with current
    labels, and one node-sized labels-vs-labels join to detect
    improvements (the next frontier; early exit when none). Extending
    only improved nodes proposes every <=h-edge path no later than full
    Bellman-Ford would, so labels after round h are exactly the
    <=h-edge optimum. Costs accumulate left-to-right along each path —
    bit-identical to a recursive-CTE oracle that sums the same way, so
    no rounding grain is needed."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    empty = pa.table({"norm": pa.array([], pa.string()),
                      "dist": pa.array([], pa.float64())})
    seed_set = sorted(set(seeds))
    if not seed_set:
        return rd.from_arrow(empty)

    sym = edges.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column(src).combine_chunks(),
             t.column(dst).combine_chunks(),
             pc.divide(1.0, pc.cast(t.column(weight_col), pa.float64()))],
            names=["node", "nbr", "cost"]),
        batch_format="pyarrow").materialize()

    labels = sym.map_batches(
        lambda t: (lambda f: pa.table(
            {"node": f.column("node"),
             "dist": pa.array([0.0] * len(f), pa.float64())}))(
                 t.filter(pc.is_in(t.column("node"),
                                   value_set=pa.array(seed_set)))),
        batch_format="pyarrow")
    labels = grouped_agg(labels, ["node"], [("dist", "min", "dist")]) \
        .materialize()
    if labels.count() == 0:
        return rd.from_arrow(empty)

    frontier = labels
    for _ in range(max_hops):
        cand = adaptive_join(
            sym,
            frontier.map_batches(
                lambda t: pa.table({"node": t.column("node"),
                                    "__d": t.column("dist")}),
                batch_format="pyarrow"),
            on="node").map_batches(
                lambda t: pa.table(
                    {"node": t.column("nbr"),
                     "dist": pc.add(t.column("__d"), t.column("cost"))}),
                batch_format="pyarrow")
        new_labels = grouped_agg(cand.union(labels), ["node"],
                                 [("dist", "min", "dist")]).materialize()
        improved = adaptive_join(
            new_labels,
            labels.map_batches(
                lambda t: pa.table({"node": t.column("node"),
                                    "__old": t.column("dist")}),
                batch_format="pyarrow"),
            on="node", how="left",
        ).map_batches(
            lambda t: t.filter(pc.or_kleene(
                pc.is_null(t.column("__old")),
                pc.less(t.column("dist"), t.column("__old"))))
            .select(["node", "dist"]),
            batch_format="pyarrow").materialize()
        labels = new_labels
        frontier = improved
        if frontier.count() == 0:
            break
    return labels.map_batches(
        lambda t: t.rename_columns(["norm", "dist"]),
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


def decayed_edges(triples, transcripts, *, half_life_s: float,
                  t_ref=None, round_digits: int = 4,
                  broadcast_bytes: int = 64 << 20):
    """Recency-weighted co-occurrence edges: undirected pairs
    (norm_a < norm_b) with evidence count and an exponentially decayed
    weight ``Σ 2^(-age/half_life)`` over their evidence timestamps ->
    ``(norm_a, norm_b, n_cooc, decayed_weight)``.

    The temporal-KG freshness shape: an edge seen 50× last year and
    never since should rank below one seen 5× this week. ``t_ref``
    anchors the age (default: the corpus max timestamp, one pruned
    scalar aggregate); ``half_life_s`` is the decay half-life in
    seconds. Same single adaptive turn-key join as
    :func:`temporal_edges` (hash-shuffle at scale, broadcast under the
    gate), decay applied vectorized per evidence row, then one
    vocab^2-bounded grouped sum; the 4-digit grain absorbs sum-order
    and exp2-vs-pow kernel noise vs the SQL oracle."""
    import numpy as np

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    if t_ref is None:
        t_ref = transcripts.map_batches(
            lambda t: t.select(["ts"]), batch_format="pyarrow").max("ts")
    ref_us = pa.scalar(t_ref, pa.timestamp("us")).cast(pa.int64()).as_py()

    def pair_key(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("subj"), t.column("obj")))
        k = pc.binary_join_element_wise(
            t.column("conv_id"),
            pc.cast(t.column("turn_idx"), pa.string()), _SEP)
        return pa.Table.from_arrays(
            [t.column("subj"), t.column("obj"), k],
            names=["norm_a", "norm_b", "__k"])

    def turn_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"),
            pc.cast(t.column("turn_idx"), pa.string()), _SEP)
        return pa.Table.from_arrays([k, t.column("ts")],
                                    names=["__k", "ts"])

    joined = adaptive_join(
        triples.map_batches(pair_key, batch_format="pyarrow"),
        transcripts.map_batches(turn_key, batch_format="pyarrow"),
        on="__k", broadcast_bytes=broadcast_bytes)

    def decay(t: pa.Table, ref=ref_us, hl=float(half_life_s)) -> pa.Table:
        ts_us = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        age_s = (ref - ts_us) / 1_000_000.0
        w = np.exp2(-age_s / hl)
        return pa.Table.from_arrays(
            [t.column("norm_a"), t.column("norm_b"),
             pa.array(w, pa.float64())],
            names=["norm_a", "norm_b", "w"])

    agg = grouped_agg(
        joined.map_batches(decay, batch_format="pyarrow"),
        ["norm_a", "norm_b"],
        [("w", "count", "n_cooc"), ("w", "sum", "decayed_weight")])

    def fin(t: pa.Table, rd_=round_digits) -> pa.Table:
        w = t.column("decayed_weight").combine_chunks().to_numpy(
            zero_copy_only=False)
        i = t.schema.get_field_index("decayed_weight")
        return t.set_column(i, "decayed_weight",
                            pa.array(_round_away(w, rd_), pa.float64()))

    return agg.map_batches(fin, batch_format="pyarrow")


def edge_activity(triples, transcripts, *, unit: str = "hour",
                  broadcast_bytes: int = 64 << 20):
    """Windowed temporal edge activity: per undirected entity pair and
    time bucket, the co-occurrence count and the number of DISTINCT
    conversations contributing -> (norm_a, norm_b, bucket_ts, n_cooc,
    n_convs). The edge-burst stream of a temporal KG — "this drug/disease
    pair spiked in this hour, across how many independent transcripts".

    Same join shape as :func:`temporal_edges` (sentence-level distinct
    pairs x pruned 3-column transcript read on the composite turn key,
    adaptive), then a two-level rollup: level 1 groups on (pair, bucket,
    conv_id) — collapsing the per-conversation repeat mass BEFORE the
    distinct count, so a hot conversation ships one row per pair-bucket
    it touches — level 2 sums the co-occurrence counts and counts the
    level-1 rows as the distinct-conversation count. Bucketing is
    ``pc.floor_temporal`` (whole-column kernel); bucket keys hash as
    strings through the bucketed final like every other grouped key."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    def pair_key(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("subj"), t.column("obj")))
        k = pc.binary_join_element_wise(
            t.column("conv_id"),
            pc.cast(t.column("turn_idx"), pa.string()), _SEP)
        return pa.Table.from_arrays(
            [t.column("subj"), t.column("obj"), t.column("conv_id"), k],
            names=["norm_a", "norm_b", "conv_id", "__k"])

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

    def bucket(t: pa.Table) -> pa.Table:
        b = pc.floor_temporal(t.column("ts"), unit=unit)
        return pa.Table.from_arrays(
            [t.column("norm_a"), t.column("norm_b"), b, t.column("conv_id")],
            names=["norm_a", "norm_b", "bucket_ts", "conv_id"])

    per_conv = grouped_agg(
        joined.map_batches(bucket, batch_format="pyarrow"),
        ["norm_a", "norm_b", "bucket_ts", "conv_id"],
        [("conv_id", "count", "__c")])
    return grouped_agg(per_conv, ["norm_a", "norm_b", "bucket_ts"],
                       [("__c", "sum", "n_cooc"),
                        ("conv_id", "count", "n_convs")])


def edge_evidence(triples, k: int = 3):
    """Per-edge provenance: for each undirected entity pair, the FIRST
    ``k`` evidence sentences in (conv_id, turn_idx, sent_idx) order ->
    (norm_a, norm_b, conv_id, turn_idx, sent_idx, evidence_rank). The
    audit-lineage row a KG consumer follows from an edge back into the
    transcripts — the per-edge analog of the sink's per-partition
    manifests.

    Pure :func:`easyner_ray.ops.relational.topk_per_group` over the
    sentence-level pair stream, so the exchange is bounded: every input
    batch forwards at most ``k`` rows per pair it sees — a hot pair with
    a million co-occurrences ships k rows per batch, never its full
    evidence mass."""
    from easyner_ray.ops.relational import topk_per_group

    pairs = triples.map_batches(
        lambda t: t.filter(pc.less(t.column("subj"), t.column("obj")))
                   .select(["subj", "obj", "conv_id", "turn_idx",
                            "sent_idx"])
                   .rename_columns(["norm_a", "norm_b", "conv_id",
                                    "turn_idx", "sent_idx"]),
        batch_format="pyarrow")
    return topk_per_group(pairs, ["norm_a", "norm_b"], "conv_id", k,
                          descending=False,
                          tie_cols=["turn_idx", "sent_idx"],
                          rank_name="evidence_rank")


def kcore(edges, k: int = 3, *, src: str = "subj", dst: str = "obj",
          max_iters: int = 200):
    """k-core decomposition membership: the maximal subgraph in which
    every node keeps >= ``k`` distinct neighbors -> (norm, core_degree)
    with the node's degree INSIDE the core. The standard "dense backbone
    vs. peripheral fringe" cut on a KG — hubs survive, one-off
    co-mentions peel away.

    Iterative peeling, each round one degree aggregate
    (:func:`grouped_agg`) + two :func:`adaptive_semi_join` passes
    restricting the symmetric distinct-pair list to surviving endpoints;
    terminates when no node drops (monotone, so <= |V| rounds, in
    practice O(peel depth)). The surviving-node set is vocab-bounded and
    rides the semi-join broadcast path; above the gate each round is a
    hash semi-join — the 100 TB path. The pair list re-materializes per
    round so the next round's joins don't recompute the whole prefix
    chain."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_semi_join, grouped_agg

    empty = pa.table({"norm": pa.array([], pa.string()),
                      "core_degree": pa.array([], pa.int64())})
    pairs = grouped_agg(
        edges.map_batches(
            lambda t: (lambda f: pa.Table.from_arrays(
                [f.column(src), f.column(dst)], names=["s", "o"]))(
                    t.filter(pc.invert(pc.equal(t.column(src),
                                                t.column(dst))))),
            batch_format="pyarrow"),
        ["s", "o"], [("o", "count", "__c")]) \
        .select_columns(["s", "o"]).materialize()

    deg = None
    for _ in range(max_iters):
        deg = grouped_agg(pairs, ["s"], [("o", "count", "core_degree")]) \
            .materialize()
        n_all = deg.count()
        if n_all == 0:
            return rd.from_arrow(empty)
        keep = deg.filter(lambda r, kk=k: r["core_degree"] >= kk) \
            .select_columns(["s"]).materialize()
        n_keep = keep.count()
        if n_keep == n_all:
            break
        if n_keep == 0:
            return rd.from_arrow(empty)
        pairs = adaptive_semi_join(pairs, keep, on="s")
        pairs = adaptive_semi_join(
            pairs, keep.map_batches(lambda t: t.rename_columns(["o"]),
                                    batch_format="pyarrow"),
            on="o").materialize()
    return deg.map_batches(
        lambda t: t.rename_columns(["norm", "core_degree"]),
        batch_format="pyarrow")


def canonical_map(edges, *, jaccard_threshold: float = 0.5,
                  min_shared: int = 3, src: str = "subj",
                  dst: str = "obj"):
    """Graph-aware canonicalization map: -> (norm, canonical) for every
    entity that belongs to an alias group — two surface forms whose
    co-occurrence neighborhoods overlap at Jaccard >=
    ``jaccard_threshold`` merge under the lexicographically smallest
    member of their alias component.

    This is the string-free second pass of node canonicalization the
    north star asks for: ``stages/canonicalize.py`` merges by normalized
    surface form; this merges forms the normalizer can NEVER unify
    (abbreviations, brand/generic names) because the graph says they
    live in the same contexts. Composition: :func:`neighbor_jaccard`
    (thresholded) -> :func:`components` over the alias pairs — both
    vocab-bounded stages."""
    ap = neighbor_jaccard(edges, src=src, dst=dst,
                          min_shared=min_shared).map_batches(
        lambda t, thr=jaccard_threshold: (lambda f: pa.Table.from_arrays(
            [f.column("norm_a"), f.column("norm_b"),
             pa.array([1] * len(f), pa.int64())],
            names=["subj", "obj", "weight"]))(
                t.filter(pc.greater_equal(t.column("jaccard"), thr))),
        batch_format="pyarrow")
    return components(ap).map_batches(
        lambda t: t.rename_columns(["norm", "canonical"]),
        batch_format="pyarrow")


def rewrite_edges(edges, mapping, *, src: str = "subj", dst: str = "obj",
                  weight: str = "weight"):
    """Rewrite the weighted edge table through a canonicalization map
    (-> same (subj, obj, weight) schema): endpoints absent from the map
    keep their own name, merged pairs re-aggregate their weights, and
    edges that COLLAPSE onto one canonical node (alias <-> alias) drop
    as self-loops.

    Two :func:`adaptive_join` left joins against the vocab-bounded map
    (broadcast path; hash-shuffle above the gate on an open keyspace) +
    one grouped sum on the canonical pair keyspace."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    m = mapping.materialize()
    if m.count() == 0:  # identity rewrite; also: an empty mapped
        # dataset has no inferable schema for the join to consume
        return grouped_agg(
            edges.map_batches(lambda t: t.select([src, dst, weight]),
                              batch_format="pyarrow"),
            [src, dst], [(weight, "sum", weight)])
    j1 = adaptive_join(
        edges.map_batches(lambda t: t.select([src, dst, weight]),
                          batch_format="pyarrow"),
        m.map_batches(lambda t: t.rename_columns([src, "__cs"]),
                      batch_format="pyarrow"),
        on=src, how="left")
    j2 = adaptive_join(
        j1, m.map_batches(lambda t: t.rename_columns([dst, "__co"]),
                          batch_format="pyarrow"),
        on=dst, how="left")

    def relabel(t: pa.Table) -> pa.Table:
        s = pc.coalesce(t.column("__cs"), t.column(src))
        o = pc.coalesce(t.column("__co"), t.column(dst))
        out = pa.Table.from_arrays([s, o, t.column(weight)],
                                   names=[src, dst, weight])
        return out.filter(pc.invert(pc.equal(out.column(src),
                                             out.column(dst))))

    return grouped_agg(j2.map_batches(relabel, batch_format="pyarrow"),
                       [src, dst], [(weight, "sum", weight)])


def entity_trends(mentions, transcripts, *, unit: str = "hour",
                  spike_z: float = 2.0, round_digits: int = 4,
                  broadcast_bytes: int = 64 << 20):
    """Per-entity temporal activity with spike detection: -> (norm,
    bucket_ts, n, z, spike) — mention count per entity per time bucket,
    standardized against THAT entity's own bucket distribution
    (sample stddev over its observed buckets), ``spike`` flagging
    |z| >= ``spike_z`` on the ROUNDED z (parity-deterministic threshold:
    the oracle applies the same round-then-compare). Entities observed
    in fewer than 2 buckets (or with zero variance) pin z to 0.0 — no
    baseline, no spike.

    Node-level twin of :func:`edge_activity`: the corpus-sized work is
    one adaptive turn-key join + one grouped count; the per-entity
    baseline is a second aggregate over the (vocab x buckets)-bounded
    count table, brought back as a driver-held broadcast map."""
    import math

    import numpy as np

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    def turn_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"),
            pc.cast(t.column("turn_idx"), pa.string()), _SEP)
        return pa.Table.from_arrays([k, t.column("ts")],
                                    names=["__k", "ts"])

    def mention_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("conv_id"),
            pc.cast(t.column("turn_idx"), pa.string()), _SEP)
        return pa.Table.from_arrays([t.column("norm"), k],
                                    names=["norm", "__k"])

    joined = adaptive_join(
        mentions.map_batches(mention_key, batch_format="pyarrow"),
        transcripts.map_batches(turn_key, batch_format="pyarrow"),
        on="__k", broadcast_bytes=broadcast_bytes)
    counts = grouped_agg(
        joined.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("norm"),
                 pc.floor_temporal(t.column("ts"), unit=unit)],
                names=["norm", "bucket_ts"]),
            batch_format="pyarrow"),
        ["norm", "bucket_ts"], [("bucket_ts", "count", "n")]).materialize()

    def add_sq(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column("n"), pa.float64())
        return pa.Table.from_arrays(
            [t.column("norm"), v, pc.multiply(v, v)],
            names=["norm", "v", "v2"])

    stats = grouped_agg(
        counts.map_batches(add_sq, batch_format="pyarrow"), ["norm"],
        [("v", "sum", "s"), ("v2", "sum", "s2"), ("v", "count", "nb")],
        final="tree").take_all()
    ms = {r["norm"]: (r["s"] / r["nb"],
                      math.sqrt(max((r["s2"] - r["s"] * r["s"] / r["nb"])
                                    / (r["nb"] - 1), 0.0)))
          for r in stats if r["nb"] > 1}

    def score(t: pa.Table, rd_=round_digits, thr=spike_z) -> pa.Table:
        norms = t.column("norm").to_pylist()
        n = t.column("n").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        mean = np.array([ms.get(x, (0.0, 0.0))[0] for x in norms])
        sd = np.array([ms.get(x, (0.0, 0.0))[1] for x in norms])
        ok = sd > 0
        z = np.where(ok, _round_away(
            (n - mean) / np.where(ok, sd, 1.0), rd_), 0.0)
        return pa.Table.from_arrays(
            [t.column("norm"), t.column("bucket_ts"), t.column("n"),
             pa.array(z, pa.float64()),
             pa.array(np.abs(z) >= thr, pa.bool_())],
            names=["norm", "bucket_ts", "n", "z", "spike"])

    return counts.map_batches(score, batch_format="pyarrow")


def edges_diff(old_edges, new_edges, *, src: str = "subj",
               dst: str = "obj", weight: str = "weight"):
    """KG snapshot audit: diff two weighted edge tables -> (subj, obj,
    weight_old, weight_new, status) for every edge that is ``added``,
    ``removed``, or ``changed`` between snapshots (absent weights read
    as 0; identical edges are omitted — the diff is the change set). The
    graph-side analog of ``ops.relational.snapshot_diff``: what an
    incremental ingest (``pipelines/incremental.update_graph``) actually
    changed, as an auditable stream.

    Both sides key-pack (subj SEP obj) and meet in
    :func:`easyner_ray.ops.relational.full_outer_join` — single-task
    pyarrow full outer when both snapshots are keyspace-sized (the
    aggregate-vs-aggregate audit case), Ray's hash-shuffle join above
    the gate."""
    from easyner_ray.ops.relational import full_outer_join

    def keyed(t: pa.Table, out: str) -> pa.Table:
        k = pc.binary_join_element_wise(t.column(src), t.column(dst),
                                        _SEP)
        return pa.Table.from_arrays([k, t.column(weight)],
                                    names=["__k", out])

    o = old_edges.map_batches(lambda t: keyed(t, "weight_old"),
                              batch_format="pyarrow")
    n = new_edges.map_batches(lambda t: keyed(t, "weight_new"),
                              batch_format="pyarrow")
    j = full_outer_join(o, n, on="__k")

    def score(t: pa.Table) -> pa.Table:
        wo = t.column("weight_old").combine_chunks()
        wn = t.column("weight_new").combine_chunks()
        status = pc.if_else(
            pc.is_null(wo), pa.scalar("added"),
            pc.if_else(pc.is_null(wn), pa.scalar("removed"),
                       pa.scalar("changed")))
        wo = wo.fill_null(0).cast(pa.int64())
        wn = wn.fill_null(0).cast(pa.int64())
        parts = pc.split_pattern(t.column("__k").combine_chunks(), _SEP)
        out = pa.Table.from_arrays(
            [pc.list_element(parts, 0), pc.list_element(parts, 1),
             wo, wn, status],
            names=[src, dst, "weight_old", "weight_new", "status"])
        return out.filter(pc.invert(pc.equal(out.column("weight_old"),
                                             out.column("weight_new"))))

    return j.map_batches(score, batch_format="pyarrow")


def component_stats(edges, *, src: str = "subj", dst: str = "obj",
                    weight: str = "weight", round_digits: int = 4):
    """Per-component KG summary: -> (component, n_nodes, n_edges,
    total_weight, density) — the graph-audit table a KG consumer reads
    before anything else (is the graph one giant hairball or many tight
    clusters? which component holds the watchlist?). ``density`` is
    2E / N(N-1) on the undirected edge count, rounded half-away (SQL
    ``round`` grain).

    Consumes the grouped both-orientations edge table (the
    ``aggregate_edges`` contract). The component labels come from
    :func:`components` (vocab-bounded); the only other work is one
    lo<hi orientation filter, one :func:`adaptive_join` of the
    undirected edges against the broadcast label table, and two grouped
    aggregates on the component keyspace — no corpus-sized exchange."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    comp = components(edges, src=src, dst=dst).materialize()
    if comp.count() == 0:
        return rd.from_arrow(pa.table(
            {"component": pa.array([], pa.string()),
             "n_nodes": pa.array([], pa.int64()),
             "n_edges": pa.array([], pa.int64()),
             "total_weight": pa.array([], pa.int64()),
             "density": pa.array([], pa.float64())}))
    node_counts = grouped_agg(comp, ["component"],
                              [("norm", "count", "n_nodes")], final="tree")
    und = edges.map_batches(
        lambda t: t.filter(pc.less(t.column(src), t.column(dst)))
                   .select([src, dst, weight]),
        batch_format="pyarrow")
    lab = comp.map_batches(lambda t: t.rename_columns([src, "component"]),
                           batch_format="pyarrow")
    edge_stats = grouped_agg(
        adaptive_join(und, lab, on=src).map_batches(
            lambda t: t.select(["component", weight]),
            batch_format="pyarrow"),
        ["component"],
        [(weight, "count", "n_edges"), (weight, "sum", "total_weight")],
        final="tree")
    out = adaptive_join(node_counts, edge_stats, on="component")

    def score(t: pa.Table, rd_=round_digits) -> pa.Table:
        import numpy as np

        n = t.column("n_nodes").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        e = t.column("n_edges").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        dens = _round_away(
            np.where(n > 1, 2.0 * e / np.where(n > 1, n * (n - 1), 1.0),
                     0.0), rd_)
        return t.append_column("density", pa.array(dens, pa.float64()))

    return out.map_batches(score, batch_format="pyarrow")


def label_propagation(edges, *, src: str = "subj", dst: str = "obj",
                      weight: str = "weight", iters: int = 4):
    """Deterministic synchronous weighted label propagation
    (Raghavan et al. 2007, made order-free): -> (norm, community).

    Every node starts labeled with itself; each of the ``iters``
    synchronous rounds relabels node v with the neighbor label carrying
    the LARGEST total incident edge weight, ties broken by the
    lexicographically smallest label. Unlike classic LPA's
    random-order asynchronous update, the synchronous + lexicographic
    rule is fully deterministic and exactly reproducible in SQL — the
    community assignment is a parity-checkable artifact, not a sample.

    Expects the grouped both-orientations edge table (the
    ``aggregate_edges`` contract), so a node's in-rows ARE its
    undirected neighborhood. Per round: one :func:`adaptive_join` of the
    edge table against the vocab-bounded label table (broadcast under
    the gate, hash-shuffle above) + three grouped aggregates on the
    (node x label)-bounded keyspace — no corpus-sized exchange, driver
    holds nothing but the loop counter."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    e3 = edges.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column(src), t.column(dst),
             pc.cast(t.column(weight), pa.int64())],
            names=["node", "nbr", "__w"]),
        batch_format="pyarrow").materialize()
    if e3.count() == 0:
        return rd.from_arrow(pa.table(
            {"norm": pa.array([], pa.string()),
             "community": pa.array([], pa.string())}))
    labels = grouped_agg(
        e3.map_batches(lambda t: t.select(["node"]),
                       batch_format="pyarrow"),
        ["node"], [("node", "count", "__c")]) \
        .map_batches(lambda t: pa.Table.from_arrays(
            [t.column("node"), t.column("node")],
            names=["nbr", "lbl"]), batch_format="pyarrow").materialize()
    for _ in range(iters):
        # total incident weight per (node, neighbor label)
        lw = grouped_agg(
            adaptive_join(e3, labels, on="nbr").map_batches(
                lambda t: t.select(["node", "lbl", "__w"]),
                batch_format="pyarrow"),
            ["node", "lbl"], [("__w", "sum", "w")]).materialize()
        mx = grouped_agg(lw, ["node"], [("w", "max", "__mw")])
        labels = grouped_agg(
            adaptive_join(lw, mx, on="node").map_batches(
                lambda t: t.filter(pc.equal(t.column("w"),
                                            t.column("__mw")))
                           .select(["node", "lbl"]),
                batch_format="pyarrow"),
            ["node"], [("lbl", "min", "lbl")]).map_batches(
                lambda t: t.rename_columns(["nbr", "lbl"]),
                batch_format="pyarrow").materialize()
    return labels.map_batches(
        lambda t: t.rename_columns(["norm", "community"]),
        batch_format="pyarrow")


def negative_samples(edges, *, src: str = "subj", dst: str = "obj",
                     k: int = 2):
    """Hash-deterministic NEGATIVE pairs for link-prediction training:
    for every undirected positive edge (s < o), corrupt the object into
    ``k`` candidate non-edges -> (subj, neg_obj, slot). The candidate
    for slot j is the node at lexicographic rank
    ``((r_s * 2654435761 + r_o * 40503 + j * 97) mod 2^32) mod n``
    (1-based ranks over the sorted node vocabulary — SQL
    ``row_number() OVER (ORDER BY node)`` parity); candidates that hit
    the subject itself or an existing edge (either orientation) are
    DROPPED, not resampled, so the output is a pure function of the
    graph. Knuth-hash corruption is the standard KG-embedding
    negative-sampling scheme (Bordes et al. 2013) made reproducible.

    The node vocabulary and the packed sorted edge-key array broadcast
    once via ``ray.put`` (vocab / vocab^2-bounded by the edge-table
    contract); generation is one vectorized numpy pass per edge batch —
    no exchange at all. Contract: vocabulary size < 2^32."""
    import numpy as np
    import ray
    import ray.data as rd

    empty = pa.table({"subj": pa.array([], pa.string()),
                      "neg_obj": pa.array([], pa.string()),
                      "slot": pa.array([], pa.int64())})
    und = edges.map_batches(
        lambda t: t.filter(pc.less(t.column(src), t.column(dst)))
                   .select([src, dst]),
        batch_format="pyarrow").materialize()
    blocks = [b for b in ray.get(und.to_arrow_refs()) if len(b)]
    if not blocks:
        return rd.from_arrow(empty)
    t = pa.concat_tables(blocks).combine_chunks() \
        .group_by([src, dst]).aggregate([]).combine_chunks()
    vocab = np.unique(np.concatenate(
        [t.column(src).to_numpy(zero_copy_only=False),
         t.column(dst).to_numpy(zero_copy_only=False)]))
    a_c = np.searchsorted(vocab, t.column(src).to_numpy(
        zero_copy_only=False)).astype(np.uint64)
    b_c = np.searchsorted(vocab, t.column(dst).to_numpy(
        zero_copy_only=False)).astype(np.uint64)
    direct = np.unique((a_c << np.uint64(32)) | b_c)  # a < b by contract
    n = len(vocab)
    state_ref = ray.put((vocab, direct))

    def gen(batch: pa.Table, k_=int(k), n_=int(n)) -> pa.Table:
        voc, direct_ = ray.get(state_ref)
        s = batch.column(src).to_numpy(zero_copy_only=False)
        o = batch.column(dst).to_numpy(zero_copy_only=False)
        cs = np.searchsorted(voc, s).astype(np.uint64)
        co = np.searchsorted(voc, o).astype(np.uint64)
        outs, outo, outj = [], [], []
        for j in range(1, k_ + 1):
            h = ((cs + np.uint64(1)) * np.uint64(2654435761)
                 + (co + np.uint64(1)) * np.uint64(40503)
                 + np.uint64(j * 97)) % np.uint64(1 << 32)
            idx = h % np.uint64(n_)
            lo = np.minimum(cs, idx)
            hi = np.maximum(cs, idx)
            key = (lo << np.uint64(32)) | hi
            pos = np.searchsorted(direct_, key)
            pos_c = np.minimum(pos, len(direct_) - 1)
            keep = (idx != cs) & ~(direct_[pos_c] == key)
            outs.append(s[keep])
            outo.append(voc[idx[keep].astype(np.int64)])
            outj.append(np.full(int(keep.sum()), j, dtype=np.int64))
        return pa.table({
            "subj": pa.array(np.concatenate(outs), pa.string()),
            "neg_obj": pa.array(np.concatenate(outo), pa.string()),
            "slot": pa.array(np.concatenate(outj), pa.int64())})

    return und.map_batches(gen, batch_format="pyarrow")


def betweenness(edges, *, src: str = "subj", dst: str = "obj",
                round_digits: int = 4, n_tasks: int = 32):
    """EXACT betweenness centrality (Brandes 2001) over the unweighted
    co-occurrence graph -> (norm, betweenness): for every node v, the
    sum over ordered pairs (s, t), s != v != t, of the fraction of
    shortest s->t paths passing through v. The symmetric edge-table
    contract makes this the undirected betweenness x2 (each unordered
    pair counted in both directions) — the convention is pinned so the
    derived gold and the engine agree exactly. Scores are rounded
    half-away at ``round_digits`` (tiny cross-task float reordering sits
    ~1e-12 below the grain).

    Kernel: the int-coded CSR adjacency broadcasts once via ``ray.put``
    (vocab-bounded); tasks over root ranges each run Brandes'
    single-source BFS + reverse dependency accumulation in numpy-indexed
    arrays and emit ONE per-task partial score vector, merged by a
    grouped sum on the node keyspace — per-task output is O(vocab), not
    O(roots x vocab), and there is no other exchange."""
    import numpy as np
    import ray
    import ray.data as rd

    from easyner_ray.ops.relational import grouped_agg

    empty = pa.table({"norm": pa.array([], pa.string()),
                      "betweenness": pa.array([], pa.float64())})
    blocks = [b for b in ray.get(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow").to_arrow_refs())
        if len(b)]
    if not blocks:
        return rd.from_arrow(empty)
    t = pa.concat_tables(blocks).combine_chunks() \
        .group_by([src, dst]).aggregate([]).combine_chunks()
    t = t.filter(pc.invert(pc.equal(t.column(src), t.column(dst))))
    if len(t) == 0:
        return rd.from_arrow(empty)
    node_c, nbr_c, bounds, starts, deg, vocab = _coded_neighbors(
        t, src, dst)
    nv = len(vocab)
    # CSR indptr by code: the symmetric contract gives every code a
    # segment, so cumsum(deg) is exactly the segment bounds
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    state_ref = ray.put((indptr, nbr_c))
    n_tasks = min(n_tasks, nv) or 1

    def brandes_task(batch: pa.Table) -> pa.Table:
        # level-synchronous Brandes, fully vectorized per level: expand
        # the whole frontier with one ranges->index gather (the two_hop
        # kernel's trick), accumulate path counts / dependencies with
        # np.add.at over the level's edge set — no per-node Python loop
        indptr_, adj = ray.get(state_ref)
        nv_ = len(indptr_) - 1
        score = np.zeros(nv_, dtype=np.float64)
        for root in batch.column("gi").to_numpy():
            dist = np.full(nv_, -1, dtype=np.int64)
            sigma = np.zeros(nv_, dtype=np.float64)
            dist[root] = 0
            sigma[root] = 1.0
            frontier = np.array([root], dtype=np.int64)
            level_edges = []  # per depth: (v at d, w at d+1) DAG edges
            d = 0
            while len(frontier):
                st = indptr_[frontier]
                ln = indptr_[frontier + 1] - st
                tot = int(ln.sum())
                if tot == 0:
                    break
                flat = np.arange(tot, dtype=np.int64)
                idx = (flat - np.repeat(np.cumsum(ln) - ln, ln)
                       + np.repeat(st, ln))
                w = adj[idx]
                v_rep = np.repeat(frontier, ln)
                new_nodes = np.unique(w[dist[w] < 0])
                dist[new_nodes] = d + 1
                sel = dist[w] == d + 1
                vs, ws = v_rep[sel], w[sel]
                if len(vs):
                    np.add.at(sigma, ws, sigma[vs])
                    level_edges.append((vs, ws))
                frontier = new_nodes
                d += 1
            delta = np.zeros(nv_, dtype=np.float64)
            for vs, ws in reversed(level_edges):
                np.add.at(delta, vs,
                          sigma[vs] * (1.0 + delta[ws]) / sigma[ws])
            mask = dist >= 0
            mask[root] = False
            score[mask] += delta[mask]
        nz = np.flatnonzero(score)
        return pa.table({"__c": pa.array(nz, pa.int64()),
                         "__s": pa.array(score[nz], pa.float64())})

    group_ids = rd.from_arrow(pa.table(
        {"gi": pa.array(np.arange(nv), pa.int64())}))
    partials = group_ids.map_batches(
        brandes_task, batch_format="pyarrow",
        batch_size=max(1, (nv + n_tasks - 1) // n_tasks))
    summed = grouped_agg(partials, ["__c"], [("__s", "sum", "__s")])

    def fin(tbl: pa.Table, rd_=round_digits) -> pa.Table:
        names = vocab.take(tbl.column("__c").combine_chunks())
        vals = _round_away(tbl.column("__s").combine_chunks().to_numpy(
            zero_copy_only=False), rd_)
        return pa.table({"norm": names,
                         "betweenness": pa.array(vals, pa.float64())})

    # nodes with zero betweenness (leaves) still belong in the output
    out = summed.map_batches(fin, batch_format="pyarrow")
    from easyner_ray.ops.relational import adaptive_join

    all_nodes = rd.from_arrow(pa.table({"norm": vocab}))
    j = adaptive_join(all_nodes, out, on="norm", how="left")
    return j.map_batches(
        lambda tb: pa.table(
            {"norm": tb.column("norm"),
             "betweenness": pc.coalesce(tb.column("betweenness"),
                                        pa.scalar(0.0, pa.float64()))}),
        batch_format="pyarrow")


def eccentricity(edges, *, src: str = "subj", dst: str = "obj",
                 n_tasks: int = 32):
    """Per-node eccentricity over the unweighted co-occurrence graph ->
    (norm, eccentricity, n_reachable): the max hop distance from the
    node to anything in ITS component, plus how many nodes that is —
    the radius/diameter profile of the KG (max eccentricity = graph
    diameter, min = radius, per component).

    Same broadcast-adjacency fan as :func:`betweenness`: int-coded CSR
    via ``ray.put`` once (vocab-bounded), tasks over root ranges run a
    level-synchronous vectorized BFS per root and emit one row per
    root — no exchange beyond the output concat."""
    import numpy as np
    import ray
    import ray.data as rd

    empty = pa.table({"norm": pa.array([], pa.string()),
                      "eccentricity": pa.array([], pa.int64()),
                      "n_reachable": pa.array([], pa.int64())})
    blocks = [b for b in ray.get(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow").to_arrow_refs())
        if len(b)]
    if not blocks:
        return rd.from_arrow(empty)
    t = pa.concat_tables(blocks).combine_chunks() \
        .group_by([src, dst]).aggregate([]).combine_chunks()
    t = t.filter(pc.invert(pc.equal(t.column(src), t.column(dst))))
    if len(t) == 0:
        return rd.from_arrow(empty)
    node_c, nbr_c, bounds, starts, deg, vocab = _coded_neighbors(
        t, src, dst)
    nv = len(vocab)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    state_ref = ray.put((indptr, nbr_c))
    n_tasks = min(n_tasks, nv) or 1

    def bfs_task(batch: pa.Table) -> pa.Table:
        indptr_, adj = ray.get(state_ref)
        nv_ = len(indptr_) - 1
        roots = batch.column("gi").to_numpy()
        ecc = np.empty(len(roots), dtype=np.int64)
        nreach = np.empty(len(roots), dtype=np.int64)
        for i, root in enumerate(roots):
            seen = np.zeros(nv_, dtype=bool)
            seen[root] = True
            frontier = np.array([root], dtype=np.int64)
            d = 0
            total = 0
            while len(frontier):
                st = indptr_[frontier]
                ln = indptr_[frontier + 1] - st
                tot = int(ln.sum())
                if tot == 0:
                    break
                flat = np.arange(tot, dtype=np.int64)
                idx = (flat - np.repeat(np.cumsum(ln) - ln, ln)
                       + np.repeat(st, ln))
                w = adj[idx]
                new_nodes = np.unique(w[~seen[w]])
                if not len(new_nodes):
                    break
                seen[new_nodes] = True
                total += len(new_nodes)
                frontier = new_nodes
                d += 1
            ecc[i] = d
            nreach[i] = total
        return pa.table({
            "norm": vocab.take(pa.array(roots, pa.int64())),
            "eccentricity": pa.array(ecc, pa.int64()),
            "n_reachable": pa.array(nreach, pa.int64())})

    group_ids = rd.from_arrow(pa.table(
        {"gi": pa.array(np.arange(nv), pa.int64())}))
    return group_ids.map_batches(
        bfs_task, batch_format="pyarrow",
        batch_size=max(1, (nv + n_tasks - 1) // n_tasks))


def shortest_paths(edges, seeds, *, src: str = "subj", dst: str = "obj"):
    """Shortest evidence chains from seed entities -> (seed, norm, hops,
    path) for every node reachable from each seed: the hop count plus
    the RECONSTRUCTED path rendered ``seed -> ... -> node`` — the "how
    are these two entities connected" query a KG auditor asks after a
    watchlist hit (kg_bfs_hops gives the distance; this gives the
    chain). Deterministic path choice: each node's predecessor is the
    lexicographically smallest entity among its distance-(d-1)
    neighbors — a local rule both engines state identically.

    Distributed shape: same broadcast-CSR fan as :func:`eccentricity`
    (edge table is vocab^2-bounded, shipped once via ``ray.put``); one
    task per seed runs a level-synchronous vectorized BFS, derives all
    predecessors in ONE pass over the flat edge arrays
    (``np.minimum.at`` grouped by destination), and rebuilds paths
    level-by-level with whole-level string concatenation — no per-node
    Python walk."""
    import numpy as np
    import ray
    import ray.data as rd

    empty = pa.table({"seed": pa.array([], pa.string()),
                      "norm": pa.array([], pa.string()),
                      "hops": pa.array([], pa.int64()),
                      "path": pa.array([], pa.string())})
    seed_set = sorted(set(seeds))
    if not seed_set:
        return rd.from_arrow(empty)
    blocks = [b for b in ray.get(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow").to_arrow_refs())
        if len(b)]
    if not blocks:
        return rd.from_arrow(empty)
    t = pa.concat_tables(blocks).combine_chunks() \
        .group_by([src, dst]).aggregate([]).combine_chunks()
    t = t.filter(pc.invert(pc.equal(t.column(src), t.column(dst))))
    if len(t) == 0:
        return rd.from_arrow(empty)
    node_c, nbr_c, bounds, starts, deg, vocab = _coded_neighbors(
        t, src, dst)
    nv = len(vocab)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    names = np.asarray(vocab.to_pylist(), dtype=object)
    code_of = {n: i for i, n in enumerate(names)}
    roots = [code_of[s] for s in seed_set if s in code_of]
    if not roots:
        return rd.from_arrow(empty)
    state_ref = ray.put((indptr, nbr_c, node_c, names))

    def sp_task(batch: pa.Table) -> pa.Table:
        indptr_, adj, u_flat, names_ = ray.get(state_ref)
        nv_ = len(indptr_) - 1
        out = []
        for root in batch.column("root").to_numpy():
            dist = np.full(nv_, -1, dtype=np.int64)
            dist[root] = 0
            frontier = np.array([root], dtype=np.int64)
            d = 0
            while len(frontier):
                st = indptr_[frontier]
                ln = indptr_[frontier + 1] - st
                tot = int(ln.sum())
                if tot == 0:
                    break
                flat = np.arange(tot, dtype=np.int64)
                idx = (flat - np.repeat(np.cumsum(ln) - ln, ln)
                       + np.repeat(st, ln))
                w = adj[idx]
                new_nodes = np.unique(w[dist[w] < 0])
                if not len(new_nodes):
                    break
                d += 1
                dist[new_nodes] = d
                frontier = new_nodes
            # predecessors in one pass over the flat (u, w) edge arrays:
            # min u with dist[u] + 1 == dist[w]
            pred = np.full(nv_, nv_, dtype=np.int64)
            ok = (dist[u_flat] >= 0) & (dist[u_flat] + 1 == dist[adj])
            np.minimum.at(pred, adj[ok], u_flat[ok])
            # level-by-level whole-level path concatenation
            maxd = int(dist.max())
            path = np.empty(nv_, dtype=object)
            path[root] = names_[root]
            for lev in range(1, maxd + 1):
                sel = np.flatnonzero(dist == lev)
                if not len(sel):
                    break
                path[sel] = (path[pred[sel]] + " -> ") + names_[sel]
            reach = np.flatnonzero(dist >= 0)
            out.append(pa.table({
                "seed": pa.array([str(names_[root])] * len(reach),
                                 pa.string()),
                "norm": pa.array(names_[reach], pa.string()),
                "hops": pa.array(dist[reach], pa.int64()),
                "path": pa.array(path[reach], pa.string())}))
        return pa.concat_tables(out) if out else pa.table({
            "seed": pa.array([], pa.string()),
            "norm": pa.array([], pa.string()),
            "hops": pa.array([], pa.int64()),
            "path": pa.array([], pa.string())})

    roots_ds = rd.from_arrow(pa.table(
        {"root": pa.array(roots, pa.int64())}))
    return roots_ds.map_batches(sp_task, batch_format="pyarrow",
                                batch_size=1)


def bridges(edges, *, src: str = "subj", dst: str = "obj"):
    """Bridge (cut) edges of the undirected co-occurrence graph ->
    (norm_a, norm_b), norm_a < norm_b, sorted: the edges whose removal
    disconnects their endpoints — the KG's single points of failure
    (a bridge between two entity clusters is one fragile sentence of
    evidence; everything else is corroborated by an alternative path).

    Distributed shape: the edge list is the GROUPED co-occurrence table
    (vocab^2-bounded by construction, NOT corpus-sized), shipped once
    via ``ray.put``; bridge-finding is one Tarjan low-link DFS — O(V+E)
    but inherently sequential, so it runs as ONE raw Ray task over the
    broadcast CSR (the documented last-resort shape: a shared traversal
    state no batch decomposition expresses). The distinct-pair edge
    convention means no multi-edges, so the parent-node skip is exact."""
    import numpy as np
    import ray
    import ray.data as rd

    empty = pa.table({"norm_a": pa.array([], pa.string()),
                      "norm_b": pa.array([], pa.string())})
    blocks = [b for b in ray.get(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow").to_arrow_refs())
        if len(b)]
    if not blocks:
        return rd.from_arrow(empty)
    t = pa.concat_tables(blocks).combine_chunks() \
        .group_by([src, dst]).aggregate([]).combine_chunks()
    t = t.filter(pc.invert(pc.equal(t.column(src), t.column(dst))))
    if len(t) == 0:
        return rd.from_arrow(empty)
    node_c, nbr_c, bounds, starts, deg, vocab = _coded_neighbors(
        t, src, dst)
    nv = len(vocab)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    state_ref = ray.put((indptr, nbr_c))

    @ray.remote(num_cpus=1)
    def tarjan(state):
        indptr_, adj = state
        nv_ = len(indptr_) - 1
        disc = np.full(nv_, -1, dtype=np.int64)
        low = np.zeros(nv_, dtype=np.int64)
        parent = np.full(nv_, -1, dtype=np.int64)
        cursor = indptr_[:-1].copy()
        timer = 0
        out_a, out_b = [], []
        for root in range(nv_):
            if disc[root] != -1:
                continue
            disc[root] = low[root] = timer
            timer += 1
            stack = [root]
            while stack:
                u = stack[-1]
                if cursor[u] < indptr_[u + 1]:
                    v = int(adj[cursor[u]])
                    cursor[u] += 1
                    if disc[v] == -1:
                        parent[v] = u
                        disc[v] = low[v] = timer
                        timer += 1
                        stack.append(v)
                    elif v != parent[u]:
                        if disc[v] < low[u]:
                            low[u] = disc[v]
                else:
                    stack.pop()
                    if stack:
                        p = stack[-1]
                        if low[u] < low[p]:
                            low[p] = low[u]
                        if low[u] > disc[p]:
                            out_a.append(min(p, u))
                            out_b.append(max(p, u))
        return (np.array(out_a, dtype=np.int64),
                np.array(out_b, dtype=np.int64))

    a_c, b_c = ray.get(tarjan.remote(state_ref))
    if not len(a_c):
        return rd.from_arrow(empty)
    order = np.lexsort((b_c, a_c))
    out = pa.table({
        "norm_a": vocab.take(pa.array(a_c[order], pa.int64())),
        "norm_b": vocab.take(pa.array(b_c[order], pa.int64()))})
    return rd.from_arrow(out)


def integrity_report(nodes, edges):
    """Referential-integrity gate over a materialized KG -> ONE row
    ``(n_nodes, n_edges, n_dangling_subj, n_dangling_obj, n_self_loops,
    n_bad_weight)``: edge endpoints whose ``subj_id``/``obj_id`` miss
    the node table, self-loop edges, and non-positive weights — all
    zero on a healthy build (the CI-gate twin of ``stages/metrics``'
    P/R gates, run against the artifact instead of the predictions).

    Two :func:`adaptive_join` left probes of the edge stream against
    the node-id projection (broadcast under the gate, hash-shuffle on
    an open node keyspace) + one streaming per-batch count partial
    folded by ``Dataset.sum`` — no materialization of either table."""
    import numpy as np
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join

    ids_s = nodes.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("node_id"),
             pa.array(np.ones(len(t), dtype=np.int8))],
            names=["subj_id", "__s_ok"]),
        batch_format="pyarrow")
    ids_o = nodes.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("node_id"),
             pa.array(np.ones(len(t), dtype=np.int8))],
            names=["obj_id", "__o_ok"]),
        batch_format="pyarrow")
    j = adaptive_join(
        edges.map_batches(
            lambda t: t.select(["subj_id", "subj", "obj_id", "obj",
                                "weight"]),
            batch_format="pyarrow"),
        ids_s, on="subj_id", how="left")
    j = adaptive_join(j, ids_o, on="obj_id", how="left")

    def per_batch(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_edges": pa.array([len(t)], pa.int64()),
            "n_dangling_subj": pa.array(
                [t.column("__s_ok").null_count], pa.int64()),
            "n_dangling_obj": pa.array(
                [t.column("__o_ok").null_count], pa.int64()),
            "n_self_loops": pa.array(
                [pc.sum(pc.cast(pc.equal(t.column("subj"),
                                         t.column("obj")),
                                pa.int64())).as_py() or 0], pa.int64()),
            "n_bad_weight": pa.array(
                [pc.sum(pc.cast(pc.less_equal(t.column("weight"), 0),
                                pa.int64())).as_py() or 0], pa.int64()),
        })

    cols = ["n_edges", "n_dangling_subj", "n_dangling_obj",
            "n_self_loops", "n_bad_weight"]
    sums = j.map_batches(per_batch, batch_format="pyarrow").sum(cols)
    sums = sums or {f"sum({c})": 0 for c in cols}
    row = {"n_nodes": nodes.count()}
    row.update({c: int(sums[f"sum({c})"] or 0) for c in cols})
    return rd.from_arrow(pa.table(
        {k: pa.array([v], pa.int64()) for k, v in row.items()}))


def assortativity(edges, *, src: str = "subj", dst: str = "obj",
                  round_digits: int = 6):
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of the distinct-neighbor degrees at the two ends of
    every directed edge of the both-orientations edge table — positive
    when hubs link to hubs (assortative mixing), negative when hubs link
    to the periphery. -> ONE row ``(n_edges, assortativity)``; a graph
    with zero degree variance (every node the same degree) yields NULL,
    mirroring SQL division by zero.

    Scale shape: degree is one vocab-bounded grouped count (the edge
    table is distinct on (src, dst), so degree = row count per src);
    it joins back onto the vocab^2-bounded edge table ADAPTIVELY
    (broadcast under the byte gate, hash join above). The five Pearson
    moments accumulate as EXACT int64 per-batch partials (degrees are
    integers), so the final coefficient is one driver-side float64
    evaluation from integers both engines convert identically — the SQL
    oracle spells out the same sums and the same expression, making the
    float bit-exact by construction; ``round_digits`` (DuckDB
    half-away-from-zero semantics via :func:`_round_away`) is defense
    in depth only."""
    import math

    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    pairs = edges.map_batches(lambda t: t.select([src, dst]),
                              batch_format="pyarrow").materialize()
    if pairs.count() == 0:  # join probes need a schema-bearing right side
        return rd.from_arrow(pa.table(
            {"n_edges": pa.array([0], pa.int64()),
             "assortativity": pa.array([None], pa.float64())}))
    deg = grouped_agg(pairs.map_batches(lambda t: t.select([src]),
                                        batch_format="pyarrow"),
                      [src], [(src, "count", "deg")])

    dx = deg.map_batches(lambda t: t.rename_columns(["__n", "x"]),
                         batch_format="pyarrow").materialize()
    dy = dx.map_batches(lambda t: t.rename_columns(["__n", "y"]),
                        batch_format="pyarrow")
    j = adaptive_join(
        adaptive_join(pairs, dx, on=src, right_on="__n"),
        dy, on=dst, right_on="__n")

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("x").cast(pa.int64())
        y = t.column("y").cast(pa.int64())
        def s(a):
            return int(pc.sum(a).as_py() or 0)
        return pa.Table.from_pydict({
            "n": [len(t)], "sx": [s(x)], "sy": [s(y)],
            "sxy": [s(pc.multiply_checked(x, y))],
            "sxx": [s(pc.multiply_checked(x, x))],
            "syy": [s(pc.multiply_checked(y, y))]})

    agg = j.map_batches(moments, batch_format="pyarrow") \
        .sum(["n", "sx", "sy", "sxy", "sxx", "syy"])
    agg = agg or {}
    n = int(agg.get("sum(n)") or 0)
    if n == 0:
        return rd.from_arrow(pa.table(
            {"n_edges": pa.array([0], pa.int64()),
             "assortativity": pa.array([None], pa.float64())}))
    sx, sy = float(agg["sum(sx)"]), float(agg["sum(sy)"])
    sxy, sxx, syy = (float(agg["sum(sxy)"]), float(agg["sum(sxx)"]),
                     float(agg["sum(syy)"]))
    nf = float(n)
    num = nf * sxy - sx * sy
    den = math.sqrt(nf * sxx - sx * sx) * math.sqrt(nf * syy - sy * sy)
    r = None if den == 0.0 else float(_round_away(num / den, round_digits))
    return rd.from_arrow(pa.table(
        {"n_edges": pa.array([n], pa.int64()),
         "assortativity": pa.array([r], pa.float64())}))


def transition_edges(mentions, *, batch_size: int = 65536,
                     assume_distinct: bool = False):
    """DIRECTED turn-transition entity edges — the conversation-flow
    graph the symmetric co-occurrence table cannot express: one edge
    ``(src, dst, weight)`` per ordered entity pair where ``src`` is
    mentioned in turn ``t`` and ``dst`` in turn ``t+1`` of the same
    conversation (self-transitions excluded); ``weight`` = number of
    (conv, turn) adjacency instances carrying the pair. This is the
    directed surface :func:`easyner_ray.ops.graph.hits` needs (on the
    symmetric table hub == authority == eigenvector centrality).

    Scale shape: mentions first collapse to DISTINCT (conv, turn, norm)
    through one bucketed grouped count (keyspace = turns x per-turn
    vocabulary, far below the mention stream); the adjacency self-join
    keys both sides on the composite ``conv\\x1fturn`` string — the
    LEFT side keyed at ``turn+1`` so equality IS the succession — via
    the size-gated :func:`relational.adaptive_join` (hash path at
    corpus scale); the pair rollup is vocab^2-bounded."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    if assume_distinct:  # caller already holds the distinct rollup
        tn = mentions.materialize()
    else:
        tn = grouped_agg(
            mentions.map_batches(
                lambda t: t.select(["conv_id", "turn_idx", "norm"]),
                batch_format="pyarrow", batch_size=batch_size),
            ["conv_id", "turn_idx", "norm"], [("norm", "count", "__c")],
        ).materialize()  # feeds both join sides

    def keyed(next_turn: bool, out_col: str):
        shift = 1 if next_turn else 0

        def f(t: pa.Table, s=shift, oc=out_col) -> pa.Table:
            k = pc.binary_join_element_wise(
                t.column("conv_id"),
                pc.cast(pc.add(t.column("turn_idx"),
                               pa.scalar(s, pa.int32())), pa.string()),
                _SEP)
            return pa.Table.from_arrays([k, t.column("norm")],
                                        names=["__k", oc])

        return tn.map_batches(f, batch_format="pyarrow",
                              batch_size=batch_size)

    j = adaptive_join(keyed(True, "src"), keyed(False, "dst"), on="__k")
    pairs = j.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("src"),
                                              t.column("dst"))))
                   .select(["src", "dst"]),
        batch_format="pyarrow")
    return grouped_agg(pairs, ["src", "dst"],
                       [("src", "count", "weight")])


def modularity(edges, communities, *, src: str = "subj", dst: str = "obj",
               weight: str = "weight"):
    """Weighted modularity Q (Newman & Girvan 2004) of a node partition
    over the both-orientations edge table -> ONE row
    ``(n_communities, modularity)``::

        Q = W_in / W  -  sum_c S_c^2 / W^2

    with ``W`` = total directed weight (2m), ``W_in`` = weight on edges
    whose endpoints share a community, ``S_c`` = summed node strength
    per community. Scores the :func:`label_propagation` partition (or
    any (norm, community) table) — the standard "did the clustering
    find real structure" gate (Q ~ 0: no better than random; > ~0.3:
    strong).

    Determinism: weights are integer counts, so ``W``, ``W_in`` and
    ``sum S_c^2`` all accumulate as EXACT int64 partials; the final Q
    is one driver-side float expression mirrored verbatim by the SQL
    oracle — bit-exact, no rounding grain. Exchanges: two adaptive
    joins of the vocab-bounded community map onto the vocab^2-bounded
    edge table, one vocab-bounded strength rollup; nothing corpus-sized
    moves."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    empty = pa.table({"n_communities": pa.array([0], pa.int64()),
                      "modularity": pa.array([None], pa.float64())})
    edges = edges.map_batches(lambda t: t.select([src, dst, weight]),
                              batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(empty)
    comm = communities.materialize()

    cs = comm.map_batches(lambda t: t.rename_columns(["__n", "__cs"]),
                          batch_format="pyarrow").materialize()
    co = cs.map_batches(lambda t: t.rename_columns(["__n", "__co"]),
                        batch_format="pyarrow")
    j = adaptive_join(adaptive_join(edges, cs, on=src, right_on="__n"),
                      co, on=dst, right_on="__n")

    def edge_moments(t: pa.Table) -> pa.Table:
        w = t.column(weight).cast(pa.int64())
        same = pc.equal(t.column("__cs"), t.column("__co"))
        win = pc.sum(pc.if_else(same, w, pa.scalar(0, pa.int64()))).as_py()
        return pa.Table.from_pydict(
            {"tw": [int(pc.sum(w).as_py() or 0)], "win": [int(win or 0)]})

    em = j.map_batches(edge_moments, batch_format="pyarrow") \
        .sum(["tw", "win"]) or {}
    tw = int(em.get("sum(tw)") or 0)
    win = int(em.get("sum(win)") or 0)
    if tw == 0:
        return rd.from_arrow(empty)

    st = grouped_agg(edges.map_batches(
        lambda t: t.select([src, weight]), batch_format="pyarrow"),
        [src], [(weight, "sum", "__st")])
    sc = grouped_agg(
        adaptive_join(st, cs, on=src, right_on="__n").map_batches(
            lambda t: t.select(["__cs", "__st"]), batch_format="pyarrow"),
        ["__cs"], [("__st", "sum", "__sc")])

    def comm_moments(t: pa.Table) -> pa.Table:
        s = t.column("__sc").cast(pa.int64())
        return pa.Table.from_pydict(
            {"ssq": [int(pc.sum(pc.multiply_checked(s, s)).as_py() or 0)],
             "nc": [len(t)]})

    cm = sc.map_batches(comm_moments, batch_format="pyarrow") \
        .sum(["ssq", "nc"]) or {}
    ssq = int(cm.get("sum(ssq)") or 0)
    nc = int(cm.get("sum(nc)") or 0)
    q = (float(win) / float(tw)
         - float(ssq) / (float(tw) * float(tw)))
    return rd.from_arrow(pa.table(
        {"n_communities": pa.array([nc], pa.int64()),
         "modularity": pa.array([q], pa.float64())}))


def closeness(edges, *, src: str = "subj", dst: str = "obj",
              n_tasks: int = 32):
    """Closeness-centrality moments per node over the unweighted
    co-occurrence graph -> (norm, n_reachable, sum_dist): how many nodes
    the entity can reach in ITS component and the total hop distance to
    them. Both are exact int64 — classic closeness ``n_reachable /
    sum_dist`` (and the Wasserman–Faust component correction) are the
    caller's division, so there is no float grain to negotiate with the
    oracle; :func:`eccentricity` gives the max-distance companion.

    Same broadcast-adjacency fan as :func:`betweenness` /
    :func:`eccentricity`: the int-coded CSR ships once via ``ray.put``
    (vocab-bounded), tasks over root ranges run one level-synchronous
    vectorized BFS per root (frontier expansion = one ranges->index
    gather, no per-node Python loop) and emit one row per root — no
    exchange beyond the output concat."""
    import numpy as np
    import ray
    import ray.data as rd

    empty = pa.table({"norm": pa.array([], pa.string()),
                      "n_reachable": pa.array([], pa.int64()),
                      "sum_dist": pa.array([], pa.int64())})
    blocks = [b for b in ray.get(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow").to_arrow_refs())
        if len(b)]
    if not blocks:
        return rd.from_arrow(empty)
    t = pa.concat_tables(blocks).combine_chunks() \
        .group_by([src, dst]).aggregate([]).combine_chunks()
    t = t.filter(pc.invert(pc.equal(t.column(src), t.column(dst))))
    if len(t) == 0:
        return rd.from_arrow(empty)
    node_c, nbr_c, bounds, starts, deg, vocab = _coded_neighbors(
        t, src, dst)
    nv = len(vocab)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    state_ref = ray.put((indptr, nbr_c))
    n_tasks = min(n_tasks, nv) or 1

    def bfs_task(batch: pa.Table) -> pa.Table:
        indptr_, adj = ray.get(state_ref)
        nv_ = len(indptr_) - 1
        roots = batch.column("gi").to_numpy()
        nreach = np.empty(len(roots), dtype=np.int64)
        sumd = np.empty(len(roots), dtype=np.int64)
        for i, root in enumerate(roots):
            seen = np.zeros(nv_, dtype=bool)
            seen[root] = True
            frontier = np.array([root], dtype=np.int64)
            d = 0
            total = 0
            dist_total = 0
            while len(frontier):
                st = indptr_[frontier]
                ln = indptr_[frontier + 1] - st
                tot = int(ln.sum())
                if tot == 0:
                    break
                flat = np.arange(tot, dtype=np.int64)
                idx = (flat - np.repeat(np.cumsum(ln) - ln, ln)
                       + np.repeat(st, ln))
                w = adj[idx]
                new_nodes = np.unique(w[~seen[w]])
                if not len(new_nodes):
                    break
                seen[new_nodes] = True
                total += len(new_nodes)
                dist_total += (d + 1) * len(new_nodes)
                frontier = new_nodes
                d += 1
            nreach[i] = total
            sumd[i] = dist_total
        return pa.table({
            "norm": vocab.take(pa.array(roots, pa.int64())),
            "n_reachable": pa.array(nreach, pa.int64()),
            "sum_dist": pa.array(sumd, pa.int64())})

    group_ids = rd.from_arrow(pa.table(
        {"gi": pa.array(np.arange(nv), pa.int64())}))
    return group_ids.map_batches(
        bfs_task, batch_format="pyarrow",
        batch_size=max(1, (nv + n_tasks - 1) // n_tasks))


def reciprocity(edges, *, src: str = "src", dst: str = "dst",
                batch_size: int = 65536,
                broadcast_bytes: int = 64 << 20):
    """Per-node reciprocity census over a DISTINCT directed edge table
    -> (norm, n_out, n_recip): distinct out-neighbors, and how many of
    them point back — "is this entity's conversational flow one-way
    (it foreshadows others) or mutual?" on the turn-transition graph.
    Both counts are exact int64; the reciprocity RATE ``n_recip /
    n_out`` is the caller's division (no float grain cross-engine).

    Input contract: ``edges`` carries DISTINCT (src, dst) pairs —
    :func:`transition_edges` output satisfies it by construction (it is
    a grouped rollup). Scale shape: the pair table keys itself on the
    packed ``src\\x1fdst`` string and LEFT-probes its own REVERSED
    projection through the size-gated :func:`relational.adaptive_join`
    (broadcast under the byte gate, hash-shuffle at corpus scale), then
    one two-phase grouped sum over the node keyspace — the exchange is
    pair-table-sized, never all-pairs."""
    import numpy as np

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    pairs = edges.map_batches(
        lambda t: t.select([src, dst]),
        batch_format="pyarrow", batch_size=batch_size).materialize()

    def fwd(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column(src), t.column(dst), _SEP)
        return pa.Table.from_arrays([t.column(src), k],
                                    names=["norm", "__k"])

    def rev(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column(dst), t.column(src), _SEP)
        return pa.Table.from_arrays(
            [k, pa.array(np.ones(len(t), dtype=np.int64))],
            names=["__k", "__back"])

    left = pairs.map_batches(fwd, batch_format="pyarrow",
                             batch_size=batch_size)
    right = pairs.map_batches(rev, batch_format="pyarrow",
                              batch_size=batch_size)
    j = adaptive_join(left, right, on="__k", how="left",
                      broadcast_bytes=broadcast_bytes,
                      approx_bytes=2 * pairs.size_bytes())

    def flags(t: pa.Table) -> pa.Table:
        back = pc.fill_null(t.column("__back"), 0)
        return pa.table({"norm": t.column("norm"),
                         "n_out": pa.array(
                             np.ones(len(t), dtype=np.int64)),
                         "n_recip": back})

    return grouped_agg(
        j.map_batches(flags, batch_format="pyarrow"),
        ["norm"], [("n_out", "sum", "n_out"),
                   ("n_recip", "sum", "n_recip")])


def random_walks(edges, *, walks_per_node: int = 2, walk_len: int = 4,
                 seed: int = 7, src: str = "subj", dst: str = "obj",
                 index_bytes: int = 256 << 20, emit: str = "nodes",
                 window: int = 2):
    """Deterministic node2vec-style walk corpus over the edge table —
    the training-data generator for graph embeddings (DeepWalk /
    node2vec p=q=1): ``walks_per_node`` walks of ``walk_len`` steps
    from every node, exploded to ``(start, walk_id, step, node)`` rows
    (step 0 = the start node) so the driver's value-hash compares
    scalars. ``emit="skipgrams"`` instead yields the word2vec-ready
    ``(start, walk_id, center_step, center, context)`` pairs within
    ``+-window`` inside each walk, built from the in-worker steps
    matrix — no self-join exchange.

    No RNG state anywhere: nodes integer-code by sorted-string rank,
    neighbor lists sort by that same rank, and step ``s`` of walk ``w``
    at node ``c`` picks neighbor ``splitmix64(mix(c, w, s, seed)) %
    deg(c)`` — every worker (and the straight-line gold) derives the
    identical choice from four integers, so block layout cannot move a
    step.

    Shape: the DISTINCT directed pair list collapses to a CSR adjacency
    index built once and broadcast via ``ray.put`` (vocab^2-bounded for
    the KG — the same budget :func:`easyner_ray.ops.graph.pagerank`
    gives its indexed paths; ``index_bytes`` guards the assumption),
    then ONE map-only pass over the node table walks every start
    vectorized (numpy gather per step over all walks in the batch —
    no per-row Python, no per-step shuffle). Graphs whose adjacency
    exceeds a worker's heap need the iterative-join formulation
    (:func:`bfs_hops`'s exchange shape, one join per step); this
    implementation documents that partitioning assumption instead of
    paying 2x joins x walk_len exchanges on vocab-bounded graphs."""
    import numpy as np
    import ray
    import ray.data as rd

    from easyner_ray.ops.sketch import splitmix64

    if emit == "skipgrams":
        empty = pa.table({"start": pa.array([], pa.string()),
                          "walk_id": pa.array([], pa.int64()),
                          "center_step": pa.array([], pa.int64()),
                          "center": pa.array([], pa.string()),
                          "context": pa.array([], pa.string())})
    else:
        empty = pa.table({"start": pa.array([], pa.string()),
                          "walk_id": pa.array([], pa.int64()),
                          "step": pa.array([], pa.int64()),
                          "node": pa.array([], pa.string())})

    # distinct directed pairs, vocab^2-bounded -> driver CSR build
    pair_blocks = [b for b in ray.get(
        edges.select_columns([src, dst]).map_batches(
            lambda t: t.group_by([src, dst]).aggregate([]),
            batch_format="pyarrow").to_arrow_refs()) if len(b)]
    if not pair_blocks:
        return empty
    pairs = pa.concat_tables(pair_blocks).group_by([src, dst]).aggregate([])
    if pairs.nbytes > index_bytes:
        raise ValueError(
            f"adjacency index {pairs.nbytes}B exceeds index_bytes="
            f"{index_bytes}; use the iterative-join formulation")
    a = np.asarray(pairs.column(src).to_pylist(), dtype=object)
    b = np.asarray(pairs.column(dst).to_pylist(), dtype=object)
    names = np.array(sorted(set(a) | set(b)), dtype=object)
    code = {v: i for i, v in enumerate(names)}
    ai = np.fromiter((code[v] for v in a), dtype=np.int64, count=len(a))
    bi = np.fromiter((code[v] for v in b), dtype=np.int64, count=len(b))
    order = np.lexsort((bi, ai))          # CSR: by node, nbrs by rank
    ai, bi = ai[order], bi[order]
    n = len(names)
    deg = np.bincount(ai, minlength=n).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(deg)))
    ref = ray.put((names, deg, offs, bi))

    w_per, L, sd = int(walks_per_node), int(walk_len), int(seed)

    def walk(t: pa.Table, _ref=ref) -> pa.Table:
        if len(t) == 0:
            return empty
        names_, deg_, offs_, adj_ = ray.get(_ref)
        ids = np.asarray(t.column("node_id"), dtype=np.int64)
        starts = np.repeat(ids, w_per)
        wids = np.tile(np.arange(w_per, dtype=np.int64), len(ids))
        m = len(starts)
        steps = np.empty((L + 1, m), dtype=np.int64)
        cur = starts.copy()
        steps[0] = cur
        for s in range(1, L + 1):
            with np.errstate(over="ignore"):
                key = ((cur.astype(np.uint64) << np.uint64(24))
                       ^ (wids.astype(np.uint64) << np.uint64(12))
                       ^ np.uint64(s)
                       ^ (np.uint64(sd) << np.uint64(48)))
            h = splitmix64(key)
            dcur = deg_[cur]
            safe_deg = np.maximum(dcur, 1).astype(np.uint64)
            r = (h % safe_deg).astype(np.int64)
            nxt = adj_[np.minimum(offs_[cur] + r, len(adj_) - 1)]
            cur = np.where(dcur > 0, nxt, cur)  # sinks stay put
            steps[s] = cur
        if emit == "skipgrams":
            # (center, context) pairs within +-window INSIDE each walk
            # — the word2vec-style trainable artifact; built from the
            # in-memory steps matrix, one vectorized slice per offset
            cs, xs, st, ww = [], [], [], []
            for off in range(-window, window + 1):
                if off == 0:
                    continue
                lo, hi = max(0, -off), min(L + 1, L + 1 - off)
                for s in range(lo, hi):
                    cs.append(steps[s])
                    xs.append(steps[s + off])
                    st.append(np.full(m, s, dtype=np.int64))
                    ww.append(wids)
            center = np.concatenate(cs)
            context = np.concatenate(xs)
            return pa.table({
                "start": pa.array(
                    names_[np.tile(starts, len(cs))], pa.string()),
                "walk_id": pa.array(np.concatenate(ww), pa.int64()),
                "center_step": pa.array(np.concatenate(st), pa.int64()),
                "center": pa.array(names_[center], pa.string()),
                "context": pa.array(names_[context], pa.string())})
        out_start = np.repeat(starts, L + 1)
        out_w = np.repeat(wids, L + 1)
        out_s = np.tile(np.arange(L + 1, dtype=np.int64), m)
        out_node = steps.T.reshape(-1)
        return pa.table({
            "start": pa.array(names_[out_start], pa.string()),
            "walk_id": pa.array(out_w, pa.int64()),
            "step": pa.array(out_s, pa.int64()),
            "node": pa.array(names_[out_node], pa.string())})

    nodes_ds = rd.from_arrow(pa.table(
        {"node_id": pa.array(np.arange(n, dtype=np.int64))}))
    return nodes_ds.map_batches(walk, batch_format="pyarrow")
