"""Graph analytics over the materialized KG edge table
(``ops/graph_analytics.py``): degree/strength profiles, 2-hop
reachability, triangle participation (degree-ordered oriented wedge
kernel incl. its pair-budget chunking), connected components (both the
union-find fast path and distributed min-label propagation), and
temporally annotated edges."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa


def _edges_ds(und, blocks: int = 2):
    """Undirected weighted edge list -> both-orientation Dataset with the
    ``aggregate_edges`` (subj, obj, weight) contract."""
    import ray.data as rd

    rows = {"subj": [], "obj": [], "weight": []}
    for s, o, w in und:
        for x, y in ((s, o), (o, s)):
            rows["subj"].append(x)
            rows["obj"].append(y)
            rows["weight"].append(w)
    return rd.from_arrow(pa.table(rows)).repartition(blocks)


_TOY = [("a", "b", 2), ("a", "c", 1), ("b", "c", 3), ("c", "d", 1),
        ("e", "f", 5)]


def _rand_graph(seed: int = 7, n: int = 40, m: int = 150):
    rng = np.random.default_rng(seed)
    nodes = [f"n{i:03d}" for i in range(n)]
    und = set()
    for _ in range(m):
        a, b = rng.choice(n, 2, replace=False)
        und.add((int(min(a, b)), int(max(a, b))))
    return nodes, sorted(und)


def test_degree_stats(ray_session):
    from easyner_ray.ops.graph_analytics import degree_stats

    out = {r["norm"]: r for r in
           degree_stats(_edges_ds(_TOY)).take_all()}
    assert out["c"]["degree"] == 3
    assert out["c"]["strength"] == 5
    assert out["c"]["max_edge_weight"] == 3
    assert out["e"]["degree"] == 1 and out["e"]["strength"] == 5
    assert len(out) == 6


def test_two_hop_counts(ray_session):
    from easyner_ray.ops.graph_analytics import two_hop_counts

    out = {r["norm"]: r["n_within_2"] for r in
           two_hop_counts(_edges_ds(_TOY)).take_all()}
    # a reaches b,c directly and d via c; e/f only each other
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 1, "f": 1}


def test_triangle_counts_toy(ray_session):
    from easyner_ray.ops.graph_analytics import triangle_counts

    out = {r["norm"]: r["n_triangles"] for r in
           triangle_counts(_edges_ds(_TOY)).take_all()}
    assert out == {"a": 1, "b": 1, "c": 1}  # d/e/f in no triangle


def test_triangle_counts_random_vs_brute_and_chunked(ray_session):
    from easyner_ray.ops.graph_analytics import triangle_counts

    nodes, und = _rand_graph()
    adj = {i: set() for i in range(len(nodes))}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    gold: dict[str, int] = {}
    for a, b, c in itertools.combinations(range(len(nodes)), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                gold[nodes[v]] = gold.get(nodes[v], 0) + 1

    ds = _edges_ds([(nodes[a], nodes[b], 1) for a, b in und], blocks=3)
    # default budget AND a 3-pair budget that forces the hub-chunking
    # path through every root
    for pb in (1 << 22, 3):
        got = {r["norm"]: r["n_triangles"] for r in
               triangle_counts(ds, pair_budget=pb).take_all()}
        assert got == gold, f"pair_budget={pb}"


def test_components_both_paths(ray_session):
    from easyner_ray.ops.graph_analytics import components

    nodes, und = _rand_graph(seed=11, n=30, m=10)  # sparse -> several CCs
    ds = _edges_ds([(nodes[a], nodes[b], 1) for a, b in und], blocks=3)
    fast = {r["norm"]: r["component"] for r in components(ds).take_all()}
    dist = {r["norm"]: r["component"] for r in
            components(ds, small_edge_cutoff=0).take_all()}
    assert fast == dist
    # every label is the lexicographic min of its member set
    members: dict[str, list[str]] = {}
    for n_, c in fast.items():
        members.setdefault(c, []).append(n_)
    for c, ms in members.items():
        assert c == min(ms)
    assert len(members) > 1


def test_components_empty(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import components, triangle_counts

    empty = rd.from_arrow(pa.table(
        {"subj": pa.array([], pa.string()),
         "obj": pa.array([], pa.string()),
         "weight": pa.array([], pa.int64())}))
    assert components(empty).take_all() == []
    assert triangle_counts(empty).take_all() == []


def test_temporal_edges(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import temporal_edges

    ts = pa.array([0, 60_000_000, 120_000_000], pa.timestamp("us"))
    transcripts = rd.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "ts": ts,
    }))
    # sentence-level pair stream: (x,y) in c1/t0 and c1/t1; (x,y) in c2/t0
    triples = rd.from_arrow(pa.table({
        "subj": ["x", "y", "x", "y", "x"],
        "obj": ["y", "x", "y", "x", "y"],
        "conv_id": ["c1", "c1", "c1", "c1", "c2"],
        "turn_idx": pa.array([0, 0, 1, 1, 0], pa.int32()),
        "sent_idx": pa.array([0, 0, 0, 0, 0], pa.int32()),
    }))
    out = temporal_edges(triples, transcripts).take_all()
    assert len(out) == 1
    r = out[0]
    assert (r["norm_a"], r["norm_b"]) == ("x", "y")
    assert r["n_cooc"] == 3  # one per kept (subj<obj) evidence row
    assert r["active_span_s"] == 120.0
