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


def test_clustering_coeff_toy(ray_session):
    from easyner_ray.ops.graph_analytics import clustering_coeff

    out = {r["norm"]: r for r in
           clustering_coeff(_edges_ds(_TOY)).take_all()}
    assert out["a"]["clustering"] == 1.0 and out["a"]["n_triangles"] == 1
    assert out["b"]["clustering"] == 1.0
    assert out["c"]["clustering"] == 0.3333  # 2*1/(3*2), half-away grain
    # degree-<2 and triangle-free nodes pin to 0.0 with n_triangles 0
    for n_ in ("d", "e", "f"):
        assert out[n_]["clustering"] == 0.0
        assert out[n_]["n_triangles"] == 0
    assert len(out) == 6


def test_round_away_halfway():
    from easyner_ray.ops.graph_analytics import _round_away

    # 1/32 = .03125 is binary-exact halfway at 4 digits: SQL rounds away
    # (.0313), Python's round half-even gives .0312 — the divergence this
    # kernel exists to absorb
    assert _round_away([1 / 32], 4)[0] == 0.0313
    assert _round_away([-1 / 32], 4)[0] == -0.0313
    assert round(1 / 32, 4) == 0.0312  # the trap, pinned


def test_neighbor_jaccard_toy(ray_session):
    from easyner_ray.ops.graph_analytics import neighbor_jaccard

    out = {(r["norm_a"], r["norm_b"]): r for r in
           neighbor_jaccard(_edges_ds(_TOY), min_shared=1).take_all()}
    # wedge middles: a->(b,c), b->(a,c), c->(a,b),(a,d),(b,d)
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c"),
                        ("a", "d"), ("b", "d")}
    assert out[("a", "b")]["n_shared"] == 1
    assert out[("a", "b")]["jaccard"] == 0.3333   # 1/(2+2-1)
    assert out[("a", "d")]["jaccard"] == 0.5      # 1/(2+1-1)
    assert out[("a", "c")]["jaccard"] == 0.25     # 1/(2+3-1)
    for a, b in out:
        assert a < b  # lexicographic pair contract


def test_neighbor_jaccard_random_vs_brute_and_chunked(ray_session):
    from easyner_ray.ops.graph_analytics import neighbor_jaccard

    nodes, und = _rand_graph(seed=3, n=25, m=80)
    adj: dict[int, set] = {i: set() for i in range(len(nodes))}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    gold = {}
    for a, b in itertools.combinations(range(len(nodes)), 2):
        sh = len(adj[a] & adj[b])
        if sh >= 2:
            na, nb = sorted((nodes[a], nodes[b]))
            un = len(adj[a]) + len(adj[b]) - sh
            gold[(na, nb)] = sh

    ds = _edges_ds([(nodes[a], nodes[b], 1) for a, b in und], blocks=3)
    for pb in (1 << 22, 3):  # default + forced hub-chunk/compress path
        got = {(r["norm_a"], r["norm_b"]): r["n_shared"] for r in
               neighbor_jaccard(ds, min_shared=2, pair_budget=pb).take_all()}
        assert got == gold, f"pair_budget={pb}"


def test_neighbor_jaccard_middle_cap(ray_session):
    from easyner_ray.ops.graph_analytics import neighbor_jaccard

    # star: hub h adjacent to x0..x4 plus one side edge x0-x1.
    star = [("h", f"x{i}", 1) for i in range(5)] + [("x0", "x1", 1)]
    full = {(r["norm_a"], r["norm_b"]): r["n_shared"] for r in
            neighbor_jaccard(_edges_ds(star), min_shared=1).take_all()}
    assert full[("x0", "x1")] == 1  # shared neighbor: h
    # capping out the degree-5 hub middle removes every pair it mediated
    capped = {(r["norm_a"], r["norm_b"]): r["n_shared"] for r in
              neighbor_jaccard(_edges_ds(star), min_shared=1,
                               max_middle_degree=4).take_all()}
    assert ("x0", "x1") not in capped
    assert capped == {("h", "x1"): 1, ("h", "x0"): 1}  # middles x0/x1 remain


def test_bfs_hops_toy(ray_session):
    from easyner_ray.ops.graph_analytics import bfs_hops

    ds = _edges_ds(_TOY)
    out = {r["norm"]: r["hop"] for r in
           bfs_hops(ds, ["a"], max_hops=3).take_all()}
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2}  # e/f unreachable
    # hop bound truncates the frontier
    out1 = {r["norm"]: r["hop"] for r in
            bfs_hops(ds, ["a"], max_hops=1).take_all()}
    assert out1 == {"a": 0, "b": 1, "c": 1}
    # multi-seed min + absent seed dropped
    out2 = {r["norm"]: r["hop"] for r in
            bfs_hops(ds, ["d", "e", "nope"], max_hops=2).take_all()}
    assert out2 == {"d": 0, "e": 0, "c": 1, "f": 1, "a": 2, "b": 2}
    assert bfs_hops(ds, [], max_hops=2).take_all() == []
    assert bfs_hops(ds, ["nope"], max_hops=2).take_all() == []


def test_edge_activity(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import edge_activity

    h = 3_600_000_000  # one hour in us
    transcripts = rd.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "ts": pa.array([10, h + 20, 30], pa.timestamp("us")),
    }))
    triples = rd.from_arrow(pa.table({
        "subj": ["x", "y", "x", "x"],
        "obj": ["y", "x", "y", "y"],
        "conv_id": ["c1", "c1", "c1", "c2"],
        "turn_idx": pa.array([0, 0, 1, 0], pa.int32()),
        "sent_idx": pa.array([0, 0, 0, 0], pa.int32()),
    }))
    out = {r["bucket_ts"]: r for r in
           edge_activity(triples, transcripts, unit="hour").take_all()}
    assert len(out) == 2  # hour 0 (c1/t0 + c2/t0) and hour 1 (c1/t1)
    import datetime as dt

    h0 = dt.datetime(1970, 1, 1, 0)
    h1 = dt.datetime(1970, 1, 1, 1)
    assert out[h0]["n_cooc"] == 2 and out[h0]["n_convs"] == 2
    assert out[h1]["n_cooc"] == 1 and out[h1]["n_convs"] == 1
    for r in out.values():
        assert (r["norm_a"], r["norm_b"]) == ("x", "y")


def test_kcore_peel_cascade(ray_session):
    from easyner_ray.ops.graph_analytics import kcore

    # triangle abc + tail c-d-e: k=2 peels e (deg 1), which exposes d
    chain = [("a", "b", 1), ("b", "c", 1), ("a", "c", 1),
             ("c", "d", 1), ("d", "e", 1)]
    out = {r["norm"]: r["core_degree"] for r in
           kcore(_edges_ds(chain), k=2).take_all()}
    assert out == {"a": 2, "b": 2, "c": 2}
    # k above the max degree empties the core
    assert kcore(_edges_ds(chain), k=4).take_all() == []
    # k=1 keeps everything (all degrees >= 1) at original degrees
    out1 = {r["norm"]: r["core_degree"] for r in
            kcore(_edges_ds(chain), k=1).take_all()}
    assert out1 == {"a": 2, "b": 2, "c": 3, "d": 2, "e": 1}


def test_kcore_random_vs_brute(ray_session):
    from easyner_ray.ops.graph_analytics import kcore

    nodes, und = _rand_graph(seed=5, n=30, m=60)
    adj = {i: set() for i in range(len(nodes))}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    adj = {v: nb for v, nb in adj.items() if nb}
    k = 3
    while True:
        drop = [v for v, nb in adj.items() if len(nb) < k]
        if not drop:
            break
        for v in drop:
            for nb in adj[v]:
                adj[nb].discard(v)
            del adj[v]
    gold = {nodes[v]: len(nb) for v, nb in adj.items()}

    ds = _edges_ds([(nodes[a], nodes[b], 1) for a, b in und], blocks=3)
    got = {r["norm"]: r["core_degree"] for r in kcore(ds, k=k).take_all()}
    assert got == gold
    assert 0 < len(gold) < len({n for e in und for n in e})  # real peel


def test_edge_evidence(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import edge_evidence

    # (x,y) co-occur in 4 sentences across 2 convs; both orientations in
    # the stream; k=2 keeps the first two in (conv, turn, sent) order
    triples = rd.from_arrow(pa.table({
        "subj": ["x", "y", "x", "x", "x"],
        "obj": ["y", "x", "y", "y", "y"],
        "conv_id": ["c2", "c2", "c1", "c1", "c1"],
        "turn_idx": pa.array([0, 0, 5, 1, 1], pa.int32()),
        "sent_idx": pa.array([0, 0, 0, 1, 0], pa.int32()),
    })).repartition(2)
    out = sorted(edge_evidence(triples, k=2).take_all(),
                 key=lambda r: r["evidence_rank"])
    assert len(out) == 2
    assert [(r["conv_id"], r["turn_idx"], r["sent_idx"],
             r["evidence_rank"]) for r in out] == \
        [("c1", 1, 0, 1), ("c1", 1, 1, 2)]
    for r in out:
        assert (r["norm_a"], r["norm_b"]) == ("x", "y")


def test_canonical_map_and_rewrite(ray_session):
    from easyner_ray.ops.graph_analytics import canonical_map, rewrite_edges

    # x1/x2 share the full neighborhood {m1,m2,m3} -> jaccard 1.0 alias
    # pair; the middles share only 2 neighbors (< min_shared=3) so they
    # do NOT merge
    und = [("x1", m, 1) for m in ("m1", "m2", "m3")] + \
          [("x2", m, 1) for m in ("m1", "m2", "m3")]
    ds = _edges_ds(und)
    cmap = {r["norm"]: r["canonical"] for r in
            canonical_map(ds, jaccard_threshold=0.5,
                          min_shared=3).take_all()}
    assert cmap == {"x1": "x1", "x2": "x1"}

    out = {(r["subj"], r["obj"]): r["weight"] for r in
           rewrite_edges(ds, canonical_map(ds, jaccard_threshold=0.5,
                                           min_shared=3)).take_all()}
    # x2's edges fold into x1: weight 2 per (x1, m) direction, no
    # self-loops, middles keep their names
    assert out == {("x1", m): 2 for m in ("m1", "m2", "m3")} | \
           {(m, "x1"): 2 for m in ("m1", "m2", "m3")}


def test_rewrite_edges_collapse_drops_self_loops(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import rewrite_edges

    ds = _edges_ds([("a", "b", 2), ("a", "c", 1), ("b", "c", 3)])
    mapping = rd.from_arrow(pa.table(
        {"norm": ["b"], "canonical": ["a"]}))
    out = {(r["subj"], r["obj"]): r["weight"] for r in
           rewrite_edges(ds, mapping).take_all()}
    # a<->b collapses to a self-loop and drops; b's c-edges fold into a
    assert out == {("a", "c"): 4, ("c", "a"): 4}
    # empty map = identity modulo grouping
    ident = {(r["subj"], r["obj"]): r["weight"] for r in
             rewrite_edges(ds, rd.from_arrow(pa.table(
                 {"norm": pa.array([], pa.string()),
                  "canonical": pa.array([], pa.string())}))).take_all()}
    assert ident[("a", "b")] == 2 and ident[("b", "c")] == 3
    assert len(ident) == 6


def test_hub_skew_wedge_kernels(ray_session):
    """Hub-skew stress: an 800-leaf star + ring forces the pair-budget
    chunker through ~80 chunks on the hub; closed-form counts pin
    correctness of triangles and shared-neighbor counts under chunking
    (SURVEY §4's skew promise for the wedge kernels)."""
    from easyner_ray.ops.graph_analytics import (neighbor_jaccard,
                                                 triangle_counts)

    n = 800
    leaves = [f"x{i:04d}" for i in range(n)]
    und = [("hub", lf, 1) for lf in leaves]
    und += [(leaves[i], leaves[(i + 1) % n], 1) for i in range(n)]
    ds = _edges_ds(und, blocks=4)

    tri = {r["norm"]: r["n_triangles"] for r in
           triangle_counts(ds, pair_budget=4096).take_all()}
    assert tri["hub"] == n
    assert all(tri[lf] == 2 for lf in leaves)

    nj = {(r["norm_a"], r["norm_b"]): r["n_shared"] for r in
          neighbor_jaccard(ds, min_shared=2, pair_budget=4096).take_all()}
    # shared>=2 pairs: (hub, leaf) share the leaf's two ring neighbors;
    # distance-2 ring pairs share {hub, midpoint}
    assert len(nj) == 2 * n
    assert all(v == 2 for v in nj.values())
    assert nj[tuple(sorted(("hub", leaves[0])))] == 2
    assert nj[(leaves[0], leaves[2])] == 2


def test_entity_trends(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import entity_trends

    h = 3_600_000_000  # hour in us
    # conv c1: turns at hours 0,0,1,2 — entity "a" mentioned 3x in h0,
    # 1x in h1, 1x in h2 -> mean 5/3, sd samp ~1.1547 -> z(h0)=+1.1547
    transcripts = rd.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c1", "c1"],
        "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
        "ts": pa.array([0, 10, h + 5, 2 * h + 5], pa.timestamp("us")),
    }))
    rows = {"norm": [], "conv_id": [], "turn_idx": []}
    for turn, cnt in ((0, 2), (1, 1), (2, 1), (3, 1)):
        for _ in range(cnt):
            rows["norm"].append("a")
            rows["conv_id"].append("c1")
            rows["turn_idx"].append(turn)
    rows["norm"].append("b")  # single-bucket entity -> z 0, no spike
    rows["conv_id"].append("c1")
    rows["turn_idx"].append(0)
    mentions = rd.from_arrow(pa.table({
        "norm": pa.array(rows["norm"], pa.string()),
        "conv_id": pa.array(rows["conv_id"], pa.string()),
        "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
    }))
    out = {(r["norm"], r["bucket_ts"].hour): r for r in
           entity_trends(mentions, transcripts).take_all()}
    a0 = out[("a", 0)]
    assert a0["n"] == 3
    assert abs(a0["z"] - 1.1547) < 1e-9 and not a0["spike"]
    assert out[("a", 1)]["n"] == 1 and out[("a", 2)]["n"] == 1
    b0 = out[("b", 0)]
    assert b0["n"] == 1 and b0["z"] == 0.0 and not b0["spike"]
    assert len(out) == 4


def test_edges_diff(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import edges_diff

    old = rd.from_arrow(pa.table({
        "subj": ["a", "a", "b"], "obj": ["b", "c", "a"],
        "weight": pa.array([2, 1, 2], pa.int64())}))
    new = rd.from_arrow(pa.table({
        "subj": ["a", "a", "x"], "obj": ["b", "c", "y"],
        "weight": pa.array([5, 1, 7], pa.int64())}))
    out = {(r["subj"], r["obj"]): r for r in
           edges_diff(old, new).take_all()}
    assert set(out) == {("a", "b"), ("b", "a"), ("x", "y")}
    assert out[("a", "b")]["status"] == "changed"
    assert (out[("a", "b")]["weight_old"],
            out[("a", "b")]["weight_new"]) == (2, 5)
    assert out[("b", "a")]["status"] == "removed"
    assert out[("b", "a")]["weight_new"] == 0
    assert out[("x", "y")]["status"] == "added"
    assert out[("x", "y")]["weight_old"] == 0
    # identical snapshots -> empty diff
    assert edges_diff(old, old).take_all() == []


def test_link_predict_toy(ray_session):
    from easyner_ray.ops.graph_analytics import link_predict

    # square a-b-c-d-a: diagonals (a,c) and (b,d) are the two missing
    # edges, each with 2 common neighbors of degree 2 -> AA = 2/ln(2).
    square = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "a", 1)]
    out = {(r["norm_a"], r["norm_b"]): r for r in
           link_predict(_edges_ds(square), min_common=2).take_all()}
    assert set(out) == {("a", "c"), ("b", "d")}
    aa = round(2.0 / np.log(2), 4)
    for pair in out.values():
        assert pair["n_common"] == 2
        assert abs(pair["adamic_adar"] - aa) < 1e-9
        assert pair["pref_attach"] == 4
    # direct edges never appear even when they'd meet the bar:
    # triangle + shared neighbor -> (a,b) adjacent AND sharing c.
    tri = [("a", "b", 1), ("a", "c", 1), ("b", "c", 1),
           ("a", "d", 1), ("b", "d", 1)]
    got = {(r["norm_a"], r["norm_b"]) for r in
           link_predict(_edges_ds(tri), min_common=1).take_all()}
    assert ("a", "b") not in got
    assert ("c", "d") in got  # non-adjacent, shares a and b


def test_link_predict_random_vs_brute_and_chunked(ray_session):
    from easyner_ray.ops.graph_analytics import link_predict

    nodes, und = _rand_graph(seed=11, n=25, m=80)
    adj: dict[int, set] = {i: set() for i in range(len(nodes))}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    gold = {}
    for a, b in itertools.combinations(range(len(nodes)), 2):
        if b in adj[a]:
            continue
        common = adj[a] & adj[b]
        if len(common) >= 2:
            na, nb = sorted((nodes[a], nodes[b]))
            aa = sum(1.0 / np.log(len(adj[z])) for z in common)
            gold[(na, nb)] = (len(common), round(aa, 4),
                              len(adj[a]) * len(adj[b]))

    ds = _edges_ds([(nodes[a], nodes[b], 1) for a, b in und], blocks=3)
    for pb in (1 << 22, 3):  # default + forced hub-chunk/compress path
        got = {(r["norm_a"], r["norm_b"]):
               (r["n_common"], r["adamic_adar"], r["pref_attach"])
               for r in link_predict(ds, min_common=2,
                                     pair_budget=pb).take_all()}
        assert set(got) == set(gold), f"pair_budget={pb}"
        for k, (nc, aa, pref) in gold.items():
            gnc, gaa, gpref = got[k]
            assert gnc == nc and gpref == pref
            assert abs(gaa - aa) <= 1e-4, (k, gaa, aa)


def test_eigencentrality_star_and_paths(ray_session):
    """Star graph: closed-form principal eigenvector — hub gets
    1/sqrt(2), each of the k leaves 1/sqrt(2k). All three execution
    paths bit-equal; weighted run shifts mass toward the heavy edge."""
    import ray.data as rd

    from easyner_ray.ops.graph import eigencentrality

    k = 4
    und = [("hub", f"l{i}", 1) for i in range(k)]
    ds = _edges_ds(und)
    got = {r["node"]: r["score"]
           for r in eigencentrality(ds, src_col="subj", dst_col="obj",
                                    iters=30).take_all()}
    assert abs(got["hub"] - 1 / np.sqrt(2)) < 1e-6
    for i in range(k):
        assert abs(got[f"l{i}"] - 1 / np.sqrt(2 * k)) < 1e-6

    for kw in ({"edge_driver_cutoff": 0},            # indexed-broadcast
               {"edge_driver_cutoff": 0, "node_gate": 0}):  # join path
        alt = {r["node"]: r["score"]
               for r in eigencentrality(ds, src_col="subj", dst_col="obj",
                                        iters=30, **kw).take_all()}
        assert alt == got, kw

    # weight support: a dominant edge pulls the eigenvector onto its
    # endpoints (path graph a-b-c with w(ab) >> w(bc))
    wds = _edges_ds([("a", "b", 100), ("b", "c", 1)])
    w = {r["node"]: r["score"]
         for r in eigencentrality(wds, src_col="subj", dst_col="obj",
                                  weight_col="weight", iters=40).take_all()}
    assert w["a"] > w["c"]
    assert abs(w["a"]**2 + w["b"]**2 + w["c"]**2 - 1.0) < 1e-6
    # unweighted on the same shape is symmetric in a/c
    u = {r["node"]: r["score"]
         for r in eigencentrality(wds, src_col="subj", dst_col="obj",
                                  iters=40).take_all()}
    assert abs(u["a"] - u["c"]) < 1e-9

    # empty input -> typed empty result
    empty = rd.from_arrow(pa.table(
        {"subj": pa.array([], pa.string()),
         "obj": pa.array([], pa.string()),
         "weight": pa.array([], pa.int64())}))
    assert eigencentrality(empty, src_col="subj",
                           dst_col="obj").take_all() == []


def test_personalized_pagerank_paths_and_semantics(ray_session):
    """Seeded teleport concentrates mass around the seed; nodes
    unreachable from the seed get exactly 0; all three execution paths
    bit-equal; uniform runs are untouched by the feature flag."""
    import ray.data as rd

    import pytest

    from easyner_ray.ops.graph import pagerank

    # two components: a->b->c cycle-ish + isolated pair x->y
    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "x"],
        "dst": ["b", "c", "a", "y"],
    })).repartition(2)
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, iters=15, seeds=["a"]).take_all()}
    # teleport only to a; x/y are unreachable from a -> exactly zero
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["a"] > got["b"] > 0 and got["c"] > 0
    assert abs(sum(got.values()) - 1.0) < 1e-6

    for kw in ({"edge_driver_cutoff": 0},
               {"edge_driver_cutoff": 0, "node_gate": 0}):
        alt = {r["node"]: r["rank"]
               for r in pagerank(edges, iters=15, seeds=["a"],
                                 **kw).take_all()}
        assert alt == got, kw

    # multi-seed: teleport splits across seeds; missing seeds ignored
    multi = {r["node"]: r["rank"]
             for r in pagerank(edges, iters=15,
                               seeds=["a", "x", "ghost"]).take_all()}
    assert multi["y"] > 0  # reachable from seed x now
    # no seed present in the graph -> hard error on every path
    for kw in ({}, {"edge_driver_cutoff": 0},
               {"edge_driver_cutoff": 0, "node_gate": 0}):
        with pytest.raises(ValueError, match="no seed"):
            pagerank(edges, seeds=["ghost"], **kw)


def test_decayed_edges_closed_form(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import decayed_edges

    # pair (a,b) seen at t_ref and one half-life earlier -> 1 + 0.5;
    # pair (a,c) seen only at the old timestamp -> 0.5
    hl = 3600.0
    t0 = np.datetime64("2026-01-01T00:00:00", "us")
    t1 = np.datetime64("2026-01-01T01:00:00", "us")  # t0 + hl
    transcripts = rd.from_arrow(pa.table({
        "conv_id": ["c1", "c1"],
        "turn_idx": pa.array([0, 1], pa.int64()),
        "ts": pa.array([t0, t1], pa.timestamp("us")),
    }))
    triples = rd.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c1", "c1"],
        "turn_idx": pa.array([0, 0, 1, 0], pa.int64()),
        # both orientations present, as sentence_triples emits them
        "subj": ["a", "b", "a", "a"],
        "obj": ["b", "a", "b", "c"],
    }))
    out = {(r["norm_a"], r["norm_b"]): r for r in
           decayed_edges(triples, transcripts,
                         half_life_s=hl).take_all()}
    assert out[("a", "b")]["n_cooc"] == 2
    assert out[("a", "b")]["decayed_weight"] == 1.5
    assert out[("a", "c")]["decayed_weight"] == 0.5
    # explicit t_ref moves the anchor: one more half-life of age halves
    # everything
    out2 = {(r["norm_a"], r["norm_b"]): r["decayed_weight"] for r in
            decayed_edges(triples, transcripts, half_life_s=hl,
                          t_ref=t1 + np.timedelta64(3600, "s")
                          ).take_all()}
    assert out2[("a", "b")] == 0.75 and out2[("a", "c")] == 0.25


def test_weighted_hops_prefers_strong_paths(ray_session):
    from easyner_ray.ops.graph_analytics import weighted_hops

    # s-a direct weak edge (w=1, cost 1.0) vs s-b-a strong two-hop
    # (w=4 each, cost 0.25+0.25) -> a's best distance is the 2-hop path.
    g = [("s", "a", 1), ("s", "b", 4), ("b", "a", 4), ("x", "y", 2)]
    out = {r["norm"]: r["dist"] for r in
           weighted_hops(_edges_ds(g), ["s"], max_hops=3).take_all()}
    assert out["s"] == 0.0
    assert out["b"] == 0.25
    assert out["a"] == 0.5          # NOT the direct 1.0
    assert "x" not in out and "y" not in out  # unreachable component
    # hop bound binds: with max_hops=1 only direct edges count
    out1 = {r["norm"]: r["dist"] for r in
            weighted_hops(_edges_ds(g), ["s"], max_hops=1).take_all()}
    assert out1["a"] == 1.0 and out1["b"] == 0.25
    # missing seeds -> empty; multi-seed takes the per-node min
    assert weighted_hops(_edges_ds(g), ["ghost"]).take_all() == []
    multi = {r["norm"]: r["dist"] for r in
             weighted_hops(_edges_ds(g), ["s", "y"], max_hops=2).take_all()}
    assert multi["x"] == 0.5 and multi["y"] == 0.0
