"""Round-5 session-7 operators: per-component KG summary stats and
deterministic weighted label-propagation communities
(``ops/graph_analytics.component_stats`` / ``label_propagation``)."""

from __future__ import annotations

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


# two components: a 4-node near-clique (a,b,c,d: 5 of 6 possible edges)
# and a 2-node pair (e,f)
_TOY = [("a", "b", 2), ("a", "c", 1), ("b", "c", 3), ("c", "d", 1),
        ("b", "d", 4), ("e", "f", 5)]


def test_component_stats_two_components(ray_session):
    from easyner_ray.ops.graph_analytics import component_stats

    out = {r["component"]: r for r in
           component_stats(_edges_ds(_TOY)).take_all()}
    assert set(out) == {"a", "e"}
    big = out["a"]
    assert big["n_nodes"] == 4 and big["n_edges"] == 5
    assert big["total_weight"] == 2 + 1 + 3 + 1 + 4
    assert big["density"] == round(2 * 5 / (4 * 3), 4)
    pair = out["e"]
    assert pair["n_nodes"] == 2 and pair["n_edges"] == 1
    assert pair["total_weight"] == 5 and pair["density"] == 1.0


def test_component_stats_empty(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import component_stats

    empty = rd.from_arrow(pa.table(
        {"subj": pa.array([], pa.string()),
         "obj": pa.array([], pa.string()),
         "weight": pa.array([], pa.int64())}))
    out = component_stats(empty).take_all()
    assert out == []


def test_label_propagation_two_cliques(ray_session):
    """Two tight triangles joined by one weak bridge: LPA must give each
    triangle its lexicographically-smallest member as community label
    and must NOT merge them across the weight-1 bridge."""
    from easyner_ray.ops.graph_analytics import label_propagation

    und = [("a", "b", 5), ("a", "c", 5), ("b", "c", 5),
           ("x", "y", 5), ("x", "z", 5), ("y", "z", 5),
           ("c", "x", 1)]
    out = {r["norm"]: r["community"] for r in
           label_propagation(_edges_ds(und), iters=4).take_all()}
    assert out["a"] == out["b"] == out["c"] == "a"
    assert out["x"] == out["y"] == out["z"] == "x"


def test_label_propagation_tie_breaks_lexicographic(ray_session):
    """Equal-weight star: every leaf adopts the hub's label via the
    max-weight rule; the hub sees all leaf labels at equal weight and
    takes the lexicographically smallest."""
    from easyner_ray.ops.graph_analytics import label_propagation

    und = [("m", leaf, 2) for leaf in ("p", "q", "r")]
    out = {r["norm"]: r["community"] for r in
           label_propagation(_edges_ds(und), iters=1).take_all()}
    # one synchronous round: leaves see only m; m sees {p,q,r} all at 2
    assert out["p"] == out["q"] == out["r"] == "m"
    assert out["m"] == "p"


def test_label_propagation_matches_reference_loop(ray_session):
    """Distributed LPA equals a straight-line single-process recompute of
    the same spec on a random graph."""
    import numpy as np

    from easyner_ray.ops.graph_analytics import label_propagation

    rng = np.random.default_rng(11)
    nodes = [f"n{i:02d}" for i in range(24)]
    und = set()
    for _ in range(60):
        a, b = rng.choice(24, 2, replace=False)
        und.add((min(int(a), int(b)), max(int(a), int(b))))
    edges = [(nodes[a], nodes[b], int(rng.integers(1, 6)))
             for a, b in sorted(und)]

    # reference loop (synchronous, min-lex tie break)
    nbrs: dict[str, list[tuple[str, int]]] = {}
    for s, o, w in edges:
        nbrs.setdefault(s, []).append((o, w))
        nbrs.setdefault(o, []).append((s, w))
    lab = {v: v for v in nbrs}
    for _ in range(4):
        new = {}
        for v, ns in nbrs.items():
            acc: dict[str, int] = {}
            for o, w in ns:
                acc[lab[o]] = acc.get(lab[o], 0) + w
            mx = max(acc.values())
            new[v] = min(l for l, w in acc.items() if w == mx)
        lab = new

    out = {r["norm"]: r["community"] for r in
           label_propagation(_edges_ds(edges, blocks=3), iters=4).take_all()}
    assert out == lab


def test_meta_paths_small(ray_session):
    """Meta-path census over a hand-built typed edge table equals the
    brute-force pair enumeration (checked through the same join +
    aggregate ops the query composes)."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join, grouped_agg
    import pyarrow.compute as pc

    typed = pa.table({
        "subj": ["a", "b", "b", "c"],
        "pred": ["treats", "causes", "treats", "causes"],
        "obj": ["b", "c", "a", "a"],
        "weight": [2, 3, 1, 4]})
    ds = rd.from_arrow(typed)
    left = ds.map_batches(
        lambda t: t.rename_columns(["__a", "pred_a", "__mid", "__wa"]),
        batch_format="pyarrow")
    right = ds.map_batches(
        lambda t: t.rename_columns(["__mid", "pred_b", "__c", "__wb"]),
        batch_format="pyarrow")
    j = adaptive_join(left, right, on="__mid")

    def project(t):
        t = t.filter(pc.invert(pc.equal(t.column("__a"), t.column("__c"))))
        w = pc.multiply(pc.cast(t.column("__wa"), pa.int64()),
                        pc.cast(t.column("__wb"), pa.int64()))
        return pa.Table.from_arrays(
            [t.column("pred_a"), t.column("pred_b"), w],
            names=["pred_a", "pred_b", "__w"])

    out = {(r["pred_a"], r["pred_b"]): (r["n_paths"], r["path_weight"])
           for r in grouped_agg(
               j.map_batches(project, batch_format="pyarrow"),
               ["pred_a", "pred_b"],
               [("__w", "count", "n_paths"),
                ("__w", "sum", "path_weight")]).take_all()}

    # brute force
    rows = typed.to_pylist()
    expect: dict = {}
    for e1 in rows:
        for e2 in rows:
            if e1["obj"] == e2["subj"] and e1["subj"] != e2["obj"]:
                k = (e1["pred"], e2["pred"])
                n, w = expect.get(k, (0, 0))
                expect[k] = (n + 1, w + e1["weight"] * e2["weight"])
    assert out == expect


def test_node_attributes_invariants(ray_session):
    """Structural invariants of the enriched node table on the synthetic
    corpus: every node has >= 1 mention and conversation, degree-0 nodes
    label their own component, first_seen <= last_seen, and the node set
    equals the distinct mention surface forms."""
    from easyner_ray.pipelines.queries import _mentions, kg_node_attributes

    sf = "/root/testdata/sf0.001"
    rows = kg_node_attributes(sf).take_all()
    assert rows
    norms = {r["norm"] for r in rows}
    ment_norms = set(
        _mentions(sf).select_columns(["norm"]).unique("norm"))
    if ment_norms and isinstance(next(iter(ment_norms)), dict):
        ment_norms = {d["norm"] for d in ment_norms}
    assert norms == ment_norms
    for r in rows:
        assert r["n_mentions"] >= 1 and r["n_convs"] >= 1
        assert r["first_seen"] <= r["last_seen"]
        if r["degree"] == 0:
            assert r["component"] == r["norm"] and r["strength"] == 0
        else:
            assert r["strength"] >= r["degree"]


def test_betweenness_closed_forms(ray_session):
    from easyner_ray.ops.graph_analytics import betweenness

    # path a-b-c-d: ordered pairs through b = (a,c),(c,a),(a,d),(d,a)
    out = {r["norm"]: r["betweenness"] for r in betweenness(
        _edges_ds([("a", "b", 1), ("b", "c", 1), ("c", "d", 1)])).take_all()}
    assert out == {"a": 0.0, "b": 4.0, "c": 4.0, "d": 0.0}
    # star with 4 leaves: hub = 4*3 ordered leaf pairs
    out = {r["norm"]: r["betweenness"] for r in betweenness(
        _edges_ds([("m", x, 1) for x in "pqrs"])).take_all()}
    assert out["m"] == 12.0
    assert all(out[x] == 0.0 for x in "pqrs")


def test_betweenness_matches_textbook_brandes(ray_session):
    """Distributed level-vectorized kernel == textbook scalar Brandes on
    a random graph, including fractional path splits."""
    import collections

    import numpy as np

    from easyner_ray.ops.graph_analytics import betweenness

    rng = np.random.default_rng(5)
    names = [f"n{i:02d}" for i in range(30)]
    und = set()
    for _ in range(70):
        a, b = rng.choice(30, 2, replace=False)
        und.add((min(int(a), int(b)), max(int(a), int(b))))
    edges = [(names[a], names[b], 1) for a, b in sorted(und)]

    adj = collections.defaultdict(set)
    for s, o, _ in edges:
        adj[s].add(o)
        adj[o].add(s)
    nodes = sorted(adj)
    score = {v: 0.0 for v in nodes}
    for root in nodes:
        stack, preds = [], {v: [] for v in nodes}
        sigma = {v: 0.0 for v in nodes}
        dist = {v: -1 for v in nodes}
        sigma[root], dist[root] = 1.0, 0
        q = collections.deque([root])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in sorted(adj[v]):
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in nodes}
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != root:
                score[w] += delta[w]

    out = {r["norm"]: r["betweenness"] for r in
           betweenness(_edges_ds(edges, blocks=3), n_tasks=5).take_all()}
    assert set(out) == set(nodes)
    for v in nodes:
        assert abs(out[v] - score[v]) <= 1e-4 + 1e-9, (v, out[v], score[v])


def test_negative_samples_deterministic_and_clean(ray_session):
    from easyner_ray.ops.graph_analytics import negative_samples

    und = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("a", "d", 1),
           ("b", "e", 1)]
    edge_set = {tuple(sorted((s, o))) for s, o, _ in und}
    r1 = sorted((r["subj"], r["neg_obj"], r["slot"]) for r in
                negative_samples(_edges_ds(und), k=3).take_all())
    r2 = sorted((r["subj"], r["neg_obj"], r["slot"]) for r in
                negative_samples(_edges_ds(und, blocks=4), k=3).take_all())
    assert r1 == r2 and r1  # block-layout invariant, non-empty
    for s, o, slot in r1:
        assert s != o and tuple(sorted((s, o))) not in edge_set
        assert 1 <= slot <= 3


def test_dialog_acts_rules(ray_session):
    """Each tagging rule fires on a crafted turn; counts group per
    conversation."""
    import ray.data as rd

    from easyner_ray.ops.conversations import dialog_acts

    t = pa.table({
        "conv_id": ["c1"] * 6 + ["c2"] * 2,
        "text": ["What is this?",          # question
                 "  Is it done?\n",        # question (trailing ws)
                 "Run the tests now.",     # command (opener 'run')
                 "Please summarize it",    # command ('please')
                 "The sky is blue.",       # statement
                 "",                       # empty
                 None,                     # empty (null text)
                 "explain the diff"],      # command
    })
    out = {(r["conv_id"], r["act"]): r["n_turns"] for r in
           dialog_acts(rd.from_arrow(t).repartition(2)).take_all()}
    assert out == {("c1", "question"): 2, ("c1", "command"): 2,
                   ("c1", "statement"): 1, ("c1", "empty"): 1,
                   ("c2", "empty"): 1, ("c2", "command"): 1}


def test_dialog_acts_question_beats_command(ray_session):
    """A turn that both opens with a command verb and ends in '?' is a
    question — rule order is pinned."""
    import ray.data as rd

    from easyner_ray.ops.conversations import dialog_acts

    t = pa.table({"conv_id": ["c"], "text": ["run it, ok?"]})
    out = dialog_acts(rd.from_arrow(t)).take_all()
    assert out[0]["act"] == "question"


def test_eccentricity_closed_forms(ray_session):
    from easyner_ray.ops.graph_analytics import eccentricity

    # path a-b-c-d plus isolated pair e-f
    und = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("e", "f", 1)]
    out = {r["norm"]: (r["eccentricity"], r["n_reachable"]) for r in
           eccentricity(_edges_ds(und)).take_all()}
    assert out["a"] == (3, 3) and out["d"] == (3, 3)
    assert out["b"] == (2, 3) and out["c"] == (2, 3)
    assert out["e"] == (1, 1) and out["f"] == (1, 1)


def test_type_pairs_census(ray_session):
    """Class-pair census through the same join+aggregate chain the query
    composes, on a hand-built edge table + class map."""
    import ray.data as rd

    from easyner_ray.ops.relational import broadcast_join, grouped_agg
    import pyarrow.compute as pc

    cls = {"aspirin": "drug", "ibuprofen": "drug",
           "flu": "disease", "cough": "symptom"}
    und = [("aspirin", "flu", 3), ("aspirin", "ibuprofen", 2),
           ("cough", "flu", 5), ("flu", "ibuprofen", 1)]
    # build both orientations then reduce exactly as kg_type_pairs does
    edges = _edges_ds(und)
    cls_tbl = pa.table({"__n": list(cls), "__cls": list(cls.values())})
    undirected = edges.map_batches(
        lambda t: t.filter(pc.less(t.column("subj"), t.column("obj"))),
        batch_format="pyarrow")
    j = broadcast_join(undirected, cls_tbl.rename_columns(["__n", "__ca"]),
                       on="subj", right_key="__n", value_cols=["__ca"])
    j = broadcast_join(j, cls_tbl.rename_columns(["__n", "__cb"]),
                       on="obj", right_key="__n", value_cols=["__cb"])

    def pairkey(t):
        lo = pc.min_element_wise(t.column("__ca"), t.column("__cb"))
        hi = pc.max_element_wise(t.column("__ca"), t.column("__cb"))
        return pa.Table.from_arrays(
            [lo, hi, pc.cast(t.column("weight"), pa.int64())],
            names=["cls_a", "cls_b", "weight"])

    out = {(r["cls_a"], r["cls_b"]): (r["n_edges"], r["total_weight"])
           for r in grouped_agg(
               j.map_batches(pairkey, batch_format="pyarrow"),
               ["cls_a", "cls_b"],
               [("weight", "count", "n_edges"),
                ("weight", "sum", "total_weight")], final="tree").take_all()}
    assert out == {("disease", "drug"): (2, 4),
                   ("drug", "drug"): (1, 2),
                   ("disease", "symptom"): (1, 5)}


def test_conv_topics_argmax_and_ties(ray_session):
    """The dominant-entity assignment picks the max-count entity per
    conversation and breaks count ties lexicographically, mirroring the
    SQL window argmax."""
    import collections

    from easyner_ray.pipelines.queries import _mentions, conv_topics

    sf = "/root/testdata/sf0.001"
    counts: dict = collections.defaultdict(collections.Counter)
    for r in _mentions(sf).select_columns(["conv_id", "norm"]).take_all():
        counts[r["conv_id"]][r["norm"]] += 1
    expect = {}
    for conv, ctr in counts.items():
        mx = max(ctr.values())
        expect[conv] = (min(n for n, c in ctr.items() if c == mx), mx,
                        len(ctr))
    out = {r["conv_id"]: (r["top_entity"], r["n_mentions_top"],
                          r["n_distinct_entities"])
           for r in conv_topics(sf).take_all()}
    assert out == expect


def test_integrity_report_detects_violations(ray_session):
    """The gate reports zero on a healthy toy KG and counts each
    injected violation class (dangling subj/obj, self-loop, bad
    weight)."""
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import integrity_report

    nodes = rd.from_arrow(pa.table(
        {"node_id": ["n1", "n2", "n3"],
         "norm": ["a", "b", "c"]}))
    good = rd.from_arrow(pa.table(
        {"subj_id": ["n1", "n2"], "subj": ["a", "b"],
         "obj_id": ["n2", "n3"], "obj": ["b", "c"],
         "weight": [3, 1]}))
    r = integrity_report(nodes, good).take_all()[0]
    assert r == {"n_nodes": 3, "n_edges": 2, "n_dangling_subj": 0,
                 "n_dangling_obj": 0, "n_self_loops": 0,
                 "n_bad_weight": 0}

    bad = rd.from_arrow(pa.table(
        {"subj_id": ["n1", "nX", "n2", "n3"],
         "subj":    ["a",  "x",  "b",  "c"],
         "obj_id":  ["n2", "n2", "nY", "n3"],
         "obj":     ["b",  "b",  "y",  "c"],
         "weight":  [3,    1,    0,    2]}))
    r = integrity_report(nodes, bad).take_all()[0]
    assert r["n_edges"] == 4
    assert r["n_dangling_subj"] == 1 and r["n_dangling_obj"] == 1
    assert r["n_self_loops"] == 1      # (c, c)
    assert r["n_bad_weight"] == 1      # weight 0


def test_mention_yield_invariants(ray_session):
    """Per-role yield sums to the corpus mention count; rates are
    non-negative and rounded."""
    from easyner_ray.pipelines.queries import (_mentions, kg_mention_yield)

    sf = "/root/testdata/sf0.001"
    rows = kg_mention_yield(sf).take_all()
    assert {r["role"] for r in rows} >= {"user", "assistant"}
    assert sum(r["n_mentions"] for r in rows) == _mentions(sf).count()
    for r in rows:
        assert r["n_turns"] > 0 and r["n_chars"] >= 0
        assert r["mentions_per_kchar"] >= 0.0
        assert r["mentions_per_kchar"] == round(r["mentions_per_kchar"], 4)
