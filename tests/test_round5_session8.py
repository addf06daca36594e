"""Round-5 session-8 operators: cross-document duplicate n-gram share
(``ops/textstats.cross_doc_dup_ngrams``)."""

from __future__ import annotations

import pyarrow as pa


def _docs_ds(texts, blocks: int = 2):
    import ray.data as rd

    tbl = pa.table({"doc_id": [f"d{i}" for i in range(len(texts))],
                    "text": texts})
    return rd.from_arrow(tbl).repartition(blocks)


# n=2 shingles: d0 {"a b","b c"}, d1 {"a b","b d"}, d2 {"x y"},
# d3 repeats "a b a b" -> distinct {"a b","b a"}; same-doc repeats must
# NOT make a shingle "duplicated" on their own.
_TEXTS = ["a b c", "a b d", "x y", "a b a b", ""]


def _expect():
    # df: "a b" -> d0,d1,d3 (3); others 1
    return {
        "d0": (2, 1, 0.5),
        "d1": (2, 1, 0.5),
        "d2": (1, 0, 0.0),
        "d3": (2, 1, 0.5),
        # d4 empty text -> no shingles -> no output row
    }


def _run(ds, **kw):
    from easyner_ray.ops.textstats import cross_doc_dup_ngrams

    out = cross_doc_dup_ngrams(ds, n=2, **kw).take_all()
    return {r["doc_id"]: (r["n_shingles"], r["n_dup_shingles"],
                          r["dup_frac"]) for r in out}


def test_cross_doc_dup_broadcast_path(ray_session):
    assert _run(_docs_ds(_TEXTS)) == _expect()


def test_cross_doc_dup_open_path_matches(ray_session):
    """Forcing the semi-join (open dup-set) path must be value-identical
    to the broadcast path."""
    assert _run(_docs_ds(_TEXTS), broadcast_max_bytes=0) == _expect()


def test_cross_doc_dup_same_doc_repeat_not_dup(ray_session):
    """A shingle repeated only within one document is NOT cross-doc dup."""
    out = _run(_docs_ds(["p q p q p q", "z z z"], blocks=1))
    assert out["d0"] == (2, 0, 0.0)   # {"p q","q p"} unique to d0
    assert out["d1"] == (1, 0, 0.0)   # {"z z"} unique to d1


def test_cross_doc_dup_empty_corpus(ray_session):
    out = _run(_docs_ds(["", "   "], blocks=1))
    assert out == {}


def _pair_edges(und, blocks: int = 2):
    """Undirected pairs -> both-orientation distinct (subj, obj, weight)."""
    import ray.data as rd

    rows = {"subj": [], "obj": [], "weight": []}
    for s, o in und:
        for x, y in ((s, o), (o, s)):
            rows["subj"].append(x)
            rows["obj"].append(y)
            rows["weight"].append(1)
    return rd.from_arrow(pa.table(rows)).repartition(blocks)


def test_assortativity_star_is_minus_one(ray_session):
    """A star graph is maximally disassortative: r = -1."""
    from easyner_ray.ops.graph_analytics import assortativity

    out = assortativity(_pair_edges([("c", "l1"), ("c", "l2"),
                                     ("c", "l3")])).take_all()
    assert len(out) == 1
    assert out[0]["n_edges"] == 6
    assert out[0]["assortativity"] == -1.0


def test_assortativity_regular_graph_is_null(ray_session):
    """A triangle (every node degree 2) has zero degree variance ->
    NULL, mirroring SQL division by zero."""
    from easyner_ray.ops.graph_analytics import assortativity

    out = assortativity(_pair_edges([("a", "b"), ("b", "c"),
                                     ("a", "c")])).take_all()
    assert out[0]["n_edges"] == 6
    assert out[0]["assortativity"] is None


def test_assortativity_empty(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import assortativity

    empty = rd.from_arrow(pa.table(
        {"subj": pa.array([], pa.string()),
         "obj": pa.array([], pa.string()),
         "weight": pa.array([], pa.int64())}))
    out = assortativity(empty).take_all()
    assert out[0]["n_edges"] == 0 and out[0]["assortativity"] is None


def test_mad_outliers_basic(ray_session):
    """Known toy: group g values [1..9, 100]. med=5.5, dev=[4.5,...,94.5],
    mad=median(|x-5.5|)=2.5+... computed by hand below; only 100 exceeds
    3*mad."""
    import numpy as np
    import ray.data as rd

    from easyner_ray.ops.sketch import mad_outliers

    vals = [1., 2., 3., 4., 5., 6., 7., 8., 9., 100.]
    med = float(np.percentile(vals, 50, method="linear"))  # 5.5
    devs = sorted(abs(v - med) for v in vals)
    mad = float(np.percentile(devs, 50, method="linear"))
    expected_out = sum(1 for v in vals if abs(v - med) > 3.0 * mad)

    ds = rd.from_arrow(pa.table(
        {"g": ["g"] * 10, "v": vals})).repartition(3)
    out = mad_outliers(ds, "v", "g").take_all()
    assert len(out) == 1
    r = out[0]
    assert r["g"] == "g" and r["n_values"] == 10
    assert r["med"] == med and r["mad"] == mad
    assert r["n_outliers"] == expected_out == 1


def test_mad_outliers_null_values_excluded(ray_session):
    import ray.data as rd

    from easyner_ray.ops.sketch import mad_outliers

    ds = rd.from_arrow(pa.table(
        {"g": ["a", "a", "a", "b"],
         "v": pa.array([1.0, None, 3.0, 7.0], pa.float64())}))
    out = {r["g"]: r for r in mad_outliers(ds, "v", "g").take_all()}
    assert out["a"]["n_values"] == 2 and out["a"]["med"] == 2.0
    assert out["a"]["mad"] == 1.0 and out["a"]["n_outliers"] == 0
    assert out["b"]["n_values"] == 1 and out["b"]["mad"] == 0.0


def test_parrot_score_toy(ray_session):
    """Reply bigrams vs its own prompt only: c1 echoes 'the cache' from
    its prompt; c2's reply shares nothing with its prompt even though c1
    used the same words (overlap is strictly within-pair)."""
    import ray.data as rd

    from easyner_ray.ops.conversations import parrot_score

    rows = [
        ("c1", 0, "user", "clear the cache now"),
        ("c1", 1, "assistant", "ok the cache is clear"),
        ("c2", 0, "user", "what time is it"),
        ("c2", 1, "assistant", "clear the cache now"),
        ("c3", 0, "user", "hello"),
        ("c3", 1, "assistant", "hi"),           # 1 token -> 0 bigrams
    ]
    tr = rd.from_arrow(pa.table(
        {"conv_id": [r[0] for r in rows],
         "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
         "role": [r[2] for r in rows],
         "text": [r[3] for r in rows]})).repartition(2)
    out = {r["conv_id"]: r for r in parrot_score(tr, n=2).take_all()}
    # c1 reply bigrams: {ok the, the cache, cache is, is clear} (4);
    # prompt bigrams {clear the, the cache, cache now}: echoed = 1
    assert out["c1"]["n_resp_ngrams"] == 4
    assert out["c1"]["n_echoed"] == 1 and out["c1"]["echo_frac"] == 0.25
    # c2 reply shares no bigram with ITS prompt
    assert out["c2"]["n_echoed"] == 0 and out["c2"]["echo_frac"] == 0.0
    # c3 reply has zero bigrams -> no row
    assert "c3" not in out


def _directed_edges(trips, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(pa.table(
        {"src": [t[0] for t in trips],
         "dst": [t[1] for t in trips],
         "weight": pa.array([t[2] for t in trips], pa.int64())})) \
        .repartition(blocks)


def test_hits_bipartite_hubs_authorities(ray_session):
    """Two pure hubs pointing at two pure authorities: closed form is
    hub = 1/sqrt(2) for the pointers, authority = 1/sqrt(2) for the
    pointed-at, and exactly 0 on the off-role sides."""
    from easyner_ray.ops.graph import hits

    ds = _directed_edges([("h1", "a1", 1), ("h1", "a2", 1),
                          ("h2", "a1", 1), ("h2", "a2", 1)])
    got = {r["node"]: r for r in
           hits(ds, weight_col="weight", iters=30).take_all()}
    import numpy as np

    for h in ("h1", "h2"):
        assert abs(got[h]["hub"] - 1 / np.sqrt(2)) < 1e-6
        assert got[h]["authority"] == 0.0
    for a in ("a1", "a2"):
        assert abs(got[a]["authority"] - 1 / np.sqrt(2)) < 1e-6
        assert got[a]["hub"] == 0.0


def test_hits_three_paths_bit_equal(ray_session):
    from easyner_ray.ops.graph import hits

    ds = _directed_edges([("h1", "a1", 2), ("h1", "a2", 1),
                          ("h2", "a1", 1), ("x", "h1", 3),
                          ("a1", "x", 1)])
    base = sorted(hits(ds, weight_col="weight", iters=20).take_all(),
                  key=lambda r: r["node"])
    for kw in ({"edge_driver_cutoff": 0},            # indexed-broadcast
               {"edge_driver_cutoff": 0, "node_gate": 0}):  # join path
        alt = sorted(hits(ds, weight_col="weight", iters=20,
                          **kw).take_all(), key=lambda r: r["node"])
        assert alt == base, kw


def test_hits_empty(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph import hits

    empty = rd.from_arrow(pa.table(
        {"src": pa.array([], pa.string()),
         "dst": pa.array([], pa.string()),
         "weight": pa.array([], pa.int64())}))
    assert hits(empty, weight_col="weight").take_all() == []


def test_transition_edges_toy(ray_session):
    """conv c1 turns: 0 {a,b} -> 1 {b,c}; conv c2 turns: 0 {a} -> 2 {c}
    (gap: NOT adjacent). Expect a->b, a->c, b->c from c1 only; b->b
    self-transition excluded."""
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import transition_edges

    rows = [("c1", 0, "a"), ("c1", 0, "b"), ("c1", 1, "b"), ("c1", 1, "c"),
            ("c2", 0, "a"), ("c2", 2, "c"),
            ("c1", 0, "a")]  # duplicate mention: must not double-count
    ments = rd.from_arrow(pa.table(
        {"conv_id": [r[0] for r in rows],
         "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
         "norm": [r[2] for r in rows]})).repartition(2)
    out = {(r["src"], r["dst"]): r["weight"]
           for r in transition_edges(ments).take_all()}
    assert out == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


def test_media_dedup_duplicates(ray_session):
    """Identical payloads collapse to min item_id with the copy count;
    distinct payloads of equal length stay separate (content, not size)."""
    import ray.data as rd

    from easyner_ray.ops.multimodal import media_dedup

    blob_a, blob_b = b"\x00\x01\x02\x03", b"\x00\x01\x02\x04"
    t = pa.table({"item_id": pa.array([5, 2, 9, 7], pa.int64()),
                  "payload": pa.array([blob_a, blob_a, blob_b, blob_a],
                                      pa.binary())})
    out = {r["item_id"]: r for r in
           media_dedup(rd.from_arrow(t).repartition(2)).take_all()}
    assert set(out) == {2, 9}
    assert out[2]["n_copies"] == 3 and out[2]["payload_bytes"] == 4
    assert out[9]["n_copies"] == 1 and out[9]["payload_bytes"] == 4


def test_modularity_two_cliques(ray_session):
    """Two disjoint triangles with the perfect partition: W=12, W_in=12,
    each community strength 6 -> Q = 1 - 2*(6/12)^2 = 0.5."""
    from easyner_ray.ops.graph_analytics import modularity

    edges = _pair_edges([("a", "b"), ("b", "c"), ("a", "c"),
                         ("x", "y"), ("y", "z"), ("x", "z")])
    import ray.data as rd

    comm = rd.from_arrow(pa.table(
        {"norm": ["a", "b", "c", "x", "y", "z"],
         "community": ["a", "a", "a", "x", "x", "x"]}))
    out = modularity(edges, comm).take_all()
    assert out[0]["n_communities"] == 2
    assert out[0]["modularity"] == 0.5


def test_modularity_single_community_is_zero(ray_session):
    """Everything in one community: W_in = W and sum S_c^2 = W^2 -> 0."""
    from easyner_ray.ops.graph_analytics import modularity

    edges = _pair_edges([("a", "b"), ("b", "c")])
    import ray.data as rd

    comm = rd.from_arrow(pa.table(
        {"norm": ["a", "b", "c"], "community": ["a", "a", "a"]}))
    out = modularity(edges, comm).take_all()
    assert out[0]["n_communities"] == 1
    assert out[0]["modularity"] == 0.0


def test_modularity_empty(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import modularity

    empty_e = rd.from_arrow(pa.table(
        {"subj": pa.array([], pa.string()),
         "obj": pa.array([], pa.string()),
         "weight": pa.array([], pa.int64())}))
    empty_c = rd.from_arrow(pa.table(
        {"norm": pa.array([], pa.string()),
         "community": pa.array([], pa.string())}))
    out = modularity(empty_e, empty_c).take_all()
    assert out[0]["n_communities"] == 0
    assert out[0]["modularity"] is None


def test_entity_recurrence_toy(ray_session, tmp_path, monkeypatch):
    """Hand-checkable via the query's internals: run the same logic over
    a tiny distinct (conv, turn, norm) set through the op chain by
    monkeypatching _mentions."""
    import ray.data as rd

    import easyner_ray.pipelines.queries as q

    rows = [("c1", 0, "a"), ("c1", 1, "a"), ("c1", 4, "a"),  # gaps 1, 3
            ("c2", 0, "a"),                                   # no gap
            ("c1", 0, "b")]
    ments = rd.from_arrow(pa.table(
        {"conv_id": [r[0] for r in rows],
         "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
         "norm": [r[2] for r in rows]}))
    monkeypatch.setattr(q, "_mentions", lambda sf: ments)
    out = {r["norm"]: r for r in q.kg_entity_recurrence("unused").take_all()}
    a = out["a"]
    assert a["n_convs"] == 2 and a["n_turns"] == 4 and a["n_gaps"] == 2
    assert a["max_gap"] == 3 and a["n_resurfaces"] == 1  # only the 1->4 jump
    b = out["b"]
    assert b["n_convs"] == 1 and b["n_turns"] == 1
    assert b["n_gaps"] == 0 and b["max_gap"] == 0 and b["n_resurfaces"] == 0


def test_c4_line_filter_rules(ray_session):
    """Line rules: terminal punct + >=5 words + no 'javascript'; doc
    rules: lorem ipsum / brace kill, >= min_lines survivors."""
    import ray.data as rd

    from easyner_ray.ops.textstats import c4_line_filter

    good = "this line has five words."
    docs = pa.table({
        "doc_id": ["keep", "too_few", "brace", "lorem"],
        "text": ["\n".join([good,
                            "short one.",              # < 5 words
                            "no terminal punctuation here at all",
                            "enable javascript to view this page.",
                            good + "!",
                            good]),                    # 3 survive
                 "\n".join([good, good]),              # only 2 lines
                 good + "\n{ config }\n" + good + "\n" + good,
                 "lorem ipsum dolor.\n" + good + "\n" + good + "\n" + good]})
    out = {r["doc_id"]: r for r in
           c4_line_filter(rd.from_arrow(docs).repartition(2),
                          min_lines=3).take_all()}
    assert set(out) == {"keep"}
    r = out["keep"]
    assert r["n_kept"] == 3 and r["n_removed"] == 3
    assert r["text_clean"] == "\n".join([good, good + "!", good])


def test_c4_line_filter_empty(ray_session):
    import ray.data as rd

    from easyner_ray.ops.textstats import c4_line_filter

    docs = rd.from_arrow(pa.table({"doc_id": ["a"], "text": ["word salad"]}))
    assert c4_line_filter(docs).take_all() == []


def test_conv_dedup_collapses_identical_dialogs(ray_session, monkeypatch):
    import ray.data as rd

    import easyner_ray.pipelines.queries as q

    rows = [("c2", 0, "hi"), ("c2", 1, "bye"),
            ("c1", 0, "hi"), ("c1", 1, "bye"),   # same content as c2
            ("c3", 0, "hi"), ("c3", 1, "later")]
    tr = rd.from_arrow(pa.table(
        {"conv_id": [r[0] for r in rows],
         "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
         "text": [r[2] for r in rows]}))
    monkeypatch.setattr(q, "_transcripts_cols", lambda sf, cols: tr)
    out = {r["conv_id"]: r["n_copies"] for r in q.conv_dedup("x").take_all()}
    assert out == {"c1": 2, "c3": 1}


def _kf_docs():
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([3, 1, 2], pa.int64()),
        "text": ["dup line\nunique c",          # doc 3: loses "dup line"
                 "dup line\nunique a\n\ntwice\ntwice",  # doc 1: first carrier
                 "twice\nunique b"]})           # doc 2: "twice" min doc is 1
    return rd.from_arrow(t).repartition(2)


def _kf_expect():
    return {
        1: ("dup line\nunique a\n\ntwice\ntwice", 0),  # min carrier keeps all
        2: ("unique b", 1),
        3: ("unique c", 1),
    }


def test_dup_line_keep_first_broadcast(ray_session):
    from easyner_ray.ops.dedup import dup_line_keep_first

    out = {r["doc_id"]: (r["text_clean"], r["n_removed"])
           for r in dup_line_keep_first(_kf_docs()).take_all()}
    assert out == _kf_expect()


def test_dup_line_keep_first_join_path_matches(ray_session):
    from easyner_ray.ops.dedup import dup_line_keep_first

    out = {r["doc_id"]: (r["text_clean"], r["n_removed"])
           for r in dup_line_keep_first(
               _kf_docs(), broadcast_max_bytes=0).take_all()}
    assert out == _kf_expect()


def test_rp_reduce_batch_invariant_and_jl(ray_session):
    """Values are identical under different batch layouts (the fixed-
    order kernel claim), and the projection roughly preserves pair
    distances (JL property, loose tolerance at k=16 of d=64)."""
    import numpy as np
    import ray.data as rd

    from easyner_ray.ops.similarity import rp_reduce

    rng_free = np.arange(40 * 64, dtype=np.float64).reshape(40, 64)
    rng_free = np.sin(rng_free)  # deterministic, varied
    tbl = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in rng_free],
                              pa.list_(pa.float32()))})

    def run(blocks, bs):
        out = rp_reduce(rd.from_arrow(tbl).repartition(blocks), 16,
                        batch_size=bs).take_all()
        return {(r["vec_id"], r["dim_idx"]): r["value"] for r in out}

    a = run(1, 4096)
    b = run(4, 7)
    assert a == b and len(a) == 40 * 16

    y = np.array([[a[(i, j)] for j in range(16)] for i in range(40)])
    x32 = rng_free.astype(np.float32).astype(np.float64)
    dx = np.linalg.norm(x32[0] - x32[20])
    dy = np.linalg.norm(y[0] - y[20])
    assert 0.4 * dx < dy < 2.5 * dx  # distance preserved within JL slack


def test_curate_new_steps(ray_session):
    """The three session-8 chain steps run end-to-end in one config:
    cross_dup_filter drops the heavily-shared doc, dup_line_keep_first
    keeps one carrier of the shared line, c4_filter applies line rules."""
    import ray.data as rd

    from easyner_ray.pipelines.curate import STEPS

    good = "this line has five words."
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [good + "\nshared line is right here.\n" + good,
                 good + "!\nshared line is right here.\n" + good + "?",
                 "tiny."]}))
    out = STEPS["dup_line_keep_first"](docs, min_count=2)
    rows = {r["doc_id"]: r["text"] for r in out.take_all()}
    # doc 1 (min id) keeps the shared line; doc 2 loses it; the "good"
    # line also dups -> kept only in doc 1
    assert "shared line is right here." in rows[1]
    assert "shared line is right here." not in rows[2]

    out2 = STEPS["c4_filter"](docs, min_lines=2)
    ids2 = sorted(r["doc_id"] for r in out2.take_all())
    assert ids2 == [1, 2]   # doc 3 has one line -> killed

    out3 = STEPS["cross_dup_filter"](docs, max_dup_frac=0.4, n=2)
    ids3 = sorted(r["doc_id"] for r in out3.take_all())
    assert 3 in ids3        # no shared bigrams with others at that rate


def test_containment_catches_subset_jaccard_misses(ray_session):
    """A short doc fully embedded in a long one: containment 1.0, but
    Jaccard inter/uni is small — the pair must pass the containment
    gate and fail a high Jaccard gate."""
    import ray.data as rd

    from easyner_ray.ops.dedup import (ngram_containment_pairs,
                                       ngram_jaccard_pairs)

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(60))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": [short, short + " " + filler]})
    ds = rd.from_arrow(t).repartition(2)

    cont = ngram_containment_pairs(ds, threshold=0.9, k=3).take_all()
    assert len(cont) == 1
    r = cont[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["inter"] == r["n_a"] == 3  # all of the short doc's trigrams

    jac = ngram_jaccard_pairs(ds, threshold=0.5, k=3).take_all()
    assert jac == []  # inter/uni = 3/63 — invisible to Jaccard
