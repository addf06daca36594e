"""Round-5 session-10 operators: corpus-wide top-trigram census
(``ops/textstats.top_ngrams``) and friends added this session."""

from __future__ import annotations

import pyarrow as pa


def _docs_ds(rows, blocks: int = 2):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows]})
    return rd.from_arrow(tbl).repartition(blocks)


def _ref_top_ngrams(rows, k):
    import re
    from collections import Counter

    c = Counter()
    for _, text in rows:
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        for i in range(len(toks) - 2):
            c[" ".join(toks[i:i + 3])] += 1
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_top_ngrams_multiplicity_and_ties(ray_session):
    from easyner_ray.ops.textstats import top_ngrams

    rows = [(0, "the cat sat on the mat"),
            (1, "the cat sat again; the cat sat"),
            (2, "on the mat on the mat"),
            (3, "x"),            # < 3 tokens: no gram
            (4, "")]
    out = top_ngrams(_docs_ds(rows), k=5).take_all()
    got = [(r["gram"], r["cnt"]) for r in out]
    assert got == _ref_top_ngrams(rows, 5)
    # multiplicity, not distinct: "the cat sat" appears 3x total
    assert ("the cat sat", 3) in got


def test_top_ngrams_no_cross_doc_grams(ray_session):
    from easyner_ray.ops.textstats import top_ngrams

    # one doc ends "a b", the next starts "c" — "a b c" must NOT appear
    rows = [(0, "a b"), (1, "c d e")]
    got = {r["gram"] for r in top_ngrams(_docs_ds(rows, blocks=1),
                                         k=10).take_all()}
    assert got == {"c d e"}


def test_top_ngrams_empty_corpus(ray_session):
    import ray.data as rd

    from easyner_ray.ops.textstats import top_ngrams

    empty = rd.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "text": pa.array([], pa.string())}))
    assert top_ngrams(empty, k=5).take_all() == []


def test_ewma_final_recurrence(ray_session):
    import ray.data as rd

    from easyner_ray.ops.analytic import ewma_final

    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([3, 1, 2, 1, 2, 5], pa.int64()),
        "event_id": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        "value": pa.array([4.0, 8.0, 2.0, 1.0, 3.0, 7.5], pa.float64())})
    out = {r["user_id"]: (r["n_events"], r["ewma"])
           for r in ewma_final(rd.from_arrow(tbl).repartition(3),
                               ["user_id"], ["ts", "event_id"],
                               "value").take_all()}

    def ref(vals):
        e = vals[0]
        for v in vals[1:]:
            e = 0.5 * v + 0.5 * e
        return round(e, 4)

    # user 1 ordered by ts: 8, 2, 4 -> e = .5*4 + .5*(.5*2 + .5*8)
    assert out == {1: (3, ref([8.0, 2.0, 4.0])),
                   2: (2, ref([1.0, 3.0])),
                   3: (1, 7.5)}


def test_ewma_final_empty(ray_session):
    import ray.data as rd

    from easyner_ray.ops.analytic import ewma_final

    empty = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "event_id": pa.array([], pa.int64()),
        "value": pa.array([], pa.float64())}))
    assert ewma_final(empty, ["user_id"], ["ts", "event_id"],
                      "value").take_all() == []


def _edges_ds(pairs):
    import ray.data as rd

    # symmetric distinct directed pairs, like _kg_edge_pairs emits
    sym = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    return rd.from_arrow(pa.table(
        {"subj": [p[0] for p in sym], "obj": [p[1] for p in sym]}))


def test_bridges_path_cycle_mix(ray_session):
    from easyner_ray.ops.graph_analytics import bridges

    # triangle a-b-c (no bridges) with a pendant chain c-d-e (both bridges)
    ds = _edges_ds([("a", "b"), ("b", "c"), ("a", "c"),
                    ("c", "d"), ("d", "e")])
    out = [(r["norm_a"], r["norm_b"]) for r in bridges(ds).take_all()]
    assert out == [("c", "d"), ("d", "e")]


def test_bridges_two_components(ray_session):
    from easyner_ray.ops.graph_analytics import bridges

    # square w-x-y-z-w (cycle, none) + isolated edge p-q (bridge)
    ds = _edges_ds([("w", "x"), ("x", "y"), ("y", "z"), ("z", "w"),
                    ("p", "q")])
    out = [(r["norm_a"], r["norm_b"]) for r in bridges(ds).take_all()]
    assert out == [("p", "q")]


def test_bridges_empty(ray_session):
    import ray.data as rd

    from easyner_ray.ops.graph_analytics import bridges

    empty = rd.from_arrow(pa.table({"subj": pa.array([], pa.string()),
                                    "obj": pa.array([], pa.string())}))
    assert bridges(empty).take_all() == []


def test_readability_counts(ray_session):
    from easyner_ray.ops.textstats import readability

    rows = [(0, "The cat sat. It purred! Done?"),
            (1, "xyzzy 42"),       # no sentence end, one vowel group
            (2, "")]
    out = {r["doc_id"]: (r["n_words"], r["n_sentences"],
                         r["n_vowel_groups"])
           for r in readability(_docs_ds(rows)).take_all()}
    # doc 0: 6 words, 3 terminator runs; vowel groups:
    # The(1) cat(1) sat(1) It(1) purred(2: u, e) Done(2: o, e) = 8
    assert out[0] == (6, 3, 8)
    assert out[1] == (2, 0, 2)     # "xyzzy" has TWO y-runs, "42" none
    assert out[2] == (0, 0, 0)


def test_length_integrity_detects_mismatch(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from easyner_ray.pipelines import queries as q

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": ["s0", "s0", "s1"],
        "text": ["abc", "café", "xy"],
        # n_chars counts CODE POINTS: café = 4; doc 1 lies (5 != 3)
        "n_chars": pa.array([5, 4, 2], pa.int64()),
        "lang": ["en", "fr", "en"]})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {r["source"]: (r["n_docs"], r["n_mismatch"])
           for r in q.docs_length_integrity(str(tmp_path)).take_all()}
    assert out == {"s0": (2, 1), "s1": (1, 0)}


def test_shortest_paths_reconstruction(ray_session):
    from easyner_ray.ops.graph_analytics import shortest_paths

    # diamond a-b, a-c, b-d, c-d plus pendant d-e: two shortest paths
    # a->d; the min-name predecessor rule must pick b
    ds = _edges_ds([("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
                    ("d", "e")])
    out = {(r["seed"], r["norm"]): (r["hops"], r["path"])
           for r in shortest_paths(ds, ["a"]).take_all()}
    assert out[("a", "a")] == (0, "a")
    assert out[("a", "b")] == (1, "a -> b")
    assert out[("a", "d")] == (2, "a -> b -> d")
    assert out[("a", "e")] == (3, "a -> b -> d -> e")
    assert len(out) == 5


def test_shortest_paths_absent_seed_and_multi(ray_session):
    from easyner_ray.ops.graph_analytics import shortest_paths

    ds = _edges_ds([("x", "y"), ("p", "q")])
    out = {(r["seed"], r["norm"]): r["hops"]
           for r in shortest_paths(ds, ["x", "p", "ghost"]).take_all()}
    # ghost is absent -> dropped; components stay separate
    assert out == {("x", "x"): 0, ("x", "y"): 1,
                   ("p", "p"): 0, ("p", "q"): 1}


def test_append_ivf_index_sees_delta(ray_session, tmp_path):
    import numpy as np
    import ray.data as rd

    from easyner_ray.ops.similarity import (append_ivf_index,
                                            build_ivf_index,
                                            knn_ivf_indexed)

    rng = np.random.RandomState(3)
    base = rng.randn(40, 8)
    # delta contains an exact copy of the query vector -> must become
    # the top hit after append, without retraining centroids
    query = rng.randn(1, 8)
    delta = np.vstack([query, rng.randn(4, 8)])

    def ds(mat, id0):
        import pyarrow as pa
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(range(id0, id0 + len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  pa.list_(pa.float32()))}))

    idx = str(tmp_path / "ivf")
    cent0 = build_ivf_index(ds(base, 0), idx, n_centroids=4)
    before = {r["vec_id"]
              for r in knn_ivf_indexed(idx, query, k=3).take_all()}
    assert 100 not in before
    cent1 = append_ivf_index(idx, ds(delta, 100))
    assert np.array_equal(cent0, cent1)      # no retrain
    after = knn_ivf_indexed(idx, query, k=3).take_all()
    top = min(after, key=lambda r: r["rank"])
    assert top["vec_id"] == 100              # the exact copy wins


def test_corpus_card_and_readability_step(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from easyner_ray.pipelines import queries as q
    from easyner_ray.pipelines.curate import STEPS

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "source": ["s0", "s0", "s1", "s1"],
        "lang": ["en", "en", "fr", "en"],
        "text": ["One two. Three!",          # fine: 2 sentences
                 "word " * 100,              # run-on: 100 words, 0 sents
                 "Short. Ok.", ""],
        "n_chars": pa.array([0, 0, 0, 0], pa.int64())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    card = q.docs_corpus_card(str(tmp_path))
    row = card.to_pylist()[0]
    assert row["n_docs"] == 4 and row["n_sources"] == 2
    assert row["n_langs"] == 2 and row["n_empty"] == 1
    assert row["total_tokens"] == 3 + 100 + 2 + 0

    ds = rd.from_arrow(tbl)
    out = STEPS["readability_filter"](ds, max_words_per_sentence=20)
    kept = {r["doc_id"] for r in out.take_all()}
    assert kept == {1, 3}     # run-on and empty both dropped


def test_events_burst_window_edges(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from easyner_ray.pipelines import queries as q

    H = 3_600_000_000  # 1h in us
    rows = [
        # user 1: three at t=0 (ties), one just inside, one AT +1h (excl)
        (1, 0), (1, 0), (1, 0), (1, H - 1), (1, H),
        # user 2: spread out, max window holds 2
        (2, 0), (2, H // 2), (2, 3 * H),
        # user 3: single event
        (3, 42),
    ]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "event_type": ["x"] * len(rows),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": ["{}"] * len(rows)})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = {r["user_id"]: r["max_burst"]
           for r in q.events_burst(str(tmp_path)).take_all()}
    # user 1: [0, 1h) holds the three ties + H-1 = 4 (H excluded)
    assert out == {1: 4, 2: 2, 3: 1}
