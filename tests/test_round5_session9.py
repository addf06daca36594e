"""Round-5 session-9 operators: Heaps-law vocabulary growth and Zipf
rank-frequency fit (``ops/textstats.vocab_growth`` / ``zipf_fit``),
per-doc trigram novelty (``ops/textstats.ngram_novelty``), closeness
moments (``ops/graph_analytics.closeness``) and directed reciprocity
(``ops/graph_analytics.reciprocity``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _docs_ds(rows, blocks: int = 2):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows]})
    return rd.from_arrow(tbl).repartition(blocks)


def test_vocab_growth_buckets(ray_session):
    from easyner_ray.ops.textstats import vocab_growth

    # ids 0..9, 5 buckets over span 10 -> bucket = fd // 2
    docs = _docs_ds([(0, "a b"), (1, "a"), (2, "c"), (3, "a b"),
                     (4, ""), (5, "d c"), (6, "b"), (7, ""),
                     (8, "a"), (9, "e")])
    out = {r["bucket"]: (r["new_terms"], r["cum_vocab"])
           for r in vocab_growth(docs, n_buckets=5).take_all()}
    # first occurrences: a,b -> doc 0; c -> doc 2; d -> doc 5; e -> doc 9
    assert out == {0: (2, 2), 1: (1, 3), 2: (1, 4), 4: (1, 5)}


def test_vocab_growth_empty(ray_session):
    import ray.data as rd

    from easyner_ray.ops.textstats import vocab_growth

    empty = rd.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    assert vocab_growth(empty).take_all() == []


def test_zipf_fit_matches_population_ols(ray_session):
    from easyner_ray.ops.textstats import zipf_fit

    # exact counts 8 / 4 / 2 / 1 for terms t0..t3 (one doc, repeats)
    text = " ".join(["t0"] * 8 + ["t1"] * 4 + ["t2"] * 2 + ["t3"])
    rows = zipf_fit(_docs_ds([(0, text)]), top_k=10).take_all()
    assert len(rows) == 1 and rows[0]["n_terms"] == 4
    y = np.log([8.0, 4.0, 2.0, 1.0])
    x = np.log(np.arange(1, 5, dtype=np.float64))
    mx, my = x.mean(), y.mean()
    slope = float(((x - mx) * (y - my)).sum() / ((x - mx) ** 2).sum())
    assert rows[0]["slope"] == round(slope, 6)
    assert rows[0]["intercept"] == round(my - slope * mx, 6)
    assert rows[0]["slope"] < 0  # frequency falls with rank


def test_zipf_fit_single_term_null_slope(ray_session):
    from easyner_ray.ops.textstats import zipf_fit

    rows = zipf_fit(_docs_ds([(0, "only only")]), top_k=10).take_all()
    assert rows[0]["n_terms"] == 1
    assert rows[0]["slope"] is None and rows[0]["intercept"] is None


def test_ngram_novelty_first_occurrence(ray_session):
    from easyner_ray.ops.textstats import ngram_novelty

    docs = _docs_ds([(0, "a b c d"),   # {a b c, b c d} both novel
                     (1, "a b c x"),   # {a b c (seen), b c x (novel)}
                     (2, "a b"),       # < 3 tokens -> no row
                     (3, "a b c")])    # {a b c} seen in doc 0
    out = {r["doc_id"]: (r["n_grams"], r["n_novel"])
           for r in ngram_novelty(docs).take_all()}
    assert out == {0: (2, 2), 1: (2, 1), 3: (1, 0)}


def test_ngram_novelty_within_doc_repeat_counts_once(ray_session):
    from easyner_ray.ops.textstats import ngram_novelty

    # "a b c a b c a" repeats gram "a b c" -> distinct grams only
    out = ngram_novelty(_docs_ds([(0, "a b c a b c a")])).take_all()
    (row,) = out
    # distinct trigrams: a b c / b c a / c a b -> all novel
    assert (row["n_grams"], row["n_novel"]) == (3, 3)


def _sym_edges(und, blocks: int = 2):
    import ray.data as rd

    rows = {"subj": [], "obj": [], "weight": []}
    for s, o in und:
        for x, y in ((s, o), (o, s)):
            rows["subj"].append(x)
            rows["obj"].append(y)
            rows["weight"].append(1)
    return rd.from_arrow(pa.table(rows)).repartition(blocks)


def test_closeness_two_components(ray_session):
    from easyner_ray.ops.graph_analytics import closeness

    # triangle a-b-c with pendant d on c; separate pair e-f
    edges = _sym_edges([("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
                        ("e", "f")])
    out = {r["norm"]: (r["n_reachable"], r["sum_dist"])
           for r in closeness(edges).take_all()}
    assert out == {"a": (3, 4), "b": (3, 4), "c": (3, 3), "d": (3, 5),
                   "e": (1, 1), "f": (1, 1)}


def test_closeness_matches_eccentricity_reach(ray_session):
    from easyner_ray.ops.graph_analytics import closeness, eccentricity

    edges = _sym_edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                        ("b", "e")])
    reach_c = {r["norm"]: r["n_reachable"]
               for r in closeness(edges).take_all()}
    reach_e = {r["norm"]: r["n_reachable"]
               for r in eccentricity(edges).take_all()}
    assert reach_c == reach_e


def _dir_edges(pairs, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(pa.table(
        {"src": [p[0] for p in pairs], "dst": [p[1] for p in pairs],
         "weight": [1] * len(pairs)})).repartition(blocks)


def test_reciprocity_counts(ray_session):
    from easyner_ray.ops.graph_analytics import reciprocity

    edges = _dir_edges([("a", "b"), ("b", "a"), ("a", "c"), ("c", "d")])
    out = {r["norm"]: (r["n_out"], r["n_recip"])
           for r in reciprocity(edges).take_all()}
    # a -> {b (mutual), c (one-way)}; b -> {a (mutual)}; c -> {d (one-way)}
    assert out == {"a": (2, 1), "b": (1, 1), "c": (1, 0)}


def test_reciprocity_fully_mutual(ray_session):
    from easyner_ray.ops.graph_analytics import reciprocity

    edges = _dir_edges([("x", "y"), ("y", "x"), ("y", "z"), ("z", "y")])
    out = {r["norm"]: (r["n_out"], r["n_recip"])
           for r in reciprocity(edges).take_all()}
    assert out == {"x": (1, 1), "y": (2, 2), "z": (1, 1)}


def _turns_ds(rows, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(pa.table(
        {"conv_id": [r[0] for r in rows],
         "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
         "tool": pa.array([r[2] for r in rows], pa.string())}
    )).repartition(blocks)


def test_tool_transitions_skip_chat_turns(ray_session):
    from easyner_ray.ops.conversations import tool_transitions

    # c1: search(0) .. chat(1) .. browser(4) .. search(6)
    # c2: browser(0) .. browser(2); c3: lone calculator -> no pair
    turns = _turns_ds([("c1", 0, "search"), ("c1", 1, None),
                       ("c1", 4, "browser"), ("c1", 6, "search"),
                       ("c2", 0, "browser"), ("c2", 2, "browser"),
                       ("c3", 5, "calculator")])
    out = {(r["tool"], r["next_tool"]): r["n"]
           for r in tool_transitions(turns).take_all()}
    assert out == {("search", "browser"): 1, ("browser", "search"): 1,
                   ("browser", "browser"): 1}


def test_tool_transitions_empty_string_excluded(ray_session):
    from easyner_ray.ops.conversations import tool_transitions

    turns = _turns_ds([("c", 0, "search"), ("c", 1, ""),
                       ("c", 2, "browser")])
    out = {(r["tool"], r["next_tool"]): r["n"]
           for r in tool_transitions(turns).take_all()}
    assert out == {("search", "browser"): 1}


def test_docs_keywords_rank_and_ties(ray_session, tmp_path):
    import ray.data as rd

    from easyner_ray.ops.relational import topk_per_group
    from easyner_ray.ops.textstats import tfidf

    # d0: "x" dominates; "y"/"z" tie on tfidf -> term asc breaks the tie
    docs = rd.from_arrow(pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": ["x x x y z", "x y q", "z q y"]}))
    top = topk_per_group(tfidf(docs), ["doc_id"], "tfidf", 2,
                         descending=True, tie_cols=["term"],
                         rank_name="rank")
    rows = sorted((r["doc_id"], r["rank"], r["term"])
                  for r in top.take_all())
    by_doc = {}
    for doc, rank, term in rows:
        by_doc.setdefault(doc, []).append(term)
    # d0 tfidf: x = 3*ln(3/2), z = 1*ln(3/2), y = 1*ln(3/3) = 0
    assert by_doc[0] == ["x", "z"]
    assert all(len(v) <= 2 for v in by_doc.values())


def test_lexical_diversity_profile(ray_session):
    import math

    from easyner_ray.ops.textstats import lexical_diversity

    docs = _docs_ds([(0, "a a b"),      # p = 2/3, 1/3
                     (1, "x x x x"),    # single type -> entropy 0
                     (2, "")])          # no tokens -> no row
    out = {r["doc_id"]: (r["n_tokens"], r["n_types"], r["entropy"])
           for r in lexical_diversity(docs).take_all()}
    h = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert out == {0: (3, 2, round(h, 4)), 1: (4, 1, 0.0)}


def test_compression_ratio_counts(ray_session):
    import zlib

    import ray.data as rd

    from easyner_ray.ops.conversations import compression_ratio

    turns = rd.from_arrow(pa.table(
        {"conv_id": ["c1", "c1", "c2"],
         "turn_idx": pa.array([1, 0, 0], pa.int32()),
         "text": ["world", "hello", "aaaaaaaaaaaaaaaaaaaaaaaa"]}
    )).repartition(2)
    out = {r["conv_id"]: (r["n_turns"], r["raw_bytes"], r["comp_bytes"])
           for r in compression_ratio(turns).take_all()}
    # c1 assembles in TURN order: "hello\nworld"
    c1 = "hello\nworld".encode()
    c2 = ("a" * 24).encode()
    assert out == {"c1": (2, len(c1), len(zlib.compress(c1, 6))),
                   "c2": (1, len(c2), len(zlib.compress(c2, 6)))}
    # the repetitive conv compresses below raw; the short one may not
    assert out["c2"][2] < out["c2"][1]


def test_ngram_novelty_hash_join_path_matches(ray_session):
    from easyner_ray.ops.textstats import ngram_novelty

    docs = _docs_ds([(0, "a b c d e"), (1, "a b c f g"),
                     (3, "c d e a b"), (7, "f g h i j")], blocks=3)
    broad = {r["doc_id"]: (r["n_grams"], r["n_novel"])
             for r in ngram_novelty(docs).take_all()}
    hashed = {r["doc_id"]: (r["n_grams"], r["n_novel"])
              for r in ngram_novelty(docs, broadcast_bytes=0).take_all()}
    assert broad == hashed and broad  # forced hash-shuffle path agrees


def test_reciprocity_hash_join_path_matches(ray_session):
    from easyner_ray.ops.graph_analytics import reciprocity

    edges = _dir_edges([("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"),
                        ("d", "c"), ("d", "a")], blocks=3)
    broad = {r["norm"]: (r["n_out"], r["n_recip"])
             for r in reciprocity(edges).take_all()}
    hashed = {r["norm"]: (r["n_out"], r["n_recip"])
              for r in reciprocity(edges, broadcast_bytes=0).take_all()}
    assert broad == hashed and broad


def test_curate_entropy_filter(ray_session):
    import math

    from easyner_ray.pipelines.curate import _step_entropy_filter

    docs = _docs_ds([(0, "a a a a a a"),        # entropy 0 -> dropped
                     (1, "a b c d e f"),        # entropy ln(6) -> kept
                     (2, "")])                  # no tokens -> dropped
    out = _step_entropy_filter(docs, min_entropy=0.5).take_all()
    assert [r["doc_id"] for r in out] == [1]
    # band upper edge: ln(6) ~ 1.79 excluded by max_entropy=1.0
    out2 = _step_entropy_filter(docs, min_entropy=0.0,
                                max_entropy=1.0).take_all()
    assert [r["doc_id"] for r in out2] == [0]
    assert math.log(6) > 1.0  # sanity on the band choice


def test_curate_compression_filter(ray_session):
    import zlib

    from easyner_ray.pipelines.curate import _step_compression_filter

    rep = "spam " * 400          # compresses hard -> low ratio
    mixed = "the quick brown fox jumps over the lazy dog 0123456789"
    docs = _docs_ds([(0, rep), (1, mixed), (2, "")])
    r_rep = len(zlib.compress(rep.encode(), 6)) / len(rep.encode())
    r_mix = len(zlib.compress(mixed.encode(), 6)) / len(mixed.encode())
    assert r_rep < 0.1 < r_mix
    out = _step_compression_filter(docs, min_ratio=0.1).take_all()
    assert [r["doc_id"] for r in out] == [1]  # empty doc always drops


def test_conv_minhash_pairs_finds_rerolled_dialog(ray_session, tmp_path):
    import ray.data as rd

    from easyner_ray.ops.conversations import assemble_conversations
    from easyner_ray.ops.dedup import minhash_lsh_pairs

    base = ("please check the deploy status and report back with the "
            "full log output for the staging cluster today").split()
    turns = []
    for cid, drop in (("conv00000001", None), ("conv00000002", 3),
                      ("conv00000007", "unrelated")):
        if drop == "unrelated":
            texts = ["completely different words entirely",
                     "nothing shared with that other dialog at all"]
        else:
            toks = [w for i, w in enumerate(base) if i != drop]
            texts = [" ".join(toks[:9]), " ".join(toks[9:])]
        for i, tx in enumerate(texts):
            turns.append((cid, i, tx))
    tr = rd.from_arrow(pa.table(
        {"conv_id": [t[0] for t in turns],
         "turn_idx": pa.array([t[1] for t in turns], pa.int32()),
         "text": [t[2] for t in turns]})).repartition(2)
    conv = assemble_conversations(tr)

    import pyarrow.compute as pc

    docs = conv.map_batches(lambda t: pa.table(
        {"doc_id": pc.cast(pc.utf8_slice_codeunits(
            t.column("conv_id").combine_chunks(), 4, 32), pa.int64()),
         "text": t.column("text")}), batch_format="pyarrow")
    rows = minhash_lsh_pairs(docs, threshold=0.5).take_all()
    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in rows}
    # the rerolled dialog (one word dropped) pairs with the original;
    # the unrelated one pairs with neither
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5
    assert all(7 not in k for k in pairs)


def test_events_daily_growth_lag_semantics(ray_session):
    import datetime as dt

    import ray.data as rd

    from easyner_ray.pipelines import queries as q

    # build directly against the op chain via a tiny in-memory table
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import grouped_agg

    ts = [dt.datetime(2026, 1, d, h) for d, h in
          ((1, 3), (1, 9), (2, 5), (4, 1), (1, 2))]
    ev = rd.from_arrow(pa.table(
        {"event_type": ["a", "a", "a", "a", "b"],
         "ts": pa.array(ts, pa.timestamp("us"))})).repartition(2)

    import pyarrow.compute as pc

    def day_key(t):
        return pa.table({"event_type": t.column("event_type"),
                         "day": pc.floor_temporal(t.column("ts"),
                                                  unit="day")})

    daily = grouped_agg(ev.map_batches(day_key, batch_format="pyarrow"),
                        ["event_type", "day"], [("day", "count", "n")])
    led = partitioned_analytics(daily, ["event_type"], ["day"],
                                [("lag", "n", "prev_n")])
    rows = {(r["event_type"], r["day"].day): (r["n"], r["prev_n"])
            for r in led.take_all()}
    # a: day1 n=2 (no prev), day2 n=1 prev=2, day4 n=1 prev=1 (gap ok)
    assert rows[("a", 1)] == (2, None)
    assert rows[("a", 2)] == (1, 2)
    assert rows[("a", 4)] == (1, 1)
    assert rows[("b", 1)] == (1, None)


def test_dup_pairs_by_source_rollup(ray_session):
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    # simulate the post-pair join shape directly: pairs + source map
    pairs = rd.from_arrow(pa.table(
        {"doc_a": pa.array([1, 1, 5], pa.int64()),
         "doc_b": pa.array([2, 3, 6], pa.int64())}))
    src = rd.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2, 3, 5, 6], pa.int64()),
         "source": ["web", "books", "web", "code", "code"]}))
    a_side = src.map_batches(
        lambda t: t.rename_columns(["doc_a", "src_of_a"]),
        batch_format="pyarrow")
    b_side = src.map_batches(
        lambda t: t.rename_columns(["doc_b", "src_of_b"]),
        batch_format="pyarrow")
    j = adaptive_join(adaptive_join(pairs, a_side, on="doc_a"),
                      b_side, on="doc_b")

    import pyarrow.compute as pc

    def canon_pair(t):
        a, b = (t.column("src_of_a").combine_chunks(),
                t.column("src_of_b").combine_chunks())
        return pa.table({"src_a": pc.min_element_wise(a, b),
                         "src_b": pc.max_element_wise(a, b)})

    out = grouped_agg(j.map_batches(canon_pair, batch_format="pyarrow"),
                      ["src_a", "src_b"], [("src_a", "count", "n_pairs")])
    got = {(r["src_a"], r["src_b"]): r["n_pairs"] for r in out.take_all()}
    # (web,books) and (books,web) collapse; (web,web) and (code,code) self
    assert got == {("books", "web"): 1, ("web", "web"): 1,
                   ("code", "code"): 1}
