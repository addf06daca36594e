"""Round-4 (late) additions:

- adaptive_join: broadcast-vs-hash-shuffle inner/left equi-join, both
  paths identical (columns, rows, duplicate-key multiplication, nulls),
- windowed analytics (row_number / lag / running sum per key),
- embedding near-dup groups (cosine pairs -> connected components).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


def test_adaptive_join_paths_agree(ray_session):
    """Broadcast path (default at test sizes) and forced hash-shuffle
    path (broadcast_bytes=0) return identical rows and columns for inner
    AND left joins; duplicate right keys multiply rows (SQL semantics);
    unmatched left rows drop on inner / null-fill on left; null left
    keys never match."""
    from easyner_ray.ops.relational import adaptive_join

    left = _ds(pa.table({
        "k": pa.array([1, 2, 2, 3, None], pa.int64()),
        "a": ["p", "q", "r", "s", "t"],
    }))
    right = _ds(pa.table({
        "rk": pa.array([1, 2, 2], pa.int64()),
        "b": [10.0, 20.0, 21.0],
    }))

    def rows(ds):
        out = ds.take_all()
        assert all(sorted(r) == ["a", "b", "k"] for r in out)
        return sorted(((r["k"], r["a"], r["b"]) for r in out),
                      key=lambda x: (x[0] is None, x[0], x[1], x[2] is None,
                                     x[2] if x[2] is not None else 0.0))

    inner = [(1, "p", 10.0), (2, "q", 20.0), (2, "q", 21.0),
             (2, "r", 20.0), (2, "r", 21.0)]
    got_b = rows(adaptive_join(left, right, on="k", right_on="rk"))
    got_h = rows(adaptive_join(left, right, on="k", right_on="rk",
                               broadcast_bytes=0))
    assert got_b == got_h == inner

    outer = inner + [(3, "s", None), (None, "t", None)]
    got_b = rows(adaptive_join(left, right, on="k", right_on="rk", how="left"))
    got_h = rows(adaptive_join(left, right, on="k", right_on="rk", how="left",
                               broadcast_bytes=0))
    assert got_b == got_h == outer

    # empty right: inner -> 0 rows, left -> all-left with null b
    empty = _ds(pa.table({"rk": pa.array([], pa.int64()),
                          "b": pa.array([], pa.float64())}))
    assert adaptive_join(left, empty, on="k", right_on="rk").count() == 0
    got = rows(adaptive_join(left, empty, on="k", right_on="rk", how="left"))
    assert [(k, a) for k, a, _ in got] == \
        [(1, "p"), (2, "q"), (2, "r"), (3, "s"), (None, "t")]
    assert all(b is None for _, _, b in got)

    # string keys, same-name join column on both sides
    sl = _ds(pa.table({"k": ["a", "b", "c"], "v": [1, 2, 3]}))
    sr = _ds(pa.table({"k": ["b", "c"], "w": [20, 30]}))
    for cutoff in (64 << 20, 0):
        got = sorted((r["k"], r["v"], r["w"]) for r in adaptive_join(
            sl, sr, on="k", broadcast_bytes=cutoff).take_all())
        assert got == [("b", 2, 20), ("c", 3, 30)]


def test_partitioned_analytics_kernel_and_buckets(ray_session):
    """Window functions (row_number / lag / lead / cumsum): partition-edge
    NULLs, an all-NULL running-sum prefix staying NULL until the first
    valid value, NULL partition keys forming ONE group (SQL PARTITION BY),
    non-numeric lag/lead preserving the source type, and bucket-count
    invariance (n_buckets=1 == 8)."""
    from easyner_ray.ops.analytic import partitioned_analytics

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, None, None], pa.int64()),
        "o": pa.array([1, 2, 3, 1, 2, 1, 2], pa.int64()),
        "v": pa.array([None, None, 3.0, 10.0, 20.0, 5.0, 6.0], pa.float64()),
        "s": ["a", "b", "c", "d", "e", "f", "g"],
    })
    specs = [("row_number", None, "rn"), ("lag", "v", "pv"),
             ("lead", "s", "ns"), ("cumsum", "v", "rv")]

    def run(n_buckets):
        out = partitioned_analytics(_ds(t), ["k"], ["o"], specs,
                                    n_buckets=n_buckets).take_all()
        return sorted(((r["k"], r["o"], r["rn"], r["pv"], r["ns"], r["rv"])
                       for r in out),
                      key=lambda x: (x[0] is None, x[0] or 0, x[1]))

    got = run(8)
    assert got == run(1)
    assert got == [
        # k=1: two NULL values first -> rv stays NULL until o=3
        (1, 1, 1, None, "b", None),
        (1, 2, 2, None, "c", None),   # lag over a NULL value is NULL
        (1, 3, 3, None, None, 3.0),   # last of group: lead is NULL
        (2, 1, 1, None, "e", 10.0),
        (2, 2, 2, 10.0, None, 30.0),
        # NULL keys are ONE partition
        (None, 1, 1, None, "g", 5.0),
        (None, 2, 2, 5.0, None, 11.0),
    ]

    import pytest

    with pytest.raises(ValueError, match="unknown analytic kind"):
        partitioned_analytics(_ds(t), ["k"], ["o"], [("pct", None, "r")])


def test_stratified_sample_deterministic(ray_session):
    """Exactly n rows per group (or the whole group when smaller), the
    SAME rows on every run, chosen by the multiplicative hash of the id
    column — membership independent of input partitioning."""
    from easyner_ray.ops.relational import stratified_sample

    t = pa.table({
        "g": ["a"] * 10 + ["b"] * 3,
        "id": list(range(10)) + [100, 101, 102],
    })

    def run(ds):
        out = stratified_sample(ds, ["g"], 5, id_col="id").take_all()
        by_g: dict = {}
        for r in out:
            by_g.setdefault(r["g"], []).append((r["sample_rank"], r["id"]))
        return {g: sorted(v) for g, v in by_g.items()}

    one = run(_ds(t))
    again = run(_ds(t).repartition(4))
    assert one == again
    assert len(one["a"]) == 5 and len(one["b"]) == 3  # b smaller than n
    assert [r for r, _ in one["a"]] == [1, 2, 3, 4, 5]

    # NULL ids are excluded and do not corrupt the others' hashes
    tn = pa.table({
        "g": ["a"] * 4,
        "id": pa.array([0, 1, None, 2], pa.int64()),
    })
    got = run(_ds(tn))
    sampled_ids = {i for _, i in got["a"]}
    assert None not in sampled_ids and len(got["a"]) == 3
    # same membership as the no-null input restricted to valid ids
    base = run(_ds(pa.table({"g": ["a"] * 3,
                             "id": pa.array([0, 1, 2], pa.int64())})))
    assert got == base


def test_quality_percentile_empty_input(ray_session):
    """An empty corpus flows through the percentile gate as empty (the
    quantile of nothing is None -> all-null mask -> zero rows), not a
    crash."""
    import ray.data as rd

    from easyner_ray.pipelines.curate import STEPS

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())}))
    out = STEPS["quality_percentile"](ds, metric="stopword_ratio",
                                      percentile=0.25)
    assert out.count() == 0


def test_quality_percentile_step_both_directions(ray_session):
    """quality_percentile curate step: the threshold is the exact
    quantile of the metric over THIS corpus; keep='above' retains
    everything at/above it (>= 1 - percentile of rows, more with ties),
    keep='below' the complement direction."""
    import ray.data as rd

    from easyner_ray.pipelines.curate import STEPS

    # stopword-heavy docs score high, 'zzz' docs score 0
    texts = ([f"the and of to in is that it for on doc {i}" for i in range(8)]
             + ["zzz qqq xxx", "qqq zzz yyy"])
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(10)), "text": texts,
    }))
    kept = STEPS["quality_percentile"](ds, metric="stopword_ratio",
                                       percentile=0.25, keep="above").take_all()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == list(range(8))          # the two zzz docs fall below P25
    assert all(sorted(r) == ["doc_id", "text"] for r in kept)  # __m dropped

    # P20 over 10 rows = rank-2 value = the second zero-score doc, so
    # keep='below' retains exactly the two junk docs
    kept_low = STEPS["quality_percentile"](ds, metric="stopword_ratio",
                                           percentile=0.2,
                                           keep="below").take_all()
    assert sorted(r["doc_id"] for r in kept_low) == [8, 9]


def test_bm25_matches_straightline(ray_session):
    """BM25 against a straight-line recompute on a tiny corpus; docs
    matching no term are excluded; empty corpus -> empty typed result."""
    import math

    from easyner_ray.ops.textstats import bm25_scores

    texts = ["cat dog cat", "dog bird", "fish fish fish", "bird cat"]
    ds = _ds(pa.table({"doc_id": [1, 2, 3, 4], "text": texts}))
    out = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(ds, ["cat", "dog"]).take_all()}
    assert sorted(out) == [1, 2, 4]   # doc 3 matches neither term

    # straight-line gold
    toks = [t.split() for t in texts]
    n, avgdl = 4, sum(len(t) for t in toks) / 4
    k1, b = 1.5, 0.75
    for doc_id, t in zip([1, 2, 4], [toks[0], toks[1], toks[3]]):
        exp = 0.0
        for term in ["cat", "dog"]:
            df = sum(1 for tk in toks if term in tk)
            idf = math.log(((n - df + 0.5) / (df + 0.5)) + 1.0)
            tf = t.count(term)
            exp += idf * ((tf * (k1 + 1.0))
                          / (tf + k1 * ((1.0 - b) + (b * len(t)) / avgdl)))
        assert out[doc_id] == round(exp, 4)

    empty = _ds(pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())}))
    res = bm25_scores(empty, ["cat"])
    assert res.count() == 0
    assert set(res.schema().base_schema.names) == {"doc_id", "bm25"}


def test_pagerank_directed_with_dangling(ray_session):
    """PageRank on a small DIRECTED graph with a dangling node (c has no
    out-edges): engine output equals the straight-line recompute of the
    same spec, total mass stays ~1, and the dangling node's mass
    redistributes (c still earns rank from b; d, pointed at by nobody,
    keeps more than bare teleport because dangling mass is uniform)."""
    from easyner_ray.ops.graph import pagerank

    edges = _ds(pa.table({
        "src": ["a", "a", "b", "d"],
        "dst": ["b", "c", "c", "a"],
    }))
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, iters=10).take_all()}

    # straight-line recompute (same rounding spec: the shared np.round
    # kernel, ops.graph._round_vec)
    def _r(x):
        return float(np.round(np.float64(x), 9))

    nodes = ["a", "b", "c", "d"]
    deg = {"a": 2, "b": 1, "d": 1}
    n, d = 4, 0.85
    rank = {v: _r(1 / n) for v in nodes}
    for _ in range(10):
        dangling = sum(rank[v] for v in nodes if v not in deg)
        inc = {v: 0.0 for v in nodes}
        for s, t2 in [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")]:
            inc[t2] += rank[s] / deg[s]
        rank = {v: _r((1 - d) / n + d * (inc[v] + dangling / n))
                for v in nodes}
    assert got == rank
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got["c"] > got["b"] > got["d"] > 0.0375  # teleport floor

    # all three execution paths (indexed-driver / indexed-broadcast /
    # join fallback) are bit-equal — the gates only trade performance
    for kw in ({"edge_driver_cutoff": 0},            # indexed-broadcast
               {"edge_driver_cutoff": 0, "node_gate": 0}):  # join path
        alt = {r["node"]: r["rank"]
               for r in pagerank(edges, iters=10, **kw).take_all()}
        assert alt == rank, kw


def test_ranking_analytics_ties_and_ntile(ray_session):
    """rank / dense_rank with ties (rank_prefix hides the tie-break
    column from them) and ntile's equal-as-possible split, including a
    group smaller than the tile count."""
    from easyner_ray.ops.analytic import partitioned_analytics

    t = pa.table({
        "k": [1, 1, 1, 1, 1, 1, 1, 2, 2],
        "v": [10, 10, 10, 20, 20, 30, 40, 5, 5],
        "id": [1, 2, 3, 4, 5, 6, 7, 8, 9],
    })
    out = partitioned_analytics(
        _ds(t), ["k"], ["v", "id"],
        [("rank", None, "rnk"), ("dense_rank", None, "drnk"),
         ("ntile", 3, "tile"), ("row_number", None, "rn")],
        rank_prefix=1).take_all()
    got = {r["id"]: (r["rnk"], r["drnk"], r["tile"], r["rn"]) for r in out}
    # k=1: values 10,10,10,20,20,30,40 -> SQL rank 1,1,1,4,4,6,7;
    # dense 1,1,1,2,2,3,4; ntile(3) over 7 rows -> sizes 3,2,2
    assert got[1] == (1, 1, 1, 1)
    assert got[2] == (1, 1, 1, 2)
    assert got[3] == (1, 1, 1, 3)
    assert got[4] == (4, 2, 2, 4)
    assert got[5] == (4, 2, 2, 5)
    assert got[6] == (6, 3, 3, 6)
    assert got[7] == (7, 4, 3, 7)
    # k=2: 2 rows into 3 tiles -> one row per tile
    assert got[8] == (1, 1, 1, 1)
    assert got[9] == (1, 1, 2, 2)


def test_npmi_edges_hand_computed(ray_session):
    """NPMI spec on a hand-computable corpus: counts are per-sentence
    DISTINCT, N includes the mention-free sentence, and the score equals
    ln(c_ab*N/(c_a*c_b)) / ln(N/c_ab) rounded at 4."""
    import math

    import ray.data as rd

    from easyner_ray.stages.cooc import npmi_edges
    from easyner_ray.stages.dict_ner import tag_mentions

    texts = ["aspirin ibuprofen aspirin",       # distinctness: aspirin twice
             "aspirin ibuprofen tylenol",
             "aspirin alone",
             "tylenol alone",
             "no mentions at all"]
    sents = rd.from_arrow(pa.table({
        "conv_id": [f"c{i}" for i in range(5)],
        "turn_idx": pa.array([0] * 5, pa.int32()),
        "sent_idx": pa.array([0] * 5, pa.int32()),
        "text": texts,
        "char_start": pa.array([0] * 5, pa.int32()),
    }))
    terms = [("aspirin", "chemical"), ("ibuprofen", "chemical"),
             ("tylenol", "chemical")]
    out = {(r["norm_a"], r["norm_b"]): r
           for r in npmi_edges(tag_mentions(sents, terms), 5).take_all()}

    def expected(c_ab, c_a, c_b, n=5):
        return round(math.log(c_ab * n / (c_a * c_b)) / math.log(n / c_ab), 4)

    assert set(out) == {("aspirin", "ibuprofen"), ("aspirin", "tylenol"),
                        ("ibuprofen", "tylenol")}
    ai = out[("aspirin", "ibuprofen")]
    assert (ai["c_ab"], ai["c_a"], ai["c_b"]) == (2, 3, 2)
    assert ai["npmi"] == expected(2, 3, 2)
    at = out[("aspirin", "tylenol")]
    assert (at["c_ab"], at["c_a"], at["c_b"]) == (1, 3, 2)
    assert at["npmi"] == expected(1, 3, 2)
    it = out[("ibuprofen", "tylenol")]
    assert (it["c_ab"], it["c_a"], it["c_b"]) == (1, 2, 2)
    assert it["npmi"] == expected(1, 2, 2)


def test_ngram_contamination_hand_and_paths(ray_session):
    """Contamination spec on a hand-checkable corpus: distinct-per-doc
    counting, sub-n docs contribute nothing, clean docs are absent, and
    the broadcast / hash-shuffle semi-join paths agree exactly with a
    brute-force recompute."""
    import re
    import zlib

    import ray.data as rd

    from easyner_ray.ops.decontam import contamination

    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": ["the quick brown fox jumps over the lazy dog",
                 "pack my box with five dozen liquor jugs"],
    }))
    train_tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [
            # two distinct 5-gram overlaps with bench doc 100
            "I saw the quick brown fox jumps over a fence",
            # the same 5-gram REPEATED -> still one distinct hit
            "pack my box with five then pack my box with five",
            "totally clean document with no shared phrases at all",
            "quick brown fox",                  # < n tokens: no fps
            None,                               # null text: no fps
        ]})
    train = rd.from_arrow(train_tbl)

    def brute(n=5):
        B, M = 1099511628211, (1 << 64) - 1

        def fps(text):
            toks = re.findall(r"[a-z0-9]+", (text or "").lower())
            out = set()
            for i in range(len(toks) - n + 1):
                h = 0
                for k in range(n):
                    h = (h * B + zlib.crc32(toks[i + k].encode())) & M
                out.add(h)
            return out

        bset = fps("the quick brown fox jumps over the lazy dog") | \
            fps("pack my box with five dozen liquor jugs")
        exp = {}
        for i, t in zip(train_tbl.column("doc_id").to_pylist(),
                        train_tbl.column("text").to_pylist()):
            hits = len(fps(t) & bset)
            if hits:
                exp[i] = hits
        return exp

    exp = brute()
    assert set(exp) == {1, 2}
    assert exp[1] >= 2 and exp[2] == 1

    for bb in (64 << 20, 0):  # broadcast is_in / forced hash-shuffle semi
        got = {r["doc_id"]: r["n_hits"]
               for r in contamination(train, bench, n=5,
                                      broadcast_bytes=bb).take_all()}
        assert got == exp, bb


def test_full_outer_join_and_empties(ray_session):
    """FULL OUTER: matched rows join, left-only rows null-fill the right
    columns, right-only rows carry their key in the LEFT key column; an
    empty side short-circuits with the same schema."""
    import ray.data as rd

    from easyner_ray.ops.relational import full_outer_join

    left = _ds(pa.table({"k": pa.array([1, 2], pa.int64()),
                         "a": ["x", "y"]}))
    right = _ds(pa.table({"rk": pa.array([2, 3], pa.int64()),
                          "b": pa.array([20.0, 30.0], pa.float64())}))

    def rows(ds):
        out = ds.take_all()
        assert all(sorted(r) == ["a", "b", "k"] for r in out)
        return sorted(((r["k"], r["a"], r["b"]) for r in out),
                      key=lambda x: x[0])

    for stb in (64 << 20, 0):  # single-task pyarrow / forced hash-shuffle
        got = rows(full_outer_join(left, right, on="k", right_on="rk",
                                   single_task_bytes=stb))
        assert got == [(1, "x", None), (2, "y", 20.0), (3, None, 30.0)], stb

    empty_r = _ds(pa.table({"rk": pa.array([], pa.int64()),
                            "b": pa.array([], pa.float64())}))
    assert rows(full_outer_join(left, empty_r, on="k", right_on="rk")) == \
        [(1, "x", None), (2, "y", None)]

    empty_l = _ds(pa.table({"k": pa.array([], pa.int64()),
                            "a": pa.array([], pa.string())}))
    assert rows(full_outer_join(empty_l, right, on="k", right_on="rk")) == \
        [(2, None, 20.0), (3, None, 30.0)]
    assert full_outer_join(empty_l, empty_r, on="k", right_on="rk"
                           ).count() == 0


def test_rollup_agg_levels(ray_session):
    """ROLLUP cascade: finest level + each prefix + grand total, NULL in
    rolled-up keys; sums/counts/min/max re-aggregate exactly; mean is
    rejected (not decomposable post-hoc)."""
    import pytest

    from easyner_ray.ops.relational import rollup_agg

    t = pa.table({
        "a": ["x", "x", "x", "y"],
        "b": pa.array([1, 1, 2, 1], pa.int64()),
        "v": pa.array([10.0, 20.0, 5.0, 7.0], pa.float64()),
    })
    out = rollup_agg(_ds(t), ["a", "b"],
                     [("v", "count", "n"), ("v", "sum", "s"),
                      ("v", "min", "mn"), ("v", "max", "mx")]).take_all()
    got = {(r["a"], r["b"]): (r["n"], r["s"], r["mn"], r["mx"])
           for r in out}
    assert got == {
        ("x", 1): (2, 30.0, 10.0, 20.0),
        ("x", 2): (1, 5.0, 5.0, 5.0),
        ("y", 1): (1, 7.0, 7.0, 7.0),
        ("x", None): (3, 35.0, 5.0, 20.0),
        ("y", None): (1, 7.0, 7.0, 7.0),
        (None, None): (4, 42.0, 5.0, 20.0),
    }

    with pytest.raises(ValueError, match="sum/count/min/max"):
        rollup_agg(_ds(t), ["a"], [("v", "mean", "m")])


def test_weighted_sample_deterministic_and_weighted(ray_session):
    """Weighted sampling: reproducible under repartitioning, k larger
    than the group keeps the whole group, NULL/non-positive weights and
    NULL ids drop, and an overwhelming weight always wins the k=1 slot."""
    from easyner_ray.ops.relational import weighted_sample

    t = pa.table({
        "g": ["a"] * 8 + ["b"] * 3,
        "id": pa.array(list(range(8)) + [100, 101, None], pa.int64()),
        "w": pa.array([1.0] * 8 + [2.0, None, 3.0], pa.float64()),
    })

    def run(ds, k=4):
        out = weighted_sample(ds, ["g"], "w", k, id_col="id").take_all()
        by_g: dict = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(
                (r["sample_rank"], r["id"], r["wkey"]))
        return {g: sorted(v) for g, v in by_g.items()}

    one = run(_ds(t))
    assert one == run(_ds(t).repartition(5))
    assert len(one["a"]) == 4
    assert [r for r, _, _ in one["a"]] == [1, 2, 3, 4]
    # b: one NULL weight + one NULL id dropped -> single survivor
    assert len(one["b"]) == 1 and one["b"][0][1] == 100
    # ranks follow DESC quantized key
    keys = {r: k for r, _, k in one["a"]}
    assert keys[1] >= keys[2] >= keys[3] >= keys[4]

    # overwhelming weight always wins k=1: ln(u)/1e9 ~ 0- beats ln(u)/1e-9
    t2 = pa.table({"g": ["x", "x"], "id": pa.array([7, 8], pa.int64()),
                   "w": pa.array([1e9, 1e-9], pa.float64())})
    got = weighted_sample(_ds(t2), ["g"], "w", 1, id_col="id").take_all()
    assert len(got) == 1 and got[0]["id"] == 7


def test_percent_rank_and_cume_dist(ray_session):
    """percent_rank = (rank-1)/(n-1) (single-row group -> 0.0) and
    cume_dist = rows-at-or-below / n, tie-aware via rank_prefix."""
    from easyner_ray.ops.analytic import partitioned_analytics

    t = pa.table({
        "k": [1, 1, 1, 1, 2],
        "v": [10, 10, 20, 30, 5],
        "id": [1, 2, 3, 4, 5],
    })
    out = partitioned_analytics(
        _ds(t), ["k"], ["v", "id"],
        [("percent_rank", None, "pr"), ("cume_dist", None, "cd")],
        rank_prefix=1).take_all()
    got = {r["id"]: (r["pr"], r["cd"]) for r in out}
    assert got[1] == (0.0, 0.5) and got[2] == (0.0, 0.5)   # tie pair
    assert got[3] == (2 / 3, 0.75)
    assert got[4] == (1.0, 1.0)
    assert got[5] == (0.0, 1.0)                             # single-row group


def test_heavy_hitters_exact_and_rank(ray_session):
    """Misra-Gries candidate + exact-verify top-k: equals the true top-k
    when the k-th frequency clears the per-batch threshold; small batches
    exercise the cross-batch candidate union; ties break by value."""
    from easyner_ray.ops.sketch import heavy_hitters

    vals = (["hot"] * 30 + ["warm"] * 20 + ["tepid"] * 20
            + [f"cold{i}" for i in range(30)])
    t = pa.table({"v": vals})
    got = [(r["rnk"], r["v"], r["n"]) for r in sorted(
        heavy_hitters(_ds(t).repartition(5), "v", 3, m=8,
                      batch_size=16).take_all(),
        key=lambda r: r["rnk"])]
    # tepid/warm tie at 20 -> 'tepid' < 'warm' lexicographically
    assert got == [(1, "hot", 30), (2, "tepid", 20), (3, "warm", 20)]

    # all-null column -> empty result, no crash
    tn = pa.table({"v": pa.array([None, None], pa.string())})
    assert heavy_hitters(_ds(tn), "v", 3).count() == 0


def test_contamination_persisted_index(ray_session, tmp_path):
    """build_fp_index + benchmark_index probe == inline benchmark
    fingerprinting, exactly; passing both or neither raises."""
    import pytest
    import ray.data as rd

    from easyner_ray.ops.decontam import build_fp_index, contamination

    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": ["the quick brown fox jumps over the lazy dog"]}))
    train = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["I saw the quick brown fox jumps today",
                 "completely clean text with nothing shared here at all"]}))

    inline = sorted((r["doc_id"], r["n_hits"])
                    for r in contamination(train, bench, n=5).take_all())
    idx = build_fp_index(bench, str(tmp_path / "fpidx"), n=5)
    indexed = sorted(
        (r["doc_id"], r["n_hits"]) for r in contamination(
            train, benchmark_index=idx, n=5).take_all())
    assert inline == indexed and len(inline) == 1 and inline[0][0] == 1

    with pytest.raises(ValueError, match="exactly one"):
        contamination(train, bench, benchmark_index=idx)
    with pytest.raises(ValueError, match="exactly one"):
        contamination(train)


def test_pagerank_integer_node_ids(ray_session):
    """All three pagerank paths accept non-string node ids (the indexed
    paths build the node dictionary generically)."""
    from easyner_ray.ops.graph import pagerank

    edges = _ds(pa.table({
        "src": pa.array([1, 1, 2, 4], pa.int64()),
        "dst": pa.array([2, 3, 3, 1], pa.int64()),
    }))
    base = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).take_all()}
    assert set(base) == {1, 2, 3, 4}
    assert abs(sum(base.values()) - 1.0) < 1e-6
    for kw in ({"edge_driver_cutoff": 0},
               {"edge_driver_cutoff": 0, "node_gate": 0}):
        alt = {r["node"]: r["rank"]
               for r in pagerank(edges, iters=5, **kw).take_all()}
        assert alt == base, kw


def test_pagerank_paths_agree_medium_graph(ray_session):
    """The three execution paths stay bit-equal on a 500-node / ~5000-edge
    graph with dangling nodes and skewed in-degree (not just the toy
    fixture): indexed-driver vs indexed-broadcast vs join fallback."""
    import numpy as np

    from easyner_ray.ops.graph import pagerank

    rng = np.random.RandomState(11)
    n_nodes, n_edges = 500, 5000
    src = rng.randint(0, n_nodes, n_edges)
    dst = (src + 1 + rng.zipf(1.7, n_edges)) % n_nodes  # skewed targets
    keep = src != dst
    pairs = sorted({(int(s), int(d)) for s, d in zip(src[keep], dst[keep])})
    # make ~50 nodes dangling: strip their out-edges
    pairs = [(s, d) for s, d in pairs if s >= 50]
    edges = pa.table({
        "src": pa.array([f"n{s}" for s, _ in pairs], pa.string()),
        "dst": pa.array([f"n{d}" for _, d in pairs], pa.string()),
    })
    runs = []
    for kw in ({}, {"edge_driver_cutoff": 0},
               {"edge_driver_cutoff": 0, "node_gate": 0}):
        got = {r["node"]: r["rank"]
               for r in pagerank(_ds(edges).repartition(8),
                                 iters=10, **kw).take_all()}
        runs.append(got)
    assert runs[0] == runs[1] == runs[2]
    assert abs(sum(runs[0].values()) - 1.0) < 1e-5
    assert len(runs[0]) == len({s for s, _ in pairs} | {d for _, d in pairs})


def test_cube_and_grouping_sets(ray_session):
    """CUBE emits every subset level exactly (incl. the b-only set that
    rollup skips); grouping_sets_agg validates subsets and emits only
    what was asked."""
    import pytest

    from easyner_ray.ops.relational import cube_agg, grouping_sets_agg

    t = pa.table({
        "a": ["x", "x", "y"],
        "b": pa.array([1, 2, 1], pa.int64()),
        "v": pa.array([10.0, 20.0, 5.0], pa.float64()),
    })
    out = cube_agg(_ds(t), ["a", "b"], [("v", "sum", "s")]).take_all()
    got = {(r["a"], r["b"]): r["s"] for r in out}
    assert got == {
        ("x", 1): 10.0, ("x", 2): 20.0, ("y", 1): 5.0,
        ("x", None): 30.0, ("y", None): 5.0,
        (None, 1): 15.0, (None, 2): 20.0,
        (None, None): 35.0,
    }

    only = grouping_sets_agg(_ds(t), ["a", "b"], [("v", "sum", "s")],
                             [["b"], []]).take_all()
    got = {(r["a"], r["b"]): r["s"] for r in only}
    assert got == {(None, 1): 15.0, (None, 2): 20.0, (None, None): 35.0}

    with pytest.raises(ValueError, match="not a subset"):
        grouping_sets_agg(_ds(t), ["a"], [("v", "sum", "s")], [["b"]])
    with pytest.raises(ValueError, match="grouping sets"):
        cube_agg(_ds(t), ["a", "b", "a2", "b2", "c", "d", "e"],
                 [("v", "sum", "s")])


def test_users_funnel_stages(ray_session):
    """Funnel stages on hand timelines: full completion, out-of-order
    click (stage 1), click-before-purchase-missing (stage 2), and a
    user who never viewed (stage 0)."""
    import datetime as dt

    import ray.data as rd

    from easyner_ray.pipelines.queries import users_funnel  # noqa: F401

    # exercise the op body directly through the same transform chain
    from easyner_ray.ops.relational import grouped_agg  # noqa: F401

    def ts(m):
        return dt.datetime(2026, 1, 1, 0, m)

    rows = [
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),   # stage 3
        (2, "click", 1), (2, "view", 2), (2, "purchase", 3),   # click first -> 1
        (3, "view", 1), (3, "click", 2),                        # no purchase -> 2
        (4, "error", 1),                                        # never viewed -> 0
        (5, "view", 1), (5, "purchase", 2),                     # no click -> 1
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": [r[1] for r in rows],
        "ts": pa.array([ts(r[2]) for r in rows], pa.timestamp("us")),
    })
    import pyarrow.parquet as pq
    import tempfile, os
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = {r["user_id"]: r["funnel_stage"]
           for r in users_funnel(d).take_all()}
    assert got == {1: 3, 2: 1, 3: 2, 4: 0, 5: 1}


def test_unigram_logprob_hand_and_paths(ray_session):
    """LM quality score on a hand-computable corpus: repeated tokens
    weight the mean, zero-token docs vanish, and the broadcast /
    hash-join paths agree exactly."""
    import math

    from easyner_ray.ops.textstats import unigram_logprob

    # corpus tokens: a a a b (total 4) -> p(a)=3/4, p(b)=1/4
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["a a b", "a", "???"],   # doc3 tokenizes to nothing
    })
    exp1 = round((2 * math.log(3 / 4) + math.log(1 / 4)) / 3, 4)
    exp2 = round(math.log(3 / 4), 4)
    for bmax in (256 << 20, 0):
        got = {r["doc_id"]: (r["n_tokens"], r["logprob"])
               for r in unigram_logprob(_ds(t),
                                        broadcast_max_bytes=bmax).take_all()}
        assert got == {1: (3, exp1), 2: (1, exp2)}, bmax
