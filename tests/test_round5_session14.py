"""Round-5 session-14 operators: grouped lag-k autocorrelation, the
distributed Naive Bayes label-recovery classifier, hard-negative mining,
and greedy k-center coreset selection — closed-form / hand-computed
fixtures plus the degenerate edges (constant series, single-label
corpus, k > n)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _acf_map(ds):
    rows = ds.take_all()
    return {(r.get("g", None), r["lag_k"]): r["acf"] for r in rows}


class TestGroupedAutocorr:
    def test_matches_numpy_corrcoef(self, ray_session):
        from easyner_ray.ops.analytic import grouped_autocorr

        x = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * len(x), "o": list(range(len(x))), "v": x}))
        got = _acf_map(grouped_autocorr(ds, ["g"], ["o"], "v",
                                        lags=(1, 2, 3)))
        arr = np.array(x)
        for k in (1, 2, 3):
            want = round(float(np.corrcoef(arr[:-k], arr[k:])[0, 1]), 4)
            assert got[("a", k)] == pytest.approx(want, abs=1e-9), k

    def test_constant_series_is_null_and_short_series_has_no_row(
            self, ray_session):
        from easyner_ray.ops.analytic import grouped_autocorr

        ds = rd.from_arrow(pa.table({
            "g": ["c"] * 4 + ["s"] * 2,
            "o": [0, 1, 2, 3, 0, 1],
            "v": [7.0, 7.0, 7.0, 7.0, 1.0, 2.0]}))
        got = _acf_map(grouped_autocorr(ds, ["g"], ["o"], "v", lags=(1, 3)))
        # constant series: integer power sums are exact -> variance is
        # exactly 0 -> NULL (DuckDB corr semantics), never a residue
        assert got[("c", 1)] is None
        # 2-row series at lag 1: one pair -> row present, corr undefined
        assert got[("s", 1)] is None
        # lag 3 on the 2-row series: zero pairs -> NO row
        assert ("s", 3) not in got
        # lag 3 on the 4-row series: exactly one pair -> NULL
        assert got[("c", 3)] is None

    def test_groups_do_not_bleed_across_boundary(self, ray_session):
        from easyner_ray.ops.analytic import grouped_autocorr

        # two groups, each perfectly increasing: lag-1 acf = 1.0 in both;
        # a cross-group pair would break the perfect correlation
        ds = rd.from_arrow(pa.table({
            "g": ["a", "a", "a", "b", "b", "b"],
            "o": [0, 1, 2, 0, 1, 2],
            "v": [1.0, 2.0, 3.0, 30.0, 20.0, 10.0]}))
        got = _acf_map(grouped_autocorr(ds, ["g"], ["o"], "v", lags=(1,)))
        assert got[("a", 1)] == 1.0
        assert got[("b", 1)] == 1.0

    def test_rejects_nonpositive_lag(self, ray_session):
        from easyner_ray.ops.analytic import grouped_autocorr

        with pytest.raises(ValueError):
            grouped_autocorr(rd.from_items([{"g": 1, "o": 1, "v": 1.0}]),
                             ["g"], ["o"], "v", lags=(0,))


class TestNaiveBayes:
    def test_recovers_separable_labels(self, ray_session):
        from easyner_ray.ops.classify import naive_bayes_predict

        docs = rd.from_arrow(pa.table({
            "doc_id": list(range(6)),
            "source": ["cats", "cats", "cats", "dogs", "dogs", "dogs"],
            "text": ["meow purr whiskers", "purr meow meow",
                     "whiskers purr nap", "woof bark fetch",
                     "bark woof woof", "fetch bark tail"]}))
        out = {r["doc_id"]: r for r in
               naive_bayes_predict(docs, vocab_size=32).take_all()}
        assert len(out) == 6
        for i in range(6):
            assert out[i]["pred_source"] == out[i]["source"], i
            assert out[i]["score"] < 0  # log posterior

    def test_empty_text_scores_prior_with_lex_tiebreak(self, ray_session):
        from easyner_ray.ops.classify import naive_bayes_predict

        # the empty doc has no features; equal priors -> rounded scores
        # tie across classes -> lexicographically smallest class wins
        docs = rd.from_arrow(pa.table({
            "doc_id": [0, 1, 2],
            "source": ["zeta", "alpha", "zeta"],
            "text": ["zig zag", "apple ant", ""]}))
        out = {r["doc_id"]: r for r in
               naive_bayes_predict(docs, vocab_size=8).take_all()}
        # priors: zeta 2/3, alpha 1/3 -> empty doc takes the larger prior
        assert out[2]["pred_source"] == "zeta"
        assert out[2]["score"] == round(float(np.log(2 / 3)), 4)


class TestHardNegatives:
    def test_hand_fixture(self, ray_session):
        from easyner_ray.ops.similarity import hard_negatives

        # axis-aligned vectors: 0,1 share label A; 2,3 label B.
        # id0=(1,0); id2=(1,0.1)/|.| is its closest cross-label vector.
        emb = rd.from_arrow(pa.table({
            "vec_id": [0, 1, 2, 3],
            "label": pa.array([0, 0, 1, 1], pa.int32()),
            "embedding": pa.array(
                [[1.0, 0.0], [0.0, 1.0], [1.0, 0.1], [0.1, 1.0]],
                pa.list_(pa.float32()))}))
        got = {r["vec_id"]: r for r in hard_negatives(emb).take_all()}
        assert got[0]["neg_id"] == 2 and got[0]["neg_label"] == 1
        assert got[1]["neg_id"] == 3
        assert got[2]["neg_id"] == 0
        assert got[3]["neg_id"] == 1
        assert all(r["label"] != r["neg_label"] for r in got.values())

    def test_single_label_corpus_emits_nothing(self, ray_session):
        from easyner_ray.ops.similarity import hard_negatives

        emb = rd.from_arrow(pa.table({
            "vec_id": [0, 1],
            "label": pa.array([5, 5], pa.int32()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                  pa.list_(pa.float32()))}))
        assert hard_negatives(emb).count() == 0


class TestKCenter:
    def test_line_fixture_selection_order(self, ray_session):
        from easyner_ray.ops.similarity import kcenter_select

        # points on a line at 0, 1, 10: seed = min id (x=0), then the
        # farthest point (x=10, d^2=100), then x=1 (d^2=1 to center 0)
        emb = rd.from_arrow(pa.table({
            "vec_id": [0, 1, 2],
            "embedding": pa.array([[0.0], [1.0], [10.0]],
                                  pa.list_(pa.float32()))}))
        rows = kcenter_select(emb, k=3).sort("rank").take_all()
        assert [(r["rank"], r["vec_id"], r["dist"]) for r in rows] == [
            (1, 0, 0.0), (2, 2, 100.0), (3, 1, 1.0)]

    def test_k_exceeding_n_selects_all(self, ray_session):
        from easyner_ray.ops.similarity import kcenter_select

        emb = rd.from_arrow(pa.table({
            "vec_id": [4, 7],
            "embedding": pa.array([[0.0, 0.0], [3.0, 4.0]],
                                  pa.list_(pa.float32()))}))
        rows = kcenter_select(emb, k=10).sort("rank").take_all()
        assert [(r["vec_id"], r["dist"]) for r in rows] == [(4, 0.0),
                                                            (7, 25.0)]

    def test_covering_radius_is_nonincreasing(self, ray_session):
        from easyner_ray.ops.similarity import kcenter_select

        rng = np.random.RandomState(3)
        emb = rd.from_arrow(pa.table({
            "vec_id": list(range(40)),
            "embedding": pa.array(rng.randn(40, 8).tolist(),
                                  pa.list_(pa.float32()))}))
        rows = kcenter_select(emb, k=8).sort("rank").take_all()
        d = [r["dist"] for r in rows][1:]  # seed's 0.0 excluded
        assert all(a >= b for a, b in zip(d, d[1:]))
        assert len({r["vec_id"] for r in rows}) == 8


class TestSharedUpstreamMemoization:
    """The session-14 shared-upstream caches (_kg_edges_fused, _mentions,
    _kg_sentence_triples, _assembled_convs) must key on the CORPUS, not
    just the process: switching sf_dir must yield that corpus' own
    result, never a stale hit."""

    def test_fused_edges_cache_keys_on_corpus(self, ray_session, tmp_path):
        import os

        import easyner_ray.pipelines.queries as q
        from easyner_ray.sources.synthetic import ensure_corpus

        os.environ.setdefault("EASYNER_SYNTH_ROOT", "/tmp/easyner_synth")
        # two corpora of different sizes through the same memoized entry
        sf_a, sf_b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
        ea = q._kg_edges_fused(sf_a).count()
        eb = q._kg_edges_fused(sf_b).count()
        ea2 = q._kg_edges_fused(sf_a).count()
        assert ea == ea2
        assert eb != ea  # different corpus -> different edge table

    def test_fused_edges_match_componentized_chain(self, ray_session):
        """kg_edges now serves the fused single-pass table; it must stay
        value-identical to the componentized aggregate_edges chain."""
        import pandas as pd

        import easyner_ray.pipelines.queries as q
        from easyner_ray.sources.vocab import vocabulary
        from easyner_ray.stages.canonicalize import (aggregate_edges,
                                                     cls_of_norm_map)
        from easyner_ray.stages.dict_ner import tag_mentions
        from easyner_ray.stages.triples import sentence_triples

        sf = "/root/testdata/sf0.001"
        fused = q.kg_edges(sf).to_pandas()
        voc = vocabulary()
        staged = aggregate_edges(
            sentence_triples(tag_mentions(q._sentences(sf), voc)),
            cls_of_norm=cls_of_norm_map([voc])).to_pandas()

        def canon(df):
            df = df[sorted(df.columns)]
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        pd.testing.assert_frame_equal(canon(fused), canon(staged))


class TestMarkovStationary:
    def test_absorbing_chain(self, ray_session, tmp_path):
        """A -> B, B -> B: the stationary distribution collapses onto the
        absorbing state regardless of the uniform start."""
        import datetime as dt
        import os

        import pyarrow.parquet as pq

        import easyner_ray.pipelines.queries as q

        rows = [(1, dt.datetime(2025, 1, 1, 0, i), i, t)
                for i, t in enumerate(["A", "B", "B", "B"])]
        tbl = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        })
        d = tmp_path / "sfmk"
        d.mkdir()
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r["stationary_p"]
               for r in q.events_markov_stationary(str(d)).take_all()}
        assert out == {"A": 0.0, "B": 1.0}


class TestTheilSen:
    def test_linear_series_exact_slope(self, ray_session):
        from easyner_ray.ops.analytic import grouped_theil_sen

        # y = 3x + 1: every pairwise slope is exactly 3
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 5, "x": [0.0, 1.0, 2.0, 3.0, 4.0],
            "y": [1.0, 4.0, 7.0, 10.0, 13.0]}))
        rows = grouped_theil_sen(ds, ["g"], "x", "y").take_all()
        assert rows == [{"g": "a", "n_pairs": 10, "trend": 3.0}]

    def test_outlier_robustness_vs_ols(self, ray_session):
        from easyner_ray.ops.analytic import grouped_theil_sen

        # linear slope 2 with ONE wild outlier AT THE ENDPOINT (max
        # leverage): the median of pairwise slopes stays near 2 while
        # the OLS fit is dragged far off
        x = list(range(11))
        y = [2.0 * v for v in x]
        y[10] = 1000.0
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 11, "x": [float(v) for v in x], "y": y}))
        rows = grouped_theil_sen(ds, ["g"], "x", "y").take_all()
        assert abs(rows[0]["trend"] - 2.0) < 0.5
        ols = float(np.polyfit(np.array(x, float), np.array(y), 1)[0])
        assert abs(ols - 2.0) > 5  # OLS IS dragged; Theil-Sen is not

    def test_short_and_equal_x_groups_emit_nothing(self, ray_session):
        from easyner_ray.ops.analytic import grouped_theil_sen

        ds = rd.from_arrow(pa.table({
            "g": ["one", "dup", "dup"],
            "x": [1.0, 5.0, 5.0],  # single row / all-equal x
            "y": [9.0, 1.0, 2.0]}))
        assert grouped_theil_sen(ds, ["g"], "x", "y").count() == 0


class TestGlobalRowNumber:
    def test_dense_rank_across_many_blocks(self, ray_session):
        from easyner_ray.ops.relational import global_row_number

        n = 10_000
        rng = np.random.RandomState(7)
        vals = rng.permutation(n)
        ds = rd.from_arrow(pa.table({
            "id": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(vals, pa.int64())})).repartition(8)
        out = global_row_number(ds, ["v", "id"]).take_all()
        assert len(out) == n
        got = sorted((r["rank"], r["v"]) for r in out)
        # rank i must hold the i-th smallest v (v is a permutation)
        assert [g[0] for g in got] == list(range(1, n + 1))
        assert [g[1] for g in got] == sorted(vals.tolist())

    def test_descending_and_custom_column(self, ray_session):
        from easyner_ray.ops.relational import global_row_number

        ds = rd.from_arrow(pa.table({
            "id": [1, 2, 3], "v": [10, 30, 20]}))
        out = {r["id"]: r["pos"] for r in global_row_number(
            ds, ["v", "id"], descending=[True, False],
            out_col="pos").take_all()}
        assert out == {2: 1, 3: 2, 1: 3}


class TestTripletMining:
    def test_hand_fixture(self, ray_session):
        from easyner_ray.ops.similarity import triplet_mining

        # two labels, two members each: pos = the other same-label
        # vector, neg = the most-similar cross-label vector
        emb = rd.from_arrow(pa.table({
            "vec_id": [0, 1, 2, 3],
            "label": pa.array([0, 0, 1, 1], pa.int32()),
            "embedding": pa.array(
                [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9]],
                pa.list_(pa.float32()))}))
        got = {r["vec_id"]: r for r in triplet_mining(emb).take_all()}
        assert got[0]["pos_id"] == 1 and got[1]["pos_id"] == 0
        assert got[2]["pos_id"] == 3 and got[3]["pos_id"] == 2
        # 0's hardest negative is 3 ([0.1, 0.9] leans less orthogonal)
        assert got[0]["neg_id"] == 3
        for r in got.values():
            assert r["pos_id"] != r["vec_id"]

    def test_singleton_label_emits_nothing(self, ray_session):
        from easyner_ray.ops.similarity import triplet_mining

        emb = rd.from_arrow(pa.table({
            "vec_id": [0, 1],
            "label": pa.array([0, 1], pa.int32()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                  pa.list_(pa.float32()))}))
        # every label is a singleton: no positive exists anywhere
        assert triplet_mining(emb).count() == 0


class TestKSDrift:
    def test_identical_and_disjoint_distributions(self, ray_session):
        from easyner_ray.ops.sketch import grouped_ks_vs_global

        # group "same" IS half the global mass with the same shape;
        # group "far" is fully shifted -> its KS vs global must be large
        vals_a = [1.0, 2.0, 3.0, 4.0] * 5
        vals_b = [101.0, 102.0, 103.0, 104.0] * 5
        ds = rd.from_arrow(pa.table({
            "g": ["same"] * 20 + ["far"] * 20,
            "v": vals_a + vals_b}))
        got = {r["g"]: r["ks"] for r in
               grouped_ks_vs_global(ds, "g", "v").take_all()}
        # each group holds half the mass: F_same(4)=1 vs F_global(4)=0.5
        assert got["same"] == 0.5 and got["far"] == 0.5
        # one group == the whole corpus -> drift exactly 0
        ds1 = rd.from_arrow(pa.table({"g": ["only"] * 20,
                                      "v": vals_a}))
        got1 = grouped_ks_vs_global(ds1, "g", "v").take_all()
        assert got1 == [{"g": "only", "ks": 0.0}]

    def test_matches_scipy_formula(self, ray_session):
        from easyner_ray.ops.sketch import grouped_ks_vs_global

        rng = np.random.RandomState(5)
        a = rng.randn(300)
        b = rng.randn(200) + 0.5
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 300 + ["b"] * 200,
            "v": np.concatenate([a, b])}))
        got = {r["g"]: r["ks"] for r in
               grouped_ks_vs_global(ds, "g", "v").take_all()}

        # straight-line ECDF sup-diff vs the pooled sample
        allv = np.sort(np.concatenate([a, b]))
        for name, sample in (("a", a), ("b", b)):
            fs = np.searchsorted(np.sort(sample), allv,
                                 side="right") / len(sample)
            fg = np.searchsorted(allv, allv, side="right") / len(allv)
            want = round(float(np.abs(fs - fg).max()), 4)
            assert got[name] == want, name
