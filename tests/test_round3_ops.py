"""Round-3 operator tests: per-group top-k, deterministic hash sampling,
anti join, interval (range) join, exact distributed quantiles, count-min
sketch, TF-IDF. Each is checked against an independent straight-line
recompute (pandas / numpy / scalar Python) plus a partition-invariance
assertion where the op has a distributed merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table, parts: int = 1):
    import ray.data as rd

    d = rd.from_arrow(tbl)
    return d.repartition(parts) if parts > 1 else d


# ------------------------------------------------------- topk_per_group ---


def _rand_events(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "g": pa.array(np.array(["a", "b", "c", "d"])[
            rng.integers(0, 4, n)].tolist(), pa.string()),
        "v": pa.array(rng.integers(0, 300, n).astype(np.float64) / 7.0),
        "id": pa.array(np.arange(n, dtype=np.int64)),
    })


def _topk_pandas(df, k=5):
    df = df.sort_values(["g", "v", "id"], ascending=[True, False, True])
    df["rn"] = df.groupby("g").cumcount() + 1
    return df[df["rn"] <= k].reset_index(drop=True)


def test_topk_matches_pandas(ray_session):
    from easyner_ray.ops.relational import topk_per_group

    t = _rand_events()
    want = _topk_pandas(t.to_pandas())
    got = (topk_per_group(_ds(t, 7), ["g"], "v", 5, tie_cols=["id"])
           .to_pandas().sort_values(["g", "rn"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["g", "v", "id", "rn"]],
        want[["g", "v", "id", "rn"]].sort_values(["g", "rn"]
                                                 ).reset_index(drop=True))


def test_topk_partition_invariance(ray_session):
    from easyner_ray.ops.relational import topk_per_group

    t = _rand_events(seed=9)
    a = (topk_per_group(_ds(t, 1), ["g"], "v", 3, tie_cols=["id"])
         .to_pandas().sort_values(["g", "rn"]).reset_index(drop=True))
    b = (topk_per_group(_ds(t, 11), ["g"], "v", 3, tie_cols=["id"])
         .to_pandas().sort_values(["g", "rn"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_topk_hot_group_and_k_larger_than_group(ray_session):
    from easyner_ray.ops.relational import topk_per_group

    # one group holds 99% of rows; another has fewer rows than k
    n = 2000
    t = pa.table({
        "g": pa.array(["hot"] * (n - 2) + ["cold", "cold"], pa.string()),
        "v": pa.array(np.arange(n, dtype=np.float64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
    })
    out = (topk_per_group(_ds(t, 5), ["g"], "v", 4, tie_cols=["id"])
           .to_pandas().sort_values(["g", "rn"]).reset_index(drop=True))
    assert out[out.g == "cold"].shape[0] == 2          # short group survives
    hot = out[out.g == "hot"]
    assert hot["v"].tolist() == [float(n - 3 - i) for i in range(4)]


# ---------------------------------------------------------- hash_sample ---


def test_hash_sample_matches_formula_and_partitioning(ray_session):
    from easyner_ray.ops.relational import hash_sample

    keys = np.arange(20_000, dtype=np.int64)
    t = pa.table({"k": pa.array(keys), "x": pa.array(keys * 2)})
    h = (keys.astype(np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    want = keys[h < np.uint64(int(0.1 * (1 << 32)))]
    got = np.sort(hash_sample(_ds(t, 9), "k", 0.1)
                  .to_pandas()["k"].to_numpy())
    assert np.array_equal(got, want)
    # a plausible Bernoulli rate, not a degenerate subset
    assert 0.08 < len(want) / len(keys) < 0.12


# ------------------------------------------------------------ anti_join ---


def test_anti_join_matches_set_difference(ray_session):
    from easyner_ray.ops.relational import anti_join

    left = pa.table({"k": pa.array(np.arange(1000, dtype=np.int64)),
                     "p": pa.array(np.arange(1000, dtype=np.int64) * 3)})
    # right has duplicates + keys outside left's range
    rk = np.concatenate([np.arange(0, 1000, 2), np.arange(0, 1000, 2), [5000]])
    right = pa.table({"rk": pa.array(rk.astype(np.int64))})
    out = anti_join(_ds(left, 4), _ds(right, 3), on="k", right_on="rk",
                    num_partitions=2)  # 4-CPU test session: few aggregators
    got = np.sort(out.to_pandas()["k"].to_numpy())
    assert np.array_equal(got, np.arange(1, 1000, 2))


def test_anti_join_empty_result_keeps_schema(ray_session):
    from easyner_ray.ops.relational import anti_join

    left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "p": pa.array(["a", "b", "c"], pa.string())})
    right = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64())})
    out = anti_join(_ds(left), _ds(right), on="k", num_partitions=2)
    # Ray's join can emit ZERO blocks; the unioned empty block keeps the
    # Dataset schema intact (to_pandas on a 0-row Dataset still drops
    # columns — a Ray conversion quirk, so assert on schema())
    assert len(out.to_pandas()) == 0
    assert out.schema().names == ["k", "p"]


# -------------------------------------------------------- interval_join ---


def test_interval_join_vs_bruteforce(ray_session):
    from easyner_ray.ops.asof import interval_join

    rng = np.random.default_rng(5)
    day_us = 86_400_000_000
    ts = rng.integers(0, 30 * day_us, size=4000).astype(np.int64)
    left = pa.table({
        "id": pa.array(np.arange(4000, dtype=np.int64)),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
    })
    # intervals: varied spans, some crossing bucket (day) boundaries,
    # one exactly bucket-aligned, one zero-length
    starts = np.array([0, day_us - 1, 3 * day_us, int(5.5 * day_us),
                       10 * day_us, 29 * day_us], dtype=np.int64)
    ends = starts + np.array([day_us // 2, 2, 4 * day_us, day_us,
                              0, 5 * day_us], dtype=np.int64)
    iv = pa.table({
        "iid": pa.array(np.arange(6, dtype=np.int64)),
        "t_start": pa.array(starts, pa.int64()).cast(pa.timestamp("us")),
        "t_end": pa.array(ends, pa.int64()).cast(pa.timestamp("us")),
    })
    out = interval_join(_ds(left, 6), iv, ts="ts", left_cols=["id"],
                        interval_cols=["iid"])
    got = set(map(tuple, out.to_pandas()[["id", "iid"]].to_numpy()))
    want = {(int(i), int(j)) for i in range(4000) for j in range(6)
            if starts[j] <= ts[i] <= ends[j]}
    assert got == want


def test_interval_join_inclusive_endpoints(ray_session):
    from easyner_ray.ops.asof import interval_join

    left = pa.table({
        "id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([100, 200, 201], pa.int64()).cast(pa.timestamp("us")),
    })
    iv = pa.table({
        "iid": pa.array([7], pa.int64()),
        "t_start": pa.array([100], pa.int64()).cast(pa.timestamp("us")),
        "t_end": pa.array([200], pa.int64()).cast(pa.timestamp("us")),
    })
    out = interval_join(_ds(left), iv, ts="ts", left_cols=["id"],
                        interval_cols=["iid"]).to_pandas()
    assert sorted(out["id"].tolist()) == [0, 1]  # BETWEEN: both ends in


# ------------------------------------------------------ exact_quantiles ---


def _rank_value(vals: np.ndarray, q: float) -> float:
    s = np.sort(vals)
    return float(s[max(1, int(np.ceil(q * len(s)))) - 1])


def test_exact_quantiles_match_numpy_and_duckdb(ray_session):
    import duckdb

    from easyner_ray.ops.sketch import exact_quantiles

    rng = np.random.default_rng(13)
    vals = rng.normal(50.0, 12.0, size=30_000)
    t = pa.table({"v": pa.array(vals, pa.float64())})
    got = exact_quantiles(_ds(t, 8), "v", [0.5, 0.9, 0.99])
    for q in (0.5, 0.9, 0.99):
        assert got[q] == _rank_value(vals, q), q
    ref = duckdb.sql(
        "SELECT quantile_disc(v, 0.5), quantile_disc(v, 0.9), "
        "quantile_disc(v, 0.99) FROM t",
    ).fetchone()
    assert (got[0.5], got[0.9], got[0.99]) == ref


def test_exact_quantiles_refinement_and_ties(ray_session):
    """A tiny collect_cap forces multi-level histogram refinement; heavy
    ties exercise the frozen-bin path."""
    from easyner_ray.ops.sketch import exact_quantiles

    rng = np.random.default_rng(17)
    vals = np.concatenate([
        rng.uniform(0, 1, 20_000),
        np.full(15_000, 0.5),          # a dominant tie right at the median
        np.full(5, 42.0),              # far outlier stretches the range
    ])
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(vals, pa.float64())})
    got = exact_quantiles(_ds(t, 6), "v", [0.25, 0.5, 0.75],
                          n_bins=64, collect_cap=500, max_depth=6)
    for q in (0.25, 0.5, 0.75):
        assert got[q] == _rank_value(vals, q), q


def test_exact_quantiles_constant_and_empty(ray_session):
    from easyner_ray.ops.sketch import exact_quantiles

    const = pa.table({"v": pa.array(np.full(100, 3.25))})
    assert exact_quantiles(_ds(const), "v", [0.5])[0.5] == 3.25
    empty = pa.table({"v": pa.array([], pa.float64())})
    assert exact_quantiles(_ds(empty), "v", [0.5])[0.5] is None


# ----------------------------------------------------------- count-min ---


def test_cms_matches_gold_and_overestimates(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from easyner_ray.ops.sketch import cms_counts
    from easyner_ray.sources.gold_derived import write_cms_gold

    rng = np.random.default_rng(23)
    uids = rng.zipf(1.3, size=30_000).astype(np.int64) % 500
    events = pa.table({"user_id": pa.array(uids)})
    ev_path = str(tmp_path / "events.parquet")
    pq.write_table(events, ev_path)

    gold = pq.read_table(
        write_cms_gold(str(tmp_path), ev_path)).to_pandas()
    got = (cms_counts(_ds(events, 9), "user_id", list(range(64)))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # distributed build (9 partitions) is bit-identical to the scalar
    # single-pass gold: addition merge is order-independent
    assert got["user_id"].tolist() == gold["user_id"].tolist()
    assert got["est_count"].tolist() == gold["est_count"].tolist()
    # CMS never under-counts
    exact = pd.Series(uids).value_counts()
    for k, est in zip(got["user_id"], got["est_count"]):
        assert est >= int(exact.get(k, 0))


# -------------------------------------------------------------- TF-IDF ---


def test_tfidf_matches_straightline(ray_session):
    import math
    from collections import Counter

    from easyner_ray.ops.textstats import tfidf

    docs = [
        (0, "the quick brown fox JUMPS over the lazy dog"),
        (1, "the quick red fox; the dog sleeps!"),
        (2, "Pack my box with five dozen liquor jugs 42 times"),
        (3, "dog dog dog quick"),
        (4, ""),
    ]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([s for _, s in docs], pa.string())})

    import re
    tok = re.compile(r"[a-z0-9]+")
    tf = {(d, w): c for d, s in docs
          for w, c in Counter(tok.findall(s.lower())).items()}
    df = Counter(w for _, w in tf)
    n = len(docs)
    want = {(d, w): (c, df[w], round(c * math.log(n / df[w]), 4))
            for (d, w), c in tf.items() if df[w] >= 2}

    out = tfidf(_ds(t, 3)).to_pandas()
    got = {(int(r.doc_id), r.term): (int(r.tf), int(r.df), r.tfidf)
           for r in out.itertuples()}
    assert got == want


# ----------------------------------------------- grouped quantiles ---


def test_grouped_quantiles_match_numpy(ray_session):
    from easyner_ray.ops.sketch import grouped_quantiles

    rng = np.random.default_rng(29)
    n = 20_000
    g = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    v = rng.gamma(2.0, 10.0, n)
    t = pa.table({"g": pa.array(g.tolist(), pa.string()),
                  "v": pa.array(v, pa.float64())})
    out = grouped_quantiles(_ds(t, 7), "v", [0.5, 0.9], by="g")
    got = {(r["g"], r["q"]): r["value"] for r in out.to_pylist()}
    for gk in ("x", "y", "z"):
        mine = v[g == gk]
        for q in (0.5, 0.9):
            assert got[(gk, q)] == _rank_value(mine, q), (gk, q)


def test_grouped_quantiles_small_groups_collect_direct(ray_session):
    """Groups under collect_cap skip refinement entirely."""
    from easyner_ray.ops.sketch import grouped_quantiles

    t = pa.table({"g": pa.array(["a"] * 10 + ["b"] * 3, pa.string()),
                  "v": pa.array(np.arange(13, dtype=np.float64))})
    out = grouped_quantiles(_ds(t, 2), "v", [0.5], by="g")
    got = {(r["g"], r["q"]): r["value"] for r in out.to_pylist()}
    assert got[("a", 0.5)] == 4.0     # rank ceil(0.5*10)=5 -> value 4
    assert got[("b", 0.5)] == 11.0    # rank ceil(0.5*3)=2 -> value 11


# ----------------------------------------------------- bloom filter ---


def test_bloom_no_false_negatives_and_fp_bound(ray_session):
    from easyner_ray.ops.sketch import bloom_build, bloom_filter_rows

    members = np.arange(0, 50_000, 7, dtype=np.int64)       # ~7.1k keys
    probes = np.arange(50_000, dtype=np.int64)
    bloom = bloom_build(
        _ds(pa.table({"k": pa.array(members)}), 5), "k", n_bits=1 << 17)
    out = bloom_filter_rows(
        _ds(pa.table({"k": pa.array(probes)}), 4), "k", bloom)
    kept = set(out.to_pandas()["k"].tolist())
    assert set(members.tolist()) <= kept          # never a false negative
    fp = (len(kept) - len(members)) / (len(probes) - len(members))
    assert fp < 0.05, fp        # ~1.8 bits/elem... generous bound for 17 bits


def test_bloom_or_merge_partition_invariance(ray_session):
    from easyner_ray.ops.sketch import bloom_build

    keys = pa.table({"k": pa.array(np.arange(5_000, dtype=np.int64))})
    assert bloom_build(_ds(keys, 1), "k") == bloom_build(_ds(keys, 13), "k")


# -------------------------------------------- vector centroids / kmeans ---


def _emb_table(n=3000, d=16, n_labels=5, seed=31):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, n_labels, n).astype(np.int32)),
    }), vecs


def test_label_centroids_match_numpy(ray_session):
    from easyner_ray.ops.similarity import label_centroids

    t, vecs = _emb_table()
    labels = np.asarray(t.column("label"))
    out = label_centroids(_ds(t, 7)).to_pandas()
    for lb in np.unique(labels):
        want = vecs[labels == lb].astype(np.float64).mean(axis=0)
        mine = out[out.label == lb].sort_values("dim")["centroid"].to_numpy()
        assert np.allclose(mine, want, atol=5e-5)  # rounded to 4 decimals


def test_kmeans_matches_straightline_numpy(ray_session):
    from easyner_ray.ops.similarity import kmeans

    t, vecs = _emb_table(n=1200, d=8, seed=37)
    m = vecs.astype(np.float64)

    # straight-line Lloyd with the same init (k lowest vec_ids) and the
    # same argmin tie-break
    k, iters = 6, 4
    cents = m[:k].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                cents[c] = m[a == c].mean(axis=0)
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    want_assign = np.argmin(d2, axis=1)

    got_c, got_ds = kmeans(_ds(t, 5), k=k, iters=iters)
    got = got_ds.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    assert np.allclose(got_c, cents, atol=1e-8)
    assert np.array_equal(got, want_assign)


def test_kmeans_partition_invariant_assignments(ray_session):
    from easyner_ray.ops.similarity import kmeans

    t, _ = _emb_table(n=800, d=8, seed=41)
    c1, a1 = kmeans(_ds(t, 1), k=4, iters=3)
    c2, a2 = kmeans(_ds(t, 9), k=4, iters=3)
    # float partial-sum merge order differs across layouts; centroids agree
    # to fp noise and assignments exactly (no boundary point at this scale)
    assert np.allclose(c1, c2, atol=1e-9)
    assert np.array_equal(
        a1.to_pandas().sort_values("vec_id")["cluster"].to_numpy(),
        a2.to_pandas().sort_values("vec_id")["cluster"].to_numpy())


# ------------------------------------------------------- null handling ---


def test_null_keys_across_ops(ray_session):
    """Nulls must not poison vectorized hashing/bucketing: an Arrow int64
    array WITH nulls converts to float64/NaN in numpy, so every op either
    fills-then-masks or drops nulls BEFORE the conversion."""
    from easyner_ray.ops.asof import interval_join
    from easyner_ray.ops.relational import hash_sample, topk_per_group
    from easyner_ray.ops.sketch import bloom_build, bloom_filter_rows

    # hash_sample: null keys excluded, non-null rows unaffected
    keys = list(range(1000)) + [None] * 50
    t = pa.table({"k": pa.array(keys, pa.int64())})
    got = hash_sample(_ds(t, 3), "k", 0.2).to_pandas()["k"]
    assert not got.isna().any()
    h = (np.arange(1000).astype(np.uint64) * np.uint64(2654435761)) \
        & np.uint64(0xFFFFFFFF)
    want = np.arange(1000)[h < np.uint64(int(0.2 * (1 << 32)))]
    assert np.array_equal(np.sort(got.to_numpy()), want)

    # bloom probe: null is a non-member; true members all survive
    members = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    bloom = bloom_build(_ds(members), "k", n_bits=1 << 12)
    probes = pa.table({"k": pa.array([1, 2, 3, None, 99], pa.int64())})
    kept = bloom_filter_rows(_ds(probes), "k", bloom).to_pandas()["k"]
    assert not kept.isna().any()
    assert {1, 2, 3} <= set(kept.dropna().astype(int).tolist())

    # topk: NULL group keys form ONE partition (SQL semantics)
    t = pa.table({
        "g": pa.array(["a", "a", None, None, None], pa.string()),
        "v": pa.array([5.0, 1.0, 9.0, 8.0, 7.0]),
        "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
    })
    out = topk_per_group(_ds(t), ["g"], "v", 2, tie_cols=["id"]).to_pandas()
    nulls = out[out.g.isna()]
    assert len(nulls) == 2 and sorted(nulls["v"].tolist()) == [8.0, 9.0]
    assert sorted(nulls["rn"].tolist()) == [1, 2]

    # interval_join: NULL ts matches nothing, other rows unaffected
    left = pa.table({
        "id": pa.array([0, 1], pa.int64()),
        "ts": pa.array([100, None], pa.int64()).cast(pa.timestamp("us")),
    })
    iv = pa.table({
        "iid": pa.array([7], pa.int64()),
        "t_start": pa.array([50], pa.int64()).cast(pa.timestamp("us")),
        "t_end": pa.array([150], pa.int64()).cast(pa.timestamp("us")),
    })
    out = interval_join(_ds(left), iv, ts="ts", left_cols=["id"],
                        interval_cols=["iid"]).to_pandas()
    assert out["id"].tolist() == [0]


def test_semi_anti_join_empty_right_side(ray_session):
    """Ray's hash join raises on an EMPTY right side — the normal case
    for dedup filters (no duplicates found). hash_join shortcuts it."""
    from easyner_ray.ops.relational import hash_join

    left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "x": pa.array(["a", "b", "c"], pa.string())})
    empty = pa.table({"k": pa.array([], pa.int64())})
    anti = hash_join(_ds(left), _ds(empty), on="k", join_type="left_anti")
    assert sorted(anti.to_pandas()["k"].tolist()) == [1, 2, 3]
    semi = hash_join(_ds(left), _ds(empty), on="k", join_type="left_semi")
    assert semi.count() == 0 and semi.schema().names == ["k", "x"]


def test_curation_dedup_steps_with_no_duplicates(ray_session):
    """A corpus with nothing to dedup must pass through unchanged."""
    import ray.data as rd

    from easyner_ray.pipelines.curate import STEPS

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta",
                          "one two three four five six seven",
                          "red orange yellow green blue indigo"], pa.string()),
    })
    out = STEPS["near_dup_filter"](
        STEPS["dedup_exact"](rd.from_arrow(t)), threshold=0.5)
    assert sorted(out.to_pandas()["doc_id"].tolist()) == [0, 1, 2]


def test_grouped_quantiles_nan_and_null_group(ray_session):
    from easyner_ray.ops.sketch import grouped_quantiles

    t = pa.table({
        "g": pa.array(["a", "a", "a", "a", None, None], pa.string()),
        "v": pa.array([1.0, 2.0, float("nan"), float("nan"), 5.0, 6.0]),
    })
    out = grouped_quantiles(_ds(t, 2), "v", [1.0], by="g")
    got = {r["g"]: r["value"] for r in out.to_pylist()}
    # NaNs excluded from BOTH the count and the candidates (no rank overrun)
    assert got["a"] == 2.0
    # NULL group key is its own group (SQL GROUP BY), not dropped
    assert got[None] == 6.0


def test_approx_distinct_ignores_null_values_and_keeps_null_group(ray_session):
    import ray.data as rd

    from easyner_ray.ops.sketch import approx_distinct

    t = pa.table({
        "g": pa.array(["x"] * 4 + [None] * 2, pa.string()),
        "u": pa.array([1, 2, None, None, 7, None], pa.int64()),
    })
    out = approx_distinct(rd.from_arrow(t), ["g"], "u", p=12)
    got = {r["g"]: r["approx_distinct"] for r in out.take_all()}
    assert got["x"] == 2          # nulls not counted as a value
    assert got[None] == 1         # NULL group key kept as its own group


def test_chunk_documents_matches_python_slicing(ray_session):
    from easyner_ray.ops.textstats import chunk_documents

    texts = ["a" * 250, "b" * 100, "c" * 5, "", "d" * 101, "e" * 20]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    size, overlap, step = 100, 20, 80
    out = chunk_documents(_ds(t, 3), size=size, overlap=overlap).to_pandas()
    got = {(r.doc_id, r.chunk_idx): r.chunk for r in out.itertuples()}
    want = {}
    for d, s in enumerate(texts):
        if not s:
            continue  # empty docs emit nothing
        n = max(1, -(-(len(s) - overlap) // step))
        for i in range(n):
            want[(d, i)] = s[i * step: i * step + size]
    assert got == want
    # overlap property: consecutive chunks share `overlap` chars
    assert got[(0, 0)][-overlap:] == got[(0, 1)][:overlap]
