"""Round-4 scale/robustness fixes:

- quantile heavy-tie short-circuit (no corpus-scale collect on a
  99%-constant column) + all-null groups keep a NULL row,
- approx_distinct keeps all-null groups with estimate 0,
- TF-IDF adaptive broadcast-vs-hash-join idf (both paths identical),
- kNN tree merge (rank-exact vs the straight-line numpy gold),
- asof_join tolerates NULL timestamps (unmatched, not ValueError),
- _task_fn cache keys never collide for plain (non-ObjectRef) state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


# ------------------------------------------------------------ quantiles ---


def test_exact_quantiles_heavy_tie_no_corpus_collect(ray_session):
    """99%-constant column: the rank lands in the constant's bin, which
    cannot narrow — the old code froze and collected the WHOLE bin
    (corpus-scale). The fix resolves from the candidate min==max, so the
    final collect stays under collect_cap even though the tied bin holds
    99k values."""
    from easyner_ray.ops import sketch

    rng = np.random.RandomState(7)
    vals = np.full(100_000, 42.0)
    spread = rng.uniform(0.0, 100.0, size=1000)
    vals[:1000] = spread  # 99% exactly 42.0
    ds = _ds(pa.table({"v": pa.array(vals, pa.float64())})).repartition(8)

    out = sketch.exact_quantiles(ds, "v", [0.25, 0.5, 0.9],
                                 collect_cap=100, max_depth=8)
    gold = {q: float(np.sort(vals)[int(np.ceil(q * len(vals))) - 1])
            for q in (0.25, 0.5, 0.9)}
    assert out == gold
    # the heavy-tie states resolved in-pass; anything still collected is
    # bounded by collect_cap per open state (3 states max)
    assert sketch._LAST_COLLECTED <= 3 * 100


def test_exact_quantiles_heavy_tie_resets_range(ray_session):
    """Two-value column where one value dominates: the no-narrow level
    must reset to the exact span and then split, not loop or collect the
    corpus."""
    from easyner_ray.ops import sketch

    vals = np.r_[np.full(50_000, 5.0), np.full(50_000, 5.0 + 1e-9),
                 np.array([0.0, 10.0])]
    ds = _ds(pa.table({"v": pa.array(vals, pa.float64())})).repartition(4)
    out = sketch.exact_quantiles(ds, "v", [0.5], collect_cap=200,
                                 max_depth=8)
    gold = float(np.sort(vals)[int(np.ceil(0.5 * len(vals))) - 1])
    assert out[0.5] == gold
    assert sketch._LAST_COLLECTED <= 200


def test_grouped_quantiles_all_null_group_kept(ray_session):
    """A group whose values are ALL null/NaN still appears, value NULL
    (SQL GROUP BY keeps the group)."""
    from easyner_ray.ops.sketch import grouped_quantiles

    t = pa.table({
        "g": pa.array(["a"] * 4 + ["b"] * 3 + ["c"] * 2),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, None, None, float("nan"),
                       10.0, 20.0], pa.float64()),
    })
    out = grouped_quantiles(_ds(t), "v", [0.5], "g")
    rows = {r["g"]: r["value"] for r in out.to_pylist()}
    assert rows["a"] == 2.0
    assert rows["b"] is None  # all-null group kept, NULL quantile
    assert rows["c"] == 10.0


def test_approx_distinct_all_null_group_is_zero(ray_session):
    from easyner_ray.ops.sketch import approx_distinct

    t = pa.table({
        "g": pa.array(["x"] * 3 + ["y"] * 2),
        "v": pa.array([1, 2, 2, None, None], pa.int64()),
    })
    out = {r["g"]: r["approx_distinct"]
           for r in approx_distinct(_ds(t), ["g"], "v").take_all()}
    assert out == {"x": 2, "y": 0}


# --------------------------------------------------------------- tfidf ---


def test_tfidf_join_path_matches_broadcast_path(ray_session):
    """broadcast_max_bytes=0 forces the open-vocabulary hash-join path;
    results must be row-for-row identical to the broadcast path."""
    import pandas as pd

    from easyner_ray.ops.textstats import tfidf

    docs = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(30)]),
        "text": pa.array([f"alpha beta gamma{i % 5} alpha" for i in range(30)]),
    })

    def run(cutoff):
        out = tfidf(_ds(docs), min_df=2, broadcast_max_bytes=cutoff).to_pandas()
        return (out.sort_values(["doc_id", "term"])
                .reset_index(drop=True))

    a, b = run(256 << 20), run(0)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0 and (a["df"] >= 2).all()


# ----------------------------------------------------------------- knn ---


def test_knn_tree_merge_rank_exact(ray_session):
    """Tree-merged kNN over many small blocks == straight-line numpy gold
    (the merge must be block-count-invariant)."""
    from easyner_ray.ops.similarity import knn_brute

    rng = np.random.RandomState(3)
    n, d = 500, 16
    mat = rng.randn(n, d)
    q = rng.randn(3, d)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    })
    # many blocks + tiny batch: the partial stream spans many cut inputs
    out = knn_brute(_ds(tbl).repartition(16), q, k=5,
                    batch_size=32).to_pandas()

    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    scores = qn @ mn.T
    for qi in range(3):
        order = np.lexsort((np.arange(n), -scores[qi]))[:5]
        got = out[out.query_id == qi].sort_values("rank")
        assert list(got.vec_id) == list(order)


def test_cut_topk_partials_matches_merge(ray_session):
    """cut(k) keeps exactly the rows _merge_topk would pick per query —
    same (-score, vec_id) tie-break."""
    from easyner_ray.ops.similarity import _cut_topk_partials, _merge_topk

    rng = np.random.RandomState(11)
    n = 300
    t = pa.table({
        "query_id": pa.array(rng.randint(0, 4, n), pa.int64()),
        "vec_id": pa.array(rng.randint(0, 50, n), pa.int64()),
        "score": pa.array(rng.choice([0.1, 0.5, 0.9], n), pa.float64()),
    })
    direct = _merge_topk(t, 3).to_pylist()
    via_cut = _merge_topk(_cut_topk_partials(t, 3), 3).to_pylist()
    assert direct == via_cut


# ---------------------------------------------------------------- asof ---


def test_asof_join_null_ts_unmatched_not_error(ray_session):
    from easyner_ray.ops.asof import asof_join

    left = pa.table({
        "k": pa.array(["a", "a", "b"]),
        "ts": pa.array([10, None, 30], pa.int64()),
        "lv": pa.array([1, 2, 3], pa.int64()),
    })
    right = pa.table({
        "k": pa.array(["a", "b", "b"]),
        "ts": pa.array([5, None, 25], pa.int64()),
        "rv": pa.array([100, 200, 300], pa.int64()),
    })
    out = asof_join(_ds(left), _ds(right), key="k", ts="ts",
                    left_cols=["lv"], right_cols=["rv"],
                    n_buckets=4).to_pandas()
    got = {(r.k, r.lv): (r.ts_r, r.rv_r) for r in out.itertuples()}
    # null-ts left row dropped; null-ts right row matches nothing
    assert got == {("a", 1): (5, 100), ("b", 3): (25, 300)}


# -------------------------------------------------------------- task_fn ---


def test_task_fn_plain_state_keys_never_collide():
    from easyner_ray.ops import similarity as S

    f1 = S._task_fn("t", (object(),), lambda: lambda b: ("first", b))
    f2 = S._task_fn("t", (object(),), lambda: lambda b: ("second", b))
    assert f1(1) == ("first", 1)
    assert f2(2) == ("second", 2)  # id()-reuse would have returned "first"


# ---------------------------------------------------------- media/kmeans ---


def test_ppm_decode_preserves_leading_whitespace_pixels():
    """PPM spec: exactly ONE whitespace byte after maxval — pixel data
    that itself starts with whitespace bytes must not be eaten."""
    from easyner_ray.ops.multimodal import StdlibCodec
    from easyner_ray.sources.gold_derived import _decode_media_spec

    payload = b"P6\n2 1\n255\n" + bytes([10, 32, 9, 1, 2, 3])
    eng = StdlibCodec().decode(payload, "image")
    gold = _decode_media_spec(payload)
    assert len(eng) == 2 and len(gold) == 2
    assert np.allclose(eng, gold)


def test_media_fixture_deterministic_and_decodable():
    from easyner_ray.ops.multimodal import StdlibCodec
    from easyner_ray.sources.media_fixture import synthetic_real_media

    a, b = synthetic_real_media(), synthetic_real_media()
    assert a.equals(b)
    codec = StdlibCodec()
    for i in range(len(a)):
        sig = codec.decode(a.column("payload")[i].as_py(),
                           a.column("kind")[i].as_py())
        assert len(sig) > 0 and sig.dtype == np.float32


def test_kmeans_round_digits_layout_invariant(ray_session):
    """Per-iteration centroid rounding makes assignments identical across
    block layouts (the property the driver-gold compare relies on)."""
    from easyner_ray.ops.similarity import kmeans

    rng = np.random.default_rng(23)
    vecs = rng.normal(0, 1, (600, 8)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(600, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    })
    _, a1 = kmeans(_ds(t).repartition(2), k=5, iters=3)
    _, a2 = kmeans(_ds(t).repartition(13), k=5, iters=3)
    p1 = a1.to_pandas().sort_values("vec_id").reset_index(drop=True)
    p2 = a2.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert p1.equals(p2)


def test_export_top_entities_gate_both_ways(ray_session, tmp_path, monkeypatch):
    """A3 artifact (reference analysis.py:82-150): TSV always written;
    PNG only when matplotlib imports — tested with the real absent
    module (png=None) and a fake injected one (png written)."""
    import csv
    import sys
    import types

    import ray.data as rd

    from easyner_ray.stages.analysis import export_top_entities

    mentions = rd.from_items([
        {"conv_id": "c1", "sent_idx": 0, "norm": "apoptosis"},
        {"conv_id": "c1", "sent_idx": 1, "norm": "apoptosis"},
        {"conv_id": "c2", "sent_idx": 0, "norm": "rapamycin"},
    ])

    # gate closed: matplotlib genuinely not installed in this container
    assert "matplotlib" not in sys.modules
    out = export_top_entities(mentions, str(tmp_path / "a"), n=2)
    assert out["png"] is None
    with open(out["tsv"]) as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    assert rows[0]["entity"] == "apoptosis" and rows[0]["total_count"] == "2"

    # gate open: a minimal fake matplotlib proves the plot branch runs
    written = {}

    class _Fig:
        def tight_layout(self):
            pass

        def savefig(self, path):
            written["path"] = path
            open(path, "wb").write(b"\x89PNG fake")

    class _Ax:
        def barh(self, *a, **k):
            pass

        def set_xlabel(self, *a):
            pass

    mpl = types.ModuleType("matplotlib")
    mpl.use = lambda backend: None
    plt = types.ModuleType("matplotlib.pyplot")
    plt.subplots = lambda **k: (_Fig(), _Ax())
    plt.close = lambda fig: None
    mpl.pyplot = plt
    monkeypatch.setitem(sys.modules, "matplotlib", mpl)
    monkeypatch.setitem(sys.modules, "matplotlib.pyplot", plt)

    out2 = export_top_entities(mentions, str(tmp_path / "b"), n=2)
    assert out2["png"] is not None and written["path"] == out2["png"]
    import os
    assert os.path.exists(out2["png"])


def test_adaptive_semi_join_paths_agree(ray_session):
    """adaptive_semi_join: broadcast is_in path (default at test sizes)
    and the forced hash-join path (broadcast_bytes=0) return identical
    rows for semi AND anti; empty key set behaves (semi -> 0, anti ->
    all); null left keys are dropped by semi and kept by anti."""
    import ray.data as rd

    from easyner_ray.ops.relational import adaptive_semi_join

    left = _ds(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, None], pa.int64()),
        "text": ["a", "b", "c", "d", "e"],
    }))
    keys = _ds(pa.table({"doc_id": pa.array([2, 4], pa.int64())}))

    def rows(ds):
        return sorted(((r["doc_id"], r["text"]) for r in ds.take_all()),
                      key=lambda x: (x[0] is None, x[0]))

    semi_b = rows(adaptive_semi_join(left, keys, on="doc_id"))
    semi_h = rows(adaptive_semi_join(left, keys, on="doc_id",
                                     broadcast_bytes=0))
    assert semi_b == semi_h == [(2, "b"), (4, "d")]

    anti_b = rows(adaptive_semi_join(left, keys, on="doc_id", anti=True))
    anti_h = rows(adaptive_semi_join(left, keys, on="doc_id", anti=True,
                                     broadcast_bytes=0))
    assert anti_b == anti_h == [(1, "a"), (3, "c"), (None, "e")]

    empty = _ds(pa.table({"doc_id": pa.array([], pa.int64())}))
    assert rows(adaptive_semi_join(left, empty, on="doc_id")) == []
    assert len(rows(adaptive_semi_join(left, empty, on="doc_id",
                                       anti=True))) == 5

    # string keys (the documents-table shape docs_curated joins on)
    sleft = _ds(pa.table({"doc_id": ["a", "b", "c"], "v": [1, 2, 3]}))
    skeys = _ds(pa.table({"doc_id": ["b"]}))
    for cutoff in (64 << 20, 0):
        got = sorted(r["doc_id"] for r in adaptive_semi_join(
            sleft, skeys, on="doc_id", broadcast_bytes=cutoff).take_all())
        assert got == ["b"]
        got = sorted(r["doc_id"] for r in adaptive_semi_join(
            sleft, skeys, on="doc_id", anti=True,
            broadcast_bytes=cutoff).take_all())
        assert got == ["a", "c"]
