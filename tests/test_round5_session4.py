"""Round-5 session-4 operators: unicode normalization, token
truncation, DSIR importance weights, embedding-space decontamination,
and the numeric column profiler."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 1):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


# ------------------------------------------------------- normalization ---


def test_normalize_text_nfc_controls_whitespace(ray_session):
    from easyner_ray.ops.textstats import normalize_text

    decomposed = "café"  # e + combining acute -> NFC 'café'
    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["  a\t\n b\x00c ", decomposed, "", "clean text"],
    })
    out = {r["doc_id"]: r for r in normalize_text(_ds(t, 2)).take_all()}
    assert out[1]["text"] == "a b c"
    assert out[1]["changed"] is True
    assert out[2]["text"] == "café"
    assert out[2]["n_chars"] == 4          # codepoints AFTER composition
    assert out[2]["changed"] is True
    assert out[3]["text"] == "" and out[3]["changed"] is False
    assert out[4]["text"] == "clean text" and out[4]["changed"] is False


def test_normalize_collapses_vertical_tab_and_del(ray_session):
    from easyner_ray.ops.textstats import normalize_text

    t = pa.table({"doc_id": [1], "text": ["a\x0b\x0c\x7fb"]})
    (row,) = normalize_text(_ds(t)).take_all()
    assert row["text"] == "a b"


# ----------------------------------------------------------- truncation ---


def test_truncate_tokens_slices_and_flags(ray_session):
    from easyner_ray.ops.textstats import truncate_tokens

    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["one two three four", "a b", "", "  x   y  z  "],
    })
    out = {r["doc_id"]: r
           for r in truncate_tokens(_ds(t, 2), 3).take_all()}
    assert out[1]["text"] == "one two three"
    assert out[1]["n_tokens"] == 4 and out[1]["truncated"] is True
    assert out[2]["text"] == "a b"
    assert out[2]["n_tokens"] == 2 and out[2]["truncated"] is False
    assert out[3]["text"] == "" and out[3]["n_tokens"] == 0
    assert out[4]["text"] == "x y z"      # split artifacts dropped


def test_truncate_tokens_rejects_bad_max(ray_session):
    import pytest

    from easyner_ray.ops.textstats import truncate_tokens

    with pytest.raises(ValueError):
        truncate_tokens(_ds(pa.table({"text": ["x"]})), 0)


# ----------------------------------------------------------------- DSIR ---


def test_dsir_weights_formula_and_direction(ray_session):
    """Hand-check the add-one-smoothed log-ratio on a 3-term universe;
    target-like docs must score above raw-like docs."""
    from easyner_ray.ops.textstats import dsir_weights

    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["good good", "bad bad", "good bad"],
    })
    target = pa.table({"doc_id": [10], "text": ["good good good"]})
    out = {r["doc_id"]: r["dsir_weight"]
           for r in dsir_weights(_ds(docs, 2).materialize(),
                                 _ds(target)).take_all()}
    # vocab = {good (cr=3), bad (cr=3)}; ct: good=3, bad=0; V=2
    # Tt = 3 + 2 = 5; Tr = 6 + 2 = 8
    d_good = math.log(4 / 5) - math.log(4 / 8)
    d_bad = math.log(1 / 5) - math.log(4 / 8)
    assert out[1] == round(2 * d_good, 4)
    assert out[2] == round(2 * d_bad, 4)
    assert out[3] == round(d_good + d_bad, 4)
    assert out[1] > out[3] > out[2]


def test_dsir_oov_terms_contribute_zero(ray_session):
    from easyner_ray.ops.textstats import dsir_weights

    docs = pa.table({
        "doc_id": [1, 2],
        "text": ["alpha alpha beta", "zzz qqq"],   # doc 2 all-OOV at V=2
    })
    target = pa.table({"doc_id": [9], "text": ["alpha"]})
    out = {r["doc_id"]: r["dsir_weight"]
           for r in dsir_weights(_ds(docs).materialize(), _ds(target),
                                 vocab_size=2).take_all()}
    assert out[2] == 0.0                  # present, but zero weight


# ------------------------------------------------- embedding decontam ---


def test_embedding_decontam_drops_near_eval(ray_session):
    from easyner_ray.ops.decontam import embedding_decontam

    corpus = pa.table({
        "vec_id": [1, 2, 3],
        "embedding": [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]],
    })
    ev = pa.table({"vec_id": [100], "embedding": [[1.0, 0.0]]})
    out = {r["vec_id"]: r["max_eval_cos"]
           for r in embedding_decontam(_ds(corpus, 2), _ds(ev),
                                       threshold=0.9).take_all()}
    assert 1 not in out                    # cos = 1.0 -> contaminated
    assert out[2] == 0.0
    assert out[3] == round(0.7 / math.sqrt(0.98), 4)


def test_embedding_decontam_empty_eval_keeps_all(ray_session):
    from easyner_ray.ops.decontam import embedding_decontam

    corpus = pa.table({"vec_id": [1, 2],
                       "embedding": [[1.0, 0.0], [0.0, 1.0]]})
    ev = pa.table({"vec_id": pa.array([], pa.int64()),
                   "embedding": pa.array([], pa.list_(pa.float64()))})
    out = embedding_decontam(_ds(corpus), _ds(ev)).take_all()
    assert sorted(r["vec_id"] for r in out) == [1, 2]
    assert all(r["max_eval_cos"] == 0.0 for r in out)


# --------------------------------------------------------------- profiler ---


def test_profile_columns_nulls_distinct_and_avg(ray_session):
    from easyner_ray.ops.relational import profile_columns

    t = pa.table({
        "a": pa.array([1.0, 2.0, 2.0, None], pa.float64()),
        "b": pa.array([5, 5, 5, 5], pa.int64()),
    })
    out = profile_columns(_ds(t, 2), ["a", "b"]).to_pylist()
    rows = {r["column"]: r for r in out}
    assert rows["a"]["n"] == 4 and rows["a"]["n_null"] == 1
    assert rows["a"]["n_distinct"] == 2
    assert rows["a"]["min_val"] == 1.0 and rows["a"]["max_val"] == 2.0
    assert rows["a"]["avg_val"] == round(5.0 / 3, 4)
    assert rows["b"]["n_distinct"] == 1 and rows["b"]["avg_val"] == 5.0


def test_profile_columns_all_null_column(ray_session):
    from easyner_ray.ops.relational import profile_columns

    t = pa.table({"a": pa.array([None, None], pa.float64())})
    (row,) = profile_columns(_ds(t), ["a"]).to_pylist()
    assert row["n"] == 2 and row["n_null"] == 2
    assert row["n_distinct"] == 0 and row["avg_val"] is None


def test_profile_round_matches_sql_half_away_tie(ray_session):
    """avg exactly on a .00005 tie must follow SQL's half-away round
    (the l_quantity trap: 25.40225 -> 25.4023, not Python's 25.4022)."""
    from easyner_ray.ops.relational import profile_columns

    t = pa.table({"q": pa.array([25.40225], pa.float64())})
    (row,) = profile_columns(_ds(t), ["q"]).to_pylist()
    assert round(25.40225, 4) == 25.4022   # the divergence being pinned
    assert row["avg_val"] == 25.4023


# ----------------------------------------------------------- curate steps ---


def test_curate_normalize_and_truncate_steps_keep_schema(ray_session):
    from easyner_ray.pipelines.curate import STEPS

    t = pa.table({
        "doc_id": [1, 2],
        "source": ["a", "b"],
        "text": ["  x \t y  ", "one two three four"],
    })
    out = STEPS["normalize"](_ds(t, 2)).take_all()
    assert sorted(out[0].keys()) == ["doc_id", "source", "text"]
    assert {r["doc_id"]: r["text"] for r in out}[1] == "x y"

    out2 = {r["doc_id"]: r["text"]
            for r in STEPS["truncate"](_ds(t), max_tokens=2).take_all()}
    assert out2[2] == "one two"


def test_curate_dsir_select_step_filters_by_weight(ray_session):
    from easyner_ray.pipelines.curate import STEPS

    t = pa.table({
        "doc_id": [1, 2, 3],
        "source": ["tgt", "raw", "raw"],
        "text": ["good words here", "good words here", "junk junk junk"],
    })
    out = STEPS["dsir_select"](_ds(t, 2), target_source="tgt",
                               min_weight=0.0).take_all()
    ids = sorted(r["doc_id"] for r in out)
    # target-like docs (1, 2) have non-negative weights; the junk doc's
    # terms never occur in the target -> strictly negative weight
    assert 3 not in ids and ids == [1, 2]
    assert sorted(out[0].keys()) == ["doc_id", "source", "text"]


# ------------------------------------------------------------ C4 signals ---


def test_c4_signals_line_fractions_and_flags(ray_session):
    from easyner_ray.ops.textstats import c4_signals

    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "This line is long enough to count.\nshort\nAnother full "
            "sentence here today!",
            "Lorem Ipsum dolor { var x = 1; } javascript",
            "",
        ],
    })
    out = {r["doc_id"]: r for r in c4_signals(_ds(t, 2)).take_all()}
    assert out[1]["n_lines"] == 3
    assert out[1]["frac_lines_end_punct"] == 2 / 3   # 'short' has none
    assert out[1]["frac_lines_min_words"] == 2 / 3
    assert out[1]["has_lorem_ipsum"] is False
    assert out[2]["has_lorem_ipsum"] is True
    assert out[2]["has_brace"] is True
    assert out[2]["has_javascript"] is True
    assert out[3]["n_lines"] == 1                     # '' -> one segment
    assert out[3]["frac_lines_end_punct"] == 0.0


def test_c4_signals_trims_tabs_before_punct_check(ray_session):
    from easyner_ray.ops.textstats import c4_signals

    t = pa.table({"doc_id": [1], "text": ["ends well.\t\r"]})
    (row,) = c4_signals(_ds(t)).take_all()
    assert row["frac_lines_end_punct"] == 1.0


# ---------------------------------------------------------- source KL ---


def test_source_kl_identical_sources_zero_distinct_positive(ray_session):
    import math

    from easyner_ray.ops.textstats import source_kl

    t = pa.table({
        "doc_id": [1, 2, 3],
        "source": ["a", "b", "c"],
        "text": ["x y", "x y", "z z"],   # a == b == mixture-ish; c apart
    })
    out = {r["source"]: r for r in source_kl(_ds(t, 2)).take_all()}
    assert set(out) == {"a", "b", "c"}
    assert out["a"]["kl"] == out["b"]["kl"]
    assert out["c"]["kl"] > out["a"]["kl"] >= 0.0
    # hand-check c: p(z)=1, q(z)=2/6 -> KL = ln(3)
    assert out["c"]["kl"] == round(math.log(3), 4)
    assert out["c"]["n_tokens"] == 2


# ----------------------------------------------------------- winsorize ---


def test_events_winsorize_clamps_to_rounded_band(ray_session):
    import os

    from easyner_ray.pipelines.queries import events_winsorize

    out = events_winsorize("/root/testdata/sf0.001").take_all()
    vals = [r["value"] for r in out]
    ws = [r["value_w"] for r in out]
    lo, hi = min(ws), max(ws)
    assert lo > min(vals) and hi < max(vals)          # tails clipped
    n_clip = sum(1 for v, w in zip(vals, ws) if v != w)
    assert 0 < n_clip < len(out) * 0.2                # ~10% clamped
    assert all(lo <= w <= hi for w in ws)


# --------------------------------------------------------- concat blocks ---


def test_concat_blocks_crosses_doc_boundaries(ray_session):
    from easyner_ray.ops.textstats import concat_blocks

    t = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["a b c", "d e", "f g h i"],
    })
    # one bucket -> one stream: 9 tokens at B=4 -> blocks of 4,4,1
    out = sorted(concat_blocks(_ds(t, 2), 4, n_buckets=1).take_all(),
                 key=lambda r: r["block_id"])
    assert [r["n_tokens"] for r in out] == [4, 4, 1]
    assert out[0]["text"] == "a b c d"          # crosses doc 0 -> 1
    assert out[1]["text"] == "e f g h"
    assert out[2]["text"] == "i"
    assert all(r["bucket"] == 0 for r in out)


def test_concat_blocks_drops_negative_ids_and_validates(ray_session):
    import pytest

    from easyner_ray.ops.textstats import concat_blocks

    t = pa.table({"doc_id": [-1, 5], "text": ["dropme", "x y"]})
    out = concat_blocks(_ds(t), 2, n_buckets=1).take_all()
    assert len(out) == 1 and out[0]["text"] == "x y"
    with pytest.raises(ValueError):
        concat_blocks(_ds(t), 0)


# ---------------------------------------------------------------- JSONL ---


def test_jsonl_roundtrip(ray_session, tmp_path):
    from easyner_ray.sources.loaders import read_jsonl, write_jsonl

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["alpha", "beta", 'with "quotes"']})
    out_dir = str(tmp_path / "jl")
    write_jsonl(_ds(t), out_dir)
    back = read_jsonl(out_dir).take_all()
    assert sorted((r["doc_id"], r["text"]) for r in back) == \
        [(1, "alpha"), (2, "beta"), (3, 'with "quotes"')]
