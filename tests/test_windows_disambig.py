"""Windowed aggregates, scored disambiguation, multi-model merge tests."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pytest


def test_user_sessions_gap_rule(ray_session):
    import ray.data as rd

    from easyner_ray.ops.windows import user_sessions

    base = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: 3 events, gap of 1h between 2nd and 3rd -> 2 sessions
        (1, 10, base),
        (1, 11, base + dt.timedelta(minutes=5)),
        (1, 12, base + dt.timedelta(minutes=65)),
        # user 2: single event -> 1 session
        (2, 20, base),
    ]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    }))
    out = user_sessions(ds, gap_seconds=1800).to_pandas().sort_values("user_id")
    assert out["n_sessions"].tolist() == [2, 1]
    assert out["n_events"].tolist() == [3, 1]


def test_hourly_rollup_keys(ray_session):
    import ray.data as rd

    from easyner_ray.ops.windows import hourly_rollup

    base = dt.datetime(2026, 1, 1, 10, 30)
    ds = rd.from_arrow(pa.table({
        "event_type": ["a", "a", "a"],
        "ts": pa.array([base, base + dt.timedelta(minutes=10),
                        base + dt.timedelta(hours=1)], pa.timestamp("us")),
        "value": [1.0, 2.0, 4.0],
    }))
    out = hourly_rollup(ds).to_pandas().sort_values("hour").reset_index(drop=True)
    assert out["n"].tolist() == [2, 1]
    assert out["sum_value"].tolist() == [3.0, 4.0]


def test_disambiguation_deterministic_and_reference_compatible(ray_session):
    import ray.data as rd

    from easyner_ray.stages.dict_ner import tag_mentions
    from easyner_ray.stages.disambiguate import disambiguate_mentions

    sents = rd.from_arrow(pa.table({
        "conv_id": ["c1", "c2"],
        "turn_idx": pa.array([0, 0], pa.int32()),
        "sent_idx": pa.array([0, 0], pa.int32()),
        "text": ["The zetamycin and actozine rose.", "Plain zetamycin here."],
        "char_start": pa.array([0, 0], pa.int32()),
    }))
    terms = [("zetamycin", "chemical"), ("actozine", "chemical")]
    alias = [("zetamycin", "K2"), ("zetamycin", "K1"), ("actozine", "A1")]
    sm = tag_mentions(sents, terms)
    out = disambiguate_mentions(sm, alias).to_pandas()
    by = out.set_index(["conv_id", "norm"])
    assert by.loc[("c1", "actozine"), "entity_id"] == "A1"       # unambiguous
    # ambiguous term resolves deterministically (same context -> same id)
    out2 = disambiguate_mentions(tag_mentions(sents, terms), alias).to_pandas()
    assert out["entity_id"].tolist() == out2["entity_id"].tolist()
    assert by.loc[("c1", "zetamycin"), "entity_id"] in ("K1", "K2")
    assert by.loc[("c1", "zetamycin"), "link_score"] <= 1.0


def test_merged_mentions_equal_single_pass(ray_session, tiny_corpus):
    """Union of two half-vocabulary taggers == one full-vocabulary pass."""
    import os

    import ray.data as rd

    from easyner_ray.pipelines.kg import drop_empty_turns, read_transcripts
    from easyner_ray.sources.vocab import vocabulary
    from easyner_ray.stages.dict_ner import explode_mentions, tag_mentions
    from easyner_ray.stages.merge import merge_sentence_mentions
    from easyner_ray.stages.splitter import split_sentences

    ts = read_transcripts(os.path.join(tiny_corpus, "transcripts.parquet"))
    sents = split_sentences(drop_empty_turns(ts))
    voc = vocabulary()
    merged = merge_sentence_mentions(
        [tag_mentions(sents, voc[::2]), tag_mentions(sents, voc[1::2])], resolve=False
    )
    got = explode_mentions(merged).to_pandas()
    want = explode_mentions(tag_mentions(sents, voc)).to_pandas()
    key = ["conv_id", "turn_idx", "sent_idx", "mention_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want)
