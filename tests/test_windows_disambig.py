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


def test_hopping_rollup_membership_and_counts(ray_session):
    """Each event lands in exactly size/hop windows; a hand-checked
    window holds exactly the events whose ts falls in [start, start+size)."""
    import ray.data as rd

    from easyner_ray.ops.windows import hopping_rollup

    base = dt.datetime(2026, 1, 1, 10, 0)   # epoch-aligned to 900s? not needed
    ds = rd.from_arrow(pa.table({
        "event_type": ["a", "a", "b"],
        "ts": pa.array([base, base + dt.timedelta(minutes=20),
                        base + dt.timedelta(minutes=5)], pa.timestamp("us")),
        "value": [1.0, 2.0, 8.0],
    }))
    out = hopping_rollup(ds, size_s=3600, hop_s=900).to_pandas()
    # every event contributes to exactly 4 windows
    assert int(out["n"].sum()) == 3 * 4
    # the window starting at the event's own quarter-hour contains it
    sec0 = int(base.timestamp())
    w0 = (sec0 // 900) * 900
    rows_a = out[(out["event_type"] == "a") & (out["wstart_sec"] == w0)]
    # both 'a' events (0 and 20 min) share window w0 only if 20min < size:
    # w0 covers [w0, w0+3600) -> both inside
    assert rows_a["n"].tolist() == [2]
    assert rows_a["sum_value"].tolist() == [3.0]
    # a window strictly before any event minus size contains nothing
    assert (out["wstart_sec"] >= w0 - 3600 + 900).all()


def test_hopping_rollup_matches_bruteforce(ray_session):
    """Engine hopping windows == per-event brute-force window expansion."""
    import collections

    import ray.data as rd

    from easyner_ray.ops.windows import hopping_rollup

    base = dt.datetime(2026, 3, 5, 7, 11, 13)
    events = [(f"t{i % 3}", base + dt.timedelta(seconds=137 * i), float(i))
              for i in range(200)]
    ds = rd.from_arrow(pa.table({
        "event_type": [e[0] for e in events],
        "ts": pa.array([e[1] for e in events], pa.timestamp("us")),
        "value": [e[2] for e in events],
    }))
    size_s, hop_s = 1800, 600
    gold: dict = collections.defaultdict(lambda: [0, 0.0])
    for et, ts, v in events:
        sec = int(ts.timestamp())
        for i in range(size_s // hop_s):
            w = (sec // hop_s) * hop_s - i * hop_s
            g = gold[(et, w)]
            g[0] += 1
            g[1] += v
    out = hopping_rollup(ds, size_s=size_s, hop_s=hop_s).to_pandas()
    got = {(r.event_type, int(r.wstart_sec)): (int(r.n), round(r.sum_value, 4))
           for r in out.itertuples()}
    assert got == {k: (n, round(s, 4)) for k, (n, s) in gold.items()}


def test_asof_join_backward_semantics(ray_session):
    """Per-key latest-prior match, exact-ts match allowed, unmatched left
    dropped, keys isolated, right ties resolved by max tie_col."""
    import ray.data as rd

    from easyner_ray.ops.asof import asof_join

    base = dt.datetime(2026, 1, 1)
    T = lambda m: base + dt.timedelta(minutes=m)
    left = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array([T(10), T(30), T(5), T(10), T(50)], pa.timestamp("us")),
        "event_id": pa.array([100, 101, 102, 103, 104], pa.int64()),
        "value": [1.0, 2.0, 3.0, 4.0, 5.0],
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 9], pa.int64()),
        # user 1: clicks at 8, 25, 25 (tie) ; user 2: click at 10 (exact)
        "ts": pa.array([T(8), T(25), T(25), T(10), T(0)], pa.timestamp("us")),
        "event_id": pa.array([7, 8, 9, 11, 12], pa.int64()),
    }))
    out = asof_join(left, right, key="user_id", ts="ts",
                    left_cols=["event_id", "value"], right_cols=["event_id"],
                    tie_col="event_id").to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    # left 102 (user1 @5) has no prior click -> dropped; 104 (user3) -> dropped
    assert out["event_id"].tolist() == [100, 101, 103]
    # 100 @10 -> click @8 (id 7); 101 @30 -> tie at 25 resolved to id 9;
    # 103 @10 -> exact-ts click @10 (id 11)
    assert out["event_id_r"].tolist() == [7, 9, 11]
    assert out["ts_r"].tolist() == [T(8), T(25), T(10)]
    assert out["value"].tolist() == [1.0, 2.0, 4.0]


def test_asof_join_matches_global_merge_asof(ray_session):
    """Bucketed distributed as-of == single-frame pandas merge_asof on a
    200-user random-ish (seeded) stream."""
    import pandas as pd

    import ray.data as rd

    from easyner_ray.ops.asof import asof_join

    base = dt.datetime(2026, 2, 1)
    n = 1500
    lrows = [((i * 37) % 200, base + dt.timedelta(seconds=(i * 61) % 86400),
              1000 + i, float(i % 17)) for i in range(n)]
    rrows = [((i * 53) % 200, base + dt.timedelta(seconds=(i * 97) % 86400),
              5000 + i) for i in range(n)]
    left = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in lrows], pa.int64()),
        "ts": pa.array([r[1] for r in lrows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in lrows], pa.int64()),
        "value": [r[3] for r in lrows],
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rrows], pa.int64()),
        "ts": pa.array([r[1] for r in rrows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rrows], pa.int64()),
    }))
    out = asof_join(left, right, key="user_id", ts="ts",
                    left_cols=["event_id", "value"], right_cols=["event_id"],
                    tie_col="event_id").to_pandas()

    ldf = pd.DataFrame(lrows, columns=["user_id", "ts", "event_id", "value"])
    rdf = pd.DataFrame(rrows, columns=["user_id", "ts", "event_id"])
    rdf = (rdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
              .drop_duplicates(["user_id", "ts"], keep="last"))
    rdf = rdf.rename(columns={"event_id": "event_id_r"}).assign(ts_r=rdf["ts"])
    gold = pd.merge_asof(ldf.sort_values("ts", kind="mergesort"),
                         rdf.sort_values("ts", kind="mergesort"),
                         on="ts", by="user_id", direction="backward")
    gold = gold[gold["ts_r"].notna()]
    gold["ts"] = gold["ts"].astype("datetime64[us]")
    gold["ts_r"] = gold["ts_r"].astype("datetime64[us]")
    gold["event_id_r"] = gold["event_id_r"].astype("int64")
    key_cols = ["user_id", "ts", "event_id"]
    out = out.sort_values(key_cols).reset_index(drop=True)
    gold = gold[out.columns].sort_values(key_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, gold)


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
