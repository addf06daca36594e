"""Conversation-granularity transcript operators (ops/conversations.py):
hand-computed gold over a tiny multi-conversation table covering role
mixes, tool calls, empty turns, schema violations, and duplicate shapes.
The sf0.01 oracle gate (scripts/check_correctness.py) covers the same
ops against DuckDB SQL; these tests pin the row-level semantics."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa

T0 = dt.datetime(2025, 1, 1, 12, 0, 0)


def _ts(s: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def _transcripts() -> pa.Table:
    rows = [
        # conv A: canonical schema, one tool call, one empty turn
        ("A", 0, "user", "Hello there.", None, 0),
        ("A", 1, "assistant", "Hi.", None, 5),
        ("A", 2, "tool", '{"ok":1}', "search", 9),
        ("A", 3, "user", "", None, 30),
        # conv B: breaks the user/assistant/tool cycle (assistant first)
        ("B", 0, "assistant", "I speak first.", None, 0),
        ("B", 1, "user", "ok", None, 7),
        # conv C: same role shape as A
        ("C", 0, "user", "Question?", None, 0),
        ("C", 1, "assistant", "Answer.", None, 2),
        ("C", 2, "tool", "result", "calc", 3),
        ("C", 3, "user", "thanks", None, 4),
    ]
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([r[4] for r in rows], pa.string()),
        "ts": pa.array([_ts(r[5]) for r in rows], pa.timestamp("us")),
    })


def _ds(blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(_transcripts()).repartition(blocks)


def test_conv_stats(ray_session):
    from easyner_ray.ops.conversations import conv_stats

    out = {r["conv_id"]: r for r in conv_stats(_ds()).take_all()}
    a = out["A"]
    assert a["n_turns"] == 4 and a["n_user"] == 2
    assert a["n_assistant"] == 1 and a["n_tool"] == 1
    assert a["n_tool_calls"] == 1
    assert a["total_chars"] == 12 + 3 + 8 + 0
    assert a["assistant_chars"] == 3
    assert a["assistant_share"] == 3 / 23
    assert a["duration_s"] == 30
    b = out["B"]
    assert b["n_turns"] == 2 and b["n_tool_calls"] == 0
    assert b["duration_s"] == 7
    assert b["assistant_share"] == 14 / 16


def test_role_patterns_groups_identical_shapes(ray_session):
    from easyner_ray.ops.conversations import role_patterns

    out = {r["pattern"]: r for r in role_patterns(_ds()).take_all()}
    assert len(out) == 2
    dup = out["user,assistant,tool,user"]
    assert dup["n_convs"] == 2 and dup["conv_id"] == "A"
    assert out["assistant,user"]["n_convs"] == 1


def test_tool_report(ray_session):
    from easyner_ray.ops.conversations import tool_report

    out = {r["tool"]: r for r in tool_report(_ds()).take_all()}
    assert set(out) == {"search", "calc"}
    assert out["search"]["n_calls"] == 1 and out["search"]["n_convs"] == 1
    assert out["search"]["avg_chars"] == 8.0
    assert out["calc"]["avg_chars"] == 6.0


def test_reply_pairs(ray_session):
    from easyner_ray.ops.conversations import reply_pairs

    rows = sorted(reply_pairs(_ds()).take_all(),
                  key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [("A", 0), ("C", 0)]
    assert rows[0]["prompt"] == "Hello there."
    assert rows[0]["response"] == "Hi."
    assert rows[0]["prompt_chars"] == 12 and rows[0]["response_chars"] == 3


def test_last_turns(ray_session):
    from easyner_ray.ops.conversations import last_turns

    rows = last_turns(_ds(), n=3).take_all()
    got = sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    assert got == [("A", 1), ("A", 2), ("A", 3),
                   ("B", 0), ("B", 1),
                   ("C", 1), ("C", 2), ("C", 3)]


def test_turn_gaps(ray_session):
    from easyner_ray.ops.conversations import turn_gaps

    out = {r["conv_id"]: r for r in turn_gaps(_ds()).take_all()}
    a = out["A"]
    assert a["n_gaps"] == 3
    assert a["avg_gap_s"] == 10.0 and a["max_gap_s"] == 21.0
    assert out["B"]["n_gaps"] == 1 and out["B"]["avg_gap_s"] == 7.0


def test_schema_valid_drops_violating_conversation(ray_session):
    from easyner_ray.ops.conversations import schema_valid_conversations

    rows = schema_valid_conversations(_ds()).take_all()
    convs = {r["conv_id"] for r in rows}
    assert convs == {"A", "C"}
    assert len(rows) == 8  # every turn of the surviving conversations


def test_sft_pairs_chain_filters_and_dedups(ray_session):
    import ray.data as rd

    from easyner_ray.ops.conversations import sft_pairs

    base = _transcripts()
    # conv D: schema-valid, duplicates conv C's (prompt, response) pair
    dup = pa.table({
        "conv_id": pa.array(["D", "D"], pa.string()),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": pa.array(["user", "assistant"], pa.string()),
        "text": pa.array(["Question?", "Answer."], pa.string()),
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([_ts(0), _ts(1)], pa.timestamp("us")),
    })
    ds = rd.from_arrow(pa.concat_tables([base, dup])).repartition(3)
    # min_response_chars=4 drops conv A's pair (response "Hi." = 3 chars);
    # B is schema-invalid; C and D collapse to one deduped pair
    rows = sft_pairs(ds, min_prompt_chars=1,
                     min_response_chars=4).take_all()
    assert len(rows) == 1
    (r,) = rows
    assert r["prompt"] == "Question?" and r["response"] == "Answer."
    assert r["n_copies"] == 2
    assert r["pair_id"] == "C#00000000"  # lexicographic min representative
    assert r["prompt_chars"] == 9 and r["response_chars"] == 7


def test_context_windows(ray_session):
    from easyner_ray.ops.conversations import context_windows

    rows = sorted(context_windows(_ds(), k=3).take_all(),
                  key=lambda r: (r["conv_id"], r["turn_idx"]))
    # assistant turns: A#1, B#0 (conversation-opening), C#1
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [
        ("A", 1), ("B", 0), ("C", 1)]
    assert rows[0]["context"] == "Hello there." and rows[0]["target"] == "Hi."
    assert rows[1]["context"] == ""  # no preceding turn
    assert rows[1]["target"] == "I speak first."
    assert rows[2]["context"] == "Question?" and rows[2]["target"] == "Answer."


def test_context_windows_k1_and_empty_turn(ray_session):
    import ray.data as rd

    from easyner_ray.ops.conversations import context_windows

    # empty-string turn must be KEPT in the window (concat_ws semantics:
    # only NULLs are skipped), and the window must not cross conv bounds
    t = pa.table({
        "conv_id": pa.array(["X"] * 4 + ["Y"], pa.string()),
        "turn_idx": pa.array([0, 1, 2, 3, 0], pa.int32()),
        "role": pa.array(
            ["user", "tool", "user", "assistant", "assistant"], pa.string()),
        "text": pa.array(["q1", "", "q2", "a1", "solo"], pa.string()),
        "tool": pa.array([None, "t", None, None, None], pa.string()),
        "ts": pa.array([_ts(i) for i in range(5)], pa.timestamp("us")),
    })
    ds = rd.from_arrow(t).repartition(2)
    rows = {(r["conv_id"], r["turn_idx"]): r
            for r in context_windows(ds, k=3).take_all()}
    assert rows[("X", 3)]["context"] == "q1\n\nq2"  # empty turn preserved
    assert rows[("Y", 0)]["context"] == ""          # no cross-conv leak
    one = {(r["conv_id"], r["turn_idx"]): r
           for r in context_windows(ds, k=1).take_all()}
    assert one[("X", 3)]["context"] == "q2"


def test_schema_valid_custom_cycle(ray_session):
    from easyner_ray.ops.conversations import schema_valid_conversations

    rows = schema_valid_conversations(
        _ds(), schema=("assistant", "user")).take_all()
    assert {r["conv_id"] for r in rows} == {"B"}


# --------------------------- pattern-predicate triples (stages/triples) ---


def _sent_mentions_batch(texts, mentions_per_sent):
    from easyner_ray import schemas

    ments = pa.array(mentions_per_sent, pa.list_(schemas.MENTION_STRUCT))
    return pa.table({
        "conv_id": pa.array(["c"] * len(texts), pa.string()),
        "turn_idx": pa.array([0] * len(texts), pa.int32()),
        "sent_idx": pa.array(list(range(len(texts))), pa.int32()),
        "text": pa.array(texts, pa.string()),
        "mentions": ments,
    })


def _m(idx, surface, norm, start, end):
    return {"mention_idx": idx, "surface": surface, "norm": norm,
            "cls": "X", "start": start, "end": end}


def test_pattern_triples_gap_predicates():
    from easyner_ray.stages.triples import pattern_triples_batch

    #        0123456789012345678901234567890
    texts = ["aspirin strongly binds to cox2.",
             "aspirin a b c d e f cox2 here.",
             "aspirin, cox2 overlap."]
    batch = _sent_mentions_batch(texts, [
        [_m(0, "aspirin", "aspirin", 0, 7), _m(1, "cox2", "cox2", 26, 30)],
        [_m(0, "aspirin", "aspirin", 0, 7), _m(1, "cox2", "cox2", 20, 24)],
        [_m(0, "aspirin", "aspirin", 0, 7), _m(1, "cox2", "cox2", 9, 13)],
    ])
    out = pattern_triples_batch(batch).to_pylist()
    preds = {r["sent_idx"]: r["pred"] for r in out}
    assert preds[0] == "strongly_binds_to"
    assert preds[1] == "co_occurs_with"   # 6 gap tokens > 3
    assert preds[2] == "co_occurs_with"   # punctuation-only gap
    assert all(r["subj"] == "aspirin" and r["obj"] == "cox2" for r in out)


def test_pattern_triples_skips_same_norm_and_single_mention():
    from easyner_ray.stages.triples import pattern_triples_batch

    batch = _sent_mentions_batch(
        ["aspirin and aspirin.", "only cox2 here."],
        [
            [_m(0, "aspirin", "aspirin", 0, 7),
             _m(1, "aspirin", "aspirin", 12, 19)],
            [_m(0, "cox2", "cox2", 5, 9)],
        ])
    assert len(pattern_triples_batch(batch)) == 0


def test_pattern_triples_multibyte_fallback_matches_ascii_semantics():
    from easyner_ray.stages.triples import pattern_triples_batch

    # é forces the per-row slice path; spans are codepoint offsets
    #        0123456789012345678
    text = "azéx binds to cox2."
    batch = _sent_mentions_batch([text], [
        [_m(0, "azéx", "azex", 0, 4), _m(1, "cox2", "cox2", 14, 18)],
    ])
    (row,) = pattern_triples_batch(batch).to_pylist()
    assert row["pred"] == "binds_to"


def test_pattern_triples_dataset(ray_session):
    import ray.data as rd

    from easyner_ray.stages.triples import pattern_triples

    batch = _sent_mentions_batch(
        ["aspirin inhibits cox2."],
        [[_m(0, "aspirin", "aspirin", 0, 7), _m(1, "cox2", "cox2", 17, 21)]])
    rows = pattern_triples(rd.from_arrow(batch)).take_all()
    assert rows[0]["pred"] == "inhibits"


def test_refusal_scan_preset(ray_session):
    import ray.data as rd

    from easyner_ray.ops.conversations import refusal_scan

    t = pa.table({
        "conv_id": ["c1", "c1", "c1", "c2", "c2", "c3"],
        "role": ["user", "assistant", "assistant",
                 "assistant", "assistant", "user"],
        "text": ["please do X",
                 "I CANNOT help with that.",        # case-insensitive hit
                 "Here is the answer.",
                 "As a language model, I apologize.",  # two phrases, 1 turn
                 "Sure thing.",
                 "I cannot either"],               # user turn: ignored
    })
    out = {r["conv_id"]: r for r in
           refusal_scan(rd.from_arrow(t).repartition(2)).take_all()}
    assert set(out) == {"c1", "c2"}  # c3 has no assistant turns
    assert out["c1"]["n_role_turns"] == 2 and out["c1"]["n_flagged"] == 1
    assert out["c1"]["flagged_share"] == 0.5
    assert out["c2"]["n_flagged"] == 1  # multi-phrase turn counts once
    # custom watchlist + role override
    out2 = {r["conv_id"]: r for r in
            refusal_scan(rd.from_arrow(t), phrases=("please",),
                         role="user").take_all()}
    assert out2["c1"]["n_flagged"] == 1 and out2["c3"]["n_flagged"] == 0


def test_conv_fingerprint_dedup_key(ray_session):
    import hashlib

    import ray.data as rd

    from easyner_ray.ops.conversations import conv_fingerprint

    t = pa.table({
        "conv_id": ["c1", "c1", "c2", "c2", "c3"],
        "turn_idx": pa.array([0, 1, 0, 1, 0], pa.int64()),
        "text": ["hello", "world", "hello", "world", "other"],
    })
    out = {r["conv_id"]: r for r in
           conv_fingerprint(rd.from_arrow(t).repartition(2)).take_all()}
    # identical ordered content -> identical fingerprint (the dedup key)
    assert out["c1"]["text_md5"] == out["c2"]["text_md5"]
    assert out["c3"]["text_md5"] != out["c1"]["text_md5"]
    assert out["c1"]["n_turns"] == 2 and out["c3"]["n_turns"] == 1
    # fingerprint IS the md5 of the sep-joined ordered text
    assert out["c1"]["text_md5"] == hashlib.md5(
        b"hello\nworld").hexdigest()
    # order matters: swapping turns changes the key
    swapped = pa.table({
        "conv_id": ["c4", "c4"],
        "turn_idx": pa.array([0, 1], pa.int64()),
        "text": ["world", "hello"],
    })
    (r4,) = conv_fingerprint(rd.from_arrow(swapped)).take_all()
    assert r4["text_md5"] != out["c1"]["text_md5"]
