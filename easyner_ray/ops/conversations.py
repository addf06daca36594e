"""Conversation-granularity operators over transcript tables.

The engine's payload is multi-turn conversation / agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``. The reference pipeline
treats a conversation only as a container of turns (its "document" is
one turn — EasyNER ``splitter.py``/``analysis.py`` never aggregate above
the article level); a transcript-curation user additionally needs
CONVERSATION-level operators: per-conversation profiles, role-schema
validation, conversation-shape grouping, tool-usage reporting,
prompt->response pair extraction (SFT prep) and context-tail windowing.

Everything here reuses the engine's existing exchanges — at most one
coarse hash-bucket shuffle on ``conv_id`` (the same exchange the KG
build and ``reassemble_turns`` already pay), otherwise vectorized
map-only passes + the two-phase ``grouped_agg``. No per-row Python in
any hot path; per-conversation keyspaces always go through the bucketed
final (open keyspace — #convs scales with the corpus).

Scale notes (100 TB):
  * ``conv_stats`` / ``tool_report`` / ``schema_valid_conversations``
    stream: partial aggregation inside ``map_batches``, bucketed final.
  * ``role_patterns`` needs per-conversation ORDER — it rides the same
    fragment trick as ``stages.splitter.reassemble_turns``: per-batch
    ordered partial join, then one bucket shuffle joins the 1-2
    fragments per conversation (requires the input's row order to keep
    each conversation's turns contiguous-and-ordered per block, which
    Parquet transcript shards written conversation-at-a-time satisfy).
  * ``reply_pairs`` / ``turn_gaps`` ride ``partitioned_analytics``
    (bucketed lead/lag) — one exchange, vectorized kernel.
  * ``last_turns`` joins a per-conv max back through ``adaptive_join``:
    broadcast under the 64 MB gate, hash-shuffle above it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "conv_stats",
    "role_patterns",
    "tool_report",
    "reply_pairs",
    "last_turns",
    "turn_gaps",
    "schema_valid_conversations",
    "sft_pairs",
    "context_windows",
    "refusal_scan",
    "conv_fingerprint",
    "dialog_acts",
    "REFUSAL_PHRASES",
    "COMMAND_VERBS",
]

# Canned-response / refusal markers an SFT-curation pass screens
# assistant turns for (public folk knowledge: every open instruct-data
# cleanup — e.g. the ShareGPT "unfiltered" scrubbers — greps a list of
# exactly this shape). Case-insensitive substring semantics.
REFUSAL_PHRASES = (
    "i cannot",
    "i can't",
    "i'm sorry",
    "i am sorry",
    "i apologize",
    "as an ai",
    "as a language model",
    "i am not able to",
    "i'm unable",
)

_F64 = pa.float64()


def _chars(t: pa.Table, col: str = "text") -> pa.ChunkedArray:
    return pc.utf8_length(pc.coalesce(t.column(col), "")).cast(pa.int64())


def conv_stats(transcripts):
    """Per-conversation profile: turn counts by role, tool-call count,
    char totals, assistant char share, wall-clock duration.

    Output: (conv_id, n_turns, n_user, n_assistant, n_tool,
    n_tool_calls, total_chars, assistant_chars, assistant_share,
    duration_s). ``assistant_share`` is an exact int/int double (NULL
    when the conversation has zero characters); ``duration_s`` is exact
    integer seconds — no rounding grain needed anywhere.
    """
    from easyner_ray.ops.relational import grouped_agg

    def prep(t: pa.Table) -> pa.Table:
        chars = _chars(t)
        role = t.column("role")
        is_a = pc.equal(role, "assistant").cast(pa.int64())
        cols = [
            t.column("conv_id"),
            t.column("turn_idx"),
            pc.equal(role, "user").cast(pa.int64()),
            is_a,
            pc.equal(role, "tool").cast(pa.int64()),
            pc.is_valid(t.column("tool")).cast(pa.int64()),
            chars,
            pc.multiply(chars, is_a),
            t.column("ts").cast(pa.int64()),  # timestamp[us] -> micros
        ]
        names = ["conv_id", "turn_idx", "is_user", "is_assistant",
                 "is_tool", "tool_call", "chars", "a_chars", "ts_us"]
        return pa.Table.from_arrays(cols, names=names)

    agg = grouped_agg(
        transcripts.map_batches(prep, batch_format="pyarrow"),
        ["conv_id"],
        [
            ("turn_idx", "count", "n_turns"),
            ("is_user", "sum", "n_user"),
            ("is_assistant", "sum", "n_assistant"),
            ("is_tool", "sum", "n_tool"),
            ("tool_call", "sum", "n_tool_calls"),
            ("chars", "sum", "total_chars"),
            ("a_chars", "sum", "assistant_chars"),
            ("ts_us", "min", "__t0"),
            ("ts_us", "max", "__t1"),
        ],
    )

    def derive(t: pa.Table) -> pa.Table:
        tot = t.column("total_chars")
        share = pc.if_else(
            pc.greater(tot, 0),
            pc.divide(t.column("assistant_chars").cast(_F64), tot.cast(_F64)),
            pa.scalar(None, _F64),
        )
        dur = pc.divide(
            pc.subtract(t.column("__t1"), t.column("__t0")), 1_000_000)
        t = t.append_column("assistant_share", share)
        t = t.append_column("duration_s", dur)
        return t.drop(["__t0", "__t1"])

    return agg.map_batches(derive, batch_format="pyarrow")


def refusal_scan(transcripts, phrases=REFUSAL_PHRASES, *,
                 role: str = "assistant", round_digits: int = 4):
    """Phrase-flag scan for SFT curation: per conversation, how many
    ``role`` turns contain any watchlist phrase (case-insensitive
    substring), and the flagged share — the decision unit for dropping
    whole conversations whose assistant turns are refusals / canned
    boilerplate (default watchlist :data:`REFUSAL_PHRASES`; pass a
    domain list for hedge/boilerplate audits).

    Output: ``(conv_id, n_role_turns, n_flagged, flagged_share)``.
    Map-only per-batch matching (one ``match_substring`` kernel per
    phrase over the lowercased column — len(phrases) vectorized passes,
    no per-row Python) into the two-phase bucketed ``grouped_agg``;
    the only exchange is the per-conversation final. ``flagged_share``
    is int/int then one round — no float-order sensitivity."""
    from easyner_ray.ops.relational import grouped_agg

    pats = [p.lower() for p in phrases]

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("role"), role))
        low = pc.utf8_lower(pc.coalesce(t.column("text"), ""))
        hit = pa.array(np.zeros(len(t), dtype=bool))
        for p in pats:
            hit = pc.or_(hit, pc.match_substring(low, p))
        return pa.Table.from_arrays(
            [t.column("conv_id"), hit.cast(pa.int64()),
             pa.array(np.ones(len(t), dtype=np.int64))],
            names=["conv_id", "flagged", "one"])

    agg = grouped_agg(
        transcripts.map_batches(prep, batch_format="pyarrow"),
        ["conv_id"],
        [("one", "sum", "n_role_turns"),
         ("flagged", "sum", "n_flagged")])

    def derive(t: pa.Table, rd_=round_digits) -> pa.Table:
        share = pc.round(
            pc.divide(t.column("n_flagged").cast(_F64),
                      t.column("n_role_turns").cast(_F64)),
            ndigits=rd_, round_mode="half_towards_infinity")
        return t.append_column("flagged_share", share)

    return agg.map_batches(derive, batch_format="pyarrow")


def role_patterns(transcripts, sep: str = ","):
    """Group conversations by their full ordered role sequence — the
    conversation "shape" census (e.g. how many transcripts follow
    ``user,assistant,tool,...``), which doubles as conversation-level
    structural dedup: identical shapes collapse to one representative.

    Output: (pattern, n_convs, conv_id) with ``conv_id`` the minimum
    representative. Same two-phase fragment exchange as
    ``stages.splitter.reassemble_turns`` (one bucket shuffle); the final
    group-by-pattern is the bucketed two-phase aggregate.
    """
    import pandas as pd

    from easyner_ray.ops.relational import add_hash_bucket, grouped_agg

    def fragments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        g = df.groupby("conv_id", sort=False)
        out = g.agg(pattern=("role", sep.join),
                    first_turn=("turn_idx", "min")).reset_index()
        out["first_turn"] = out["first_turn"].astype("int32")
        return out[["conv_id", "first_turn", "pattern"]]

    frag = transcripts.map_batches(fragments, batch_format="pandas")
    bucketed = frag.map_batches(
        lambda t: add_hash_bucket(t, ["conv_id"], 64),
        batch_format="pyarrow",
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "first_turn"], kind="mergesort")
        g = df.groupby("conv_id", sort=False)
        return g.agg(pattern=("pattern", sep.join)).reset_index()

    per_conv = bucketed.groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas")
    return grouped_agg(
        per_conv,
        ["pattern"],
        [("conv_id", "count", "n_convs"), ("conv_id", "min", "conv_id")],
    )


def conv_fingerprint(transcripts, sep: str = "\n"):
    """Content fingerprint per conversation: the md5 of the full ordered
    turn-text concatenation plus the turn count — the conversation-level
    EXACT-dedup key (two transcripts with identical ordered content
    collapse to one fingerprint; group on ``text_md5`` and keep the min
    ``conv_id`` to dedup an SFT set at conversation granularity, the
    whole-dialog analog of ``ops.dedup.dedup_exact``).

    Output: (conv_id, n_turns, text_md5). Same two-phase fragment
    exchange as :func:`role_patterns` (ordered per-batch partials, one
    bucket shuffle joins the 1-2 fragments per conversation — same
    contiguous-per-block input contract); the md5 runs once per
    conversation on the joined text (string-kernel cost, same class as
    the sha256 id fallback in ``sources.loaders``)."""
    import hashlib

    import pandas as pd

    from easyner_ray.ops.relational import add_hash_bucket

    def fragments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        g = df.groupby("conv_id", sort=False)
        out = g.agg(text=("text", sep.join),
                    n_turns=("turn_idx", "size"),
                    first_turn=("turn_idx", "min")).reset_index()
        out["first_turn"] = out["first_turn"].astype("int32")
        out["n_turns"] = out["n_turns"].astype("int64")
        return out[["conv_id", "first_turn", "n_turns", "text"]]

    frag = transcripts.map_batches(fragments, batch_format="pandas")
    bucketed = frag.map_batches(
        lambda t: add_hash_bucket(t, ["conv_id"], 64),
        batch_format="pyarrow",
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "first_turn"], kind="mergesort")
        g = df.groupby("conv_id", sort=False)
        out = g.agg(text=("text", sep.join),
                    n_turns=("n_turns", "sum")).reset_index()
        out["text_md5"] = [hashlib.md5(t.encode()).hexdigest()
                           for t in out["text"]]
        return out[["conv_id", "n_turns", "text_md5"]]

    return bucketed.groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas")


def tool_report(transcripts):
    """Tool-usage report over agent transcripts: per tool, how many
    calls, how many DISTINCT conversations used it, and the average
    tool-output length.

    Output: (tool, n_calls, n_convs, avg_chars[4dp]). Distinct-conv
    counting is the two-phase grouped-distinct (collapse to
    (tool, conv_id) first — bucketed, corpus-scale keyspace — then a
    tree final over the tool-sized stream)."""
    from easyner_ray.ops.relational import grouped_agg

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("tool")))
        return pa.Table.from_arrays(
            [t.column("tool"), t.column("conv_id"), _chars(t)],
            names=["tool", "conv_id", "chars"],
        )

    per_tc = grouped_agg(
        transcripts.map_batches(prep, batch_format="pyarrow"),
        ["tool", "conv_id"],
        [("conv_id", "count", "n_calls"), ("chars", "sum", "chars")],
    )
    agg = grouped_agg(
        per_tc,
        ["tool"],
        [
            ("conv_id", "count", "n_convs"),
            ("n_calls", "sum", "n_calls"),
            ("chars", "sum", "__chars"),
        ],
        final="tree",  # tool vocabulary is tiny
    )

    def derive(t: pa.Table) -> pa.Table:
        # final table is tool-sized: Python round() keeps the 4dp grain
        # bit-equal with DuckDB (pc.round is one ulp off half-even SQL)
        chars = t.column("__chars").to_pylist()
        calls = t.column("n_calls").to_pylist()
        avg = pa.array([round(c / n, 4) for c, n in zip(chars, calls)], _F64)
        return t.drop(["__chars"]).append_column("avg_chars", avg)

    return agg.map_batches(derive, batch_format="pyarrow")


def reply_pairs(transcripts):
    """SFT prompt->response pair extraction: every (user turn, directly
    following assistant turn) pair, with char lengths.

    Output: (conv_id, turn_idx, prompt, response, prompt_chars,
    response_chars) where ``turn_idx`` is the USER turn's index. One
    bucketed lead() exchange (``partitioned_analytics``), then a
    map-only filter+project."""
    from easyner_ray.ops.analytic import partitioned_analytics

    led = partitioned_analytics(
        transcripts.map_batches(
            lambda t: t.select(["conv_id", "turn_idx", "role", "text"]),
            batch_format="pyarrow"),
        ["conv_id"], ["turn_idx"],
        [("lead", "role", "__nrole"), ("lead", "text", "__ntext")],
    )

    def project(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t.column("role"), "user"),
                       pc.equal(t.column("__nrole"), "assistant"))
        t = t.filter(pc.fill_null(mask, False))
        return pa.Table.from_arrays(
            [
                t.column("conv_id"),
                t.column("turn_idx"),
                t.column("text"),
                t.column("__ntext"),
                _chars(t, "text"),
                _chars(t, "__ntext"),
            ],
            names=["conv_id", "turn_idx", "prompt", "response",
                   "prompt_chars", "response_chars"],
        )

    return led.map_batches(project, batch_format="pyarrow")


def last_turns(transcripts, n: int = 3):
    """Context-tail windowing: keep each conversation's LAST ``n`` turns
    (fine-tuning on recent context; the conversation-level analog of the
    per-document ``truncate_tokens``).

    Output: (conv_id, turn_idx, role, text). Per-conv max(turn_idx) is a
    bucketed two-phase aggregate joined back through ``adaptive_join``
    (broadcast under the 64 MB gate, hash-shuffle above — the #convs
    side scales with the corpus)."""
    from easyner_ray.ops.relational import adaptive_join, grouped_agg

    turns = transcripts.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "role", "text"]),
        batch_format="pyarrow",
    ).materialize()  # two consumers: max pass + join left side
    maxima = grouped_agg(
        turns, ["conv_id"], [("turn_idx", "max", "__mx")])
    joined = adaptive_join(turns, maxima, on="conv_id")

    def cut(t: pa.Table) -> pa.Table:
        keep = pc.greater(
            t.column("turn_idx"), pc.subtract(t.column("__mx"), n))
        return t.filter(keep).drop(["__mx"])

    return joined.map_batches(cut, batch_format="pyarrow")


def turn_gaps(transcripts):
    """Per-conversation turn-latency profile: seconds between
    consecutive turns (by ``ts``), aggregated to count / mean / max.

    Output: (conv_id, n_gaps, avg_gap_s, max_gap_s). Gap seconds are
    exact (microsecond int deltas / 1e6: one correctly-rounded IEEE op
    in both engines), so avg/max need no rounding grain. One lag()
    exchange + bucketed grouped final."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import grouped_agg

    led = partitioned_analytics(
        transcripts.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("conv_id"), t.column("turn_idx"),
                 t.column("ts").cast(pa.int64())],
                names=["conv_id", "turn_idx", "ts_us"]),
            batch_format="pyarrow"),
        ["conv_id"], ["turn_idx"],
        [("lag", "ts_us", "__prev_us")],
    )

    def gap(t: pa.Table) -> pa.Table:
        g = pc.divide(
            pc.subtract(t.column("ts_us"), t.column("__prev_us"))
            .cast(_F64),
            pa.scalar(1_000_000.0),
        )
        return pa.Table.from_arrays(
            [t.column("conv_id"), g], names=["conv_id", "gap_s"])

    gaps = led.map_batches(gap, batch_format="pyarrow")
    return grouped_agg(
        gaps,
        ["conv_id"],
        [
            ("gap_s", "count", "n_gaps"),
            ("gap_s", "mean", "avg_gap_s"),
            ("gap_s", "max", "max_gap_s"),
        ],
    )


def schema_valid_conversations(transcripts,
                               schema: tuple[str, ...] = (
                                   "user", "assistant", "tool")):
    """Role-schema validation for agent transcripts: keep only
    conversations whose role sequence follows the cyclic ``schema``
    (turn i must carry ``schema[i % len(schema)]``) — the
    structural-integrity gate a transcript-training pipeline runs before
    pair extraction.

    Output: the surviving turns (conv_id, turn_idx, role, text). The
    validity bit is computed vectorized per batch; per-conv all()
    reduces through the bucketed grouped min; survivors filter back via
    ``adaptive_semi_join`` (broadcast under the gate, shuffle above)."""
    from easyner_ray.ops.relational import adaptive_semi_join, grouped_agg

    expected = pa.array(list(schema), pa.string())
    k = len(schema)

    turns = transcripts.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "role", "text"]),
        batch_format="pyarrow",
    ).materialize()  # two consumers: validity pass + filter left side

    def validity(t: pa.Table) -> pa.Table:
        idx = t.column("turn_idx").to_numpy(zero_copy_only=False) % k
        exp = expected.take(pa.array(idx, pa.int64()))
        ok = pc.fill_null(
            pc.equal(t.column("role").combine_chunks(), exp), False
        ).cast(pa.int64())
        return pa.Table.from_arrays(
            [t.column("conv_id"), ok], names=["conv_id", "ok"])

    per_conv = grouped_agg(
        turns.map_batches(validity, batch_format="pyarrow"),
        ["conv_id"], [("ok", "min", "all_ok")],
    )
    valid = per_conv.map_batches(
        lambda t: t.filter(pc.equal(t.column("all_ok"), 1))
        .select(["conv_id"]),
        batch_format="pyarrow",
    )
    return adaptive_semi_join(turns, valid, on="conv_id")


def sft_pairs(transcripts, *, min_prompt_chars: int = 1,
              min_response_chars: int = 1,
              schema: tuple[str, ...] = ("user", "assistant", "tool")):
    """End-to-end SFT training-pair preparation chain:

      1. role-schema gate (:func:`schema_valid_conversations`),
      2. prompt->response extraction (:func:`reply_pairs`),
      3. length-based quality filter (map-only),
      4. exact pair dedup keyed on (prompt, response) with the
         lexicographically-smallest ``conv_id#turn_idx`` representative.

    Output: (pair_id, prompt, response, prompt_chars, response_chars,
    n_copies). Exchanges: the schema gate's grouped min + semi join, the
    lead() bucket shuffle, and the dedup's bucketed grouped final — all
    existing corpus-scale shapes; the quality filter fuses into the pair
    projection."""
    pairs = reply_pairs(schema_valid_conversations(transcripts, schema))

    def qfilter(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("prompt_chars"), min_prompt_chars),
            pc.greater_equal(t.column("response_chars"), min_response_chars),
        )
        t = t.filter(keep)
        pad = pc.utf8_lpad(
            t.column("turn_idx").cast(pa.string()), 8, padding="0")
        pair_key = pc.binary_join_element_wise(
            t.column("conv_id").combine_chunks().cast(pa.string()), pad, "#")
        return pa.Table.from_arrays(
            [pair_key, t.column("prompt"), t.column("response"),
             t.column("prompt_chars"), t.column("response_chars")],
            names=["pair_key", "prompt", "response",
                   "prompt_chars", "response_chars"],
        )

    from easyner_ray.ops.relational import grouped_agg

    return grouped_agg(
        pairs.map_batches(qfilter, batch_format="pyarrow"),
        ["prompt", "response"],
        [
            ("pair_key", "min", "pair_id"),
            ("pair_key", "count", "n_copies"),
            ("prompt_chars", "min", "prompt_chars"),
            ("response_chars", "min", "response_chars"),
        ],
    )


def context_windows(transcripts, k: int = 3, *, sep: str = "\n",
                    target_role: str = "assistant"):
    """Multi-turn context-window assembly: for every ``target_role``
    turn, emit the concatenation of the up-to-``k`` preceding turns in
    the same conversation as training ``context`` and the turn's own
    text as ``target`` — the standard multi-turn SFT example layout.

    Output: (conv_id, turn_idx, context, target); conversation-opening
    targets with no preceding turn carry an empty context. One bucketed
    exchange on ``conv_id`` (same shape as ``partitioned_analytics``);
    the kernel folds ``k`` shifted text columns with element-wise Arrow
    kernels (concat_ws semantics) — no per-row Python."""
    from easyner_ray.ops.relational import add_hash_bucket

    if k < 1:
        raise ValueError("k must be >= 1")

    bucketed = transcripts.map_batches(
        lambda t: add_hash_bucket(
            t.select(["conv_id", "turn_idx", "role", "text"]),
            ["conv_id"], 64),
        batch_format="pyarrow",
    )

    def kernel(t: pa.Table) -> pa.Table:
        if "__bucket" in t.schema.names:
            t = t.drop(["__bucket"])
        n = len(t)
        out_schema = pa.schema([
            ("conv_id", pa.string()), ("turn_idx", pa.int32()),
            ("context", pa.string()), ("target", pa.string()),
        ])
        if n == 0:
            return out_schema.empty_table()
        t = t.take(pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
        conv = t.column("conv_id").combine_chunks()
        text = t.column("text").combine_chunks()
        # shift-by-d text columns, nulled where the shifted row crosses a
        # conversation boundary, folded left-to-right with concat_ws(sep)
        # semantics: null elements are skipped, empty strings kept.
        # (binary_join_element_wise(null_handling="skip") cannot be used
        # here: it DROPS rows whose inputs are all null, changing length.)
        idx = np.arange(n, dtype=np.int64)
        ctx = pa.array([""] * n, pa.string())
        started = pa.array(np.zeros(n, dtype=bool))
        for d in range(k, 0, -1):
            src = np.maximum(idx - d, 0)
            prev_conv = conv.take(pa.array(src))
            in_conv = pc.and_(
                pc.equal(prev_conv, conv), pa.array(idx - d >= 0))
            s = pc.if_else(in_conv, text.take(pa.array(src)),
                           pa.scalar(None, pa.string()))
            sv = pc.is_valid(s)
            sf = pc.fill_null(s, "")
            joined = pc.binary_join_element_wise(ctx, sf, sep)
            ctx = pc.if_else(sv, pc.if_else(started, joined, sf), ctx)
            started = pc.or_(started, sv)
        keep = pc.equal(t.column("role"), target_role)
        return pa.Table.from_arrays(
            [conv, t.column("turn_idx").combine_chunks().cast(pa.int32()),
             ctx, text],
            names=["conv_id", "turn_idx", "context", "target"],
        ).filter(keep)

    return bucketed.groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow")


def template_turns(transcripts, *, min_convs: int = 3):
    """Cross-conversation boilerplate census: normalized turn texts
    (lower + whitespace-trim, empties dropped) that appear in at least
    ``min_convs`` DISTINCT conversations.

    Output: ``(role, text_norm, n_convs, n_turns)`` — the template
    blocklist an SFT curation pass subtracts (canned greetings, repeated
    tool payloads), the transcript-granularity analog of corpus
    duplicate-line removal (``ops.textstats.duplicate_lines``).

    Shuffle discipline: turns first collapse to DISTINCT
    ``(role, digest, conv)`` triples with per-conversation repeat counts
    (md5 of the normalized text — fixed-width keys, so the wide exchange
    never ships the text bodies more than once per (text, conv) pair),
    then a digest-keyed count-distinct; the exemplar text rides along as
    ``min`` (equal to the unique preimage absent md5 collisions)."""
    from easyner_ray.ops.relational import grouped_agg

    def norm(t: pa.Table) -> pa.Table:
        txt = pc.utf8_trim_whitespace(
            pc.utf8_lower(t.column("text").fill_null("")))
        t = pa.table({"role": t.column("role"),
                      "text_norm": txt,
                      "conv_id": t.column("conv_id")})
        t = t.filter(pc.not_equal(t.column("text_norm"), ""))
        import hashlib

        dig = pa.array(
            [hashlib.md5(s.encode()).hexdigest()
             for s in t.column("text_norm").to_pylist()], pa.string())
        return t.append_column("digest", dig)

    per_conv = grouped_agg(
        transcripts.select_columns(["conv_id", "role", "text"])
        .map_batches(norm, batch_format="pyarrow"),
        ["role", "digest", "conv_id"],
        [("text_norm", "min", "text_norm"),
         ("text_norm", "count", "n_in_conv")],
    )
    out = grouped_agg(
        per_conv,
        ["role", "digest"],
        [("text_norm", "min", "text_norm"),
         ("conv_id", "count", "n_convs"),
         ("n_in_conv", "sum", "n_turns")],
    ).map_batches(
        lambda t, m=int(min_convs): t.filter(
            pc.greater_equal(t.column("n_convs"), m)),
        batch_format="pyarrow")
    return out.select_columns(["role", "text_norm", "n_convs", "n_turns"])


# Imperative openers for the dialogue-act heuristic: a turn whose first
# word is one of these (and that doesn't end in '?') reads as a command /
# instruction. Public folk knowledge — the rule-based act taggers used to
# profile instruct data all key on an opener list of this shape.
COMMAND_VERBS = (
    "add", "check", "create", "describe", "explain", "find", "fix",
    "generate", "give", "help", "list", "make", "please", "remove",
    "run", "show", "summarize", "tell", "update", "write",
)

_WS = " \t\n\r"


def dialog_acts(transcripts, *, commands=COMMAND_VERBS):
    """Rule-based dialogue-act profile per conversation: each turn is
    tagged ``question`` (trimmed text ends with '?'), ``command``
    (first word is an imperative opener from ``commands``), ``empty``
    (no text), else ``statement`` -> one ``(conv_id, act, n_turns)``
    row per observed act — the shape an SFT-mix designer reads to
    balance instruction-following vs Q&A vs chitchat conversations.

    Map-only tagging with whole-column kernels (trim / ends_with /
    one anchored ``extract_regex`` for the first word / set
    membership); the only exchange is the two-phase grouped count on
    the (conversation x 4-act) keyspace."""
    import numpy as np

    from easyner_ray.ops.relational import grouped_agg

    cmd_set = pa.array(sorted(set(commands)), pa.string())

    def tag(t: pa.Table) -> pa.Table:
        txt = pc.utf8_trim(pc.coalesce(t.column("text"), ""), _WS)
        low = pc.utf8_lower(txt)
        first = pc.struct_field(
            pc.extract_regex(low, r"^(?P<w>[a-z]+)"), "w")
        is_cmd = pc.coalesce(pc.is_in(first, value_set=cmd_set),
                             pa.scalar(False))
        act = pc.if_else(
            pc.equal(txt, ""), pa.scalar("empty"),
            pc.if_else(
                pc.ends_with(txt, pattern="?"), pa.scalar("question"),
                pc.if_else(is_cmd, pa.scalar("command"),
                           pa.scalar("statement"))))
        return pa.Table.from_arrays(
            [t.column("conv_id"), act,
             pa.array(np.ones(len(t), dtype=np.int64))],
            names=["conv_id", "act", "one"])

    return grouped_agg(
        transcripts.map_batches(tag, batch_format="pyarrow"),
        ["conv_id", "act"], [("one", "sum", "n_turns")])


def parrot_score(transcripts, *, n: int = 2, batch_size: int = 2048):
    """Per-reply echo ("parrot") score — an SFT curation signal the
    refusal scan and length gates miss: for every (user prompt ->
    assistant response) pair, what fraction of the response's DISTINCT
    word ``n``-grams already appear in the prompt it answers. High
    scores flag replies that mostly restate the question (low training
    value); the TF-IDF token convention (maximal ``[a-z0-9]+`` runs of
    the lowercase text) keeps it punctuation-robust.

    Output: ``(conv_id, turn_idx, n_resp_ngrams, n_echoed, echo_frac)``
    with ``turn_idx`` = the USER turn (the :func:`reply_pairs` key);
    replies with zero shingles emit no row (SQL: no shingles, no
    group); ``echo_frac`` is one IEEE division — bit-exact cross-engine.

    Scale shape: downstream of :func:`reply_pairs`' single bucketed
    lead() exchange this is MAP-ONLY — prompt and response live on the
    same row, so the overlap test is batch-local: both sides shingle
    through the same vectorized kernel as ``textstats.tfidf``
    (row-index-tagged), one ``is_in`` per batch scores membership,
    one within-batch Arrow group_by folds per reply. Nothing shuffles,
    nothing broadcasts."""
    from easyner_ray.ops.textstats import _shingle_partial

    def shingles(col: pa.ChunkedArray, nrows: int) -> pa.Table:
        t = pa.Table.from_arrays(
            [pa.array(np.arange(nrows, dtype=np.int64)),
             col.combine_chunks()], names=["__r", "__txt"])
        return _shingle_partial(t, n=n, id_col="__r", text_col="__txt")

    def score(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [t.schema.field("conv_id"), t.schema.field("turn_idx"),
             ("n_resp_ngrams", pa.int64()), ("n_echoed", pa.int64()),
             ("echo_frac", pa.float64())])
        nrows = len(t)
        resp = shingles(t.column("response"), nrows)
        if len(resp) == 0:
            return out_schema.empty_table()
        prm = shingles(t.column("prompt"), nrows)

        def keyed(s: pa.Table) -> pa.Array:
            return pc.binary_join_element_wise(
                pc.cast(s.column("__r"), pa.string()),
                s.column("shingle"), "\x1f")

        flag = pc.is_in(keyed(resp), value_set=keyed(prm)) \
            .cast(pa.int64())
        per = pa.Table.from_arrays(
            [resp.column("__r"), flag], names=["__r", "f"]) \
            .group_by(["__r"]).aggregate([("f", "count"), ("f", "sum")])
        ridx = per.column("__r").combine_chunks()
        ns = per.column("f_count").cast(pa.int64())
        ne = per.column("f_sum").cast(pa.int64())
        frac = pc.divide(ne.cast(pa.float64()), ns.cast(pa.float64()))
        return pa.Table.from_arrays(
            [t.column("conv_id").take(ridx), t.column("turn_idx").take(ridx),
             ns, ne, frac], schema=out_schema)

    return reply_pairs(transcripts).map_batches(
        score, batch_format="pyarrow", batch_size=batch_size)


def assemble_conversations(transcripts, sep: str = "\n"):
    """Whole-dialog document assembly: -> ``(conv_id, n_turns, text)``
    with ``text`` = the conversation's turn texts joined by ``sep`` in
    turn order — the input shape for running DOCUMENT-level curation
    ops (C4 line rules, quality gates, dedup) at conversation
    granularity, where each turn is one "line".

    Same two-phase fragment exchange as :func:`conv_fingerprint`
    (ordered per-batch partials, one bucket shuffle joins the 1-2
    fragments per conversation; contiguous-per-block input contract) —
    that op reduces to a digest immediately, this one keeps the
    assembled text as the payload. Both phases are Arrow-vectorized:
    one C++ sort, numpy group boundaries, a zero-copy ListArray over
    the sorted texts and ``pc.binary_join`` — no per-group Python
    string joins (the pandas ``sep.join`` agg this replaced was the
    stage's dominant cost at bench scale)."""
    import numpy as np

    from easyner_ray.ops.relational import add_hash_bucket

    def _join_ordered(t: pa.Table, order_col: str, n_col: str | None):
        """(conv_id, first_order, n, text): per-group ordered join.
        ``n`` sums ``n_col`` when given (fragment counts), else group
        sizes."""
        idx = pc.sort_indices(t, sort_keys=[("conv_id", "ascending"),
                                            (order_col, "ascending")])
        conv_s = t.column("conv_id").combine_chunks().take(idx)
        if isinstance(conv_s, pa.ChunkedArray):
            conv_s = conv_s.combine_chunks()
        text_s = t.column("text").combine_chunks().take(idx)
        if isinstance(text_s, pa.ChunkedArray):
            text_s = text_s.combine_chunks()
        neq = pc.not_equal(conv_s.slice(1), conv_s.slice(0, len(conv_s) - 1))
        starts = np.r_[0, np.flatnonzero(
            neq.to_numpy(zero_copy_only=False)) + 1]
        offsets = np.r_[starts, len(conv_s)].astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), text_s), sep)
        first = t.column(order_col).combine_chunks().take(idx) \
            .take(pa.array(starts))
        if n_col is None:
            n = pa.array(np.diff(offsets).astype(np.int64))
        else:
            seg = t.column(n_col).combine_chunks().take(idx) \
                .to_numpy(zero_copy_only=False)
            n = pa.array(np.add.reduceat(seg, starts).astype(np.int64))
        return conv_s.take(pa.array(starts)), first, n, joined

    def fragments(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([("conv_id", pa.string()),
                              ("first_turn", pa.int32()),
                              ("n_turns", pa.int64()),
                              ("text", pa.string())]).empty_table()
        conv, first, n, joined = _join_ordered(t, "turn_idx", None)
        return pa.Table.from_arrays(
            [conv, first.cast(pa.int32()), n, joined],
            names=["conv_id", "first_turn", "n_turns", "text"])

    frag = transcripts.map_batches(fragments, batch_format="pyarrow")
    bucketed = frag.map_batches(
        lambda t: add_hash_bucket(t, ["conv_id"], 64),
        batch_format="pyarrow",
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([("conv_id", pa.string()),
                              ("n_turns", pa.int64()),
                              ("text", pa.string())]).empty_table()
        conv, _first, n, joined = _join_ordered(t, "first_turn", "n_turns")
        return pa.Table.from_arrays([conv, n, joined],
                                    names=["conv_id", "n_turns", "text"])

    return bucketed.groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow")


def tool_transitions(transcripts):
    """Tool-call chain census: ``(tool, next_tool, n)`` counts over each
    conversation's ORDERED subsequence of tool-bearing turns (non-tool
    turns are skipped, so "next" means the next tool CALL, however many
    chat turns later) — the workflow-mining signal of agent transcripts
    (which tools chain into which; the argmax row per tool is the
    de-facto pipeline).

    Scale shape: prune to the tool-bearing rows first (map-only filter,
    typically a small fraction of the turn stream), sequence them with
    ONE bucketed lead() exchange (``ops.analytic.partitioned_analytics``
    partitioned by conv — the same shuffle every windowed op here pays),
    then a vocab^2-bounded two-phase grouped count. No corpus-sized
    driver pulls; the pair keyspace is |tools|^2."""
    from easyner_ray.ops.analytic import partitioned_analytics
    from easyner_ray.ops.relational import grouped_agg

    def prune(t: pa.Table) -> pa.Table:
        tool = t.column("tool")
        keep = pc.and_kleene(pc.is_valid(tool),
                             pc.not_equal(tool, ""))
        return t.select(["conv_id", "turn_idx", "tool"]) \
            .filter(pc.fill_null(keep, False))

    calls = transcripts.map_batches(prune, batch_format="pyarrow")
    led = partitioned_analytics(calls, ["conv_id"], ["turn_idx"],
                                [("lead", "tool", "next_tool")])

    def pairs(t: pa.Table) -> pa.Table:
        return t.select(["tool", "next_tool"]).filter(
            pc.is_valid(t.column("next_tool")))

    return grouped_agg(
        led.map_batches(pairs, batch_format="pyarrow"),
        ["tool", "next_tool"], [("tool", "count", "n")])


def compression_ratio(transcripts, *, level: int = 6, sep: str = "\n",
                      batch_size: int = 2048, assembled=None):
    """Per-conversation zlib compressibility census -> (conv_id, n_turns,
    raw_bytes, comp_bytes): DEFLATE-compressed size of the assembled
    dialog vs its raw UTF-8 size — the classic "templated/repetitive
    text compresses too well" quality gate (compression-ratio filtering;
    ratio = comp/raw is the caller's division, both sizes exact int64).

    Rides :func:`assemble_conversations` (one bucketed fragment
    exchange), then a map-only batch kernel. The per-row loop is
    deliberate: zlib.compress is the work and it is C — the Python
    overhead per conversation is noise next to DEFLATE over its bytes.
    ``level`` is pinned so the derived gold (same zlib build, straight-
    line recompute) is byte-identical.

    ``assembled`` short-circuits the assembly when the caller already
    holds the :func:`assemble_conversations` output (shared-upstream
    memoization); ``transcripts``/``sep`` are ignored then."""
    import zlib

    conv = assembled if assembled is not None else \
        assemble_conversations(transcripts, sep=sep)

    def f(t: pa.Table, lv=level) -> pa.Table:
        texts = t.column("text").to_pylist()
        enc = [(x or "").encode("utf-8") for x in texts]
        return pa.table({
            "conv_id": t.column("conv_id"),
            "n_turns": t.column("n_turns").cast(pa.int64()),
            "raw_bytes": pa.array([len(b) for b in enc], pa.int64()),
            "comp_bytes": pa.array([len(zlib.compress(b, lv)) for b in enc],
                                   pa.int64())})

    return conv.map_batches(f, batch_format="pyarrow",
                            batch_size=batch_size)
