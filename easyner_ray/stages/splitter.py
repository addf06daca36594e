"""Sentence-split explode stage (reference splitter module, re-expressed).

The reference reloads a spaCy model per text and writes numbered JSON batch
files (reference ``splitter.py:18-75``); here the sentencizer is a
module-level compiled-regex function applied inside ``map_batches`` over
Arrow batches: one input turn row explodes into N ordered sentence rows
carrying ``(conv_id, turn_idx, sent_idx, char_start)`` so order never
depends on block arrival (SURVEY.md §2.9 stable-turn-ordering invariant).

Long-conversation skew is defused here by construction: a 10^4-turn
conversation is 10^4 independent input rows, so its sentences spread across
blocks instead of serializing in one task (SURVEY.md §4).
"""

from __future__ import annotations

import pyarrow as pa

from easyner_ray import schemas
from easyner_ray.functions.sentencize import sentencize


def split_batch(batch: pa.Table, with_tokens: bool = False) -> pa.Table:
    """Arrow in / Arrow out: explode turn rows into sentence rows.

    ``with_tokens`` mirrors the reference's opt-in token store
    (``ner_main.py:63-69``): appends a ``tokens`` list<string> column.
    """
    texts = batch.column("text").to_pylist()

    # sentence -> parent turn indices; conv/turn key columns replicate via
    # one vectorized take instead of a Python append per sentence
    parent: list[int] = []
    o_sent: list[int] = []
    o_text: list[str] = []
    o_start: list[int] = []
    for row, text in enumerate(texts):
        if not text:
            continue
        for sent_idx, (char_start, sent) in enumerate(sentencize(text)):
            parent.append(row)
            o_sent.append(sent_idx)
            o_text.append(sent)
            o_start.append(char_start)

    idx = pa.array(parent, pa.int64())
    out = pa.Table.from_arrays(
        [
            batch.column("conv_id").take(idx),
            batch.column("turn_idx").cast(pa.int32()).take(idx),
            pa.array(o_sent, pa.int32()),
            pa.array(o_text, pa.string()),
            pa.array(o_start, pa.int32()),
        ],
        schema=schemas.SENTENCES,
    )
    if with_tokens:
        from easyner_ray.functions.tokenize import tokenize

        out = out.append_column(
            "tokens", pa.array([tokenize(t) for t in o_text], pa.list_(pa.string()))
        )
    return out


def split_sentences(transcripts, batch_size: int = 2048, with_tokens: bool = False):
    """transcripts Dataset -> sentences Dataset (stateless tasks: the
    sentencizer has no model state, so an actor pool would add nothing)."""
    return transcripts.map_batches(
        lambda b: split_batch(b, with_tokens=with_tokens),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def reassemble_turns(sentences, batch_size: int = 8192, n_buckets: int = 64):
    """Inverse of :func:`split_sentences` — per-turn text via the
    reference's ``" ".join`` rule over sentences sorted by ``sent_idx``
    (reference ``convert_easyner_output_json_to_pubtator.py:34-57``).
    Used by the per-turn text-equality gate and the PubTator-style exporter.

    Two-phase to avoid a Python map_groups call per turn: phase 1 joins the
    (contiguous) sentences of each turn *within a batch* into a fragment
    keyed by its first ``sent_idx`` — explode preserved input order, so a
    turn spans at most two adjacent batches; phase 2 shuffles fragments on
    a coarse hash bucket of (conv_id, turn_idx) and joins the 1-2 fragments
    per turn with a vectorized pandas groupby-agg inside the bucket.
    """
    import pandas as pd

    from easyner_ray.ops.relational import add_hash_bucket

    def fragments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx", "sent_idx"], kind="mergesort")
        g = df.groupby(["conv_id", "turn_idx"], sort=False)
        out = g.agg(text=("text", " ".join), first_sent=("sent_idx", "min")).reset_index()
        out["first_sent"] = out["first_sent"].astype("int32")
        out["turn_idx"] = out["turn_idx"].astype("int32")
        return out[["conv_id", "turn_idx", "first_sent", "text"]]

    frag = sentences.map_batches(fragments, batch_format="pandas", batch_size=batch_size)
    bucketed = frag.map_batches(
        lambda t: add_hash_bucket(t, ["conv_id", "turn_idx"], n_buckets),
        batch_format="pyarrow",
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx", "first_sent"], kind="mergesort")
        g = df.groupby(["conv_id", "turn_idx"], sort=False)
        out = g.agg(text=("text", " ".join)).reset_index()
        out["turn_idx"] = out["turn_idx"].astype("int32")
        return out[["conv_id", "turn_idx", "text"]]

    return bucketed.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
