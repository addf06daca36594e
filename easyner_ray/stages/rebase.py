"""Span re-basing: sentence-local mention offsets -> turn/document-level
offsets (reference M7/M8, ``convert_easyner_output_json_to_pubtator.py``).

The reference re-concatenates sentences with ``" ".join`` and shifts spans
by a running ``len(sent)+1`` cursor (``:34-57``). The engine carries the
exact ``char_start`` of every sentence from the splitter, so re-basing is a
single vectorized add — no reassembly pass, no join: ``doc_start =
char_start + start``. The newline normalizer (M7, ``:26-30``) is a
whole-column regex kernel.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def normalize_newlines(ds, cols=("text",)):
    """M7: collapse newline runs to one space (reference ``re.sub(r'\\n+', ' ')``)."""

    def f(batch: pa.Table) -> pa.Table:
        for c in cols:
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(
                i, c, pc.replace_substring_regex(batch.column(c), r"\n+", " ")
            )
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def rebase_mentions(mentions_with_char_start, batch_size: int = 65536):
    """mentions rows carrying the sentence ``char_start`` column ->
    same rows plus ``doc_start``/``doc_end`` (turn-level offsets).

    Input: the flat mentions table joined to its sentence's char_start.
    Pure vectorized arithmetic; the per-turn offsets are exact because the
    sentencizer's spans tile the turn text (functions.sentencize).
    """

    def f(batch: pa.Table) -> pa.Table:
        cs = batch.column("char_start").cast(pa.int32())
        batch = batch.append_column(
            "doc_start", pc.add(batch.column("start").cast(pa.int32()), cs)
        )
        return batch.append_column(
            "doc_end", pc.add(batch.column("end").cast(pa.int32()), cs)
        )

    return mentions_with_char_start.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def mentions_with_char_start(sentences, mentions):
    """Attach each sentence's ``char_start`` to its (flat) mentions rows.

    FALLBACK for pipelines that dropped ``char_start`` before tagging —
    prefer ``tag_mentions(..., keep_cols=("char_start",))``, which carries
    the offset through tag time and makes re-basing a pure vectorized add
    with no join at all.

    Fully distributed: both sides shuffle on a coarse hash bucket of the
    sentence key; each bucket equi-joins in Arrow C++. No driver-side
    materialization (the previous broadcast-dict form held every sentence
    key on the driver — O(corpus) memory)."""
    from easyner_ray.ops.relational import add_hash_bucket

    KEYS = ["conv_id", "turn_idx", "sent_idx"]
    m_schema = mentions.schema()
    m_names = list(m_schema.names)
    m_types = dict(zip(m_schema.names, m_schema.types))

    def s_rows(t: pa.Table) -> pa.Table:
        out = t.select(KEYS + ["char_start"])
        for c in m_names:
            if c not in out.schema.names:
                out = out.append_column(c, pa.nulls(len(out), m_types[c]))
        return out.append_column("__side", pa.array([0] * len(out), pa.int8()))

    def m_rows(t: pa.Table) -> pa.Table:
        out = t.append_column("char_start", pa.nulls(len(t), pa.int32()))
        return out.append_column("__side", pa.array([1] * len(out), pa.int8()))

    s = sentences.map_batches(s_rows, batch_format="pyarrow")
    m = mentions.map_batches(m_rows, batch_format="pyarrow")
    unioned = s.union(m).map_batches(
        lambda t: add_hash_bucket(t, KEYS, 64), batch_format="pyarrow"
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        sid = t.filter(pc.equal(t.column("__side"), 0)).select(KEYS + ["char_start"])
        mid = t.filter(pc.equal(t.column("__side"), 1)).select(m_names)
        return mid.join(sid, keys=KEYS, join_type="inner")

    return unioned.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
