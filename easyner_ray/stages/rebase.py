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


def mentions_with_char_start(sentences, sentence_mentions):
    """Attach each sentence's ``char_start`` to its exploded mentions.

    Both inputs explode from the same rows, but re-joining them would be a
    shuffle; instead re-derive mentions from the nested table and look the
    char_start up from the sentence rows via a same-key zip inside one
    pass. Cheapest correct form: carry char_start INTO the nested table at
    tag time — provided here for pipelines that kept the default schema.
    """
    import ray

    # small-side broadcast: (conv,turn,sent) -> char_start
    tbl = pa.concat_tables(
        [ray.get(r) for r in sentences.select_columns(
            ["conv_id", "turn_idx", "sent_idx", "char_start"]).to_arrow_refs()]
    )
    idx = {
        (c, t, s): cs
        for c, t, s, cs in zip(
            tbl.column("conv_id").to_pylist(),
            tbl.column("turn_idx").to_pylist(),
            tbl.column("sent_idx").to_pylist(),
            tbl.column("char_start").to_pylist(),
        )
    }
    idx_ref = ray.put(idx)

    def attach(batch: pa.Table) -> pa.Table:
        m = ray.get(idx_ref)
        cs = [
            m[(c, t, s)]
            for c, t, s in zip(
                batch.column("conv_id").to_pylist(),
                batch.column("turn_idx").to_pylist(),
                batch.column("sent_idx").to_pylist(),
            )
        ]
        return batch.append_column("char_start", pa.array(cs, pa.int32()))

    return sentence_mentions.map_batches(attach, batch_format="pyarrow")
