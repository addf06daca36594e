"""PubTator export — the reference's evaluation-harness artifact surface
(reference ``supplementary/experiment_scripts/convert_easyner_output_json_
to_pubtator.py:34-130``): per document a ``id|t|<text>`` line followed by
one TAB-separated annotation line per mention
(``id<TAB>start<TAB>end<TAB>mention<TAB>type<TAB>norm``) and a blank line.

Engine realization: a document is a (conv_id, turn_idx) turn; mention
offsets are the doc-level spans produced by ``stages.rebase`` (the
reference re-derives them with a running ``len(sent)+1`` cursor — engine
spans are exact from the splitter, same values). The writer is a bucketed
group task per coarse hash of the doc key: each task formats its docs and
writes ONE file under ``out_dir`` (``pubtator-<bucket>.txt``) — partitioned
output, never one giant file. Newlines in text are normalized away first
(reference ``strip_multi_newline``); ids embed the turn as
``<conv_id>:<turn_idx>``.

``load_pubtator_mentions`` parses the annotation lines back (the
text-line side is ``sources.loaders.load_pubtator``), closing the
round-trip: write -> load == input mentions, tested.
"""

from __future__ import annotations

import os
import re

import pandas as pd
import pyarrow as pa

from easyner_ray.ops.relational import add_hash_bucket

_NL = re.compile(r"\n+")
_SEP_SPACE = re.compile(r"\s*([^\w\s])\s*")


def _surface_norm(x: str) -> str:
    """Casefold + collapse spaces around separators: the model path's
    surfaces are the uncased tokenizer's detokenized words ('gsk - 3' for
    sentence text 'GSK-3' — reference entity_parser.py:36 applies the same
    fix), so byte equality with the text slice is NOT expected; offset
    drift still breaks this normalized equality."""
    return _SEP_SPACE.sub(r"\1", x.lower())


def _format_doc(doc_id: str, text: str, ments: list[tuple[int, int, str, str, str]]) -> str:
    written = _NL.sub(" ", text).strip()
    lines = [f"{doc_id}|t|{written}"]
    for s, e, surf, cls, norm in ments:
        # offsets are char_start-based in the ORIGINAL text; they index the
        # written line only when newline-collapse/strip didn't shift chars
        # before the span. Validate at write time so drift is a hard error,
        # never a silently-corrupt artifact.
        if _surface_norm(written[s:e]) != _surface_norm(surf):
            raise ValueError(
                f"pubtator offset drift in {doc_id}: [{s}:{e}] slices "
                f"{written[s:e]!r} in the written text, not {surf!r} — "
                "normalize newlines before rebasing (stages.rebase expects "
                "the splitter to have seen the normalized text)"
            )
        lines.append(f"{doc_id}\t{s}\t{e}\t{surf}\t{cls}\t{norm}")
    lines.append("")
    return "\n".join(lines) + "\n"


def write_pubtator(turn_texts, doc_mentions, out_dir: str, n_buckets: int = 16) -> dict:
    """Write PubTator files from turn texts + doc-span mentions.

    ``turn_texts``: Dataset (conv_id, turn_idx, text) — e.g.
    ``stages.splitter.reassemble_turns`` output. ``doc_mentions``: Dataset
    with (conv_id, turn_idx, surface, cls, norm, doc_start, doc_end) —
    ``stages.rebase.rebase_mentions`` output. Both shuffle once on a coarse
    hash bucket of (conv_id, turn_idx); each bucket task writes one file.
    Returns {"files": [paths], "n_docs": int}.
    """
    os.makedirs(out_dir, exist_ok=True)
    KEYS = ["conv_id", "turn_idx"]

    def t_rows(t: pa.Table) -> pa.Table:
        out = t.select(KEYS + ["text"])
        for c, typ in (("surface", pa.string()), ("cls", pa.string()),
                       ("norm", pa.string())):
            out = out.append_column(c, pa.nulls(len(out), typ))
        for c in ("doc_start", "doc_end"):
            out = out.append_column(c, pa.nulls(len(out), pa.int32()))
        return out.append_column("__side", pa.array([0] * len(out), pa.int8()))

    def m_rows(t: pa.Table) -> pa.Table:
        out = t.select(KEYS + ["surface", "cls", "norm"])
        out = out.append_column("doc_start", t.column("doc_start").cast(pa.int32()))
        out = out.append_column("doc_end", t.column("doc_end").cast(pa.int32()))
        out = out.add_column(2, "text", pa.nulls(len(out), pa.string()))
        return out.append_column("__side", pa.array([1] * len(out), pa.int8()))

    s = turn_texts.map_batches(t_rows, batch_format="pyarrow")
    m = doc_mentions.map_batches(m_rows, batch_format="pyarrow")
    unioned = s.union(m).map_batches(
        lambda t: add_hash_bucket(t, KEYS, n_buckets), batch_format="pyarrow"
    )

    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        bucket = int(df["__bucket"].iloc[0])
        texts = df[df["__side"] == 0]
        ments = df[df["__side"] == 1]
        by_doc: dict[tuple, list] = {}
        for r in ments.itertuples(index=False):
            by_doc.setdefault((r.conv_id, r.turn_idx), []).append(
                (int(r.doc_start), int(r.doc_end), r.surface, r.cls, r.norm)
            )
        path = os.path.join(out_dir, f"pubtator-{bucket:04d}.txt")
        n_docs = 0
        with open(path, "w", encoding="utf8") as fh:
            for r in texts.sort_values(["conv_id", "turn_idx"]).itertuples(index=False):
                doc_id = f"{r.conv_id}:{r.turn_idx}"
                ms = sorted(by_doc.get((r.conv_id, r.turn_idx), []))
                fh.write(_format_doc(doc_id, r.text, ms))
                n_docs += 1
        return pd.DataFrame({"bucket": [bucket], "path": [path], "n_docs": [n_docs]})

    manifest = unioned.groupby("__bucket").map_groups(
        write_bucket, batch_format="pandas"
    ).to_pandas()
    return {"files": sorted(manifest["path"]), "n_docs": int(manifest["n_docs"].sum())}


def load_pubtator_mentions(path: str):
    """Parse PubTator annotation lines back into doc-span mention rows
    (conv_id, turn_idx, doc_start, doc_end, surface, cls, norm). ``path``
    may be a file or a directory of ``*.txt``."""
    import ray.data as rd

    lines = rd.read_text(path)

    def parse(batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("conv_id", "turn_idx", "doc_start", "doc_end",
                                "surface", "cls", "norm")}
        for line in batch.column("text").to_pylist():
            parts = line.split("\t")
            if len(parts) != 6:
                continue
            doc_id, s, e, surf, cls, norm = parts
            if ":" not in doc_id:
                continue
            cid, _, tid = doc_id.rpartition(":")
            cols["conv_id"].append(cid)
            cols["turn_idx"].append(int(tid))
            cols["doc_start"].append(int(s))
            cols["doc_end"].append(int(e))
            cols["surface"].append(surf)
            cols["cls"].append(cls)
            cols["norm"].append(norm)
        return pa.Table.from_arrays(
            [
                pa.array(cols["conv_id"], pa.string()),
                pa.array(cols["turn_idx"], pa.int32()),
                pa.array(cols["doc_start"], pa.int32()),
                pa.array(cols["doc_end"], pa.int32()),
                pa.array(cols["surface"], pa.string()),
                pa.array(cols["cls"], pa.string()),
                pa.array(cols["norm"], pa.string()),
            ],
            names=["conv_id", "turn_idx", "doc_start", "doc_end",
                   "surface", "cls", "norm"],
        )

    return lines.map_batches(parse, batch_format="pyarrow")


def raw_articles_to_pubtator(articles, out_path: str | None = None):
    """Raw (pre-NER, annotation-free) articles -> PubTator text blocks —
    the reference's raw-JSON converter
    (``convert_easyner_raw_json_to_pubtator.py``): per article emit
    ``pmid|t|title`` / ``pmid|a|abstract`` with the title stripped and
    multi-newline runs in the abstract collapsed to one space.

    ``articles``: Dataset (doc_id, title, abstract). Map-only (one
    whole-column regex + join per batch — no per-row Python). Returns a
    Dataset (doc_id, block); ``out_path`` additionally writes the single
    concatenated file the reference produces (driver-side — a raw export
    at scale would go through state.sink partitioned text instead)."""
    import pyarrow.compute as pc_

    def to_blocks(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks().cast(pa.string())
        title = pc_.utf8_trim_whitespace(
            t.column("title").combine_chunks().fill_null(""))
        abstract = pc_.utf8_trim_whitespace(pc_.replace_substring_regex(
            t.column("abstract").combine_chunks().fill_null(""),
            r"\n+", " "))
        block = pc_.binary_join_element_wise(
            ids, pa.scalar("|t|"), title, pa.scalar("\n"),
            ids, pa.scalar("|a|"), abstract, pa.scalar("\n\n"), "")
        return pa.Table.from_arrays([ids, block], names=["doc_id", "block"])

    blocks = articles.map_batches(to_blocks, batch_format="pyarrow")
    if out_path is not None:
        rows = sorted(blocks.take_all(), key=lambda r: r["doc_id"])
        with open(out_path, "w", encoding="utf8") as f:
            for r in rows:
                f.write(r["block"])
    return blocks
