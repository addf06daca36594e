"""CRAFT corpus preprocessing: PubAnnotation JSON -> IOB2 token rows.

Reference: ``supplementary/experiment_scripts/CRAFT_preprocessing_spacy.py``
(84 LoC) — per document: drop ``_FRAGMENT`` denotations, expand each
entity span to token boundaries (spaCy ``char_span(...,
alignment_mode="expand")``), skip spans overlapping an already-accepted
one via a forward pointer (``create_spans_pointer``), then emit one
``token<TAB>IOB`` line per non-space token (B/I/O only — the reference
writes ``t.ent_iob_`` without the class suffix).

Engine realization: the tokenizer is the engine's regex tokenizer
(functions.tokenize) standing in for scispaCy ``en_core_sci_sm`` — a
documented divergence (scispaCy isn't installed; token BOUNDARIES differ,
the span-expansion/overlap semantics are the parity surface). The
per-document transform runs as map_batches over (doc_id, text,
denotations-json) rows — documents are independent, so the stage
parallelizes like every other map-only stage; the per-doc token loop is
inherent to IOB emission (the reference loops tokens too).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from easyner_ray.functions.tokenize import TOKEN_RE

IOB_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("token_idx", pa.int64()),
        ("token", pa.string()),
        ("iob", pa.string()),
    ]
)


def _expand_spans(text: str, ents: list[dict]) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    """(token offsets, accepted entity char spans) for one document.

    Expansion: a span grows to cover every token it touches (spaCy
    ``alignment_mode="expand"``). Overlap pointer: a span whose expanded
    start OR end lies before the last accepted end is skipped (reference
    ``create_spans_pointer`` — its ``limiting_value`` check verbatim)."""
    toks = [(m.start(), m.end()) for m in TOKEN_RE.finditer(text)]
    if not toks:
        return [], []
    starts = np.array([s for s, _ in toks])
    ends = np.array([e for _, e in toks])
    accepted: list[tuple[int, int]] = []
    limiting = 0
    for e in ents:
        s, t = int(e["start"]), int(e["end"])
        if t <= s:
            continue
        # first token whose end > s .. last token whose start < t
        i = int(np.searchsorted(ends, s, side="right"))
        j = int(np.searchsorted(starts, t, side="left")) - 1
        if i >= len(toks) or j < i:
            continue  # span falls entirely between/after tokens
        exp_s, exp_t = int(starts[i]), int(ends[j])
        if exp_s < limiting or exp_t < limiting:
            continue
        limiting = exp_t
        accepted.append((exp_s, exp_t))
    return toks, accepted


def pubannotation_doc_to_iob(doc_id: str, text: str, denotations: list[dict]) -> list[tuple]:
    """One PubAnnotation document -> [(doc_id, token_idx, token, iob)]."""
    ents = [{"start": d["span"]["begin"], "end": d["span"]["end"]}
            for d in denotations if d.get("obj") != "_FRAGMENT"]
    toks, spans = _expand_spans(text, ents)
    rows = []
    si = 0
    for idx, (s, t) in enumerate(toks):
        while si < len(spans) and spans[si][1] <= s:
            si += 1
        if si < len(spans) and spans[si][0] <= s < spans[si][1]:
            iob = "B" if s == spans[si][0] else "I"
        else:
            iob = "O"
        rows.append((doc_id, idx, text[s:t], iob))
    return rows


def pubannotation_to_iob(docs):
    """Dataset (doc_id, text, denotations:string/*json*/) -> Dataset
    (doc_id, token_idx, token, iob) — the CRAFT IOB2 prep as a map-only
    Ray stage."""

    def f(t: pa.Table) -> pa.Table:
        o_doc, o_idx, o_tok, o_iob = [], [], [], []
        for doc_id, text, den in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
                t.column("denotations").to_pylist()):
            for row in pubannotation_doc_to_iob(
                    doc_id, text or "", json.loads(den) if den else []):
                o_doc.append(row[0])
                o_idx.append(row[1])
                o_tok.append(row[2])
                o_iob.append(row[3])
        return pa.Table.from_arrays(
            [pa.array(o_doc, pa.string()), pa.array(o_idx, pa.int64()),
             pa.array(o_tok, pa.string()), pa.array(o_iob, pa.string())],
            schema=IOB_SCHEMA)

    return docs.map_batches(f, batch_format="pyarrow")


def load_pubannotation_dir(path: str):
    """``*.json`` PubAnnotation files -> Dataset (doc_id, text,
    denotations-json) — the reference globs a directory of per-document
    files."""
    import os

    import ray.data as rd

    ds = rd.read_binary_files(path, file_extensions=["json"],
                              include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        ids, texts, dens = [], [], []
        for p, blob in zip(t.column("path").to_pylist(),
                           t.column("bytes").to_pylist()):
            data = json.loads(blob)
            ids.append(data.get("sourceid")
                       or os.path.splitext(os.path.basename(p))[0])
            texts.append(data.get("text", ""))
            dens.append(json.dumps(data.get("denotations", [])))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(texts, pa.string()),
             pa.array(dens, pa.string())],
            names=["doc_id", "text", "denotations"])

    return ds.map_batches(parse, batch_format="pyarrow")
