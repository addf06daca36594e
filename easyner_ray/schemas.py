"""Explicit pyarrow schemas for every stage boundary (SURVEY.md §1.4).

The reference's data model is an implicit nested-dict JSON shape; here each
stage consumes/produces a declared columnar schema and validates it at the
boundary (``ensure_schema``)."""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

SENTENCES = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sent_idx", pa.int32()),
        ("text", pa.string()),
        ("char_start", pa.int32()),
    ]
)

MENTION_STRUCT = pa.struct(
    [
        ("mention_idx", pa.int32()),
        ("surface", pa.string()),
        ("norm", pa.string()),
        ("cls", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)

# One row per sentence; mentions nested so a sentence is an atomic row and
# downstream per-sentence ops (triples, conflict resolution) are row-local —
# no groupby shuffle, and Ray's re-batching can never split a sentence.
SENTENCE_MENTIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sent_idx", pa.int32()),
        ("mentions", pa.list_(MENTION_STRUCT)),
    ]
)

MENTIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sent_idx", pa.int32()),
        ("mention_idx", pa.int32()),
        ("surface", pa.string()),
        ("norm", pa.string()),
        ("cls", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)

LINKED_MENTIONS = MENTIONS.append(pa.field("entity_id", pa.string()))

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sent_idx", pa.int32()),
    ]
)

NODES = pa.schema(
    [
        ("node_id", pa.string()),
        ("norm", pa.string()),
        ("cls", pa.string()),
        ("n_mentions", pa.int64()),
        ("aliases", pa.list_(pa.string())),
    ]
)

EDGES = pa.schema(
    [
        ("subj_id", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("obj", pa.string()),
        ("weight", pa.int64()),
    ]
)


def ensure_schema(table: pa.Table, schema: pa.Schema, where: str = "") -> pa.Table:
    """Cast/reorder ``table`` to ``schema``; raise with context on mismatch."""
    try:
        return table.select(schema.names).cast(schema)
    except (KeyError, pa.ArrowInvalid, pa.ArrowTypeError) as e:  # pragma: no cover
        raise ValueError(f"schema mismatch at {where}: {e}\n got: {table.schema}\n want: {schema}") from e
