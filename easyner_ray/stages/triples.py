"""Triple extraction: sentence co-occurrence + conversation-window relations.

Seeded by the reference's co-occurrence predicate — a sentence with >=2
entities is a relation candidate (reference ``entity_parser.py:41-42``,
``hasCoOccurrence``). The lift (north rule): for every ordered pair of
DISTINCT normalized entities in one sentence, emit
``(subj, "co_occurs_with", obj)`` with provenance
``(conv_id, turn_idx, sent_idx)``; triples are distinct per sentence.

Scale note: sentence-level triples are ROW-LOCAL over the nested
sentence-mentions rows (schemas.SENTENCE_MENTIONS) — no shuffle at all; the
only all-to-all in the KG build stays the nodes/edges aggregation.

Conversation-window triples (cross-turn co-occurrence within a W-turn
window) DO group by ``conv_id`` — a real shuffle, kept optional. The group
function scans a sliding window over turns sorted by ``turn_idx``, so a
10^4-turn conversation costs O(turns x window), not O(turns^2).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from easyner_ray import schemas

PRED_SENTENCE = "co_occurs_with"
PRED_WINDOW = "co_occurs_in_window"


def sentence_triples_batch(batch: pa.Table) -> pa.Table:
    conv = batch.column("conv_id").to_pylist()
    tidx = batch.column("turn_idx").to_pylist()
    sidx = batch.column("sent_idx").to_pylist()
    ments = batch.column("mentions").to_pylist()

    o_subj: list[str] = []
    o_obj: list[str] = []
    o_conv: list[str] = []
    o_turn: list[int] = []
    o_sent: list[int] = []

    for cid, ti, si, ms in zip(conv, tidx, sidx, ments):
        uniq = sorted({m["norm"] for m in ms})
        if len(uniq) < 2:
            continue
        for a in uniq:
            for b in uniq:
                if a != b:
                    o_subj.append(a)
                    o_obj.append(b)
                    o_conv.append(cid)
                    o_turn.append(ti)
                    o_sent.append(si)

    return pa.Table.from_arrays(
        [
            pa.array(o_subj, pa.string()),
            pa.array([PRED_SENTENCE] * len(o_subj), pa.string()),
            pa.array(o_obj, pa.string()),
            pa.array(o_conv, pa.string()),
            pa.array(o_turn, pa.int32()),
            pa.array(o_sent, pa.int32()),
        ],
        schema=schemas.TRIPLES,
    )


def sentence_triples(sentence_mentions, batch_size: int = 4096):
    """Nested sentence-mentions Dataset -> sentence co-occurrence triples."""
    return sentence_mentions.map_batches(
        sentence_triples_batch, batch_format="pyarrow", batch_size=batch_size
    )


def window_triples(mentions, window: int = 2):
    """Cross-turn co-occurrence within a turn window per conversation, over
    the FLAT mentions table.

    ``groupby(conv_id).map_groups`` — a shuffle keyed on conv_id.
    Partitioning assumption: one conversation's distinct (turn, norm) pairs
    fit in one task's memory (the windowed scan bounds compute, and the
    per-turn sets bound memory at O(turns x entities/turn)).
    Emitted triple identity: distinct (subj, obj, turn_idx of the EARLIER
    turn); ``sent_idx`` is -1 (turn-window provenance, not sentence-level).
    """

    import bisect

    from easyner_ray.ops.relational import add_hash_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One task per coarse bucket of conv_ids (a conversation never
        splits across buckets); the windowed scan runs per conversation
        inside."""
        o_subj: list[str] = []
        o_obj: list[str] = []
        o_conv: list[str] = []
        o_turn: list[int] = []
        for cid, sub in g.groupby("conv_id", sort=False):
            turn_norms: dict[int, set[str]] = {}
            for ti, tsub in sub.groupby("turn_idx", sort=False):
                turn_norms[int(ti)] = set(tsub["norm"])
            rows: set[tuple[str, str, int]] = set()
            turns_sorted = sorted(turn_norms)
            for idx, ti in enumerate(turns_sorted):
                hi = bisect.bisect_right(turns_sorted, ti + window)
                ents_here = turn_norms[ti]
                for tj in turns_sorted[idx:hi]:
                    for a in ents_here:
                        for b in turn_norms[tj]:
                            if a != b:
                                rows.add((a, b, ti))
            for r in sorted(rows):
                o_subj.append(r[0])
                o_obj.append(r[1])
                o_conv.append(cid)
                o_turn.append(r[2])
        return pd.DataFrame(
            {
                "subj": o_subj,
                "pred": PRED_WINDOW,
                "obj": o_obj,
                "conv_id": o_conv,
                "turn_idx": pd.array(o_turn, dtype="int32"),
                "sent_idx": pd.array([-1] * len(o_subj), dtype="int32"),
            }
        )

    bucketed = mentions.map_batches(
        lambda t: add_hash_bucket(t, ["conv_id"], 64), batch_format="pyarrow"
    )
    out = bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")
    # normalize pandas group blocks back to Arrow with the declared schema
    # (unioning mixed block types breaks downstream batching)
    return out.map_batches(
        lambda t: schemas.ensure_schema(t, schemas.TRIPLES, "window_triples"),
        batch_format="pyarrow",
    )
