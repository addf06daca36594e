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
    """Vectorized ordered-pair generation over the nested mentions column.

    No ``to_pylist`` on the nested column (python-dict materialization was
    the stage's entire cost): norms come out via ``list_flatten``,
    per-sentence uniqueness via ``np.unique`` of (sentence, norm-code)
    keys, and the all-ordered-pairs expansion is pure index arithmetic
    (np.repeat + per-element rotation), so cost scales with the number of
    OUTPUT triples in C, not python loop iterations.
    """
    import numpy as np
    import pyarrow.compute as pc

    ments = batch.column("mentions").combine_chunks()
    flat = pc.list_flatten(ments)
    if len(flat) == 0:
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in schemas.TRIPLES], schema=schemas.TRIPLES
        )
    parent = pc.list_parent_indices(ments).to_numpy()
    norms = flat.field("norm")
    enc = pc.dictionary_encode(norms)
    codes = np.asarray(enc.indices, dtype=np.int64)
    dictionary = enc.dictionary

    # distinct (sentence, norm) pairs, sorted by sentence then code
    key = parent * (int(codes.max()) + 1) + codes
    uniq_key = np.unique(key)
    u_parent = uniq_key // (int(codes.max()) + 1)
    u_code = uniq_key % (int(codes.max()) + 1)

    # group sizes per sentence (u_parent is sorted)
    sent_ids, first_idx, n_per = np.unique(u_parent, return_index=True, return_counts=True)
    # drop sentences with < 2 distinct entities
    keep = n_per >= 2
    if not keep.any():
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in schemas.TRIPLES], schema=schemas.TRIPLES
        )
    # per unique mention element: its group size and group start
    elem_n = np.repeat(n_per, n_per)          # group size per element
    elem_start = np.repeat(first_idx, n_per)  # group start per element
    sel = elem_n >= 2
    elem_idx = np.nonzero(sel)[0]
    en = elem_n[sel]
    es = elem_start[sel]
    local = elem_idx - es                     # local position in group

    # each element pairs as subj with (n-1) objs: rank r in [0, n-2],
    # obj_local = (local + 1 + r) % n
    reps = en - 1
    pair_subj = np.repeat(elem_idx, reps)
    pair_n = np.repeat(en, reps)
    pair_local = np.repeat(local, reps)
    pair_start = np.repeat(es, reps)
    total = len(pair_subj)
    r = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
    pair_obj = pair_start + (pair_local + 1 + r) % pair_n

    subj = dictionary.take(pa.array(u_code[pair_subj]))
    obj = dictionary.take(pa.array(u_code[pair_obj]))
    sent_row = u_parent[pair_subj]
    sent_idx_arr = pa.array(sent_row)
    return pa.Table.from_arrays(
        [
            subj,
            pa.array([PRED_SENTENCE] * total, pa.string()),
            obj,
            batch.column("conv_id").take(sent_idx_arr),
            batch.column("turn_idx").take(sent_idx_arr),
            batch.column("sent_idx").take(sent_idx_arr),
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
        splits across buckets). Per conversation the norms factorize to
        int codes and every windowed turn pair cross-products in numpy;
        distinct (subj, obj, earlier-turn) triples come out of one
        np.unique over packed int64 keys — no Python pair loop."""
        import numpy as np

        o_subj: list[str] = []
        o_obj: list[str] = []
        o_conv: list[str] = []
        o_turn: list[int] = []
        for cid, sub in g.groupby("conv_id", sort=False):
            codes, uniq_norms = pd.factorize(sub["norm"], sort=False)
            # 20-bit packing is the fast path; conversations with >2^20
            # distinct norms or turn indices (pathological but possible at
            # 100 TB) take the widening np.unique(axis=0) fallback instead
            # of aborting the job.
            fits20 = (len(uniq_norms) < (1 << 20)
                      and int(sub["turn_idx"].max()) < (1 << 20))
            tis = sub["turn_idx"].to_numpy()
            turn_codes = {
                int(ti): np.unique(codes[tis == ti]) for ti in np.unique(tis)
            }
            turns_sorted = sorted(turn_codes)
            packed: list[np.ndarray] = []
            wide: list[np.ndarray] = []
            for idx, ti in enumerate(turns_sorted):
                hi = bisect.bisect_right(turns_sorted, ti + window)
                a = turn_codes[ti].astype(np.int64)
                for tj in turns_sorted[idx:hi]:
                    b = turn_codes[tj].astype(np.int64)
                    A = np.repeat(a, len(b))
                    B = np.tile(b, len(a))
                    m = A != B
                    if not m.any():
                        continue
                    if fits20:
                        packed.append((A[m] << 40) | (B[m] << 20) | ti)
                    else:
                        wide.append(np.column_stack(
                            [A[m], B[m], np.full(int(m.sum()), ti, np.int64)]))
            if fits20:
                if not packed:
                    continue
                u = np.unique(np.concatenate(packed))
                subj_idx = (u >> 40).astype(np.intp)
                obj_idx = ((u >> 20) & 0xFFFFF).astype(np.intp)
                t_dec = (u & 0xFFFFF).astype(int)
            else:
                if not wide:
                    continue
                u3 = np.unique(np.concatenate(wide, axis=0), axis=0)
                subj_idx = u3[:, 0].astype(np.intp)
                obj_idx = u3[:, 1].astype(np.intp)
                t_dec = u3[:, 2].astype(int)
            o_subj.extend(uniq_norms[subj_idx])
            o_obj.extend(uniq_norms[obj_idx])
            o_conv.extend([cid] * len(subj_idx))
            o_turn.extend(t_dec.tolist())
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


PRED_PATTERN_FALLBACK = PRED_SENTENCE


def _gather_substrings(texts, row, lo, hi):
    """Per-element substring extraction as one byte-range gather from the
    Arrow string array's flat UTF-8 buffer — valid only when byte offsets
    equal codepoint offsets (ASCII batch; the caller gates on that)."""
    import numpy as np

    off_buf = np.frombuffer(texts.buffers()[1], dtype=np.int32)
    voff = off_buf[texts.offset: texts.offset + len(texts) + 1].astype(np.int64)
    data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
    gs = voff[row] + lo
    lens = hi - lo
    out_off = np.zeros(len(row) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    idx = np.repeat(gs - out_off[:-1], lens) + np.arange(out_off[-1])
    return pa.StringArray.from_buffers(
        len(row),
        pa.py_buffer(out_off.astype(np.int32).tobytes()),
        pa.py_buffer(data[idx].tobytes()))


def pattern_triples_batch(batch: pa.Table) -> pa.Table:
    """Textual-pattern relation extraction over nested sentence-mentions
    rows WITH the sentence text (``tag_mentions(keep_text=True)``): for
    every mention_idx-adjacent pair of distinct entities in a sentence,
    the lowercased word tokens BETWEEN the two spans become the predicate
    (joined with ``_``) when there are 1-3 of them; longer / empty /
    overlapping gaps fall back to ``co_occurs_with``. This is the
    engine's deterministic stand-in for the north rule's
    dependency-pattern relation extraction (no parser in this
    environment; the pattern grammar is the classic OpenIE-style surface
    heuristic).

    Row-local and vectorized end-to-end: adjacency from
    ``list_parent_indices``, gap substrings via one byte-range gather
    (ASCII fast path — falls back to a per-row slice for batches with
    multi-byte text), predicate shaping via two RE2 kernels.
    """
    import numpy as np
    import pyarrow.compute as pc

    def empty() -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in schemas.TRIPLES],
            schema=schemas.TRIPLES)

    ments = batch.column("mentions").combine_chunks()
    flat = pc.list_flatten(ments)
    if len(flat) == 0:
        return empty()
    parent = pc.list_parent_indices(ments).to_numpy()
    adj = np.flatnonzero(parent[:-1] == parent[1:])
    if adj.size == 0:
        return empty()
    norm = flat.field("norm")
    distinct = pc.fill_null(
        pc.invert(pc.equal(norm.take(pa.array(adj)),
                           norm.take(pa.array(adj + 1)))), False)
    i = adj[np.flatnonzero(np.asarray(distinct))]
    if i.size == 0:
        return empty()
    subj = norm.take(pa.array(i))
    obj = norm.take(pa.array(i + 1))
    ae = flat.field("end").to_numpy()[i].astype(np.int64)
    bs = flat.field("start").to_numpy()[i + 1].astype(np.int64)
    hi = np.maximum(bs, ae)  # overlapping spans -> empty gap
    p = parent[i]

    texts = batch.column("text").combine_chunks()
    ascii_only = pc.all(
        pc.equal(pc.binary_length(texts), pc.utf8_length(texts))).as_py()
    if ascii_only is True:
        gaps = _gather_substrings(texts, p, ae, hi)
    else:  # rare multi-byte batch: correct per-row slice
        py = texts.to_pylist()
        gaps = pa.array(
            [py[pp][a:b] for pp, a, b in zip(p.tolist(), ae.tolist(),
                                             hi.tolist())], pa.string())

    g = pc.utf8_lower(gaps)
    ntok = pc.count_substring_regex(g, "[a-z]+")
    predc = pc.replace_substring_regex(
        pc.replace_substring_regex(g, "^[^a-z]+|[^a-z]+$", ""),
        "[^a-z]+", "_")
    in_band = pc.and_(pc.greater_equal(ntok, 1), pc.less_equal(ntok, 3))
    pred = pc.if_else(in_band, predc,
                      pa.scalar(PRED_PATTERN_FALLBACK, pa.string()))

    sent_row = pa.array(p)
    return pa.Table.from_arrays(
        [
            subj,
            pred,
            obj,
            batch.column("conv_id").take(sent_row),
            batch.column("turn_idx").take(sent_row),
            batch.column("sent_idx").take(sent_row),
        ],
        schema=schemas.TRIPLES,
    )


def pattern_triples(sentence_mentions, batch_size: int = 4096):
    """Nested sentence-mentions (with text) -> pattern-predicate triples."""
    return sentence_mentions.map_batches(
        pattern_triples_batch, batch_format="pyarrow", batch_size=batch_size
    )
