"""Fuzzy string self-join: all pairs within edit distance 1 via FastSS
deletion-neighborhood blocking (Bocek et al. 2007, "Fast Similarity
Search in Large Dictionaries").

Entity-resolution workhorse over the KG node vocabulary: surface-form
typos / enumeration variants ("abt1" vs "abt2") become alias-merge
candidates without an all-pairs scan. The reference's canonicalization
merges only on exact normalized keys (reference ``entity_merger2.py`` /
``analysis.py`` term grouping); this op is the engine-added fuzzy layer
on top, same family as ``stages/canonicalize.alias_components``.

Blocking is LOSSLESS for ``lev(u, v) <= 1``: every such pair shares at
least one key in ``{s} ∪ {s minus one char}`` —
  * substitution at i:   delete i from both  -> equal key;
  * insertion/deletion:  the shorter string IS a deletion key of the
    longer (and its own identity key).
Sharing a key only bounds the distance by 2 (one deletion each side), so
candidates are verified with an exact ``lev <= 1`` predicate.

Scale shape: key expansion is vectorized (one ``utf8_slice_codeunits``
pass per deletion position over the whole batch, positions bounded by
the max name length); the shuffle moves only ``O(names * avg_len)``
short rows; buckets are hash-coarse so pair generation is a per-bucket
numpy kernel; the verify predicate runs ONLY on bucket-collision
candidates (rare relative to the name table). No stage touches the
corpus — callers pass the *distinct-name* table (vocabulary-bounded).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PAIR_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string()),
                          ("dist", pa.int64())])


def _lev_le1(u: str, v: str) -> bool:
    """Exact ``levenshtein(u, v) <= 1`` (verify step; candidates only)."""
    lu, lv = len(u), len(v)
    if abs(lu - lv) > 1:
        return False
    if lu == lv:
        return sum(a != b for a, b in zip(u, v)) <= 1
    if lu > lv:
        u, v, lu, lv = v, u, lv, lu
    # v is one longer: u must equal v with one char deleted
    i = 0
    while i < lu and u[i] == v[i]:
        i += 1
    return u[i:] == v[i + 1:]


def _expand_keys(t: pa.Table, column: str) -> pa.Table:
    """-> (key, name): identity key + every single-deletion variant.

    One vectorized slice+concat per deletion position (positions run to
    the batch's max length, not per row); rows shorter than the position
    are masked out. Codeunit slicing == codepoint slicing for the ASCII
    normalized keys this runs on (``functions.tokenize.norm_key``).
    """
    names = t.column(column).combine_chunks()
    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    if len(names) == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string())],
            names=["key", "name"])
    lengths = pc.binary_length(names).to_numpy(zero_copy_only=False)
    max_len = int(lengths.max())
    keys = [names]          # identity key
    parents = [np.arange(len(names), dtype=np.int64)]
    for i in range(max_len):
        sel = np.flatnonzero(lengths > i)
        if len(sel) == 0:
            break
        sub = names.take(pa.array(sel))
        variant = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub, 0, i),
            pc.utf8_slice_codeunits(sub, i + 1, np.iinfo(np.int32).max),
            "")
        keys.append(variant)
        parents.append(sel)
    idx = pa.array(np.concatenate(parents))
    return pa.Table.from_arrays(
        [pa.concat_arrays([k.combine_chunks() if isinstance(k, pa.ChunkedArray)
                           else k for k in keys]),
         names.take(idx)],
        names=["key", "name"])


def edit1_pairs(names_ds, column: str = "name", hot_cap: int = 200,
                n_buckets: int = 64):
    """-> (a, b, dist) with ``a < b`` and ``levenshtein(a, b) <= 1``.

    ``names_ds``: Dataset of DISTINCT strings in ``column`` (callers
    dedupe upstream; duplicate inputs only cost repeated candidate
    checks, never wrong output — the final combine is distinct).
    Buckets larger than ``hot_cap`` names are dropped (degenerate-key
    guard, same contract as ``dedup.ngram_jaccard_pairs``).
    """
    from easyner_ray.ops.relational import add_hash_bucket, bucketed_final

    expanded = names_ds.map_batches(
        lambda t: _expand_keys(t, column), batch_format="pyarrow")

    _EMPTY = _PAIR_SCHEMA.empty_table()

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return _EMPTY
        key = g.column("key").combine_chunks()
        name = g.column("name").combine_chunks()
        order = pc.sort_indices(
            pa.Table.from_arrays([key, name], names=["k", "n"]),
            sort_keys=[("k", "ascending"), ("n", "ascending")])
        key_s = key.take(order)
        name_s = name.take(order).to_pylist()
        neq = pc.not_equal(key_s.slice(1), key_s.slice(0, len(key_s) - 1))
        starts = np.r_[0, np.flatnonzero(
            neq.to_numpy(zero_copy_only=False)) + 1]
        sizes = np.diff(np.r_[starts, len(key_s)])
        a_out, b_out, d_out = [], [], []
        for st, sz in zip(starts[(sizes >= 2) & (sizes <= hot_cap)],
                          sizes[(sizes >= 2) & (sizes <= hot_cap)]):
            grp = name_s[st:st + sz]
            for i in range(sz - 1):
                for j in range(i + 1, sz):
                    u, v = grp[i], grp[j]
                    if u == v or not _lev_le1(u, v):
                        continue
                    if u > v:
                        u, v = v, u
                    a_out.append(u)
                    b_out.append(v)
                    d_out.append(1)
        if not a_out:
            return _EMPTY
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.string()), pa.array(b_out, pa.string()),
             pa.array(d_out, pa.int64())], schema=_PAIR_SCHEMA)

    bucketed = expanded.map_batches(
        lambda t: add_hash_bucket(t, ["key"], n_buckets),
        batch_format="pyarrow")
    cand = bucketed.groupby("__bucket").map_groups(
        pairs_in_bucket, batch_format="pyarrow")
    # a pair collides under several deletion keys -> distinct
    return bucketed_final(cand, ["a", "b"], pa_aggs=[("dist", "min")],
                          out_names=["dist"])


def alias_clusters(pairs, **kwargs):
    """-> (name, cluster): connected components over an edit-distance
    pair list; ``cluster`` is the lexicographically smallest name
    reachable through any chain of pairs (the canonical alias each
    cluster merges into). Thin wrapper over ``ops.dedup.dup_groups`` —
    same distributed min-label propagation / union-find fast path, with
    string ids (kwargs pass through: ``small_edge_cutoff=0`` forces the
    distributed path)."""
    import pyarrow as pa

    from easyner_ray.ops.dedup import dup_groups

    renamed = pairs.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("a"), t.column("b")], names=["doc_a", "doc_b"]),
        batch_format="pyarrow")
    out = dup_groups(renamed, **kwargs)
    return out.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("doc_id"), t.column("group_id")],
            names=["name", "cluster"]),
        batch_format="pyarrow")


def edit1_join(left_ds, right_ds, left_col: str = "name",
               right_col: str = "name", hot_cap: int = 200,
               n_buckets: int = 64):
    """Two-table fuzzy equi-join: -> (left, right, dist) for every
    cross-table pair with ``levenshtein(left, right) <= 1`` (dist 0 =
    exact). Record-linkage shape (typo-tolerant NEL): both DISTINCT name
    tables expand to FastSS deletion keys tagged by side; only buckets
    where the two sides collide do any work — never a cross product.
    Same lossless-blocking argument as :func:`edit1_pairs`.
    """
    from easyner_ray.ops.relational import add_hash_bucket, bucketed_final

    schema = pa.schema([("left", pa.string()), ("right", pa.string()),
                        ("dist", pa.int64())])
    _EMPTY = schema.empty_table()

    def tag(side: int, col: str):
        def fn(t: pa.Table) -> pa.Table:
            e = _expand_keys(t, col)
            return e.append_column("__side",
                                   pa.array(np.full(len(e), side, np.int8)))
        return fn

    expanded = left_ds.select_columns([left_col]).rename_columns(["__n"]) \
        .map_batches(tag(0, "__n"), batch_format="pyarrow") \
        .union(right_ds.select_columns([right_col]).rename_columns(["__n"])
               .map_batches(tag(1, "__n"), batch_format="pyarrow"))

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        key = g.column("key").combine_chunks()
        name = g.column("name").combine_chunks()
        side = g.column("__side").to_numpy(zero_copy_only=False)
        if not (side == 0).any() or not (side == 1).any():
            return _EMPTY
        order = pc.sort_indices(
            pa.Table.from_arrays([key, name], names=["k", "n"]),
            sort_keys=[("k", "ascending"), ("n", "ascending")])
        oi = order.to_numpy(zero_copy_only=False)
        key_s = key.take(order)
        name_s = name.take(order).to_pylist()
        side_s = side[oi]
        neq = pc.not_equal(key_s.slice(1), key_s.slice(0, len(key_s) - 1))
        starts = np.r_[0, np.flatnonzero(
            neq.to_numpy(zero_copy_only=False)) + 1]
        sizes = np.diff(np.r_[starts, len(key_s)])
        l_out, r_out, d_out = [], [], []
        for st, sz in zip(starts[(sizes >= 2) & (sizes <= hot_cap)],
                          sizes[(sizes >= 2) & (sizes <= hot_cap)]):
            grp_n = name_s[st:st + sz]
            grp_s = side_s[st:st + sz]
            lefts = [n for n, s in zip(grp_n, grp_s) if s == 0]
            rights = [n for n, s in zip(grp_n, grp_s) if s == 1]
            if not lefts or not rights:
                continue
            for u in lefts:
                for v in rights:
                    if _lev_le1(u, v):
                        l_out.append(u)
                        r_out.append(v)
                        d_out.append(0 if u == v else 1)
        if not l_out:
            return _EMPTY
        return pa.Table.from_arrays(
            [pa.array(l_out, pa.string()), pa.array(r_out, pa.string()),
             pa.array(d_out, pa.int64())], schema=schema)

    bucketed = expanded.map_batches(
        lambda t: add_hash_bucket(t, ["key"], n_buckets),
        batch_format="pyarrow")
    cand = bucketed.groupby("__bucket").map_groups(
        pairs_in_bucket, batch_format="pyarrow")
    return bucketed_final(cand, ["left", "right"],
                          pa_aggs=[("dist", "min")], out_names=["dist"])
