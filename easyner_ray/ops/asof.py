"""Distributed as-of (nearest-prior) join — a custom operator Ray Data
lacks natively, composed per SURVEY.md §2 custom-operator rule (a):
hash-bucket by the equality key, then a vectorized per-bucket
``pd.merge_asof`` (SURVEY.md §2.4; the engine-side generalization of the
reference's per-sentence lookup joins).

Semantics match DuckDB ``ASOF JOIN`` (backward direction): each left row
picks the right row with the greatest ``ts`` <= its own ``ts`` for the
same key; left rows with no prior right row are dropped (inner).

Partitioning assumption (documented per the §2 rule): one KEY's two-sided
history fits in one task's frame. Keys are diluted across ``n_buckets``
coarse buckets, so a bucket holds many keys but each key is whole — the
same contract as ops.windows.user_sessions. At 100 TB the bucket count
scales with the cluster, never with a single key's history.

Ties on (key, ts) in the right table are resolved BEFORE the join by
keeping the row with the max ``tie_col`` — making the result well-defined
where SQL ASOF would be nondeterministic.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(
    left,
    right,
    *,
    key: str,
    ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_suffix: str = "_r",
    tie_col: str | None = None,
    n_buckets: int = 64,
):
    """Backward as-of join of two event streams on (``key`` equality,
    latest right ``ts`` <= left ``ts``).

    ``left_cols`` / ``right_cols``: payload columns from each side (key
    and ts are implicit). The matched right row's ts + payload are
    emitted with ``right_suffix``. Inner semantics: unmatched left rows
    are dropped.
    """
    from easyner_ray.ops.relational import add_hash_bucket

    l_payload = [c for c in left_cols if c not in (key, ts)]
    r_payload = [c for c in right_cols if c not in (key, ts)]

    # One unified stream (key, ts, __l_*, __r_*, __side) — the same
    # null-padded union shape dup_groups uses for its label join. Both
    # sides' event times ride the shared ``ts`` column; the per-bucket
    # join re-splits on ``__side``.
    def pad(t: pa.Table, side: int, r_schema: pa.Schema,
            l_schema: pa.Schema) -> pa.Table:
        n = len(t)
        cols = [t.column(key), t.column(ts)]
        names = [key, ts]
        for c in l_payload:
            cols.append(t.column(c) if side == 0
                        else pa.nulls(n, l_schema.field(c).type))
            names.append("__l_" + c)
        for c in r_payload:
            cols.append(t.column(c) if side == 1
                        else pa.nulls(n, r_schema.field(c).type))
            names.append("__r_" + c)
        cols.append(pa.array([side] * n, pa.int8()))
        names.append("__side")
        return pa.Table.from_arrays(cols, names=names)

    from easyner_ray.ops.relational import base_schema

    l_schema = base_schema(left)
    r_schema = base_schema(right)
    if l_schema is None or r_schema is None:
        # One side is provably EMPTY with its types lost (zero blocks —
        # see relational.base_schema): the suffixed null payload columns
        # can't be typed, so degrade to the row-correct best effort —
        # empty left -> empty result (left as-is); empty right -> left
        # unchanged (ASOF is a left join).
        return left

    u = left.map_batches(
        lambda t: pad(t, 0, r_schema, l_schema), batch_format="pyarrow"
    ).union(right.map_batches(
        lambda t: pad(t, 1, r_schema, l_schema), batch_format="pyarrow"
    ))
    bucketed = u.map_batches(
        lambda t: add_hash_bucket(t, [key], n_buckets), batch_format="pyarrow"
    )

    ts_r = ts + right_suffix
    out_names = [key, ts] + l_payload + [ts_r] + [c + right_suffix
                                                 for c in r_payload]

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # NULL ts matches nothing under ASOF semantics (and merge_asof
        # raises on null merge keys): an unmatched-left / ignored-right
        # row, not a hard error — same contract as interval_join's
        # null-ts drop
        if df[ts].isna().any():
            df = df[df[ts].notna()]
        l = df[df["__side"] == 0][[key, ts] + ["__l_" + c for c in l_payload]]
        l.columns = [key, ts] + l_payload
        r = df[df["__side"] == 1][[key, ts] + ["__r_" + c for c in r_payload]]
        r.columns = [key, ts] + r_payload
        if tie_col is not None and tie_col in r.columns:
            r = (r.sort_values([key, ts, tie_col], kind="mergesort")
                  .drop_duplicates([key, ts], keep="last"))
        r = r.assign(**{ts_r: r[ts]})
        r.columns = [key, ts] + [c + right_suffix for c in r_payload] + [ts_r]
        l = l.sort_values(ts, kind="mergesort")
        r = r.sort_values(ts, kind="mergesort")
        j = pd.merge_asof(l, r, on=ts, by=key, direction="backward")
        j = j[j[ts_r].notna()]
        return j[out_names].reset_index(drop=True)

    joined = bucketed.groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas")

    # normalize block schemas (empty pandas frames drift on dtype)
    target = pa.schema(
        [l_schema.field(key), l_schema.field(ts)]
        + [l_schema.field(c) for c in l_payload]
        + [pa.field(ts_r, r_schema.field(ts).type)]
        + [pa.field(c + right_suffix, r_schema.field(c).type)
           for c in r_payload]
    )
    return joined.map_batches(
        lambda t: t.select(out_names).cast(target), batch_format="pyarrow"
    )


def interval_join(left, intervals: pa.Table, *, ts: str,
                  t_start: str = "t_start", t_end: str = "t_end",
                  left_cols: list[str], interval_cols: list[str],
                  bucket_s: int = 86400, batch_size: int = 65536):
    """Range (interval-containment) join: each left row pairs with every
    interval whose ``[t_start, t_end]`` contains its ``ts`` (inclusive both
    ends — SQL ``BETWEEN`` semantics). A theta-join Ray Data cannot
    express; composed per the custom-operator rules as a time-bucketed
    broadcast: intervals are replicated to every ``bucket_s``-wide time
    bucket they overlap (``ray.put`` ONCE as a bucket -> candidate-array
    dict), and each left batch checks only its own buckets' candidates
    with one vectorized outer compare per bucket group.

    Partitioning assumption (documented per the §2 rule): the candidate
    set per time bucket fits in worker memory — bucket width should be
    sized near the median interval span so replication stays O(1) per
    interval. When the interval side is itself corpus-sized, keep the
    bucketing but swap the broadcast for a hash-shuffle join on the bucket
    key (explode BOTH sides to (bucket, ...) rows and run
    ``relational.hash_join``, then the same exact containment filter) —
    identical semantics, all-to-all exchange instead of a broadcast.
    """
    import numpy as np

    import ray

    bus = np.int64(bucket_s) * np.int64(1_000_000)  # bucket width, epoch us

    def _us(col: pa.ChunkedArray) -> np.ndarray:
        col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        return np.asarray(col.cast(pa.int64()))

    starts = _us(intervals.column(t_start))
    ends = _us(intervals.column(t_end))
    lut: dict[int, list[int]] = {}
    for i in range(len(intervals)):
        for b in range(int(starts[i] // bus), int(ends[i] // bus) + 1):
            lut.setdefault(b, []).append(i)
    cand = {b: (starts[ix], ends[ix], np.asarray(ix, dtype=np.int64))
            for b, ix in lut.items()}
    payload = intervals.select(interval_cols)
    ref = ray.put((cand, payload))

    def probe(t: pa.Table) -> pa.Table:
        c, pay = ray.get(ref)
        empty = pa.Table.from_arrays(
            [pa.array([], t.schema.field(n).type) for n in left_cols]
            + [pa.array([], pay.schema.field(n).type) for n in interval_cols],
            names=list(left_cols) + list(interval_cols))
        if len(t) == 0:
            return empty
        ts_col = t.column(ts).combine_chunks()
        if ts_col.null_count:
            # NULL ts matches no interval (SQL BETWEEN); drop BEFORE the
            # numpy cast — int64-with-nulls converts to float64/NaN and
            # poisons every row's bucket key
            t = t.filter(pc.is_valid(ts_col))
            if len(t) == 0:
                return empty
        ts_us = np.asarray(t.column(ts).combine_chunks()
                           .cast(pa.timestamp("us")).cast(pa.int64()))
        b = ts_us // bus
        order = np.argsort(b, kind="stable")
        bs = b[order]
        run = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        l_idx_parts, r_idx_parts = [], []
        for s, e in zip(run, np.r_[run[1:], len(bs)]):
            cc = c.get(int(bs[s]))
            if cc is None:
                continue
            rows = order[s:e]
            tv = ts_us[rows]
            hit = (tv[:, None] >= cc[0][None, :]) & (tv[:, None] <= cc[1][None, :])
            li, ci = np.nonzero(hit)
            if len(li):
                l_idx_parts.append(rows[li])
                r_idx_parts.append(cc[2][ci])
        if not l_idx_parts:
            return empty
        l_idx = np.concatenate(l_idx_parts)
        r_idx = np.concatenate(r_idx_parts)
        lt = t.select(left_cols).take(pa.array(l_idx))
        rt = pay.take(pa.array(r_idx))
        return pa.Table.from_arrays(
            [lt.column(n) for n in left_cols]
            + [rt.column(n) for n in interval_cols],
            names=list(left_cols) + list(interval_cols))

    return left.map_batches(probe, batch_format="pyarrow",
                            batch_size=batch_size)
