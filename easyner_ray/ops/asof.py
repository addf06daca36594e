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

    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema

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
