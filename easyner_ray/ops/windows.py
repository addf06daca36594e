"""Windowed / ordered aggregates over an event stream table.

Ray Data has no native window operator; these compose it from the engine's
standard pieces (SURVEY.md §2 custom-operator rule (a)):

  * :func:`hourly_rollup` — tumbling time window: the window key is a
    vectorized ``floor_temporal`` column, after which it is an ordinary
    two-phase grouped aggregate. No ordering assumption at all.
  * :func:`user_sessions` — session windows (gap rule): needs per-user
    time ordering, so users are hash-bucketed (coarse buckets, every
    user's events land in one bucket) and each bucket sorts + diffs its
    frame vectorized in pandas. Partitioning assumption: one user's events
    fit in one task — true by construction for bounded per-user activity;
    a pathological user is bounded by the bucket, not the cluster.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def hourly_rollup(events, value_col: str = "value"):
    """-> (event_type, hour, n, sum_value): tumbling 1h window aggregate."""
    from easyner_ray.ops.relational import grouped_agg

    def add_hour(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        return pa.Table.from_arrays(
            [t.column("event_type"), hour, t.column(value_col)],
            names=["event_type", "hour", "value"],
        )

    keyed = events.map_batches(add_hour, batch_format="pyarrow")
    out = grouped_agg(keyed, ["event_type", "hour"],
                      [("value", "count", "n"), ("value", "sum", "sum_value")])

    def round4(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sum_value")
        vals = [None if v is None else round(v, 4)
                for v in t.column("sum_value").to_pylist()]
        return t.set_column(i, "sum_value", pa.array(vals, pa.float64()))

    return out.map_batches(round4, batch_format="pyarrow")


def hopping_rollup(events, size_s: int = 3600, hop_s: int = 900,
                   value_col: str = "value"):
    """-> (event_type, wstart_sec, n, sum_value): hopping (sliding) time
    windows of ``size_s`` seconds advancing every ``hop_s`` seconds.

    Each event belongs to exactly ``size_s/hop_s`` windows (hop must
    divide size): wstart = floor(sec/hop)*hop - i*hop for
    i in [0, size/hop). The explode is a numpy tile/repeat — no Python
    per-row work, no ordering assumption — after which it is an ordinary
    two-phase grouped aggregate, exactly like the tumbling case.
    ``wstart_sec`` is int64 epoch seconds (timezone-free, engine-neutral).
    """
    import numpy as np

    from easyner_ray.ops.relational import grouped_agg

    if size_s % hop_s != 0:
        raise ValueError("hop_s must divide size_s")
    k = size_s // hop_s

    def explode(t: pa.Table) -> pa.Table:
        n = len(t)
        # int64 division truncates; epoch values are positive so
        # truncation == floor at both steps
        sec = pc.divide(t.column("ts").cast(pa.int64()), 1_000_000)
        base = np.asarray(
            pc.multiply(pc.divide(sec, hop_s), hop_s).combine_chunks())
        # (n, k) window starts, flattened row-major so each event's k
        # windows stay adjacent
        wstart = (base[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop_s
                  ).reshape(-1)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        rep = t.select(["event_type", value_col]).take(idx)
        return pa.Table.from_arrays(
            [rep.column("event_type"), pa.array(wstart, pa.int64()),
             rep.column(value_col)],
            names=["event_type", "wstart_sec", "value"],
        )

    keyed = events.map_batches(explode, batch_format="pyarrow")
    out = grouped_agg(keyed, ["event_type", "wstart_sec"],
                      [("value", "count", "n"), ("value", "sum", "sum_value")])

    def round4(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sum_value")
        vals = [None if v is None else round(v, 4)
                for v in t.column("sum_value").to_pylist()]
        return t.set_column(i, "sum_value", pa.array(vals, pa.float64()))

    return out.map_batches(round4, batch_format="pyarrow")


def user_sessions(events, gap_seconds: int = 1800, n_buckets: int = 64):
    """-> (user_id, n_events, n_sessions): session-window count per user.

    A new session starts at a user's first event or when the gap since
    their previous event exceeds ``gap_seconds``. Ties are ordered by
    (ts, event_id) so the result is deterministic.
    """
    from easyner_ray.ops.relational import add_hash_bucket

    cols = events.select_columns(["user_id", "event_id", "ts"])
    bucketed = cols.map_batches(
        lambda t: add_hash_bucket(t, ["user_id"], n_buckets), batch_format="pyarrow"
    )

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_user = df["user_id"].eq(df["user_id"].shift())
        gap = (df["ts"] - df["ts"].shift()).dt.total_seconds()
        new_session = (~same_user) | (gap > gap_seconds)
        out = df.assign(new_session=new_session.astype("int64")).groupby(
            "user_id", sort=False
        ).agg(n_events=("event_id", "count"), n_sessions=("new_session", "sum")).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    return bucketed.groupby("__bucket").map_groups(sessions, batch_format="pandas")
