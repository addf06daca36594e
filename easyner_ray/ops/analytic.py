"""Partitioned analytic (window) functions: row_number / rank /
dense_rank / ntile / lag / lead / running sum per key, ordered — the
``f(x) OVER (PARTITION BY k ORDER BY o)`` family Ray Data has no
operator for.

Custom-operator rule (a) (SURVEY.md §2): compose from the engine's
standard pieces. Rows hash-bucket on the partition key (coarse buckets —
every key's rows land intact in ONE bucket, the same partitioning
assumption as ``windows.user_sessions`` and ``relational.topk_per_group``),
then each bucket sorts once and computes every requested function
vectorized off a shared run-boundary index: group starts are found with
shifted whole-column compares (Arrow C++), after which

  * ``row_number`` is ``arange - run_start`` (numpy); ``rank`` /
    ``dense_rank`` reuse the same flags computed over the tie columns;
    ``ntile`` is arithmetic on the group sizes (``np.diff`` of starts),
  * ``lag``/``lead`` are one Arrow ``take`` with a clipped index plus a
    group-boundary null mask,
  * ``cumsum`` is one global ``np.cumsum`` re-based per group
    (``c[i] - c[start] + v[start]``) — NULLs contribute 0 and a prefix
    that is all-NULL yields NULL, matching SQL ``SUM() OVER``.

No Python loop over rows OR groups: a bucket with a million small groups
costs the same one sort + O(n) vector passes as one giant group.
Partitioning assumption (documented contract): one partition key's rows
fit in one bucket task — buckets bound skew, a pathological key is
bounded by its bucket, not the cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KINDS = ("row_number", "rank", "dense_rank", "ntile", "lag", "lead",
          "cumsum", "percent_rank", "cume_dist", "rolling_sum",
          "rolling_mean", "rolling_min", "rolling_max", "first_value",
          "last_value", "rolling_std", "rolling_mean_exact",
          "rolling_std_exact")


def _out_type(kind: str, src, schema: pa.Schema) -> pa.DataType:
    if kind in ("row_number", "rank", "dense_rank", "ntile"):
        return pa.int64()
    if kind in ("cumsum", "percent_rank", "cume_dist", "rolling_sum",
                "rolling_mean", "rolling_min", "rolling_max",
                "rolling_std", "rolling_mean_exact", "rolling_std_exact"):
        return pa.float64()
    return schema.field(src).type


def _change_flags(t: pa.Table, cols: list[str], n: int,
                  base: "np.ndarray | None" = None) -> "np.ndarray":
    """Row-i-starts-a-new-run flags over ``cols`` via shifted whole-column
    compares (Arrow C++). NULLs form one run (SQL semantics): adjacent
    nulls are NOT a change, a validity flip IS."""
    change = np.zeros(n, dtype=bool) if base is None else base.copy()
    change[0] = True
    for g in cols:
        c = t.column(g).combine_chunks()
        neq = pc.not_equal(c.slice(1), c.slice(0, n - 1))
        change[1:] |= np.asarray(neq.fill_null(False))
        if c.null_count:
            va = np.asarray(pc.is_valid(c))
            change[1:] |= va[1:] != va[:-1]
    return change


def _analytics_kernel(t: pa.Table, partition_by: list[str],
                      order_by: list[str],
                      specs: list[tuple[str, object, str]],
                      rank_prefix: int | None = None) -> pa.Table:
    if "__bucket" in t.schema.names:
        t = t.drop(["__bucket"])
    n = len(t)
    if n == 0:
        for kind, src, name in specs:
            t = t.append_column(name, pa.array([], _out_type(kind, src, t.schema)))
        return t

    sort_keys = [(c, "ascending") for c in list(partition_by) + list(order_by)]
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))

    # group-change flags (same convention as relational._topk_kernel)
    change = _change_flags(t, partition_by, n)
    run_start = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    start_of = run_start[run_id]              # each row -> its group's start
    rank0 = np.arange(n, dtype=np.int64) - start_of

    # tie-run flags for rank/dense_rank: a new tie run starts on a new
    # PARTITION or when the first ``rank_prefix`` order columns change —
    # the trailing order columns only make the sort total (deterministic
    # lag/row_number/ntile), exactly like SQL's rank() seeing only its
    # ORDER BY list.
    tie_cols = list(order_by if rank_prefix is None else order_by[:rank_prefix])
    ochange = tstart = tid = None
    if any(k in ("rank", "dense_rank", "percent_rank", "cume_dist")
           for k, _s, _n in specs):
        ochange = _change_flags(t, tie_cols, n, base=change)
        tstart = np.flatnonzero(ochange)
        tid = np.cumsum(ochange) - 1

    for kind, src, name in specs:
        if kind == "row_number":
            t = t.append_column(name, pa.array(rank0 + 1, pa.int64()))
        elif kind == "rank":
            # 1 + offset of the tie run's first row within the partition
            t = t.append_column(
                name, pa.array(tstart[tid] - start_of + 1, pa.int64()))
        elif kind == "dense_rank":
            c = np.cumsum(ochange)
            t = t.append_column(name, pa.array(c - c[start_of] + 1, pa.int64()))
        elif kind == "ntile":
            ntiles = int(src)
            sizes = np.diff(run_start, append=n)[run_id]
            q, rem = sizes // ntiles, sizes % ntiles
            big = (q + 1) * rem               # rows covered by the big tiles
            small_part = rank0 < big
            tile = np.where(
                small_part,
                rank0 // np.maximum(q + 1, 1),
                (rank0 - big) // np.maximum(q, 1) + rem,
            ) + 1
            t = t.append_column(name, pa.array(tile, pa.int64()))
        elif kind == "percent_rank":
            # (rank - 1) / (partition size - 1); single-row group -> 0.0.
            # Integer operands are exactly representable and IEEE division
            # is correctly rounded, so this is bit-equal cross-engine.
            sizes = np.diff(run_start, append=n)[run_id]
            r0 = (tstart[tid] - start_of).astype(np.float64)
            t = t.append_column(
                name, pa.array(r0 / np.maximum(sizes - 1, 1), pa.float64()))
        elif kind == "cume_dist":
            # rows-with-order-value <= current / partition size: the index
            # AFTER the current tie run (tie runs never span partitions)
            sizes = np.diff(run_start, append=n)[run_id]
            tnext = np.append(tstart[1:], n)[tid]
            t = t.append_column(
                name, pa.array((tnext - start_of) / sizes, pa.float64()))
        elif kind in ("lag", "lead"):
            col = t.column(src).combine_chunks()
            if kind == "lag":
                idx = np.maximum(np.arange(n) - 1, 0)
                in_group = rank0 > 0
            else:
                idx = np.minimum(np.arange(n) + 1, n - 1)
                in_group = ~np.append(change[1:], True)  # not last of group
            shifted = col.take(pa.array(idx))
            t = t.append_column(
                name, pc.if_else(pa.array(in_group), shifted,
                                 pa.scalar(None, col.type)))
        elif kind == "cumsum":
            col = t.column(src).combine_chunks().cast(pa.float64())
            if col.null_count:
                vmask = np.asarray(pc.is_valid(col)).astype(np.int64)
            else:
                vmask = np.ones(n, dtype=np.int64)
            v = np.asarray(col.fill_null(0.0), dtype=np.float64)
            # Rebase a bucket-wide prefix sum per group — in extended
            # precision (80-bit on x86), so the cancellation error of
            # (c - c[start_of]) is bounded by the GROUP's magnitude after
            # the final float64 round, not the global prefix's. A plain
            # float64 rebase drifts for late groups in very large buckets.
            c = np.cumsum(v, dtype=np.longdouble)
            seg = (c - c[start_of] + v[start_of]).astype(np.float64)
            out = pa.array(seg, pa.float64())
            nvalid = np.cumsum(vmask)
            nseg = nvalid - nvalid[start_of] + vmask[start_of]
            if (nseg == 0).any():             # all-NULL prefix -> NULL
                out = pc.if_else(pa.array(nseg > 0), out,
                                 pa.scalar(None, pa.float64()))
            t = t.append_column(name, out)
        elif kind in ("rolling_sum", "rolling_mean"):
            # src encodes "col:k" (like ntile encodes its param in src):
            # SQL frame ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW.
            src_col, k_s = src.rsplit(":", 1)
            k = int(k_s)
            col = t.column(src_col).combine_chunks().cast(pa.float64())
            vmask = (np.asarray(pc.is_valid(col)).astype(np.int64)
                     if col.null_count else np.ones(n, dtype=np.int64))
            v = np.asarray(col.fill_null(0.0), dtype=np.float64)
            # frame start j = max(partition start, i - k + 1); the same
            # extended-precision rebase as cumsum bounds the cancellation
            # error by the frame magnitude, not the global prefix
            j = np.maximum(start_of, np.arange(n) - k + 1)
            c = np.cumsum(v, dtype=np.longdouble)
            rs = (c - c[j] + v[j]).astype(np.float64)
            nv = np.cumsum(vmask)
            cnt = nv - nv[j] + vmask[j]
            if kind == "rolling_sum":
                out_np = rs
            else:
                with np.errstate(invalid="ignore", divide="ignore"):
                    out_np = rs / cnt
            out = pa.array(out_np, pa.float64())
            if (cnt == 0).any():              # all-NULL frame -> NULL
                out = pc.if_else(pa.array(cnt > 0), out,
                                 pa.scalar(None, pa.float64()))
            t = t.append_column(name, out)
        elif kind in ("rolling_mean_exact", "rolling_std_exact"):
            # REPLICABLE frame aggregates: every frame accumulates from
            # ZERO, oldest element first, in longdouble — no global
            # prefix, so an independent straight-line recompute of the
            # same spec (sources.gold_derived.write_rolling_zscore_gold)
            # is bit-equal by construction. k lockstep vector steps.
            src_col, k_s = src.rsplit(":", 1)
            k = int(k_s)
            col = t.column(src_col).combine_chunks().cast(pa.float64())
            vmask = (np.asarray(pc.is_valid(col)).astype(np.int64)
                     if col.null_count else np.ones(n, dtype=np.int64))
            v = np.asarray(col.fill_null(0.0), dtype=np.float64)
            j = np.maximum(start_of, np.arange(n) - k + 1)
            s1 = np.zeros(n, dtype=np.longdouble)
            s2 = np.zeros(n, dtype=np.longdouble)
            cnt = np.zeros(n, dtype=np.int64)
            rows = np.arange(n)
            for p in range(k - 1, -1, -1):     # oldest -> newest
                pos = rows - p
                m = pos >= j
                pv = v[np.maximum(pos, 0)]
                s1 = np.where(m, s1 + pv, s1)
                s2 = np.where(m, s2 + np.longdouble(1) * pv * pv, s2)
                cnt = cnt + np.where(m, vmask[np.maximum(pos, 0)], 0)
            cl = cnt.astype(np.longdouble)
            with np.errstate(invalid="ignore", divide="ignore"):
                if kind == "rolling_mean_exact":
                    out_np = (s1 / cl).astype(np.float64)
                    bad = cnt < 1
                else:
                    var = (s2 - s1 * s1 / cl) / (cl - 1)
                    out_np = np.sqrt(np.maximum(var, 0)) \
                        .astype(np.float64)
                    bad = cnt < 2
            out = pa.array(out_np, pa.float64())
            if bad.any():
                out = pc.if_else(pa.array(~bad), out,
                                 pa.scalar(None, pa.float64()))
            t = t.append_column(name, out)
        elif kind == "rolling_std":
            # sample stddev over the ROWS frame (stddev_samp OVER):
            # extended-precision sum and sum-of-squares rebases; the
            # cancellation in sumsq - sum^2/n is bounded by the FRAME's
            # magnitude after the longdouble accumulation. < 2 valid
            # rows in the frame -> NULL (SQL stddev_samp semantics).
            src_col, k_s = src.rsplit(":", 1)
            k = int(k_s)
            col = t.column(src_col).combine_chunks().cast(pa.float64())
            vmask = (np.asarray(pc.is_valid(col)).astype(np.int64)
                     if col.null_count else np.ones(n, dtype=np.int64))
            v = np.asarray(col.fill_null(0.0), dtype=np.float64)
            j = np.maximum(start_of, np.arange(n) - k + 1)
            c1 = np.cumsum(v, dtype=np.longdouble)
            c2 = np.cumsum(v.astype(np.longdouble) ** 2)
            s1 = c1 - c1[j] + v[j]
            s2 = c2 - c2[j] + np.longdouble(v[j]) ** 2
            nv = np.cumsum(vmask)
            cnt = (nv - nv[j] + vmask[j]).astype(np.longdouble)
            with np.errstate(invalid="ignore", divide="ignore"):
                var = (s2 - s1 * s1 / cnt) / (cnt - 1)
            var = np.maximum(var, 0)          # clamp -0.0-ish residue
            out_np = np.sqrt(var).astype(np.float64)
            out = pa.array(out_np, pa.float64())
            few = cnt < 2
            if few.any():
                out = pc.if_else(pa.array(~few), out,
                                 pa.scalar(None, pa.float64()))
            t = t.append_column(name, out)
        elif kind in ("rolling_min", "rolling_max"):
            # src encodes "col:k"; frame ROWS BETWEEN k-1 PRECEDING AND
            # CURRENT ROW. Kernel: an (n x k) gather matrix of frame
            # member indices (clamped at the frame start) with
            # out-of-frame cells masked to +/-inf, reduced along axis 1
            # — n*k floats of scratch, so k is capped at 256 (a SQL
            # ROWS frame wider than that should be a cumulative or
            # range aggregate instead).
            src_col, k_s = src.rsplit(":", 1)
            k = int(k_s)
            if k > 256:
                raise ValueError("rolling_min/max cap k at 256 "
                                 "(n*k scratch); use cumsum shapes")
            col = t.column(src_col).combine_chunks().cast(pa.float64())
            fill = np.inf if kind == "rolling_min" else -np.inf
            v = np.asarray(col.fill_null(fill), dtype=np.float64)
            vmask = (np.asarray(pc.is_valid(col)).astype(np.int64)
                     if col.null_count else np.ones(n, dtype=np.int64))
            j = np.maximum(start_of, np.arange(n) - k + 1)
            idx = np.arange(n)[:, None] - np.arange(k)[None, :]
            oob = idx < j[:, None]
            idx = np.maximum(idx, 0)
            m = v[idx]
            m[oob] = fill
            out_np = m.min(axis=1) if kind == "rolling_min" \
                else m.max(axis=1)
            nv = np.cumsum(vmask)
            cnt = nv - nv[j] + vmask[j]
            out = pa.array(out_np, pa.float64())
            if (cnt == 0).any():              # all-NULL frame -> NULL
                out = pc.if_else(pa.array(cnt > 0), out,
                                 pa.scalar(None, pa.float64()))
            t = t.append_column(name, out)
        elif kind == "first_value":
            # SQL first_value() over the default frame: the partition's
            # first row's value (NULL if that row is NULL — RESPECT
            # NULLS, the SQL default)
            col = t.column(src).combine_chunks()
            t = t.append_column(name, col.take(pa.array(start_of)))
        elif kind == "last_value":
            # SQL last_value() over the FULL-partition frame (ROWS
            # BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING — the
            # frame every real query spells out, since the default
            # frame's last_value is just the current row)
            col = t.column(src).combine_chunks()
            end_of = np.append(run_start[1:], n)[run_id] - 1
            t = t.append_column(name, col.take(pa.array(end_of)))
        else:
            raise ValueError(f"unknown analytic kind {kind!r} "
                             f"(supported: {_KINDS})")
    return t


def ewma_final(ds, partition_by: list[str], order_by: list[str],
               value_col: str, *, round_digits: int = 4,
               n_buckets: int = 32):
    """Final exponentially-weighted moving average per partition with
    decay ``alpha = 0.5`` (``e_1 = v_1``, ``e_n = 0.5 v_n + 0.5
    e_{n-1}``) — the drift/trend summary of monitoring pipelines (a
    user's recent behavior weighted over their history). ``alpha`` is
    FIXED at 0.5 so every weight is an exact power of two
    (``np.ldexp``): term products are exact float64 scalings and the
    only inexact step is the ordered left-fold sum, which the SQL
    oracle mirrors bit-for-bit via ``list_reduce(list(term ORDER BY
    rn), (a, b) -> a + b)`` — same association order as
    ``np.add.reduceat``. -> (partition_by..., n_events, ewma).

    Distributed shape: one hash-bucket exchange on the partition keys
    (same as :func:`partitioned_analytics`), per-bucket multi-key sort,
    then pure-numpy segment kernels — no per-group Python, no driver
    materialization."""
    import numpy as np

    from easyner_ray.ops.relational import add_hash_bucket

    def kernel(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bucket"])
        keys = list(partition_by)
        if len(t) == 0:
            return pa.schema(
                [t.schema.field(k) for k in keys]
                + [pa.field("n_events", pa.int64()),
                   pa.field("ewma", pa.float64())]).empty_table()
        idx = pc.sort_indices(t, sort_keys=[
            (c, "ascending") for c in keys + list(order_by)])
        t = t.take(idx)
        n = len(t)
        change = np.ones(n, dtype=bool)
        for k in keys:
            col = t.column(k).combine_chunks()
            same = np.asarray(pc.equal(col.slice(1), col.slice(0, n - 1)))
            change[1:] &= ~same
        starts = np.flatnonzero(change)
        seg_len = np.diff(np.append(starts, n))
        start_of = np.repeat(starts, seg_len)
        rn = np.arange(n) - start_of + 1
        seg_n = np.repeat(seg_len, seg_len)
        # alpha = 0.5: w_1 = 2^-(N-1), w_i = 2^-(N-i+1) for i >= 2 —
        # exact exponent shifts, no mantissa rounding
        exp = np.where(rn == 1, -(seg_n - 1), -(seg_n - rn + 1))
        v = np.asarray(t.column(value_col).combine_chunks()
                       .cast(pa.float64()).fill_null(0.0),
                       dtype=np.float64)
        terms = np.ldexp(v, exp.astype(np.int32))
        ew = np.add.reduceat(terms, starts)
        if round_digits is not None:
            ew = np.array([round(float(x), round_digits) for x in ew])
        cols = {k: t.column(k).take(pa.array(starts)) for k in keys}
        cols["n_events"] = pa.array(seg_len.astype(np.int64), pa.int64())
        cols["ewma"] = pa.array(ew, pa.float64())
        return pa.table(cols)

    bucketed = ds.map_batches(
        lambda t: add_hash_bucket(t, list(partition_by), n_buckets),
        batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow")


def partitioned_analytics(ds, partition_by: list[str], order_by: list[str],
                          specs: list[tuple[str, object, str]],
                          *, rank_prefix: int | None = None,
                          n_buckets: int = 32):
    """Append analytic columns to ``ds``: for each ``(kind, arg,
    out_name)`` in ``specs``, the value of ``kind OVER (PARTITION BY
    partition_by ORDER BY order_by)``. ``arg`` is the source column for
    lag/lead/cumsum, the tile count for ntile, ignored for
    row_number/rank/dense_rank.

    ``order_by`` must totally order rows within a partition (same
    requirement as the SQL form needs for deterministic
    lag/row_number/ntile). ``rank_prefix``: rank/dense_rank see only the
    first that-many order columns as their ORDER BY (ties!), while the
    full list still makes the sort total — ``order_by=["value", "id"],
    rank_prefix=1`` is SQL ``rank() OVER (... ORDER BY value)`` plus a
    deterministic physical order for everything else. Row order of the
    OUTPUT is per-bucket sorted, globally unordered — order is a property
    of the final consumer, not the exchange.
    """
    from easyner_ray.ops.relational import add_hash_bucket

    for kind, src, _name in specs:
        if kind not in _KINDS:
            raise ValueError(f"unknown analytic kind {kind!r}")
        if kind == "ntile" and int(src) < 1:
            raise ValueError(f"ntile needs a positive tile count, got {src!r}")

    bucketed = ds.map_batches(
        lambda t: add_hash_bucket(t, list(partition_by), n_buckets),
        batch_format="pyarrow",
    )
    return bucketed.groupby("__bucket").map_groups(
        lambda t: _analytics_kernel(t, list(partition_by), list(order_by),
                                    list(specs), rank_prefix),
        batch_format="pyarrow",
    )


def grouped_autocorr(ds, partition_by: list[str], order_by: list[str],
                     value_col: str, lags: tuple[int, ...] = (1, 2, 3),
                     *, round_digits: int | None = 4, n_buckets: int = 32):
    """Lag-k autocorrelation of an ordered series per partition — the
    seasonality/burstiness probe of pipeline monitoring (is yesterday's
    volume predictive of today's? is there a weekly cycle?). For each
    partition and each ``k`` in ``lags``, the Pearson correlation between
    the series and its own k-step shift over ORDERED rows, i.e. SQL::

        SELECT corr(b.x, a.x) FROM r a JOIN r b
          ON b.part = a.part AND b.rn = a.rn + k GROUP BY a.part, k

    -> one row per (partition, lag) that has >= 1 aligned pair; the value
    is NULL when the correlation is undefined (a single pair, or either
    side constant) — DuckDB ``corr`` semantics exactly.

    Meant to run on an already-collapsed series table (e.g. daily counts
    per key), NOT the raw corpus: collapse first, correlate second.
    Distributed shape: the same one hash-bucket exchange as
    :func:`partitioned_analytics` (a partition's rows land intact in one
    bucket), then a pure-numpy segment kernel — per lag, aligned pairs
    are two shifted views of the bucket-sorted value array masked by
    same-run flags, and the five power sums per group come from
    ``np.bincount``. No Python loop over groups or rows. Power sums of
    INTEGER series are exact in float64 (< 2^53), so a constant series
    yields an exactly-zero variance (-> NULL), never a cancellation
    residue.
    """
    from easyner_ray.ops.relational import add_hash_bucket

    lags = tuple(int(k) for k in lags)
    if any(k < 1 for k in lags):
        raise ValueError(f"lags must be positive, got {lags!r}")
    keys = list(partition_by)

    def kernel(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bucket"])
        out_schema = pa.schema(
            [t.schema.field(c) for c in keys]
            + [pa.field("lag_k", pa.int64()),
               pa.field("acf", pa.float64())])
        n = len(t)
        if n == 0:
            return out_schema.empty_table()
        t = t.take(pc.sort_indices(t, sort_keys=[
            (c, "ascending") for c in keys + list(order_by)]))
        change = _change_flags(t, keys, n)
        run_start = np.flatnonzero(change)
        run_id = np.cumsum(change) - 1
        ngroups = len(run_start)
        x = np.asarray(t.column(value_col).combine_chunks()
                       .cast(pa.float64()).fill_null(0.0), dtype=np.float64)

        parts: list[pa.Table] = []
        for k in lags:
            if n <= k:
                continue
            valid = run_id[k:] == run_id[:-k]
            gid = run_id[:n - k][valid]
            if len(gid) == 0:
                continue
            a, b = x[:-k][valid], x[k:][valid]
            cnt = np.bincount(gid, minlength=ngroups).astype(np.float64)
            sa = np.bincount(gid, weights=a, minlength=ngroups)
            sb = np.bincount(gid, weights=b, minlength=ngroups)
            saa = np.bincount(gid, weights=a * a, minlength=ngroups)
            sbb = np.bincount(gid, weights=b * b, minlength=ngroups)
            sab = np.bincount(gid, weights=a * b, minlength=ngroups)
            va = np.maximum(cnt * saa - sa * sa, 0.0)
            vb = np.maximum(cnt * sbb - sb * sb, 0.0)
            den = np.sqrt(va * vb)
            ok = (cnt >= 2) & (den > 0)
            r = np.divide(cnt * sab - sa * sb, den,
                          out=np.zeros(ngroups), where=ok)
            if round_digits is not None:
                r = np.round(r, round_digits)
            has = np.flatnonzero(cnt >= 1)
            acf = pc.if_else(pa.array(ok[has]),
                             pa.array(r[has], pa.float64()),
                             pa.scalar(None, pa.float64()))
            cols = {c: t.column(c).take(pa.array(run_start[has]))
                    for c in keys}
            cols["lag_k"] = pa.array(np.full(len(has), k), pa.int64())
            cols["acf"] = acf
            parts.append(pa.table(cols))
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    bucketed = ds.map_batches(
        lambda t: add_hash_bucket(t, keys, n_buckets),
        batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow")


def grouped_theil_sen(ds, partition_by: list[str], x_col: str, y_col: str,
                      *, round_digits: int | None = 4, n_buckets: int = 32):
    """Theil–Sen robust trend per partition: the MEDIAN of all pairwise
    slopes ``(y_j - y_i) / (x_j - x_i)`` over ``x_j > x_i`` — the
    outlier-resistant replacement for an OLS slope on monitoring series
    (one anomalous day cannot swing it; breakdown point ~29%). -> one
    row per partition with >= 2 distinct x values, ``trend`` = the
    interpolated median (SQL ``median``/``quantile_cont(0.5)``
    semantics — numpy's 'linear' quantile is the same
    lower + (upper-lower)*frac formula, so the value is cross-engine
    stable at the rounding grain).

    Meant for an already-collapsed series table (e.g. daily counts per
    key), NOT the raw corpus. Distributed shape: the same one
    hash-bucket exchange as :func:`partitioned_analytics`, then a
    pure-numpy segment kernel — per group, pair indices come from one
    ``np.triu_indices`` over the group's row range (pair count is
    O(len^2) in the GROUP length, which is bounded by the series
    grain — days — not the corpus). Pairs with equal x are skipped
    (undefined slope), matching the SQL ``x_j > x_i`` join predicate.
    """
    from easyner_ray.ops.relational import add_hash_bucket

    keys = list(partition_by)

    def kernel(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bucket"])
        out_schema = pa.schema(
            [t.schema.field(c) for c in keys]
            + [pa.field("n_pairs", pa.int64()),
               pa.field("trend", pa.float64())])
        n = len(t)
        if n == 0:
            return out_schema.empty_table()
        t = t.take(pc.sort_indices(t, sort_keys=[
            (c, "ascending") for c in keys + [x_col]]))
        change = _change_flags(t, keys, n)
        run_start = np.flatnonzero(change)
        seg_len = np.diff(np.append(run_start, n))
        x = np.asarray(t.column(x_col).combine_chunks().cast(pa.float64()),
                       dtype=np.float64)
        y = np.asarray(t.column(y_col).combine_chunks().cast(pa.float64()),
                       dtype=np.float64)

        out_rows, out_np, out_tr = [], [], []
        for g, (s, ln) in enumerate(zip(run_start, seg_len)):
            if ln < 2:
                continue
            i, j = np.triu_indices(ln, k=1)
            dx = x[s + j] - x[s + i]
            ok = dx > 0
            if not ok.any():
                continue
            slopes = (y[s + j][ok] - y[s + i][ok]) / dx[ok]
            med = float(np.quantile(slopes, 0.5, method="linear"))
            out_rows.append(s)
            out_np.append(int(ok.sum()))
            out_tr.append(round(med, round_digits)
                          if round_digits is not None else med)
        if not out_rows:
            return out_schema.empty_table()
        cols = {c: t.column(c).take(pa.array(out_rows)) for c in keys}
        cols["n_pairs"] = pa.array(out_np, pa.int64())
        cols["trend"] = pa.array(out_tr, pa.float64())
        return pa.table(cols)

    bucketed = ds.map_batches(
        lambda t: add_hash_bucket(t, keys, n_buckets),
        batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow")
