"""Data-layout primitives for scan pruning at scale: Z-order (Morton)
clustering keys and quantile range-partition assignment.

Why an engine needs these at 100 TB: a streaming write lays blocks out
in arrival order, so a later range predicate on ANY column touches every
fragment. Re-clustering by an interleaved Z-order key over the hot
filter columns (the Delta/Iceberg ``OPTIMIZE ZORDER`` primitive) makes
fragment min/max statistics selective on all of those columns at once —
the read-side prune then skips most fragments. Range-partitioning by
exact quantile cut points (the balanced-sort building block) bounds
per-partition row counts regardless of value skew.

Both transforms here are pure per-batch integer math after ONE tiny
global statistics pass, so they stream:

* :func:`zorder_keys` — pass 1 computes global integer min/max per
  column (per-batch partials, #blocks tiny rows to the driver); pass 2
  quantizes each column to ``bits`` bits with exact int64 arithmetic
  (``(x - mn) * (2^bits - 1) // span`` — floor division, cross-engine
  deterministic, no float) and interleaves bits vectorized in numpy.
  No shuffle — the key column is INPUT to a later sort/repartition/
  write, which is where the one unavoidable exchange lives.
* :func:`range_partition_ids` — cut points from
  :func:`easyner_ray.ops.sketch.exact_quantiles` (histogram refinement,
  no sort), then one vectorized ``searchsorted`` per batch.

Reference: the reference engine has no layout optimizer (its sinks write
arrival-ordered JSON batches, ``easyner/util.py`` writers); this module
is engine-added scale infrastructure, same family as ``state/sink.py``'s
partitioned manifests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["column_minmax_int", "zorder_keys", "range_partition_ids"]


def _string_prefix_int(col) -> np.ndarray:
    """Order-preserving integer image of a string/binary column: the
    first 6 bytes big-endian as an int64 (48 bits — headroom for the
    16-bit quantizer multiply in uint64). Bytewise lexicographic order
    is preserved for any prefix length, so quantization on the image
    clusters the same way a string sort would; strings equal in their
    first 6 bytes collapse to one key (coarser, never wrong). Built
    from the Arrow offsets/data buffers with 6 masked gathers — no
    per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.binary()) if not pa.types.is_binary(col.type) else col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    # offsets buffer is int32 for binary/string; honor a sliced array's
    # element offset (Ray batch slices carry one)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                            count=n + 1,
                            offset=arr.offset * 4).astype(np.int64)
    data_buf = arr.buffers()[2]
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.zeros(0, np.uint8))
    starts, lens = offsets[:-1], np.diff(offsets)
    out = np.zeros(n, dtype=np.uint64)
    for k in range(6):
        valid = lens > k
        byte_k = np.zeros(n, dtype=np.uint64)
        byte_k[valid] = data[starts[valid] + k]
        out |= byte_k << np.uint64(8 * (5 - k))
    return out.astype(np.int64)  # < 2^48: always non-negative


def _to_int64(col):
    """Integer image of a column: timestamps -> epoch micros, ints pass
    through, strings/binary -> 6-byte big-endian prefix (order
    preserving)."""
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t):
        return pa.chunked_array([pa.array(_string_prefix_int(col),
                                          pa.int64())])
    return col.cast(pa.int64())


def _quantize(x: np.ndarray, mn: int, mx: int, bits: int) -> np.ndarray:
    """``(x - mn) * (2^bits - 1) // span`` with an overflow guard: when
    ``span`` is wide enough that the multiply could exceed int64 (string
    prefix images span up to 2^48), both operands are right-shifted
    first — order-preserving, just coarser. For narrow spans (every
    oracle-checked column) shift is 0 and this is EXACTLY the SQL
    integer expression."""
    span = mx - mn
    if span <= 0:
        return np.zeros(len(x), dtype=np.int64)
    top = (1 << bits) - 1
    shift = max(0, int(span).bit_length() + bits - 63)
    xs = (x.astype(np.int64) - mn) >> shift
    sp = span >> shift
    if sp <= 0:
        return np.zeros(len(x), dtype=np.int64)
    # clip AFTER the division: appended rows may fall outside the stats
    # the cuts were built from (append_clustered reuses the original
    # min/max so keys stay comparable); out-of-range values clamp to the
    # edge buckets instead of producing negative / overflowing keys
    return np.clip(xs * top // sp, 0, top)


def column_minmax_int(ds, cols: list[str]) -> dict[str, tuple[int, int]]:
    """Global (min, max) per integer/timestamp column: per-batch partial
    rows (#cols each), one tiny driver reduce. The only materialized
    state is #blocks * #cols rows."""

    def part(t: pa.Table) -> pa.Table:
        names, mns, mxs = [], [], []
        for c in cols:
            v = _to_int64(t.column(c))
            names.append(c)
            mns.append(pc.min(v).as_py())
            mxs.append(pc.max(v).as_py())
        return pa.table({"column": pa.array(names, pa.string()),
                         "mn": pa.array(mns, pa.int64()),
                         "mx": pa.array(mxs, pa.int64())})

    rows = ds.select_columns(cols).map_batches(
        part, batch_format="pyarrow").take_all()
    out: dict[str, tuple[int, int]] = {}
    for r in rows:
        if r["mn"] is None:
            continue
        mn, mx = out.get(r["column"], (r["mn"], r["mx"]))
        out[r["column"]] = (min(mn, r["mn"]), max(mx, r["mx"]))
    return out


def _spread2(v: np.ndarray) -> np.ndarray:
    """Spread 16 low bits to the even bit positions of 32 (Morton magic
    numbers; the n_cols == 2 fast path)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def _interleave(qs: list[np.ndarray], bits: int) -> np.ndarray:
    """Bit i of column j lands at position ``i * n_cols + j`` (column 0
    owns the least-significant lane). Vectorized across rows either via
    the 2-column magic numbers or a bits-iteration loop (16 vector ops,
    never per-row Python)."""
    n = len(qs)
    if n == 2 and bits <= 16:
        return (_spread2(qs[0]) | (_spread2(qs[1]) << np.uint64(1))) \
            .astype(np.int64)
    out = np.zeros(len(qs[0]), dtype=np.uint64)
    for i in range(bits):
        for j, q in enumerate(qs):
            out |= ((q.astype(np.uint64) >> np.uint64(i))
                    & np.uint64(1)) << np.uint64(i * n + j)
    return out.astype(np.int64)


def zorder_keys(ds, cols: list[str], *, id_col: str, bits: int = 16,
                minmax: dict[str, tuple[int, int]] | None = None,
                batch_size: int = 65536):
    """-> dataset of ``(id_col, zkey)``: the Z-order clustering key over
    ``cols`` (ints or timestamps). Quantization is exact int64
    arithmetic — ``(x - mn) * (2^bits - 1) // (mx - mn)`` — so the key
    is bit-reproducible on any engine (the SQL oracle recomputes it with
    the same floor division). ``minmax`` skips the statistics pass when
    the caller already holds fragment stats (e.g. from a sink manifest).

    n_cols * bits must fit 63 bits (int64 key; 2 x 16 default -> 32).
    """
    if len(cols) * bits > 63:
        raise ValueError("n_cols * bits must be <= 63 for an int64 key")
    mm = minmax if minmax is not None else column_minmax_int(ds, cols)

    def f(t: pa.Table) -> pa.Table:
        qs = []
        for c in cols:
            x = _to_int64(t.column(c)).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            mn, mx = mm.get(c, (0, 0))
            qs.append(_quantize(x, mn, mx, bits))
        z = _interleave(qs, bits)
        return pa.table({id_col: t.column(id_col),
                         "zkey": pa.array(z, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def range_partition_ids(ds, col: str, n_parts: int, *, id_col: str,
                        batch_size: int = 65536):
    """-> dataset of ``(id_col, part)``: balanced range-partition ids
    from exact quantile cut points (``quantile_disc(i / n_parts)``,
    i = 1..n_parts-1). Partition i holds rows with
    ``cuts[i-1] < value <= cuts[i]`` (part = #cuts strictly below the
    value — ``np.searchsorted(side='left')``), so every engine that
    computes the same cut points assigns the same ids. Skewed values
    collapse duplicate cut points into fewer, still-ordered partitions
    rather than overflowing one."""
    from easyner_ray.ops.sketch import exact_quantiles

    qs = [i / n_parts for i in range(1, n_parts)]
    cut_map = exact_quantiles(ds, col, qs)
    cuts = np.array([cut_map[q] for q in qs], dtype=np.float64)

    def f(t: pa.Table) -> pa.Table:
        v = t.column(col).cast(pa.float64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        part = np.searchsorted(cuts, v, side="left").astype(np.int64)
        return pa.table({id_col: t.column(id_col),
                         "part": pa.array(part, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
