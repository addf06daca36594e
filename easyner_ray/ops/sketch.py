"""Mergeable HyperLogLog approximate-distinct sketch — the
constant-memory alternative to the exact-distinct pair collapse in
stages/analysis.entity_frequency (SURVEY.md §2.5; custom-operator rule
(a): map_batches partials + a shuffle-free merge, like tree_final).

Why it matters at 100 TB: exact distinct keeps one row per (key, value)
pair alive through a keyed shuffle — O(distinct) state. The HLL partial
is a FIXED 2^p bytes per key per batch regardless of cardinality, the
merge is an elementwise byte max (associative, commutative, idempotent),
and no row-level shuffle happens at all: partial registers stream to a
single tiny final whose size is #keys x 2^p bytes. Standard error is
~1.04/sqrt(2^p) (~1.6% at p=12).

Fully deterministic (splitmix64 value hash, fixed estimator constants),
so the driver oracle is a straight-line single-process recompute
(sources/gold_derived.write_approx_distinct_gold — duplicated on
purpose as the spec's second realization).

Spec:
  * hash: splitmix64 of the int64 value (public-domain constants);
    strings hash via crc32(s) << 32 | crc32(s + "\\x00") first.
  * register index = top p hash bits; rho = leading-zero count of the
    remaining (64-p) bits + 1.
  * estimate: alpha_m * m^2 / sum(2^-reg); linear counting
    m * ln(m / zero_registers) when the raw estimate <= 2.5 m and zero
    registers exist. Rounded to int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SM_C1 = np.uint64(0x9E3779B97F4A7C15)
_SM_C2 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wrapping arithmetic)."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + _SM_C1)
        z = (z ^ (z >> np.uint64(30))) * _SM_C2
        z = (z ^ (z >> np.uint64(27))) * _SM_C3
        return z ^ (z >> np.uint64(31))


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(registers: np.ndarray) -> int:
    """Bias-corrected HLL estimate from a uint8 register array."""
    m = len(registers)
    est = _hll_alpha(m) * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return int(round(est))


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64: the float64-log2 trick is
    applied per 32-bit half (exactly representable), never to the full
    64-bit value (which misrounds within 2^-52 of a power of two)."""
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    out = np.zeros(len(x), dtype=np.int64)
    h = hi > 0
    out[h] = 33 + np.floor(np.log2(hi[h])).astype(np.int64)
    l = (~h) & (lo > 0)
    out[l] = 1 + np.floor(np.log2(lo[l])).astype(np.int64)
    return out


def _rho(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) arrays from uint64 hashes."""
    lowbits = 64 - p
    idx = (hashes >> np.uint64(lowbits)).astype(np.int64)
    rem = hashes & np.uint64((1 << lowbits) - 1)
    rho = (lowbits - _bit_length(rem) + 1).astype(np.uint8)
    return idx, rho


def _registers_for(hashes: np.ndarray, p: int) -> np.ndarray:
    """uint8 register array (len 2^p) from uint64 hashes."""
    idx, rho = _rho(hashes, p)
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _value_hashes(col: pa.ChunkedArray) -> np.ndarray:
    """uint64 hashes of an int64 or string value column."""
    import zlib

    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(col.type):
        return splitmix64(np.asarray(col.cast(pa.int64())).view(np.uint64))
    # strings: crc32-pair mix per DISTINCT value, then splitmix64
    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dvals = enc.dictionary.to_pylist()
    dh = np.array(
        [(zlib.crc32(v.encode()) << 32) | zlib.crc32((v + "\x00").encode())
         for v in dvals], dtype=np.uint64)
    return splitmix64(dh[np.asarray(enc.indices)])


def approx_distinct(ds, keys: list[str], value_col: str, p: int = 12,
                    out_name: str = "approx_distinct"):
    """-> Dataset (keys..., approx_distinct:int64): HLL distinct count of
    ``value_col`` per key group.

    Partial: one 2^p-byte register row per key per batch (vectorized
    ``np.maximum.at``). Final: shuffle-free elementwise-max merge on one
    task (the partial stream is #batches x #keys FIXED-SIZE rows — the
    tree_final shape; keyspace must fit one task, same contract).
    """
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.Table.from_arrays(
                [pa.array([], t.schema.field(k).type) for k in keys]
                + [pa.array([], pa.binary())],
                names=list(keys) + ["__regs"],
            )
        hashes = _value_hashes(t.column(value_col))
        if len(keys) == 1:
            gk = t.column(keys[0]).combine_chunks().cast(pa.string())
        else:
            gk = pc.binary_join_element_wise(
                *[t.column(k).combine_chunks().cast(pa.string()) for k in keys],
                "\x00")
        enc = pc.dictionary_encode(gk)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        gidx = np.asarray(enc.indices)
        n_groups = len(enc.dictionary)
        regs = np.zeros((n_groups, m), dtype=np.uint8)
        idx, rho = _rho(hashes, p)
        np.maximum.at(regs, (gidx, idx), rho)
        # one row per group: original key values from the first row of
        # each group (reversed assignment: last write = first row)
        first = np.empty(n_groups, dtype=np.int64)
        first[gidx[::-1]] = np.arange(len(gidx) - 1, -1, -1, dtype=np.int64)
        key_rows = t.select(keys).take(pa.array(first))
        return pa.Table.from_arrays(
            [key_rows.column(k) for k in keys]
            + [pa.array([regs[g].tobytes() for g in range(n_groups)],
                        pa.binary())],
            names=list(keys) + ["__regs"],
        )

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def final(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.Table.from_arrays(
                [pa.array([], t.schema.field(k).type) for k in keys]
                + [pa.array([], pa.int64())],
                names=list(keys) + [out_name],
            )
        if len(keys) == 1:
            gk = t.column(keys[0]).combine_chunks().cast(pa.string())
        else:
            gk = pc.binary_join_element_wise(
                *[t.column(k).combine_chunks().cast(pa.string()) for k in keys],
                "\x00")
        enc = pc.dictionary_encode(gk)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        gidx = np.asarray(enc.indices)
        n_groups = len(enc.dictionary)
        regs = np.zeros((n_groups, m), dtype=np.uint8)
        raw = t.column("__regs").to_pylist()
        for row, g in enumerate(gidx):
            np.maximum(regs[g], np.frombuffer(raw[row], dtype=np.uint8),
                       out=regs[g])
        first = np.empty(n_groups, dtype=np.int64)
        first[gidx[::-1]] = np.arange(len(gidx) - 1, -1, -1, dtype=np.int64)
        key_rows = t.select(keys).take(pa.array(first))
        ests = [hll_estimate(regs[g]) for g in range(n_groups)]
        return pa.Table.from_arrays(
            [key_rows.column(k) for k in keys]
            + [pa.array(ests, pa.int64())],
            names=list(keys) + [out_name],
        )

    # materialize() = fusion barrier (same rationale as tree_final use
    # sites); the partial stream is #batches x #keys fixed-size rows
    return partials.materialize().repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None)
