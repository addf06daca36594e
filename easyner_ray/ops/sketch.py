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
    """uint64 hashes of an int64 or string value column.

    Nulls are filled (0 / "") BEFORE the numpy conversion: an Arrow int64
    array WITH nulls converts to float64 (nulls -> NaN), and viewing
    float bit patterns as uint64 silently corrupts every hash in the
    batch — including the non-null rows (and costs exactness above 2^53).
    Callers that must EXCLUDE nulls apply ``pc.is_valid`` themselves."""
    import zlib

    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if col.null_count:
        col = col.fill_null(0 if pa.types.is_integer(col.type) else "")
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
    ``value_col`` per key group. Null VALUES are ignored (SQL
    COUNT(DISTINCT)) but the group survives: an all-null group reports 0,
    it does not vanish.

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
        # SQL count(DISTINCT) ignores null VALUES but keeps the group:
        # groups are keyed over the FULL batch and only valid rows feed
        # the registers, so an all-null group emits a zero-register row
        # (estimate 0) instead of vanishing
        vcol = t.column(value_col).combine_chunks()
        valid = (np.asarray(pc.is_valid(vcol)) if vcol.null_count
                 else None)
        hashes = _value_hashes(vcol.drop_null() if vcol.null_count
                               else vcol)
        if len(keys) == 1:
            gk = t.column(keys[0]).combine_chunks().cast(pa.string())
        else:
            gk = pc.binary_join_element_wise(
                *[t.column(k).combine_chunks().cast(pa.string()) for k in keys],
                "\x00", null_handling="replace",
                null_replacement="\x00__null__")
        if gk.null_count:
            # NULL group keys form ONE group (SQL GROUP BY); the original
            # (null) key value still rides key_rows below — the sentinel
            # only keys the dictionary (null indices go float64 in numpy)
            gk = gk.fill_null("\x00__null__")
        enc = pc.dictionary_encode(gk)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        gidx = np.asarray(enc.indices)
        n_groups = len(enc.dictionary)
        regs = np.zeros((n_groups, m), dtype=np.uint8)
        if len(hashes):
            idx, rho = _rho(hashes, p)
            g_valid = gidx[valid] if valid is not None else gidx
            np.maximum.at(regs, (g_valid, idx), rho)
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
                "\x00", null_handling="replace",
                null_replacement="\x00__null__")
        if gk.null_count:
            # NULL group keys form ONE group (SQL GROUP BY); the original
            # (null) key value still rides key_rows below — the sentinel
            # only keys the dictionary (null indices go float64 in numpy)
            gk = gk.fill_null("\x00__null__")
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


# ----------------------------------------------------------- quantiles ---


# final-collect row count of the most recent _refine_quantiles run —
# diagnostic only (tests assert the heavy-tie path never collects at
# corpus scale); single-threaded driver state
_LAST_COLLECTED = 0


def _bin_of(v: np.ndarray, lo: float, hi: float, n_bins: int) -> np.ndarray:
    """The ONE bin-assignment formula shared by every histogram pass and
    every membership re-check — self-consistency of this float expression
    (not mathematical bin boundaries) is what makes the refinement exact.
    CLAMPED into [0, n_bins-1]: a chain member can drift one ulp outside
    its child range (child bounds are lo + b*w floats), and an unclamped
    formula would drop it from every child bin — under-counting the
    histogram and shifting the rank bookkeeping off by one. Clamping is
    total, and membership tests reuse the same clamped expression, so
    counted set == collected set exactly. (Values far outside [lo, hi]
    never reach this: level 0 spans the true min/max and level k+1 only
    sees level-k members, which sit within a ulp of their bin.) NaNs must
    be filtered by the caller BEFORE this (floor(NaN) -> undefined int).
    HARD PRECONDITION: ``hi > lo`` and both finite — the formula divides
    by (hi - lo); callers uphold it (the active-state filter requires
    lo < hi, constant sets resolve before ever binning)."""
    idx = np.floor((v - lo) * (float(n_bins) / (hi - lo))).astype(np.int64)
    return np.clip(idx, 0, n_bins - 1)


def _finite_values(t: pa.Table, col: str) -> np.ndarray:
    """float64 values of ``col`` with nulls AND NaNs removed (NaN has no
    defined rank here; DuckDB sorts NaN above all values — out of scope,
    documented)."""
    a = t.column(col).combine_chunks().drop_null()
    v = np.asarray(a.cast(pa.float64()))
    return v[~np.isnan(v)] if np.isnan(v).any() else v


def _refine_quantiles(vals, col: str, states: list[dict], n_bins: int,
                      collect_cap: int, max_depth: int,
                      group_col: str | None = None) -> None:
    """Shared histogram-refinement engine behind :func:`exact_quantiles`
    (one implicit group) and :func:`grouped_quantiles` (one state per
    (group, q)). Mutates each state dict in place until ``value`` is set.

    A state: {"g": group value or None, "chain": [(lo, hi, bin)...],
    "lo", "hi", "rank", "count", "value"}. Each pass streams the input
    once, histogramming every active state's candidate range (fixed
    n_bins int64 counts per state per batch) and merging by elementwise
    SUM — the shuffle-free repartition(1) HLL pattern. The bin holding
    the target rank narrows the range n_bins-fold; states whose candidate
    count drops under ``collect_cap`` (and any left over at max_depth)
    are resolved exactly from one final tagged collect. Heavy ties never
    freeze: each pass also carries the candidate set's exact min/max, so
    a constant set resolves instantly (any rank IS that value) and a
    one-bin set resets its range to the exact span, which must split next
    pass — no corpus-scale collect regardless of tie skew. The driver
    holds per-batch stat rows, merged histograms and the bounded
    candidate sets — never O(corpus) state. Returns {"collected": n},
    the final-collect row count (a testable driver-memory bound), also
    mirrored to module-level ``_LAST_COLLECTED`` for callers that only
    see the public quantile functions."""
    global _LAST_COLLECTED

    def values_and_masks(t: pa.Table, needed: list[dict]):
        """(per-state candidate value arrays) for one batch — nulls/NaNs
        out, group mask + chain membership applied with the clamped
        formula. The group column is hoisted once per batch and each
        distinct group's equality mask computed once, shared across that
        group's quantile states; a ``None`` group value selects the NULL
        group (SQL PARTITION BY keeps one)."""
        a = t.column(col).combine_chunks()
        valid = (np.asarray(pc.and_kleene(
            pc.is_valid(a), pc.invert(pc.is_nan(
                a.cast(pa.float64())))).fill_null(False))
            if a.null_count or pa.types.is_floating(a.type) else None)
        v_all = (np.asarray(a.fill_null(0).cast(pa.float64()))
                 if a.null_count else np.asarray(a.cast(pa.float64())))
        gcol = (t.column(group_col).combine_chunks()
                if group_col is not None else None)
        gmasks: dict = {}
        out = []
        for s in needed:
            m = valid.copy() if valid is not None else np.ones(len(v_all), bool)
            if gcol is not None:
                gv = s["g"]
                gm = gmasks.get(gv)
                if gm is None:
                    gm = (np.asarray(pc.is_null(gcol)) if gv is None else
                          np.asarray(pc.equal(gcol, gv).fill_null(False)))
                    gmasks[gv] = gm
                m &= gm
            vv = v_all[m]
            for lo, hi, b in s["chain"]:
                vv = vv[_bin_of(vv, lo, hi, n_bins) == b]
            out.append(vv)
        return out

    for _ in range(max_depth):
        active = [s for s in states if s["value"] is None
                  and s["count"] > collect_cap and s["lo"] < s["hi"]]
        if not active:
            break
        spec = [dict(s) for s in active]  # plain dicts ship to tasks

        def hist(t: pa.Table) -> pa.Table:
            vvs = values_and_masks(t, spec)
            ci_out, counts_out, mn_out, mx_out = [], [], [], []
            for ci, (s, vv) in enumerate(zip(spec, vvs)):
                counts = np.zeros(n_bins, dtype=np.int64)
                if len(vv):
                    np.add.at(counts,
                              _bin_of(vv, s["lo"], s["hi"], n_bins), 1)
                ci_out.append(ci)
                counts_out.append(counts.tobytes())
                # candidate-set span rides along: the heavy-tie resolver
                # below needs the EXACT min/max of the set, not the
                # lo/hi estimate inherited from the parent bin
                mn_out.append(float(vv.min()) if len(vv) else np.inf)
                mx_out.append(float(vv.max()) if len(vv) else -np.inf)
            return pa.Table.from_arrays(
                [pa.array(ci_out, pa.int32()),
                 pa.array(counts_out, pa.binary()),
                 pa.array(mn_out, pa.float64()),
                 pa.array(mx_out, pa.float64())],
                names=["ci", "counts", "mn", "mx"])

        def merge(t: pa.Table) -> pa.Table:
            ci = np.asarray(t.column("ci").combine_chunks())
            raw = t.column("counts").to_pylist()
            mn = np.asarray(t.column("mn").combine_chunks())
            mx = np.asarray(t.column("mx").combine_chunks())
            acc: dict = {}
            for i, c in enumerate(ci):
                prev = acc.get(int(c))
                cur = (np.frombuffer(raw[i], dtype=np.int64),
                       float(mn[i]), float(mx[i]))
                acc[int(c)] = cur if prev is None else (
                    prev[0] + cur[0], min(prev[1], cur[1]),
                    max(prev[2], cur[2]))
            items = sorted(acc.items())
            return pa.Table.from_arrays(
                [pa.array([k for k, _ in items], pa.int32()),
                 pa.array([a[0].tobytes() for _, a in items], pa.binary()),
                 pa.array([a[1] for _, a in items], pa.float64()),
                 pa.array([a[2] for _, a in items], pa.float64())],
                names=["ci", "counts", "mn", "mx"])

        merged = (vals.map_batches(hist, batch_format="pyarrow")
                  .materialize().repartition(1)
                  .map_batches(merge, batch_format="pyarrow",
                               batch_size=None).take_all())
        by_ci = {int(r["ci"]): (np.frombuffer(r["counts"], dtype=np.int64),
                                r["mn"], r["mx"])
                 for r in merged}
        for ci, s in enumerate(active):
            counts, mn, mx = by_ci[ci]
            if mn == mx:
                # the whole candidate set is ONE value — any rank picks
                # it; resolves corpus-scale constant/heavy-tie columns
                # with no collect at all
                s["value"] = float(mn)
                continue
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, s["rank"]))
            before = int(cum[b - 1]) if b > 0 else 0
            new_count = int(counts[b])
            s["chain"].append((s["lo"], s["hi"], b))
            s["rank"] -= before
            if new_count == s["count"]:
                # no narrowing (all candidates share one bin): reset the
                # range to the set's EXACT span — both endpoints are
                # present, so the next histogram puts them in different
                # bins and MUST split (strict progress, no freeze/collect)
                s["lo"], s["hi"] = float(mn), float(mx)
                continue
            s["count"] = new_count
            w = (s["hi"] - s["lo"]) / n_bins
            s["lo"], s["hi"] = s["lo"] + b * w, s["lo"] + (b + 1) * w

    # count==0 states (all-null groups) stay value=None — SQL quantile
    # over the empty set — and never reach the collect
    open_states = [s for s in states if s["value"] is None
                   and s["count"] > 0]
    if not open_states:
        _LAST_COLLECTED = 0
        return {"collected": 0}
    spec = [dict(s) for s in open_states]

    def collect(t: pa.Table) -> pa.Table:
        vvs = values_and_masks(t, spec)
        ci_out = [np.full(len(vv), ci, dtype=np.int32)
                  for ci, vv in enumerate(vvs)]
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(ci_out) if ci_out else [], pa.int32()),
             pa.array(np.concatenate(vvs) if vvs else [], pa.float64())],
            names=["ci", "v"])

    cand = pa.Table.from_pylist(
        vals.map_batches(collect, batch_format="pyarrow").take_all())
    ci_arr = np.asarray(cand.column("ci").combine_chunks())
    v_arr = np.asarray(cand.column("v").combine_chunks())
    for ci, s in enumerate(open_states):
        mine = np.sort(v_arr[ci_arr == ci], kind="stable")
        s["value"] = float(mine[s["rank"] - 1])
    _LAST_COLLECTED = len(cand)
    return {"collected": len(cand)}


def exact_quantiles(ds, col: str, qs: list[float], n_bins: int = 8192,
                    collect_cap: int = 2_000_000, max_depth: int = 4):
    """EXACT discrete quantiles of a column at 100 TB — no sort, no
    shuffle: iterative histogram refinement (the classic distributed
    selection algorithm; core shared with :func:`grouped_quantiles`).
    Returns {q: value}; value is an actual element (DuckDB
    ``quantile_disc`` semantics: 1-indexed rank ``ceil(q*n)`` ascending).

    Passes over the (single-column, pruned) stream: (1) min/max/count
    partials, one tiny row per batch; (2..d) per active quantile an
    ``n_bins`` histogram of its candidate range, merged by elementwise
    SUM — two passes resolve ~1e12 rows below ``collect_cap``; (d+1) one
    tagged collect of the surviving candidates (<= collect_cap per
    quantile, the documented driver bound) picks the rank exactly. Heavy
    ties short-circuit: a constant candidate set resolves in-pass from
    its min==max, never via collect."""
    vals = ds.select_columns([col])

    def stats(t: pa.Table) -> pa.Table:
        v = _finite_values(t, col)
        if len(v) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.float64()), pa.array([], pa.float64()),
                 pa.array([], pa.int64())], names=["mn", "mx", "n"])
        return pa.Table.from_arrays(
            [pa.array([float(v.min())]), pa.array([float(v.max())]),
             pa.array([len(v)], pa.int64())], names=["mn", "mx", "n"])

    stat_rows = vals.map_batches(stats, batch_format="pyarrow").take_all()
    if not stat_rows:  # zero input blocks: no schema to reduce over
        return {q: None for q in qs}
    st = pa.Table.from_pylist(stat_rows)
    n_total = int(pc.sum(st.column("n")).as_py() or 0)
    if n_total == 0:
        return {q: None for q in qs}
    lo0 = float(pc.min(st.column("mn")).as_py())
    hi0 = float(pc.max(st.column("mx")).as_py())
    if lo0 == hi0:  # constant column: every quantile IS that value
        return {q: lo0 for q in qs}

    states = [{"g": None, "q": q, "chain": [], "lo": lo0, "hi": hi0,
               "rank": max(1, int(np.ceil(np.float64(q) * n_total))),
               "count": n_total, "value": None} for q in qs]
    _refine_quantiles(vals, col, states, n_bins, collect_cap, max_depth)
    return {s["q"]: s["value"] for s in states}


def exact_quantiles_cont(ds, col: str, qs: list[float], n_bins: int = 8192,
                         collect_cap: int = 2_000_000, max_depth: int = 4):
    """EXACT interpolated quantiles — SQL ``percentile_cont`` / DuckDB
    ``quantile_cont`` semantics: the value at fractional position
    ``(n-1)*q`` (0-indexed), linearly interpolated between the two
    bracketing elements (``lo + (hi - lo) * frac``). Training-data
    curation thresholds commonly use this form rather than the discrete
    ``quantile_disc`` of :func:`exact_quantiles`.

    Same execution shape as :func:`exact_quantiles` — the two bracketing
    ranks of every requested q resolve through the shared histogram
    refinement core (no sort, no shuffle, bounded driver state); the only
    new math is the final driver-side lerp. Returns ``{q: value}``."""
    vals = ds.select_columns([col])

    def stats(t: pa.Table) -> pa.Table:
        v = _finite_values(t, col)
        if len(v) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.float64()), pa.array([], pa.float64()),
                 pa.array([], pa.int64())], names=["mn", "mx", "n"])
        return pa.Table.from_arrays(
            [pa.array([float(v.min())]), pa.array([float(v.max())]),
             pa.array([len(v)], pa.int64())], names=["mn", "mx", "n"])

    stat_rows = vals.map_batches(stats, batch_format="pyarrow").take_all()
    if not stat_rows:
        return {q: None for q in qs}
    st = pa.Table.from_pylist(stat_rows)
    n_total = int(pc.sum(st.column("n")).as_py() or 0)
    if n_total == 0:
        return {q: None for q in qs}
    lo0 = float(pc.min(st.column("mn")).as_py())
    hi0 = float(pc.max(st.column("mx")).as_py())
    if lo0 == hi0:
        return {q: lo0 for q in qs}

    plan: dict[float, tuple[int, int, float]] = {}
    need: dict[int, None] = {}  # distinct bracketing ranks, insertion order
    for q in qs:
        pos = np.float64(q) * (n_total - 1)
        k_lo = int(np.floor(pos)) + 1            # 1-indexed lower bracket
        frac = float(pos - np.floor(pos))
        k_hi = min(k_lo + 1, n_total) if frac > 0.0 else k_lo
        plan[q] = (k_lo, k_hi, frac)
        need[k_lo] = None
        need[k_hi] = None

    states = [{"g": None, "q": k, "chain": [], "lo": lo0, "hi": hi0,
               "rank": k, "count": n_total, "value": None} for k in need]
    _refine_quantiles(vals, col, states, n_bins, collect_cap, max_depth)
    by_rank = {s["q"]: s["value"] for s in states}  # "rank" mutates in place
    out: dict[float, float] = {}
    for q, (k_lo, k_hi, frac) in plan.items():
        v_lo, v_hi = by_rank[k_lo], by_rank[k_hi]
        out[q] = v_lo if frac == 0.0 else v_lo + (v_hi - v_lo) * frac
    return out


# ------------------------------------------------------ count-min sketch ---


def _cms_hashes(keys: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) int64 counter indices: row i hashes via splitmix64 with
    seed splitmix64(i+1) XORed in — d pairwise-independent-ish rows from
    one vectorized finalizer."""
    out = np.empty((depth, len(keys)), dtype=np.int64)
    k = keys.astype(np.uint64)
    for i in range(depth):
        seed = splitmix64(np.array([i + 1], dtype=np.uint64))[0]
        out[i] = (splitmix64(k ^ seed) % np.uint64(width)).astype(np.int64)
    return out


def cms_counts(ds, col: str, query_keys: list[int], width: int = 2048,
               depth: int = 4, out_name: str = "est_count"):
    """Count-min sketch frequency estimates (never under-counts) for
    ``query_keys`` over an int column — the heavy-hitter primitive whose
    state is a FIXED depth x width counter matrix regardless of
    cardinality. Partials merge by elementwise ADDITION (commutative +
    associative), so the distributed build is bit-identical to a
    single-pass build and the oracle is a straight-line recompute
    (sources/gold_derived.write_cms_gold, duplicated on purpose as the
    spec's second realization). Merge is the shuffle-free
    ``repartition(1)`` HLL pattern — counter rows stream, never rows of
    the corpus."""
    mat_bytes = depth * width * 8

    def partial(t: pa.Table) -> pa.Table:
        a = t.column(col).combine_chunks().drop_null()
        k = np.asarray(a.cast(pa.int64()))
        counts = np.zeros((depth, width), dtype=np.int64)
        if len(k):
            h = _cms_hashes(k, depth, width)
            for i in range(depth):
                np.add.at(counts[i], h[i], 1)
        return pa.Table.from_arrays(
            [pa.array([counts.tobytes()], pa.binary())], names=["__cms"])

    def final(t: pa.Table) -> pa.Table:
        counts = np.zeros(depth * width, dtype=np.int64)
        for raw in t.column("__cms").to_pylist():
            counts += np.frombuffer(raw, dtype=np.int64)
        counts = counts.reshape(depth, width)
        qk = np.asarray(query_keys, dtype=np.int64)
        h = _cms_hashes(qk, depth, width)
        est = counts[np.arange(depth)[:, None], h].min(axis=0)
        return pa.Table.from_arrays(
            [pa.array(qk, pa.int64()), pa.array(est, pa.int64())],
            names=[col, out_name])

    assert mat_bytes < (64 << 20), "sketch must fit one merge task"
    return (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .materialize().repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def _grouped_minmax(vals, by: str, col: str):
    """Per-group (min, max, finite count) partials merged on the driver —
    the stats pass shared by :func:`grouped_quantiles` and
    :func:`grouped_quantiles_cont`. NaN values become null so
    min/max/count (null-skipping) exclude exactly the set the refinement
    core excludes — but the group KEY row survives, so a group whose
    values are ALL null/NaN still reports (n=0) instead of vanishing
    (SQL GROUP BY keeps the group; quantile over the empty set is NULL).
    A NULL group KEY also stays: Arrow group_by gives it its own group."""

    def stats(t: pa.Table) -> pa.Table:
        a = t.column(col).combine_chunks().cast(pa.float64())
        nan = pc.is_nan(a)
        if len(a) and (pc.any(nan).as_py() or False):
            a = pc.if_else(nan, pa.scalar(None, pa.float64()), a)
        tt = pa.Table.from_arrays([t.column(by), a], names=[by, col])
        g = tt.group_by([by]).aggregate(
            [(col, "min"), (col, "max"), (col, "count")])
        return pa.Table.from_arrays(
            [g.column(by), g.column(f"{col}_min"),
             g.column(f"{col}_max"),
             g.column(f"{col}_count").cast(pa.int64())],
            names=[by, "mn", "mx", "n"])

    rows = vals.map_batches(stats, batch_format="pyarrow").take_all()
    agg: dict = {}
    for r in rows:
        k = r[by]
        mn, mx, n = agg.get(k, (np.inf, -np.inf, 0))
        if r["n"]:
            agg[k] = (min(mn, r["mn"]), max(mx, r["mx"]), n + r["n"])
        else:
            agg[k] = (mn, mx, n)
    return rows, agg


def grouped_quantiles(ds, col: str, qs: list[float], by: str,
                      n_bins: int = 8192, collect_cap: int = 2_000_000,
                      max_depth: int = 4) -> pa.Table:
    """Per-group EXACT discrete quantiles (quantile_disc semantics) for a
    SMALL group keyspace (class labels, event types, languages) — the
    grouped form of :func:`exact_quantiles`: same shared refinement core
    (:func:`_refine_quantiles`) with one candidate-range state per
    (group, q). Returns a driver-side ``pa.Table`` (by, q, value) —
    #groups x #qs rows. A group whose values are all null/NaN keeps its
    rows with value=NULL (SQL semantics), it does not vanish.

    The per-pass state is #groups x #qs x n_bins int64 counts — for open
    group keyspaces use a bucketed shuffle per group instead (the
    windows.user_sessions contract); this operator's contract is the
    quality-threshold-per-language / score-per-class shape where groups
    number in the dozens."""
    vals = ds.select_columns([by, col])
    rows, agg = _grouped_minmax(vals, by, col)

    states = []
    for gk in sorted(agg, key=lambda x: (x is None, x)):  # NULL group last
        mn, mx, n = agg[gk]
        for q in qs:
            states.append({"g": gk, "q": q, "chain": [], "lo": mn, "hi": mx,
                           "rank": max(1, int(np.ceil(np.float64(q) * n))),
                           "count": n,
                           "value": mn if mn == mx else None})
    _refine_quantiles(vals, col, states, n_bins, collect_cap, max_depth,
                      group_col=by)

    by_type = pa.Table.from_pylist(rows).schema.field(by).type if rows \
        else pa.string()
    return pa.Table.from_arrays(
        [pa.array([s["g"] for s in states], by_type),
         pa.array([s["q"] for s in states], pa.float64()),
         pa.array([s["value"] for s in states], pa.float64())],
        names=[by, "q", "value"])


def grouped_quantiles_cont(ds, col: str, qs: list[float], by: str,
                           n_bins: int = 8192,
                           collect_cap: int = 2_000_000,
                           max_depth: int = 4) -> pa.Table:
    """Per-group INTERPOLATED quantiles — ``percentile_cont`` /
    ``quantile_cont`` BY group, the per-class-curation-threshold shape
    (quality band per language, score cut per source). Grouped form of
    :func:`exact_quantiles_cont`: one refinement state per (group,
    bracketing rank), resolved through the shared core, then a driver
    lerp per (group, q). Same small-group-keyspace contract as
    :func:`grouped_quantiles`. Returns a driver-side ``pa.Table``
    (by, q, value); empty/all-null groups keep value=NULL."""
    vals = ds.select_columns([by, col])
    rows, agg = _grouped_minmax(vals, by, col)

    states = []
    plan: dict = {}     # (group, q) -> (k_lo, k_hi, frac) | None
    by_rank: dict = {}  # (group, rank) -> state
    for gk in sorted(agg, key=lambda x: (x is None, x)):  # NULL group last
        mn, mx, n = agg[gk]
        for q in qs:
            if n == 0:
                plan[(gk, q)] = None
                continue
            pos = np.float64(q) * (n - 1)
            k_lo = int(np.floor(pos)) + 1
            frac = float(pos - np.floor(pos))
            k_hi = min(k_lo + 1, n) if frac > 0.0 else k_lo
            plan[(gk, q)] = (k_lo, k_hi, frac)
            for k in (k_lo, k_hi):
                if (gk, k) not in by_rank:
                    s = {"g": gk, "q": q, "chain": [], "lo": mn, "hi": mx,
                         "rank": k, "count": n,
                         "value": mn if mn == mx else None}
                    by_rank[(gk, k)] = s
                    states.append(s)
    _refine_quantiles(vals, col, states, n_bins, collect_cap, max_depth,
                      group_col=by)

    out_g, out_q, out_v = [], [], []
    for gk in sorted(agg, key=lambda x: (x is None, x)):
        for q in qs:
            p = plan[(gk, q)]
            if p is None:
                v = None
            else:
                k_lo, k_hi, frac = p
                v_lo = by_rank[(gk, k_lo)]["value"]
                v_hi = by_rank[(gk, k_hi)]["value"]
                v = v_lo if frac == 0.0 else v_lo + (v_hi - v_lo) * frac
            out_g.append(gk)
            out_q.append(q)
            out_v.append(v)
    by_type = pa.Table.from_pylist(rows).schema.field(by).type if rows \
        else pa.string()
    return pa.Table.from_arrays(
        [pa.array(out_g, by_type), pa.array(out_q, pa.float64()),
         pa.array(out_v, pa.float64())],
        names=[by, "q", "value"])


def mad_outliers(ds, col: str, by: str, *, k: float = 3.0,
                 batch_size: int = 65536):
    """Robust per-group outlier census via MAD (median absolute
    deviation) — the heavy-tail-safe complement of the z-score gate
    (``analytic.zscore``) and winsorization: mean/stddev move with the
    very outliers they are supposed to catch, the median pair does not.
    Per group: ``med = median(x)``, ``mad = median(|x - med|)``, outlier
    iff ``|x - med| > k * mad``. -> one row per group
    ``(by, n_values, n_outliers, med, mad)``; NULL values are excluded
    everywhere (SQL aggregate semantics).

    Built on :func:`grouped_quantiles_cont` (exact interpolated
    medians, the ``quantile_cont`` bisection core), so the medians are
    bit-exact vs SQL ``median`` and every downstream float (the
    deviation subtraction, the ``k * mad`` threshold compare) is the
    same IEEE op on identical inputs — no rounding grain needed. Small
    group-keyspace contract (event types / languages / labels): the
    per-group median map broadcasts by closure; values stream through
    two quantile refinements + one counting pass, nothing corpus-sized
    materializes on the driver."""
    import ray.data as rd

    vals = ds.select_columns([by, col]).materialize()  # 3 consumers
    med_tbl = grouped_quantiles_cont(vals, col, [0.5], by)
    med_map = {g: v for g, v in zip(med_tbl.column(by).to_pylist(),
                                    med_tbl.column("value").to_pylist())}

    def lookup(groups: pa.Array, mapping: dict) -> np.ndarray:
        enc = pc.dictionary_encode(groups.combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        per_code = np.array([mapping.get(u, np.nan) if u is not None
                             else mapping.get(None, np.nan)
                             for u in enc.dictionary.to_pylist()],
                            dtype=np.float64)
        return per_code[enc.indices.fill_null(0).to_numpy(
            zero_copy_only=False)]

    def dev_batch(t: pa.Table) -> pa.Table:
        x = t.column(col).cast(pa.float64())
        med = lookup(t.column(by), med_map)
        dev = pc.abs(pc.subtract(x, pa.array(med, pa.float64())))
        return pa.Table.from_arrays([t.column(by), dev],
                                    names=[by, "__dev"])

    devs = vals.map_batches(dev_batch, batch_format="pyarrow",
                            batch_size=batch_size).materialize()
    mad_tbl = grouped_quantiles_cont(devs, "__dev", [0.5], by)
    mad_map = {g: v for g, v in zip(mad_tbl.column(by).to_pylist(),
                                    mad_tbl.column("value").to_pylist())}

    def count_batch(t: pa.Table) -> pa.Table:
        dev = t.column("__dev")
        thr = lookup(t.column(by), {g: (np.nan if m is None else k * m)
                                    for g, m in mad_map.items()})
        out = pc.and_kleene(dev.combine_chunks().is_valid(),
                            pc.greater(dev, pa.array(thr, pa.float64())))
        g = pa.Table.from_arrays(
            [t.column(by), dev.combine_chunks().is_valid().cast(pa.int64()),
             out.fill_null(False).cast(pa.int64())],
            names=[by, "__n", "__o"])
        return g.group_by([by]).aggregate([("__n", "sum"), ("__o", "sum")]) \
            .rename_columns([by, "__n", "__o"])

    from easyner_ray.ops.relational import grouped_agg

    counts = grouped_agg(
        devs.map_batches(count_batch, batch_format="pyarrow",
                         batch_size=batch_size),
        [by], [("__n", "sum", "n_values"), ("__o", "sum", "n_outliers")])

    def finish(t: pa.Table) -> pa.Table:
        med = lookup(t.column(by), med_map)
        mad = lookup(t.column(by), mad_map)
        return pa.Table.from_arrays(
            [t.column(by), t.column("n_values").cast(pa.int64()),
             t.column("n_outliers").cast(pa.int64()),
             pa.array(med, pa.float64()), pa.array(mad, pa.float64())],
            names=[by, "n_values", "n_outliers", "med", "mad"])

    return counts.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------------------- bloom filter ---


def _bloom_bits(hashes: np.ndarray, n_bits: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(word index, bit mask) arrays for k derived hashes per value —
    h_i = splitmix64(h ^ splitmix64(1000+i)) mod n_bits, packed uint64."""
    words_list, masks_list = [], []
    for i in range(k):
        seed = splitmix64(np.array([1000 + i], dtype=np.uint64))[0]
        hi = splitmix64(hashes ^ seed) % np.uint64(n_bits)
        words_list.append((hi >> np.uint64(6)).astype(np.int64))
        masks_list.append(np.uint64(1) << (hi & np.uint64(63)))
    return np.concatenate(words_list), np.concatenate(masks_list)


def bloom_build(ds, col: str, n_bits: int = 1 << 23, k: int = 5) -> bytes:
    """Build a Bloom filter over a column — the broadcastable membership
    sketch that turns a big-big semi/anti join into a map-only prefilter.
    FIXED n_bits/8 bytes regardless of cardinality; partials merge by
    bitwise OR (commutative/associative/idempotent -> partition-
    invariant), the shuffle-free repartition(1) pattern. Returns the
    packed bitmap (driver-side, bounded: 1 MiB at the default).

    False-positive rate ~ (1 - e^{-k n / m})^k; size n_bits for the
    expected distinct count (~10 bits/element at k=5 -> ~1% FP)."""
    assert n_bits % 64 == 0
    n_words = n_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(n_words, dtype=np.uint64)
        a = t.column(col).combine_chunks().drop_null()
        if len(a):
            w, m = _bloom_bits(_value_hashes(a), n_bits, k)
            np.bitwise_or.at(bits, w, m)
        return pa.Table.from_arrays(
            [pa.array([bits.tobytes()], pa.binary())], names=["__bloom"])

    def merge(t: pa.Table) -> pa.Table:
        bits = np.zeros(n_words, dtype=np.uint64)
        for raw in t.column("__bloom").to_pylist():
            bits |= np.frombuffer(raw, dtype=np.uint64)
        return pa.Table.from_arrays(
            [pa.array([bits.tobytes()], pa.binary())], names=["__bloom"])

    rows = (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .materialize().repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None)
            .take_all())
    return rows[0]["__bloom"] if rows else bytes(n_bits // 8)


def bloom_filter_rows(ds, col: str, bloom: bytes, n_bits: int | None = None,
                      k: int = 5, batch_size: int = 65536):
    """Keep rows whose ``col`` value is POSSIBLY in the bloom set (no
    false negatives; FP rate per the build). The bitmap ships to plasma
    ONCE (``ray.put``); each batch tests membership with k vectorized
    gathers. Chain an exact ``semi_join_filter`` (or keyed join) after it
    when exact semantics are required — the bloom's job is to drop the
    bulk of non-members before the expensive stage."""
    import ray

    if n_bits is None:
        n_bits = len(bloom) * 8
    ref = ray.put(np.frombuffer(bloom, dtype=np.uint64))

    def probe(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        bits = ray.get(ref)
        a = t.column(col).combine_chunks()
        w, m = _bloom_bits(_value_hashes(a), n_bits, k)
        hit = (bits[w] & m) != 0
        ok = hit.reshape(k, len(t)).all(axis=0)
        # a null key is NOT a member (the build side drop_null'd)
        if a.null_count:
            ok &= np.asarray(pc.is_valid(a))
        return t.filter(pa.array(ok))

    return ds.map_batches(probe, batch_format="pyarrow",
                          batch_size=batch_size)


# ---------------------------------------------------- heavy hitters ---


def _mg_batch(t: pa.Table, col: str, m: int) -> pa.Table:
    """Per-batch Misra-Gries candidate pass, vectorized: exact counts
    within the batch (one Arrow group_by), keep every value whose batch
    count exceeds batch_len/(m+1) — the MG survivor set with m counters,
    computed directly since the batch is already in memory."""
    a = t.column(col).combine_chunks()
    if a.null_count:
        a = a.drop_null()
    n = len(a)
    if n == 0:
        return pa.Table.from_arrays([a[:0]], names=[col])
    g = pa.Table.from_arrays([a], names=[col]).group_by([col]) \
        .aggregate([(col, "count")])
    keep = pc.greater(g.column(f"{col}_count"), n // (m + 1))
    return g.filter(keep).select([col])


def heavy_hitters(ds, col: str, k: int, *, m: int = 4096,
                  batch_size: int = 65536):
    """Top-``k`` most frequent values of ``col`` WITHOUT a full-keyspace
    groupby — the bounded-memory frequent-items shape for columns whose
    distinct count scales with the corpus (URLs, user ids, n-grams).

    Two passes, both map-only + one small aggregate:

    1. **Candidate pass** (Misra-Gries per batch): each batch forwards at
       most ``m`` survivors — values whose batch count exceeds
       ``len/(m+1)``. Any value with GLOBAL frequency > N/(m+1) must
       exceed that threshold in at least one batch (pigeonhole), so the
       candidate UNION (order-independent, hence deterministic) is a
       superset of every such value.
    2. **Verify pass**: exact counts for candidates only
       (:func:`~easyner_ray.ops.relational.adaptive_semi_join` — broadcast
       ``is_in`` while the candidate set is small, hash-shuffle semi
       above the byte gate — then one grouped count), and top-k with
       ties broken by value.

    EXACTNESS CONTRACT: the result equals the true top-k whenever the
    true k-th frequency exceeds N/(m+1) — size ``m`` to the skew you
    expect (the per-batch survivor table is <= m rows, so shuffle volume
    is <= m x #batches regardless of keyspace). A flatter distribution
    needs a bigger m or the full :func:`~easyner_ray.ops.relational.
    grouped_agg` + top-k.
    """
    from easyner_ray.ops.relational import (adaptive_semi_join, grouped_agg,
                                            topk_per_group)

    narrow = ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column(col).combine_chunks().drop_null()], names=[col]),
        batch_format="pyarrow", batch_size=batch_size).materialize()

    cands = grouped_agg(
        narrow.map_batches(lambda t: _mg_batch(t, col, m),
                           batch_format="pyarrow", batch_size=batch_size),
        [col], [(col, "count", "__c")],
    ).select_columns([col])

    counts = grouped_agg(
        adaptive_semi_join(narrow, cands, on=col),
        [col], [(col, "count", "n")])
    ranked = topk_per_group(
        counts.map_batches(
            lambda t: t.append_column("__g", pa.array([0] * len(t),
                                                      pa.int8())),
            batch_format="pyarrow"),
        ["__g"], "n", k, descending=True, tie_cols=[col], rank_name="rnk")
    return ranked.map_batches(lambda t: t.drop(["__g"]),
                              batch_format="pyarrow")


def grouped_ks_vs_global(ds, group_col: str, value_col: str, *,
                         round_digits: int = 4, n_buckets: int = 32):
    """Two-sample Kolmogorov–Smirnov statistic of each group's value
    distribution against the GLOBAL distribution -> (group, ks) — the
    standard distribution-drift detector (is this source / shard / day
    sampled from the same distribution as the corpus?). ``ks`` is
    ``sup_x |F_group(x) - F_global(x)|``; both ECDFs are step functions
    that only jump at sample points, so the sup is attained on the
    global point set and the whole computation is exact.

    Distributed shape: one (value, count) rollup onto the global value
    keyspace, collected + broadcast as the sorted (values, cumulative
    fraction) pair (at 100 TB swap this side for a KLL/t-digest sketch
    grid — the group pass is unchanged); one (group, value, count)
    rollup + bucketed exchange, then a pure-numpy kernel per group:
    ``np.searchsorted`` of the group's jump points into the global grid
    gives F_group at every global point in one shot. All fractions are
    exact-integer divisions, so the statistic is bit-equal to the SQL
    ASOF-join realization at the rounding grain.
    """
    import ray

    from easyner_ray.ops.relational import add_hash_bucket, grouped_agg

    proj = ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column(group_col), t.column(value_col).cast(pa.float64())],
            names=[group_col, "v"]),
        batch_format="pyarrow").materialize()  # feeds both rollups

    gtbl = pa.concat_tables([ray.get(r) for r in grouped_agg(
        proj.map_batches(lambda t: t.select(["v"]),
                         batch_format="pyarrow"),
        ["v"], [("v", "count", "c")]).materialize().to_arrow_refs()])
    gv = gtbl.column("v").combine_chunks().to_numpy(zero_copy_only=False)
    gc = gtbl.column("c").combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(gv, kind="stable")
    gv, gc = gv[order], gc[order]
    n_tot = int(gc.sum())
    fg = np.cumsum(gc) * 1.0 / n_tot
    grid_ref = ray.put((gv, fg))

    per = grouped_agg(proj, [group_col, "v"], [("v", "count", "c")])

    def kernel(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bucket"])
        out_schema = pa.schema([t.schema.field(group_col),
                                pa.field("ks", pa.float64())])
        if len(t) == 0:
            return out_schema.empty_table()
        gvb, fgb = ray.get(grid_ref)
        t = t.take(pc.sort_indices(t, sort_keys=[(group_col, "ascending"),
                                                 ("v", "ascending")]))
        keys = t.column(group_col).combine_chunks()
        n = len(t)
        change = np.ones(n, dtype=bool)
        same = pc.equal(keys.slice(1), keys.slice(0, n - 1))
        change[1:] = ~np.asarray(same.fill_null(False))
        starts = np.flatnonzero(change)
        v = t.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        c = t.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        out_ks = []
        # loop over GROUPS of the (group, value) rollup — bounded by the
        # group keyspace, not the corpus (theil_sen contract)
        for s, e in zip(starts, np.append(starts[1:], n)):
            seg_v, seg_c = v[s:e], c[s:e]
            ng = int(seg_c.sum())
            ft_cum = np.cumsum(seg_c) * 1.0 / ng
            idx = np.searchsorted(seg_v, gvb, side="right")
            ft_at = np.where(idx > 0, ft_cum[np.maximum(idx - 1, 0)], 0.0)
            out_ks.append(round(float(np.abs(ft_at - fgb).max()),
                                round_digits))
        return pa.table({group_col: keys.take(pa.array(starts)),
                         "ks": pa.array(out_ks, pa.float64())})

    bucketed = per.map_batches(
        lambda t: add_hash_bucket(t, [group_col], n_buckets),
        batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow")
