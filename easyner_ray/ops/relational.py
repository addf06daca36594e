"""Relational building blocks used by the oracle-checked queries:
broadcast hash join, semi-join filter, two-phase group aggregates.

Join strategy selection (SURVEY.md §4): a dimension table that fits in
worker memory is BROADCAST (``ray.put`` once, dict lookup inside
``map_batches`` — no shuffle at all); only a big-big join pays Ray Data's
hash-shuffle ``Dataset.join``. Aggregations are two-phase: a vectorized
``pyarrow`` ``Table.group_by`` collapses each batch before the global
``groupby``, so hot keys ship one row per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def base_schema(ds) -> pa.Schema | None:
    """``ds.schema().base_schema``, or None when the dataset is EMPTY and
    Ray lost its type info: in Ray 2.49 ANY lazy transform over a 0-row
    dataset materializes to ZERO blocks, so ``Dataset.schema()`` returns
    None (verified; ``from_arrow`` of a typed empty table keeps the
    schema, but one ``map_batches``/``filter``/``groupby`` over it drops
    it). Callers treat None as "provably empty" and short-circuit — at
    100 TB a shard whose filter dropped every row is a WHEN, not an IF,
    and an unguarded ``.schema().base_schema`` loses the whole run."""
    s = ds.schema()
    return None if s is None else s.base_schema


def broadcast_lookup(small_table: pa.Table, key: str, value_cols: list[str]) -> dict:
    """dict key -> tuple(value_cols) from a driver-side small table."""
    keys = small_table.column(key).to_pylist()
    vals = list(zip(*(small_table.column(c).to_pylist() for c in value_cols)))
    return dict(zip(keys, vals))


def broadcast_join(large_ds, small_table: pa.Table, *, on: str, right_key: str,
                   value_cols: list[str], how: str = "inner",
                   batch_size: int = 8192):
    """Map-side hash join: ``large_ds`` joins ``small_table`` on
    large.on == small.right_key, appending ``value_cols``.

    The small side goes to the object store ONCE (``ray.put`` of an Arrow
    table — plasma reads are zero-copy, so per-task ``ray.get`` costs
    nothing) and each batch runs pyarrow's C++ hash join against it.
    Stateless tasks, deliberately NOT an actor pool: chained pools each
    pin their minimum actor and can starve upstream reads on small CPU
    counts, while the join itself has no per-worker state to amortize.

    Duplicate keys on the small side multiply rows (SQL join semantics).
    Row order within a batch is not preserved (hash join).
    """
    small = small_table.select([right_key] + value_cols).combine_chunks()
    small_ref = ray.put(small)
    join_type = "inner" if how == "inner" else "left outer"

    def join_batch(batch: pa.Table) -> pa.Table:
        st = ray.get(small_ref)
        joined = batch.join(st, keys=[on], right_keys=[right_key], join_type=join_type)
        return joined.select(list(batch.schema.names) + list(value_cols))

    return large_ds.map_batches(join_batch, batch_format="pyarrow", batch_size=batch_size)


def semi_join_filter(large_ds, key_set, *, on: str, batch_size: int = 8192):
    """Keep rows whose ``on`` value is in ``key_set`` (broadcast set;
    vectorized ``is_in``)."""
    keys = pa.array(sorted(key_set))

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(on), value_set=keys))

    return large_ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def adaptive_semi_join(left, right_keys, *, on: str, anti: bool = False,
                       broadcast_bytes: int = 64 << 20,
                       approx_bytes: int | None = None,
                       batch_size: int = 8192):
    """Semi/anti join that auto-switches strategy on the KEY side's size
    (the same adaptive pattern as ``entity_frequency``'s final and
    TF-IDF's idf side): a keys stream under ``broadcast_bytes`` becomes
    ONE ``ray.put`` Arrow array + vectorized ``pc.is_in`` per batch (zero
    shuffle, no join-aggregator actor startup — measured ~1 s/join saved
    at bench scale); above it, Ray's hash-shuffle left_semi/left_anti
    (both sides partition — the 100 TB path, where a dedup rep set scales
    with the corpus).

    ``right_keys`` is consumed fully either way (it's materialized to
    read its size), so passing an unbounded stream costs one checkpoint.
    NULL left keys: never match — dropped by semi, KEPT by anti (``is_in``
    maps null -> false; NOT EXISTS semantics, same as Ray's left_anti).
    """
    right = right_keys.materialize()
    if right.size_bytes() > broadcast_bytes:
        # approx_bytes: caller's LEFT-side size estimate for aggregator
        # sizing (never computed here — size_bytes() on a lazy dataset
        # executes it). anti goes through the schema-normalizing wrapper.
        if anti:
            return anti_join(left, right, on=on, approx_bytes=approx_bytes)
        return hash_join(left, right, on=on, join_type="left_semi",
                         approx_bytes=approx_bytes)
    blocks = [b for b in ray.get(right.to_arrow_refs()) if len(b)]
    if blocks:
        keys = pa.concat_tables(blocks).column(on).combine_chunks()
    else:  # typed empty set (the left's key type keeps is_in well-typed)
        lbase = base_schema(left)
        if lbase is None:  # left is provably empty too -> empty result
            return left
        keys = pa.array([], lbase.field(on).type)
    keys_ref = ray.put(keys)

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(on), value_set=ray.get(keys_ref))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(pc.fill_null(mask, anti))

    return left.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


_AGG_FNS = {"sum": "sum", "min": "min", "max": "max", "count": "count", "mean": None}
_FINAL = {"sum": Sum, "min": Min, "max": Max}
_FINAL_PA = {"sum": "sum", "min": "min", "max": "max"}


def add_hash_bucket(batch: pa.Table, keys: list[str], n_buckets: int,
                    col: str = "__bucket") -> pa.Table:
    """Append an int32 hash-bucket column over ``keys``.

    Hashes are computed on the DICTIONARY of distinct key values, not per
    row: the composite key is dictionary-encoded (C), crc32 runs once per
    distinct value, and rows get their bucket via a vectorized ``take`` —
    on pre-aggregated streams distinct values are a small fraction of rows.
    """
    import zlib

    import numpy as np

    # strip schema metadata (zero-copy): blocks arriving from pandas
    # map_groups stages carry b'pandas' metadata that makes pa.Schema
    # unhashable in this pyarrow build — the downstream sort's schema
    # unification then logs a warning per block. Every bucketed shuffle
    # enters through here, so this is the one chokepoint.
    if batch.schema.metadata:
        batch = batch.replace_schema_metadata(None)
    if len(batch) == 0:
        return batch.append_column(col, pa.array([], pa.int32()))
    if len(keys) == 1:
        key_col = batch.column(keys[0]).combine_chunks().cast(pa.string())
    else:
        key_col = pc.binary_join_element_wise(
            *[batch.column(k).combine_chunks().cast(pa.string()) for k in keys], "\x00"
        )
    if key_col.null_count:
        # null keys share ONE bucket (SQL partition semantics); null
        # dictionary indices would also go float in numpy below
        key_col = key_col.fill_null("\x00__null__")
    enc = pc.dictionary_encode(key_col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dict_vals = enc.dictionary.to_pylist()
    dict_buckets = np.array(
        [zlib.crc32(v.encode()) % n_buckets for v in dict_vals], dtype=np.int32
    )
    b = pa.array(dict_buckets[np.asarray(enc.indices)], pa.int32())
    return batch.append_column(col, b)


def bucketed_final(partial_ds, keys: list[str], pa_aggs: list[tuple[str, str]],
                   out_names: list[str], n_buckets: int = 64):
    """Final combine of a partial-aggregate stream WITHOUT Ray's per-group
    Python loop: shuffle on a coarse int bucket (hash of the real key), then
    one vectorized ``pyarrow.Table.group_by`` per bucket.

    Ray's native ``groupby(keys).aggregate(...)`` costs Python-per-group in
    its combine stage — at 10^5+ groups that dominates wall time (measured
    ~10x). Hash-uniform buckets keep every group intact inside one bucket
    and bound the group-launch overhead by ``n_buckets``, while the in-
    bucket aggregation runs in Arrow C++.
    """

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(pa_aggs)
        cols = [g.column(k) for k in keys]
        for (col, fn), out in zip(pa_aggs, out_names):
            cols.append(g.column(f"{col}_{fn}"))
        return pa.Table.from_arrays(cols, names=list(keys) + list(out_names))

    bucketed = partial_ds.map_batches(
        lambda t: add_hash_bucket(t, keys, n_buckets), batch_format="pyarrow"
    )
    return bucketed.groupby("__bucket").map_groups(combine, batch_format="pyarrow")


def grouped_agg(ds, keys: list[str], specs: list[tuple[str, str, str]],
                batch_size: int = 65536, n_buckets: int | None = 64,
                final: str = "bucketed"):
    """Two-phase distributed aggregate.

    specs: (col, fn, out_name) with fn in {sum,min,max,count,mean}.
    Phase 1 (vectorized, per batch): pyarrow Table.group_by collapses the
    batch; mean becomes (sum, count) partials. Phase 2 (``final``):

      * ``"bucketed"`` (default) — coarse-hash-bucket shuffle + per-bucket
        Arrow group_by (``bucketed_final``); the corpus-scale-keyspace
        shape. Pass ``n_buckets=None`` to use Ray's native aggregate.
      * ``"tree"`` — NO keyed shuffle (``tree_final`` over the
        materialized partial stream): the right shape when #distinct(keys)
        is small (class labels, priorities, flags) — a 64-bucket shuffle
        of a 5-key stream leaves ~59 empty sort partitions whose empty
        blocks cost scheduling and trip Ray's schema-divergence warning.
    """
    # (col, fn) -> output name; deduped so e.g. mean+sum of one column
    # computes the pyarrow partial only once.
    p_aggs: list[tuple[str, str]] = []
    outputs: list[tuple[str, str]] = []  # (pyarrow_name, rename) per output col
    finals = []
    final_specs: list[tuple[str, str]] = []  # (partial_out_name, final_fn)
    derive_means: list[tuple[str, str, str]] = []

    def _add(col: str, fn: str) -> str:
        if (col, fn) not in p_aggs:
            p_aggs.append((col, fn))
        return f"{col}_{fn}"

    for col, fn, out in specs:
        if fn == "mean":
            outputs.append((_add(col, "sum"), f"__{out}_s"))
            outputs.append((_add(col, "count"), f"__{out}_c"))
            finals += [Sum(f"__{out}_s", alias_name=f"__{out}_s"),
                       Sum(f"__{out}_c", alias_name=f"__{out}_c")]
            final_specs += [(f"__{out}_s", "sum"), (f"__{out}_c", "sum")]
            derive_means.append((out, f"__{out}_s", f"__{out}_c"))
        elif fn == "count":
            outputs.append((_add(col, "count"), out))
            finals.append(Sum(out, alias_name=out))
            final_specs.append((out, "sum"))
        else:
            outputs.append((_add(col, fn), out))
            finals.append(_FINAL[fn](out, alias_name=out))
            final_specs.append((out, _FINAL_PA[fn]))

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate(p_aggs)
        cols = [g.column(k) for k in keys]
        names = list(keys)
        for pa_name, rename in outputs:
            cols.append(g.column(pa_name))
            names.append(rename)
        return pa.Table.from_arrays(cols, names=names)

    partial_ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    if final == "tree":
        # materialize() = fusion barrier (tree_final's 1M level-1 batch
        # size must not force the partial stage onto million-row batches);
        # the partial stream is per-batch collapsed, so it is tiny
        out_ds = tree_final(
            partial_ds.materialize(), keys,
            pa_aggs=[(pname, ffn) for pname, ffn in final_specs],
            out_names=[pname for pname, _ in final_specs],
        )
    elif n_buckets:
        out_ds = bucketed_final(
            partial_ds, keys,
            pa_aggs=[(pname, ffn) for pname, ffn in final_specs],
            out_names=[pname for pname, _ in final_specs],
            n_buckets=n_buckets,
        )
    else:
        out_ds = partial_ds.groupby(keys).aggregate(*finals)

    if derive_means:
        def derive(t: pa.Table) -> pa.Table:
            for out, s, c in derive_means:
                t = t.append_column(
                    out,
                    pc.divide(t.column(s).cast(pa.float64()), t.column(c).cast(pa.float64())),
                )
            return t.drop([n for _, s, c in derive_means for n in (s, c)])

        out_ds = out_ds.map_batches(derive, batch_format="pyarrow")
    return out_ds


def tree_final(partial_ds, keys: list[str], pa_aggs: list[tuple[str, str]],
               out_names: list[str], level1_batch: int = 1_000_000):
    """Final combine WITHOUT any keyed shuffle — for SMALL final keyspaces.

    Level 1 coalesces ~``level1_batch`` partial rows per task and collapses
    them with one vectorized ``Table.group_by``; level 2 concatenates the
    (per-task-keyspace-bounded) outputs into one block and finishes there.
    Correct whenever #distinct(keys) fits one task comfortably — entity
    vocabularies, class labels, time buckets. Use :func:`bucketed_final`
    when the keyspace scales with the corpus.
    """

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(pa_aggs)
        cols = [g.column(k) for k in keys]
        for (col, fn), out in zip(pa_aggs, out_names):
            cols.append(g.column(f"{col}_{fn}"))
        return pa.Table.from_arrays(cols, names=list(keys) + list(out_names))

    # level-2 aggregates re-aggregate level-1 outputs: same fn per column,
    # but input column names are now out_names
    l2_aggs = [(out, fn) for (_, fn), out in zip(pa_aggs, out_names)]

    def combine2(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(l2_aggs)
        cols = [g.column(k) for k in keys]
        for (col, fn) in l2_aggs:
            cols.append(g.column(f"{col}_{fn}"))
        return pa.Table.from_arrays(cols, names=list(keys) + list(out_names))

    lvl1 = partial_ds.map_batches(combine, batch_format="pyarrow",
                                  batch_size=level1_batch)
    return lvl1.repartition(1).map_batches(combine2, batch_format="pyarrow",
                                           batch_size=None)


def join_partition_count(approx_bytes: int | None,
                         partition_bytes: int = 256 << 20) -> int:
    """Hash-join aggregator count from an input-bytes estimate: one
    aggregator per ~``partition_bytes`` of joined data, floor 4 (keep a
    minimum of parallelism), cap 512 (scheduler sanity).

    No estimate -> min(32, cluster CPUs): the aggregators are ACTORS that
    must all schedule before the join makes progress, so a fixed 32 on a
    small session (tests run Ray at 4 CPUs) deadlocks outright — the
    fallback must never exceed what the cluster can host."""
    if approx_bytes is None:
        cpus = 32
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 32) or 32)
        return max(2, min(32, cpus))
    return max(4, min(512, int(approx_bytes // partition_bytes) + 1))


def hash_join(left, right, *, on: str, right_on: str | None = None,
              join_type: str = "inner", num_partitions: int | None = None,
              approx_bytes: int | None = None, partition_bytes: int = 256 << 20):
    """Big-big equi-join via Ray Data's native hash-shuffle join — the
    strategy for the case :func:`broadcast_join` can't take (NEITHER side
    fits in worker memory). Both sides hash-partition on the key across
    ``num_partitions`` aggregators; size partitions so each fits a worker.
    Prefer broadcast whenever one side is dimension-table-sized: it costs
    zero shuffles.

    ``num_partitions=None`` sizes the partition count at
    ~``partition_bytes`` per aggregator (floor 4) from ``approx_bytes``,
    the caller's estimate of both sides' total bytes: each join aggregator
    is a live actor spun up per execution, so a fixed large count pays
    seconds of startup on small inputs, while a fixed small count
    overloads aggregator heaps at 100 TB. Measured here: 600k-row join
    16 -> 4 partitions cut wall 3.8 s -> 2.5 s; 64 partitions cost 25 s
    (startup + scheduling, same data). Compute ``approx_bytes`` from the
    PRUNED source reads (``ds.size_bytes()`` is metadata-cheap there but
    EXECUTES any transformed dataset — never call it on one); with
    neither given, falls back to 32."""
    if num_partitions is None:
        num_partitions = join_partition_count(approx_bytes, partition_bytes)
    if join_type in ("left_semi", "left_anti"):
        # Ray's hash join raises ArrowInvalid when the right side is
        # EMPTY — and an empty right is the normal case for these types
        # (no duplicates found, nothing to subtract). The right side of a
        # semi/anti is a keys-only stream the join consumes fully anyway,
        # so materializing it to count costs nothing extra.
        import ray.data as rd

        right = right.materialize()
        if right.count() == 0:
            if join_type == "left_anti":
                return left
            base = base_schema(left)
            if base is None:  # left provably empty -> already the result
                return left
            return rd.from_arrow(base.empty_table())
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=((right_on or on),),
    )


def adaptive_join(left, right, *, on: str, right_on: str | None = None,
                  how: str = "inner", broadcast_bytes: int = 64 << 20,
                  approx_bytes: int | None = None, batch_size: int = 8192):
    """Equi-join that auto-switches strategy on the RIGHT side's measured
    size — the same adaptive gate as :func:`adaptive_semi_join` and
    TF-IDF's idf side, applied to a full (column-appending) join.

    Under ``broadcast_bytes`` the right side becomes ONE ``ray.put`` Arrow
    table and each left batch runs pyarrow's C++ hash join against it —
    zero shuffle, no join-aggregator actors (those are live actors spun up
    per execution; at bench scale their startup dominates the join).
    Above the gate, Ray Data's native hash-shuffle :func:`hash_join` —
    both sides partition, the 100 TB path.

    Output columns on BOTH paths: left columns then right non-key columns
    (Ray's ``Dataset.join`` drops the right key; the broadcast path selects
    the same set). Right column names must not collide with left ones.
    ``right`` is consumed fully either way (materialized to read its
    size), so passing an unbounded stream costs one checkpoint.
    ``how``: "inner" or "left" (left outer). Broadcast-path row order
    within a batch is not preserved (hash join)."""
    rk = right_on or on
    right = right.materialize()
    rschema = base_schema(right)
    lschema = base_schema(left)
    if rschema is None or lschema is None:
        # One side is provably EMPTY and Ray lost its types (zero blocks
        # — see base_schema). The missing side's value columns are
        # unknowable, so degrade to the row-correct best effort:
        # inner/empty-right -> 0 rows (left schema); left-outer/empty
        # -right -> left unchanged (null value cols can't be typed);
        # empty left -> left as-is (0 rows either way).
        if lschema is None:
            return left
        return left if how == "left" else left.limit(0)
    value_cols = [n for n in rschema.names if n != rk]
    out_cols = list(lschema.names) + value_cols

    if right.size_bytes() > broadcast_bytes:
        joined = hash_join(left, right, on=on, right_on=right_on,
                           join_type="inner" if how == "inner" else "left_outer",
                           approx_bytes=approx_bytes)
        return joined.map_batches(lambda t: t.select(out_cols),
                                  batch_format="pyarrow")

    blocks = [b for b in ray.get(right.to_arrow_refs()) if len(b)]
    small = (pa.concat_tables(blocks) if blocks else rschema.empty_table()) \
        .select([rk] + value_cols).combine_chunks()
    small_ref = ray.put(small)
    join_type = "inner" if how == "inner" else "left outer"

    def join_batch(batch: pa.Table) -> pa.Table:
        st = ray.get(small_ref)
        joined = batch.join(st, keys=[on], right_keys=[rk], join_type=join_type)
        return joined.select(out_cols)

    return left.map_batches(join_batch, batch_format="pyarrow",
                            batch_size=batch_size)


def anti_join(left, right, *, on: str, right_on: str | None = None,
              num_partitions: int | None = None,
              approx_bytes: int | None = None):
    """Rows of ``left`` with NO match in ``right`` (reference has only the
    positive subset filter, ``subset_creator.py``; the negative filter is
    its complement and the shape every train/eval split audit needs).

    Big-big: Ray's native ``left_anti`` hash-shuffle join — both sides
    partition on the key, so it scales exactly like :func:`hash_join`.
    When ``right``'s DISTINCT key set is dimension-table-sized, prefer the
    zero-shuffle broadcast complement: ``semi_join_filter`` with the set
    inverted (``pc.is_in`` + ``invert``) — same pattern, no exchange."""
    base = base_schema(left)
    if base is None:  # left provably empty (see base_schema) -> result
        return left
    out = hash_join(left, right, on=on, right_on=right_on,
                    join_type="left_anti", num_partitions=num_partitions,
                    approx_bytes=approx_bytes)

    # Ray's join emits SCHEMA-LESS empty blocks for empty partitions;
    # normalize so an all-filtered result still carries the left schema
    def norm(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return base.empty_table()
        return t.select(base.names).cast(base)

    import ray.data as rd

    # one empty schema-carrying block unioned in: an all-filtered result
    # still exposes the left schema (the join can emit ZERO blocks)
    return out.map_batches(norm, batch_format="pyarrow").union(
        rd.from_arrow(base.empty_table()))


_KNUTH32 = 2654435761  # Knuth multiplicative hash constant (2^32 / phi)


def hash_sample(ds, key: str, rate: float, batch_size: int = 65536):
    """Deterministic, reproducible Bernoulli sample: keep rows where
    ``(key * 2654435761) mod 2^32 < rate * 2^32``.

    The train/holdout-split primitive for a 100 TB corpus: map-only (no
    shuffle, no RNG state, no seed coordination across workers), stable
    under repartitioning and re-runs, and the SAME row set falls in the
    sample on every engine that implements the arithmetic — which is why
    the oracle can express it in ANSI SQL. Multiplicative hashing scrambles
    sequential ids uniformly across the 2^32 range.

    ``key`` must be a non-negative integer column; values < 2^32 keep the
    engine bit-identical with plain-SQL int64 arithmetic (beyond that the
    wrapping uint64 product still samples correctly, but an oracle needs
    128-bit math)."""
    import numpy as np

    thr = np.uint64(int(rate * (1 << 32)))
    mask32 = np.uint64(0xFFFFFFFF)
    mult = np.uint64(_KNUTH32)

    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        col = t.column(key).combine_chunks()
        # null keys are excluded (SQL: NULL*c % m < thr is NULL -> false);
        # fill BEFORE numpy — an int64 array with nulls converts to
        # float64/NaN and corrupts every row's arithmetic
        valid = None
        if col.null_count:
            valid = np.asarray(pc.is_valid(col))
            col = col.fill_null(0)
        k = np.asarray(col.cast(pa.int64())).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k * mult) & mask32
        keep = h < thr
        if valid is not None:
            keep &= valid
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def mixture_sample(ds, key: str, rates: dict[str, float], *,
                   group_col: str, default_rate: float = 0.0,
                   batch_size: int = 65536):
    """Deterministic PER-GROUP Bernoulli sample — the source-mixture
    primitive of training-data assembly (Pile/Dolma-style "x% of web,
    y% of code, z% of books"): keep a row iff
    ``(key * 2654435761) mod 2^32 < rates[group] * 2^32``.

    Same map-only / no-RNG / repartition-stable contract as
    :func:`hash_sample`, so the oracle is a plain SQL CASE over the
    group column. Groups absent from ``rates`` use ``default_rate``
    (0.0 = drop, the explicit-mixture reading). Thresholds resolve per
    batch through the group column's dictionary encoding — a
    vocabulary-sized lookup, not a per-row Python branch. NULL keys and
    NULL groups are excluded (SQL: NULL comparisons are never true)."""
    import numpy as np

    thr_map = {g: np.uint64(int(r * (1 << 32))) for g, r in rates.items()}
    default_thr = np.uint64(int(default_rate * (1 << 32)))
    mask32 = np.uint64(0xFFFFFFFF)
    mult = np.uint64(_KNUTH32)

    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        col = t.column(key).combine_chunks()
        valid = np.asarray(pc.is_valid(col))
        col = col.fill_null(0)
        k = np.asarray(col.cast(pa.int64())).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k * mult) & mask32
        g = t.column(group_col).combine_chunks().dictionary_encode()
        uniq = g.dictionary.to_pylist()
        thr_by_code = np.array(
            [default_thr if u is None else thr_map.get(u, default_thr)
             for u in uniq], dtype=np.uint64)
        codes = g.indices.fill_null(0).to_numpy(zero_copy_only=False)
        gvalid = np.asarray(pc.is_valid(g.indices))
        keep = (h < thr_by_code[codes]) & valid & gvalid
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def split_assign(ds, key: str, fractions: list[tuple[str, float]], *,
                 out_col: str = "split", batch_size: int = 65536):
    """Deterministic train/val/test split assignment — the eval-holdout
    primitive of a training-data pipeline: label each row by where its
    Knuth hash ``(key * 2654435761) mod 2^32`` falls among the cumulative
    fraction thresholds. Map-only (no shuffle, no RNG, no seed
    coordination), stable under repartitioning and re-runs, and — unlike
    a random_shuffle + limit split — a row keeps its split when the
    corpus around it grows, so yesterday's val set never leaks into
    tomorrow's train set.

    ``fractions`` is ordered ``[(label, frac), ...]``; the LAST label is
    the residual (SQL CASE ... ELSE), catching hashes past the last
    cumulative threshold and NULL keys (SQL: a NULL comparison is never
    true, so NULLs fall to ELSE). Thresholds accumulate as
    ``int(frac * 2**32)`` per label — mirror the resulting integer
    literals in an oracle rather than re-deriving them in decimal
    arithmetic (DuckDB CAST rounds where Python int() truncates)."""
    import numpy as np

    labels = [lab for lab, _ in fractions]
    cum, acc = [], 0
    for _, frac in fractions[:-1]:
        acc += int(frac * (1 << 32))
        cum.append(acc)
    cum_thr = np.array(cum, dtype=np.uint64)
    mask32 = np.uint64(0xFFFFFFFF)
    mult = np.uint64(_KNUTH32)
    last = len(labels) - 1
    label_dict = pa.array(labels, type=pa.string())

    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(out_col, pa.array([], type=pa.string()))
        col = t.column(key).combine_chunks()
        invalid = None
        if col.null_count:
            invalid = ~np.asarray(pc.is_valid(col))
            col = col.fill_null(0)
        k = np.asarray(col.cast(pa.int64())).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k * mult) & mask32
        idx = np.searchsorted(cum_thr, h, side="right")
        if invalid is not None:
            idx[invalid] = last
        out = pa.DictionaryArray.from_arrays(
            pa.array(idx.astype(np.int32)), label_dict)
        return t.append_column(out_col, out.cast(pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def rebalance_sources(ds, targets: dict[str, float], *, key: str,
                      group_col: str, batch_size: int = 65536):
    """Rebalance a corpus to a TARGET mixture distribution — the
    crawl-balancing primitive ("the training set should be 50% web /
    30% code / 20% books" when the raw crawl is nothing like that).
    Scales every target share to the bottleneck source
    (``m = min(n_g / share_g)``, the largest feasible total), derives a
    per-group acceptance rate ``share_g * m / n_g`` (= 1.0 for the
    bottleneck, < 1 elsewhere, 0 for groups absent from ``targets``),
    then applies the deterministic Knuth-hash Bernoulli gate of
    :func:`mixture_sample`.

    Two passes: a grouped count over the group keyspace (tiny — one row
    per source, never corpus-sized), then the map-only gate. Rates are
    computed in double precision exactly as an ANSI-SQL oracle would
    (``share * m / n`` left-to-right, threshold = floor(rate * 2^32)),
    so the kept row set is engine-independent."""
    counts = grouped_agg(ds.select_columns([group_col]), [group_col],
                         [(group_col, "count", "n")],
                         final="tree").take_all()
    n_by_g = {r[group_col]: r["n"] for r in counts}
    feasible = [n_by_g[g] / s for g, s in targets.items()
                if s > 0 and n_by_g.get(g)]
    if not feasible:
        return ds.filter(lambda _: False)
    m = min(feasible)
    rates = {g: (s * m / n_by_g[g]) for g, s in targets.items()
             if s > 0 and n_by_g.get(g)}
    return mixture_sample(ds, key, rates, group_col=group_col,
                          batch_size=batch_size)


def snapshot_diff(old, new, *, key: str = "doc_id",
                  fingerprint_col: str = "fingerprint"):
    """Corpus version audit: what changed between two snapshots of the
    same table — the validation step before promoting a re-crawled /
    re-curated corpus. Inputs are (key, fingerprint) projections of each
    version; output is ``(key, status)`` with status in
    ``added`` (key only in new) / ``removed`` (only in old) /
    ``changed`` (both, different fingerprint); unchanged rows are
    dropped, so the result is diff-sized, not corpus-sized.

    Rides :func:`full_outer_join` (hash-shuffle above the byte gate,
    single-task Arrow below), then one vectorized status map — the
    audit never materializes either corpus on the driver."""
    import ray.data as rd

    # anchor types come from whichever snapshot still carries a schema;
    # a derived-empty side reports None (see base_schema) but its typed
    # twin fixes the key/fingerprint types. Both None -> both provably
    # empty -> empty diff at the same int64-key grain the status kernel's
    # schema-less fallback uses.
    fb = base_schema(old) or base_schema(new)
    if fb is None:
        return rd.from_arrow(pa.schema(
            [(key, pa.int64()), ("status", pa.string())]).empty_table())

    def project(src, new_name: str):
        # rename per batch, and union one typed zero-row block: a fully
        # empty snapshot otherwise loses its schema through map_batches
        # (and Dataset.rename_columns doesn't re-project a zero-row
        # dataset's reported schema), which would break full_outer_join's
        # empty-side short-circuits
        anchor = pa.schema([(key, fb.field(key).type),
                            (new_name, fb.field(fingerprint_col).type)])
        proj = src.select_columns([key, fingerprint_col]).map_batches(
            lambda t: t.rename_columns([key, new_name]),
            batch_format="pyarrow")
        return proj.union(rd.from_arrow(anchor.empty_table()))

    o = project(old, "__fp_old")
    n = project(new, "__fp_new")
    joined = full_outer_join(o, n, on=key)

    def status(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.string())],
                names=[key, "status"])
        fo, fn = t.column("__fp_old"), t.column("__fp_new")
        st = pc.if_else(pc.is_null(fo), "added",
                        pc.if_else(pc.is_null(fn), "removed", "changed"))
        keep = pc.or_kleene(
            pc.or_kleene(pc.is_null(fo), pc.is_null(fn)),
            pc.not_equal(fo, fn)).fill_null(False)
        out = pa.Table.from_arrays([t.column(key), st.cast(pa.string())],
                                   names=[key, "status"])
        return out.filter(keep)

    return joined.map_batches(status, batch_format="pyarrow")


_XXH32_P2 = 2246822519  # xxhash32 prime 2 — independent of _KNUTH32


def export_shards(ds, key: str, n_shards: int, *, batch_size: int = 65536):
    """Deterministic global shuffle + shard assignment — the map-only
    training-export primitive (shuffle the corpus, cut it into N shards,
    fix the within-shard order) that replaces ``random_shuffle``'s
    all-to-all with pure arithmetic:

        shard    = (key * 2654435761) mod 2^32 mod n_shards
        sort_key = (key * 2246822519) mod 2^32

    Two independent multiplicative hashes (Knuth / xxhash prime 2): the
    shard cut and the within-shard order are uncorrelated, so shard 0 is
    not "the smallest keys" and the order inside a shard is not key
    order. No RNG state, stable under repartitioning, SQL-expressible —
    and re-running on a grown corpus moves no previously-assigned row
    (incremental export). NULL keys are dropped (they have no stable
    identity to shuffle on)."""
    import numpy as np

    mask32 = np.uint64(0xFFFFFFFF)
    m1, m2 = np.uint64(_KNUTH32), np.uint64(_XXH32_P2)
    nsh = np.uint64(n_shards)

    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("shard", pa.array([], pa.int64())) \
                    .append_column("sort_key", pa.array([], pa.int64()))
        col = t.column(key).combine_chunks()
        if col.null_count:
            t = t.filter(pc.is_valid(col))
            col = t.column(key).combine_chunks()
        k = np.asarray(col.cast(pa.int64())).astype(np.uint64)
        with np.errstate(over="ignore"):
            shard = ((k * m1) & mask32) % nsh
            order = (k * m2) & mask32
        return t.append_column("shard", pa.array(shard.astype(np.int64))) \
                .append_column("sort_key", pa.array(order.astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def epoch_upsample(ds, key: str, epochs: dict[str, float], *,
                   group_col: str, default_epochs: float = 0.0,
                   batch_size: int = 65536):
    """Fractional-epoch corpus assembly (the Llama/Pile mixing rule
    "source X is seen 2.4 times per training epoch"): every row is
    emitted ``floor(e)`` times, plus once more iff its Knuth-hash
    Bernoulli draw is under ``frac(e)`` — so EXACTLY the right rows are
    upsampled, deterministically, with no RNG state and no shuffle
    (map-only row expansion; ``e < 1`` downsamples, the
    :func:`mixture_sample` special case). Appends ``epoch_idx``
    (0..k-1) so a training loader can interleave epochs. Groups absent
    from ``epochs`` get ``default_epochs``; NULL keys/groups drop."""
    import numpy as np

    floor_map = {g: int(np.floor(e)) for g, e in epochs.items()}
    frac_map = {g: np.uint64(int((e - np.floor(e)) * (1 << 32)))
                for g, e in epochs.items()}
    d_floor = int(np.floor(default_epochs))
    d_frac = np.uint64(int((default_epochs - np.floor(default_epochs))
                           * (1 << 32)))
    mask32 = np.uint64(0xFFFFFFFF)
    mult = np.uint64(_KNUTH32)

    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("epoch_idx", pa.array([], pa.int64()))
        col = t.column(key).combine_chunks()
        g = t.column(group_col).combine_chunks()
        ok = pc.and_kleene(col.is_valid(), g.is_valid())
        if len(ok) and not pc.all(ok).as_py():
            t = t.filter(ok)
            col = t.column(key).combine_chunks()
            g = t.column(group_col).combine_chunks()
        k = np.asarray(col.cast(pa.int64())).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k * mult) & mask32
        enc = g.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        fl = np.array([floor_map.get(u, d_floor) for u in uniq],
                      dtype=np.int64)
        fr = np.array([frac_map.get(u, d_frac) for u in uniq],
                      dtype=np.uint64)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        reps = fl[codes] + (h < fr[codes]).astype(np.int64)
        out = t.take(pa.array(np.repeat(np.arange(len(t)), reps)))
        ends = np.cumsum(reps)
        idx = np.arange(int(ends[-1]) if len(ends) else 0,
                        dtype=np.int64) - np.repeat(ends - reps, reps)
        return out.append_column("epoch_idx", pa.array(idx, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def stratified_sample(ds, group_keys: list[str], n_per_group: int, *,
                      id_col: str, n_buckets: int = 32,
                      batch_size: int = 65536):
    """Deterministic stratified sample: ``n_per_group`` rows per group,
    chosen by the multiplicative hash of ``id_col`` — the class-balancing
    primitive a training-data pipeline needs (cap every language /
    domain / label at N examples) built as :func:`topk_per_group` over a
    derived hash order, so it inherits the bounded-shuffle property:
    each batch forwards at most n rows per group it sees, a hot group
    ships n rows per batch, never its full membership.

    Hash order (not ``random_sample``) for the same reason as
    :func:`hash_sample`: no RNG state, stable under repartitioning and
    re-runs, reproducible across engines — the oracle expresses it as
    ``row_number() OVER (PARTITION BY g ORDER BY (id*2654435761) %% 2^32,
    id)``. ``id_col`` must be a non-negative int column; the id itself
    tie-breaks equal hashes. NULL ids are excluded from the sample (the
    SQL form never ranks them first: NULL arithmetic sorts last), and
    they must be dropped BEFORE numpy — an int64 array with nulls
    converts to float64/NaN and corrupts every row's hash (the same trap
    :func:`hash_sample` documents)."""
    import numpy as np

    mask32 = np.uint64(0xFFFFFFFF)
    mult = np.uint64(_KNUTH32)

    def add_hash(t: pa.Table) -> pa.Table:
        col = t.column(id_col).combine_chunks()
        # Negative ids are dropped, not wrapped: the uint64 cast below
        # would wrap them while SQL's % keeps the sign — silently
        # diverging instead of erroring (same guard as weighted_sample).
        ok = pc.and_kleene(col.is_valid(), pc.greater_equal(col, 0))
        if not (pc.all(ok).as_py() if len(ok) else True):
            t = t.filter(ok)
            col = t.column(id_col).combine_chunks()
        k_arr = np.asarray(col.cast(pa.int64())).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k_arr * mult) & mask32
        return t.append_column("__h", pa.array(h.astype(np.int64), pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            batch_size=batch_size)
    out = topk_per_group(hashed, group_keys, "__h", n_per_group,
                         descending=False, tie_cols=[id_col],
                         rank_name="sample_rank", n_buckets=n_buckets)
    return out.map_batches(lambda t: t.drop(["__h"]), batch_format="pyarrow")


def _topk_kernel(t: pa.Table, group_keys: list[str], order_col: str, k: int,
                 descending: bool, tie_cols: list[str],
                 rank_name: str | None) -> pa.Table:
    """Vectorized per-group top-k over one table: one multi-key sort, then
    a run-length rank over the (now contiguous) groups — no Python loop,
    no per-group slicing."""
    import numpy as np

    if len(t) == 0:
        return t.append_column(rank_name, pa.array([], pa.int64())) \
            if rank_name else t
    sort_keys = [(g, "ascending") for g in group_keys]
    sort_keys.append((order_col, "descending" if descending else "ascending"))
    sort_keys += [(c, "ascending") for c in tie_cols]
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    n = len(t)
    # group-change flags via shifted whole-column compares (Arrow C++).
    # NULL keys form ONE group (SQL PARTITION BY semantics): two adjacent
    # nulls are NOT a change (not_equal -> null -> False); a null next to
    # a non-null IS (validity flip).
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for g in group_keys:
        c = t.column(g).combine_chunks()
        neq = pc.not_equal(c.slice(1), c.slice(0, n - 1))
        change[1:] |= np.asarray(neq.fill_null(False))
        if c.null_count:
            va = np.asarray(pc.is_valid(c))
            change[1:] |= va[1:] != va[:-1]
    run_start = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    rank = np.arange(n, dtype=np.int64) - run_start[run_id]
    keep = rank < k
    out = t.filter(pa.array(keep))
    if rank_name:
        out = out.append_column(rank_name, pa.array(rank[keep] + 1, pa.int64()))
    return out


def topk_per_group(ds, group_keys: list[str], order_col: str, k: int, *,
                   descending: bool = True, tie_cols: list[str] | None = None,
                   rank_name: str = "rn", n_buckets: int = 32,
                   batch_size: int = 65536):
    """Per-group top-k ROWS (the ``row_number() OVER (PARTITION BY ...)
    <= k`` window pattern) — Ray Data has no window functions, so this is
    custom-operator rule (a): map_batches partials + a bucketed final.

    Phase 1 bounds the shuffle: each batch keeps at most k rows per group
    it sees, so the exchange moves <= k x #groups x #batches rows no
    matter how large the input — a hot group ships k rows per batch, not
    its full membership. Phase 2 shuffles the survivors on a coarse hash
    bucket of the group key (each group lands intact in one bucket) and
    re-runs the same kernel once per bucket, now assigning the final rank.

    ``tie_cols`` must totally order rows within a group — with a
    non-deterministic tiebreak the phase-1 cut and the final rank are both
    unstable (same reason the SQL form needs them in its ORDER BY)."""
    ties = list(tie_cols or [])

    partial = ds.map_batches(
        lambda t: _topk_kernel(t, group_keys, order_col, k, descending, ties,
                               None),
        batch_format="pyarrow", batch_size=batch_size,
    )
    bucketed = partial.map_batches(
        lambda t: add_hash_bucket(t, group_keys, n_buckets),
        batch_format="pyarrow",
    )
    final = bucketed.groupby("__bucket").map_groups(
        lambda t: _topk_kernel(t.drop(["__bucket"]), group_keys, order_col, k,
                               descending, ties, rank_name),
        batch_format="pyarrow",
    )
    return final


def full_outer_join(left, right, *, on: str, right_on: str | None = None,
                    num_partitions: int | None = None,
                    approx_bytes: int | None = None,
                    single_task_bytes: int = 64 << 20):
    """Both-side-preserving equi-join (SQL FULL OUTER JOIN) — the audit
    shape for comparing two aggregates over partially overlapping key
    domains (e.g. orders-per-customer vs events-per-user: who buys but
    never clicks, who clicks but never buys).

    Ray's native hash-shuffle join when either side exceeds
    ``single_task_bytes``: a broadcast variant can't be map-only here
    because right-side UNMATCHED rows need cross-batch accounting. When
    BOTH sides fit under the gate (the common case for an
    aggregate-vs-aggregate audit: both inputs are keyspace-sized), the
    join runs as pyarrow's C++ full outer in ONE task over the whole left
    — one batch means right-unmatched accounting is complete, and the
    hash join's per-execution aggregator-actor startup (~1 s+) is never
    paid. Ray coalesces the key into the LEFT key column (a right-only
    row carries its key there), so output = left columns then right value
    columns on both paths. Empty sides short-circuit (Ray's hash join
    raises on them): empty right -> left + null right columns, empty
    left -> right keys moved into the left key column + null left
    columns."""
    import ray.data as rd

    rk = right_on or on
    lbase = base_schema(left)
    rbase = base_schema(right)
    if lbase is None or rbase is None:
        # One side is provably EMPTY with its types lost (zero blocks —
        # see base_schema), so that side's null columns can't be typed.
        # Row-correct best effort: empty right -> left unchanged; empty
        # left -> right with its key moved into the left key slot.
        if rbase is None and lbase is None:
            return left
        if rbase is None:
            return left
        return right.map_batches(
            lambda t: t.rename_columns(
                [on if n == rk else n for n in t.schema.names]),
            batch_format="pyarrow")
    value_fields = [rbase.field(n) for n in rbase.names if n != rk]
    out_schema = pa.schema(
        [lbase.field(n) for n in lbase.names] + value_fields)

    # right is always consumed fully (gate + empty guard); left is only
    # checkpointed when the right side is non-empty — the guard is
    # mandatory (Ray's hash join raises ArrowInvalid when one side is all
    # schema-less empty partitions; verified, a schema-carrying empty
    # block unioned in does NOT fix it), and the checkpoint lives in the
    # object store (spills at corpus scale, never driver memory).
    right = right.materialize()
    r_empty = right.count() == 0
    if not r_empty:
        left = left.materialize()
        l_empty = left.count() == 0
    else:
        l_empty = False

    def pad(t: pa.Table, fields: list, after: bool) -> pa.Table:
        cols = [pa.nulls(len(t), f.type) for f in fields]
        names = [f.name for f in fields]
        base_cols = [t.column(n) for n in t.schema.names]
        all_cols = base_cols + cols if after else cols + base_cols
        all_names = list(t.schema.names) + names if after \
            else names + list(t.schema.names)
        return pa.Table.from_arrays(all_cols, names=all_names) \
            .select(out_schema.names).cast(out_schema)

    if r_empty:
        # union one schema-carrying empty block: if left ALSO turns out
        # empty (never counted — left stays un-materialized here), the
        # result still exposes the output schema
        return left.map_batches(
            lambda t: pad(t, value_fields, after=True),
            batch_format="pyarrow").union(
                rd.from_arrow(out_schema.empty_table()))
    if l_empty:
        lfields = [lbase.field(n) for n in lbase.names if n != on]

        def lift(t: pa.Table) -> pa.Table:
            t = t.rename_columns(
                [on if n == rk else n for n in t.schema.names])
            return pad(t, lfields, after=False)

        return right.map_batches(lift, batch_format="pyarrow")

    if (left.size_bytes() <= single_task_bytes
            and right.size_bytes() <= single_task_bytes):
        small = pa.concat_tables(
            [b for b in ray.get(right.to_arrow_refs()) if len(b)]
        ).combine_chunks()
        small_ref = ray.put(small)

        def join_all(t: pa.Table) -> pa.Table:
            st = ray.get(small_ref)
            # pyarrow coalesces the key pair into the left key column
            j = t.join(st, keys=[on], right_keys=[rk],
                       join_type="full outer")
            return j.select(out_schema.names).cast(out_schema)

        return left.repartition(1).map_batches(
            join_all, batch_format="pyarrow", batch_size=None)

    out = hash_join(left, right, on=on, right_on=right_on,
                    join_type="full_outer", num_partitions=num_partitions,
                    approx_bytes=approx_bytes)

    # normalize: Ray's join can emit SCHEMA-LESS empty blocks
    def norm(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        return t.select(out_schema.names).cast(out_schema)

    return out.map_batches(norm, batch_format="pyarrow").union(
        rd.from_arrow(out_schema.empty_table()))


def rollup_agg(ds, keys: list[str], specs: list[tuple[str, str, str]],
               n_buckets: int | None = 64):
    """SQL ``GROUP BY ROLLUP(keys...)``: the finest level plus every key
    prefix down to the grand total, coarser levels carrying NULL in the
    rolled-up key columns.

    Scale shape: the corpus is scanned ONCE (the finest
    :func:`grouped_agg`); every coarser level re-aggregates the PREVIOUS
    level's keyspace-sized output (sum/count re-sum, min/max re-min/max)
    — a cascade of shrinking aggregates, never a second pass over the
    data. ``fn`` is limited to the re-aggregable set {sum, count, min,
    max} (mean is not decomposable post-hoc — ask for sum+count and
    derive it).

    CAVEAT (same as SQL ROLLUP without GROUPING()): a key column whose
    DATA contains genuine NULLs is indistinguishable from the rolled-up
    marker in the output — pre-fill data NULLs with a sentinel (the
    ``events_rollup`` query does) when the distinction matters."""
    import ray.data as rd

    for _, fn, _ in specs:
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(
                f"rollup_agg supports sum/count/min/max, got {fn!r}")

    finest = grouped_agg(ds, keys, specs, n_buckets=n_buckets).materialize()
    base = base_schema(finest)
    if base is None:  # input provably empty -> empty result (no
        # grand-total row: the agg types are unrecoverable here)
        return finest
    out_names = [out for _, _, out in specs]
    re_specs = [(out, "sum" if fn in ("sum", "count") else fn, out)
                for _, fn, out in specs]

    levels = [finest]
    cur = finest
    for k in range(len(keys) - 1, -1, -1):
        if k > 0:
            cur = grouped_agg(cur, keys[:k], re_specs,
                              n_buckets=n_buckets).materialize()
            lvl = cur
        else:
            # grand total: constant key, aggregate, drop it
            tot = grouped_agg(
                cur.map_batches(
                    lambda t: t.append_column(
                        "__all", pa.array([0] * len(t), pa.int8())),
                    batch_format="pyarrow"),
                ["__all"], re_specs, final="tree",
            ).map_batches(lambda t: t.drop(["__all"]),
                          batch_format="pyarrow")
            lvl = tot

        def fill(t: pa.Table, nk=k) -> pa.Table:
            for key in keys[nk:]:
                t = t.append_column(key, pa.nulls(len(t),
                                                  base.field(key).type))
            return t.select(base.names).cast(base)

        levels.append(lvl.map_batches(fill, batch_format="pyarrow"))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def weighted_sample(ds, group_keys: list[str], weight_col: str, k: int, *,
                    id_col: str, rank_name: str = "sample_rank",
                    n_buckets: int = 32, batch_size: int = 65536):
    """Deterministic weighted sampling WITHOUT replacement, ``k`` rows per
    group (Efraimidis-Spirakis A-Res, with the multiplicative-hash
    uniform of :func:`hash_sample` standing in for the RNG): each row
    gets key ``ln(u)/w`` where ``u = ((id * 2654435761) mod 2^32 + 0.5)
    / 2^32``; the k LARGEST keys win — inclusion probability rises with
    weight, membership is reproducible, partitioning-independent, and
    seedless. This is the data-mixing / importance-sampling primitive
    (sample sources proportional to quality score, cap each domain).

    The key ships as ``floor(key * 1e6)`` in an int64 column — integer
    output is hash-stable cross-engine, where a raw float key could
    diverge in the last ulp of ``ln``. Ties (same quantized key) break
    by ascending id. Built on :func:`topk_per_group`, so it inherits the
    bounded shuffle: a hot group forwards k rows per batch, never its
    membership. ``id_col`` must be non-negative int64 (< 2^32 for
    SQL-expressible arithmetic); weights must be strictly positive —
    rows with NULL/non-positive weight or NULL id are dropped."""
    import numpy as np

    def add_key(t: pa.Table) -> pa.Table:
        ids_a = t.column(id_col).combine_chunks()
        w_a = t.column(weight_col).combine_chunks()
        # negative ids are dropped too, not wrapped: a numpy uint64 cast
        # would wrap them while SQL's % keeps the sign — silently
        # diverging instead of erroring
        ok = pc.and_(pc.and_(ids_a.is_valid(),
                             pc.greater_equal(ids_a, 0)),
                     pc.and_(w_a.is_valid(),
                             pc.greater(w_a.cast(pa.float64()), 0.0)))
        t = t.filter(ok)
        if len(t) == 0:
            return t.append_column("__wkey", pa.array([], pa.int64()))
        ids = t.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
        w = t.column(weight_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        u = ((ids * np.uint64(_KNUTH32)) % np.uint64(1 << 32)
             ).astype(np.float64)
        u = (u + 0.5) / float(1 << 32)
        key = np.floor(np.log(u) / w * 1e6).astype(np.int64)
        return t.append_column("__wkey", pa.array(key, pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           batch_size=batch_size)
    out = topk_per_group(keyed, group_keys, "__wkey", k, descending=True,
                         tie_cols=[id_col], rank_name=rank_name,
                         n_buckets=n_buckets, batch_size=batch_size)
    return out.map_batches(
        lambda t: t.rename_columns(
            ["wkey" if n == "__wkey" else n for n in t.schema.names]),
        batch_format="pyarrow")


def grouping_sets_agg(ds, keys: list[str], specs: list[tuple[str, str, str]],
                      sets: list[list[str]], n_buckets: int | None = 64):
    """SQL ``GROUP BY GROUPING SETS``: the corpus is scanned ONCE (the
    full-key finest aggregate); every requested set re-aggregates that
    keyspace-sized output. Same re-aggregable ``fn`` set and NULL-marker
    caveat as :func:`rollup_agg` (which stays the cheaper cascade for
    pure prefix chains). Each set must be a subset of ``keys``; the
    finest set is computed regardless and emitted only if requested."""
    import ray.data as rd

    for _, fn, _ in specs:
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(
                f"grouping_sets_agg supports sum/count/min/max, got {fn!r}")
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} is not a subset of {keys}")

    finest = grouped_agg(ds, keys, specs, n_buckets=n_buckets).materialize()
    base = base_schema(finest)
    if base is None:  # input provably empty -> empty result (no
        # grand-total row: the agg types are unrecoverable here)
        return finest
    re_specs = [(out, "sum" if fn in ("sum", "count") else fn, out)
                for _, fn, out in specs]

    levels = []
    for s in sets:
        s = list(s)
        if set(s) == set(keys):
            lvl = finest
        elif s:
            lvl = grouped_agg(finest, s, re_specs, n_buckets=n_buckets)
        else:
            lvl = grouped_agg(
                finest.map_batches(
                    lambda t: t.append_column(
                        "__all", pa.array([0] * len(t), pa.int8())),
                    batch_format="pyarrow"),
                ["__all"], re_specs, final="tree",
            ).map_batches(lambda t: t.drop(["__all"]),
                          batch_format="pyarrow")

        def fill(t: pa.Table, present=tuple(s)) -> pa.Table:
            for key in keys:
                if key not in present:
                    t = t.append_column(
                        key, pa.nulls(len(t), base.field(key).type))
            return t.select(base.names).cast(base)

        levels.append(lvl.map_batches(fill, batch_format="pyarrow"))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def cube_agg(ds, keys: list[str], specs: list[tuple[str, str, str]],
             n_buckets: int | None = 64):
    """SQL ``GROUP BY CUBE(keys...)``: every subset of ``keys`` (2^k
    grouping sets — k is bounded to 6 as a sanity guard), one corpus
    scan."""
    if len(keys) > 6:
        raise ValueError(f"cube over {len(keys)} keys = {2**len(keys)} "
                         "grouping sets; use explicit grouping_sets_agg")
    import itertools

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in itertools.combinations(keys, r)]
    return grouping_sets_agg(ds, keys, specs, sets, n_buckets=n_buckets)


def profile_columns(ds, cols: list[str], *, batch_size: int = 65536):
    """Numeric column profiler (the data-quality report card every
    ingestion pipeline runs first): one row per column with ``(n, n_null,
    n_distinct, min_val, max_val, avg_val)``, avg rounded to the oracle
    grain.

    Scale shape: basics (count / nulls / sum / min / max) are
    tree-mergeable per-batch partials — one streaming pass, the final
    aggregate is #cols rows. The EXACT distinct count pays the inherent
    per-column value exchange: batch-local ``pc.unique`` first (so only
    each batch's distinct values leave the task), then one grouped
    distinct over ``(column, value)``, then a #cols-row count. At 100 TB
    swap the exact count for the HLL sketch (`ops.sketch.hll_distinct`)
    — same output schema, no value exchange. Returns a pyarrow Table
    (#cols rows).
    """
    import numpy as np

    src = ds.select_columns(cols).materialize()  # consumed by TWO passes

    def part(t: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "n_null": [], "s": [],
                "mn": [], "mx": []}
        for c in cols:
            col = t.column(c).cast(pa.float64())
            rows["column"].append(c)
            rows["n"].append(len(col))
            rows["n_null"].append(col.null_count)
            rows["s"].append(pc.sum(col).as_py() or 0.0)
            rows["mn"].append(pc.min(col).as_py())
            rows["mx"].append(pc.max(col).as_py())
        return pa.table(rows)

    basics = grouped_agg(
        src.map_batches(part, batch_format="pyarrow",
                        batch_size=batch_size),
        ["column"],
        [("n", "sum", "n"), ("n_null", "sum", "n_null"),
         ("s", "sum", "s"), ("mn", "min", "min_val"),
         ("mx", "max", "max_val")],
        final="tree").take_all()

    def uniq(t: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            u = pc.unique(t.column(c).cast(pa.float64()).combine_chunks()
                          .drop_null())
            parts.append(pa.table({"column": pa.array([c] * len(u)),
                                   "val": u}))
        return pa.concat_tables(parts)

    dist = grouped_agg(
        src.map_batches(uniq, batch_format="pyarrow",
                        batch_size=batch_size),
        ["column", "val"], [("val", "count", "k")])
    nd = grouped_agg(dist.select_columns(["column"]).map_batches(
        lambda t: t.append_column("one", pa.array(
            np.ones(len(t), dtype=np.int64))), batch_format="pyarrow"),
        ["column"], [("one", "sum", "n_distinct")], final="tree").take_all()

    ndmap = {r["column"]: r["n_distinct"] for r in nd}
    out = sorted(basics, key=lambda r: r["column"])

    def round_away(x: float, d: int = 4) -> float:
        # averages of integer-grained columns land EXACTLY on .00005
        # ties (e.g. avg(l_quantity) = 25.40225), where Python's
        # correctly-rounded round() and SQL's scaled half-away round
        # disagree; mirror the SQL semantics (round(x*10^d) away from
        # zero) so the profiler is hash-stable cross-engine.
        import math
        y = x * (10.0 ** d)
        return math.copysign(math.floor(abs(y) + 0.5), y) / (10.0 ** d)
    return pa.table({
        "column": [r["column"] for r in out],
        "n": pa.array([r["n"] for r in out], pa.int64()),
        "n_null": pa.array([r["n_null"] for r in out], pa.int64()),
        "n_distinct": pa.array([ndmap.get(r["column"], 0) for r in out],
                               pa.int64()),
        "min_val": pa.array([r["min_val"] for r in out], pa.float64()),
        "max_val": pa.array([r["max_val"] for r in out], pa.float64()),
        "avg_val": pa.array(
            [None if r["n"] == r["n_null"]
             else round_away(r["s"] / (r["n"] - r["n_null"]), 4)
             for r in out], pa.float64()),
    })


def pivot_wide(ds, *, key: str, pivot_col: str, value_col: str,
               categories: list[str]):
    """Conditional wide aggregation (SQL ``FILTER``/``PIVOT`` shape):
    -> one row per ``key`` with, for every category c,
    ``{c}_n`` (count of rows where ``pivot_col == c``) and ``{c}_sum``
    (sum of ``value_col`` over those rows; 0.0 when absent).

    The pivot happens INSIDE the per-batch partial — each batch emits
    indicator/masked-value columns, so the shuffle carries one
    pre-aggregated row per (batch, key) with 2*len(categories) numeric
    columns and the final is a plain grouped sum. Categories must be the
    (small, known) domain; an unexpected value simply lands in no
    column — the standard contract for a wide pivot.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    cols_n = [f"{c}_n" for c in categories]
    cols_s = [f"{c}_sum" for c in categories]

    def partial(t: pa.Table) -> pa.Table:
        pv = t.column(pivot_col)
        val = t.column(value_col).cast(pa.float64())
        arrays = [t.column(key)]
        names = [key]
        zero = pa.scalar(0.0)
        for c, cn, cs in zip(categories, cols_n, cols_s):
            mask = pc.equal(pv, c)
            arrays.append(mask.cast(pa.int64()))
            names.append(cn)
            arrays.append(pc.if_else(mask, val, zero))
            names.append(cs)
        return pa.Table.from_arrays(arrays, names=names)

    specs = []
    for cn, cs in zip(cols_n, cols_s):
        specs.append((cn, "sum", cn))
        specs.append((cs, "sum", cs))
    return grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       [key], specs)


def melt(ds, *, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """Unpivot / wide-to-long (SQL ``UNPIVOT`` shape): each input row
    emits one output row per entry of ``value_cols`` —
    ``(*id_cols, variable, value)``. Pure per-batch columnar reshape
    (one zero-copy select + constant column per value col, concatenated);
    no shuffle, output is len(value_cols) × input rows, streamed."""
    import pyarrow as pa

    def reshape(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            arrays = [t.column(i) for i in id_cols]
            arrays.append(pa.array([c] * len(t), pa.string()))
            arrays.append(t.column(c).cast(pa.float64()))
            parts.append(pa.Table.from_arrays(
                arrays, names=list(id_cols) + [var_name, value_name]))
        return pa.concat_tables(parts) if parts else pa.Table.from_arrays(
            [], names=[])

    return ds.map_batches(reshape, batch_format="pyarrow")


def grouped_string_agg(ds, *, key: str, val: str, order_cols: list[str],
                       sep: str = ",", out: str = "agg",
                       n_buckets: int = 64):
    """Ordered ``string_agg`` per group: -> (key, out, n) where ``out``
    joins each group's ``val`` strings by ``sep`` in ``order_cols``
    order (ties broken by ``val``) and ``n`` is the group size.

    Shape: coarse hash-bucket shuffle on ``key`` (each group lands whole
    in one bucket), then a fully vectorized in-bucket kernel — one Arrow
    sort, numpy boundary detection, a zero-copy ListArray over the
    sorted values, and ``pc.binary_join``. No per-group Python.
    Callers pre-aggregate rows per (key, val) upstream when the raw
    stream has duplicates — this op joins exactly the rows it is given.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    schema_out = pa.schema([(key, pa.string()), (out, pa.string()),
                            ("n", pa.int64())])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return schema_out.empty_table()
        sort_keys = [(key, "ascending")] + \
            [(c, "ascending") for c in order_cols] + [(val, "ascending")]
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        keys_s = t.column(key).combine_chunks().take(idx)
        vals_s = t.column(val).combine_chunks().take(idx)
        neq = pc.not_equal(keys_s.slice(1), keys_s.slice(0, len(keys_s) - 1))
        starts = np.r_[0, np.flatnonzero(
            neq.to_numpy(zero_copy_only=False)) + 1]
        offsets = np.r_[starts, len(keys_s)].astype(np.int32)
        flat = vals_s.combine_chunks() if isinstance(
            vals_s, pa.ChunkedArray) else vals_s
        lists = pa.ListArray.from_arrays(pa.array(offsets), flat)
        joined = pc.binary_join(lists, sep)
        return pa.Table.from_arrays(
            [keys_s.take(pa.array(starts)), joined,
             pa.array(np.diff(offsets).astype(np.int64))],
            schema=schema_out)

    bucketed = ds.map_batches(
        lambda t: add_hash_bucket(t, [key], n_buckets),
        batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        combine, batch_format="pyarrow")


def global_row_number(ds, keys: list[str], *, descending=False,
                      out_col: str = "rank"):
    """GLOBAL dense ordering: append ``out_col`` = the 1-based position
    of each row under ``ORDER BY keys`` across the WHOLE dataset — SQL
    ``row_number() OVER (ORDER BY ...)`` with no partition, the
    curriculum-ordering / global-leaderboard primitive Ray Data has no
    operator for.

    Contract: the composite ``keys`` must be UNIQUE per row (append a
    unique id as the last key — same requirement that makes the SQL
    form deterministic). ``descending`` is a bool or per-key list.

    Distributed shape (no driver materialization of rows): one
    range-partitioned ``Dataset.sort`` (the unavoidable exchange), then
    TWO block-grain map passes over the materialized sorted dataset
    with ``batch_size=None`` (one batch == one block): pass 1 emits
    each block's (first-key, row-count) — sorted blocks hold DISJOINT
    key ranges, and unique keys make the first key a unique block
    fingerprint; the driver orders those fingerprints (they sort
    exactly like the blocks) into a first-key -> starting-offset map,
    broadcasts it, and pass 2 stamps ``offset + arange`` per block.
    Driver state is O(blocks), never O(rows).
    """
    import ray
    import numpy as np
    import pyarrow as pa

    desc = ([descending] * len(keys) if isinstance(descending, bool)
            else list(descending))
    sorted_ds = ds.sort(keys, descending=desc).materialize()

    def fingerprint(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"__fp": pa.array([], pa.string()),
                             "__n": pa.array([], pa.int64())})
        fp = "\x1f".join(str(t.column(k)[0].as_py()) for k in keys)
        return pa.table({"__fp": pa.array([fp], pa.string()),
                         "__n": pa.array([len(t)], pa.int64())})

    # pass 1: block fingerprints; carry the first row's SORT KEYS so the
    # driver can order the fingerprints exactly like the blocks
    def fingerprint_keys(t: pa.Table) -> pa.Table:
        base = fingerprint(t)
        if len(base) == 0:
            return pa.table({**{k: pa.array([], t.schema.field(k).type)
                                for k in keys},
                             "__fp": base.column("__fp"),
                             "__n": base.column("__n")})
        cols = {k: t.column(k).slice(0, 1) for k in keys}
        cols["__fp"] = base.column("__fp")
        cols["__n"] = base.column("__n")
        return pa.table(cols)

    fps = pa.concat_tables([ray.get(r) for r in sorted_ds.map_batches(
        fingerprint_keys, batch_format="pyarrow", batch_size=None)
        .materialize().to_arrow_refs()])
    import pyarrow.compute as pc
    order = pc.sort_indices(fps, sort_keys=[
        (k, "descending" if d else "ascending")
        for k, d in zip(keys, desc)])
    fps = fps.take(order)
    counts = fps.column("__n").to_pylist()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    off_map = dict(zip(fps.column("__fp").to_pylist(),
                       (int(o) for o in offsets)))
    off_ref = ray.put(off_map)

    def stamp(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        om = ray.get(off_ref)
        fp = "\x1f".join(str(t.column(k)[0].as_py()) for k in keys)
        start = om[fp]
        return t.append_column(
            out_col, pa.array(start + 1 + np.arange(len(t)), pa.int64()))

    return sorted_ds.map_batches(stamp, batch_format="pyarrow",
                                 batch_size=None)
