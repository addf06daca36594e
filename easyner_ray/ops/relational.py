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


def broadcast_lookup(small_table: pa.Table, key: str, value_cols: list[str]) -> dict:
    """dict key -> tuple(value_cols) from a driver-side small table."""
    keys = small_table.column(key).to_pylist()
    vals = list(zip(*(small_table.column(c).to_pylist() for c in value_cols)))
    return dict(zip(keys, vals))


class _BroadcastJoin:
    def __init__(self, lookup_ref, on: str, value_names: list[str], how: str):
        self.lookup = ray.get(lookup_ref) if isinstance(lookup_ref, ray.ObjectRef) else lookup_ref
        self.on = on
        self.value_names = value_names
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.on).to_pylist()
        hits = [self.lookup.get(k) for k in keys]
        if self.how == "inner":
            take = [i for i, h in enumerate(hits) if h is not None]
            batch = batch.take(pa.array(take, pa.int64()))
            hits = [hits[i] for i in take]
        cols = list(zip(*hits)) if hits else [[] for _ in self.value_names]
        for name, col in zip(self.value_names, cols):
            batch = batch.append_column(name, pa.array(list(col)))
        return batch


def broadcast_join(large_ds, small_table: pa.Table, *, on: str, right_key: str,
                   value_cols: list[str], how: str = "inner",
                   concurrency=(1, 8), batch_size: int = 8192):
    """Map-side hash join: ``large_ds`` joins ``small_table`` on
    large.on == small.right_key, appending ``value_cols``. The small side is
    shipped to the object store ONCE and shared by every actor."""
    lookup = broadcast_lookup(small_table, right_key, value_cols)
    lookup_ref = ray.put(lookup)
    return large_ds.map_batches(
        _BroadcastJoin,
        fn_constructor_kwargs={
            "lookup_ref": lookup_ref, "on": on, "value_names": value_cols, "how": how,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def semi_join_filter(large_ds, key_set, *, on: str, batch_size: int = 8192):
    """Keep rows whose ``on`` value is in ``key_set`` (broadcast set;
    vectorized ``is_in``)."""
    keys = pa.array(sorted(key_set))

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(on), value_set=keys))

    return large_ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


_AGG_FNS = {"sum": "sum", "min": "min", "max": "max", "count": "count", "mean": None}
_FINAL = {"sum": Sum, "min": Min, "max": Max}


def grouped_agg(ds, keys: list[str], specs: list[tuple[str, str, str]], batch_size: int = 65536):
    """Two-phase distributed aggregate.

    specs: (col, fn, out_name) with fn in {sum,min,max,count,mean}.
    Phase 1 (vectorized, per batch): pyarrow Table.group_by collapses the
    batch; mean becomes (sum, count) partials. Phase 2: Ray groupby over the
    collapsed stream combines partials and derives mean.
    """
    # (col, fn) -> output name; deduped so e.g. mean+sum of one column
    # computes the pyarrow partial only once.
    p_aggs: list[tuple[str, str]] = []
    outputs: list[tuple[str, str]] = []  # (pyarrow_name, rename) per output col
    finals = []
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
            derive_means.append((out, f"__{out}_s", f"__{out}_c"))
        elif fn == "count":
            outputs.append((_add(col, "count"), out))
            finals.append(Sum(out, alias_name=out))
        else:
            outputs.append((_add(col, fn), out))
            finals.append(_FINAL[fn](out, alias_name=out))

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate(p_aggs)
        cols = [g.column(k) for k in keys]
        names = list(keys)
        for pa_name, rename in outputs:
            cols.append(g.column(pa_name))
            names.append(rename)
        return pa.Table.from_arrays(cols, names=names)

    partial_ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
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
