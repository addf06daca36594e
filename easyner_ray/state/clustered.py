"""Clustered (Z-ordered) Parquet sink with fragment statistics and a
stat-pruned reader — the write side of the data-skipping loop that
:mod:`easyner_ray.ops.layout` opens.

``write_clustered`` lays a dataset out as range partitions of the
Z-order key over the caller's hot filter columns, then records each
partition's per-column min/max (harvested from the Parquet footers the
write already produced — no extra scan) in the sink manifests.
``read_pruned`` consults those stats and enumerates ONLY the fragments
whose [min, max] intersects the predicate, then applies the exact
residual filter per batch — at 100 TB the read planning cost is
#partitions manifest reads, never a data scan.

Unlike :func:`easyner_ray.state.sink.write_partitioned` (hash
partitions, per-partition resume), a clustering write is a COMPACTION:
all-or-nothing by design. Partition ids come from quantile cuts of the
key, so they depend on the whole input — a partial resume against a
drifted input would assign rows to different partitions. Crash safety
is therefore the ``_SUCCESS`` marker alone: no marker, rewrite.

Layout:

    <root>/part=<p>/<files>.parquet     zkey range partitions
    <root>/_manifests/part-<p>.json     rows, files, per-column stats
    <root>/_manifests/_clustered.json   cols, bits, num_partitions, cuts
    <root>/_SUCCESS                     completion marker
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["write_clustered", "read_pruned", "fragment_stats"]


def _stat_value(v):
    """JSON-able stat value; timestamps become naive-UTC epoch micros."""
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return int(v.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


def _pred_value(v):
    return _stat_value(v)


def fragment_stats(path: str, cols: list[str]) -> dict[str, list]:
    """Per-column [min, max] of one Parquet file, from its row-group
    footer statistics (written by default; no data pages are read)."""
    meta = pq.ParquetFile(path).metadata
    idx = {meta.schema.column(i).name: i
           for i in range(len(meta.schema))}
    out: dict[str, list] = {}
    for c in cols:
        if c not in idx:
            continue
        mn = mx = None
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                mn = mx = None
                break
            lo, hi = _stat_value(st.min), _stat_value(st.max)
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        if mn is not None:
            out[c] = [mn, mx]
    return out


def write_clustered(ds, root: str, *, cols: list[str], bits: int = 16,
                    num_partitions: int = 32,
                    lineage: str | None = None) -> dict:
    """Write ``ds`` as ``num_partitions`` Z-order range partitions over
    ``cols`` (int / timestamp), manifests carrying per-column fragment
    stats. Returns a summary dict. The data keeps every input column
    plus ``zkey``; partition sizes are balanced by quantile cuts of the
    key (skew collapses duplicate cuts, never overflows a partition)."""
    from easyner_ray.ops.layout import (_interleave, _quantize,
                                        _to_int64, column_minmax_int)

    if os.path.isdir(root) and not os.path.exists(
            os.path.join(root, "_SUCCESS")):
        shutil.rmtree(root)  # crashed previous compaction: start over
    os.makedirs(root, exist_ok=True)

    mm = column_minmax_int(ds, cols)

    def add_zkey(t: pa.Table) -> pa.Table:
        qs = []
        for c in cols:
            # string columns cluster on their order-preserving 6-byte
            # prefix image (layout._to_int64); ints/timestamps directly
            x = _to_int64(t.column(c)).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            mn, mx = mm.get(c, (0, 0))
            qs.append(_quantize(x, mn, mx, bits))
        z = _interleave(qs, bits)
        return t.append_column("zkey", pa.array(z, pa.int64()))

    keyed = ds.map_batches(add_zkey, batch_format="pyarrow").materialize()

    # partition cuts only need BALANCE, not exactness (ids derive from
    # whatever cuts the manifest stores; pruning correctness never
    # depends on them) — one 2^16-bin histogram pass replaces the
    # 31-state exact-quantile refinement (measured 5.3 s -> ~0.4 s at
    # bench scale). Bin = zkey >> (key_bits - 16); cuts at the bin
    # upper edges where the cumulative count crosses i/n.
    key_bits = len(cols) * bits
    shift = max(0, key_bits - 16)

    def hist(t: pa.Table) -> pa.Table:
        z = t.column("zkey").combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(z >> shift, minlength=1)
        nz = np.nonzero(counts)[0]
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "cnt": pa.array(counts[nz], pa.int64())})

    agg = np.zeros(1 << min(key_bits, 16), dtype=np.int64)
    for r in keyed.map_batches(hist, batch_format="pyarrow").take_all():
        agg[r["bin"]] += r["cnt"]
    total = int(agg.sum())
    cum = np.cumsum(agg)
    cuts = np.array(sorted({
        float(((np.searchsorted(cum, total * i / num_partitions,
                                side="left") + 1) << shift) - 1)
        for i in range(1, num_partitions)}), dtype=np.float64)

    def add_part(t: pa.Table) -> pa.Table:
        z = t.column("zkey").combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        part = np.searchsorted(cuts, z, side="left").astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    keyed.map_batches(add_part, batch_format="pyarrow") \
        .write_parquet(root, partition_cols=["part"])

    mdir = os.path.join(root, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    manifests = {}
    stat_cols = list(cols) + ["zkey"]
    for name in sorted(os.listdir(root)):
        if not name.startswith("part="):
            continue
        part = int(name.split("=", 1)[1])
        pdir = os.path.join(root, name)
        files = sorted(f for f in os.listdir(pdir)
                       if f.endswith(".parquet"))
        entries, rows = [], 0
        for f in files:
            fp = os.path.join(pdir, f)
            n = pq.ParquetFile(fp).metadata.num_rows
            rows += n
            entries.append({"file": f, "rows": n,
                            "bytes": os.path.getsize(fp),
                            "stats": fragment_stats(fp, stat_cols)})
        manifest = {"part": part, "rows": rows, "files": entries,
                    "lineage": lineage}
        tmp = os.path.join(mdir, f".part-{part}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, sort_keys=True)
        os.replace(tmp, os.path.join(mdir, f"part-{part}.json"))
        manifests[part] = manifest

    cfg = {"cols": cols, "bits": bits, "num_partitions": num_partitions,
           "cuts": [float(c) for c in cuts],
           "minmax": {c: list(mm[c]) for c in mm}}
    with open(os.path.join(mdir, "_clustered.json"), "w") as fh:
        json.dump(cfg, fh, sort_keys=True)
    with open(os.path.join(root, "_SUCCESS"), "w") as fh:
        fh.write("")
    return {"root": root, "partitions": sorted(manifests),
            "rows_written": sum(m["rows"] for m in manifests.values())}


def read_pruned(root: str, ranges: dict[str, tuple], *,
                columns: list[str] | None = None):
    """Read back only the fragments whose stats intersect ``ranges``
    (``{col: (lo, hi)}``, inclusive; ``None`` bound = open), then apply
    the exact residual filter per batch. Returns ``(dataset, report)``
    with ``report = {"fragments_total", "fragments_read"}``.

    A fragment missing stats for a predicate column is conservatively
    READ (pruning must never drop rows). Timestamp predicates may be
    ``datetime`` values — compared in naive-UTC epoch micros, the stat
    storage convention."""
    import ray.data as rd

    mdir = os.path.join(root, "_manifests")
    norm = {c: (None if lo is None else _pred_value(lo),
                None if hi is None else _pred_value(hi))
            for c, (lo, hi) in ranges.items()}

    paths, total = [], 0
    for name in sorted(os.listdir(mdir)):
        if not name.startswith("part-") or not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as fh:
            manifest = json.load(fh)
        pdir = os.path.join(root, f"part={manifest['part']}")
        for e in manifest["files"]:
            total += 1
            keep = True
            for c, (lo, hi) in norm.items():
                st = e.get("stats", {}).get(c)
                if st is None:
                    continue  # no stats -> cannot prune
                mn, mx = st
                if (hi is not None and mn > hi) or \
                        (lo is not None and mx < lo):
                    keep = False
                    break
            if keep:
                paths.append(os.path.join(pdir, e["file"]))
    report = {"fragments_total": total, "fragments_read": len(paths)}
    if not paths:
        return None, report  # fully pruned: caller gets the report

    # metadata-free schema: pandas-written parquet metadata makes
    # pa.Schema unhashable in this build (same device as queries._rp)
    schema = pq.read_schema(paths[0]).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    ds = rd.read_parquet(paths, columns=columns, schema=schema)

    def residual(t: pa.Table) -> pa.Table:
        mask = None
        for c, (lo, hi) in ranges.items():
            if c not in t.schema.names:
                continue
            col = t.column(c)
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
                lo_v = None if lo is None else _pred_value(lo)
                hi_v = None if hi is None else _pred_value(hi)
            else:
                lo_v, hi_v = lo, hi
            for bound, op in ((lo_v, pc.greater_equal),
                              (hi_v, pc.less_equal)):
                if bound is None:
                    continue
                m = op(col, pa.scalar(bound))
                mask = m if mask is None else pc.and_(mask, m)
        return t if mask is None else t.filter(pc.fill_null(mask, False))

    return ds.map_batches(residual, batch_format="pyarrow"), report


def append_clustered(ds, root: str) -> dict:
    """Incremental ingest into an existing clustered sink — the
    "append now, re-optimize later" lifecycle: new rows get their zkey
    from the ORIGINAL statistics and land in the ORIGINAL cut layout
    (values outside the original min/max clamp to the edge buckets via
    the quantizer's clip), new files join the partition dirs, and the
    per-partition manifests extend with the new files' footer stats.
    Fragment stats stay exact, so pruning stays correct — edge
    partitions just grow wider ranges until the next
    :func:`write_clustered` compaction re-tightens the layout.

    Crash safety: files land first, manifests are replaced atomically
    after; a crash in between leaves unlisted files that the NEXT
    append (or compaction) sweeps via the shared unlisted-file sweep —
    manifest-driven readers never see a partial append."""
    from easyner_ray.ops.layout import (_interleave, _quantize, _to_int64)
    from easyner_ray.state.sink import _clean_unlisted

    mdir = os.path.join(root, "_manifests")
    with open(os.path.join(mdir, "_clustered.json")) as fh:
        cfg = json.load(fh)
    cols, bits = cfg["cols"], cfg["bits"]
    mm = {c: tuple(v) for c, v in cfg["minmax"].items()}
    cuts = np.array(cfg["cuts"], dtype=np.float64)

    _clean_unlisted(root)  # sweep any previous crashed append

    def add_keys(t: pa.Table) -> pa.Table:
        qs = []
        for c in cols:
            x = _to_int64(t.column(c)).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            mn, mx = mm.get(c, (0, 0))
            qs.append(_quantize(x, mn, mx, bits))
        z = _interleave(qs, bits)
        part = np.searchsorted(cuts, z.astype(np.float64),
                               side="left").astype(np.int32)
        return t.append_column("zkey", pa.array(z, pa.int64())) \
                .append_column("part", pa.array(part, pa.int32()))

    before = {}
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as fh:
                m = json.load(fh)
            before[m["part"]] = m

    ds.map_batches(add_keys, batch_format="pyarrow") \
        .write_parquet(root, partition_cols=["part"])

    stat_cols = list(cols) + ["zkey"]
    touched, appended = [], 0
    for name in sorted(os.listdir(root)):
        if not name.startswith("part="):
            continue
        part = int(name.split("=", 1)[1])
        pdir = os.path.join(root, name)
        manifest = before.get(part, {"part": part, "rows": 0,
                                     "files": [], "lineage": None})
        listed = {e["file"] for e in manifest["files"]}
        new_files = sorted(f for f in os.listdir(pdir)
                           if f.endswith(".parquet") and f not in listed)
        if not new_files:
            continue
        for f in new_files:
            fp = os.path.join(pdir, f)
            n = pq.ParquetFile(fp).metadata.num_rows
            appended += n
            manifest["files"].append(
                {"file": f, "rows": n, "bytes": os.path.getsize(fp),
                 "stats": fragment_stats(fp, stat_cols)})
        manifest["files"].sort(key=lambda e: e["file"])
        manifest["rows"] = sum(e["rows"] for e in manifest["files"])
        tmp = os.path.join(mdir, f".part-{part}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, sort_keys=True)
        os.replace(tmp, os.path.join(mdir, f"part-{part}.json"))
        touched.append(part)
    return {"rows_appended": appended, "partitions_touched": touched}
