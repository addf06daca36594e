"""Resumable partitioned Parquet sink (north rule: per-partition lineage +
checkpoint markers; SURVEY.md §2.1 S8, §4 checkpoint/resume).

Layout:

    <root>/part=<p>/<files>.parquet      hash-partitioned data
    <root>/_manifests/part-<p>.json      per-partition manifest: row count,
                                         files+sizes, lineage blob
    <root>/_SUCCESS                      whole-sink completion marker

Resume contract: rerunning the same write against the same root first
prunes input rows whose partition already has a manifest (the moral
equivalent of the reference's batch-file range filters,
``ner_main.py:141-151``), recomputes only the missing partitions, then
refreshes manifests. Partition assignment is a deterministic content hash
(crc32 of the key column) so a row always lands in the same partition
regardless of cluster size or block layout — never one giant file, and any
partition can be re-audited in isolation.

Crash safety: a partition directory without a manifest holds PARTIAL
output from an interrupted run (``write_parquet`` appends uniquely-named
files, the manifest is the atomic commit marker). Such orphan ``*.parquet``
files are deleted before rewriting, so a resumed run can never double rows.
A sink-level manifest (``_manifests/_sink.json``) pins ``key_col`` and
``num_partitions``; resuming with different values is refused (a changed
partition count would silently drop rows through the prune filter).
"""

from __future__ import annotations

import json
import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq


def partition_of(key: str, num_partitions: int) -> int:
    return zlib.crc32(key.encode()) % num_partitions


def add_partition_column(ds, key_col: str, num_partitions: int):
    """Append the deterministic partition id. Hashing runs once per
    DISTINCT key via dictionary-encode + vectorized take (the checkpoint
    write puts corpus-sized streams through here; a Python crc32 per ROW
    was the write's CPU)."""

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np

        if len(batch) == 0:
            return batch.append_column(pa.field("part", pa.int32()),
                                       pa.array([], pa.int32()))
        enc = batch.column(key_col).combine_chunks().cast(pa.string()).dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        dict_parts = np.array(
            [partition_of(v, num_partitions) for v in enc.dictionary.to_pylist()],
            dtype=np.int32,
        )
        parts = pa.array(dict_parts[np.asarray(enc.indices)], pa.int32())
        return batch.append_column(pa.field("part", pa.int32()), parts)

    return ds.map_batches(assign, batch_format="pyarrow")


def completed_partitions(root: str) -> set[int]:
    mdir = os.path.join(root, "_manifests")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            done.add(int(name[len("part-") : -len(".json")]))
    return done


def _write_manifest(root: str, part: int, lineage: str | None) -> dict:
    pdir = os.path.join(root, f"part={part}")
    files = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    rows = 0
    entries = []
    for f in files:
        fp = os.path.join(pdir, f)
        meta = pq.ParquetFile(fp).metadata
        rows += meta.num_rows
        entries.append({"file": f, "rows": meta.num_rows, "bytes": os.path.getsize(fp)})
    manifest = {"part": part, "rows": rows, "files": entries, "lineage": lineage}
    mdir = os.path.join(root, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".part-{part}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.replace(tmp, os.path.join(mdir, f"part-{part}.json"))  # atomic publish
    return manifest


def _sink_manifest_path(root: str) -> str:
    return os.path.join(root, "_manifests", "_sink.json")


def _check_sink_config(root: str, key_col: str, num_partitions: int, resume: bool) -> None:
    """Pin (key_col, num_partitions) in a sink-level manifest; refuse a
    resume whose config drifted (the prune filter would drop rows)."""
    path = _sink_manifest_path(root)
    if os.path.exists(path):
        with open(path) as fh:
            cfg = json.load(fh)
        if resume and (cfg.get("key_col") != key_col
                       or cfg.get("num_partitions") != num_partitions):
            raise ValueError(
                f"sink config mismatch at {root}: existing "
                f"(key_col={cfg.get('key_col')}, num_partitions={cfg.get('num_partitions')}) "
                f"vs requested ({key_col}, {num_partitions}); "
                "resume requires identical partitioning"
            )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"key_col": key_col, "num_partitions": num_partitions}, fh)
    os.replace(tmp, path)


def _clean_orphan_partitions(root: str, done: set[int]) -> list[int]:
    """Delete parquet files in any part= dir lacking a manifest — partial
    output of a crashed run; the rerun rewrites those partitions fully."""
    cleaned = []
    for name in os.listdir(root):
        if not name.startswith("part="):
            continue
        part = int(name.split("=", 1)[1])
        if part in done:
            continue
        pdir = os.path.join(root, name)
        stale = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        for f in stale:
            os.remove(os.path.join(pdir, f))
        if stale:
            cleaned.append(part)
    return cleaned


def write_partitioned(
    ds,
    root: str,
    *,
    key_col: str,
    num_partitions: int = 32,
    lineage: str | None = None,
    resume: bool = True,
) -> dict:
    """Write ``ds`` hash-partitioned on ``key_col``; returns a summary dict.

    With ``resume=True``, partitions already holding a manifest are pruned
    from the INPUT (cheap vectorized filter) and left untouched on disk;
    unmanifested partition dirs (crash leftovers) are wiped and rewritten.
    """
    os.makedirs(root, exist_ok=True)
    _check_sink_config(root, key_col, num_partitions, resume)
    done = completed_partitions(root) if resume else set()
    if not resume:
        # fresh write: previous manifests are void (partitioning may differ)
        for p in completed_partitions(root):
            os.remove(os.path.join(root, "_manifests", f"part-{p}.json"))
    _clean_orphan_partitions(root, done)
    with_part = add_partition_column(ds, key_col, num_partitions)
    if done:
        done_arr = sorted(done)

        def prune(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.invert(pc.is_in(batch.column("part"), value_set=pa.array(done_arr, pa.int32())))
            return batch.filter(mask)

        with_part = with_part.map_batches(prune, batch_format="pyarrow")

    with_part.write_parquet(root, partition_cols=["part"])

    manifests = {}
    for name in os.listdir(root):
        if not name.startswith("part="):
            continue
        part = int(name.split("=", 1)[1])
        if part in done:
            continue
        manifests[part] = _write_manifest(root, part, lineage)

    with open(os.path.join(root, "_SUCCESS"), "w") as fh:
        fh.write("")
    total_rows = sum(m["rows"] for m in manifests.values())
    return {
        "root": root,
        "new_partitions": sorted(manifests),
        "resumed_partitions": sorted(done),
        "rows_written": total_rows,
    }


def read_partitioned(root: str, columns: list[str] | None = None):
    """Read a sink back as a Dataset. Parquet files are enumerated
    explicitly (``_manifests``/markers are skipped; Ray's read_parquet
    wants file paths, not hive directories, when given a list)."""
    import ray.data as rd

    paths = [
        os.path.join(root, d, f)
        for d in sorted(os.listdir(root))
        if d.startswith("part=")
        for f in sorted(os.listdir(os.path.join(root, d)))
        if f.endswith(".parquet")
    ]
    return rd.read_parquet(paths, columns=columns)


def verify_manifests(root: str) -> bool:
    """Audit: every manifest's file list and row counts match what is on
    disk. Returns True when consistent; raises with detail otherwise."""
    for part in sorted(completed_partitions(root)):
        with open(os.path.join(root, "_manifests", f"part-{part}.json")) as fh:
            manifest = json.load(fh)
        pdir = os.path.join(root, f"part={part}")
        files = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
        if files != [e["file"] for e in manifest["files"]]:
            raise ValueError(f"partition {part}: file list drift")
        for e in manifest["files"]:
            meta = pq.ParquetFile(os.path.join(pdir, e["file"])).metadata
            if meta.num_rows != e["rows"]:
                raise ValueError(f"partition {part}: row drift in {e['file']}")
    return True


def write_training_shards(ds, root: str, *, key: str = "doc_id",
                          n_shards: int = 32, resume: bool = True) -> dict:
    """Training-export sink: deterministic global shuffle
    (:func:`easyner_ray.ops.relational.export_shards`) cut into exactly
    ONE parquet file per shard, rows inside each file in ``sort_key``
    order — the layout a tokenizer/loader consumes sequentially.

    Each shard is sorted and written inside its own ``map_groups`` task
    (one shard ≈ one training file; pick ``n_shards`` so a shard fits a
    task — thousands of shards at 100 TB, exactly how real exports size
    files). The write is atomic per shard (tmp + ``os.replace``) and the
    file's existence is its completion marker, so a rerun after a crash
    re-shuffles but rewrites only missing shards; ``resume=False`` wipes
    first. Returns {root, new_shards, resumed_shards, rows_written}.
    """
    from easyner_ray.ops.relational import export_shards

    os.makedirs(root, exist_ok=True)
    name = lambda s: os.path.join(root, f"shard-{s:05d}.parquet")  # noqa: E731
    existing = {int(f.split("-")[1].split(".")[0])
                for f in os.listdir(root)
                if f.startswith("shard-") and f.endswith(".parquet")}
    if not resume:
        for s in existing:
            os.remove(name(s))
        existing = set()

    assigned = export_shards(ds, key, n_shards)
    if existing:
        done = pa.array(sorted(existing), pa.int64())

        def prune(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.invert(pc.is_in(t.column("shard"),
                                               value_set=done)))

        assigned = assigned.map_batches(prune, batch_format="pyarrow")

    def write_shard(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t.column("shard")[0].as_py()
        t = t.take(pc.sort_indices(t, sort_keys=[("sort_key", "ascending"),
                                                 (key, "ascending")]))
        tmp = name(s) + ".tmp"
        pq.write_table(t.drop(["shard"]), tmp)
        os.replace(tmp, name(s))
        return pa.table({"shard": pa.array([s], pa.int64()),
                         "rows": pa.array([len(t)], pa.int64())})

    summary = assigned.groupby("shard").map_groups(
        write_shard, batch_format="pyarrow").take_all()
    with open(os.path.join(root, "_SUCCESS"), "w") as fh:
        fh.write("")
    return {"root": root,
            "new_shards": sorted(r["shard"] for r in summary),
            "resumed_shards": sorted(existing),
            "rows_written": int(sum(r["rows"] for r in summary))}


def compact_partitions(root: str, *, target_bytes: int = 128 << 20,
                       min_files: int = 2) -> dict:
    """Small-file compaction for a :func:`write_partitioned` sink — the
    standard remedy for the many-small-files layout a streaming write
    accumulates (every block that touched a partition left its own
    file; at 100 TB that is metadata pressure on every subsequent read
    planner).

    Each partition holding >= ``min_files`` files is rewritten as
    ``ceil(total_bytes / target_bytes)`` files by its own Ray task —
    one partition == one independent task reading only its own files
    (hash partitioning bounds partition size by design), so compaction
    parallelism equals the partition count with zero shuffle. This is a
    legitimate raw-``@ray.remote`` site: the unit of work is a
    filesystem rewrite keyed by directory, not a row transform.

    Crash safety per partition: new files land under unique
    ``compact-*`` names, the manifest is REPLACED atomically
    (``os.replace``) to list only them, then old files are unlinked —
    a crash in between leaves unlisted orphans that the next call (or
    :func:`write_partitioned`'s orphan sweep) removes via
    ``_clean_unlisted``; readers that go through the manifest never see
    a partial state. Returns {partitions_compacted, files_before,
    files_after}.
    """
    import uuid

    import ray

    _clean_unlisted(root)

    @ray.remote
    def compact_one(pdir: str, files: list[str], n_out: int,
                    lineage: str | None):
        tbl = pa.concat_tables(
            [pq.read_table(os.path.join(pdir, f)) for f in files])
        out_names = []
        rows_per = -(-tbl.num_rows // n_out)
        for i in range(n_out):
            part_tbl = tbl.slice(i * rows_per, rows_per)
            if part_tbl.num_rows == 0:
                continue
            name = f"compact-{uuid.uuid4().hex}-{i}.parquet"
            tmp = os.path.join(pdir, "." + name + ".tmp")
            pq.write_table(part_tbl, tmp)
            os.replace(tmp, os.path.join(pdir, name))
            out_names.append(name)
        return out_names

    todo = []
    before = after = 0
    for part in sorted(completed_partitions(root)):
        mpath = os.path.join(root, "_manifests", f"part-{part}.json")
        with open(mpath) as fh:
            manifest = json.load(fh)
        files = [e["file"] for e in manifest["files"]]
        before += len(files)
        total = sum(e["bytes"] for e in manifest["files"])
        n_out = max(1, -(-total // target_bytes))
        if len(files) < max(min_files, n_out + 1):
            after += len(files)
            continue
        pdir = os.path.join(root, f"part={part}")
        todo.append((part, pdir, files, n_out, manifest.get("lineage")))

    results = ray.get([compact_one.remote(pdir, files, n_out, lin)
                       for _, pdir, files, n_out, lin in todo])
    compacted = []
    for (part, pdir, old_files, _n, lineage), new_names in zip(todo,
                                                               results):
        entries = []
        for f in sorted(new_names):
            fp = os.path.join(pdir, f)
            entries.append({"file": f,
                            "rows": pq.ParquetFile(fp).metadata.num_rows,
                            "bytes": os.path.getsize(fp)})
        manifest = {"part": part,
                    "rows": sum(e["rows"] for e in entries),
                    "files": entries, "lineage": lineage}
        mdir = os.path.join(root, "_manifests")
        tmp = os.path.join(mdir, f".part-{part}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, sort_keys=True)
        os.replace(tmp, os.path.join(mdir, f"part-{part}.json"))
        for f in old_files:
            os.remove(os.path.join(pdir, f))
        after += len(entries)
        compacted.append(part)
    return {"partitions_compacted": sorted(compacted),
            "files_before": before, "files_after": after}


def _clean_unlisted(root: str) -> int:
    """Remove parquet files a partition's manifest does not list —
    leftovers of a compaction that crashed between publishing the new
    manifest and unlinking the old files. (Distinct from
    :func:`_clean_orphan_partitions`, which wipes whole UNMANIFESTED
    partitions.)"""
    removed = 0
    for part in sorted(completed_partitions(root)):
        with open(os.path.join(root, "_manifests",
                               f"part-{part}.json")) as fh:
            listed = {e["file"] for e in json.load(fh)["files"]}
        pdir = os.path.join(root, f"part={part}")
        if not os.path.isdir(pdir):
            continue
        for f in os.listdir(pdir):
            if f.endswith(".parquet") and f not in listed:
                os.remove(os.path.join(pdir, f))
                removed += 1
    return removed
