"""Resumable partitioned sink: manifests, resume-after-partial-loss,
manifest audit."""

import os
import shutil

import pytest

import ray.data as rd

from easyner_ray.state.sink import (
    completed_partitions,
    read_partitioned,
    verify_manifests,
    write_partitioned,
)


def _demo_ds(n=500):
    return rd.range(n).map_batches(
        lambda b: {"key": [f"k{int(i)%37}" for i in b["id"]], "val": b["id"]},
        batch_format="numpy",
    )


def test_write_then_read_roundtrip(ray_session, tmp_path):
    root = str(tmp_path / "sink")
    summary = write_partitioned(_demo_ds(), root, key_col="key", num_partitions=8)
    assert summary["rows_written"] == 500
    assert os.path.exists(os.path.join(root, "_SUCCESS"))
    assert completed_partitions(root) == set(summary["new_partitions"])
    back = read_partitioned(root).to_pandas()
    assert len(back) == 500
    assert verify_manifests(root)


def test_resume_skips_completed_and_rebuilds_missing(ray_session, tmp_path):
    root = str(tmp_path / "sink")
    write_partitioned(_demo_ds(), root, key_col="key", num_partitions=8)
    victim = sorted(completed_partitions(root))[2]
    shutil.rmtree(os.path.join(root, f"part={victim}"))
    os.remove(os.path.join(root, "_manifests", f"part-{victim}.json"))

    summary = write_partitioned(_demo_ds(), root, key_col="key", num_partitions=8)
    assert summary["new_partitions"] == [victim]
    assert victim in completed_partitions(root)
    back = read_partitioned(root).to_pandas()
    assert len(back) == 500  # byte-stable row content: same rows as a clean run
    assert sorted(back["val"]) == list(range(500))
    assert verify_manifests(root)


def test_manifest_audit_detects_drift(ray_session, tmp_path):
    root = str(tmp_path / "sink")
    write_partitioned(_demo_ds(), root, key_col="key", num_partitions=4)
    part = sorted(completed_partitions(root))[0]
    pdir = os.path.join(root, f"part={part}")
    extra = os.path.join(pdir, "zzz_extra.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"key": ["x"], "val": [1]}), extra)
    with pytest.raises(ValueError, match="file list drift"):
        verify_manifests(root)


def test_resume_recomputes_only_lost_partition(ray_session, tmp_path):
    """Partial-failure drill: drop one partition's data+manifest, rerun the
    same write -> only that partition is recomputed, others untouched."""
    root = str(tmp_path / "sink_partial")
    write_partitioned(_demo_ds(), root, key_col="key", num_partitions=8)
    victim = os.path.join(root, "part=3")
    before_mtime = {
        p: os.path.getmtime(os.path.join(root, f"part={p}"))
        for p in range(8) if p != 3
    }
    shutil.rmtree(victim)
    os.remove(os.path.join(root, "_manifests", "part-3.json"))

    summary = write_partitioned(_demo_ds(), root, key_col="key", num_partitions=8)
    assert summary["new_partitions"] == [3]
    assert sorted(summary["resumed_partitions"]) == [0, 1, 2, 4, 5, 6, 7]
    assert verify_manifests(root)
    # resumed partitions' directories were not rewritten
    for p, mt in before_mtime.items():
        assert os.path.getmtime(os.path.join(root, f"part={p}")) == mt
    # full readback equals a fresh write elsewhere
    a = read_partitioned(root).to_pandas().sort_values(["key", "val"]).reset_index(drop=True)
    root2 = str(tmp_path / "sink_fresh")
    write_partitioned(_demo_ds(), root2, key_col="key", num_partitions=8)
    b = read_partitioned(root2).to_pandas().sort_values(["key", "val"]).reset_index(drop=True)
    assert a[["key", "val"]].equals(b[["key", "val"]])


def test_crash_resume_does_not_duplicate_rows(ray_session, tmp_path):
    """A partition interrupted BEFORE its manifest was written keeps stale
    parquet on disk; the rerun must wipe those orphans, not append."""
    root = str(tmp_path / "sink_crash")
    write_partitioned(_demo_ds(), root, key_col="key", num_partitions=8)
    # simulate a crash mid-partition-3: data present, manifest never written
    os.remove(os.path.join(root, "_manifests", "part-3.json"))

    summary = write_partitioned(_demo_ds(), root, key_col="key", num_partitions=8)
    assert summary["new_partitions"] == [3]
    back = read_partitioned(root).to_pandas()
    assert len(back) == 500  # no duplicated rows from the stale files
    assert sorted(back["val"]) == list(range(500))
    assert verify_manifests(root)


def test_resume_refuses_partitioning_drift(ray_session, tmp_path):
    root = str(tmp_path / "sink_drift")
    write_partitioned(_demo_ds(), root, key_col="key", num_partitions=8)
    with pytest.raises(ValueError, match="sink config mismatch"):
        write_partitioned(_demo_ds(), root, key_col="key", num_partitions=16)
    with pytest.raises(ValueError, match="sink config mismatch"):
        write_partitioned(_demo_ds(), root, key_col="val", num_partitions=8)
    # resume=False rewrites from scratch under the new config
    summary = write_partitioned(_demo_ds(), root, key_col="key",
                                num_partitions=16, resume=False)
    assert summary["rows_written"] == 500
