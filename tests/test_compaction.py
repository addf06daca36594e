"""Small-file compaction for the hash-partitioned sink: per-partition
parallel rewrite, atomic manifest replacement, orphan cleanup."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data as rd


def _make_sink(tmp_path, n_blocks=8):
    from easyner_ray.state.sink import write_partitioned

    root = str(tmp_path / "sink")
    t = pa.table({"doc_id": [f"d{i:04d}" for i in range(400)],
                  "v": list(range(400))})
    ds = rd.from_arrow(t).repartition(n_blocks)
    write_partitioned(ds, root, key_col="doc_id", num_partitions=4)
    return root


class TestCompaction:
    def test_compacts_multifile_partitions_row_parity(self, ray_session,
                                                      tmp_path):
        from easyner_ray.state.sink import (compact_partitions,
                                            read_partitioned,
                                            verify_manifests)

        root = _make_sink(tmp_path)
        before = sorted(r["doc_id"] for r in
                        read_partitioned(root).take_all())
        n_files_before = sum(
            1 for d in os.listdir(root) if d.startswith("part=")
            for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet"))
        assert n_files_before > 4  # multi-file partitions exist

        summary = compact_partitions(root)
        assert summary["files_after"] < summary["files_before"]
        assert summary["partitions_compacted"]
        assert verify_manifests(root)
        after = sorted(r["doc_id"] for r in
                       read_partitioned(root).take_all())
        assert after == before  # compaction never changes the rows

    def test_idempotent_and_orphan_cleanup(self, ray_session, tmp_path):
        from easyner_ray.state.sink import (compact_partitions,
                                            read_partitioned,
                                            verify_manifests)

        root = _make_sink(tmp_path)
        compact_partitions(root)
        # second run: nothing left to do
        again = compact_partitions(root)
        assert again["partitions_compacted"] == []
        assert again["files_before"] == again["files_after"]

        # simulate a crash that left an unlisted file behind
        pdir = os.path.join(root, "part=0")
        stray = os.path.join(pdir, "stray-leftover.parquet")
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"doc_id": ["zz"], "v": [1]}), stray)
        n = sorted(r["doc_id"] for r in read_partitioned(root).take_all())
        assert "zz" in n  # raw reader would see it...
        compact_partitions(root)  # ...but compaction sweeps it
        assert not os.path.exists(stray)
        assert verify_manifests(root)

    def test_resplits_oversized_partition(self, ray_session, tmp_path):
        from easyner_ray.state.sink import compact_partitions

        root = _make_sink(tmp_path)
        # tiny target: every partition needs multiple output files
        summary = compact_partitions(root, target_bytes=2048)
        for part in summary["partitions_compacted"]:
            with open(os.path.join(root, "_manifests",
                                   f"part-{part}.json")) as fh:
                m = json.load(fh)
            for e in m["files"]:
                assert e["bytes"] <= 4 * 2048  # loose per-file bound
