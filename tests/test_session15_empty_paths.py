"""Empty-input hardening for the session-15 additions: every new op
must return a typed empty result (or a well-defined summary), never a
schema-less crash — the all-rows-filtered case happens constantly in
real chains."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def _empty(schema_pairs):
    return rd.from_arrow(pa.schema(schema_pairs).empty_table())


class TestEmptyPaths:
    def test_zorder_and_range_partition_empty(self, ray_session):
        from easyner_ray.ops.layout import (range_partition_ids,
                                            zorder_keys)

        ds = _empty([("id", pa.int64()), ("x", pa.int64()),
                     ("y", pa.int64())])
        assert zorder_keys(ds, ["x", "y"], id_col="id").count() == 0
        ds2 = _empty([("id", pa.int64()), ("v", pa.float64())])
        assert range_partition_ids(ds2, "v", 4, id_col="id").count() == 0

    def test_clustered_write_empty(self, ray_session, tmp_path):
        import os

        from easyner_ray.state.clustered import (read_pruned,
                                                 write_clustered)

        ds = _empty([("id", pa.int64()), ("x", pa.int64())])
        root = str(tmp_path / "empty")
        s = write_clustered(ds, root, cols=["x"], num_partitions=4)
        assert s["rows_written"] == 0
        assert os.path.exists(os.path.join(root, "_SUCCESS"))
        out, rep = read_pruned(root, {"x": (0, 10)})
        assert out is None and rep["fragments_read"] == 0

    def test_rolling_and_first_last_empty(self, ray_session):
        from easyner_ray.ops.analytic import partitioned_analytics

        ds = _empty([("g", pa.string()), ("o", pa.int64()),
                     ("v", pa.float64())])
        out = partitioned_analytics(ds, ["g"], ["o"],
                                    [("rolling_mean", "v:3", "rm"),
                                     ("rolling_max", "v:3", "mx"),
                                     ("first_value", "v", "fv"),
                                     ("last_value", "v", "lv")])
        assert out.count() == 0

    def test_fingerprint_empty_and_empty_text(self, ray_session):
        from easyner_ray.ops.textstats import (fingerprint_batch,
                                               rolling_fingerprint)

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["", None]})
        out = fingerprint_batch(t)
        seed_fp = format(rolling_fingerprint([]), "016x")
        assert out.column("roll_fp").to_pylist() == [seed_fp, seed_fp]
        empty = fingerprint_batch(
            pa.schema([("doc_id", pa.int64()),
                       ("text", pa.string())]).empty_table())
        assert empty.num_rows == 0

    def test_compaction_on_empty_sink(self, ray_session, tmp_path):
        import os

        from easyner_ray.state.sink import compact_partitions

        root = str(tmp_path / "sink")
        os.makedirs(os.path.join(root, "_manifests"))
        s = compact_partitions(root)
        assert s == {"partitions_compacted": [], "files_before": 0,
                     "files_after": 0}
