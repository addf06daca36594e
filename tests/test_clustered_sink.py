"""Clustered (Z-ordered) sink + stat-pruned reader: write-side layout,
fragment min/max manifests harvested from Parquet footers, predicate
pruning that never drops rows, crash-safety via the _SUCCESS marker."""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

SRC = "/root/testdata/sf0.001/events.parquet"


def _utc_us(dt: datetime) -> int:
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)


def _write(tmp_path, **kw):
    from easyner_ray.state.clustered import write_clustered

    root = str(tmp_path / "clustered")
    ev = rd.read_parquet(SRC)
    summary = write_clustered(ev, root, cols=["user_id", "ts"],
                              num_partitions=8, **kw)
    return root, summary


class TestClusteredSink:
    def test_write_read_roundtrip_and_time_prune(self, ray_session,
                                                 tmp_path):
        from easyner_ray.state.clustered import read_pruned

        root, summary = _write(tmp_path)
        t = pq.read_table(SRC)
        assert summary["rows_written"] == t.num_rows

        t1, t2 = datetime(2024, 1, 10), datetime(2024, 1, 13)
        ds, rep = read_pruned(root, {"ts": (t1, t2)})
        tsus = t.column("ts").cast(pa.int64())
        want = t.filter(pc.and_(
            pc.greater_equal(tsus, _utc_us(t1)),
            pc.less_equal(tsus, _utc_us(t2)))).num_rows
        assert ds.count() == want
        assert 0 < rep["fragments_read"] < rep["fragments_total"]

    def test_user_prune_exact_and_event_ids_match(self, ray_session,
                                                  tmp_path):
        from easyner_ray.state.clustered import read_pruned

        root, _ = _write(tmp_path)
        t = pq.read_table(SRC)
        ds, rep = read_pruned(root, {"user_id": (0, 3)})
        got = sorted(r["event_id"] for r in ds.take_all())
        want = sorted(t.filter(pc.and_(
            pc.greater_equal(t.column("user_id"), 0),
            pc.less_equal(t.column("user_id"), 3)))
            .column("event_id").to_pylist())
        assert got == want  # pruning NEVER drops or duplicates rows
        assert rep["fragments_read"] < rep["fragments_total"]

    def test_fully_pruned_returns_report_only(self, ray_session,
                                              tmp_path):
        from easyner_ray.state.clustered import read_pruned

        root, _ = _write(tmp_path)
        ds, rep = read_pruned(root, {"user_id": (10_000, 20_000)})
        assert ds is None
        assert rep["fragments_read"] == 0

    def test_crashed_compaction_is_rewritten(self, ray_session,
                                             tmp_path):
        import os

        root, first = _write(tmp_path)
        os.remove(os.path.join(root, "_SUCCESS"))  # simulate crash
        root2, second = _write(tmp_path)
        assert root2 == root
        assert second["rows_written"] == first["rows_written"]
        from easyner_ray.state.clustered import read_pruned

        ds, rep = read_pruned(root, {})
        assert ds.count() == first["rows_written"]

    def test_open_bounds_and_column_projection(self, ray_session,
                                               tmp_path):
        from easyner_ray.state.clustered import read_pruned

        root, _ = _write(tmp_path)
        ds, _ = read_pruned(root, {"user_id": (5, None)},
                            columns=["event_id", "user_id"])
        rows = ds.take_all()
        assert rows and set(rows[0]) == {"event_id", "user_id"}
        assert all(r["user_id"] >= 5 for r in rows)


def test_events_pruned_window_query_matches_plain_filter(ray_session):
    """The driver-gated query built on the clustered sink: row parity
    with the unpruned SQL filter."""
    import duckdb

    import __ray_entry__ as e
    from easyner_ray.pipelines import queries as q

    got = q.events_pruned_window("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "'/root/testdata/sf0.001/events.parquet'")
    want = con.execute(e.oracle_sql()["events_pruned_window"]).df()
    assert list(got["event_id"]) == list(want["event_id"])
    assert (got["value"].values == want["value"].values).all()


class TestStringClustering:
    def test_prefix_image_order_preserving_and_sliced(self):
        import numpy as np

        from easyner_ray.ops.layout import _string_prefix_int

        words = ["", "a", "ab", "abc", "abcdef", "abcdefgh", "abd",
                 "b", "zeta", "zz", "doc_000001", "doc_999999"]
        t = pa.array(words)
        img = _string_prefix_int(t)
        # order-preserving on the 6-byte prefix
        order = np.argsort(np.array(words, dtype=object), kind="stable")
        pref = [w[:6] for w in words]
        for i in range(len(words)):
            for j in range(len(words)):
                if pref[i] < pref[j]:
                    assert img[i] < img[j], (words[i], words[j])
                elif pref[i] == pref[j]:
                    assert img[i] == img[j]
        # sliced array (nonzero offset) gives the same values
        sliced = _string_prefix_int(t.slice(3, 5))
        assert list(sliced) == list(img[3:8])

    def test_cluster_documents_by_string_id_and_prune(self, ray_session,
                                                      tmp_path):
        from easyner_ray.state.clustered import (read_pruned,
                                                 write_clustered)

        src = "/root/testdata/sf0.001/documents.parquet"
        root = str(tmp_path / "docs_clustered")
        ds = rd.read_parquet(src, columns=["doc_id", "source", "n_chars"])
        write_clustered(ds, root, cols=["doc_id"], num_partitions=8)

        t = pq.read_table(src)
        ids = sorted(t.column("doc_id").to_pylist())
        lo, hi = ids[len(ids) // 4], ids[len(ids) // 3]
        out, rep = read_pruned(root, {"doc_id": (lo, hi)})
        got = sorted(r["doc_id"] for r in out.take_all())
        want = [i for i in ids if lo <= i <= hi]
        assert got == want
        assert rep["fragments_read"] < rep["fragments_total"]


class TestClusteredEdges:
    def test_kg_edges_clustered_and_neighborhood_prune(self, ray_session,
                                                       tmp_path):
        import os

        from easyner_ray.pipelines.kg import (build_kg,
                                              read_edge_neighborhood,
                                              read_transcripts,
                                              write_clustered_edges)
        from easyner_ray.sources.synthetic import ensure_corpus

        corpus = ensure_corpus("sf0.001", 0.001, with_gold=False)
        res = build_kg(read_transcripts(
            os.path.join(corpus, "transcripts.parquet")))
        edges = res["edges"].materialize()
        out = str(tmp_path)
        s = write_clustered_edges(edges, out, num_partitions=8)
        assert s["rows_written"] == edges.count()

        subjects = sorted({r["subj"] for r in edges.take_all()})
        lo, hi = subjects[0], subjects[len(subjects) // 10]
        ds, rep = read_edge_neighborhood(out, lo, hi)
        got = sorted((r["subj"], r["obj"], r["pred"])
                     for r in ds.take_all())
        want = sorted((r["subj"], r["obj"], r["pred"])
                      for r in edges.take_all() if lo <= r["subj"] <= hi)
        assert got == want
        assert rep["fragments_read"] < rep["fragments_total"]


class TestClusteredSkew:
    def test_hot_key_corpus_keeps_partitions_bounded(self, ray_session,
                                                     tmp_path):
        """90% of rows share ONE user: the quantile cuts collapse around
        the hot key, but no partition exceeds the hot-key mass + budget
        (skew cannot overflow a single task beyond the irreducible
        duplicate-key run), and read parity holds."""
        import numpy as np

        from easyner_ray.state.clustered import (read_pruned,
                                                 write_clustered)

        rng = np.random.RandomState(11)
        n = 20_000
        hot = rng.rand(n) < 0.9
        users = np.where(hot, 7, rng.randint(0, 500, n)).astype(np.int64)
        ts = rng.randint(0, 10**9, n).astype(np.int64)
        t = pa.table({"rid": pa.array(np.arange(n), pa.int64()),
                      "user_id": pa.array(users, pa.int64()),
                      "ts": pa.array(ts, pa.int64())})
        root = str(tmp_path / "skewed")
        s = write_clustered(rd.from_arrow(t).repartition(8), root,
                            cols=["user_id", "ts"], num_partitions=16)
        assert s["rows_written"] == n

        # per-partition row counts from the manifests
        import json, os

        sizes = []
        for f in os.listdir(os.path.join(root, "_manifests")):
            if f.startswith("part-"):
                with open(os.path.join(root, "_manifests", f)) as fh:
                    sizes.append(json.load(fh)["rows"])
        # the hot 90% shares (user, many ts) -> z-keys still spread over
        # the ts lane, so cuts split the hot mass; no partition should
        # hold more than ~3x the even share
        assert max(sizes) <= 3 * (n // 16) + 1, sorted(sizes)

        ds, _ = read_pruned(root, {"user_id": (7, 7)})
        assert ds.count() == int(hot.sum()) + int(
            ((~hot) & (users == 7)).sum())


class TestAppendClustered:
    def test_append_then_prune_sees_both_generations(self, ray_session,
                                                     tmp_path):
        import numpy as np
        import pyarrow.compute as pc

        from easyner_ray.state.clustered import (append_clustered,
                                                 read_pruned,
                                                 write_clustered)

        rng = np.random.RandomState(5)
        base = pa.table({
            "rid": pa.array(np.arange(2000), pa.int64()),
            "user_id": pa.array(rng.randint(0, 100, 2000), pa.int64()),
            "ts": pa.array(rng.randint(0, 10**6, 2000), pa.int64())})
        root = str(tmp_path / "c")
        write_clustered(rd.from_arrow(base), root,
                        cols=["user_id", "ts"], num_partitions=8)

        # second generation: includes values OUTSIDE the original range
        extra = pa.table({
            "rid": pa.array(np.arange(2000, 2500), pa.int64()),
            "user_id": pa.array(rng.randint(0, 150, 500), pa.int64()),
            "ts": pa.array(rng.randint(0, 2 * 10**6, 500), pa.int64())})
        s = append_clustered(rd.from_arrow(extra), root)
        assert s["rows_appended"] == 500
        assert s["partitions_touched"]

        both = pa.concat_tables([base, extra])
        ds, rep = read_pruned(root, {"user_id": (10, 30)})
        got = sorted(r["rid"] for r in ds.take_all())
        want = sorted(both.filter(pc.and_(
            pc.greater_equal(both.column("user_id"), 10),
            pc.less_equal(both.column("user_id"), 30)))
            .column("rid").to_pylist())
        assert got == want
        # out-of-range appended rows are still findable (edge buckets)
        ds2, _ = read_pruned(root, {"user_id": (120, 150)})
        got2 = sorted(r["rid"] for r in ds2.take_all())
        want2 = sorted(both.filter(pc.greater_equal(
            both.column("user_id"), 120)).column("rid").to_pylist())
        assert got2 == want2

    def test_crashed_append_is_swept(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq
        import os

        from easyner_ray.state.clustered import (append_clustered,
                                                 read_pruned,
                                                 write_clustered)

        base = pa.table({
            "rid": pa.array(np.arange(100), pa.int64()),
            "x": pa.array(np.arange(100), pa.int64())})
        root = str(tmp_path / "c2")
        write_clustered(rd.from_arrow(base), root, cols=["x"],
                        num_partitions=4)
        # simulate a crashed append: a parquet file no manifest lists
        pdirs = [d for d in os.listdir(root) if d.startswith("part=")]
        stray = os.path.join(root, pdirs[0], "stray.parquet")
        pq.write_table(pa.table({"rid": pa.array([999], pa.int64()),
                                 "x": pa.array([1], pa.int64()),
                                 "zkey": pa.array([0], pa.int64())}),
                       stray)
        append_clustered(rd.from_arrow(pa.table({
            "rid": pa.array([100], pa.int64()),
            "x": pa.array([50], pa.int64())})), root)
        assert not os.path.exists(stray)  # swept, not adopted
        ds, _ = read_pruned(root, {})
        assert sorted(r["rid"] for r in ds.take_all()) == \
            list(range(101))
