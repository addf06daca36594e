"""Round-5 session-15: the final eight TPC-H analogs (Q2/Q8/Q9/Q11/
Q12/Q16/Q20/Q21 over the reduced schemas — the lineitem bridge stands
in for partsupp), each checked against an in-test DuckDB oracle at
sf0.001 (the driver re-checks at sf0.01). Completes the 22-query
family: Q1 ~ agg_lineitem_pricing, the rest have named analogs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]


def _duck(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _check(name: str, ray_result) -> None:
    import __ray_entry__ as e

    res = ray_result
    got = _canon(res.to_pandas() if not isinstance(res, pa.Table)
                 else res.to_pandas())
    want = _canon(_duck(e.oracle_sql()[name]))
    assert list(got.columns) == list(want.columns), (got.columns,
                                                     want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        if np.issubdtype(want[c].dtype, np.floating):
            assert np.allclose(got[c].astype(float), want[c].astype(float),
                               rtol=0, atol=1e-12, equal_nan=True), c
        else:
            assert list(got[c]) == list(want[c]), c


def test_tpch_q2(ray_session):
    from easyner_ray.pipelines import queries as q

    _check("tpch_q2_min_acctbal_supplier",
           q.tpch_q2_min_acctbal_supplier(SF))


def test_tpch_q8(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.tpch_q8_market_share(SF)
    df = res.to_pandas()
    # share is a true ratio computed from the two reported sums
    assert ((df["mkt_share"] >= 0) & (df["mkt_share"] <= 1)).all()
    _check("tpch_q8_market_share", res)


def test_tpch_q9(ray_session):
    from easyner_ray.pipelines import queries as q

    _check("tpch_q9_nation_profit", q.tpch_q9_nation_profit(SF))


def test_tpch_q11_degenerate_empty_is_typed(ray_session):
    # sf0.001 has no NATION_2 supplier -> both engines return 0 rows;
    # the engine must still carry the (l_partkey, value) schema.
    from easyner_ray.pipelines import queries as q

    res = q.tpch_q11_important_parts(SF)
    t = res if isinstance(res, pa.Table) else pa.concat_tables(
        [pa.table(b) for b in res.to_arrow_refs()])
    assert t.num_rows == 0
    assert t.schema.names == ["l_partkey", "value"]
    _check("tpch_q11_important_parts", res)


def test_tpch_q11_nonempty(ray_session, tmp_path):
    # rebind the supplier nations so NATION_2 is populated, then check
    # the above-average gate end-to-end against DuckDB on the fixture.
    import shutil

    import duckdb
    import pyarrow.parquet as pq

    from easyner_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    for t in ALL_TABLES:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    supp = pq.read_table(f"{SF}/supplier.parquet")
    n = supp.num_rows
    supp = supp.set_column(
        supp.schema.get_field_index("s_nationkey"), "s_nationkey",
        pa.array([2] * n, supp.schema.field("s_nationkey").type))
    pq.write_table(supp, d / "supplier.parquet")

    res = q.tpch_q11_important_parts(str(d))
    got = _canon(res.to_pandas())
    assert len(got) > 0

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    want = _canon(con.execute(
        e.oracle_sql()["tpch_q11_important_parts"]).df())
    assert len(got) == len(want)
    assert np.allclose(got["value"], want["value"], rtol=0, atol=1e-12)
    assert list(got["l_partkey"]) == list(want["l_partkey"])


def test_tpch_q12(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.tpch_q12_late_lines(SF)
    df = res.to_pandas()
    assert set(df["lag_class"]) <= {"LATE", "ONTIME"}
    _check("tpch_q12_late_lines", res)


def test_tpch_q16(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.tpch_q16_supplier_census(SF)
    df = res.to_pandas()
    assert (df["supplier_cnt"] >= 1).all()
    assert "Brand#5" not in set(df["p_brand"])
    assert "PROMO" not in set(df["p_type"])
    _check("tpch_q16_supplier_census", res)


def test_tpch_q20(ray_session):
    from easyner_ray.pipelines import queries as q

    _check("tpch_q20_dominant_suppliers",
           q.tpch_q20_dominant_suppliers(SF))


def test_tpch_q21(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.tpch_q21_waiting_suppliers(SF)
    df = res.to_pandas()
    assert (df["numwait"] >= 1).all()
    # sorted by count desc then name
    assert list(df["numwait"]) == sorted(df["numwait"], reverse=True)
    _check("tpch_q21_waiting_suppliers", res)


# --- layout family: Z-order keys + range partitioning -----------------------


class TestZorder:
    def test_interleave_matches_per_bit_reference(self):
        import numpy as np

        from easyner_ray.ops.layout import _interleave

        rng = np.random.RandomState(7)
        a = rng.randint(0, 1 << 16, 64).astype(np.int64)
        b = rng.randint(0, 1 << 16, 64).astype(np.int64)

        def ref(x, y):
            out = 0
            for i in range(16):
                out |= ((x >> i) & 1) << (2 * i)
                out |= ((y >> i) & 1) << (2 * i + 1)
            return out

        fast = _interleave([a, b], 16)            # magic-number path
        slow = _interleave([a, b, np.zeros(64, np.int64)], 16)
        want = np.array([ref(int(x), int(y)) for x, y in zip(a, b)])
        assert (fast == want).all()
        # 3-col loop path: col 2 all-zero -> its lanes are 0; stripping
        # them recovers nothing simple, so just check col-0/1 extraction
        for k in range(8):
            z3 = int(slow[k])
            x = sum((((z3 >> (3 * i)) & 1) << i) for i in range(16))
            assert x == int(a[k])

    def test_zorder_keys_and_constant_column(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from easyner_ray.ops.layout import zorder_keys

        t = pa.table({"id": [1, 2, 3, 4],
                      "x": [0, 5, 10, 10],
                      "y": [7, 7, 7, 7]})  # constant -> quantizes to 0
        out = {r["id"]: r["zkey"]
               for r in zorder_keys(rd.from_arrow(t), ["x", "y"],
                                    id_col="id").take_all()}
        # y contributes nothing; x spans [0,10] -> q = x*65535//10,
        # zkey = spread(q) (even bits only)
        def spread(v):
            out = 0
            for i in range(16):
                out |= ((v >> i) & 1) << (2 * i)
            return out

        for i, x in ((1, 0), (2, 5), (3, 10), (4, 10)):
            assert out[i] == spread(x * 65535 // 10), i

    def test_zorder_locality_beats_arrival_on_second_column(
            self, ray_session):
        # the sf0.01 audit: z-order buckets prune BOTH predicates;
        # arrival buckets prune only time
        from easyner_ray.pipelines import queries as q

        row = q.events_zorder_skip("/root/testdata/sf0.01").to_pylist()[0]
        assert row["z_user_skipped"] > 40 * row["linear_user_skipped"]
        assert row["z_time_skipped"] >= row["linear_time_skipped"] - 30

    def test_events_zorder_layout_oracle(self, ray_session):
        from easyner_ray.pipelines import queries as q

        import __ray_entry__ as e
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE VIEW events AS SELECT * FROM "
                    f"'{SF}/events.parquet'")
        want = con.execute(e.oracle_sql()["events_zorder_layout"]).df()
        got = q.events_zorder_layout(SF).to_pandas()
        assert list(got["zkey"]) == list(want["zkey"])


class TestRangePartition:
    def test_balanced_and_matches_duckdb(self, ray_session):
        import duckdb
        import numpy as np

        import __ray_entry__ as e
        from easyner_ray.pipelines import queries as q

        got = q.events_range_partition(SF).to_pandas()
        con = duckdb.connect()
        con.execute("CREATE VIEW events AS SELECT * FROM "
                    f"'{SF}/events.parquet'")
        want = con.execute(e.oracle_sql()["events_range_partition"]).df()
        assert list(got["part"]) == list(want["part"])
        # octiles of a continuous column -> near-equal partition sizes
        sizes = got.groupby("part").size()
        assert len(sizes) == 8
        assert sizes.max() - sizes.min() <= 2

    def test_skewed_constant_column_collapses_to_part_zero(
            self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from easyner_ray.ops.layout import range_partition_ids

        t = pa.table({"id": list(range(10)), "v": [3.5] * 10})
        out = range_partition_ids(rd.from_arrow(t), "v", 4,
                                  id_col="id").take_all()
        assert {r["part"] for r in out} == {0}


class TestConvLossMasks:
    def test_spans_partition_the_conversation_and_mask_follows_role(
            self, ray_session):
        from easyner_ray.pipelines import queries as q

        rows = q.conv_loss_masks("/root/testdata/sf0.001").take_all()
        by_conv = {}
        for r in rows:
            by_conv.setdefault(r["conv_id"], []).append(r)
        assert by_conv
        for conv, turns in list(by_conv.items())[:50]:
            turns.sort(key=lambda r: r["turn_idx"])
            pos = 0
            for r in turns:
                # spans tile the token stream with no gaps or overlaps
                assert r["tok_start"] == pos, (conv, r)
                assert r["tok_end"] == pos + r["n_tokens"]
                pos = r["tok_end"]
                assert r["train"] == (1 if r["role"] == "assistant"
                                      else 0)


class TestConvPackedSft:
    def test_packs_respect_budget_modulo_straddle(self, ray_session):
        from easyner_ray.pipelines import queries as q

        rows = q.conv_packed_sft("/root/testdata/sf0.001").take_all()
        assert rows
        packs = {}
        for r in rows:
            packs.setdefault((r["bucket"], r["pack_id"]), []).append(r)
        for (b, pid), members in packs.items():
            total = sum(r["n_tokens"] for r in members)
            # greedy rule: all but the final (straddling) conversation
            # fit inside the budget
            tail = max(r["n_tokens"] for r in members)
            assert total - tail < 2048, (b, pid, total)
            # pack ids contiguous from 0 per bucket is NOT required
            # (an over-budget conv skips ids) — but ids are nonneg
            assert pid >= 0


class TestRollingFrame:
    def test_rolling_mean_matches_pandas_and_null_frame(self,
                                                        ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from easyner_ray.ops.analytic import partitioned_analytics

        vals = [1.0, None, 3.0, 5.0, None, None, 7.0]
        t = pa.table({"g": ["a"] * 7, "o": list(range(7)),
                      "v": pa.array(vals, pa.float64())})
        rows = partitioned_analytics(
            rd.from_arrow(t), ["g"], ["o"],
            [("rolling_sum", "v:3", "rs"),
             ("rolling_mean", "v:3", "rm")]).take_all()
        rows.sort(key=lambda r: r["o"])
        s = pd.Series(vals, dtype=float)
        want_sum = s.rolling(3, min_periods=1).sum()
        want_mean = s.rolling(3, min_periods=1).mean()
        for i, r in enumerate(rows):
            ws = want_sum[i]
            wm = want_mean[i]
            assert (r["rs"] is None) == bool(pd.isna(ws)), i
            if r["rs"] is not None:
                assert r["rs"] == pytest.approx(ws, abs=1e-12)
                assert r["rm"] == pytest.approx(wm, abs=1e-12)

    def test_frame_respects_partition_boundary(self, ray_session):
        import ray.data as rd

        from easyner_ray.ops.analytic import partitioned_analytics

        t = pa.table({"g": ["a", "a", "b", "b"], "o": [0, 1, 0, 1],
                      "v": [10.0, 20.0, 100.0, 200.0]})
        rows = {(r["g"], r["o"]): r["rs"] for r in partitioned_analytics(
            rd.from_arrow(t), ["g"], ["o"],
            [("rolling_sum", "v:5", "rs")]).take_all()}
        assert rows[("b", 0)] == 100.0  # never sees group a
        assert rows[("b", 1)] == 300.0


def test_rolling_extrema_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from easyner_ray.ops.analytic import partitioned_analytics

    rng = np.random.RandomState(3)
    vals = list(rng.randn(40))
    vals[5] = vals[17] = None
    t = pa.table({"g": ["a"] * 25 + ["b"] * 15, "o": list(range(40)),
                  "v": pa.array(vals, pa.float64())})
    rows = partitioned_analytics(
        rd.from_arrow(t), ["g"], ["o"],
        [("rolling_min", "v:4", "mn"),
         ("rolling_max", "v:4", "mx")]).take_all()
    rows.sort(key=lambda r: (r["g"], r["o"]))
    for g, lo, hi in (("a", 0, 25), ("b", 25, 40)):
        s = pd.Series(vals[lo:hi], dtype=float)
        wmin = s.rolling(4, min_periods=1).min()
        wmax = s.rolling(4, min_periods=1).max()
        part = [r for r in rows if r["g"] == g]
        for i, r in enumerate(part):
            assert (r["mn"] is None) == bool(pd.isna(wmin[i]))
            if r["mn"] is not None:
                assert r["mn"] == wmin[i] and r["mx"] == wmax[i]


def test_first_last_value_kinds(ray_session):
    import ray.data as rd

    from easyner_ray.ops.analytic import partitioned_analytics

    t = pa.table({"g": ["a", "a", "a", "b"], "o": [0, 1, 2, 0],
                  "v": pa.array([None, 2.0, 3.0, 9.0], pa.float64())})
    rows = {(r["g"], r["o"]): (r["fv"], r["lv"])
            for r in partitioned_analytics(
                rd.from_arrow(t), ["g"], ["o"],
                [("first_value", "v", "fv"),
                 ("last_value", "v", "lv")]).take_all()}
    # RESPECT NULLS: group a's first value IS the NULL
    assert rows[("a", 0)] == (None, 3.0)
    assert rows[("a", 2)] == (None, 3.0)
    assert rows[("b", 0)] == (9.0, 9.0)


def test_rolling_std_kinds_match_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from easyner_ray.ops.analytic import partitioned_analytics

    rng = np.random.RandomState(9)
    vals = list(rng.randn(30) * 50 + 100)
    t = pa.table({"g": ["a"] * 30, "o": list(range(30)),
                  "v": pa.array(vals, pa.float64())})
    rows = partitioned_analytics(
        rd.from_arrow(t), ["g"], ["o"],
        [("rolling_std", "v:6", "rs"),
         ("rolling_std_exact", "v:6", "rse"),
         ("rolling_mean_exact", "v:6", "rme")]).take_all()
    rows.sort(key=lambda r: r["o"])
    s = pd.Series(vals)
    wstd = s.rolling(6, min_periods=2).std()
    wmean = s.rolling(6, min_periods=1).mean()
    for i, r in enumerate(rows):
        if i == 0:
            assert r["rs"] is None and r["rse"] is None
            continue
        assert r["rs"] == pytest.approx(wstd[i], abs=1e-9), i
        assert r["rse"] == pytest.approx(wstd[i], abs=1e-9), i
        assert r["rme"] == pytest.approx(wmean[i], abs=1e-9), i


def test_rolling_zscore_query_sentinel_and_values(ray_session):
    from easyner_ray.pipelines import queries as q

    df = q.events_rolling_zscore(SF).to_pandas()
    # frame heads (first event per user) carry the hash sentinel
    assert (df["roll_std"] == -999999.0).sum() > 0
    real = df[df["roll_std"] != -999999.0]
    assert (real["roll_std"] >= 0).all()


def test_near_pairs_window_and_order_invariants(ray_session):
    from easyner_ray.pipelines import queries as q

    rows = q.events_near_pairs(SF).take_all()
    assert rows
    for r in rows:
        assert 0 <= r["dt_us"] <= 3600 * 1_000_000
    # no duplicate ordered pairs
    pairs = [(r["event_id_a"], r["event_id_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))
