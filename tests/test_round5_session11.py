"""Round-5 session-11 operators: TPC-H Q10 analog and friends added
this session, each checked against an in-test DuckDB oracle at
sf0.001 (the driver re-checks at sf0.01)."""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"


def _duck(sql: str, tables: list[str]):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


def test_tpch_q10_matches_duckdb(ray_session):
    import __ray_entry__ as e
    from easyner_ray.pipelines import queries as q

    got = q.tpch_q10_returned_items(SF).to_pandas()
    want = _duck(e.oracle_sql()["tpch_q10_returned_items"],
                 ["customer", "nation", "orders", "lineitem"])
    assert len(got) == len(want) <= 20
    got = got.sort_values(["revenue", "c_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    assert list(got["c_custkey"]) == list(want["c_custkey"])
    assert np.array_equal(got["revenue"].to_numpy(),
                          want["revenue"].to_numpy())
