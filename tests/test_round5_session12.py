"""Round-5 session-12 operators: the remaining TPC-H analog family
(Q4/Q6/Q13/Q14/Q18/Q22 over the reduced schemas), each checked against
an in-test DuckDB oracle at sf0.001 (the driver re-checks at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _duck(sql: str, tables: list[str]) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in tables:
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


def _check(name: str, tables: list[str], ray_result) -> None:
    import __ray_entry__ as e

    got = _canon(ray_result.to_pandas())
    want = _canon(_duck(e.oracle_sql()[name], tables))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        if np.issubdtype(want[c].dtype, np.floating):
            assert np.allclose(got[c].astype(float), want[c].astype(float),
                               rtol=0, atol=1e-12, equal_nan=True), c
        else:
            assert list(got[c]) == list(want[c]), c


def test_tpch_q6(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.tpch_q6_forecast_revenue(SF)
    assert res.num_rows == 1
    _check("tpch_q6_forecast_revenue", ["lineitem"], res)


def test_tpch_q4(ray_session):
    from easyner_ray.pipelines import queries as q

    _check("tpch_q4_late_orders", ["orders", "lineitem"],
           q.tpch_q4_late_orders(SF))


def test_tpch_q13(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.tpch_q13_custdist(SF)
    df = res.to_pandas()
    # the histogram must account for every customer exactly once
    import duckdb

    n_cust = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/customer.parquet'").fetchone()[0]
    assert int(df["custdist"].sum()) == n_cust
    _check("tpch_q13_custdist", ["customer", "orders"], res)


def test_tpch_q14(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.tpch_q14_promo_revenue(SF)
    v = res.to_pandas()["promo_revenue"].iloc[0]
    assert 0.0 <= v <= 100.0
    _check("tpch_q14_promo_revenue", ["lineitem", "part"], res)


def test_tpch_q18(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.tpch_q18_large_orders(SF)
    df = res.to_pandas()
    assert (df["total_qty"] > 300).all()
    # deterministic cut: sorted by o_totalprice desc, o_orderkey asc
    assert list(df["o_totalprice"]) == sorted(df["o_totalprice"],
                                              reverse=True)
    _check("tpch_q18_large_orders", ["customer", "orders", "lineitem"],
           res)


def test_tpch_q22(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.tpch_q22_dormant_accounts(SF)
    assert res.to_pandas()["numcust"].min() >= 1
    _check("tpch_q22_dormant_accounts", ["customer", "orders"], res)


def test_events_user_pivot(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.events_user_pivot(SF)
    _check("events_user_pivot", ["events"], res)


def test_lineitem_melt(ray_session):
    from easyner_ray.pipelines import queries as q

    _check("lineitem_melt", ["lineitem"], q.lineitem_melt(SF))


def test_docs_epoch_shuffle(ray_session):
    from easyner_ray.pipelines import queries as q

    _check("docs_epoch_shuffle", ["documents"], q.docs_epoch_shuffle(SF))


def test_docs_split_no_leakage(ray_session):
    from easyner_ray.pipelines import queries as q

    res = q.docs_split_no_leakage(SF)
    _check("docs_split_no_leakage", ["documents"], res)
    # the guard property itself: identical texts share a split
    import duckdb

    df = res.to_pandas()
    docs = _duck("SELECT doc_id, text FROM documents", ["documents"])
    merged = df.merge(docs, on="doc_id")
    per_text = merged.groupby("text")["split"].nunique()
    assert (per_text == 1).all()
