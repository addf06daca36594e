"""Driver-contract registry integrity: queries() and oracle_sql() must
stay in bijection (every query oracle-checked, no orphan SQL), names
unique and stable, and no callable accidentally shadowed."""

from __future__ import annotations


def test_queries_and_oracles_in_bijection():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(q) == set(o), (set(q) ^ set(o))
    assert len(q) >= 295


def test_all_query_entries_are_callables_with_sf_dir_arg():
    import inspect

    import __ray_entry__ as e

    for name, fn in e.queries().items():
        assert callable(fn), name
        params = list(inspect.signature(fn).parameters)
        assert len(params) >= 1, name


def test_oracle_sql_strings_are_nonempty_and_select():
    import __ray_entry__ as e

    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
