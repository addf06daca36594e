"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at sf=0.01 and diff it against ``oracle_sql()`` via
DuckDB (row count, column names, and order-insensitive value equality).

Usage:  python scripts/check_correctness.py [sf_dir] [query ...]

NOTE: only sf=0.01 is a valid comparison scale (the driver's contract).
The KG and derived-gold oracles read the synthetic corpus / gold parquet
under /tmp/easyner_synth/sf0.01 by fixed path — at any other sf_dir those
queries report spurious row-count mismatches (engine at sf_dir vs gold at
sf0.01); the plain relational oracles (registered-view SQL) remain valid
at any sf.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, mine: pd.DataFrame, ref: pd.DataFrame) -> list[str]:
    problems = []
    if len(mine) != len(ref):
        problems.append(f"row count {len(mine)} != {len(ref)}")
    if sorted(mine.columns) != sorted(ref.columns):
        problems.append(f"columns {sorted(mine.columns)} != {sorted(ref.columns)}")
        return problems
    a, b = canon(mine), canon(ref)
    if len(a) == len(b):
        for c in a.columns:
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
                ok = np.allclose(a[c].astype(float), b[c].astype(float), rtol=0, atol=1e-12, equal_nan=True)
                exact = (a[c].astype(float).values == b[c].astype(float).values).all()
                if not ok:
                    problems.append(f"float col {c} differs (max {np.abs(a[c].astype(float)-b[c].astype(float)).max()})")
                elif not exact:
                    problems.append(f"float col {c} NOT BIT-EXACT (hash would fail)")
            else:
                if not (a[c].values == b[c].values).all():
                    bad = (a[c].values != b[c].values).sum()
                    problems.append(f"col {c}: {bad} mismatching values")
        if not problems:
            # dtype drift that a schema check might catch
            for c in a.columns:
                if str(a[c].dtype) != str(b[c].dtype):
                    problems.append(f"dtype drift {c}: {a[c].dtype} vs {b[c].dtype}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({len(mine)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ref = con.execute(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = compare(name, mine, ref)
        if problems:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s): " + "; ".join(problems))
        else:
            print(f"PASS {name}: {len(mine)} rows ({time.time()-t0:.1f}s)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
