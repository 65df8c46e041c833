"""Local stand-in for the driver's correctness gate: run each queries()
entry in Spark and its oracle_sql() in DuckDB on the same sf dir; compare
row count, column names, and order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from shacl_dqa_prototype_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        print(f"ERROR: sf_dir {sf_dir!r} is not a directory\n"
              f"Usage: check_oracle.py [sf_dir] [query ...] "
              f"(space-separated names)")
        return 2
    only = set(sys.argv[2:])
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # a selection that matches NOTHING must be an error, not a vacuous
    # "ALL OK": misspelled names, flag-style args (--only x), or
    # comma-joined lists would otherwise skip every check and still
    # report success — checked BEFORE Spark starts so bad invocations
    # fail in seconds, not after a JVM spin-up
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}\n"
              f"Usage: check_oracle.py [sf_dir] [query ...] "
              f"(space-separated names)")
        return 2
    spark = get_spark("oracle-check", cores=os.environ.get("SPARK_GRAFT_CPUS", 8))

    con = duckdb.connect()
    for t in entrymod.TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        g, e_ = normalize(got), normalize(exp)
        if list(g.columns) != list(e_.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e_.columns)}")
        elif len(g) != len(e_):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(g)} vs {len(e_)}")
        elif not g.equals(e_):
            diff = (g != e_).any(axis=1)
            failures.append(name)
            print(f"FAIL  {name}: {int(diff.sum())} differing rows, e.g.\n"
                  f"  got {g[diff].head(3).to_dict('records')}\n"
                  f"  exp {e_[diff].head(3).to_dict('records')}")
        else:
            print(f"OK    {name}: {len(g)} rows match [{time.time()-t0:.1f}s]")

    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
