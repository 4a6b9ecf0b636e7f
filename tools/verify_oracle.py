"""Local stand-in for the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle on the
same parquet fixtures, then compares row count, column names, and an
order-insensitive value frame (columns sorted by name, rows sorted by
all values). Usage:

    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from conftest import dtype_mismatches  # shared dtype policy (tests/conftest.py)

from big_data_training_spark import TABLES, get_session
from big_data_training_spark.registry import all_queries


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session("verify_oracle")
    con = duck_connection(sf_dir)
    specs = all_queries()
    failures = []
    # A requested name that is not registered must be a FAILURE, not a
    # silent skip — a mid-import KeyError once unregistered a query and
    # the name filter turned it into a vacuous "all green".
    for missing in sorted(only - set(specs)):
        failures.append(missing)
        print(f"FAIL  {missing}: not in registry (import error?)")
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            continue
        s, o = normalize(sdf), normalize(odf)
        status = []
        if len(s) != len(o):
            status.append(f"rowcount {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            status.append(f"columns {list(s.columns)} vs {list(o.columns)}")
        if not status:
            # Driver-faithful: the external gate hashes *typed* values, so
            # dtype kind/width must match (HUGEINT-vs-BIGINT was invisible
            # under check_dtype=False and cost 3 red driver rows in r3).
            # Single source of truth for the policy: tests/conftest.py.
            mism = dtype_mismatches(s, o)
            if mism:
                status.append(f"dtype mismatch: {mism}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    s, o, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status.append(f"values differ: {str(e)[:400]}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: {len(s)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
