"""Driver-faithful correctness simulation.

`tools/verify_oracle.py` runs on the tuned engine session
(`get_session`: UTC, AQE, RocksDB, NTZ-inference off, Python-source
pushdown on). The external driver does NOT use that session — it builds
a default-config SparkSession and calls the `__spark_entry__` contract.
This script reproduces those conditions exactly: default session,
`queries()` / `oracle_sql()` lookup, dtype-strict normalized compare.

Round-4 lesson: 5 queries were green under verify_oracle but red here
(TIMESTAMP_NTZ inference differences between the two sessions). Run
this over every never-certified query before a round ends.

Usage:
    python tools/driver_sim.py                 # first 50 of queries() (the driver slice)
    python tools/driver_sim.py q1 q2 ...       # specific names
    python tools/driver_sim.py --all-uncertified
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import importlib

import duckdb
import pandas as pd

from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    m = importlib.import_module("__spark_entry__")
    from conftest import dtype_mismatches, normalize

    from big_data_training_spark import TABLES

    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs, osql = m.queries(), m.oracle_sql()
    # A module that fails import PARTWAY still registers every query
    # decorated before the failure — so a name list can look right
    # while later queries are silently missing (round-5/6 trap: a
    # duplicate register() name aborts the module import after the
    # first query). Fail loudly instead.
    from big_data_training_spark import registry as _registry

    if _registry.import_errors:
        for mod, tb in _registry.import_errors.items():
            print(f"IMPORT ERROR in {mod}:\n{tb}")
        sys.exit(f"registry import errors: {sorted(_registry.import_errors)}")
    args = sys.argv[1:]
    if args == ["--all-uncertified"]:
        from big_data_training_spark import registry

        names = [n for n in qs if n not in registry._DRIVER_CERTIFIED]
    else:
        names = args or list(qs)[:50]

    bad = []
    for name in names:
        try:
            s = normalize(qs[name](spark, SF).toPandas())
            if name not in osql:
                print(f"rows-only {name}: {len(s)}")
                continue
            o = normalize(con.execute(osql[name]).fetchdf())
            assert len(s) == len(o), f"rows {len(s)} vs {len(o)}"
            assert list(s.columns) == list(o.columns), (
                f"cols {list(s.columns)} vs {list(o.columns)}"
            )
            mism = dtype_mismatches(s, o)
            assert not mism, f"dtype {mism}"
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            print(f"ok {name}")
        except Exception as e:
            bad.append(name)
            print(f"FAIL {name}: {str(e)[:300]}")
    print(f"\n{len(names) - len(bad)}/{len(names)} green; failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
