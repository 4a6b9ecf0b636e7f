from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_training_spark import TABLES, get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_session("tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style compare frame: columns sorted by name, rows by value."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def dtype_mismatches(s: pd.DataFrame, o: pd.DataFrame) -> list[str]:
    """Driver-faithful dtype check: the external driver hashes *typed*
    values, so a DuckDB HUGEINT (→ float64/object in pandas) against a
    Spark BIGINT (int64) diverges even when values are numerically equal.
    Kinds must match exactly and integer/float widths must match; the
    only tolerated asymmetry is null-promotion (int → float64/object),
    which is symmetric here because both sides compute the same nulls."""
    bad = []
    for c in s.columns:
        sk, ok = s[c].dtype.kind, o[c].dtype.kind
        if sk != ok or (
            sk in "iuf" and s[c].dtype.itemsize != o[c].dtype.itemsize
        ):
            bad.append(f"{c}: spark {s[c].dtype} vs oracle {o[c].dtype}")
    return bad


def assert_matches_oracle(spark_df, duck_con, oracle: str) -> None:
    s = normalize(spark_df.toPandas())
    o = normalize(duck_con.execute(oracle).fetchdf())
    assert len(s) == len(o), f"rowcount {len(s)} vs {len(o)}"
    assert list(s.columns) == list(o.columns)
    mism = dtype_mismatches(s, o)
    assert not mism, f"dtype mismatch (driver hashes typed values): {mism}"
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
