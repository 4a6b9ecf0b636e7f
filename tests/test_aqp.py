"""isqrt kernel exactness + AQP estimator sanity."""

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_training_spark.extensions.aqp import (
    apx_event_share_ci,
    apx_sampled_revenue_ci,
    isqrt_steps,
)

EDGES = [
    0, 1, 2, 3, 4, 8, 15, 16, 17, 24, 25, 26, 99, 100, 101,
    (1 << 31) - 1, 1 << 31, (1 << 31) + 1,
    ((1 << 31) - 1) ** 2, ((1 << 31) - 1) ** 2 - 1,
    (1 << 62) - 1, (1 << 62) - 2,
]


def _duck_isqrt(vals: list[int]) -> dict[int, int]:
    con = duckdb.connect()
    rows = ", ".join(f"(CAST({v} AS BIGINT))" for v in vals)
    q = f"SELECT n FROM (VALUES {rows}) t(n)"
    for name, expr in isqrt_steps("n", "rt", " // "):
        q = f"SELECT *, {expr} AS {name} FROM ({q})"
    return dict(con.execute(f"SELECT n, rt FROM ({q})").fetchall())


def test_isqrt_kernel_edges_duckdb():
    got = _duck_isqrt(EDGES)
    for v in EDGES:
        assert got[v] == math.isqrt(v), (v, got[v])


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 62) - 1))
def test_isqrt_kernel_hypothesis_duckdb(n):
    assert _duck_isqrt([n])[n] == math.isqrt(n)


def test_isqrt_kernel_spark_matches(spark):
    rows = ", ".join(f"(CAST({v} AS BIGINT))" for v in EDGES)
    df = spark.sql(f"SELECT * FROM VALUES {rows} AS t(n)")
    for name, expr in isqrt_steps("n", "rt", " div "):
        df = df.selectExpr("*", f"{expr} AS {name}")
    got = {r.n: r.rt for r in df.select("n", "rt").collect()}
    for v in EDGES:
        assert got[v] == math.isqrt(v), (v, got[v])


def test_revenue_ci_internally_consistent(spark, sf_dir):
    rows = apx_sampled_revenue_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_sample < r.n_pop
        assert r.est_total > 0 and r.ci_half >= 0
        assert r.within_ci in (0, 1)
        assert r.within_ci == int(
            abs(r.est_total - r.true_total) <= r.ci_half
        )


def test_share_ci_sums_to_one(spark, sf_dir):
    rows = apx_event_share_ci(spark, sf_dir).collect()
    assert rows
    # floor-ppm shares undershoot by < 1 ppm per class
    assert sum(r.true_ppm for r in rows) == pytest.approx(
        1_000_000, abs=len(rows)
    )
    for r in rows:
        assert r.within_ci == int(
            abs(r.phat_ppm - r.true_ppm) <= r.ci_half_ppm
        )
