"""Plan-shape and semantics tests for the temporal joins (as-of, range)
and the multidimensional aggregation surface (rollup/cube/grouping
sets/pivot/percentiles/histogram).

Oracle parity for every registered query is covered by
tests/test_oracle_parity.py; this file asserts the *plans* scale (one
shuffle for the as-of join, broadcast for the range join, single
expand+aggregate for rollup/cube) and pins as-of semantics on an
adversarial micro-fixture (ties, missing keys, exact-boundary rows).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from big_data_training_spark.operators.multidim import (
    agg_cube_status_priority,
    agg_rollup_region_nation,
)
from big_data_training_spark.operators.temporal import (
    asof_join_last_before,
    j_asof_last_click,
    j_range_band_join,
)


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_single_shuffle(spark, sf_dir):
    """The union-window as-of join must shuffle exactly once (on the
    key): that single Exchange is what makes it viable at 100 TB, where
    the oracle's per-row LATERAL cannot run."""
    plan = physical_plan(j_asof_last_click(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_band_join_broadcasts(spark, sf_dir):
    """The band dimension must be broadcast (nested-loop over O(10)
    rows), never a shuffled or cartesian fact-side plan."""
    plan = physical_plan(j_range_band_join(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_rollup_cube_single_expand(spark, sf_dir):
    """ROLLUP/CUBE plan as one Expand + one partial/final aggregate —
    not one scan per grouping set."""
    for fn in (agg_rollup_region_nation, agg_cube_status_priority):
        plan = physical_plan(fn(spark, sf_dir))
        assert plan.count("Expand") == 1, plan
        # single aggregation pipeline: partial+final over the expand
        assert "HashAggregate" in plan or "SortAggregate" in plan


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_semantics_adversarial(spark):
    """Pin the backward as-of contract on hand-built edge cases:

    * tie at identical timestamp -> the left row matches (<=) and the
      largest order id wins among equal-time left rows;
    * right row earlier than every left row -> NULL match;
    * key with no left rows at all -> NULL match;
    * matches never cross keys."""
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T10:00:00"), 101),  # same ts: larger id wins
            (1, _ts("2024-01-01T12:00:00"), 102),
            (2, _ts("2024-01-01T09:00:00"), 200),
        ],
        "k BIGINT, t TIMESTAMP, lid BIGINT",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:59:59"), 900),  # before any left row
            (1, _ts("2024-01-01T10:00:00"), 901),  # exact tie -> 101
            (1, _ts("2024-01-01T11:00:00"), 902),  # between -> 101
            (1, _ts("2024-01-01T13:00:00"), 903),  # after all -> 102
            (2, _ts("2024-01-01T23:00:00"), 904),  # other key -> 200
            (3, _ts("2024-01-01T23:00:00"), 905),  # key with no left rows
        ],
        "k BIGINT, t TIMESTAMP, rid BIGINT",
    )
    out = asof_join_last_before(
        left,
        right,
        key="k",
        time="t",
        order="lid",
        payload={"lid": "match"},
        right_order="rid",
    )
    got = {r["rid"]: r["match"] for r in out.collect()}
    assert got == {900: None, 901: 101, 902: 101, 903: 102, 904: 200, 905: None}


def test_histogram_matches_range_join_totals(spark, sf_dir):
    """The arithmetic-band histogram and the broadcast range join are
    two plans for the same banding — their total row counts agree."""
    from big_data_training_spark.operators.multidim import agg_value_histogram

    hist_total = (
        agg_value_histogram(spark, sf_dir).agg(F.sum("n").alias("s")).collect()[0]["s"]
    )
    band_total = (
        j_range_band_join(spark, sf_dir).agg(F.sum("n").alias("s")).collect()[0]["s"]
    )
    assert hist_total == band_total


def test_pivot_row_sums_equal_daily_counts(spark, sf_dir):
    """Crosstab conservation: each pivot row sums to that day's event
    count."""
    from big_data_training_spark.operators.multidim import (
        EVENT_TYPES,
        pivot_daily_event_matrix,
    )
    from big_data_training_spark.data import load_table

    pv = pivot_daily_event_matrix(spark, sf_dir)
    total = sum(
        r["s"]
        for r in pv.select(
            sum([F.col(t) for t in EVENT_TYPES], F.lit(0)).alias("s")
        ).collect()
    )
    assert total == load_table(spark, sf_dir, "events").count()
