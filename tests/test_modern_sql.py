"""Modern Spark-4 SQL surface (operators/modern_sql.py).

The registered date-spine query ships the one-job
``explode(sequence(...))`` plan; the recursive-CTE form it replaced
(one micro-job per day of recursion depth — 25× slower for identical
output) stays exercised here as the Spark-4 feature proof.
"""

from __future__ import annotations

from big_data_training_spark.data import load_table
from big_data_training_spark.operators.modern_sql import cal_date_spine_gap_fill


def test_recursive_cte_spine_matches_sequence_plan(spark, sf_dir):
    """WITH RECURSIVE date spine (the Spark 4 feature) produces exactly
    the registered query's sequence-plan output — the proof that the
    plan swap was values-identical."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "msql_events_spine_t"
    )
    recursive = spark.sql(
        """
        WITH RECURSIVE b AS (
            SELECT min(date_trunc('day', ts)) AS d0,
                   max(date_trunc('day', ts)) AS d1
            FROM msql_events_spine_t
        ), spine AS (
            SELECT d0 AS day FROM b
            UNION ALL
            SELECT day + INTERVAL 1 DAY FROM spine, b WHERE day < d1
        ), daily AS (
            SELECT date_trunc('day', ts) AS day, count(*) AS n
            FROM msql_events_spine_t GROUP BY 1
        )
        SELECT s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
        FROM spine s LEFT JOIN daily d USING (day)
        """
    )
    got = {tuple(r) for r in recursive.collect()}
    want = {tuple(r) for r in cal_date_spine_gap_fill(spark, sf_dir).collect()}
    assert got == want and len(want) > 0


def test_spine_gap_days_are_zero_filled(spark, sf_dir):
    """The spine is dense: consecutive calendar days with no holes, and
    any day absent from the raw daily counts appears with n_events=0."""
    import datetime

    rows = sorted(
        (r.day, r.n_events)
        for r in cal_date_spine_gap_fill(spark, sf_dir).collect()
    )
    days = [d for d, _ in rows]
    for a, b in zip(days, days[1:]):
        assert b - a == datetime.timedelta(days=1), (a, b)
    daily_present = {
        r.day
        for r in load_table(spark, sf_dir, "events")
        .selectExpr("date_trunc('day', ts) AS day")
        .distinct()
        .collect()
    }
    for d, n in rows:
        if d not in daily_present:
            assert n == 0
