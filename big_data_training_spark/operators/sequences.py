"""Gaps-and-islands sequence analysis over the event stream.

The classic SQL interview pattern is also a real product metric:
consecutive-day activity streaks drive retention features ("7-day
streak!") and cohort heuristics. The island trick — day_number minus
row_number is constant within a run of consecutive days — needs no
self-join and no iteration: two keyed windows and an aggregate.

Scale shape: dedup to (user, day) first (one shuffle, map-side
combined — the daily-activity table is orders of magnitude smaller
than the event log), then the window partitions by user (bounded rows
per key: days, not events), then a count-keyed histogram aggregate.
Nothing in the plan grows with event volume past the first dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

_SQL_STREAKS = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', day)
                   - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, grp, count(*) AS streak_len
        FROM isl GROUP BY 1, 2
    )
    SELECT CAST(streak_len AS BIGINT) AS streak_len,
           count(*) AS n_streaks,
           count(DISTINCT user_id) AS n_users
    FROM streaks GROUP BY 1
"""


@register(
    "ev_streak_islands",
    _SQL_STREAKS,
    doc="gaps-and-islands: consecutive-day activity streak histogram"
    " (streak length -> streak count, distinct users)",
)
def ev_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day streak histogram: distinct (user, activity day),
    then the island key day_number - row_number (constant exactly while
    days are consecutive), then streak lengths and their distribution.
    The row_number window is per-user over daily rows — behavior-bounded
    state, no global sort anywhere."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    isl = days.select(
        "user_id",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01"))
            - F.row_number().over(
                Window.partitionBy("user_id").orderBy("day")
            )
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count("*").alias("streak_len"))
    return streaks.groupBy(
        F.col("streak_len").cast("bigint").alias("streak_len")
    ).agg(
        F.count("*").alias("n_streaks"),
        F.countDistinct("user_id").alias("n_users"),
    )
