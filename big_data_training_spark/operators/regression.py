"""Trend estimation over event-time series: OLS and Theil–Sen slopes,
integer-exact.

The monitoring stack now has a smoother (ev_ewma_value) and detectors
(MAD, CUSUM); capacity planning additionally wants a TREND — "how fast
is daily revenue growing per event type". Two estimators, both closed
over integer arithmetic so the cross-engine hash compare is exact:

* **OLS** needs only the five sufficient statistics (n, Σx, Σy, Σxy,
  Σx²) — one map-side-combinable aggregate per key at any scale, the
  textbook distributed regression. slope = (nΣxy − ΣxΣy)/(nΣx² −
  (Σx)²) emitted in exact micro-units via one integer floor division.
* **Theil–Sen** (median of pairwise slopes) is the robust cousin the
  anomaly days can't drag around. Pairwise is quadratic in POINTS PER
  KEY, not in events: the series is first collapsed to O(days) rows
  per key, so the pair set is days²/2 ≈ 400 rows per key — bounded by
  the calendar, independent of event volume. Slopes are compared in
  micro-units (floor of the exact rational), median by row_number to
  stay engine-exact for even counts.

x is the day index (days since the series start), y is cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

_DAILY_SQL = """
        SELECT event_type,
               CAST(date_diff('day', TIMESTAMP '2024-01-01',
                              date_trunc('day', ts)) AS BIGINT) AS x,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS y
        FROM events GROUP BY 1, 2
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        "event_type",
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("x"),
    ).agg(
        F.expr("CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)")
        .alias("y")
    )


@register(
    "ev_trend_ols",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    stats AS (
        SELECT event_type,
               count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM daily GROUP BY 1
    )
    SELECT event_type, n,
           (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
               AS slope_microcents_per_day,
           (sy * sxx - sx * sxy) * 1000 // (n * sxx - sx * sx)
               AS intercept_millicents
    FROM stats
    ORDER BY event_type
    """,
    doc="distributed OLS trend per event type from the five sufficient"
    " statistics; slope in exact micro-cents/day",
)
def ev_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares daily-revenue trend per event type, computed the
    only way regression scales: ONE aggregate collecting (n, Σx, Σy,
    Σxy, Σx²) per key — partials combine map-side, nothing else
    shuffles — then the normal-equation ratios as exact integer floor
    divisions (micro-cent units). The sums stay far inside BIGINT:
    x ≤ days, y ≤ corpus cents, so nΣxy ≤ days²·cents. Adding a
    regressor means adding a sufficient statistic, not a pass."""
    return finish_ols(_daily(spark, sf_dir))


def finish_ols(daily: DataFrame) -> DataFrame:
    """Normal-equation finish over a (event_type, x, y) table — shared
    by the batch query and the streaming leg (st_trend_stream), whose
    additively-maintained day state must finish identically."""
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    return stats.selectExpr(
        "event_type",
        "n",
        "(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)"
        " AS slope_microcents_per_day",
        "(sy * sxx - sx * sxy) * 1000 div (n * sxx - sx * sx)"
        " AS intercept_millicents",
    ).orderBy("event_type")


@register(
    "ev_trend_theil_sen",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    slopes AS (
        SELECT a.event_type,
               (b.y - a.y) * 1000000 // (b.x - a.x) AS slope_micro
        FROM daily a
        JOIN daily b
          ON b.event_type = a.event_type AND b.x > a.x
    ), ranked AS (
        SELECT event_type, slope_micro,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope_micro) AS rn,
               count(*) OVER (PARTITION BY event_type) AS cnt
        FROM slopes
    )
    SELECT event_type,
           CAST(max(cnt) AS BIGINT) AS n_pairs,
           CAST(min(CASE WHEN rn = (cnt + 1) // 2
                         THEN slope_micro END) AS BIGINT)
               AS theil_sen_slope_micro
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Theil–Sen robust trend per event type: exact median of the"
    " O(days²) pairwise slopes in integer micro-units",
)
def ev_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The robust slope: median over all pairwise (y_j−y_i)/(x_j−x_i),
    immune to the anomaly days that steer OLS. The pair join runs on
    the DAILY table — the log is collapsed to O(|keys|·days) rows
    first, so "quadratic" means ~days²/2 ≈ 400 slopes per key
    forever, a constant. Slopes are floored to micro-units before
    ranking (exact integer division; ordering ties are then honest
    ties), and the median picks the lower-middle element by
    row_number so even-sized sets are engine-deterministic."""
    daily = _daily(spark, sf_dir)
    a = daily.select("event_type", F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = daily.select("event_type", F.col("x").alias("bx"), F.col("y").alias("by"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("bx") > F.col("ax"))
        .selectExpr(
            "event_type",
            "(by - ay) * 1000000 div (bx - ax) AS slope_micro",
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope_micro")
    ranked = slopes.select(
        "event_type",
        "slope_micro",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("cnt"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("cnt").cast("bigint").alias("n_pairs"),
            F.min(
                F.when(
                    F.col("rn") == F.expr("(cnt + 1) div 2"),
                    F.col("slope_micro"),
                )
            )
            .cast("bigint")
            .alias("theil_sen_slope_micro"),
        )
        .orderBy("event_type")
    )
