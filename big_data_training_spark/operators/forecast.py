"""Exponentially-weighted smoothing over event-time series,
integer-exact.

The monitoring layer over a stream (kafka/README.md:305-311 replayable
event streams; the per-key aggregation topologies of
kafka/stream-state.png) needs a smoothed baseline to compare today's
value against — the EWMA is the standard choice, and with α = 1/2 its
weights are powers of two, so a truncated EWMA is EXACT integer
arithmetic: no float accumulation, no cross-engine drift. This
complements the existing detectors (ev_anomaly_mad's robust z-score,
ev_cusum_changepoint's drift statistic) with the smoother both of
them are usually compared against.

Scale: one keyed window per series — the daily pre-aggregation
collapses the log to |keys|·|days| rows first, so the window (16
lags, unrolled) runs over tiny per-key frames regardless of event
volume. No UDFs; the lag unrolling is generated from one Python loop
into BOTH dialects, so the weights cannot desynchronize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

EWMA_SPAN = 16  # trailing days; weight of lag i is 2^(SPAN-1-i)


@register(
    "ev_dow_seasonal_adjust",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(date_part('isodow', ts) AS BIGINT) AS dow,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, day, dow, cents,
           CAST(sum(cents) OVER (PARTITION BY event_type, dow)
                * 1000000
                // count(*) OVER (PARTITION BY event_type, dow)
               AS BIGINT) AS dow_expected_micro,
           CAST(cents * 1000000
                - sum(cents) OVER (PARTITION BY event_type, dow)
                  * 1000000
                  // count(*) OVER (PARTITION BY event_type, dow)
               AS BIGINT) AS residual_micro
    FROM daily
    ORDER BY event_type, day
    """,
    doc="day-of-week seasonal adjustment: per (event_type, ISO dow)"
    " expected daily cents (integer micro-units) and the"
    " deseasonalized residual",
)
def ev_dow_seasonal_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove the weekly rhythm before alerting: a Saturday dip is not
    an incident if Saturdays always dip. Per (event_type, ISO
    day-of-week), the expected daily cents is the group mean in exact
    integer micro-units (sum·10^6 div count — no float averaging);
    the residual is what the detectors (MAD, CUSUM, EWMA residual)
    should consume instead of the raw series. No joins: both group
    statistics ride as window aggregates over the daily table
    (O(keys·days) rows after the one map-side-combinable shuffle), so
    the adjustment is free at any event volume."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.expr("CAST(date_part('DOW_ISO', ts) AS BIGINT)").alias("dow"),
    ).agg(
        F.expr("CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)")
        .alias("cents")
    )
    spec = "OVER (PARTITION BY event_type, dow)"
    return daily.selectExpr(
        "event_type",
        "day",
        "dow",
        "cents",
        f"CAST(sum(cents) {spec} * 1000000"
        f" div count(*) {spec} AS BIGINT) AS dow_expected_micro",
        f"CAST(cents * 1000000 - sum(cents) {spec} * 1000000"
        f" div count(*) {spec} AS BIGINT) AS residual_micro",
    ).orderBy("event_type", "day")


def _ewma_terms(col: str) -> tuple[str, str]:
    """(weighted_sum, weight_sum) SQL over the trailing EWMA_SPAN rows
    of an ordered per-key window — identical text in both dialects;
    the window clause is appended by the caller."""
    num, den = [], []
    for i in range(EWMA_SPAN):
        w = 1 << (EWMA_SPAN - 1 - i)
        lag = col if i == 0 else f"lag({col}, {i}) OVER win"
        num.append(f"coalesce({lag} * {w}, 0)")
        den.append(f"(CASE WHEN {lag} IS NOT NULL THEN {w} ELSE 0 END)")
    return " + ".join(num), " + ".join(den)


def _oracle() -> str:
    num, den = _ewma_terms("cents")
    return f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, cents,
           ({num}) // ({den}) AS ewma_cents,
           cents - ({num}) // ({den}) AS residual_cents
    FROM daily
    WINDOW win AS (PARTITION BY event_type ORDER BY day)
    ORDER BY event_type, day
    """


@register(
    "ev_ewma_value",
    _oracle(),
    doc=f"integer-exact EWMA (alpha=1/2, span {EWMA_SPAN}d) of daily"
    " value cents per event type, with the residual the anomaly"
    " detectors threshold on",
)
def ev_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed daily baseline per event type: EWMA with α = 1/2
    truncated at {span} days, computed as Σ x_{{t-i}}·2^({span}-1-i)
    div Σ 2^({span}-1-i) over the lags actually present — pure BIGINT,
    so Spark and DuckDB agree bit-for-bit (a float EWMA would drift by
    accumulation order). Two shuffles total at any scale: the daily
    pre-aggregation (map-side combinable) and the per-key window sort
    over |keys|·|days| rows. The residual column is the input the
    alerting layer (MAD, CUSUM) consumes."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.expr("CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)")
        .alias("cents")
    )
    return finish_ewma(daily)


def finish_ewma(daily: DataFrame) -> DataFrame:
    """EWMA + residual over a (event_type, day, cents) table — shared
    by the batch query and the streaming leg (st_ewma_stream), whose
    additively-maintained day state must finish identically."""
    num, den = _ewma_terms("cents")
    spec = "OVER (PARTITION BY event_type ORDER BY day)"
    num, den = num.replace("OVER win", spec), den.replace("OVER win", spec)
    return (
        daily.selectExpr(
            "event_type",
            "day",
            "cents",
            f"({num}) div ({den}) AS ewma_cents",
            f"cents - ({num}) div ({den}) AS residual_cents",
        )
        .orderBy("event_type", "day")
    )
