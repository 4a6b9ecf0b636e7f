"""Event-log aggregations over the ``events`` topic fixture.

The events table is the Kafka-topic analog (FIXTURES.md): ``event_id`` =
offset, ``user_id`` = record key, ``ts`` = event time. Operators here
realize SURVEY.md §2.4 (A6-A11) and §2.6 batch window forms (W1/W2).

Scale notes: all are single-shuffle grouped aggregates with map-side
partial aggregation; time-bucketed groupings key the shuffle on
(bucket, type) so skew is bounded by the time-bucket width. Moving
averages use a bounded ROWS frame — state per key is O(frame), the same
local-state bound the reference describes (kafka/README.md:316-317).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from big_data_training_spark.registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "a6_count_per_type",
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    doc="A6: count per event type (kafka/README.md:316)",
)
def a6_count_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(type).count() — the canonical keyed count."""
    return _events(spark, sf_dir).groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "a5_stats_per_key",
    f"""
    SELECT user_id,
           count(*) AS n,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           {sql_davg('value', 'avg_value')}
    FROM events GROUP BY user_id
    """,
    doc="A5: per-key min/avg (kafka/stream-state.png) + extremes",
)
def a5_stats_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-per-partition + final merge — Spark's hash aggregate is
    exactly the reference's per-partition local-state topology."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            davg("value", "avg_value"),
        )
    )


@register(
    "a8_daily_extremes",
    """
    SELECT date_trunc('day', ts) AS day, event_type,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY 1, 2
    """,
    doc="A8: per-day min/max per key (kafka/README.md:326)",
)
def a8_daily_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily extremes — tumbling 1-day window expressed as date_trunc."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )


@register(
    "a11_hourly_counts",
    f"""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour_start, event_type,
           count(*) AS n, {sql_dsum('value', 'total_value')}
    FROM events GROUP BY 1, 2
    """,
    doc="A11/W2: count-per-hour-per-type via tumbling window",
    bench=True,
)
def a11_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (window() operator, epoch-aligned
    — matches DuckDB time_bucket)."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "w1_tumbling_6h_sum",
    f"""
    SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start, event_type,
           {sql_dsum('value', 'total_value')}, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
    doc="W1: tumbling event-time window + sum (flink/README.md:72-73)",
)
def w1_tumbling_6h_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour windowed keyed sum — the Flink word-count window
    shape at an analytics-friendly width."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(dsum("value", "total_value"), F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "total_value", "n"
        )
    )


@register(
    "a7_moving_average",
    """
    SELECT event_id,
           round(avg(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
    FROM events
    """,
    doc="A7: moving average over the stream (kafka/README.md:316,326)",
)
def a7_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS-frame moving average per key; deterministic ordering
    via (ts, event_id) tiebreak. Parallelism = key cardinality (the
    reference's per-symbol stream, kafka/README.md:326 — symbols scale
    out; the fixture's 5-type key is the floor, not the design)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    return _events(spark, sf_dir).select(
        "event_id", F.round(F.avg("value").over(w), 4).alias("mov_avg")
    )


@register(
    "a7_trailing_window_avg",
    """
    WITH framed AS (
        SELECT event_id,
               CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w * 1000000 AS BIGINT)
                   AS su,
               count(*) OVER w AS n_in_window
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id,
           floor((su + n_in_window * 50) / (n_in_window * 100)) / 10000.0
               AS trail_1h_avg,
           n_in_window
    FROM framed
    """,
    doc="A7 time-range form: trailing 1-hour RANGE window per key",
)
def a7_trailing_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving aggregate over a TIME range, not a row count — the frame
    is [t−1h, t] in integer microseconds, identical on both engines
    (ties in epoch_us share a frame, so no ordering tiebreak needed).
    The average rounds via the exact integer HALF_UP of
    functions/numeric.davg — windowed double avg() hits the same
    cross-engine half-boundary divergence the grouped form does."""
    events = _events(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    su = (F.sum(F.col("value").cast("decimal(38,6)")).over(w) * F.lit(1_000_000)).cast(
        "long"
    )
    n = F.count("*").over(w)
    return events.select(
        "event_id",
        (F.floor((su + n * 50) / (n * 100)) / F.lit(10_000)).alias("trail_1h_avg"),
        n.alias("n_in_window"),
    )


@register(
    "agg_stats_moments",
    """
    SELECT event_type,
           round(stddev_samp(value), 4) AS sd,
           round(var_samp(value), 4) AS var,
           round(corr(value, try_cast(json_extract_string(props, '$.k') AS INT)), 4)
               AS corr_vk
    FROM events GROUP BY event_type
    """,
    doc="statistical moments: stddev / variance / correlation per key",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates — single-pass co-moment accumulation,
    partial/final merge like any hash aggregate."""
    events = _events(spark, sf_dir)
    k = F.from_json("props", "k INT").getField("k")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 4).alias("sd"),
            F.round(F.var_samp("value"), 4).alias("var"),
            F.round(F.corr("value", F.col("k")), 4).alias("corr_vk"),
        )
    )


@register(
    "a10_k1_daily_top10",
    f"""
    SELECT date_trunc('day', ts) AS day, event_type,
           {sql_dsum('value', 'total_value')}
    FROM events GROUP BY 1, 2
    ORDER BY total_value DESC, day ASC, event_type ASC
    LIMIT 10
    """,
    doc="A10+K1: two-stage top-10 (kafka/stream-mutiple-process.png)",
)
def a10_k1_daily_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1: per-day-per-type totals (distributed agg). Stage 2: global
    top-10 — Spark plans TakeOrderedAndProject (per-partition top-k then
    merge on driver), the exact two-stage topology of the reference."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(dsum("value", "total_value"))
        .orderBy(F.desc("total_value"), F.asc("day"), F.asc("event_type"))
        .limit(10)
    )


@register(
    "a9_max_offset_per_partition",
    """
    SELECT user_id % 8 AS partition_id, max(event_id) AS max_offset,
           count(*) AS n
    FROM events GROUP BY 1
    """,
    doc="A9: committed offset = max per partition (kafka/README.md:172)",
)
def a9_max_offset_per_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max offset per (deterministic) partition of the keyed log."""
    return (
        _events(spark, sf_dir)
        .groupBy((F.col("user_id") % 8).alias("partition_id"))
        .agg(F.max("event_id").alias("max_offset"), F.count("*").alias("n"))
    )


@register(
    "s4_offset_range_scan",
    """
    SELECT event_id, ts, user_id, event_type
    FROM events WHERE event_id >= 1000 AND event_id < 2000
    """,
    doc="S4: seek/offset-range scan (kafka/README.md:198-200)",
)
def s4_offset_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-range scan: the predicate pushes into the Parquet scan
    (row-group min/max pruning = the reference's offset index,
    kafka/README.md:32-34)."""
    return (
        _events(spark, sf_dir)
        .filter((F.col("event_id") >= 1000) & (F.col("event_id") < 2000))
        .select("event_id", "ts", "user_id", "event_type")
    )


@register(
    "a_sliding_distinct_users",
    """
    WITH days AS (
        SELECT DISTINCT date_trunc('day', ts) AS day FROM events
    )
    SELECT d.day,
           count(DISTINCT e.user_id) AS n_users_3d
    FROM days d
    JOIN events e
      ON date_trunc('day', e.ts) BETWEEN d.day - INTERVAL 2 DAY AND d.day
    GROUP BY d.day
    """,
    doc="sliding-window distinct: 3-day rolling unique users per day",
)
def a_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct — the aggregate windowed sums can't express
    (distinct doesn't decompose over overlapping windows). Each event
    row is *exploded into exactly the window/stride = 3 target days* it
    contributes to, turning the range condition into an equi-join-free
    hash aggregation: one scan, 3x replication, an ordinary shuffle on
    (day). (A day-grid range join would plan BroadcastNestedLoopJoin —
    |days|x|events| predicate evaluations — measured and rejected.) The
    trailing semi-join keeps only days that actually occur in the data,
    matching the oracle's day list; the approximate path at scale is
    the mergeable HLL (sk_hll_*), whose registers union across any
    window."""
    events = load_table(spark, sf_dir, "events")
    ev_days = events.select(F.date_trunc("day", "ts").alias("ev_day"), "user_id")
    contrib = ev_days.select(
        F.explode(
            F.array(
                F.col("ev_day"),
                F.col("ev_day") + F.expr("INTERVAL 1 DAY"),
                F.col("ev_day") + F.expr("INTERVAL 2 DAY"),
            )
        ).alias("day"),
        "user_id",
    )
    real_days = ev_days.select(F.col("ev_day").alias("day")).distinct()
    return (
        contrib.join(F.broadcast(real_days), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n_users_3d"))
    )


@register(
    "agg_mode_per_key",
    """
    WITH counted AS (
        SELECT event_type, user_id, count(*) AS c
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT event_type, user_id, c,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c DESC, user_id ASC) AS rk
        FROM counted
    )
    SELECT event_type, user_id AS modal_user, c AS n_events
    FROM ranked WHERE rk = 1
    """,
    doc="deterministic mode: most frequent value per key, id tie-break",
)
def agg_mode_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mode aggregate (most frequent value per group) with a total
    tie-break (max count, then min value) so the answer is unique and
    engine-exact. Two-stage: per-(key,value) counts partial-aggregate
    map-side; the rank-1 window plans WindowGroupLimit, so the final
    shuffle carries one candidate per (key, partition), not the full
    count table."""
    events = load_table(spark, sf_dir, "events")
    counted = events.groupBy("event_type", "user_id").agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type").orderBy(F.desc("c"), F.asc("user_id"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("modal_user"),
            F.col("c").alias("n_events"),
        )
    )
