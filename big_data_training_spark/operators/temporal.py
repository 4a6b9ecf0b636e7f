"""Temporal joins the reference's stream model implies but Spark lacks
as built-ins: as-of (attribution) joins and range/band joins, plus an
out-of-orderness audit (the lateness measurement behind watermarking,
flink/README.md event-time sections; kafka/README.md:9-10 log order).

Scale design
------------
The as-of join is the *union-window* formulation: tag both sides, union
on (key, time), and resolve "latest left row at-or-before each right
row" with one `last(..., ignorenulls)` running window. That is a single
shuffle on the join key — no range-explode, no per-row subquery, no
skew beyond the key distribution itself — and is the plan that survives
100 TB (a sort-merge per key, streamed). The DuckDB oracle states the
same semantics declaratively with a LEFT JOIN LATERAL ... LIMIT 1.

The range join broadcasts the band table (bands are O(10²) rows at any
scale) so Spark plans a BroadcastNestedLoopJoin: linear in the fact
side, zero shuffle. Uniform-width bands can instead be rewritten as an
arithmetic band key (see ``agg_value_histogram`` in multidim.py) —
that's the preferred rewrite when band edges allow it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.numeric import dsum, sql_dsum
from big_data_training_spark.registry import register


def asof_join_last_before(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time: str,
    order: str,
    payload: dict[str, str],
    right_order: str | None = None,
) -> DataFrame:
    """Generic backward as-of join: for every ``right`` row, the latest
    ``left`` row with the same ``key`` and ``left.time <= right.time``
    (ties on ``time`` broken by largest left ``order``).

    Both inputs are unioned with a side marker and resolved by one
    running ``last(..., ignorenulls)`` window per key — a single
    shuffle, the scalable formulation. ``payload`` maps left column →
    output alias for the carried as-of columns. ``right_order`` is the
    right side's own deterministic order column (defaults to ``order``
    when both sides share the name).
    """
    right_order = right_order or order
    l_cols = [F.col(c).alias(a) for c, a in payload.items()]
    lhs = left.select(
        F.col(key).alias("__k"),
        F.col(time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(order).alias("__o"),
        *l_cols,
        *[F.lit(None).alias(f"__r_{c}") for c in right.columns],
    )
    rhs = right.select(
        F.col(key).alias("__k"),
        F.col(time).alias("__t"),
        F.lit(1).alias("__side"),
        F.col(right_order).alias("__o"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(a) for c, a in payload.items()],
        *[F.col(c).alias(f"__r_{c}") for c in right.columns],
    )
    # Left rows sort before right rows at an equal timestamp, so a left
    # row at exactly t matches (<= semantics); among equal-(t, side)
    # left rows the largest `order` wins — mirrored by the oracle's
    # ORDER BY t DESC, order DESC LIMIT 1.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(a, ignorenulls=True).over(w).alias(f"__asof_{a}")
            for a in payload.values()
        ],
    )
    out = resolved.filter(F.col("__side") == 1).select(
        *[F.col(f"__r_{c}").alias(c) for c in right.columns],
        *[F.col(f"__asof_{a}").alias(a) for a in payload.values()],
    )
    return out


def _purchases_clicks(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return clicks, purchases


def _asof_output(joined: DataFrame) -> DataFrame:
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        "last_click_id",
        "last_click_ts",
    )


_ASOF_ORACLE_LATERAL = """
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           p.value AS purchase_value,
           m.event_id AS last_click_id, m.ts AS last_click_ts
    FROM events p LEFT JOIN LATERAL (
        SELECT c.event_id, c.ts FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts {extra}
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
    ) m ON TRUE
    WHERE p.event_type = 'purchase'
"""


@register(
    "j_asof_last_click",
    _ASOF_ORACLE_LATERAL.format(extra=""),
    doc="As-of join: latest click at-or-before each purchase, per user"
    " (backward attribution; union-window single-shuffle formulation)",
    bench=True,
)
def j_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (last-click attribution). One shuffle on
    user_id; the oracle is a per-row LATERAL — quadratic, exactly the
    plan you can't run at 100 TB, which is why the union-window form
    exists."""
    clicks, purchases = _purchases_clicks(spark, sf_dir)
    return _asof_output(
        asof_join_last_before(
            clicks,
            purchases,
            key="user_id",
            time="ts",
            order="event_id",
            payload={"event_id": "last_click_id", "ts": "last_click_ts"},
        )
    )


ASOF_TOLERANCE = "1 hour"


@register(
    "j_asof_last_click_1h",
    _ASOF_ORACLE_LATERAL.format(extra="AND c.ts >= p.ts - INTERVAL 1 HOUR"),
    doc="As-of join with tolerance: latest click within 1h before each"
    " purchase (attribution window)",
)
def j_asof_last_click_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a max-lookback tolerance. The latest click overall is
    the latest click within the window whenever it qualifies, so the
    tolerance is a post-filter on the resolved as-of columns — the plan
    is unchanged (one shuffle), no extra join."""
    clicks, purchases = _purchases_clicks(spark, sf_dir)
    joined = asof_join_last_before(
        clicks,
        purchases,
        key="user_id",
        time="ts",
        order="event_id",
        payload={"event_id": "last_click_id", "ts": "last_click_ts"},
    )
    in_window = F.col("last_click_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE}"
    )
    return _asof_output(
        joined.withColumn(
            "last_click_id", F.when(in_window, F.col("last_click_id"))
        ).withColumn("last_click_ts", F.when(in_window, F.col("last_click_ts")))
    )


# Non-uniform value bands: a range-join dimension (see module docstring
# for the uniform-width arithmetic rewrite).
VALUE_BANDS = (
    (0, 0.0, 10.0, "micro"),
    (1, 10.0, 50.0, "small"),
    (2, 50.0, 150.0, "mid"),
    (3, 150.0, 500.0, "large"),
)
_SQL_BANDS = ", ".join(f"({b}, {lo}, {hi}, '{lab}')" for b, lo, hi, lab in VALUE_BANDS)


@register(
    "j_range_band_join",
    f"""
    SELECT b.band_id, b.label, count(*) AS n, {sql_dsum('e.value', 'total_value')}
    FROM events e
    JOIN (VALUES {_SQL_BANDS}) AS b(band_id, lo, hi, label)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_id, b.label
    """,
    doc="Range/band join: events matched to non-uniform value bands via"
    " a broadcast non-equi join",
)
def j_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a small band dimension. The band table is
    broadcast, so Spark plans BroadcastNestedLoopJoin — linear in the
    fact side with zero shuffle before the final aggregation; this is
    the correct shape whenever the range dimension is O(100) rows."""
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        list(VALUE_BANDS), "band_id INT, lo DOUBLE, hi DOUBLE, label STRING"
    )
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("band_id", "label")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )


N_LOG_PARTITIONS = 8


@register(
    "ev_out_of_order_ratio",
    f"""
    WITH flagged AS (
        SELECT user_id % {N_LOG_PARTITIONS} AS partition_id,
               CASE WHEN ts < max(ts) OVER (
                   PARTITION BY user_id % {N_LOG_PARTITIONS}
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) THEN 1 ELSE 0 END AS late
        FROM events
    )
    SELECT partition_id, count(*) AS n, CAST(sum(late) AS BIGINT) AS n_late,
           floor((sum(late) * 20000 + count(*)) / (2.0 * count(*))) / 10000.0
               AS late_ratio
    FROM flagged GROUP BY partition_id
    """,
    doc="Out-of-orderness audit: per log partition, events arriving with"
    " an event-time older than the running max (watermark lag input)",
)
def ev_out_of_order_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measurement that sizes a watermark (W5): per partition, the
    fraction of records whose event time regresses the running max in
    arrival (offset) order. One shuffle on partition_id; the ratio
    rounds HALF_UP in integer space so both engines agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    pid = (F.col("user_id") % N_LOG_PARTITIONS).alias("partition_id")
    w = (
        Window.partitionBy("partition_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.select(pid, "event_id", "ts").withColumn(
        "late",
        F.when(F.col("ts") < F.max("ts").over(w), F.lit(1)).otherwise(F.lit(0)),
    )
    n, n_late = F.count("*"), F.sum("late")
    return flagged.groupBy("partition_id").agg(
        n.alias("n"),
        n_late.alias("n_late"),
        (F.floor((n_late * 20000 + n) / (2.0 * n)) / 10000.0).alias("late_ratio"),
    )


@register(
    "ev_time_weighted_avg",
    """
    WITH seg AS (
        SELECT user_id, value, ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_ts
        FROM events
    ), weighted AS (
        SELECT user_id,
               CAST(value AS DECIMAL(38,6)) *
                   CAST(epoch_us(next_ts) - epoch_us(ts) AS DECIMAL(38,0))
                   AS wv,
               epoch_us(next_ts) - epoch_us(ts) AS dur_us
        FROM seg WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           CAST(sum(dur_us) AS BIGINT) AS total_us,
           round(CAST(sum(wv) AS DOUBLE) / CAST(sum(dur_us) AS DOUBLE), 4)
               AS twa_value
    FROM weighted GROUP BY user_id
    """,
    doc="time-weighted average: value held until next event, decimal-exact",
)
def ev_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per key — the correct mean for sampled
    gauges (a reading holds until the next one): each value is weighted
    by microseconds until the key's next event; the open last segment is
    excluded. Sums are decimal-exact (value×duration products), one
    window + one aggregation, both keyed on user_id so the sort-shuffle
    is reused by the groupBy."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = events.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dur = F.col("next_us") - F.col("t_us")
    wv = F.col("value").cast("decimal(38,6)") * dur.cast("decimal(38,0)")
    return (
        seg.select("user_id", dur.alias("dur_us"), wv.alias("wv"))
        .groupBy("user_id")
        .agg(
            F.sum("dur_us").alias("total_us"),
            F.round(
                F.sum("wv").cast("double") / F.sum("dur_us").cast("double"), 4
            ).alias("twa_value"),
        )
    )
