"""Warehouse maintenance: data-quality constraint checks and
incremental materialized-view refresh.

The reference's pipeline story is collect → store → process → visualize
(README.md:18-22); these are the two operations that keep the "store"
stage trustworthy and cheap at 100 TB:

* **Constraint report** — the Deequ-style verification suite: each
  table gets ONE aggregate pass computing every unary constraint
  (completeness, uniqueness, ranges, accepted values) plus one
  anti-join for referential integrity. Constraints are data, not
  code: the report is a table of (constraint, n_violations, passed).
* **Incremental refresh** — a materialized aggregate is maintained by
  merging the standing partial aggregate with the delta batch's
  partial aggregate instead of rescanning history. The oracle IS the
  full recompute, so the merge algebra (sum-of-sums, count-of-counts)
  is what gets verified — the same invariant that makes Spark's own
  partial/final aggregation correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

MV_CUTOVER = "2024-01-20"


@register(
    "dq_constraint_report",
    """
    SELECT 'orders.o_orderkey NOT NULL' AS check_name,
           (SELECT count(*) FROM orders WHERE o_orderkey IS NULL)
               AS n_violations
    UNION ALL
    SELECT 'orders.o_orderkey UNIQUE',
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
    UNION ALL
    SELECT 'orders.o_orderstatus IN (O,F,P)',
           (SELECT count(*) FROM orders
            WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    UNION ALL
    SELECT 'lineitem.l_quantity BETWEEN 1 AND 50',
           (SELECT count(*) FROM lineitem
            WHERE l_quantity < 1 OR l_quantity > 50)
    UNION ALL
    SELECT 'lineitem.l_orderkey REFERENCES orders',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    """,
    doc="data quality: one-pass constraint verification report per table",
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite as data: all unary checks per table fold into a
    single aggregate scan (null counts, distinct deficit, range and
    domain violations — one pass over orders, one over lineitem), and
    the referential check is one anti-join. At 100 TB this is the
    cheapest possible shape: no per-constraint rescans."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    o = orders.agg(
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("nulls"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dupes"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("domain"),
    )
    li = lineitem.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("range")
    )
    orphans = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("orphans"))
    )
    report = (
        o.select(
            F.expr(
                "stack(3,"
                " 'orders.o_orderkey NOT NULL', nulls,"
                " 'orders.o_orderkey UNIQUE', dupes,"
                " 'orders.o_orderstatus IN (O,F,P)', domain)"
            ).alias("check_name", "n_violations")
        )
        .unionByName(
            li.select(
                F.lit("lineitem.l_quantity BETWEEN 1 AND 50").alias("check_name"),
                F.col("range").alias("n_violations"),
            )
        )
        .unionByName(
            orphans.select(
                F.lit("lineitem.l_orderkey REFERENCES orders").alias("check_name"),
                F.col("orphans").alias("n_violations"),
            )
        )
    )
    return report


@register(
    "mv_incremental_refresh",
    """
    SELECT date_trunc('day', ts) AS day,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_value
    FROM events GROUP BY 1
    """,
    doc="incremental MV maintenance: merge standing partials with the delta",
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view delta maintenance: the standing MV holds
    partial aggregates (count, decimal sum) for history; a delta batch
    aggregates only its own rows; refresh = full-outer merge on the
    group key with sum-of-partials. The oracle recomputes from scratch
    — merge(partial(A), partial(B)) == aggregate(A ∪ B) is the
    invariant. At 100 TB the delta is a day's partition: refresh cost
    is O(delta + |MV|), never O(history)."""
    events = load_table(spark, sf_dir, "events")
    cut = F.lit(MV_CUTOVER).cast("timestamp")
    day = F.date_trunc("day", "ts").alias("day")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(day).agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("pv"),
        )

    standing = partials(events.filter(F.col("ts") < cut))
    delta = partials(events.filter(F.col("ts") >= cut))
    merged = standing.alias("s").join(
        delta.alias("d"), F.col("s.day") == F.col("d.day"), "full_outer"
    )
    return merged.select(
        F.coalesce("s.day", "d.day").alias("day"),
        (
            F.coalesce("s.pn", F.lit(0)) + F.coalesce("d.pn", F.lit(0))
        ).alias("n"),
        F.round(
            (
                F.coalesce("s.pv", F.lit(0).cast("decimal(38,6)"))
                + F.coalesce("d.pv", F.lit(0).cast("decimal(38,6)"))
            ).cast("double"),
            2,
        ).alias("total_value"),
    )


def _skew_profile(df: DataFrame, table_key: str, key: str) -> DataFrame:
    """Key-skew diagnostic — the report that tells you whether a join or
    groupBy on ``key`` needs salting before it hits 1000 executors.
    Stage 1 is a partial-agg-friendly per-key count (the only scan of
    the base table); the per-key frame (|keys| rows, corpus-size-free)
    folds to one stats row, and the heavy-key count compares each key
    against the broadcast global average. All-integer outputs (avg
    scaled ×100, floor div) keep the report engine-exact."""
    per_key = df.groupBy(key).agg(F.count("*").alias("c"))
    stats = per_key.agg(
        F.sum("c").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("c").alias("max_key_rows"),
    )
    heavy = (
        per_key.crossJoin(F.broadcast(stats))
        .filter(F.col("c") * F.col("n_keys") > 2 * F.col("n_rows"))
        .agg(F.count("*").alias("n_heavy_keys"))
    )
    return stats.crossJoin(F.broadcast(heavy)).select(
        F.lit(table_key).alias("table_key"),
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.expr("(n_rows * 100) div n_keys").alias("avg_rows_x100"),
        "n_heavy_keys",
    )


@register(
    "dq_skew_profile",
    """
    WITH prof AS (
        SELECT 'events.user_id' AS table_key, user_id AS k FROM events
        UNION ALL
        SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
    ), per_key AS (
        SELECT table_key, k, count(*) AS c FROM prof GROUP BY 1, 2
    ), stats AS (
        SELECT table_key, sum(c) AS n_rows, count(*) AS n_keys,
               max(c) AS max_key_rows
        FROM per_key GROUP BY 1
    ), heavy AS (
        SELECT p.table_key, count(*) AS n_heavy_keys
        FROM per_key p JOIN stats s USING (table_key)
        WHERE p.c * s.n_keys > 2 * s.n_rows
        GROUP BY 1
    )
    SELECT s.table_key, CAST(s.n_rows AS BIGINT) AS n_rows, s.n_keys,
           CAST(s.max_key_rows AS BIGINT) AS max_key_rows,
           CAST(s.n_rows * 100 AS BIGINT) // s.n_keys AS avg_rows_x100,
           CAST(coalesce(h.n_heavy_keys, 0) AS BIGINT) AS n_heavy_keys
    FROM stats s LEFT JOIN heavy h USING (table_key)
    """,
    doc="data quality: key-skew report (salt-before-you-shuffle diagnostic)",
)
def dq_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostics for the two hottest shuffle keys in the fixture
    schema; heavy = a key holding more than 2× the average row share."""
    events = load_table(spark, sf_dir, "events")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return _skew_profile(events, "events.user_id", "user_id").unionAll(
        _skew_profile(lineitem, "lineitem.l_suppkey", "l_suppkey")
    )


@register(
    "mv_refresh_with_retractions",
    """
    SELECT date_trunc('day', ts) AS day,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_value
    FROM events
    WHERE NOT (event_type = 'error' AND ts >= TIMESTAMP '2024-01-20')
    GROUP BY 1
    HAVING count(*) > 0
    """,
    doc="MV maintenance under a retraction stream: deletes as negative partials",
)
def mv_refresh_with_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog-stream materialization (the table↔stream duality,
    kafka/README.md:319): the delta batch carries upserts AND deletes.
    Deletes merge as *negative* partial aggregates (-count, -sum) — the
    retraction trick that lets a changelog maintain any sum/count MV
    without rereading history. Scenario: all post-cutover 'error' events
    get retracted; the oracle recomputes the post-delete state from
    scratch. Groups whose count retracts to zero drop out of the MV."""
    events = load_table(spark, sf_dir, "events")
    cut = F.lit(MV_CUTOVER).cast("timestamp")
    day = F.date_trunc("day", "ts").alias("day")

    def partials(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy(day).agg(
            (F.lit(sign) * F.count("*")).alias("pn"),
            (F.lit(sign) * F.sum(F.col("value").cast("decimal(38,6)"))).alias("pv"),
        )

    standing = partials(events.filter(F.col("ts") < cut), 1)
    delta_ins = partials(events.filter(F.col("ts") >= cut), 1)
    # the retraction stream: post-cutover error events are deleted
    delta_del = partials(
        events.filter((F.col("ts") >= cut) & (F.col("event_type") == "error")), -1
    )
    merged = (
        standing.unionByName(delta_ins)
        .unionByName(delta_del)
        .groupBy("day")
        .agg(F.sum("pn").alias("n"), F.sum("pv").alias("pv"))
        .filter(F.col("n") > 0)
    )
    return merged.select(
        "day",
        "n",
        F.round(F.col("pv").cast("double"), 2).alias("total_value"),
    )


@register(
    "dq_value_outliers",
    """
    WITH stats AS (
        SELECT event_type,
               CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS mean,
               sqrt(greatest(
                   CAST(sum(CAST(value AS DECIMAL(38,6)) *
                            CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*)
                   - (CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*))
                     * (CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*)),
                   0)) AS sd,
               count(*) AS n
        FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 2) AS value,
           round((e.value - s.mean) / s.sd, 2) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE s.sd > 0 AND abs(e.value - s.mean) > 3 * s.sd
    """,
    doc="data quality: per-key 3-sigma value outliers (anomaly flagging)",
)
def dq_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly flagging over the event stream: per-type mean/stddev from
    decimal-exact sums (population moments — order-independent, so the
    doubles agree across engines), then one broadcast join flags rows
    beyond 3σ. Two scans total; the stats side is |event_types| rows."""
    events = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(38,6)")
    stats = events.groupBy("event_type").agg(
        (F.sum(dec).cast("double") / F.count("*")).alias("mean"),
        F.sqrt(
            F.greatest(
                F.sum(dec * dec).cast("double") / F.count("*")
                - (F.sum(dec).cast("double") / F.count("*"))
                * (F.sum(dec).cast("double") / F.count("*")),
                F.lit(0.0),
            )
        ).alias("sd"),
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(
            (F.col("sd") > 0)
            & (F.abs(F.col("value") - F.col("mean")) > 3 * F.col("sd"))
        )
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round((F.col("value") - F.col("mean")) / F.col("sd"), 2).alias(
                "zscore"
            ),
        )
    )


@register(
    "dq_freshness_lag",
    """
    WITH g AS (SELECT max(ts) AS global_max FROM events)
    SELECT e.event_type,
           max(e.ts) AS latest_ts,
           CAST(epoch_us((SELECT global_max FROM g)) - epoch_us(max(e.ts))
                AS BIGINT) // 1000000 AS lag_s
    FROM events e GROUP BY e.event_type
    """,
    doc="data quality: per-key freshness lag behind the newest event",
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-freshness monitoring without wall-clock dependence: each
    key's newest event compared against the dataset's global maximum (a
    1-row broadcast), so a stalled producer shows up as a growing lag.
    Deterministic — the reference point is data, not now()."""
    events = load_table(spark, sf_dir, "events")
    g = events.agg(F.max("ts").alias("global_max"))
    per_type = events.groupBy("event_type").agg(F.max("ts").alias("latest_ts"))
    return per_type.crossJoin(F.broadcast(g)).select(
        "event_type",
        "latest_ts",
        F.expr(
            "(unix_micros(global_max) - unix_micros(latest_ts)) div 1000000"
        ).alias("lag_s"),
    )
