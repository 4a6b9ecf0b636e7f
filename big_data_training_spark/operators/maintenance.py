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
