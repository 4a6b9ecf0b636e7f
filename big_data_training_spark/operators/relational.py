"""Batch relational core: filter + multi-aggregate + multi-join queries.

Realizes the warehouse stage of the reference pipeline (collect → store →
process → visualize, README.md:18-22) and the aggregate operator family
(A2 reduce, A3 aggregate, A4 sum-by-key, A5 min/avg per key —
flink/README.md:25-26,73; kafka/stream-state.png). The flagship
``q1_pricing_summary`` is the word-count-shaped "one real query
end-to-end" of SURVEY.md §7 step 1.

Scale notes: every query here is a scan → partial agg → shuffle → final
agg plan (HashAggregateExec partial/final — exactly the reference's
per-partition + merge topology, kafka/README.md:330). Filters and column
pruning reach the Parquet scan; no Python crosses the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from big_data_training_spark.registry import register


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="T3+A2-A5: pricing summary (TPC-H Q1 shape) over lineitem",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → grouped 8-way aggregate; partial/final hash aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_order_priority_count",
    """
    SELECT o_orderstatus, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_orderstatus
    """,
    doc="A6-shape on orders: status counts + totals in a date range",
)
def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range filter (pushed to Parquet) → count/sum per status."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
    )
