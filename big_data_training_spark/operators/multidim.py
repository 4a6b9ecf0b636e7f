"""Multidimensional aggregation surface: ROLLUP / CUBE / GROUPING SETS,
pivot (crosstab), exact discrete percentiles, and fixed-width histogram
profiling — the OLAP summary layer over the same topics the reference
aggregates one dimension at a time (kafka/README.md stream-aggregation
examples; A4-A8 in SURVEY.md §2).

All of these compile to ordinary partial+final hash aggregates (ROLLUP/
CUBE expand each input row to its grouping-set combinations *before*
the partial aggregate, so map-side combine still applies) — there is no
per-dimension re-scan, one shuffle total regardless of how many
grouping sets are requested. That property is exactly why they scale:
at 100 TB a ROLLUP over 3 dimensions costs the same single pass as the
finest-grained group-by.

NULL semantics: subtotal rows surface the grouped-away dimension as
NULL in both engines; results coalesce them to 'ALL' and carry the
integer GROUPING() flag so subtotal rows are unambiguous even when the
dimension itself contains NULLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.numeric import dsum, sql_dsum
from big_data_training_spark.registry import register


@register(
    "agg_rollup_region_nation",
    f"""
    SELECT coalesce(r.r_name, 'ALL') AS region,
           coalesce(n.n_name, 'ALL') AS nation,
           CAST(GROUPING(r.r_name) AS INT) AS g_region,
           CAST(GROUPING(n.n_name) AS INT) AS g_nation,
           count(*) AS n_orders, {sql_dsum('o.o_totalprice', 'total_revenue')}
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    doc="ROLLUP region→nation revenue: hierarchy subtotals + grand total"
    " in one pass",
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: nation detail, per-region subtotal, grand
    total — one shuffle (rollup expansion happens before the partial
    aggregate). Dimension joins broadcast (nation/region are fixed-size
    at any scale)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "total_revenue"),
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
    ).select(
        F.coalesce("r_name", F.lit("ALL")).alias("region"),
        F.coalesce("n_name", F.lit("ALL")).alias("nation"),
        "g_region",
        "g_nation",
        "n_orders",
        "total_revenue",
    )


@register(
    "agg_cube_status_priority",
    f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           count(*) AS n_orders, {sql_dsum('o_totalprice', 'total_revenue')}
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE status × priority: all 2^2 grouping combinations in one"
    " pass",
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-classification (detail, both marginals, grand total)
    from a single scan + single shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "total_revenue"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    ).select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "g_status",
        "g_priority",
        "n_orders",
        "total_revenue",
    )


@register(
    "agg_grouping_sets_events",
    f"""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(user_id % 8 AS BIGINT), -1) AS partition_id,
           count(*) AS n, {sql_dsum('value', 'total_value')}
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 8), ())
    """,
    doc="GROUPING SETS: two independent marginals + grand total, one"
    " scan",
)
def agg_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets — the two marginals a dashboard wants
    (per-type, per-partition) plus the grand total, without the CUBE
    rows nobody reads. Still one shuffle."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "partition_id", (F.col("user_id") % 8)
    )
    return (
        ev.groupingSets(
            [["event_type"], ["partition_id"], []], "event_type", "partition_id"
        )
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("partition_id", F.lit(-1)).alias("partition_id"),
            "n",
            "total_value",
        )
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_daily_event_matrix",
    """
    SELECT date_trunc('day', ts) AS day,
           {cols}
    FROM events GROUP BY 1
    """.format(
        cols=", ".join(
            f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
            for t in EVENT_TYPES
        )
    ),
    doc="Pivot/crosstab: days × event types as a wide count matrix",
)
def pivot_daily_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab via pivot with an explicit value list — pinning the list
    keeps the plan a single pass (no extra distinct-values job) and the
    output schema stable, which is what you want at scale and what the
    conditional-aggregation oracle states declaratively."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return out.na.fill(0, subset=list(EVENT_TYPES))


@register(
    "agg_percentiles_disc",
    """
    SELECT event_type,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25,
           percentile_disc(0.50) WITHIN GROUP (ORDER BY value) AS p50,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS p75,
           percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
    FROM events GROUP BY event_type
    """,
    doc="Exact discrete percentiles per key (picks actual elements — "
    "engine-portable, unlike interpolated quantiles)",
)
def agg_percentiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles select an actual data element, so Spark and
    the oracle agree bit-for-bit (continuous interpolation would differ
    in floating-point evaluation order between engines). At 100 TB
    trade exactness for `approx_percentile` — same query shape, sketch
    merge instead of a per-group sort."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY value)").alias(a)
        for p, a in ((0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.99, "p99"))
    ]
    return ev.groupBy("event_type").agg(*aggs)


HIST_BIN_WIDTH = 50


@register(
    "agg_value_histogram",
    f"""
    SELECT CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
           CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) * {HIST_BIN_WIDTH}
               AS bin_lo,
           count(*) AS n, min(value) AS min_value, max(value) AS max_value
    FROM events GROUP BY 1
    """,
    doc="Fixed-width histogram: the arithmetic-band rewrite of a uniform"
    " range join (pure map + one agg)",
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform bands need no join at all: the band key is computable per
    row (floor division), making the whole histogram a map + single
    partial/final aggregate. This is the rewrite to prefer over
    ``j_range_band_join`` whenever band edges are uniform."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.floor(F.col("value") / HIST_BIN_WIDTH).cast("bigint")
    return (
        ev.select(bin_.alias("bin"), "value")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "bin",
            (F.col("bin") * HIST_BIN_WIDTH).alias("bin_lo"),
            "n",
            "min_value",
            "max_value",
        )
    )
