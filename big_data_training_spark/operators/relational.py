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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from big_data_training_spark.hints import dim_gate
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
    "q6_forecast_revenue",
    f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.07
      AND l_quantity < 24
    """,
    doc="T3+A4: selective filter + scalar aggregate (TPC-H Q6 shape)",
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-side query: every predicate pushes to Parquet, the
    aggregate is a single partial/final reduction — the plan to beat at
    100 TB is scan-bound, nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q10_returned_revenue",
    f"""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, n.n_name AS n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="returned-item revenue per customer, top-20 (TPC-H Q10 shape)",
    bench=True,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact join shuffles on orderkey; customer broadcasts under the
    size gate (SF-scaled dim — shuffle fallback past the budget),
    nation unconditionally; global top-20 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    bc = dim_gate(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bc(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    f"""
    SELECT o.o_orderkey AS o_orderkey, o.o_custkey AS o_custkey,
           round(o.o_totalprice, 2) AS o_totalprice,
           {sql_dsum('l.l_quantity', 'sum_qty')}
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
    HAVING sum(l.l_quantity) > 200
    """,
    doc="large-volume orders via grouped HAVING (TPC-H Q18 shape)",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-filter (HAVING) after a fact-fact join — the aggregate
    runs partial/final, the filter applies post-final only."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"), F.sum("l_quantity").alias("_raw"))
        .filter(F.col("_raw") > 200)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


@register(
    "q12_shipmode_case_agg",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_finished,
           CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_other
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    doc="conditional (CASE) aggregation after join (TPC-H Q12 shape)",
)
def q12_shipmode_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-split counters inside one grouped aggregate — one pass, no
    per-branch scans."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("n_finished"),
            F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0))
            .cast("bigint")
            .alias("n_other"),
        )
    )


@register(
    "q14_conditional_ratio",
    """
    SELECT round(
             100.0 * CAST(sum(CAST(CASE WHEN p_type LIKE 'STANDARD%'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                   AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(38,6))) AS DOUBLE), 4) AS standard_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
    doc="conditional revenue ratio (TPC-H Q14 shape)",
)
def q14_conditional_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio of two conditional aggregates in a single pass; the part
    dimension broadcasts under the size gate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    bp = dim_gate(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = F.when(F.col("p_type").startswith("STANDARD"), rev).otherwise(F.lit(0.0))
    return (
        li.join(bp(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(cond.cast("decimal(38,6)")).cast("double")
                / F.sum(rev.cast("decimal(38,6)")).cast("double"),
                4,
            ).alias("standard_revenue_pct")
        )
    )


@register(
    "q19_disjunctive_predicates",
    f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}, count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 20 AND l_quantity >= 5)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20)
    """,
    doc="disjunctive multi-attribute predicates over a join (TPC-H Q19 shape)",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate spanning both join sides — Catalyst pushes
    the common join key, evaluates the disjunction post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bp = dim_gate(spark, sf_dir, "part")
    j = li.join(bp(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 20) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 20))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count("*").alias("n"),
    )


_REGION_REVENUE_SQL = """
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
"""


@register(
    "s9_sql_api_region_revenue",
    _REGION_REVENUE_SQL,
    doc="S9: warehouse surface — registered views queried through spark.sql",
)
def s9_sql_api_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text interface over the registered warehouse views
    (data.register_views) — same Catalyst plan as the DataFrame form;
    the identical statement runs on both engines."""
    from big_data_training_spark.data import register_views

    register_views(spark, sf_dir)
    return spark.sql(_REGION_REVENUE_SQL)


@register(
    "q4_order_priority_exists",
    """
    SELECT o_orderstatus, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderstatus
    """,
    doc="correlated EXISTS over a date window (TPC-H Q4 shape)",
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a cross-table predicate: left-semi join on
    the key, the correlation condition evaluated inside the join. The
    lineitem pre-filter is implied by the join (l_shipdate > o_orderdate
    >= 1997-01-01) but not derivable by Catalyst across a non-equi
    predicate, so it's stated explicitly to reach the Parquet scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="view + scalar max subquery: top revenue supplier (TPC-H Q15 shape)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue view computed once and reused for both the max and the
    final probe (cached to avoid the double scan — what a materialized
    view buys at scale)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # no cache: both consumers sit in one plan, so ReuseExchange serves
    # the aggregation output to the max branch and the probe branch
    # (caching here would pin storage memory for the session lifetime).
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand AS p_brand, p.p_type AS p_type,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size >= 10
    GROUP BY p.p_brand, p.p_type
    """,
    doc="distinct-supplier counts per part attribute (TPC-H Q16 shape)",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negated dim filter + exact distinct over the bridge join (no
    partsupp table in the fixtures; lineitem is the part↔supplier
    bridge)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") >= 10)
    )
    bp = dim_gate(spark, sf_dir, "part")
    return (
        l.join(bp(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q13_customer_order_dist",
    """
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
    doc="left-outer join + double aggregation (TPC-H Q13 shape)",
)
def q13_customer_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution: LEFT JOIN keeps order-less
    customers (count(col) skips their nulls → 0 bucket), then a second
    aggregation over the first."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS mktsegment, count(*) AS n_customers,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    doc="scalar subquery + anti-join (TPC-H Q22 shape)",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no event activity: the
    scalar aggregate broadcasts as a 1-row cross join; the NOT EXISTS is
    a left_anti. Note avg() in plain double on both engines — the
    strict > comparison sits far from any ulp boundary for fixture data."""
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(e, c.c_custkey == e.user_id, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double"), 2
            ).alias("total_bal"),
        )
    )


@register(
    "win_first_last",
    """
    SELECT o_orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS cheapest_in_status,
           round(last_value(o_totalprice) OVER
               (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
               AS priciest_in_status,
           round(nth_value(o_totalprice, 2) OVER
               (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
               AS second_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    doc="first_value/last_value/nth_value over deterministic frames",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-position window functions; last/nth use the full-partition
    frame explicitly (the default running frame would make last_value ==
    current row)."""
    o = load_table(spark, sf_dir, "orders")
    running = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    full = running.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        F.round(F.first("o_totalprice").over(running), 2).alias(
            "cheapest_in_status"
        ),
        F.round(F.last("o_totalprice").over(full), 2).alias("priciest_in_status"),
        F.round(F.nth_value("o_totalprice", 2).over(full), 2).alias(
            "second_cheapest"
        ),
    )


@register(
    "win_rank_suite",
    """
    SELECT o_orderkey,
           dense_rank() OVER w AS drk,
           round(percent_rank() OVER w, 6) AS prk,
           ntile(4) OVER w AS quartile,
           round(coalesce(lead(o_totalprice) OVER w - o_totalprice, 0), 2)
               AS gap_to_next
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    doc="ranking-window suite: dense_rank/percent_rank/ntile/lead",
)
def win_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface over one deterministic window
    (tiebreak on the key, so ntile buckets are stable)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(
            F.coalesce(
                F.lead("o_totalprice").over(w) - F.col("o_totalprice"), F.lit(0)
            ),
            2,
        ).alias("gap_to_next"),
    )


@register(
    "f_date_parts",
    """
    SELECT CAST(extract(year FROM o_orderdate) AS INT) AS y,
           CAST(extract(month FROM o_orderdate) AS INT) AS m,
           count(*) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_price
    FROM orders GROUP BY 1, 2
    """,
    doc="date-part extraction + calendar aggregation",
)
def f_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"), 2
            ).alias("total_price"),
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


@register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
        SELECT c.l_partkey, c.l_suppkey, c.unit_cost
        FROM cost c
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT round(s.s_acctbal, 2) AS s_acctbal, s.s_name AS s_name,
           n.n_name AS n_name, p.p_partkey AS p_partkey,
           p.p_name AS p_name, e.unit_cost AS unit_cost
    FROM part p
    JOIN eur e ON e.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = e.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
      AND e.unit_cost = (SELECT min(e2.unit_cost) FROM eur e2
                         WHERE e2.l_partkey = p.p_partkey)
    """,
    doc="min-cost supplier per part via correlated min (TPC-H Q2 shape)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost European supplier for each qualifying part (no partsupp
    fixture: lineitem is the part↔supplier bridge, unit cost =
    min(extendedprice/quantity) per pair — IEEE-deterministic on both
    engines, so the double equality join is exact).

    The correlated min subquery is decorrelated by hand into a per-part
    min aggregate joined back on (partkey, unit_cost) — the same plan
    Catalyst derives for the SQL form. All dimension sides broadcast;
    the only big shuffle is the lineitem groupBy(partkey, suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    bs = dim_gate(spark, sf_dir, "supplier")
    bp = dim_gate(spark, sf_dir, "part")
    eur_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eur = cost.join(bs(eur_sup), cost.l_suppkey == eur_sup.s_suppkey)
    min_cost = eur.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    return (
        eur.join(
            min_cost,
            (eur.l_partkey == min_cost.mc_partkey)
            & (eur.unit_cost == min_cost.min_cost),
        )
        .join(bp(p), eur.l_partkey == p.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "unit_cost",
        )
    )


@register(
    "q11_important_parts",
    """
    WITH val AS (
        SELECT l.l_partkey AS partkey,
               sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(38,6))) AS v
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY l.l_partkey
    )
    SELECT partkey, CAST(round(v, 2) AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) * 0.0002 FROM val)
    """,
    doc="parts above a fraction of national value (TPC-H Q11 shape)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped value per part for one nation's suppliers, kept only
    where it exceeds a scalar-subquery fraction of the national total.
    The per-part value aggregates in DECIMAL(38,6) (order-independent);
    the global total is a 1-row broadcast, so the HAVING-style filter
    costs no extra shuffle. At 100 TB the val aggregate reuses the
    single lineitem shuffle for both branches (ReuseExchange)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    bs = dim_gate(spark, sf_dir, "supplier", ["s_suppkey"])
    nat_sup = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    val = (
        li.join(bs(nat_sup), li.l_suppkey == nat_sup.s_suppkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("v")
        )
    )
    total = val.agg((F.sum("v").cast("double") * F.lit(0.0002)).alias("threshold"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("threshold"))
        .select("partkey", F.round(F.col("v"), 2).cast("double").alias("part_value"))
    )


@register(
    "q20_excess_shippers",
    """
    SELECT s.s_name AS s_name, n.n_name AS n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(l.l_quantity) > 60
    )
    """,
    doc="suppliers with heavy shipments of matching parts (TPC-H Q20 shape)",
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-subquery semi-join chain (no partsupp availqty fixture:
    'excess' = shipped > 60 units of one red part in 1997). Inner part
    filter broadcasts as a semi-join into the date-pruned lineitem scan;
    the grouped HAVING runs partial/final; the outer IN is a left_semi
    against the 100-row supplier dim."""
    p_red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    bp = dim_gate(spark, sf_dir, "part", ["p_partkey"])
    heavy = (
        li.join(bp(p_red), li.l_partkey == p_red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


@register(
    "q21_last_shipper_wait",
    """
    SELECT s.s_name AS s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    """,
    doc="strictly-last shipper in multi-supplier orders (TPC-H Q21 shape)",
    bench=True,
)
def q21_last_shipper_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS double correlation (no receipt/commit dates
    in the fixture: the 'waiting' supplier is the strictly-last shipper
    among multi-supplier finalized orders). Both correlated subqueries
    become orderkey-equi semi/anti joins with residual predicates, so
    all three lineitem branches shuffle on l_orderkey and the exchange
    is reused across them; supplier and the 1-col orders filter stay
    broadcast-side."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l1 = li.alias("l1").join(o, F.col("l1.l_orderkey") == o.o_orderkey).select(
        "l1.l_orderkey", "l1.l_suppkey", "l1.l_shipdate"
    )
    l2 = li.alias("l2")
    l3 = li.alias("l3")
    waiting = (
        l1.alias("l1")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .alias("l1")
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
            & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    bs = dim_gate(spark, sf_dir, "supplier")
    return (
        waiting.join(bs(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
