"""Skyline (Pareto frontier) operator: multi-objective dominance
filtering.

"Best customers" is rarely one metric: a buyer with the most revenue
AND the fewest orders to service dominates one with less revenue and
more orders, but neither dominates the other when the objectives
disagree — the undominated set is the skyline (Börzsönyi et al.,
"The Skyline Operator", ICDE 2001). Curation pipelines use the same
operator to pick documents on (quality, length) or sources on
(volume, dup-rate) frontiers.

The naive skyline is an all-pairs dominance test (quadratic). For the
2-D case there is a sort-based linear plan: order by the first
objective descending, then a row is on the skyline iff its second
objective is strictly better than the running best over all strictly-
higher first-objective rows — a single window with an explicit RANGE
frame that EXCLUDES ties of the first objective (equal-revenue rows
must not shadow each other). Cost at 100 TB: the per-customer
aggregate (one keyed shuffle) then one global sort of |customers|
rows; no pair blowup on any distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register


@register(
    "ev_customer_skyline",
    """
    WITH spend AS (
        SELECT o_custkey AS custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS revenue_cents,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    ), collapsed AS (
        -- equal revenue, strictly more orders => dominated; keep the
        -- per-revenue minimum-order rows (ties on both dims survive)
        SELECT * FROM (
            SELECT *, min(n_orders) OVER (PARTITION BY revenue_cents)
                       AS min_ord
            FROM spend
        ) WHERE n_orders = min_ord
    ), flagged AS (
        SELECT custkey, revenue_cents, n_orders,
               min(n_orders) OVER (
                   ORDER BY revenue_cents DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS best_above
        FROM collapsed
    )
    SELECT custkey, revenue_cents, n_orders
    FROM flagged
    WHERE best_above IS NULL OR n_orders < best_above
    ORDER BY revenue_cents DESC, custkey
    """,
    doc="2-D skyline: customers undominated on (max revenue,"
    " min orders), via the sort-based linear plan — no pairwise"
    " dominance join",
)
def ev_customer_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto frontier of (revenue DESC, order count ASC) over
    customers: a row survives iff no other customer has at least its
    revenue and at most its orders with one strict inequality. Plan:
    aggregate per customer (one shuffle), collapse equal-revenue
    groups to their min-order rows (a dominated same-revenue row dies
    here), then one window ordered by revenue DESC whose integer RANGE frame
    (UNBOUNDED PRECEDING .. 1 PRECEDING, i.e. revenue >= current+1)
    spans exactly the STRICTLY higher revenues — tie groups exclude
    themselves — taking the running min of n_orders — survive iff STRICTLY
    below it (an equal order count at higher revenue dominates).
    Linear after the sort, skew-proof, and the same template handles
    any 2-objective frontier; d>2 objectives fall back to the
    block-nested-loop skyline, which is exactly when you cap the
    candidate set first."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
                " AS BIGINT)"
            ).alias("revenue_cents"),
            F.count("*").alias("n_orders"),
        )
    )
    collapsed = (
        spend.withColumn(
            "min_ord",
            F.expr(
                "min(n_orders) OVER (PARTITION BY revenue_cents)"
            ),
        )
        .filter(F.col("n_orders") == F.col("min_ord"))
        .drop("min_ord")
    )
    flagged = collapsed.selectExpr(
        "custkey",
        "revenue_cents",
        "n_orders",
        "min(n_orders) OVER ("
        " ORDER BY revenue_cents DESC"
        " RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        " AS best_above",
    )
    return (
        flagged.filter(
            F.col("best_above").isNull()
            | (F.col("n_orders") < F.col("best_above"))
        )
        .select("custkey", "revenue_cents", "n_orders")
        .orderBy(F.desc("revenue_cents"), F.asc("custkey"))
    )
