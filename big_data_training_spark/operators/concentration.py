"""Concentration / inequality readouts — Gini coefficient, Lorenz
decile curve, and Herfindahl-Hirschman indices.

Reference stage "analyze" (README.md:18-22): ev_revenue_pareto already
certifies the 80/20 readout; these queries complete the concentration
toolkit with the standard inequality measures a marketplace or spend
dashboard reports. All three reduce to per-entity integer totals in
one map-side-combinable shuffle; the measures are exact fixed-point
(floors of identical doubles over exact BIGINT sums — the
engine-portable alternative to float aggregation).

Scale notes: the Gini/Lorenz global rank runs over the per-USER
aggregate (entity-grain, 1000x smaller than the corpus; the two-phase
histogram rank replaces it at 100 TB — only Σ rank·x is needed, which
histogram prefix sums provide). HHI groups are per-nation shares of
per-customer counts — bounded by entity counts, never corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.hints import broadcast_gate, table_count
from big_data_training_spark.registry import register

_V = "CAST(floor(value * 1000) AS BIGINT)"

_SQL_PER_USER = f"""
    per_user AS (
        SELECT user_id, CAST(sum({_V}) AS BIGINT) AS x
        FROM events GROUP BY 1
    )
"""


def _per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(F.sum(F.expr(_V)).alias("x"))


@register(
    "ev_gini_coefficient",
    f"""
    WITH {_SQL_PER_USER},
    ranked AS (
        SELECT x, row_number() OVER (ORDER BY x, user_id) AS i
        FROM per_user
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(i * x) AS BIGINT) AS six
        FROM ranked
    )
    SELECT n, sx,
           CAST(floor(1000000.0 * (2.0 * six - (n + 1.0) * sx)
                      / (CAST(n AS DOUBLE) * sx)) AS BIGINT) AS gini_micro
    FROM s
    """,
    doc="Gini coefficient of per-user spend via the rank formula,"
    " deterministic fixed-point micro-units",
)
def ev_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini by the rank identity G = (2Σi·x₍ᵢ₎ − (n+1)Σx)/(nΣx): ranks
    are assigned under the total order (x, user_id), both moments are
    exact BIGINTs, and the coefficient is one double expression
    floored to micro. The rank runs over the per-user aggregate
    (entity grain); only Σi·x is consumed, so the 100 TB route is a
    value-histogram prefix sum, never a global sort of raw events."""
    ranked = _per_user(spark, sf_dir).select(
        "x",
        F.row_number().over(Window.orderBy("x", "user_id")).alias("i"),
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    return s.selectExpr(
        "n",
        "sx",
        "CAST(floor(1000000.0 * (2.0 * six - (n + 1.0) * sx)"
        " / (CAST(n AS DOUBLE) * sx)) AS BIGINT) AS gini_micro",
    )


@register(
    "ev_lorenz_deciles",
    f"""
    WITH {_SQL_PER_USER},
    tiled AS (
        SELECT x, ntile(10) OVER (ORDER BY x, user_id) AS decile
        FROM per_user
    ),
    per_dec AS (
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x) AS BIGINT) AS dec_total
        FROM tiled GROUP BY 1
    ),
    cum AS (
        SELECT decile, n_users, dec_total,
               CAST(sum(dec_total) OVER (ORDER BY decile) AS BIGINT) AS cum_total,
               CAST(sum(dec_total) OVER () AS BIGINT) AS grand_total
        FROM per_dec
    )
    SELECT decile, n_users, dec_total,
           CAST(cum_total * 1000 // grand_total AS BIGINT)
               AS cum_share_permille
    FROM cum
    """,
    doc="Lorenz curve at decile grain: cumulative spend share per"
    " poorest-to-richest user decile, exact permille",
)
def ev_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curve behind the Gini: users sorted poorest→richest into
    ntile(10) buckets (total-order tie-break), cumulative share in
    exact integer permille. The cumulative window runs over 10 rows;
    the per-user rank obeys the same histogram-rank scale route as
    ev_gini_coefficient."""
    tiled = _per_user(spark, sf_dir).select(
        "x",
        F.ntile(10).over(Window.orderBy("x", "user_id")).alias("decile"),
    )
    per_dec = tiled.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count("*").alias("n_users"),
        F.sum("x").cast("bigint").alias("dec_total"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = per_dec.select(
        "decile",
        "n_users",
        "dec_total",
        F.sum("dec_total").over(wc).cast("bigint").alias("cum_total"),
        F.sum("dec_total").over(wt).cast("bigint").alias("grand_total"),
    )
    return cum.selectExpr(
        "decile",
        "n_users",
        "dec_total",
        "CAST(cum_total * 1000 div grand_total AS BIGINT)"
        " AS cum_share_permille",
    )


@register(
    "ev_herfindahl_concentration",
    """
    WITH per_cust AS (
        SELECT c.c_nationkey AS nationkey, o.o_custkey,
               CAST(count(*) AS BIGINT) AS c
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT CAST(nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(c) AS BIGINT) AS n_orders,
           CAST(floor(1000000.0 * sum(c * c)
                      / (CAST(sum(c) AS DOUBLE) * sum(c))) AS BIGINT)
               AS hhi_micro
    FROM per_cust GROUP BY 1
    """,
    doc="Herfindahl-Hirschman index of order concentration across"
    " customers, per nation, fixed-point micro-units",
)
def ev_herfindahl_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration HHI = Σ shareᵢ² = Σcᵢ²/(Σc)² per nation:
    per-customer order counts are exact, both moments are BIGINT sums,
    the index is one floored double expression. The customer dim join
    is byte-gated broadcast; two map-side-combinable shuffles total
    (per-customer counts, then per-nation moments)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    bcast = broadcast_gate(table_count(spark, sf_dir, "customer"))
    per_cust = (
        orders.join(bcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nationkey"), F.col("o_custkey")
        )
        .agg(F.count("*").alias("c"))
    )
    return (
        per_cust.groupBy(F.col("nationkey").cast("bigint").alias("nationkey"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("c").cast("bigint").alias("n_orders"),
            F.expr(
                "CAST(floor(1000000.0 * sum(c * c)"
                " / (CAST(sum(c) AS DOUBLE) * sum(c))) AS BIGINT)"
            ).alias("hhi_micro"),
        )
    )
