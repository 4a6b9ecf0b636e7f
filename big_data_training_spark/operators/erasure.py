"""Right-to-erasure cascade audit: given a deletion set of customers,
how many rows must go from each table in the FK chain, and what would
be orphaned if the cascade stopped early.

GDPR/CCPA erasure on a warehouse is a cascade over the foreign-key
graph (customer -> orders -> lineitem here); the two numbers an
operator needs BEFORE running it are (a) blast radius per table and
(b) the orphan count left behind at each level if the cascade is cut
short — the audit that catches half-implemented deletion jobs. The
deletion set is a reproducible hash sample of customers (in
production: the actual request queue; the dataflow is identical).

Scale: each level is one semi-join keyed on the FK — the same plan
Spark uses for IN-subqueries — and the counts are per-level
aggregates. Nothing materializes the deleted rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

GDPR_MOD = 50  # ~2% of customers in the deletion set


@register(
    "dq_erasure_cascade_audit",
    f"""
    WITH subjects AS (
        SELECT c_custkey FROM customer
        WHERE {sql_hash60("c_custkey || '#gdpr'")} % {GDPR_MOD} = 0
    ),
    o AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM subjects)
    ),
    l AS (
        SELECT 1 AS x FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM o)
    )
    SELECT * FROM (
        SELECT 'customer' AS level,
               (SELECT CAST(count(*) AS BIGINT) FROM subjects)
                   AS n_rows_to_erase,
               (SELECT CAST(count(*) AS BIGINT) FROM o)
                   AS n_orphans_if_not_cascaded
        UNION ALL
        SELECT 'orders',
               (SELECT CAST(count(*) AS BIGINT) FROM o),
               (SELECT CAST(count(*) AS BIGINT) FROM l)
        UNION ALL
        SELECT 'lineitem',
               (SELECT CAST(count(*) AS BIGINT) FROM l),
               CAST(0 AS BIGINT)
    )
    ORDER BY level
    """,
    doc="right-to-erasure blast-radius audit down the "
    "customer->orders->lineitem FK cascade: rows to erase per level "
    "and orphans left if the cascade stops there",
)
def dq_erasure_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join per FK level (left_semi — never materializes the
    victim rows), one count per level. The orphan column at level k
    is exactly level k+1's blast radius — the invariant a correct
    cascade must satisfy, which makes this audit self-checking."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    h = hash60_expr("c_custkey || '#gdpr'")
    subjects = cust.filter(F.expr(f"{h} % {GDPR_MOD} = 0")).select(
        "c_custkey"
    )
    o = orders.join(
        subjects, orders.o_custkey == subjects.c_custkey, "left_semi"
    ).select("o_orderkey")
    l = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
    nc = subjects.agg(F.count("*").cast("bigint").alias("nc"))
    no = o.agg(F.count("*").cast("bigint").alias("no"))
    nl = l.agg(F.count("*").cast("bigint").alias("nl"))
    base = nc.crossJoin(no).crossJoin(nl)
    rows = base.selectExpr(
        "'customer' AS level",
        "nc AS n_rows_to_erase",
        "no AS n_orphans_if_not_cascaded",
    ).unionAll(
        base.selectExpr(
            "'orders' AS level", "no", "nl"
        )
    ).unionAll(
        base.selectExpr(
            "'lineitem' AS level", "nl", "CAST(0 AS BIGINT)"
        )
    )
    return rows.orderBy("level")
