"""Business-calendar arithmetic: exact business-day (Mon-Fri) waits
between order placement and line-item shipment, per order priority.

SLA reporting ("how many WORKING days late") needs weekday-aware date
math. The portability trap: Spark's dayofweek() is 1=Sunday while
DuckDB's dayofweek is 0=Sunday — so this operator derives the weekday
from epoch-day arithmetic both engines share exactly:
dow = (datediff(d, 1970-01-01) + 4) mod 7 (1970-01-01 was a Thursday;
0=Sunday). Business days between a and b (exclusive of a, inclusive
of b) then follow from whole weeks x 5 plus a remainder scan
expressed in closed form — pure integers end to end.

Scale: stateless row math inside codegen + one groupBy(ship mode);
the formula evaluates in one pass with no calendar table join (a
holiday calendar would add one small broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

# closed-form business days in (a, b]: full weeks give 5 each; the
# partial week contributes the number of weekdays in the dow-window.
# bd(a, b) = 5 * ((db - da) div 7) + wd[dow_a][(db - da) % 7], with
# wd precomputed as a CASE ladder over (dow_a, rem).


def _bd_expr(da: str, db: str, div: str) -> str:
    """Business days in ({da}, {db}] as a SQL expression over epoch-day
    integers; identical text modulo the integer-division token."""
    diff = f"({db} - {da})"
    dow_a = f"(({da} + 4) % 7)"
    # weekdays among the rem days following a: days dow_a+1 .. dow_a+rem
    # counted via: for k in 1..rem, 1 if (dow_a + k) % 7 not in (0, 6)
    terms = " + ".join(
        f"(CASE WHEN {k} <= ({diff} % 7) AND (({dow_a} + {k}) % 7)"
        f" NOT IN (0, 6) THEN 1 ELSE 0 END)"
        for k in range(1, 7)
    )
    return f"(5 * ({diff}{div}7) + {terms})"


_DA_DUCK = "date_diff('day', DATE '1970-01-01', o_orderdate)"
_DB_DUCK = "date_diff('day', DATE '1970-01-01', l_shipdate)"
_DA_SPARK = "datediff(o_orderdate, DATE '1970-01-01')"
_DB_SPARK = "datediff(l_shipdate, DATE '1970-01-01')"


@register(
    "cal_business_day_wait",
    f"""
    WITH w AS (
        SELECT o.o_orderpriority AS priority,
               {_bd_expr(_DA_DUCK, _DB_DUCK, " // ")} AS bd
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(bd) AS BIGINT) AS total_business_days,
           CAST(sum(bd) * 1000 // count(*) AS BIGINT)
               AS avg_business_days_milli,
           CAST(max(bd) AS BIGINT) AS max_business_days
    FROM w
    GROUP BY priority
    ORDER BY priority
    """,
    doc="business-day (Mon-Fri) wait between order date and ship date "
    "per order priority — closed-form weekday arithmetic on epoch days "
    "(engine-portable dow, no calendar join), exact milli-day average",
)
def cal_business_day_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-aware SLA wait, fully in codegen: epoch-day dow
    normalization sidesteps the engines' dayofweek() numbering
    mismatch, and the whole-weeks + remainder-window closed form
    avoids any generate/explode over the date range — O(1) per row
    at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    bd = _bd_expr(_DA_SPARK, _DB_SPARK, " div ")
    w = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter("l_shipdate >= o_orderdate")
        .selectExpr("o_orderpriority AS priority", f"{bd} AS bd")
    )
    return (
        w.groupBy("priority")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_items"),
            F.expr("CAST(sum(bd) AS BIGINT)").alias("total_business_days"),
            F.expr(
                "CAST(sum(bd) * 1000 div count(*) AS BIGINT)"
            ).alias("avg_business_days_milli"),
            F.expr("CAST(max(bd) AS BIGINT)").alias("max_business_days"),
        )
        .orderBy("priority")
    )
