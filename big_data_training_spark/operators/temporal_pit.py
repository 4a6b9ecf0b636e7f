"""Point-in-time-correct enrichment: the union-window as-of join.

Feature stores and training-data pipelines live or die on PIT
correctness — a fact row must see the dimension version that was
valid AT ITS TIMESTAMP, never a later one (that is label leakage).
The SCD2 ranges exist (operators/cdc.py cdc_scd2_history); the naive
PIT join is fact.ts BETWEEN valid_from AND valid_to — a range join
whose intermediate explodes on hot keys (the existing as-of operators,
j_asof_join etc., bound it with a horizon + rank).

This module implements the as-of join the way a columnar engine
actually should at 100 TB: **no join at all**. Union the dimension
changelog and the facts into one stream tagged by kind, shuffle ONCE
by key, sort by (ts, kind, id) within key, and carry the last non-null
dimension state forward with a running last_value window — every fact
row picks up exactly the state whose validity interval covers it, in
O(n log n) per key with zero pair blowup, hot keys included. The
window frame is explicit ROWS UNBOUNDED PRECEDING..CURRENT ROW so
both engines walk the identical order (ties broken by kind: a state
change at exactly the fact's timestamp applies to it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

_STATUS_TYPES = ("signup", "error")  # the dimension-changing events
_FACT_TYPE = "purchase"


@register(
    "j_pit_union_asof",
    f"""
    WITH tagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = '{_FACT_TYPE}' THEN 1 ELSE 0 END
                   AS is_fact,
               CASE WHEN event_type = '{_FACT_TYPE}' THEN NULL
                    ELSE event_type END AS status,
               CASE WHEN event_type = '{_FACT_TYPE}'
                    THEN CAST(floor(value * 100) AS BIGINT)
                    ELSE NULL END AS cents
        FROM events
        WHERE event_type IN ('{_FACT_TYPE}',
                             {", ".join(f"'{t}'" for t in _STATUS_TYPES)})
    ), carried AS (
        SELECT *,
               last_value(status IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, is_fact, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS status_asof
        FROM tagged
    )
    SELECT coalesce(status_asof, 'never_set') AS status_at_purchase,
           count(*) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM carried
    WHERE is_fact = 1
    GROUP BY 1
    ORDER BY 1
    """,
    doc="point-in-time as-of enrichment WITHOUT a join: union the"
    " status changelog with purchase facts, one keyed shuffle, carry"
    " the last status forward — PIT-correct revenue by status",
    bench=True,
)
def j_pit_union_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user status was in force when each purchase happened —
    the PIT question — answered with the union-window plan: tag
    status changes (signup/error) and purchase facts, union, ONE
    shuffle by user, running last-non-null status in (ts, kind, id)
    order, aggregate the facts. The physical plan contains NO join
    operator (asserted in tests/test_temporal_pit.py): hot users cost
    a sort, never a pair explosion, which is why this is the 100 TB
    as-of strategy (the bounded range-join variants j_asof_* remain
    for horizon-limited semantics). 'never_set' rows are purchases
    before any status event — the leakage-free answer, where a
    range join would silently drop or a backward-unbounded join
    would peek forward."""
    events = load_table(spark, sf_dir, "events")
    kinds = [_FACT_TYPE, *_STATUS_TYPES]
    tagged = events.filter(F.col("event_type").isin(kinds)).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == _FACT_TYPE).cast("int").alias("is_fact"),
        F.when(F.col("event_type") == _FACT_TYPE, None)
        .otherwise(F.col("event_type"))
        .alias("status"),
        F.when(
            F.col("event_type") == _FACT_TYPE,
            F.expr("CAST(floor(value * 100) AS BIGINT)"),
        ).alias("cents"),
    )
    carried = tagged.selectExpr(
        "*",
        "last_value(status) IGNORE NULLS OVER ("
        " PARTITION BY user_id ORDER BY ts, is_fact, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS status_asof",
    )
    return (
        carried.filter(F.col("is_fact") == 1)
        .groupBy(
            F.coalesce("status_asof", F.lit("never_set")).alias(
                "status_at_purchase"
            )
        )
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("status_at_purchase")
    )
