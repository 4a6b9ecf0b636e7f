"""Complex event processing: MATCH_RECOGNIZE-style row-pattern
detection over per-user event series — the Flink CEP capability
(the reference's Flink section is the DataStream API this library
sits on) re-expressed as lag-window predicates.

Neither Spark nor DuckDB ships MATCH_RECOGNIZE; the standard
workaround for fixed-length patterns is a lag-window conjunction:
a length-5 "V" (two strict drops then two strict rises in the event
value) is lag4>lag3>lag2 AND lag2<lag1<lag0 evaluated at the
pattern's last row. That compiles to ONE pass over each user's
series — the same per-key-bounded window state as sessionization —
and generalizes to any fixed-length regex-over-rows by adding lag
terms. (Unbounded patterns need the stateful-streaming operators;
ST4 covers that side.)

Output: per event type, how many V-occurrences and how many distinct
users exhibit one — the CEP alert-volume readout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

_PATTERN = (
    "l4 IS NOT NULL AND l4 > l3 AND l3 > l2 AND l2 < l1 AND l1 < l0"
)


@register(
    "cep_vshape_patterns",
    f"""
    WITH s AS (
        SELECT user_id, event_type, ts, event_id,
               value AS l0,
               lag(value, 1) OVER w AS l1,
               lag(value, 2) OVER w AS l2,
               lag(value, 3) OVER w AS l3,
               lag(value, 4) OVER w AS l4
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s
    WHERE {_PATTERN}
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="CEP row-pattern detection (Flink-CEP analogue): length-5 "
    "V-shape (strict down-down-up-up) in each user's value series "
    "via lag-window conjunction; match counts per closing event type",
)
def cep_vshape_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE emulation for fixed-length patterns: five lag
    columns, one conjunction, evaluated at the pattern's last row.
    Window state is one user's series (per-key bounded); the pattern
    predicate is pure codegen. Strict inequalities on IEEE doubles
    compare identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.col("value").alias("l0"),
        F.lag("value", 1).over(w).alias("l1"),
        F.lag("value", 2).over(w).alias("l2"),
        F.lag("value", 3).over(w).alias("l3"),
        F.lag("value", 4).over(w).alias("l4"),
    )
    return (
        s.filter(_PATTERN)
        .groupBy("event_type")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_matches"),
            F.expr("CAST(count(DISTINCT user_id) AS BIGINT)").alias(
                "n_users"
            ),
        )
        .orderBy("event_type")
    )
