"""Process mining, trace-variant layer: variant frequencies and the
start/end-activity matrix over session traces.

Complements operators/procmine.py (eventually-follows, transition
waits): those are RELATION-level views; variant analysis is the
TRACE-level view a PM4Py/Celonis user reads first — "what are the most
common end-to-end paths, and where do cases start and finish". A case
here is a (user, day) session; its trace is the event-type sequence
under the total order (ts, event_id).

Scale notes: one shuffle groups events into cases (traces are bounded
by per-session activity, never corpus size); variant counting is a
second map-side-combinable aggregate on the variant string. No
event-level self-join, no window over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

_DAY_S = "unix_micros(ts) div 86400000000"
_DAY_D = "epoch_us(ts) // 86400000000"

_TOP_VARIANTS = 20

_SQL_TRACES = f"""
    traces AS (
        SELECT user_id, {_DAY_D} AS day,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS variant,
               CAST(count(*) AS BIGINT) AS n_steps
        FROM events GROUP BY 1, 2
    )
"""


def _traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ordered = F.transform(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ),
        lambda s: s["event_type"],
    )
    return ev.groupBy("user_id", F.expr(_DAY_S).alias("day")).agg(
        F.concat_ws(">", ordered).alias("variant"),
        F.count("*").alias("n_steps"),
    )


@register(
    "pm_variant_frequency",
    f"""
    WITH {_SQL_TRACES},
    counted AS (
        SELECT variant, max(n_steps) AS n_steps,
               CAST(count(*) AS BIGINT) AS n_cases
        FROM traces GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM traces)
    SELECT variant, CAST(n_steps AS BIGINT) AS n_steps, n_cases,
           CAST(n_cases * 1000000 // n AS BIGINT) AS share_ppm
    FROM (
        SELECT c.*, row_number() OVER (ORDER BY n_cases DESC, variant) AS rk
        FROM counted c
    ), tot
    WHERE rk <= {_TOP_VARIANTS}
    """,
    doc="top trace variants: most frequent end-to-end event-type paths"
    " per (user, day) case, with exact ppm share",
)
def pm_variant_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The variant explorer: each case's trace collapses to its
    event-type path string (total-order (ts, event_id), so equal
    multisets in different orders are DIFFERENT variants — that is the
    point), then the top-20 by frequency with a lexicographic
    tie-break. Two keyed aggregates; the top-k ranks over distinct
    variants, not cases."""
    traces = _traces(spark, sf_dir)
    counted = traces.groupBy("variant").agg(
        F.max("n_steps").cast("bigint").alias("n_steps"),
        F.count("*").alias("n_cases"),
    )
    tot = traces.agg(F.count("*").alias("n"))
    wr = Window.orderBy(F.desc("n_cases"), F.asc("variant"))
    return (
        counted.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _TOP_VARIANTS)
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "variant",
            "n_steps",
            "n_cases",
            "CAST(n_cases * 1000000 div n AS BIGINT) AS share_ppm",
        )
    )


@register(
    "pm_start_end_activities",
    f"""
    WITH t AS (
        SELECT user_id, {_DAY_D} AS day, event_type,
               row_number() OVER (PARTITION BY user_id, {_DAY_D}
                                  ORDER BY ts, event_id) AS ra,
               row_number() OVER (PARTITION BY user_id, {_DAY_D}
                                  ORDER BY ts DESC, event_id DESC) AS rd
        FROM events
    ),
    ends AS (
        SELECT user_id, day,
               max(CASE WHEN ra = 1 THEN event_type END) AS start_act,
               max(CASE WHEN rd = 1 THEN event_type END) AS end_act
        FROM t GROUP BY 1, 2
    )
    SELECT start_act, end_act, CAST(count(*) AS BIGINT) AS n_cases
    FROM ends GROUP BY 1, 2
    """,
    doc="start/end-activity matrix: where cases begin and finish,"
    " exact counts per activity pair",
)
def pm_start_end_activities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformance's first sanity check: the distribution of (first
    activity, last activity) per case. First/last are row_number under
    the total order (min_by/arg_min tie-break arbitrarily); the matrix
    is |activities|² rows regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr(_DAY_S)
    wa = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", day).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    t = ev.select(
        "user_id",
        day.alias("day"),
        "event_type",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    ends = t.groupBy("user_id", "day").agg(
        F.max(F.when(F.col("ra") == 1, F.col("event_type"))).alias(
            "start_act"
        ),
        F.max(F.when(F.col("rd") == 1, F.col("event_type"))).alias("end_act"),
    )
    return ends.groupBy("start_act", "end_act").agg(
        F.count("*").alias("n_cases")
    )
