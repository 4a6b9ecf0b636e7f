"""Robust aggregation: winsorized statistics, integer-exact.

Raw means over operational measures are hostage to their tails; a
monitoring layer that alerts on mean shifts needs the winsorized mean
(clamp to [p05, p95], then average) next to the raw one, plus how much
the tails were actually moving it. Extends the robust toolkit
(ev_anomaly_mad's MAD, ev_trend_theil_sen's median slope) to the
plain "what's the typical value" question.

Exactness: the clamp bounds come from percentile_disc (picks real
elements — engine-portable, unlike interpolated quantiles), values
are integer cents, and both means are exact micro-units
(sum·10^6 div n). Scale: one per-key percentile pass (per-group sort,
or approx_percentile at 100 TB — same shape) and one clamped
re-aggregate; the winsorize itself is a projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

W_LO, W_HI = 0.05, 0.95


@register(
    "agg_winsorized_stats",
    f"""
    WITH c AS (
        SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ), bounds AS (
        SELECT event_type,
               percentile_disc({W_LO}) WITHIN GROUP (ORDER BY cents)
                   AS lo,
               percentile_disc({W_HI}) WITHIN GROUP (ORDER BY cents)
                   AS hi
        FROM c GROUP BY 1
    )
    SELECT c.event_type,
           count(*) AS n,
           CAST(min(b.lo) AS BIGINT) AS p05_cents,
           CAST(min(b.hi) AS BIGINT) AS p95_cents,
           CAST(sum(c.cents) * 1000000 // count(*) AS BIGINT)
               AS mean_micro,
           CAST(sum(least(greatest(c.cents, b.lo), b.hi)) * 1000000
                // count(*) AS BIGINT) AS winsorized_mean_micro,
           CAST(sum(CASE WHEN c.cents < b.lo OR c.cents > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
    FROM c JOIN bounds b ON b.event_type = c.event_type
    GROUP BY 1
    ORDER BY 1
    """,
    doc="robust stats: winsorized mean (clamp to [p05, p95]) vs raw"
    " mean per event type, exact integer micro-units",
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tail-proof typical value: per event type, clamp cents to
    the [p05, p95] discrete percentiles and average — reported next
    to the raw mean and the count of clamped rows, so the gap between
    the two means IS the tail influence. percentile_disc selects real
    elements (bit-portable across engines); both means are exact
    integer micro-units. The bounds table is |keys| rows broadcast
    back onto the stream — at 100 TB swap the per-group sort for
    approx_percentile and the query shape is unchanged."""
    c = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    bounds = c.groupBy("event_type").agg(
        F.expr(
            f"CAST(percentile_disc({W_LO}) WITHIN GROUP"
            " (ORDER BY cents) AS BIGINT)"
        ).alias("lo"),
        F.expr(
            f"CAST(percentile_disc({W_HI}) WITHIN GROUP"
            " (ORDER BY cents) AS BIGINT)"
        ).alias("hi"),
    )
    return (
        c.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("lo").cast("bigint").alias("p05_cents"),
            F.min("hi").cast("bigint").alias("p95_cents"),
            F.expr(
                "CAST(sum(cents) * 1000000 div count(*) AS BIGINT)"
            ).alias("mean_micro"),
            F.expr(
                "CAST(sum(least(greatest(cents, lo), hi)) * 1000000"
                " div count(*) AS BIGINT)"
            ).alias("winsorized_mean_micro"),
            F.expr(
                "CAST(sum(CASE WHEN cents < lo OR cents > hi"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_clamped"),
        )
        .orderBy("event_type")
    )


TARGET_FILE_ROWS = 4096  # compaction target, in rows (proxy for 128 MB)
SMALL_FILE_ROWS = 1024   # files at/above this are left alone


@register(
    "s11_compaction_plan",
    f"""
    WITH files AS (
        SELECT l_orderkey // 64 AS file_id, count(*) AS n_rows
        FROM lineitem GROUP BY 1
    ), small AS (
        SELECT file_id, n_rows,
               CAST(sum(n_rows) OVER (ORDER BY n_rows DESC, file_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum
        FROM files WHERE n_rows < {SMALL_FILE_ROWS}
    ), planned AS (
        SELECT file_id, n_rows,
               (cum - 1) // {TARGET_FILE_ROWS} AS target_group
        FROM small
    )
    SELECT target_group,
           count(*) AS n_input_files,
           CAST(sum(n_rows) AS BIGINT) AS group_rows,
           CAST(min(n_rows) AS BIGINT) AS min_file_rows,
           CAST(max(n_rows) AS BIGINT) AS max_file_rows,
           CAST(sum(n_rows) * 1000 // {TARGET_FILE_ROWS} AS BIGINT)
               AS fill_permille
    FROM planned
    GROUP BY 1
    ORDER BY 1
    """,
    doc=f"compaction planner: deterministic size-descending bin packing"
    f" of small files into ~{TARGET_FILE_ROWS}-row merge groups with"
    f" fill-rate audit",
)
def s11_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-file problem, planned before it is paid: simulated
    ingest files below the small-file threshold are packed into merge
    groups by the deterministic next-fit-decreasing rule — sort by
    size descending, running sum, group = (cumsum−1) div target — so
    every group lands within one file of the target and the plan is
    reproducible across runs and engines (no greedy state machine).
    The output is what a compaction service commits as its job list:
    group sizes, member counts, fill rate. One aggregate over file
    stats (the manifest, not the data); the merge jobs themselves
    then each read only their own group — embarrassingly parallel,
    exactly how Iceberg/Delta OPTIMIZE schedules rewrites. Executed
    merge behavior (and its output equivalence) is covered by
    s11_segment_compaction; this is the PLANNING half."""
    files = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.expr("l_orderkey div 64").alias("file_id"))
        .agg(F.count("*").alias("n_rows"))
    )
    small = files.filter(F.col("n_rows") < SMALL_FILE_ROWS).selectExpr(
        "file_id",
        "n_rows",
        "sum(n_rows) OVER (ORDER BY n_rows DESC, file_id"
        " ROWS UNBOUNDED PRECEDING) AS cum",
    )
    planned = small.selectExpr(
        "file_id",
        "n_rows",
        f"(cum - 1) div {TARGET_FILE_ROWS} AS target_group",
    )
    return (
        planned.groupBy("target_group")
        .agg(
            F.count("*").alias("n_input_files"),
            F.sum("n_rows").cast("bigint").alias("group_rows"),
            F.min("n_rows").cast("bigint").alias("min_file_rows"),
            F.max("n_rows").cast("bigint").alias("max_file_rows"),
            F.expr(
                f"CAST(sum(n_rows) * 1000 div {TARGET_FILE_ROWS}"
                " AS BIGINT)"
            ).alias("fill_permille"),
        )
        .orderBy("target_group")
    )
