"""Capture-recapture population estimation (Lincoln-Petersen and the
bias-corrected Chapman form) — the sampling-theory member of the
distinct-count family.

HLL / KMV / linear counting estimate cardinality from hashes of
EVERY row; capture-recapture estimates it from two SMALL independent
samples and their overlap — the method of choice when you can only
afford to inspect samples (mark-recapture surveys, dedup-rate spot
checks, web-scale coverage audits). Two independent hash "captures"
of the user population are drawn (different salts), and
N-hat = n1*n2/m; Chapman's (n1+1)(n2+1)/(m+1) - 1 corrects the
small-m bias. Exact integer floors; the truth column exists because
the fixture is small.

Scale: two pushed-down hash predicates + one distinct-intersection
count — no global state beyond three scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

CAP_MOD = 3  # each capture marks ~1/3 of the population


@register(
    "apx_capture_recapture",
    f"""
    WITH u AS (
        SELECT DISTINCT user_id FROM events
    ),
    marks AS (
        SELECT user_id,
               CASE WHEN {sql_hash60("user_id || '#cap1'")} % {CAP_MOD} = 0
                    THEN 1 ELSE 0 END AS s1,
               CASE WHEN {sql_hash60("user_id || '#cap2'")} % {CAP_MOD} = 0
                    THEN 1 ELSE 0 END AS s2
        FROM u
    ),
    s AS (
        SELECT CAST(sum(s1) AS BIGINT) AS n1,
               CAST(sum(s2) AS BIGINT) AS n2,
               CAST(sum(s1 * s2) AS BIGINT) AS m,
               CAST(count(*) AS BIGINT) AS true_n
        FROM marks
    )
    SELECT n1, n2, m, true_n,
           CAST(n1 * n2 // greatest(m, 1) AS BIGINT) AS lincoln_est,
           CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT)
               AS chapman_est,
           CAST(((n1 + 1) * (n2 + 1) // (m + 1) - 1 - true_n) * 1000
                // true_n AS BIGINT) AS chapman_err_permille
    FROM s
    """,
    doc="capture-recapture distinct-user estimate: two independent "
    "1-in-3 hash captures, Lincoln-Petersen and Chapman estimators "
    "vs truth, exact integer floors",
)
def apx_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mark twice, count the overlap, invert the hypergeometric:
    the estimator that needs only sample-sized state. Hash captures
    are independent (different salts), so E[m] = n1*n2/N holds by
    construction — the fixture's truth column verifies the machinery,
    not the statistics."""
    ev = load_table(spark, sf_dir, "events")
    h1 = hash60_expr("user_id || '#cap1'")
    h2 = hash60_expr("user_id || '#cap2'")
    marks = (
        ev.select("user_id")
        .distinct()
        .selectExpr(
            f"CASE WHEN {h1} % {CAP_MOD} = 0 THEN 1 ELSE 0 END AS s1",
            f"CASE WHEN {h2} % {CAP_MOD} = 0 THEN 1 ELSE 0 END AS s2",
        )
    )
    return marks.agg(
        F.expr("CAST(sum(s1) AS BIGINT)").alias("n1"),
        F.expr("CAST(sum(s2) AS BIGINT)").alias("n2"),
        F.expr("CAST(sum(s1 * s2) AS BIGINT)").alias("m"),
        F.expr("CAST(count(*) AS BIGINT)").alias("true_n"),
    ).selectExpr(
        "n1",
        "n2",
        "m",
        "true_n",
        "CAST(n1 * n2 div greatest(m, 1) AS BIGINT) AS lincoln_est",
        "CAST((n1 + 1) * (n2 + 1) div (m + 1) - 1 AS BIGINT)"
        " AS chapman_est",
        "CAST(((n1 + 1) * (n2 + 1) div (m + 1) - 1 - true_n) * 1000"
        " div true_n AS BIGINT) AS chapman_err_permille",
    )
