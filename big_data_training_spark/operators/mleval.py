"""Classifier-evaluation operators: exact ROC-AUC (Mann-Whitney U),
Kolmogorov-Smirnov separation, and a precision/recall curve — the
readouts a training-data pipeline runs after every quality-classifier
retrain (reference pipeline stage "analyze", README.md:18-22; the
model-scoring map itself is T5, flink/README.md:29-62).

Design for 100 TB: naive AUC ranks every row (a global sort). Here the
score is first collapsed to a **bounded-cardinality histogram** —
groupBy(score_bucket) with per-bucket positive/negative counts — and
the rank statistics are recovered exactly from cumulative bucket
counts. The only non-parallel step is a window over the bucket table,
whose row count is bounded by the score domain (<= 49 002 buckets
here) regardless of corpus size — the same bounded-single-task-cumsum
argument as agg_value_histogram. Everything upstream is one
map-side-combinable shuffle.

Exactness: ties are handled by the trapezoid/midrank correction in
integer form — 2U = sum_s pos_s * (2*neg_below_s + neg_s) — so AUC,
KS and precision/recall are exact rationals reported as floor-divided
ppm; both engines compute the identical integers (Spark ``div`` ==
DuckDB ``//`` on nonneg BIGINT). floor(value*100) is an IEEE-binary64
product + floor, bit-identical across engines (cast-after-floor per
the repo's CAST-rounds-vs-truncates rule).

Overflow note: 2U <= 2*n_pos*n_neg fits BIGINT up to ~2.1e9 rows per
class; beyond that run the same query per time-stratum and average
(the histogram shape is unchanged), or widen the ppm division to
DECIMAL — noted rather than implemented since the engine targets
per-partition-bounded intermediates first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

# purchase-vs-view separated by the event value: the binary task every
# conversion model is evaluated on.
_POS, _NEG = "purchase", "view"


def _bucket_counts(spark: SparkSession, sf_dir: str, scale: int) -> DataFrame:
    """(s, p, g): positive/negative counts per quantized score bucket.
    One shuffle; output cardinality bounded by the score domain."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin(_POS, _NEG))
        .selectExpr(
            f"CAST(floor(value * {scale}) AS BIGINT) AS s",
            f"CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END AS pos",
        )
        .groupBy("s")
        .agg(
            F.expr("CAST(sum(pos) AS BIGINT)").alias("p"),
            F.expr("CAST(count(*) - sum(pos) AS BIGINT)").alias("g"),
        )
    )


def _bucket_sql(scale: int) -> str:
    return f"""
    ev AS (
        SELECT CAST(floor(value * {scale}) AS BIGINT) AS s,
               CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END AS pos
        FROM events WHERE event_type IN ('{_POS}', '{_NEG}')
    ),
    b AS (
        SELECT s, CAST(sum(pos) AS BIGINT) AS p,
               CAST(count(*) - sum(pos) AS BIGINT) AS g
        FROM ev GROUP BY 1
    )
    """


@register(
    "ev_auc_mannwhitney",
    f"""
    WITH {_bucket_sql(100)},
    c AS (
        SELECT s, p, g,
               coalesce(sum(g) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS gb
        FROM b
    ),
    t AS (
        SELECT CAST(sum(p) AS BIGINT) AS np, CAST(sum(g) AS BIGINT) AS ng,
               CAST(sum(p * (2 * gb + g)) AS BIGINT) AS u2
        FROM c
    )
    SELECT np AS n_pos, ng AS n_neg, u2 AS u_times2,
           CAST(u2 * 1000000 // (2 * np * ng) AS BIGINT) AS auc_ppm
    FROM t
    """,
    doc="exact tie-corrected ROC-AUC (Mann-Whitney U) of event value "
    "separating purchase from view, via a bounded score histogram — "
    "no global rank of raw rows",
)
def ev_auc_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC = P(score_pos > score_neg) + 0.5*P(tie), computed exactly
    from per-bucket counts: 2U = sum_s p_s*(2*negs_below + g_s). The
    raw rows are never ranked — only the bounded bucket table passes
    through the (single-task, bounded) cumulative window."""
    b = _bucket_counts(spark, sf_dir, 100)
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    c = b.withColumn("gb", F.coalesce(F.sum("g").over(w), F.lit(0)))
    return c.agg(
        F.expr("CAST(sum(p) AS BIGINT)").alias("np"),
        F.expr("CAST(sum(g) AS BIGINT)").alias("ng"),
        F.expr("CAST(sum(p * (2 * gb + g)) AS BIGINT)").alias("u2"),
    ).selectExpr(
        "np AS n_pos",
        "ng AS n_neg",
        "u2 AS u_times2",
        "CAST(u2 * 1000000 div (2 * np * ng) AS BIGINT) AS auc_ppm",
    )


@register(
    "ev_ks_statistic",
    f"""
    WITH {_bucket_sql(100)},
    t AS (SELECT CAST(sum(p) AS BIGINT) AS np, CAST(sum(g) AS BIGINT) AS ng
          FROM b),
    c AS (
        SELECT s,
               sum(p) OVER (ORDER BY s) AS cp,
               sum(g) OVER (ORDER BY s) AS cg
        FROM b
    )
    SELECT np AS n_pos, ng AS n_neg,
           CAST(max(abs(cp * ng - cg * np)) AS BIGINT) AS ks_num,
           CAST(max(abs(cp * ng - cg * np)) * 1000000 // (np * ng)
                AS BIGINT) AS ks_ppm
    FROM c CROSS JOIN t
    GROUP BY np, ng
    """,
    doc="exact Kolmogorov-Smirnov separation of the purchase vs view "
    "score distributions: max CDF gap over bucket thresholds, in ppm",
)
def ev_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS = max_t |F_pos(t) - F_neg(t)|, exact via cross-multiplied
    cumulative bucket counts (no division until the final ppm floor).
    Same bounded-histogram shape as the AUC: the window runs over
    score buckets, never raw events."""
    b = _bucket_counts(spark, sf_dir, 100)
    t = b.agg(
        F.expr("CAST(sum(p) AS BIGINT)").alias("np"),
        F.expr("CAST(sum(g) AS BIGINT)").alias("ng"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    c = (
        b.withColumn("cp", F.sum("p").over(w))
        .withColumn("cg", F.sum("g").over(w))
        .crossJoin(F.broadcast(t))
    )
    return c.groupBy("np", "ng").agg(
        F.expr("CAST(max(abs(cp * ng - cg * np)) AS BIGINT)").alias(
            "ks_num"
        ),
        F.expr(
            "CAST(max(abs(cp * ng - cg * np)) * 1000000 div (np * ng)"
            " AS BIGINT)"
        ).alias("ks_ppm"),
    ).selectExpr(
        "np AS n_pos", "ng AS n_neg", "ks_num", "ks_ppm"
    )


@register(
    "ev_pr_curve",
    f"""
    WITH {_bucket_sql(1)},
    t AS (SELECT CAST(sum(p) AS BIGINT) AS np FROM b),
    c AS (
        SELECT s,
               sum(p) OVER (ORDER BY s DESC) AS tp,
               sum(g) OVER (ORDER BY s DESC) AS fp
        FROM b
    )
    SELECT s AS score_floor,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_ppm,
           CAST(tp * 1000000 // np AS BIGINT) AS recall_ppm
    FROM c CROSS JOIN t
    ORDER BY s DESC
    """,
    doc="precision/recall operating curve for 'flag purchases by high "
    "value': cumulative TP/FP per descending integer score threshold",
)
def ev_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep the decision threshold down the (coarse, bounded) score
    histogram; at each bucket report exact cumulative TP/FP and
    floor-ppm precision and recall. The curve a curation gate is tuned
    on — computed from the same one-shuffle histogram as the AUC."""
    b = _bucket_counts(spark, sf_dir, 1)
    t = b.agg(F.expr("CAST(sum(p) AS BIGINT)").alias("np"))
    w = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        b.withColumn("tp", F.sum("p").over(w))
        .withColumn("fp", F.sum("g").over(w))
        .crossJoin(F.broadcast(t))
        .selectExpr(
            "s AS score_floor",
            "CAST(tp AS BIGINT) AS tp",
            "CAST(fp AS BIGINT) AS fp",
            "CAST(tp * 1000000 div (tp + fp) AS BIGINT) AS precision_ppm",
            "CAST(tp * 1000000 div np AS BIGINT) AS recall_ppm",
        )
        .orderBy(F.desc("score_floor"))
    )
