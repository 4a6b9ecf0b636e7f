"""Sequential probability ratio test (Wald's SPRT) — anytime-valid
experimentation accounting: the cumulative log-likelihood-ratio trace
that lets an experiment STOP the day the evidence crosses a boundary
instead of waiting for a fixed horizon.

Testing H0: conversion = P0 vs H1: conversion = P1 on the daily event
stream, the Bernoulli LLR after s successes and f failures is
s*ln(P1/P0) + f*ln((1-P1)/(1-P0)); Wald's boundaries for
alpha = beta = 0.05 are ln 19 and -ln 19. Everything is carried in
16*log2 fixed-point units from the repo's kernel — with P1/P0 = 11/9
and (1-P1)/(1-P0) = 78/82 the trace is

    llr16(day) = s * log2fp16(11, 9) - f * log2fp16(82, 78)

an exact integer both engines agree on, and the decision column
compares it against +/- log2fp16(19, 1). Output: one row per day of
the experiment with the cumulative counts, the trace value, and the
decision in force (continue / accept_h1 / accept_h0).

Scale: one scan to daily (trials, successes), a bounded-day window
for the cumulative trace, constants from single-row kernel math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.retrieval import (
    _nest_sql,
    log2_fp16_steps,
)
from big_data_training_spark.registry import register

# H0: 18% purchase share, H1: 22% — ratios chosen so the kernel
# arguments are small exact integers.
_LR_S = ("11", "9")  # P1/P0 = 0.22/0.18
_LR_F = ("82", "78")  # (1-P0)/(1-P1), subtracted
_BOUND = ("19", "1")  # (1-beta)/alpha at alpha = beta = 0.05


def _const_steps(div: str) -> list[tuple[str, str]]:
    return (
        log2_fp16_steps(_LR_S[0], _LR_S[1], "w_s", div, pfx="cs")
        + log2_fp16_steps(_LR_F[0], _LR_F[1], "w_f", div, pfx="cf")
        + log2_fp16_steps(_BOUND[0], _BOUND[1], "bnd", div, pfx="cb")
    )


def _sprt_oracle() -> str:
    consts = _nest_sql("SELECT 1 AS one", _const_steps(" // "))
    return f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(count(*) AS BIGINT) AS trials,
               CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS BIGINT) AS successes
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT day,
               sum(trials) OVER (ORDER BY day) AS n,
               sum(successes) OVER (ORDER BY day) AS s
        FROM daily
    ),
    consts AS ({consts})
    SELECT day,
           CAST(n AS BIGINT) AS cum_trials,
           CAST(s AS BIGINT) AS cum_successes,
           CAST(s * w_s - (n - s) * w_f AS BIGINT) AS llr16,
           CASE WHEN s * w_s - (n - s) * w_f >= bnd THEN 'accept_h1'
                WHEN s * w_s - (n - s) * w_f <= -bnd THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum CROSS JOIN consts
    ORDER BY day
    """


@register(
    "ab_sprt_sequential",
    _sprt_oracle(),
    doc="Wald SPRT trace: daily cumulative Bernoulli log-likelihood "
    "ratio (purchase share, H0 18% vs H1 22%) in exact 16*log2 fixed "
    "point with +/- ln19 boundaries — the anytime-valid stop signal",
)
def ab_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sequential-testing ledger: every day's row shows where the
    evidence stands and whether the experiment may stop. All three
    constants (both LLR weights and the boundary) come from the same
    kernel arithmetic as the trace, so the decision column is exact
    integer comparisons end to end."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("trials"),
        F.expr(
            "CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)"
            " AS BIGINT)"
        ).alias("successes"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.sum("trials").over(w).alias("n"),
        F.sum("successes").over(w).alias("s"),
    )
    consts = cum.sparkSession.range(1).selectExpr("1 AS one")
    for name, expr in _const_steps(" div "):
        consts = consts.selectExpr("*", f"{expr} AS {name}")
    consts = consts.select("w_s", "w_f", "bnd")
    return (
        cum.crossJoin(F.broadcast(consts))
        .selectExpr(
            "day",
            "CAST(n AS BIGINT) AS cum_trials",
            "CAST(s AS BIGINT) AS cum_successes",
            "CAST(s * w_s - (n - s) * w_f AS BIGINT) AS llr16",
            "CASE WHEN s * w_s - (n - s) * w_f >= bnd THEN 'accept_h1'"
            " WHEN s * w_s - (n - s) * w_f <= -bnd THEN 'accept_h0'"
            " ELSE 'continue' END AS decision",
        )
        .orderBy("day")
    )
