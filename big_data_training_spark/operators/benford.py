"""Benford first-digit audit — the classic fraud/data-quality test:
does the leading-digit distribution of a monetary column follow
log10(1 + 1/d)?

The dq_* family checks constraints, freshness, outliers and drift;
Benford adds the forensic-accounting screen auditors actually run on
financial facts. The expected frequencies are logarithms, so they come
from the repo's fixed-point log2 kernel: weight w_d = 16*log2((d+1)/d)
normalized by W = sum_d w_d (the quantized weights' own total, so the
expected shares partition 1 exactly up to floor-ppm) — a DEFINED
rational both engines compute identically (within 1/16-bit per digit
of the real Benford law, which is noted, not hidden). The deviation
statistic is the chi-square form with every division deferred:
per digit (W*obs_d - n*w_d)^2 // (W*n*w_d) scaled to ppm — exact
BIGINT throughout.

Scale: one scan -> 9-row digit histogram; everything after runs on
those 9 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.retrieval import (
    _nest_sql,
    log2_fp16_steps,
)
from big_data_training_spark.registry import register


def _apply_steps(df: DataFrame, steps: list[tuple[str, str]]) -> DataFrame:
    for name, expr in steps:
        df = df.selectExpr("*", f"{expr} AS {name}")
    return df


def _benford_oracle() -> str:
    w_steps = _nest_sql(
        "SELECT digit, obs, n FROM j",
        log2_fp16_steps("digit + 1", "digit", "w", " // "),
    )
    return f"""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders
        WHERE o_totalprice >= 1
    ),
    h AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS obs FROM d GROUP BY 1
    ),
    spine AS (SELECT unnest(range(1, 10)) AS digit),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM h),
    j AS (
        SELECT s.digit AS digit, coalesce(h.obs, 0) AS obs, n.n AS n
        FROM spine s LEFT JOIN h ON h.digit = s.digit CROSS JOIN n
    ),
    w AS ({w_steps}),
    ws AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM w)
    SELECT digit, obs,
           CAST(obs * 1000000 // n AS BIGINT) AS obs_ppm,
           CAST(w * 1000000 // wsum AS BIGINT) AS benford_ppm,
           CAST((wsum * obs - n * w) * (wsum * obs - n * w) * 1000
                // (wsum * n * w) AS BIGINT) AS chi2_term_milli
    FROM w CROSS JOIN ws
    ORDER BY digit
    """


@register(
    "dq_benford_deviation",
    _benford_oracle(),
    doc="Benford first-digit audit of order totals: observed vs "
    "fixed-point-log expected share per digit 1-9 with exact "
    "chi-square deviation terms (x1000)",
)
def dq_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading digit of floor(o_totalprice) vs Benford's law. Expected
    weights are the 1/16-bit kernel's 16*log2((d+1)/d) over their own
    quantized total, so the reference distribution is engine-identical; the
    per-digit chi-square term keeps all divisions last. TPC-H prices
    are uniform-ish, so large deviations here are EXPECTED — the
    operator's job is the exact statistic, which a fraud screen
    thresholds. The squared term caps the exact range at ~2e9 rows
    per audit scope — audit per (month, region) strata beyond that."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.filter("o_totalprice >= 1").selectExpr(
        "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)"
        " AS STRING), 1, 1) AS BIGINT) AS digit"
    )
    h = d.groupBy("digit").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("obs")
    )
    n = h.agg(F.expr("CAST(sum(obs) AS BIGINT)").alias("n"))
    spine = spark.range(1, 10).selectExpr("CAST(id AS BIGINT) AS digit")
    j = (
        spine.join(h, "digit", "left")
        .selectExpr("digit", "CAST(coalesce(obs, 0) AS BIGINT) AS obs")
        .crossJoin(F.broadcast(n))
    )
    w = _apply_steps(
        j, log2_fp16_steps("digit + 1", "digit", "w", " div ")
    )
    ws = w.agg(F.expr("CAST(sum(w) AS BIGINT)").alias("wsum"))
    return w.crossJoin(F.broadcast(ws)).selectExpr(
        "digit",
        "obs",
        "CAST(obs * 1000000 div n AS BIGINT) AS obs_ppm",
        "CAST(w * 1000000 div wsum AS BIGINT) AS benford_ppm",
        "CAST((wsum * obs - n * w) * (wsum * obs - n * w) * 1000"
        " div (wsum * n * w) AS BIGINT) AS chi2_term_milli",
    ).orderBy("digit")
