"""Distribution-free ECDF confidence band (Dvoretzky-Kiefer-Wolfowitz):
the empirical CDF of the event value with a uniform 95% band
eps = sqrt(ln(2/alpha) / (2n)) — true for ANY distribution, which is
what makes it the drift-monitoring primitive you can deploy without
assumptions.

Kernel composition: ln(2/alpha) = ln 40 comes from the 1/16-bit log2
kernel (ln = log2 * ln 2); the square root from the integer Newton
isqrt kernel; the band is eps_ppm = isqrt(ln40_micro * 1e6 // (2n)).
The ECDF itself is the bounded-bucket cumulative table (integer
floor(value) buckets), so the whole artifact — curve plus band — is
a few hundred exact BIGINT rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.aqp import isqrt_steps
from big_data_training_spark.extensions.retrieval import (
    _nest_sql,
    log2_fp16_steps,
)
from big_data_training_spark.registry import register

_LN2_MICRO = 693147
# alpha = 0.05 -> ln(2/alpha) = ln 40


def _band_oracle() -> str:
    steps = (
        log2_fp16_steps("40", "1", "l240", " // ")
        + [("ln40_micro", f"l240 * {_LN2_MICRO} // 16"),
           ("earg", "ln40_micro * 1000000 // (2 * n)")]
        + isqrt_steps("earg", "eps_ppm", " // ", pfx="q")
    )
    eps = _nest_sql("SELECT n FROM tot", steps)
    return f"""
    WITH b AS (
        SELECT CAST(floor(value) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM b),
    eps AS (SELECT n, eps_ppm FROM ({eps})),
    c AS (
        SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM b
    )
    SELECT v AS value_floor,
           CAST(cum * 1000000 // n AS BIGINT) AS ecdf_ppm,
           CAST(greatest(cum * 1000000 // n - eps_ppm, 0) AS BIGINT)
               AS lower_ppm,
           CAST(least(cum * 1000000 // n + eps_ppm, 1000000) AS BIGINT)
               AS upper_ppm
    FROM c CROSS JOIN eps
    ORDER BY value_floor
    """


@register(
    "apx_ecdf_dkw_band",
    _band_oracle(),
    doc="DKW 95% confidence band around the event-value ECDF: "
    "bounded-bucket cumulative curve, eps = sqrt(ln 40 / 2n) via the "
    "log2 + isqrt kernels, all exact ppm integers",
)
def apx_ecdf_dkw_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sup_x |F_n(x) - F(x)| <= eps holds with 95% probability for
    any F — so two runs whose bands don't overlap HAVE drifted, no
    parametric assumptions. One scan to the bucket table, one bounded
    window, kernel math on a single row."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.selectExpr("CAST(floor(value) AS BIGINT) AS v").groupBy(
        "v"
    ).agg(F.expr("CAST(count(*) AS BIGINT)").alias("cnt"))
    tot = b.agg(F.expr("CAST(sum(cnt) AS BIGINT)").alias("n"))
    steps = (
        log2_fp16_steps("40", "1", "l240", " div ")
        + [("ln40_micro", f"l240 * {_LN2_MICRO} div 16"),
           ("earg", "ln40_micro * 1000000 div (2 * n)")]
        + isqrt_steps("earg", "eps_ppm", " div ", pfx="q")
    )
    eps = tot
    for name, expr in steps:
        eps = eps.selectExpr("*", f"{expr} AS {name}")
    eps = eps.select("n", "eps_ppm")
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = b.withColumn("cum", F.sum("cnt").over(w))
    return (
        c.crossJoin(F.broadcast(eps))
        .selectExpr(
            "v AS value_floor",
            "CAST(cum * 1000000 div n AS BIGINT) AS ecdf_ppm",
            "CAST(greatest(cum * 1000000 div n - eps_ppm, 0) AS BIGINT)"
            " AS lower_ppm",
            "CAST(least(cum * 1000000 div n + eps_ppm, 1000000)"
            " AS BIGINT) AS upper_ppm",
        )
        .orderBy("value_floor")
    )
