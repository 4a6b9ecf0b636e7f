"""Privacy mechanisms with reproducible hash-derived randomness:
randomized response and discrete-Laplace-noised counts.

A training-data platform that exports usage statistics needs the two
classic local/central DP mechanisms (Warner 1965 randomized response;
Dwork et al. 2006 Laplace mechanism). Both need coin flips — and this
repo's oracle methodology needs determinism — so the coins come from
the portable 60-bit hash of the unit's key plus a salt: the SAME
device a production pipeline uses for reproducible AB-bucketing. The
docstrings are explicit that a real deployment would swap the salt for
a fresh secret per release; the mechanics (debiasing algebra, noise
shape, composition of the per-key scan) are exactly what runs at
scale, and reproducibility is what makes them testable.

Exactness: the debiased prevalence estimate is an integer rational
((4*n_yes - n) / (2n) for p = 3/4), reported in floor ppm; the
Laplace-tail magnitude uses the repo's 1/16-bit fixed-point log2
kernel (inverse-CDF sampling: |noise| = b * ln(1/u), u uniform from
the hash), so every reported number is the identical BIGINT in Spark
and DuckDB.

Scale: randomized response is one per-user scan + one global count;
the noised histogram touches only the |event_type|-bounded aggregate
table. Nothing here shuffles more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.retrieval import (
    _nest_sql,
    log2_fp16_steps,
)
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

# randomized response: tell the truth with probability RR_NUM/RR_DEN
RR_NUM, RR_DEN = 3, 4  # p = 3/4 -> epsilon = ln(p/(1-p)) = ln 3
_SENS_VALUE = 450.0  # "sensitive" bit: had a high-value error event

LAP_B = 10  # Laplace scale (epsilon = sensitivity/b)
_LAP_M = 1 << 20  # uniform-grain of the hash-derived u
_LN2_MICRO = 693147


def _apply_steps(df: DataFrame, steps: list[tuple[str, str]]) -> DataFrame:
    for name, expr in steps:
        df = df.selectExpr("*", f"{expr} AS {name}")
    return df


@register(
    "dp_randomized_response",
    f"""
    WITH u AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'error' AND value > {_SENS_VALUE}
                        THEN 1 ELSE 0 END) AS truth,
               {sql_hash60("user_id || '#rr'")} % {RR_DEN} AS coin
        FROM events GROUP BY user_id
    ),
    rep AS (
        SELECT user_id, truth,
               CASE WHEN coin < {RR_NUM} THEN truth ELSE 1 - truth END
                   AS reported
        FROM u
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(truth) AS BIGINT) AS n_true_yes,
           CAST(sum(reported) AS BIGINT) AS n_reported_yes,
           CAST(sum(truth) * 1000000 // count(*) AS BIGINT)
               AS true_prevalence_ppm,
           CAST((4 * sum(reported) - count(*)) * 1000000
                // (2 * count(*)) AS BIGINT) AS debiased_ppm
    FROM rep
    """,
    doc=f"Warner randomized response (p={RR_NUM}/{RR_DEN}, eps=ln 3) on"
    f" a per-user sensitive bit, with the exact debiasing estimate"
    f" (obs - (1-p))/(2p-1) in floor ppm, next to the ground truth",
)
def dp_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's sensitive bit (had a high-value error event) passes
    through the RR channel: truth with probability 3/4, flipped
    otherwise, coin = portable hash of the user key (reproducible —
    a deployment salts per release). The analyst never aggregates raw
    bits, only the channel output, and inverts the channel in exact
    integer algebra. One per-user groupBy, one global aggregate."""
    ev = load_table(spark, sf_dir, "events")
    coin = hash60_expr("user_id || '#rr'")
    u = ev.groupBy("user_id").agg(
        F.expr(
            f"max(CASE WHEN event_type = 'error' AND value > {_SENS_VALUE}"
            f" THEN 1 ELSE 0 END)"
        ).alias("truth"),
    ).selectExpr("user_id", "truth", f"{coin} % {RR_DEN} AS coin")
    rep = u.selectExpr(
        "truth",
        f"CASE WHEN coin < {RR_NUM} THEN truth ELSE 1 - truth END"
        " AS reported",
    )
    return rep.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_users"),
        F.expr("CAST(sum(truth) AS BIGINT)").alias("n_true_yes"),
        F.expr("CAST(sum(reported) AS BIGINT)").alias("n_reported_yes"),
        F.expr(
            "CAST(sum(truth) * 1000000 div count(*) AS BIGINT)"
        ).alias("true_prevalence_ppm"),
        F.expr(
            "CAST((4 * sum(reported) - count(*)) * 1000000"
            " div (2 * count(*)) AS BIGINT)"
        ).alias("debiased_ppm"),
    )


def _lap_oracle() -> str:
    steps = log2_fp16_steps(
        f"CAST({_LAP_M} AS BIGINT)", "u1", "nll16", " // "
    )
    nested = _nest_sql(
        "SELECT event_type, n, u1, sgn FROM coins", steps
    )
    return f"""
    WITH agg AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    coins AS (
        SELECT event_type, n,
               ({sql_hash60("event_type || '#lapu'")} % {_LAP_M}) + 1 AS u1,
               CASE WHEN {sql_hash60("event_type || '#laps'")} % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM agg
    ),
    noise AS ({nested})
    SELECT event_type, n AS true_count,
           CAST(sgn * ({LAP_B} * nll16 * {_LN2_MICRO} // 16000000)
                AS BIGINT) AS noise,
           CAST(n + sgn * ({LAP_B} * nll16 * {_LN2_MICRO} // 16000000)
                AS BIGINT) AS noised_count
    FROM noise
    ORDER BY event_type
    """


@register(
    "dp_laplace_noised_counts",
    _lap_oracle(),
    doc=f"Laplace-mechanism histogram (scale b={LAP_B}): per-event-type"
    f" counts plus two-sided inverse-CDF noise b*ln(1/u), u and sign"
    f" drawn from the portable hash, ln via the fixed-point log2 kernel",
)
def dp_laplace_noised_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The central-DP release shape: aggregate first (bounded
    |event_type| rows), then add per-cell two-sided noise sampled by
    inverse CDF — |noise| = b*ln(1/u) with u = (hash % 2^20 + 1)/2^20.
    The log comes from the same square-and-renormalize kernel BM25
    uses, so the released integers are engine-identical. Noise is
    added strictly after aggregation: the scan itself is noise-free
    and map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n")
    )
    u_hash = hash60_expr("event_type || '#lapu'")
    s_hash = hash60_expr("event_type || '#laps'")
    coins = agg.selectExpr(
        "event_type",
        "n",
        f"({u_hash} % {_LAP_M}) + 1 AS u1",
        f"CASE WHEN {s_hash} % 2 = 0 THEN 1 ELSE -1 END AS sgn",
    )
    noise = _apply_steps(
        coins,
        log2_fp16_steps(
            f"CAST({_LAP_M} AS BIGINT)", "u1", "nll16", " div "
        ),
    )
    return noise.selectExpr(
        "event_type",
        "n AS true_count",
        f"CAST(sgn * ({LAP_B} * nll16 * {_LN2_MICRO} div 16000000)"
        f" AS BIGINT) AS noise",
        f"CAST(n + sgn * ({LAP_B} * nll16 * {_LN2_MICRO} div 16000000)"
        f" AS BIGINT) AS noised_count",
    ).orderBy("event_type")
