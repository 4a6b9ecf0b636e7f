"""A/B experiment DESIGN readouts — Bayesian Beta posteriors per arm
and the frequentist sample-size calculation.

Completes the experimentation suite (operators/abtest.py z-test and
CUPED, operators/sprt.py sequential, operators/bandit.py UCB1): those
ANALYZE a running test; these two queries cover the bookends — the
Bayesian posterior summary a dashboard shows while the test runs, and
the power analysis that sizes the test before it starts (using the
observed baseline rate as the planning input).

Determinism: conversions are exact integer counts; posterior moments
and the sample-size formula are single double expressions over exact
integers (z-quantiles are hardcoded literals), floored/ceiled to fixed
point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

# Beta(1,1) prior; arms by user-id parity (the fixture's AB hash)
_ARM = "CAST(user_id % 2 AS BIGINT)"

_SQL_ARMS = f"""
    arms AS (
        SELECT {_ARM} AS arm,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(conv) AS BIGINT) AS s
        FROM (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' AND value > 200 THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY user_id
        ) GROUP BY 1
    )
"""


def _arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "max(CASE WHEN event_type = 'purchase' AND value > 200 THEN 1 ELSE 0 END)"
        ).alias("conv")
    )
    return per_user.groupBy(F.expr(_ARM).alias("arm")).agg(
        F.count("*").alias("n"),
        F.sum("conv").cast("bigint").alias("s"),
    )


@register(
    "ab_beta_posterior",
    f"""
    WITH {_SQL_ARMS}
    SELECT arm, n, s,
           CAST(1 + s AS BIGINT) AS alpha_post,
           CAST(1 + n - s AS BIGINT) AS beta_post,
           CAST((1 + s) * 1000000 // (2 + n) AS BIGINT) AS post_mean_ppm,
           CAST(floor(1000000 * sqrt(
               CAST((1 + s) * (1 + n - s) AS DOUBLE)
               / (CAST((2 + n) * (2 + n) AS DOUBLE) * (3 + n))))
               AS BIGINT) AS post_sd_ppm
    FROM arms
    """,
    doc="Bayesian A/B readout: Beta(1,1)-conjugate posterior per arm"
    " (mean and sd in exact/floored ppm)",
)
def ab_beta_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conjugate update: s high-value conversions in n users turn Beta(1,1)
    into Beta(1+s, 1+n−s); posterior mean is an exact integer ppm and
    the sd is one floored double expression over the same integers.
    Per-user conversion is one groupBy; arms are a second tiny
    aggregate — the always-on dashboard query."""
    return _arms(spark, sf_dir).selectExpr(
        "arm",
        "n",
        "s",
        "CAST(1 + s AS BIGINT) AS alpha_post",
        "CAST(1 + n - s AS BIGINT) AS beta_post",
        "CAST((1 + s) * 1000000 div (2 + n) AS BIGINT) AS post_mean_ppm",
        "CAST(floor(1000000 * sqrt(CAST((1 + s) * (1 + n - s) AS DOUBLE)"
        " / (CAST((2 + n) * (2 + n) AS DOUBLE) * (3 + n))))"
        " AS BIGINT) AS post_sd_ppm",
    )


# alpha = 0.05 two-sided, power = 0.80; absolute lift under test
_Z_A = "1.9599639845400545"
_Z_B = "0.8416212335729143"
_DELTA = "0.02"


@register(
    "ab_power_sample_size",
    f"""
    WITH {_SQL_ARMS},
    base AS (
        SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s
        FROM arms
    )
    SELECT n AS n_observed,
           CAST(s * 1000000 // n AS BIGINT) AS p1_ppm,
           CAST(least(s * 1000000 // n + 20000, 1000000) AS BIGINT) AS p2_ppm,
           CAST(ceil(
             pow({_Z_A} * sqrt(2 * ((CAST(s AS DOUBLE) / n + least(CAST(s AS DOUBLE) / n + {_DELTA}, CAST(1.0 AS DOUBLE))) / 2)
                               * (1 - ((CAST(s AS DOUBLE) / n + least(CAST(s AS DOUBLE) / n + {_DELTA}, CAST(1.0 AS DOUBLE))) / 2)))
               + {_Z_B} * sqrt((CAST(s AS DOUBLE) / n) * (1 - CAST(s AS DOUBLE) / n)
                               + least(CAST(s AS DOUBLE) / n + {_DELTA}, CAST(1.0 AS DOUBLE))
                                 * (1 - least(CAST(s AS DOUBLE) / n + {_DELTA}, CAST(1.0 AS DOUBLE)))), 2)
             / ({_DELTA} * {_DELTA})) AS BIGINT) AS n_per_arm
    FROM base
    """,
    doc="power analysis: required users per arm to detect a +2pp lift"
    " over the observed conversion baseline (alpha=.05, power=.8)",
)
def ab_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-test sizing formula n = (z_α√(2p̄q̄) + z_β√(p₁q₁+p₂q₂))²/δ²
    with the observed corpus conversion as p₁ and a +2pp target lift
    (clamped at 1.0 so a saturated baseline stays in-domain).
    Quantiles are hardcoded literals; the whole formula is one double
    expression over the exact (n, s) pair, ceiled — both engines
    compute identical bits. One aggregate feeds it."""
    arms = _arms(spark, sf_dir)
    base = arms.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("s"),
    )
    return base.selectExpr(
        "n AS n_observed",
        "CAST(s * 1000000 div n AS BIGINT) AS p1_ppm",
        "CAST(least(s * 1000000 div n + 20000, 1000000) AS BIGINT) AS p2_ppm",
        f"CAST(ceil("
        f"pow({_Z_A} * sqrt(2 * ((CAST(s AS DOUBLE) / n + least(CAST(s AS DOUBLE) / n + {_DELTA}, CAST(1.0 AS DOUBLE))) / 2)"
        f" * (1 - ((CAST(s AS DOUBLE) / n + least(CAST(s AS DOUBLE) / n + {_DELTA}, CAST(1.0 AS DOUBLE))) / 2)))"
        f" + {_Z_B} * sqrt((CAST(s AS DOUBLE) / n) * (1 - CAST(s AS DOUBLE) / n)"
        f" + least(CAST(s AS DOUBLE) / n + {_DELTA}, CAST(1.0 AS DOUBLE))"
        f" * (1 - least(CAST(s AS DOUBLE) / n + {_DELTA}, CAST(1.0 AS DOUBLE)))), 2)"
        f" / ({_DELTA} * {_DELTA})) AS BIGINT) AS n_per_arm",
    )
