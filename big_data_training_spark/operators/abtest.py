"""Experimentation operators: hash-bucketed A/B assignment, a
difference-of-means z-test, and CUPED variance-reduction accounting.

The analytics side of every event platform runs experiments; the
engine-level primitives are (1) deterministic unit assignment — the
portable hash, same device as the split/sampling operators, so
assignment is a pushed-down predicate and reproducible across reruns
— and (2) the test statistics from per-arm sufficient statistics
(n, sum, sum of squares), which are exact BIGINTs under integer
metrics.

Exactness: the z statistic needs a square root — isqrt_steps (the
round-6 Newton kernel) over milli-scaled variance integers; every
floor is shared SQL text. CUPED's variance-reduction fraction is
rho^2 = cov^2 / (var_x var_y), computed division-last from raw sums:
(n*Sxy - Sx*Sy)^2 * 1e6 // ((n*Sxx - Sx^2) * (n*Syy - Sy^2)) — pure
integers (range argument in the docstring).

This run is an A/A test by construction (assignment hash is
independent of behavior), so |z| should be small — the operator's
own null-calibration check.

Scale: one per-user aggregation scan, then everything runs on the
2-row arm table. Assignment never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.aqp import isqrt_steps
from big_data_training_spark.extensions.retrieval import _nest_sql
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

Z95_X100 = 196


def _apply_steps(df: DataFrame, steps: list[tuple[str, str]]) -> DataFrame:
    for name, expr in steps:
        df = df.selectExpr("*", f"{expr} AS {name}")
    return df


def _ztest_oracle() -> str:
    sq = _nest_sql(
        "SELECT na, nb, ma_milli, mb_milli, seg FROM piv",
        isqrt_steps("seg", "se_milli", " // "),
    )
    return f"""
    WITH u AS (
        SELECT user_id,
               {sql_hash60("user_id || '#ab'")} % 2 AS arm,
               CAST(count(CASE WHEN event_type = 'purchase'
                               THEN 1 END) AS BIGINT) AS m
        FROM events GROUP BY 1, 2
    ),
    arms AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(m) AS BIGINT) AS s,
               CAST(sum(m * m) AS BIGINT) AS ss
        FROM u GROUP BY 1
    ),
    piv AS (
        SELECT a.n AS na, b.n AS nb,
               a.s * 1000 // a.n AS ma_milli,
               b.s * 1000 // b.n AS mb_milli,
               ((a.n * a.ss - a.s * a.s) * 1000000
                    // greatest(a.n * (a.n - 1), 1)) // a.n
             + ((b.n * b.ss - b.s * b.s) * 1000000
                    // greatest(b.n * (b.n - 1), 1)) // b.n AS seg
        FROM arms a, arms b WHERE a.arm = 0 AND b.arm = 1
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(ma_milli AS BIGINT) AS mean_a_milli,
           CAST(mb_milli AS BIGINT) AS mean_b_milli,
           CAST(se_milli AS BIGINT) AS se_milli,
           CAST((ma_milli - mb_milli) * 1000
                // greatest(se_milli, 1) AS BIGINT) AS z_milli,
           CAST(CASE WHEN abs((ma_milli - mb_milli) * 1000
                              // greatest(se_milli, 1))
                          > {Z95_X100} * 10
                THEN 1 ELSE 0 END AS BIGINT) AS significant_95
    FROM ({sq})
    """


@register(
    "ab_mean_diff_ztest",
    _ztest_oracle(),
    doc="A/A-calibrated difference-of-means z-test: hash-bucketed "
    "arms, per-arm sufficient statistics, Welch SE via the integer "
    "Newton sqrt kernel, z in exact milli units",
)
def ab_mean_diff_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases-per-user compared across two hash arms. Means and
    the Welch standard error are milli-scaled integers (variance
    numerators stay exact while per-arm sum(m) < ~3e9); z_milli =
    1000*(mA-mB)/SE with the sqrt from isqrt_steps. Because arms are
    hash-assigned independent of behavior, this doubles as the
    platform's A/A null check — |z| beyond 1.96 here means a broken
    assignment hash, not a treatment effect."""
    arm = hash60_expr("user_id || '#ab'")
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(count(CASE WHEN event_type = 'purchase'"
                " THEN 1 END) AS BIGINT)"
            ).alias("m")
        )
        .selectExpr("user_id", f"{arm} % 2 AS arm", "m")
    )
    arms = u.groupBy("arm").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n"),
        F.expr("CAST(sum(m) AS BIGINT)").alias("s"),
        F.expr("CAST(sum(m * m) AS BIGINT)").alias("ss"),
    )
    a = arms.filter("arm = 0").selectExpr(
        "n AS na", "s AS sa", "ss AS ssa"
    )
    b = arms.filter("arm = 1").selectExpr(
        "n AS nb", "s AS sb", "ss AS ssb"
    )
    piv = a.crossJoin(F.broadcast(b)).selectExpr(
        "na",
        "nb",
        "sa * 1000 div na AS ma_milli",
        "sb * 1000 div nb AS mb_milli",
        "((na * ssa - sa * sa) * 1000000 div greatest(na * (na - 1), 1)) div na"
        " + ((nb * ssb - sb * sb) * 1000000 div greatest(nb * (nb - 1), 1)) div nb"
        " AS seg",
    )
    r = _apply_steps(piv, isqrt_steps("seg", "se_milli", " div "))
    return r.selectExpr(
        "na AS n_a",
        "nb AS n_b",
        "CAST(ma_milli AS BIGINT) AS mean_a_milli",
        "CAST(mb_milli AS BIGINT) AS mean_b_milli",
        "CAST(se_milli AS BIGINT) AS se_milli",
        "CAST((ma_milli - mb_milli) * 1000 div greatest(se_milli, 1)"
        " AS BIGINT) AS z_milli",
        f"CAST(CASE WHEN abs((ma_milli - mb_milli) * 1000"
        f" div greatest(se_milli, 1)) > {Z95_X100} * 10"
        f" THEN 1 ELSE 0 END AS BIGINT) AS significant_95",
    )


@register(
    "ab_cuped_variance_reduction",
    f"""
    WITH w AS (
        SELECT user_id,
               CAST(count(CASE WHEN ts < (SELECT min(ts) FROM events)
                                        + INTERVAL 7 DAY
                               THEN 1 END) AS BIGINT) AS x,
               CAST(count(CASE WHEN ts >= (SELECT min(ts) FROM events)
                                         + INTERVAL 7 DAY
                               THEN 1 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM w
    )
    SELECT n AS n_users,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS varx_num,
           CAST(n * syy - sy * sy AS BIGINT) AS vary_num,
           CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000
                // ((n * sxx - sx * sx) * (n * syy - sy * sy))
                AS BIGINT) AS var_reduction_ppm
    FROM s
    """,
    doc="CUPED accounting: pre-period (week 1) vs post-period event "
    "counts per user; the exact rho^2 = variance-reduction fraction "
    "in ppm, division-last from raw integer sums",
)
def ab_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED subtracts theta*x from y; the metric variance drops by
    exactly corr(x,y)^2 — this operator reports that fraction
    division-last: (n*Sxy-Sx*Sy)^2 * 1e6 // ((n*Sxx-Sx^2)(n*Syy-Sy^2)).
    Exact while n*Sxy < ~3e9 (per-scope; stratify the experiment
    readout per day/geo beyond). One per-user scan, one 1-row
    reduce."""
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min("ts").alias("t0"))
    w = (
        ev.crossJoin(F.broadcast(t0))
        .selectExpr(
            "user_id",
            "CASE WHEN ts < t0 + INTERVAL 7 DAY THEN 1 ELSE 0 END AS pre",
        )
        .groupBy("user_id")
        .agg(
            F.expr("CAST(sum(pre) AS BIGINT)").alias("x"),
            F.expr("CAST(sum(1 - pre) AS BIGINT)").alias("y"),
        )
    )
    s = w.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n"),
        F.expr("CAST(sum(x) AS BIGINT)").alias("sx"),
        F.expr("CAST(sum(y) AS BIGINT)").alias("sy"),
        F.expr("CAST(sum(x * x) AS BIGINT)").alias("sxx"),
        F.expr("CAST(sum(y * y) AS BIGINT)").alias("syy"),
        F.expr("CAST(sum(x * y) AS BIGINT)").alias("sxy"),
    )
    return s.selectExpr(
        "n AS n_users",
        "CAST(n * sxy - sx * sy AS BIGINT) AS cov_num",
        "CAST(n * sxx - sx * sx AS BIGINT) AS varx_num",
        "CAST(n * syy - sy * sy AS BIGINT) AS vary_num",
        "CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000"
        " div ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT)"
        " AS var_reduction_ppm",
    )
