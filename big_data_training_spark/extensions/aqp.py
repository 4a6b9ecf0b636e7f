"""Approximate query processing with exact error bars: hash-sampled
estimates of totals and shares, each shipped with a confidence
interval computed in pure integer arithmetic.

The BlinkDB/quickr idea — answer from a sample, attach an error bound
— is the only way some 100 TB questions are affordable, and the bound
is what makes the answer usable. The error bound needs a square root;
cross-engine float sqrt is exactly the kind of call the oracle
methodology forbids (libm rounding may differ), so :func:`isqrt_steps`
contributes the second fixed-point kernel of the repo (after
retrieval.log2_fp16_steps): floor(sqrt(n)) for BIGINT n from a
power-of-two seed and seven integer Newton iterations
x <- (x + n div x) div 2, plus two downward corrections. The seed
2^ceil(bitlen/2) >= sqrt(n) keeps every iterate >= floor(sqrt(n)), the
relative error squares each round (< 1 absolute after 5 rounds from a
<= sqrt(2)-1 start), and only near-sqrt values are ever squared, so
all intermediates stay < 2^63 for n < 2^62. Identical expression text
in Spark SQL (`div`) and DuckDB (`//`).

Sampling is the portable-hash 1-in-10 bucket — the same reproducible
device as the repo's split/AB operators, so the "sample" is a
deterministic predicate both engines agree on, evaluated inside the
scan stage — no shuffle and no RNG state to coordinate (the md5
expression itself is not a parquet PushedFilter).

Overflow scope (documented, not silent): the variance path squares
per-stratum sample sums — exact while sum(dollars) per stratum stays
under ~3e9 (sf <= ~1); beyond that, compute the variance from
mean-centered residuals in a second pass or per-substratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.retrieval import _nest_sql
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

SAMPLE_MOD = 10  # 1-in-10 deterministic sample
NEWTON_ROUNDS = 7
Z95_X100 = 196  # 1.96 * 100


def isqrt_steps(n: str, out: str, div: str, pfx: str = "") -> list[tuple[str, str]]:
    """Column-derivation steps computing ``out`` = floor(sqrt(n)) for a
    BIGINT expression 0 <= n < 2^62, as (name, expr) pairs valid in
    BOTH Spark SQL (div=' div ') and DuckDB (div=' // ')."""
    d, p = div, pfx
    steps: list[tuple[str, str]] = [
        (f"{p}sn", f"greatest({n}, 1)"),
        (
            f"{p}x0",
            f"CAST(pow(2, (length(bin({p}sn)) + 1){d}2) AS BIGINT)",
        ),
    ]
    for k in range(NEWTON_ROUNDS):
        steps.append(
            (f"{p}x{k + 1}", f"({p}x{k} + {p}sn{d}{p}x{k}){d}2")
        )
    last = f"{p}x{NEWTON_ROUNDS}"
    steps += [
        (
            f"{p}y",
            f"{last} - (CASE WHEN {last} * {last} > {p}sn THEN 1 ELSE 0 END)",
        ),
        (
            f"{p}z",
            f"{p}y - (CASE WHEN {p}y * {p}y > {p}sn THEN 1 ELSE 0 END)",
        ),
        (out, f"CASE WHEN ({n}) <= 0 THEN 0 ELSE {p}z END"),
    ]
    return steps


def _apply_steps(df: DataFrame, steps: list[tuple[str, str]]) -> DataFrame:
    for name, expr in steps:
        df = df.selectExpr("*", f"{expr} AS {name}")
    return df


def _revenue_oracle() -> str:
    sq = _nest_sql(
        "SELECT flag, n_pop, true_total, n_s, sum_s, s2n FROM j",
        isqrt_steps("s2n", "rt", " // "),
    )
    return f"""
    WITH li AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice) AS BIGINT) AS dollars,
               {sql_hash60("l_orderkey || '#' || l_linenumber || '#s'")}
                   % {SAMPLE_MOD} AS bucket
        FROM lineitem
    ),
    pop AS (
        SELECT flag, CAST(count(*) AS BIGINT) AS n_pop,
               CAST(sum(dollars) AS BIGINT) AS true_total
        FROM li GROUP BY 1
    ),
    samp AS (
        SELECT flag, CAST(count(*) AS BIGINT) AS n_s,
               CAST(sum(dollars) AS BIGINT) AS sum_s,
               CAST(sum(dollars * dollars) AS BIGINT) AS sumsq_s
        FROM li WHERE bucket = 0 GROUP BY 1
    ),
    j AS (
        SELECT p.flag AS flag, n_pop, true_total, n_s, sum_s,
               ((n_s * sumsq_s - sum_s * sum_s)
                // greatest(n_s * (n_s - 1), 1)) // n_s AS s2n
        FROM pop p JOIN samp s ON s.flag = p.flag
    ),
    r AS ({sq})
    SELECT flag, n_pop, n_s AS n_sample,
           CAST(sum_s * n_pop // n_s AS BIGINT) AS est_total,
           true_total,
           CAST({Z95_X100} * n_pop * rt // 100 AS BIGINT) AS ci_half,
           CAST(CASE WHEN abs(sum_s * n_pop // n_s - true_total)
                     <= {Z95_X100} * n_pop * rt // 100
                THEN 1 ELSE 0 END AS BIGINT) AS within_ci
    FROM r
    ORDER BY flag
    """


@register(
    "apx_sampled_revenue_ci",
    _revenue_oracle(),
    doc=f"approximate per-flag revenue from a deterministic 1-in-"
    f"{SAMPLE_MOD} hash sample, with a 95% CI whose sqrt comes from "
    f"the integer Newton kernel — estimate, truth, half-width and a "
    f"coverage flag per stratum",
)
def apx_sampled_revenue_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expansion estimator sum_s * N/n per l_returnflag stratum, with
    se(total) ~= N * sqrt(s^2/n) from the sample variance and
    floor(sqrt) via isqrt_steps. The sample predicate is a scan-stage
    hash filter (no shuffle, no RNG state); the truth column exists
    only because the fixture is small enough to compute it — at 100 TB
    you'd drop `pop` and keep the estimate + CI."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = hash60_expr("l_orderkey || '#' || l_linenumber || '#s'")
    base = li.selectExpr(
        "l_returnflag AS flag",
        "CAST(floor(l_extendedprice) AS BIGINT) AS dollars",
        f"{bucket} % {SAMPLE_MOD} AS bucket",
    )
    pop = base.groupBy("flag").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_pop"),
        F.expr("CAST(sum(dollars) AS BIGINT)").alias("true_total"),
    )
    samp = (
        base.filter(F.col("bucket") == 0)
        .groupBy("flag")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_s"),
            F.expr("CAST(sum(dollars) AS BIGINT)").alias("sum_s"),
            F.expr("CAST(sum(dollars * dollars) AS BIGINT)").alias(
                "sumsq_s"
            ),
        )
    )
    j = pop.join(samp, "flag").selectExpr(
        "flag",
        "n_pop",
        "true_total",
        "n_s",
        "sum_s",
        "((n_s * sumsq_s - sum_s * sum_s)"
        " div greatest(n_s * (n_s - 1), 1)) div n_s AS s2n",
    )
    r = _apply_steps(j, isqrt_steps("s2n", "rt", " div "))
    return r.selectExpr(
        "flag",
        "n_pop",
        "n_s AS n_sample",
        "CAST(sum_s * n_pop div n_s AS BIGINT) AS est_total",
        "true_total",
        f"CAST({Z95_X100} * n_pop * rt div 100 AS BIGINT) AS ci_half",
        f"CAST(CASE WHEN abs(sum_s * n_pop div n_s - true_total)"
        f" <= {Z95_X100} * n_pop * rt div 100 THEN 1 ELSE 0 END"
        f" AS BIGINT) AS within_ci",
    ).orderBy("flag")


def _share_oracle() -> str:
    sq = _nest_sql(
        "SELECT event_type, true_ppm, n_s, tot_s, phat_ppm, varg FROM j",
        isqrt_steps("varg", "rt", " // "),
    )
    return f"""
    WITH ev AS (
        SELECT event_type, event_id,
               {sql_hash60("event_id || '#p'")} % {SAMPLE_MOD} AS bucket
        FROM events
    ),
    tru AS (
        SELECT event_type,
               CAST(count(*) * 1000000 //
                    (SELECT count(*) FROM ev) AS BIGINT) AS true_ppm
        FROM ev GROUP BY 1
    ),
    s AS (SELECT event_type, count(*) AS n_s FROM ev
          WHERE bucket = 0 GROUP BY 1),
    st AS (SELECT CAST(sum(n_s) AS BIGINT) AS tot_s FROM s),
    j AS (
        SELECT t.event_type AS event_type, t.true_ppm AS true_ppm,
               CAST(s.n_s AS BIGINT) AS n_s, tot_s,
               CAST(s.n_s * 1000000 // tot_s AS BIGINT) AS phat_ppm,
               (s.n_s * 1000000 // tot_s)
                   * (1000000 - s.n_s * 1000000 // tot_s) // tot_s AS varg
        FROM tru t JOIN s ON s.event_type = t.event_type
        CROSS JOIN st
    ),
    r AS ({sq})
    SELECT event_type, true_ppm, phat_ppm,
           CAST({Z95_X100} * rt // 100 AS BIGINT) AS ci_half_ppm,
           CAST(CASE WHEN abs(phat_ppm - true_ppm)
                     <= {Z95_X100} * rt // 100
                THEN 1 ELSE 0 END AS BIGINT) AS within_ci
    FROM r
    ORDER BY event_type
    """


@register(
    "apx_event_share_ci",
    _share_oracle(),
    doc=f"event-type share estimated from the 1-in-{SAMPLE_MOD} hash "
    f"sample with a normal-approximation 95% CI in exact ppm integers "
    f"(sqrt via the Newton kernel), plus a coverage flag vs the truth",
)
def apx_event_share_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportion estimator p-hat with half-width
    1.96*sqrt(p(1-p)/n): all in ppm fixed point — p(1-p)/n stays under
    2.5e11 so the kernel input is always in range. Sample + counts is
    one pushed-down filter and two bounded aggregations."""
    ev = load_table(spark, sf_dir, "events")
    bucket = hash60_expr("event_id || '#p'")
    base = ev.selectExpr(
        "event_type", f"{bucket} % {SAMPLE_MOD} AS bucket"
    )
    tot = base.agg(F.count("*").alias("n_all"))
    tru = (
        base.groupBy("event_type")
        .agg(F.count("*").alias("n_t"))
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "event_type",
            "CAST(n_t * 1000000 div n_all AS BIGINT) AS true_ppm",
        )
    )
    s = (
        base.filter(F.col("bucket") == 0)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_s"))
    )
    st = s.agg(F.expr("CAST(sum(n_s) AS BIGINT)").alias("tot_s"))
    j = (
        tru.join(s, "event_type")
        .crossJoin(F.broadcast(st))
        .selectExpr(
            "event_type",
            "true_ppm",
            "CAST(n_s AS BIGINT) AS n_s",
            "tot_s",
            "CAST(n_s * 1000000 div tot_s AS BIGINT) AS phat_ppm",
            "(n_s * 1000000 div tot_s)"
            " * (1000000 - n_s * 1000000 div tot_s) div tot_s AS varg",
        )
    )
    r = _apply_steps(j, isqrt_steps("varg", "rt", " div "))
    return r.selectExpr(
        "event_type",
        "true_ppm",
        "phat_ppm",
        f"CAST({Z95_X100} * rt div 100 AS BIGINT) AS ci_half_ppm",
        f"CAST(CASE WHEN abs(phat_ppm - true_ppm)"
        f" <= {Z95_X100} * rt div 100 THEN 1 ELSE 0 END AS BIGINT)"
        f" AS within_ci",
    ).orderBy("event_type")
