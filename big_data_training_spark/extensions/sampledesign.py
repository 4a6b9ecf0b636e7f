"""Sampling DESIGN operators — systematic sampling and Neyman
(optimal) stratified allocation.

Completes the sampling suite (extensions/sampling.py stratified /
per-source, extensions/weighted_sample.py A-ES priority,
sm_bottomk_sample): those SELECT samples; these certify the two design
calculations around them — the equal-interval systematic draw survey
methodology prescribes when a frame ordering exists, and the
variance-optimal budget split across strata (Neyman 1934).

Determinism: the systematic frame order is (portable hash, id) — a
total order — and selection is a modulus on the rank; Neyman weights
floor per-stratum N·S doubles (built from exact integer moments) to
fixed point BEFORE the cross-stratum normalization, so the allocation
arithmetic is pure integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

_V = "CAST(floor(value * 1000) AS BIGINT)"

SYS_STEP = 50
NEYMAN_BUDGET = 10_000


@register(
    "sm_systematic_sample",
    f"""
    WITH frame AS (
        SELECT event_id, {_V} AS v,
               row_number() OVER (ORDER BY {sql_hash60("CAST(event_id AS VARCHAR) || '#sys'")}, event_id) AS rn
        FROM events
    ),
    sample AS (SELECT v FROM frame WHERE rn % {SYS_STEP} = 1),
    pop AS (SELECT CAST(count(*) AS BIGINT) AS n_pop,
                   CAST(sum({_V}) AS BIGINT) AS s_pop FROM events)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM sample) AS n_sample,
           (SELECT CAST(sum(v) * 1000 // count(*) AS BIGINT) FROM sample)
               AS sample_mean_micro,
           CAST(s_pop * 1000 // n_pop AS BIGINT) AS pop_mean_micro,
           CAST((SELECT sum(v) * 1000 // count(*) FROM sample) * 1000000
                // (s_pop * 1000 // n_pop) AS BIGINT) AS ratio_ppm
    FROM pop
    """,
    doc=f"systematic 1-in-{SYS_STEP} sample over a hash-ordered frame:"
    " sample vs population mean with the exact-ratio diagnostic",
)
def sm_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every {k}-th unit of a hash-ordered frame — systematic sampling
    with the frame order randomized by the portable md5 hash60 (engine-identical, unlike native hash()), so periodic
    structure in the raw order cannot bias the draw (the textbook
    hazard of systematic designs). The rank is an audit-scale global
    window; the production-scale equivalent keeps the same inclusion
    law as hash(id) mod k (sm_bottomk/hash-mod — certified
    separately), trading exact equal intervals for rank-freedom. The
    readout compares sample and population means in exact fixed
    point."""
    ev = load_table(spark, sf_dir, "events")
    frame = ev.select(
        "event_id",
        F.expr(_V).alias("v"),
        F.row_number()
        .over(
            Window.orderBy(
                F.expr(hash60_expr("CAST(event_id AS STRING) || '#sys'")),
                F.asc("event_id"),
            )
        )
        .alias("rn"),
    )
    sample = frame.filter(F.col("rn") % SYS_STEP == 1).agg(
        F.count("*").alias("n_sample"),
        F.expr("sum(v) * 1000 div count(*)")
        .cast("bigint")
        .alias("sample_mean_micro"),
    )
    pop = ev.agg(
        F.count("*").alias("n_pop"),
        F.sum(F.expr(_V)).alias("s_pop"),
    )
    return sample.crossJoin(F.broadcast(pop)).selectExpr(
        "n_sample",
        "sample_mean_micro",
        "CAST(s_pop * 1000 div n_pop AS BIGINT) AS pop_mean_micro",
        "CAST(sample_mean_micro * 1000000"
        " div (s_pop * 1000 div n_pop) AS BIGINT) AS ratio_ppm",
    )


@register(
    "apx_neyman_allocation",
    f"""
    WITH strata AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_V}) AS BIGINT) AS s,
               CAST(sum({_V} * {_V}) AS BIGINT) AS q
        FROM events GROUP BY 1
    ),
    weighted AS (
        SELECT event_type, n,
               CAST(floor(n * sqrt((n * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s)
                                   / (CAST(n AS DOUBLE) * (n - 1))) / 1000)
                    AS BIGINT) AS w
        FROM strata
    ),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM weighted)
    SELECT event_type, n AS stratum_size, w AS neyman_weight,
           CAST(w * {NEYMAN_BUDGET} // tw AS BIGINT) AS alloc
    FROM weighted, tot
    """,
    doc=f"Neyman allocation: split a {NEYMAN_BUDGET}-unit sampling"
    " budget across event-type strata proportional to N_h * S_h",
)
def apx_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal stratified sampling: n_h ∝ N_h·S_h. Per-stratum
    std comes from exact integer moments; the N·S weight is FLOORED to
    an integer before the cross-stratum normalization (floors of
    identical doubles are identical; the allocation itself is then
    pure integer arithmetic, order-free). One map-side-combinable
    shuffle to |strata| rows. This is the design query behind
    apx_sampled_revenue_ci: it decides where the sampling budget
    goes."""
    ev = load_table(spark, sf_dir, "events")
    v = F.expr(_V)
    strata = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("q"),
    )
    weighted = strata.selectExpr(
        "event_type",
        "n",
        "CAST(floor(n * sqrt((n * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s)"
        " / (CAST(n AS DOUBLE) * (n - 1))) / 1000) AS BIGINT) AS w",
    )
    tot = weighted.agg(F.sum("w").cast("bigint").alias("tw"))
    return weighted.crossJoin(F.broadcast(tot)).selectExpr(
        "event_type",
        "n AS stratum_size",
        "w AS neyman_weight",
        f"CAST(w * {NEYMAN_BUDGET} div tw AS BIGINT) AS alloc",
    )
