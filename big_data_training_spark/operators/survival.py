"""Survival analysis: Kaplan-Meier estimator of time-to-first-error
per user, with right-censoring — the churn/reliability curve every
product analytics stack ships.

KM at death time t multiplies (1 - d_t/n_t) over all earlier death
times; a floating product is exactly what the cross-engine oracle
methodology forbids, so the curve is carried in the LOG domain with
the repo's fixed-point kernel: per death time the hazard step is
step16 = 16*log2(n_at_risk / survivors), and the curve statistic is
the running integer sum km_nll16 = -16*log2 S(t) — monotone, exact,
engine-identical (S itself is 2^(-km_nll16/16) for anyone who wants
the float back downstream).

Semantics: unit of analysis = user; origin = user's first event;
event = first 'error' event; censor horizon = 48 hours (users whose
first error falls after the horizon — or who never error at all —
are censored AT the horizon and contribute to n_at_risk but never to
deaths — textbook right censoring; the no-error users enter via a
LEFT join with raw_h = horizon+1). Durations are exact integer hours from microsecond
timestamps (epoch-second doubles are exact below 2^53; the difference
and floor are IEEE-identical across engines).

Scale: one groupBy(user) scan builds the duration table; everything
after runs on the <= horizon-bounded death-time table (49 rows) —
the same bounded-domain single-task-window argument as the AUC.
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

HORIZON_H = 48


def _km_oracle() -> str:
    steps = _nest_sql(
        "SELECT t, at_risk, d, surv FROM death",
        log2_fp16_steps("at_risk", "surv", "step16", " // "),
    )
    return f"""
    WITH u AS (
        SELECT user_id, min(ts) AS f FROM events GROUP BY 1
    ),
    fe AS (
        SELECT user_id, min(ts) AS fe FROM events
        WHERE event_type = 'error' GROUP BY 1
    ),
    dur AS (
        SELECT u.user_id AS user_id,
               coalesce(CAST(floor((epoch(fe.fe) - epoch(u.f)) / 3600)
                    AS BIGINT), {HORIZON_H} + 1) AS raw_h
        FROM u LEFT JOIN fe ON fe.user_id = u.user_id
    ),
    lt AS (
        SELECT least(raw_h, {HORIZON_H}) AS t,
               CASE WHEN raw_h <= {HORIZON_H} THEN 1 ELSE 0 END AS ev
        FROM dur
    ),
    g AS (
        SELECT t, CAST(count(*) AS BIGINT) AS n_all,
               CAST(sum(ev) AS BIGINT) AS d
        FROM lt GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_all) AS BIGINT) AS n FROM g),
    r AS (
        SELECT t, d,
               n - coalesce(sum(n_all) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS at_risk
        FROM g CROSS JOIN tot
    ),
    death AS (
        SELECT t, at_risk, d, greatest(at_risk - d, 1) AS surv
        FROM r WHERE d > 0
    ),
    s AS ({steps})
    SELECT CAST(t AS BIGINT) AS t_hours,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           d AS n_deaths,
           CAST(step16 AS BIGINT) AS hazard_step16,
           CAST(sum(step16) OVER (ORDER BY t) AS BIGINT) AS km_nll16
    FROM s
    ORDER BY t_hours
    """


@register(
    "ev_kaplan_meier",
    _km_oracle(),
    doc=f"Kaplan-Meier time-to-first-error per user ({HORIZON_H}h "
    f"right-censor): per death hour the at-risk count, deaths, and "
    f"the exact log-domain survival curve -16*log2 S(t)",
)
def ev_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survival curve as integer fixed point: hazard steps
    16*log2(n/(n-d)) accumulate into km_nll16, whose monotone growth
    IS the curve. Censored users leave the risk set silently (they
    appear in n_at_risk up to their horizon, never in deaths). The
    death-time table is bounded by the censor horizon, so the two
    windows (suffix at-risk, running curve) cost nothing at any
    corpus size."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.min("ts").alias("f"))
    fe = (
        ev.filter("event_type = 'error'")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fe"))
    )
    dur = u.join(fe, "user_id", "left").selectExpr(
        "coalesce(CAST(floor((CAST(fe AS DOUBLE) - CAST(f AS DOUBLE))"
        f" / 3600) AS BIGINT), {HORIZON_H} + 1) AS raw_h"
    )
    lt = dur.selectExpr(
        f"least(raw_h, {HORIZON_H}) AS t",
        f"CASE WHEN raw_h <= {HORIZON_H} THEN 1 ELSE 0 END AS ev",
    )
    g = lt.groupBy("t").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_all"),
        F.expr("CAST(sum(ev) AS BIGINT)").alias("d"),
    )
    tot = g.agg(F.expr("CAST(sum(n_all) AS BIGINT)").alias("n"))
    wb = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    r = (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "at_risk",
            F.col("n") - F.coalesce(F.sum("n_all").over(wb), F.lit(0)),
        )
    )
    death = r.filter("d > 0").selectExpr(
        "t", "at_risk", "d", "greatest(at_risk - d, 1) AS surv"
    )
    for name, expr in log2_fp16_steps("at_risk", "surv", "step16", " div "):
        death = death.selectExpr("*", f"{expr} AS {name}")
    wk = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return (
        death.withColumn(
            "km_nll16", F.sum("step16").over(wk).cast("bigint")
        )
        .selectExpr(
            "CAST(t AS BIGINT) AS t_hours",
            "CAST(at_risk AS BIGINT) AS n_at_risk",
            "d AS n_deaths",
            "CAST(step16 AS BIGINT) AS hazard_step16",
            "km_nll16",
        )
        .orderBy("t_hours")
    )
