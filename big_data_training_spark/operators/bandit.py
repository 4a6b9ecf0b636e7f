"""Multi-armed-bandit accounting: UCB1 scores per arm from logged
events — the decisioning layer that sits on top of the
experimentation operators (abtest.py).

UCB1 (Auer et al. 2002) picks argmax_i mean_i + sqrt(2 ln N / n_i);
an event platform recomputes exactly this scoreboard from its logs
every scheduling tick. The score composes BOTH of the repo's
fixed-point kernels: ln N from the 1/16-bit log2 kernel
(ln = log2 * ln 2), and the bonus square root from the integer
Newton isqrt kernel — so the scoreboard (and the argmax decision) is
the identical BIGINT in both engines. Bonus in ppm:
bonus = isqrt(2 * lnN_micro * 1e6 // n), since
sqrt(micro * 1e6) = 1e6 * sqrt(unit).

Arms here are event types; "reward" is a high-value event
(value > 200). One scan, |arms|-row scoreboard, rank by
(ucb desc, arm) — deterministic.
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

REWARD_VALUE = 200
_LN2_MICRO = 693147


def _ucb_oracle() -> str:
    ln_steps = log2_fp16_steps("nn", "1", "l2n", " // ")
    sq = isqrt_steps("barg", "bonus_ppm", " // ", pfx="q")
    inner = _nest_sql(
        "SELECT event_type, n, r, nn FROM arms CROSS JOIN tot",
        ln_steps
        + [
            ("mean_ppm", "r * 1000000 // n"),
            ("ln_n_micro", f"l2n * {_LN2_MICRO} // 16"),
            ("barg", "2 * (l2n * {c} // 16) * 1000000 // n".format(
                c=_LN2_MICRO
            )),
        ]
        + sq,
    )
    return f"""
    WITH e AS (
        SELECT event_type,
               CASE WHEN value > {REWARD_VALUE} THEN 1 ELSE 0 END AS rw
        FROM events
    ),
    arms AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rw) AS BIGINT) AS r
        FROM e GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM arms),
    s AS ({inner})
    SELECT event_type, n AS n_pulls,
           CAST(mean_ppm AS BIGINT) AS mean_ppm,
           CAST(bonus_ppm AS BIGINT) AS bonus_ppm,
           CAST(mean_ppm + bonus_ppm AS BIGINT) AS ucb_ppm,
           CAST(row_number() OVER (
               ORDER BY mean_ppm + bonus_ppm DESC, event_type
           ) AS BIGINT) AS rnk
    FROM s
    ORDER BY rnk
    """


@register(
    "ab_ucb1_scores",
    _ucb_oracle(),
    doc=f"UCB1 bandit scoreboard over event-type arms (reward = value "
    f"> {REWARD_VALUE}): mean + sqrt(2 ln N / n) in exact ppm, both "
    f"fixed-point kernels composed; deterministic argmax rank",
)
def ab_ucb1_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exploration/exploitation scoreboard, integer end to end:
    per arm one groupBy row, ln N once from the log2 kernel, the
    bonus via the Newton isqrt. The ranked output IS the policy —
    the row with rnk 1 is what the scheduler serves next tick."""
    ev = load_table(spark, sf_dir, "events")
    arms = (
        ev.selectExpr(
            "event_type",
            f"CASE WHEN value > {REWARD_VALUE} THEN 1 ELSE 0 END AS rw",
        )
        .groupBy("event_type")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n"),
            F.expr("CAST(sum(rw) AS BIGINT)").alias("r"),
        )
    )
    tot = arms.agg(F.expr("CAST(sum(n) AS BIGINT)").alias("nn"))
    s = arms.crossJoin(F.broadcast(tot))
    steps = (
        log2_fp16_steps("nn", "1", "l2n", " div ")
        + [
            ("mean_ppm", "r * 1000000 div n"),
            ("ln_n_micro", f"l2n * {_LN2_MICRO} div 16"),
            (
                "barg",
                f"2 * (l2n * {_LN2_MICRO} div 16) * 1000000 div n",
            ),
        ]
        + isqrt_steps("barg", "bonus_ppm", " div ", pfx="q")
    )
    for name, expr in steps:
        s = s.selectExpr("*", f"{expr} AS {name}")
    w = Window.orderBy(
        F.desc(F.expr("mean_ppm + bonus_ppm")), F.asc("event_type")
    )
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .selectExpr(
            "event_type",
            "n AS n_pulls",
            "CAST(mean_ppm AS BIGINT) AS mean_ppm",
            "CAST(bonus_ppm AS BIGINT) AS bonus_ppm",
            "CAST(mean_ppm + bonus_ppm AS BIGINT) AS ucb_ppm",
            "rnk",
        )
        .orderBy("rnk")
    )
