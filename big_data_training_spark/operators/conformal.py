"""Split conformal prediction — distribution-free uncertainty bands
for the model-scoring map (T5), with the finite-sample coverage
guarantee checked empirically.

The missing piece between "score every row with a model" (T5,
flink/README.md:29-62) and shipping those scores: how wrong is the
model, with what guarantee? Split conformal (Vovk; Lei et al.) needs
no model internals: hash-split the data into calibration/test, take
the ceil((n+1)*(1-alpha))-th smallest calibration nonconformity score
as the band half-width q, and |test error| <= q then holds with
probability >= 1-alpha for ANY exchangeable data and ANY predictor.
The hash split (portable 60-bit) makes the calibration set a
deterministic predicate, so both engines see identical splits.

Everything is integer: the predictor is the per-type calibration
median (percentile_disc — an actual sample value, cast exact after
floor), nonconformity = |value_cents - pred_cents|, the conformal
quantile is an order statistic picked by row_number over the
PER-TYPE-bounded calibration score table, and coverage is a count
ratio in ppm.

Scale: two scans (calibrate, test) + one broadcast of the |types|-row
band table. The order statistic runs per type — partitioned windows,
no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

ALPHA_PCT = 10  # 90% target coverage
CAL_MOD = 2  # hash-half calibration split


def _split_sql() -> str:
    return f"""
    ev AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               {sql_hash60("event_id || '#conf'")} % {CAL_MOD} AS half
        FROM events
    ),
    pred AS (
        SELECT event_type,
               CAST(floor(percentile_disc(0.5)
                    WITHIN GROUP (ORDER BY cents)) AS BIGINT) AS pred_cents
        FROM ev WHERE half = 0 GROUP BY 1
    ),
    cal AS (
        SELECT e.event_type AS event_type,
               abs(e.cents - p.pred_cents) AS score
        FROM ev e JOIN pred p ON p.event_type = e.event_type
        WHERE e.half = 0
    ),
    q AS (
        SELECT event_type, CAST(score AS BIGINT) AS q_cents
        FROM (
            SELECT event_type, score,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY score
                   ) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM cal
        )
        WHERE rn = CAST(ceil((n + 1) * (100 - {ALPHA_PCT}) / 100.0)
                        AS BIGINT)
           OR (rn = n AND n < CAST(ceil((n + 1) * (100 - {ALPHA_PCT})
                                        / 100.0) AS BIGINT))
    )
    """


@register(
    "ml_conformal_coverage",
    f"""
    WITH {_split_sql()}
    SELECT t.event_type AS event_type,
           p.pred_cents AS pred_cents,
           q.q_cents AS q_cents,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN abs(t.cents - p.pred_cents) <= q.q_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           CAST(sum(CASE WHEN abs(t.cents - p.pred_cents) <= q.q_cents
                         THEN 1 ELSE 0 END) * 1000000 // count(*)
                AS BIGINT) AS coverage_ppm
    FROM ev t
    JOIN pred p ON p.event_type = t.event_type
    JOIN q ON q.event_type = t.event_type
    WHERE t.half = 1
    GROUP BY 1, 2, 3
    ORDER BY event_type
    """,
    doc=f"split conformal prediction bands (target {100 - ALPHA_PCT}% "
    f"coverage): per event type the median predictor, the conformal "
    f"quantile band half-width, and the exact empirical test coverage "
    f"in ppm",
)
def ml_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibrate on the hash-half, test on the complement: q is the
    ceil((n+1)(1-alpha)) order statistic of calibration |error| (per
    type — partitioned window over a per-key-bounded score table),
    and the guarantee says test coverage >= 90% up to finite-sample
    wobble. The band table is |types| rows, broadcast onto the test
    scan — uncertainty quantification at one extra broadcast join."""
    half_hash = hash60_expr("event_id || '#conf'")
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS cents",
        f"{half_hash} % {CAL_MOD} AS half",
    )
    pred = (
        ev.filter("half = 0")
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST(floor(percentile_disc(0.5)"
                " WITHIN GROUP (ORDER BY cents)) AS BIGINT)"
            ).alias("pred_cents")
        )
    )
    cal = (
        ev.filter("half = 0")
        .join(F.broadcast(pred), "event_type")
        .selectExpr("event_type", "abs(cents - pred_cents) AS score")
    )
    wr = Window.partitionBy("event_type").orderBy("score")
    wn = Window.partitionBy("event_type")
    target = f"CAST(ceil((n + 1) * (100 - {ALPHA_PCT}) / 100.0) AS BIGINT)"
    q = (
        cal.withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.count("*").over(wn))
        .filter(
            F.expr(
                f"rn = {target} OR (rn = n AND n < {target})"
            )
        )
        .selectExpr("event_type", "CAST(score AS BIGINT) AS q_cents")
    )
    return (
        ev.filter("half = 1")
        .join(F.broadcast(pred), "event_type")
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type", "pred_cents", "q_cents")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_test"),
            F.expr(
                "CAST(sum(CASE WHEN abs(cents - pred_cents) <= q_cents"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_covered"),
            F.expr(
                "CAST(sum(CASE WHEN abs(cents - pred_cents) <= q_cents"
                " THEN 1 ELSE 0 END) * 1000000 div count(*) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
        .orderBy("event_type")
    )
