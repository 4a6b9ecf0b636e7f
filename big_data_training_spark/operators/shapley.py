"""Shapley-value channel attribution — the game-theoretic member of
the attribution family (last-touch, linear, time-decay and
position-based already exist in operators/attribution.py).

Attribution treats channels as players and conversion rate as the
coalition value; the Shapley value is the only credit split that is
efficient, symmetric and dummy-free. With a bounded channel set it is
EXACTLY computable: cohort users by the exact subset of channels they
touched on their FIRST DAY (2^3 cohorts; the bounded exposure window
is what makes cohorts vary), take v(S) = conversion rate of cohort S
in ppm, and evaluate phi_i = sum_{S not containing i} w(S) *
(v(S + i) - v(S)) with w(S) = |S|!(k-|S|-1)!/k!. For k = 3 the
weights are {2, 1, 2}/6, so 6*phi is an exact integer combination of
cohort ppms — no floats anywhere.

Scale: one per-user scan builds the masks (conditional max — no
explode), the cohort table is 2^k rows, and the Shapley lattice is a
12-row literal join. The method's real-world cap is k (2^k cohorts),
not data size — which is the honest trade every Shapley attribution
paper states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

CHANNELS = ("click", "view", "signup")  # bit 0, 1, 2
_K = len(CHANNELS)


def _terms() -> list[tuple[str, int, int, int]]:
    """(channel, S_mask, S_plus_i_mask, coef) with coef = |S|!(k-|S|-1)!"""
    import math

    out = []
    for i, ch in enumerate(CHANNELS):
        for s in range(1 << _K):
            if s & (1 << i):
                continue
            size = bin(s).count("1")
            coef = math.factorial(size) * math.factorial(_K - size - 1)
            out.append((ch, s, s | (1 << i), coef))
    return out


CONV_VALUE = 200  # conversion = a purchase above this value


def _mask_sql() -> str:
    bits = " + ".join(
        f"(CASE WHEN max(CASE WHEN event_type = '{ch}'"
        f" AND e.ts < f.f + INTERVAL 1 DAY THEN 1 ELSE 0 END)"
        f" = 1 THEN {1 << i} ELSE 0 END)"
        for i, ch in enumerate(CHANNELS)
    )
    return f"""
    f AS (SELECT user_id, min(ts) AS f FROM events GROUP BY 1),
    u AS (
        SELECT e.user_id, {bits} AS mask,
               max(CASE WHEN event_type = 'purchase'
                        AND value > {CONV_VALUE}
                   THEN 1 ELSE 0 END) AS converted
        FROM events e JOIN f ON f.user_id = e.user_id
        GROUP BY e.user_id
    ),
    cohort AS (
        SELECT mask, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(converted) AS BIGINT) AS c,
               CAST(sum(converted) * 1000000 // count(*) AS BIGINT)
                   AS v_ppm
        FROM u GROUP BY mask
    )
    """


def _terms_values_sql() -> str:
    rows = ", ".join(
        f"('{ch}', {s}, {si}, {coef})" for ch, s, si, coef in _terms()
    )
    return f"(VALUES {rows}) AS t(channel, s_mask, si_mask, coef)"


@register(
    "ev_attribution_shapley",
    f"""
    WITH {_mask_sql()},
    terms AS (
        SELECT t.channel AS channel,
               t.coef * (coalesce(cv.v_ppm, 0) - coalesce(cs.v_ppm, 0))
                   AS contrib
        FROM {_terms_values_sql()}
        LEFT JOIN cohort cs ON cs.mask = t.s_mask
        LEFT JOIN cohort cv ON cv.mask = t.si_mask
    )
    SELECT channel,
           CAST(sum(contrib) AS BIGINT) AS shapley_x6_ppm,
           CAST(sum(contrib) // 6 AS BIGINT) AS shapley_ppm
    FROM terms
    GROUP BY channel
    ORDER BY channel
    """,
    doc="exact Shapley-value attribution over the 3-channel exposure "
    "lattice: cohort conversion rates as coalition values, integer "
    "factorial weights, credit per channel in ppm",
)
def ev_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masks via conditional max (no explode), 8-row cohort value
    table, 12-term Shapley lattice as a literal broadcast join.
    6*phi is the exact integer; phi floors once at the end. Missing
    cohorts contribute v = 0, identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    f0 = ev.groupBy("user_id").agg(F.min("ts").alias("f"))
    bit_exprs = [
        f"(CASE WHEN max(CASE WHEN event_type = '{ch}'"
        f" AND ts < f + INTERVAL 1 DAY THEN 1 ELSE 0 END)"
        f" = 1 THEN {1 << i} ELSE 0 END)"
        for i, ch in enumerate(CHANNELS)
    ]
    u = ev.join(f0, "user_id").groupBy("user_id").agg(
        F.expr(" + ".join(bit_exprs)).alias("mask"),
        F.expr(
            f"max(CASE WHEN event_type = 'purchase'"
            f" AND value > {CONV_VALUE} THEN 1 ELSE 0 END)"
        ).alias("converted"),
    )
    cohort = u.groupBy("mask").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n"),
        F.expr("CAST(sum(converted) AS BIGINT)").alias("c"),
        F.expr(
            "CAST(sum(converted) * 1000000 div count(*) AS BIGINT)"
        ).alias("v_ppm"),
    )
    terms = spark.createDataFrame(
        _terms(), "channel string, s_mask long, si_mask long, coef long"
    )
    cs = cohort.selectExpr("mask AS s_mask", "v_ppm AS vs")
    cv = cohort.selectExpr("mask AS si_mask", "v_ppm AS vi")
    return (
        terms.join(F.broadcast(cs), "s_mask", "left")
        .join(F.broadcast(cv), "si_mask", "left")
        .selectExpr(
            "channel",
            "coef * (coalesce(vi, 0) - coalesce(vs, 0)) AS contrib",
        )
        .groupBy("channel")
        .agg(
            F.expr("CAST(sum(contrib) AS BIGINT)").alias(
                "shapley_x6_ppm"
            ),
            F.expr("CAST(sum(contrib) div 6 AS BIGINT)").alias(
                "shapley_ppm"
            ),
        )
        .orderBy("channel")
    )
