"""Central-DP mechanisms, part two: the Gaussian-noised clipped mean
and the exponential mechanism for private selection.

Extends extensions/dpnoise.py (randomized response, Laplace counts)
with the other two workhorses of a private-statistics export: bounded-
sensitivity means (clip each unit's contribution, then noise the sum —
the DP-SGD/telemetry aggregate shape) and private argmax (release a
CATEGORY, not a number, with probability ∝ exp(ε·utility)). Same
reproducibility contract as dpnoise: every coin is the portable 60-bit
hash of a salted key, so the released integers are engine-identical —
a deployment swaps the salt per release, nothing else changes.

Exactness: Gaussian noise is sampled by the Irwin-Hall construction
(Σ of 12 hash-uniforms − 6 ≈ N(0,1)) in pure integer arithmetic — no
ln/cos, no float; the exponential mechanism uses base-2 weights over
integer utilities (a base change only rescales ε), so weights,
probabilities, and the sampled winner are exact BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

_V = "CAST(floor(value * 1000) AS BIGINT)"

CLIP_MILLI = 4_000_000  # per-user contribution bound (~P86 of per-user totals)
SIGMA_MILLI = 2_000_000  # Gaussian noise scale on the clipped sum
_M = 1 << 20  # uniform grain

# Irwin-Hall: Σ of 12 independent uniforms, centered — z12 in [-6M, 6M]
_IH_SALTS = ["'ih%d'" % i for i in range(12)]
_IH_TERMS_D = " + ".join(f"({sql_hash60(s)} % {_M})" for s in _IH_SALTS)
_IH_TERMS_S = " + ".join(f"({hash60_expr(s)} % {_M})" for s in _IH_SALTS)


@register(
    "dp_gaussian_clipped_mean",
    f"""
    WITH per_user AS (
        SELECT user_id,
               least(CAST(sum({_V}) AS BIGINT), {CLIP_MILLI}) AS clipped,
               CASE WHEN sum({_V}) > {CLIP_MILLI} THEN 1 ELSE 0 END
                   AS was_clipped
        FROM events GROUP BY 1
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(clipped) AS BIGINT) AS clipped_sum,
               CAST(sum(was_clipped) AS BIGINT) AS n_clipped
        FROM per_user
    ),
    noised AS (
        SELECT n_users, clipped_sum, n_clipped,
               CAST({SIGMA_MILLI} * (({_IH_TERMS_D}) - {6 * _M})
                    // {_M} AS BIGINT) AS noise_milli
        FROM agg
    )
    SELECT n_users, clipped_sum, n_clipped, noise_milli,
           CAST((clipped_sum + noise_milli) * 1000 // n_users AS BIGINT)
               AS released_mean_micro
    FROM noised
    """,
    doc="Gaussian-mechanism clipped mean: per-user totals clipped at a"
    " sensitivity bound, Irwin-Hall integer Gaussian noise on the sum",
)
def dp_gaussian_clipped_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-sensitivity mean: clipping each user's total at C
    caps the sum's sensitivity at C, so one Gaussian draw on the SUM
    privatizes the mean. The draw is Irwin-Hall — twelve hash-uniforms
    summed and centered approximate N(0,1) in exact integer units, so
    no transcendental function enters the release. Clip rate is
    reported (the bias diagnostic a deployment tunes C with). One
    per-user groupBy, one global aggregate, one noise row."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            f"least(CAST(sum({_V}) AS BIGINT), {CLIP_MILLI})"
        ).alias("clipped"),
        F.expr(
            f"CASE WHEN sum({_V}) > {CLIP_MILLI} THEN 1 ELSE 0 END"
        ).alias("was_clipped"),
    )
    agg = per_user.agg(
        F.count("*").alias("n_users"),
        F.sum("clipped").cast("bigint").alias("clipped_sum"),
        F.sum("was_clipped").cast("bigint").alias("n_clipped"),
    )
    return agg.selectExpr(
        "n_users",
        "clipped_sum",
        "n_clipped",
        f"CAST({SIGMA_MILLI} * (({_IH_TERMS_S}) - {6 * _M})"
        f" div {_M} AS BIGINT) AS noise_milli",
    ).selectExpr(
        "n_users",
        "clipped_sum",
        "n_clipped",
        "noise_milli",
        "CAST((clipped_sum + noise_milli) * 1000 div n_users AS BIGINT)"
        " AS released_mean_micro",
    )


# exponential mechanism: utility = distinct-user reach per event type,
# bucketed to keep 2^u in BIGINT range; base-2 weights = ε rescaling
_U_SCALE = 64  # users per utility unit


@register(
    "dp_exponential_mechanism",
    f"""
    WITH util AS (
        SELECT event_type,
               CAST(least(count(DISTINCT user_id) // {_U_SCALE}, 50)
                    AS BIGINT) AS u
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT event_type, u,
               CAST(pow(2, u) AS BIGINT) AS weight
        FROM util
    ),
    cum AS (
        SELECT event_type, u, weight,
               CAST(sum(weight) OVER (ORDER BY event_type) AS BIGINT)
                   AS cum_w,
               CAST(sum(weight) OVER () AS BIGINT) AS total_w
        FROM w
    ),
    draw AS (
        SELECT cum.*, {sql_hash60("'expmech'")} % total_w AS r
        FROM cum
    )
    SELECT event_type, u AS utility, weight,
           CAST(weight * 1000000 // total_w AS BIGINT) AS p_ppm,
           CAST(CASE WHEN cum_w > r AND cum_w - weight <= r
                     THEN 1 ELSE 0 END AS BIGINT) AS chosen
    FROM draw
    """,
    doc="exponential mechanism: private selection of an event type"
    " with probability proportional to 2^utility, exact integer"
    " weights and a hash-derived draw",
)
def dp_exponential_mechanism(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Private argmax: release a CATEGORY with P ∝ exp(ε·u/2Δu). With
    integer utilities and base-2 weights (base change = ε rescaling),
    weights and the cumulative inverse-CDF draw are exact BIGINTs —
    the winner is the row whose cumulative weight interval contains
    the hash-uniform r. The full per-category table (utility, weight,
    probability, chosen flag) is the audit a DP release logs. One
    distinct-count shuffle; everything after runs over |event_type|
    rows."""
    ev = load_table(spark, sf_dir, "events")
    # utility is clamped at 50 AT THE SOURCE (not just inside the
    # weight): the released utility column must satisfy
    # weight == 2**utility on any corpus — reporting an uncapped u
    # with a capped weight silently flattened selection probabilities
    # past u = 50 (ADVICE r11 #5).
    util = ev.groupBy("event_type").agg(
        F.expr(
            f"CAST(least(count(DISTINCT user_id) div {_U_SCALE}, 50)"
            " AS BIGINT)"
        ).alias("u")
    )
    w = util.selectExpr(
        "event_type",
        "u",
        "CAST(pow(2, u) AS BIGINT) AS weight",
    )
    wc = Window.orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy()
    cum = w.select(
        "event_type",
        "u",
        "weight",
        F.sum("weight").over(wc).cast("bigint").alias("cum_w"),
        F.sum("weight").over(wt).cast("bigint").alias("total_w"),
    )
    draw = hash60_expr("'expmech'")
    return cum.selectExpr(
        "event_type",
        "u AS utility",
        "weight",
        "CAST(weight * 1000000 div total_w AS BIGINT) AS p_ppm",
        f"CAST(CASE WHEN cum_w > ({draw} % total_w)"
        f" AND cum_w - weight <= ({draw} % total_w)"
        f" THEN 1 ELSE 0 END AS BIGINT) AS chosen",
    )
