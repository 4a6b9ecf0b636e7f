"""Multi-touch revenue attribution over the event stream.

The reference's event-pipeline story (kafka/README.md stream
enrichment + windowed joins) stops at the join; attribution is the
canonical *business* consumer of that join — credit each purchase's
revenue to the marketing touches (click/view) that preceded it within
a lookback window. Two standard models, both integer-exact in cents:

* last-touch — the whole purchase goes to the most recent touch;
* linear — the purchase is split evenly across all touches in the
  window, with the floor-division remainder assigned to the most
  recent touch so every purchase's cents are conserved exactly
  (Σ credits == Σ attributed purchase cents, asserted in tests).

Scale design (100 TB): the purchase×touch pairing is an equi-join on
user_id with a time-band predicate — per-user row groups are bounded
by human behavior (events/user/day), so the join is linear in events;
skewed power-users would be salted exactly like j_skew_salted_join.
The 24 h band means a day-bucketed range join (operators/joins.py
j_range_band_join pattern) drops the per-user scan from the user's
full history to two day buckets. Credit math is all BIGINT cents
(floor(value*100) — same IEEE double op in both engines), so the
oracle hash-matches bit-for-bit; 'unattributed' purchases (no touch in
the window) are reported as their own channel row via an anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

LOOKBACK_HOURS = 24
TOUCH_TYPES = ("click", "view")
HALF_LIFE_HOURS = 6  # time-decay model: weight halves every 6 h of age

_SQL_BASE = f"""
    purchases AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS channel
        FROM events WHERE event_type IN ('click', 'view')
    ),
    joined AS (
        SELECT p.p_id, p.cents, p.p_ts, t.channel, t.t_ts, t.t_id
        FROM purchases p JOIN touches t ON p.user_id = t.user_id
         AND t.t_ts < p.p_ts
         AND t.t_ts >= p.p_ts - INTERVAL {LOOKBACK_HOURS} HOUR
    ),
    ranked AS (
        SELECT p_id, cents, channel,
               row_number() OVER (
                   PARTITION BY p_id ORDER BY t_ts DESC, t_id DESC
               ) AS rn
        FROM joined
    ),
    unattributed AS (
        SELECT 'unattributed' AS channel,
               count(*) AS n_credits,
               CAST(coalesce(sum(cents), 0) AS BIGINT) AS credited_cents
        FROM purchases
        WHERE p_id NOT IN (SELECT p_id FROM joined)
        HAVING count(*) > 0
    )
"""

_SQL_LAST_TOUCH = f"""
    WITH {_SQL_BASE}
    SELECT channel, count(*) AS n_credits,
           CAST(sum(cents) AS BIGINT) AS credited_cents
    FROM ranked WHERE rn = 1 GROUP BY 1
    UNION ALL
    SELECT * FROM unattributed
"""

_SQL_LINEAR = f"""
    WITH {_SQL_BASE},
    counts AS (
        SELECT p_id, count(*) AS n FROM joined GROUP BY 1
    ),
    credits AS (
        SELECT r.channel,
               CASE WHEN r.rn = 1
                    THEN r.cents - (c.n - 1) * (r.cents // c.n)
                    ELSE r.cents // c.n END AS credit_cents
        FROM ranked r JOIN counts c ON r.p_id = c.p_id
    )
    SELECT channel, count(*) AS n_credits,
           CAST(sum(credit_cents) AS BIGINT) AS credited_cents
    FROM credits GROUP BY 1
    UNION ALL
    SELECT * FROM unattributed
"""


def _purchase_touch_join(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(purchases, ranked touch-join) shared by both attribution models.

    One equi-join on user_id; the time band is a join-side filter so
    Catalyst keeps it a hash join on the user key (per-user groups are
    behavior-bounded — no pair explosion)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100).alias("cents"),
    )
    touches = events.filter(F.col("event_type").isin(*TOUCH_TYPES)).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    joined = purchases.join(touches, "user_id").filter(
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {LOOKBACK_HOURS} HOURS"))
    )
    ranked = joined.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("p_id").orderBy(F.desc("t_ts"), F.desc("t_id"))
        ),
    )
    return purchases, ranked


def _unattributed(purchases: DataFrame, ranked: DataFrame) -> DataFrame:
    """Purchases with no touch in the lookback window, as one channel row
    (empty → zero rows, matching the oracle's HAVING count(*) > 0)."""
    return (
        purchases.join(ranked.select("p_id").distinct(), "p_id", "left_anti")
        .groupBy(F.lit("unattributed").alias("channel"))
        .agg(
            F.count("*").alias("n_credits"),
            F.sum("cents").alias("credited_cents"),
        )
    )


@register(
    "ev_attribution_last_touch",
    _SQL_LAST_TOUCH,
    doc="last-touch revenue attribution: purchase cents credited to the"
    f" most recent click/view within {LOOKBACK_HOURS}h, plus the"
    " unattributed remainder channel",
)
def ev_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit each purchase's full cents to its most recent preceding
    touch (ties broken by event_id — fully deterministic); purchases
    with no touch in the window roll up into an 'unattributed' row so
    total credited cents always equals total purchase cents."""
    purchases, ranked = _purchase_touch_join(spark, sf_dir)
    attributed = (
        ranked.filter(F.col("rn") == 1)
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_credits"),
            F.sum("cents").alias("credited_cents"),
        )
    )
    return attributed.unionByName(_unattributed(purchases, ranked))


@register(
    "ev_attribution_linear",
    _SQL_LINEAR,
    doc="linear multi-touch attribution: purchase cents split evenly"
    " across in-window touches, floor-division remainder to the most"
    " recent touch (cents conserved exactly)",
    bench=True,
)
def ev_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each purchase's cents evenly over its in-window touches.
    Integer-exact conservation: every touch gets cents div n and the
    most recent touch additionally absorbs the remainder
    (cents - (n-1)*(cents div n)), so per-purchase credits sum to the
    purchase exactly — no float drift to reconcile downstream."""
    purchases, ranked = _purchase_touch_join(spark, sf_dir)
    counts = ranked.groupBy("p_id").agg(F.count("*").alias("n"))
    credits = ranked.join(counts, "p_id").select(
        "channel",
        F.when(
            F.col("rn") == 1,
            F.col("cents") - (F.col("n") - 1) * F.expr("cents div n"),
        )
        .otherwise(F.expr("cents div n"))
        .alias("credit_cents"),
    )
    attributed = credits.groupBy("channel").agg(
        F.count("*").alias("n_credits"),
        F.sum("credit_cents").alias("credited_cents"),
    )
    return attributed.unionByName(_unattributed(purchases, ranked))


_SQL_TIME_DECAY = f"""
    WITH {_SQL_BASE},
    weighted AS (
        SELECT p_id, cents, channel, t_ts, t_id,
               CAST(1 << (({LOOKBACK_HOURS} - 1 -
                   (epoch_us(p_ts) - epoch_us(t_ts)) // 3600000000)
                   // {HALF_LIFE_HOURS}) AS BIGINT) AS w,
               row_number() OVER (
                   PARTITION BY p_id ORDER BY t_ts DESC, t_id DESC
               ) AS rn
        FROM joined
    ),
    shared AS (
        SELECT p_id, channel, rn, cents,
               (cents * w) // sum(w) OVER (PARTITION BY p_id) AS base
        FROM weighted
    ),
    based AS (
        SELECT channel, rn, cents, base,
               sum(base) OVER (PARTITION BY p_id) AS sum_base
        FROM shared
    )
    SELECT channel, count(*) AS n_credits,
           CAST(sum(base + CASE WHEN rn = 1 THEN cents - sum_base
                                ELSE 0 END) AS BIGINT) AS credited_cents
    FROM based GROUP BY 1
    UNION ALL
    SELECT * FROM unattributed
"""


@register(
    "ev_attribution_time_decay",
    _SQL_TIME_DECAY,
    doc="time-decay multi-touch attribution: touch weight halves every"
    f" {HALF_LIFE_HOURS}h of age (power-of-two integer weights), credit"
    " = cents*w div sum(w) with the remainder to the most recent touch",
)
def ev_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-decay credit: a touch aged ``a`` hours carries weight
    2^((24-1-a) div 6) in {1,2,4,8} — integer-exact on both engines (bit
    shift, never pow()), so newer touches earn strictly heavier shares.
    Each purchase's cents split as cents*w div sum(w) with the floor
    remainder assigned to the most recent touch — conservation holds
    exactly, same invariant as the linear model. Plan shape is identical
    to linear attribution (one user_id equi-join + per-purchase windows),
    so the same salting/banding story covers it at 100 TB."""
    purchases, ranked = _purchase_touch_join(spark, sf_dir)
    weighted = ranked.withColumn(
        "w",
        F.expr(
            f"cast(shiftleft(1, cast(({LOOKBACK_HOURS} - 1"
            " - (unix_micros(p_ts) - unix_micros(t_ts)) div 3600000000)"
            f" div {HALF_LIFE_HOURS} as int)) as bigint)"
        ),
    )
    by_p = Window.partitionBy("p_id")
    based = (
        weighted.select(
            "p_id",
            "channel",
            "rn",
            "cents",
            F.expr("cents * w").alias("cw"),
            F.sum("w").over(by_p).alias("tot_w"),
        )
        .select(
            "p_id",
            "channel",
            "rn",
            "cents",
            F.expr("cw div tot_w").alias("base"),
        )
        .withColumn("sum_base", F.sum("base").over(by_p))
    )
    attributed = based.select(
        "channel",
        (
            F.col("base")
            + F.when(F.col("rn") == 1, F.col("cents") - F.col("sum_base")).otherwise(
                F.lit(0)
            )
        ).alias("credit_cents"),
    ).groupBy("channel").agg(
        F.count("*").alias("n_credits"),
        F.sum("credit_cents").alias("credited_cents"),
    )
    return attributed.unionByName(_unattributed(purchases, ranked))


_SQL_POSITION = f"""
    WITH {_SQL_BASE},
    ranked2 AS (
        SELECT p_id, cents, channel,
               row_number() OVER (
                   PARTITION BY p_id ORDER BY t_ts DESC, t_id DESC
               ) AS rn,
               row_number() OVER (
                   PARTITION BY p_id ORDER BY t_ts ASC, t_id ASC
               ) AS rn_asc,
               count(*) OVER (PARTITION BY p_id) AS n
        FROM joined
    ),
    credits AS (
        SELECT channel,
               CASE
                   WHEN n = 1 THEN cents
                   WHEN rn_asc = 1 THEN (2 * cents) // 5
                   WHEN rn = 1 THEN cents - (2 * cents) // 5
                       - (n - 2) * (CASE WHEN n > 2
                           THEN (cents - 2 * ((2 * cents) // 5)) // (n - 2)
                           ELSE 0 END)
                   ELSE (cents - 2 * ((2 * cents) // 5)) // (n - 2)
               END AS credit_cents
        FROM ranked2
    )
    SELECT channel, count(*) AS n_credits,
           CAST(sum(credit_cents) AS BIGINT) AS credited_cents
    FROM credits GROUP BY 1
    UNION ALL
    SELECT * FROM unattributed
"""


@register(
    "ev_attribution_position",
    _SQL_POSITION,
    doc="position-based (U-shaped) attribution: 40% first touch, 40%"
    " last touch, 20% split across middles, floor remainders to the"
    " last touch (cents conserved exactly)",
)
def ev_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The U-shaped model marketers pair with last-touch/linear/decay:
    the introducing and converting touches each take 40% (2*cents div
    5), the middle touches split the remaining pool evenly, and every
    floor remainder rolls into the last touch so per-purchase credits
    sum to the purchase exactly. Single-touch purchases keep 100%;
    two-touch purchases split 40/60 by the same remainder rule. Same
    one-join + per-purchase-window plan as the other three models."""
    purchases, ranked = _purchase_touch_join(spark, sf_dir)
    by_p = Window.partitionBy("p_id")
    ranked2 = ranked.withColumn(
        "rn_asc",
        F.row_number().over(by_p.orderBy(F.asc("t_ts"), F.asc("t_id"))),
    ).withColumn("n", F.count("*").over(by_p))
    mid = "(cents - 2 * ((2 * cents) div 5)) div (n - 2)"
    credit = F.expr(
        f"""CASE
            WHEN n = 1 THEN cents
            WHEN rn_asc = 1 THEN (2 * cents) div 5
            WHEN rn = 1 THEN cents - (2 * cents) div 5
                - (n - 2) * (CASE WHEN n > 2 THEN {mid} ELSE 0 END)
            ELSE {mid}
        END"""
    )
    attributed = (
        ranked2.select("channel", credit.alias("credit_cents"))
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_credits"),
            F.sum("credit_cents").alias("credited_cents"),
        )
    )
    return attributed.unionByName(_unattributed(purchases, ranked))
