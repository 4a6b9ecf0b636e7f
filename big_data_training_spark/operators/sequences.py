"""Gaps-and-islands sequence analysis over the event stream.

The classic SQL interview pattern is also a real product metric:
consecutive-day activity streaks drive retention features ("7-day
streak!") and cohort heuristics. The island trick — day_number minus
row_number is constant within a run of consecutive days — needs no
self-join and no iteration: two keyed windows and an aggregate.

Scale shape: dedup to (user, day) first (one shuffle, map-side
combined — the daily-activity table is orders of magnitude smaller
than the event log), then the window partitions by user (bounded rows
per key: days, not events), then a count-keyed histogram aggregate.
Nothing in the plan grows with event volume past the first dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

_SQL_STREAKS = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', day)
                   - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, grp, count(*) AS streak_len
        FROM isl GROUP BY 1, 2
    )
    SELECT CAST(streak_len AS BIGINT) AS streak_len,
           count(*) AS n_streaks,
           count(DISTINCT user_id) AS n_users
    FROM streaks GROUP BY 1
"""


@register(
    "ev_streak_islands",
    _SQL_STREAKS,
    doc="gaps-and-islands: consecutive-day activity streak histogram"
    " (streak length -> streak count, distinct users)",
)
def ev_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day streak histogram: distinct (user, activity day),
    then the island key day_number - row_number (constant exactly while
    days are consecutive), then streak lengths and their distribution.
    The row_number window is per-user over daily rows — behavior-bounded
    state, no global sort anywhere."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    isl = days.select(
        "user_id",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01"))
            - F.row_number().over(
                Window.partitionBy("user_id").orderBy("day")
            )
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count("*").alias("streak_len"))
    return streaks.groupBy(
        F.col("streak_len").cast("bigint").alias("streak_len")
    ).agg(
        F.count("*").alias("n_streaks"),
        F.countDistinct("user_id").alias("n_users"),
    )


_SQL_LIFECYCLE = """
    WITH uw AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('week', ts) AS DATE)) // 7 AS wk
        FROM events
    ),
    seq AS (
        SELECT user_id, wk,
               lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
               lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
        FROM uw
    )
    SELECT CAST(wk AS BIGINT) AS wk,
           CAST(sum(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(sum(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_retained,
           CAST(sum(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
           CAST(sum(CASE WHEN next_wk IS NULL OR next_wk > wk + 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_churn_next
    FROM seq GROUP BY 1
"""


@register(
    "ev_lifecycle_accounting",
    _SQL_LIFECYCLE,
    doc="growth accounting: weekly new/retained/resurrected user counts"
    " plus next-week churn, from lag/lead over the user-week activity"
    " table",
)
def ev_lifecycle_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth-accounting identity (new + retained + resurrected =
    weekly actives; churn feeds next week's inactive pool) from one
    keyed lag/lead pass: dedup events to (user, week-number) — integer
    epoch weeks so both engines agree without interval arithmetic —
    classify each user-week by its predecessor, and flag churn by its
    successor. Window state is per-user active-week rows, orders of
    magnitude below event volume; the identity is asserted in tests."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr(
            "datediff(to_date(date_trunc('week', ts)), date'1970-01-01') div 7"
        ).alias("wk"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    seq = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    )
    return seq.groupBy(F.col("wk").cast("bigint").alias("wk")).agg(
        F.sum(F.when(F.col("prev_wk").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("prev_wk") == F.col("wk") - 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_wk").isNotNull()
                & (F.col("prev_wk") < F.col("wk") - 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
        F.sum(
            F.when(
                F.col("next_wk").isNull() | (F.col("next_wk") > F.col("wk") + 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_churn_next"),
    )


SURV_HORIZON_DAYS = 7
_US_PER_DAY = 86_400_000_000


@register(
    "ev_conversion_life_table",
    f"""
    WITH fc AS (
        SELECT user_id, min(ts) AS fc FROM events
        WHERE event_type = 'click' GROUP BY 1
    ),
    fp AS (
        SELECT f.user_id, min(e.ts) AS fp
        FROM fc f JOIN events e ON e.user_id = f.user_id
         AND e.event_type = 'purchase' AND e.ts > f.fc
        GROUP BY 1
    ),
    mx AS (SELECT max(ts) AS mts FROM events),
    usr AS (
        SELECT f.user_id, f.fc,
               CASE WHEN p.fp IS NULL THEN NULL
                    ELSE (epoch_us(p.fp) - epoch_us(f.fc)) // {_US_PER_DAY}
               END AS k
        FROM fc f LEFT JOIN fp p ON p.user_id = f.user_id
    ),
    ks AS (
        SELECT unnest(generate_series(0, {SURV_HORIZON_DAYS - 1})) AS k
    )
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(sum(CASE WHEN (u.k IS NULL OR u.k >= ks.k)
                AND epoch_us(u.fc) + ks.k * {_US_PER_DAY} <= epoch_us(m.mts)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_at_risk,
           CAST(sum(CASE WHEN u.k = ks.k THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted,
           CAST(CASE WHEN sum(CASE WHEN (u.k IS NULL OR u.k >= ks.k)
                AND epoch_us(u.fc) + ks.k * {_US_PER_DAY} <= epoch_us(m.mts)
                THEN 1 ELSE 0 END) = 0 THEN 0
                ELSE (1000 * sum(CASE WHEN u.k = ks.k THEN 1 ELSE 0 END))
                     // sum(CASE WHEN (u.k IS NULL OR u.k >= ks.k)
                AND epoch_us(u.fc) + ks.k * {_US_PER_DAY} <= epoch_us(m.mts)
                THEN 1 ELSE 0 END) END AS BIGINT) AS hazard_permille
    FROM ks, usr u, mx m
    GROUP BY 1
    """,
    doc="discrete survival life table: day-offset hazard of first"
    " purchase after first click, right-censored at the log horizon",
)
def ev_conversion_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kaplan–Meier input table in exact integers: cohort = users
    with a first click; event = first purchase strictly after it;
    offset k = whole days between them. Per day offset: users still at
    risk (not yet converted AND still observable before the log's right
    edge — right censoring), conversions at exactly k, and the discrete
    hazard in permille. Day-offset replication is the only fan-out
    (users × horizon, never events × anything), and every leg is a
    keyed min aggregate on user_id — one shuffle each at any scale."""
    ev = load_table(spark, sf_dir, "events")
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fc"))
    )
    fp = (
        fc.join(
            ev.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("pts")
            ),
            "user_id",
        )
        .filter(F.col("pts") > F.col("fc"))
        .groupBy("user_id")
        .agg(F.min("pts").alias("fp"))
    )
    mx = ev.agg(F.max("ts").alias("mts"))
    usr = fc.join(fp, "user_id", "left").select(
        "fc",
        F.expr(
            f"CASE WHEN fp IS NULL THEN NULL"
            f" ELSE (unix_micros(fp) - unix_micros(fc)) div {_US_PER_DAY} END"
        ).alias("k_conv"),
    )
    ks = spark.range(SURV_HORIZON_DAYS).select(F.col("id").alias("k"))
    at_risk = (
        f"CASE WHEN (k_conv IS NULL OR k_conv >= k)"
        f" AND unix_micros(fc) + k * {_US_PER_DAY} <= unix_micros(mts)"
        f" THEN 1 ELSE 0 END"
    )
    conv = "CASE WHEN k_conv = k THEN 1 ELSE 0 END"
    return (
        usr.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(mx))
        .groupBy(F.col("k").cast("bigint").alias("k"))
        .agg(
            F.sum(F.expr(at_risk)).cast("bigint").alias("n_at_risk"),
            F.sum(F.expr(conv)).cast("bigint").alias("n_converted"),
        )
        .select(
            "k",
            "n_at_risk",
            "n_converted",
            F.expr(
                "CASE WHEN n_at_risk = 0 THEN 0"
                " ELSE (1000 * n_converted) div n_at_risk END"
            )
            .cast("bigint")
            .alias("hazard_permille"),
        )
    )


@register(
    "ev_interarrival_percentiles",
    """
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    )
    SELECT event_type,
           count(*) AS n_gaps,
           CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY gap_us)
               AS BIGINT) AS p50_us,
           CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY gap_us)
               AS BIGINT) AS p90_us,
           CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY gap_us)
               AS BIGINT) AS p99_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    doc="per-type inter-arrival gap percentiles (exact discrete picks"
    " over per-user lag gaps, microsecond integers)",
)
def ev_interarrival_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The arrival-process profile behind rate limits and session-gap
    choices: per (user, type) consecutive-event gaps via one keyed lag
    window (microsecond BIGINTs — no float time math), then exact
    discrete percentiles per type. Discrete picks select actual
    elements so both engines agree bit-for-bit; at 100 TB swap in
    approx_percentile for the same shape with sketch merges."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    aggs = [
        F.expr(f"cast(percentile_disc({p}) within group (order by gap_us)"
               " as bigint)").alias(a)
        for p, a in ((0.50, "p50_us"), (0.90, "p90_us"), (0.99, "p99_us"))
    ]
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"), *aggs
    )
