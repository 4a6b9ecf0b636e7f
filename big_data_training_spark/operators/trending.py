"""Trending scores: time-decayed leaderboards — the ranking layer
that weighs recent activity above stale volume (every feed/leaderboard
system's first non-trivial ranking function).

Exactness: exponential decay with a one-day half-life in 16-bit fixed
point — each event contributes floor(cents * 65536 / 2^age_days),
computed PER EVENT before any aggregation, so the per-user score is a
sum of integers and the batch and streaming paths are bit-identical in
any arrival order (addition commutes; the floor happens before the
merge). The decay reference day is the corpus max event day — a
one-row broadcast.

Scale: one map-side-combinable groupBy(user); the leaderboard is a
top-k heap (TakeOrderedAndProject), never a global sort. The streaming
twin appends per-batch per-user partials (additive state, O(users)
rows) and finishes with the same top-k.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark import registry as _registry
from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

LEADERBOARD_TOP = 20

_DECAY_EXPR = "cents * 65536 div CAST(pow(2, age) AS BIGINT)"

_SQL_DECAYED = """
    e AS (
        SELECT user_id,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day_num
        FROM events
    ),
    ref AS (SELECT max(day_num) AS refday FROM e),
    scored AS (
        SELECT user_id,
               cents * 65536 // CAST(pow(2, r.refday - day_num) AS BIGINT)
                   AS contrib,
               cents
        FROM e, ref r
    )
"""


@register(
    "ev_decayed_leaderboard",
    f"""
    WITH {_SQL_DECAYED}
    SELECT user_id,
           CAST(sum(contrib) AS BIGINT) AS decayed_score_fp16,
           CAST(sum(cents) AS BIGINT) AS raw_cents,
           CAST(count(*) AS BIGINT) AS n_events
    FROM scored
    GROUP BY user_id
    ORDER BY decayed_score_fp16 DESC, user_id
    LIMIT {LEADERBOARD_TOP}
    """,
    doc=f"trending leaderboard: top-{LEADERBOARD_TOP} users by"
    f" exponentially time-decayed value (1-day half-life, 16-bit fixed"
    f" point, exact per-event floor)",
)
def ev_decayed_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who is trending, not merely who accumulated the most: each
    event's cents decay by 2^-age_days (one-day half-life) in 16-bit
    fixed point, floored per event so the score is a plain integer
    sum — reorder-safe, merge-safe, engine-exact. Raw totals ride
    along so the reader sees the recency correction. One keyed
    aggregate plus a top-k heap; the decay reference (max day) is a
    one-row broadcast."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
        ).alias("day_num"),
    )
    ref = e.agg(F.max("day_num").alias("refday"))
    scored = e.crossJoin(F.broadcast(ref)).selectExpr(
        "user_id",
        "cents",
        "refday - day_num AS age",
    ).selectExpr("user_id", "cents", f"{_DECAY_EXPR} AS contrib")
    return (
        scored.groupBy("user_id")
        .agg(
            F.sum("contrib").cast("bigint").alias("decayed_score_fp16"),
            F.sum("cents").cast("bigint").alias("raw_cents"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy(F.desc("decayed_score_fp16"), F.asc("user_id"))
        .limit(LEADERBOARD_TOP)
    )


@register(
    "st_decayed_leaderboard_stream",
    # single-sourced: the streamed additive partials must finish
    # exactly like the batch decayed leaderboard (registered above in
    # THIS module — decorator-time lookup is safe here)
    _registry._REGISTRY["ev_decayed_leaderboard"].oracle,
    doc=f"streaming decayed leaderboard: per-batch per-user fixed-point"
    f" decay partials folded additively; finishing top-{LEADERBOARD_TOP}"
    f" equals the batch answer",
    bench=True,
)
def st_decayed_leaderboard_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The leaderboard maintained while events arrive: the decay
    reference day is pinned up front (the as-of-now anchor a serving
    system refreshes on its own schedule), each micro-batch appends
    its per-user contribution sums (floored per event BEFORE summing
    — the property that makes the state additive and arrival-order
    free), and the finish is the same top-k heap the batch query
    serves. State is O(users) rows regardless of throughput."""
    from big_data_training_spark.streaming.incremental import (
        _run_foreach_batch,
        _write_id_segments,
    )
    from big_data_training_spark.streaming.replay import (
        cleanup_scratch,
        materialize,
        scratch_dir,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    e = events.select(
        "event_id",
        "user_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
        ).alias("day_num"),
    )
    # The as-of-now decay anchor stays a (broadcast) 1-row DataFrame —
    # never collected to the driver; foreachBatch joins it per batch.
    ref = e.agg(F.max("day_num").alias("refday"))
    topic = _write_id_segments(
        spark, e, "event_id", "bdts_decay_topic_"
    )
    partials_dir = scratch_dir("bdts_decay_partials_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.crossJoin(F.broadcast(ref)).selectExpr(
            "user_id",
            "cents",
            "refday - day_num AS age",
        ).selectExpr(
            "user_id", "cents", f"{_DECAY_EXPR} AS contrib"
        ).groupBy("user_id").agg(
            F.sum("contrib").cast("bigint").alias("contrib"),
            F.sum("cents").cast("bigint").alias("cents"),
            F.count("*").cast("bigint").alias("n"),
        ).write.mode("append").parquet(os.path.join(partials_dir, "p"))

    _run_foreach_batch(spark, topic, apply)

    out = materialize(
        spark.read.parquet(os.path.join(partials_dir, "p"))
        .groupBy("user_id")
        .agg(
            F.sum("contrib").cast("bigint").alias("decayed_score_fp16"),
            F.sum("cents").cast("bigint").alias("raw_cents"),
            F.sum("n").cast("bigint").alias("n_events"),
        )
        .orderBy(F.desc("decayed_score_fp16"), F.asc("user_id"))
        .limit(LEADERBOARD_TOP)
    )
    cleanup_scratch()
    return out
