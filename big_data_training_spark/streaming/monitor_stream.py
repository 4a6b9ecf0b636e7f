"""Streaming maintenance of the monitoring layer: the EWMA baseline
and the bitmap audience index, each maintained per micro-batch and
proven to finish exactly like its batch twin (same oracle SQL).

Two different merge algebras, deliberately:

* The EWMA's sufficient statistic (day → cents) is ADDITIVE — partials
  sum, so each redelivery would double-count and delivery must be
  exactly-once (Spark's checkpointed batchId contract, proven
  elsewhere by st_pyds_exactly_once_sink).
* The bitmap words are IDEMPOTENT under their merge (bit_or): a
  replayed segment ORs the same bits again and changes nothing. This
  module *deliberately redelivers the first micro-batch* and the
  result still hash-matches the batch oracle — the algebraic reason
  bitmap indexes are the low-anxiety stateful operator under
  at-least-once delivery (kafka/README.md:198-200 redelivery
  semantics).

Both states are volume-free: O(keys·days) rows for the EWMA, O(U/32)
words per audience for the bitmap, regardless of event throughput.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark import registry as _registry
from big_data_training_spark.data import load_table
from big_data_training_spark.operators import bitmap as _bitmap
from big_data_training_spark.operators import forecast as _forecast
from big_data_training_spark.operators import netchange as _netchange
from big_data_training_spark.operators import regression as _regression
from big_data_training_spark.registry import register
from big_data_training_spark.streaming.incremental import (
    _run_foreach_batch,
    _write_id_segments,
)
from big_data_training_spark.streaming.replay import (
    cleanup_scratch,
    materialize,
    scratch_dir,
)


@register(
    "st_ewma_stream",
    # single-sourced: the streamed day-state must finish exactly like
    # the batch EWMA — additivity of the daily cents is under test
    _registry._REGISTRY["ev_ewma_value"].oracle,
    doc="streaming EWMA baseline: per-batch (event_type, day) cents"
    " partials folded additively; the finishing smoother over the"
    " bounded day state equals the batch answer",
    bench=True,
)
def st_ewma_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the anomaly-detection baseline while events arrive:
    each micro-batch appends its own groupBy((event_type, day)) cents
    sums (map-side combined, O(keys·days) rows); state is their sum —
    additive in any arrival order, so id-ordered (non-time-ordered)
    segments still converge. The EWMA itself runs over the finished
    day table only (finish_ewma, the code the batch query runs), so
    smoothing cost is independent of event volume."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    topic = _write_id_segments(spark, events, "event_id", "bdts_ewma_topic_")
    partials_dir = scratch_dir("bdts_ewma_partials_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        ).agg(
            F.expr(
                "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)"
            ).alias("cents")
        ).write.mode("append").parquet(os.path.join(partials_dir, "p"))

    _run_foreach_batch(spark, topic, apply)

    daily = (
        spark.read.parquet(os.path.join(partials_dir, "p"))
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    out = materialize(_forecast.finish_ewma(daily))
    cleanup_scratch()
    return out


@register(
    "st_bitmap_stream",
    # single-sourced from the batch bitmap retention — and the stream
    # REDELIVERS its first micro-batch: bit_or idempotence must absorb it
    _registry._REGISTRY["ev_bitmap_retention"].oracle,
    doc="streaming bitmap index maintenance under deliberate"
    " redelivery: per-batch word partials OR-merged (idempotent), so"
    " at-least-once delivery still matches the batch oracle",
    bench=True,
)
def st_bitmap_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the audience bitmap index from the stream — and prove
    the at-least-once story: the first micro-batch's word partials are
    written TWICE (simulated redelivery), yet the final report still
    hash-matches the batch oracle because bit_or is idempotent —
    duplicate bits change nothing. Contrast st_ewma_stream, whose
    additive state would double-count and therefore rides on
    exactly-once batch semantics. Per batch: one map-side-combined
    groupBy((event_type, day, word_idx)); state is O(audiences·U/32)
    words; the retention join (finish_retention, the batch code) runs
    over state only."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id"
    )
    topic = _write_id_segments(spark, events, "event_id", "bdts_bmap_topic_")
    partials_dir = scratch_dir("bdts_bmap_partials_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        words = batch_df.groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.expr("user_id div 32").alias("word_idx"),
        ).agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT),"
                " CAST(user_id % 32 AS INT)))"
            ).alias("w")
        )
        writes = 2 if epoch_id == 0 else 1  # deliberate redelivery
        for _ in range(writes):
            words.write.mode("append").parquet(
                os.path.join(partials_dir, "p")
            )

    _run_foreach_batch(spark, topic, apply)

    words = (
        spark.read.parquet(os.path.join(partials_dir, "p"))
        .groupBy("event_type", "day", "word_idx")
        .agg(F.expr("bit_or(w)").alias("w"))
    )
    out = materialize(_bitmap.finish_retention(words))
    cleanup_scratch()
    return out


@register(
    "st_trend_stream",
    # single-sourced: streamed (event_type, day) partials must finish
    # through the same normal equations as the batch OLS
    _registry._REGISTRY["ev_trend_ols"].oracle,
    doc="streaming OLS trend: per-batch daily cents partials folded"
    " additively; the normal-equation finish over the bounded day"
    " state equals the batch regression",
    bench=True,
)
def st_trend_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the capacity-planning trend line current while events
    arrive: each micro-batch appends its groupBy((event_type, day))
    cents sums; the five OLS sufficient statistics are themselves sums
    over that day table, so the whole regression state is additive in
    any arrival order. The finishing step (finish_ols — the code the
    batch ev_trend_ols runs) touches O(keys·days) rows; regression
    cost never scales with event volume."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    topic = _write_id_segments(spark, events, "event_id", "bdts_trend_topic_")
    partials_dir = scratch_dir("bdts_trend_partials_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.groupBy(
            "event_type",
            F.expr(
                "CAST(datediff(date_trunc('day', ts),"
                " TIMESTAMP '2024-01-01') AS BIGINT)"
            ).alias("x"),
        ).agg(
            F.expr(
                "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)"
            ).alias("y")
        ).write.mode("append").parquet(os.path.join(partials_dir, "p"))

    _run_foreach_batch(spark, topic, apply)

    daily = (
        spark.read.parquet(os.path.join(partials_dir, "p"))
        .groupBy("event_type", "x")
        .agg(F.sum("y").cast("bigint").alias("y"))
    )
    out = materialize(_regression.finish_ols(daily))
    cleanup_scratch()
    return out


@register(
    "st_net_effect_stream",
    # single-sourced: per-batch edge-state partials must merge to the
    # batch net-effect classification
    _registry._REGISTRY["cdc_net_effect"].oracle,
    doc="streaming CDC net-effect: per-key window-edge states"
    " maintained as argmax-mergeable (ts, event_id, type) partials;"
    " the merged classification equals the batch coalescing",
    bench=True,
)
def st_net_effect_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-effect coalescing while the changelog streams in: the state
    per key is two 'latest record' views — latest before the window
    and latest inside it — plus the in-window change count. All three
    are MERGEABLE: latest-wins is an argmax over (ts, event_id)
    (taking the max of per-batch argmaxes is the global argmax) and
    the count is additive, so arrival order never matters. Each
    micro-batch appends its own tiny per-key partial; the finish
    merges partials and runs the batch classifier's CASE. The state
    is O(keys), the per-batch work is one keyed aggregate, and the
    equality with the batch oracle is exactly the mergeability claim."""
    NET_LO, NET_HI = _netchange.NET_LO, _netchange.NET_HI
    TOMBSTONE = _netchange.TOMBSTONE
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    topic = _write_id_segments(spark, events, "event_id", "bdts_net_topic_")
    partials_dir = scratch_dir("bdts_net_partials_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.filter(F.col("ts") < NET_HI).groupBy("user_id").agg(
            F.expr(
                f"max_by(struct(ts, event_id, event_type),"
                f" struct(ts, event_id))"
                f" FILTER (WHERE ts < TIMESTAMP '{NET_LO}')"
            ).alias("before_last"),
            F.expr(
                f"max_by(struct(ts, event_id, event_type),"
                f" struct(ts, event_id))"
                f" FILTER (WHERE ts >= TIMESTAMP '{NET_LO}')"
            ).alias("win_last"),
            F.expr(
                f"count(*) FILTER (WHERE ts >= TIMESTAMP '{NET_LO}')"
            ).alias("n_win"),
        ).write.mode("append").parquet(os.path.join(partials_dir, "p"))

    _run_foreach_batch(spark, topic, apply)

    merged = (
        spark.read.parquet(os.path.join(partials_dir, "p"))
        .groupBy("user_id")
        .agg(
            F.expr(
                "max_by(before_last, struct(before_last.ts,"
                " before_last.event_id))"
            ).alias("before_last"),
            F.expr(
                "max_by(win_last, struct(win_last.ts, win_last.event_id))"
            ).alias("win_last"),
            F.sum("n_win").alias("n_changes"),
        )
        .filter(F.col("win_last").isNotNull() & (F.col("n_changes") > 0))
    )
    classified = merged.selectExpr(
        "n_changes",
        f"""CASE
            WHEN (before_last IS NULL
                  OR before_last.event_type = '{TOMBSTONE}')
                 AND win_last.event_type <> '{TOMBSTONE}' THEN 'inserted'
            WHEN before_last IS NULL
                 OR before_last.event_type = '{TOMBSTONE}' THEN 'cancelled'
            WHEN win_last.event_type = '{TOMBSTONE}' THEN 'deleted'
            ELSE 'updated'
        END AS net_op""",
    )
    out = materialize(
        classified.groupBy("net_op")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("n_changes").cast("bigint").alias("n_raw_changes"),
        )
        .selectExpr(
            "net_op",
            "n_keys",
            "n_raw_changes",
            "n_raw_changes div n_keys AS coalesce_factor_floor",
        )
        .orderBy("net_op")
    )
    cleanup_scratch()
    return out
