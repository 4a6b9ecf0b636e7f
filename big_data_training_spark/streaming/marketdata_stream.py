"""Streaming maintenance of the day-grain market series — the twins of
ts_bollinger_breakouts and fin_rolling_sharpe, proven to finish exactly
like the batch queries (same oracle SQL, single-sourced).

The pattern st_ohlc_stream established (streaming/ohlc_stream.py): the
per-day state is a MERGEABLE ALGEBRA — here the simplest one, purely
additive (event count and milli-value sum per day) — so each
micro-batch reduces to one tiny row per touched day, partials merge by
summation in any arrival order, and the state is O(days), never
O(events). The band/ratio statistics then run over the merged series
with the SAME finish functions the batch queries use
(operators/marketdata.py: bollinger_finish / sharpe_finish), so the
streamed and batch answers cannot diverge in the statistic — only a
bug in the day-series maintenance could separate them, and that is
exactly what the shared oracle certifies.

Scale: a real deployment keeps the per-day (n, Σ) pairs in the
aggregation state store (or a compacted changelog topic); the windowed
finish touches O(days) rows per trigger. Only the additive count/sum
needs exactly-once delivery — same contract as st_ewma_stream.

Reference stage "analyze" (README.md:18-22) + the streaming chapters
(flink/README.md:63-96): windowed series readouts maintained
incrementally rather than recomputed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark import registry as _registry
from big_data_training_spark.data import load_table
from big_data_training_spark.operators.marketdata import (
    _DAY_S,
    _V,
    bollinger_finish,
    sharpe_finish,
)
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


def _streamed_daily(spark: SparkSession, sf_dir: str, tag: str) -> DataFrame:
    """Replay the event stream and maintain the (day, n_events, d_milli)
    series incrementally: per-batch additive partials appended per day,
    merged by one tiny summation over O(days x batches) rows."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "value"
    )
    topic = _write_id_segments(
        spark, events, "event_id", f"bdts_{tag}_topic_"
    )
    partials_dir = scratch_dir(f"bdts_{tag}_partials_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.groupBy(F.expr(_DAY_S).alias("day"))
            .agg(
                F.count("*").alias("n"),
                F.sum(F.expr(_V)).alias("s"),
            )
            .write.mode("append")
            .parquet(os.path.join(partials_dir, "p"))
        )

    _run_foreach_batch(spark, topic, apply)

    return (
        spark.read.parquet(os.path.join(partials_dir, "p"))
        .groupBy("day")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("s").cast("bigint").alias("d_milli"),
        )
    )


@register(
    "st_bollinger_stream",
    # single-sourced: the streamed day series must finish exactly like
    # the batch breakout query
    _registry._REGISTRY["ts_bollinger_breakouts"].oracle,
    doc="streaming Bollinger breakouts: additive per-day (count, sum)"
    " partials merged across micro-batches; the merged series runs"
    " the batch band test and equals the batch answer",
    bench=True,
)
def st_bollinger_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the breakout monitor current while events arrive: each
    micro-batch contributes one (day, count, sum) row per touched day
    — the additive algebra merges in any arrival order — and the
    trailing-window band test runs over the merged O(days) series via
    the exact finish the batch query uses."""
    daily = _streamed_daily(spark, sf_dir, "boll")
    out = materialize(bollinger_finish(daily))
    cleanup_scratch()
    return out


@register(
    "st_sharpe_stream",
    _registry._REGISTRY["fin_rolling_sharpe"].oracle,
    doc="streaming rolling Sharpe: the same additive day-series state"
    " as st_bollinger_stream finished with the batch mean/volatility"
    " ratio; equals the batch answer",
    bench=True,
)
def st_sharpe_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The risk-adjusted-return twin: identical day-grain additive
    state, finished with the 7-day exact (n, Σ, Σ²) frame and the
    floored mean/std ratio from the batch query."""
    daily = _streamed_daily(spark, sf_dir, "sharpe")
    out = materialize(sharpe_finish(daily))
    cleanup_scratch()
    return out
