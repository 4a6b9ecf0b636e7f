"""Streaming maintenance of OHLC bars — the market-data twin of
fin_ohlc_bars, proven to finish exactly like the batch query (same
oracle SQL).

The per-hour bar state is a MERGE of four algebras: open/close are
argmin/argmax over the total event order (ts, event_id) — taking the
min/max of per-batch argmins/argmaxes is the global one — high/low are
plain min/max (idempotent), and the trade count is additive (the one
component that needs exactly-once, same contract as st_ewma_stream).
Each micro-batch contributes one tiny row per touched hour; the state
is O(hours), never O(events).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark import registry as _registry
from big_data_training_spark.data import load_table
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

_V = "CAST(floor(value * 1000) AS BIGINT)"
_HR = "unix_micros(ts) div 3600000000"


@register(
    "st_ohlc_stream",
    # single-sourced: the streamed per-hour bar state must finish
    # exactly like the batch candlestick reduction
    _registry._REGISTRY["fin_ohlc_bars"].oracle,
    doc="streaming OHLC bars: per-batch per-hour (argmin open, argmax"
    " close, min/max, count) partials merged by their natural"
    " algebras; the merged bars equal the batch reduction",
    bench=True,
)
def st_ohlc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep candlesticks current while trades arrive: each micro-batch
    reduces to one row per touched hour carrying its own open/close
    (argmin/argmax under the total order (ts, event_id) — encoded as a
    struct so min/max of per-batch rows IS the cross-batch argmin),
    high/low, and count. Merging per-batch partials is a second tiny
    aggregate over O(hours) rows; openness to out-of-order arrival is
    the algebra itself (only the count needs exactly-once delivery).
    The finish re-emits exactly the batch fin_ohlc_bars shape."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", "value")
    )
    topic = _write_id_segments(spark, events, "event_id", "bdts_ohlc_topic_")
    partials_dir = scratch_dir("bdts_ohlc_partials_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        hr = F.expr(_HR)
        wa = Window.partitionBy(hr).orderBy("ts", "event_id")
        wd = Window.partitionBy(hr).orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        t = batch_df.select(
            hr.alias("hr"),
            "ts",
            "event_id",
            F.expr(_V).alias("v"),
            F.row_number().over(wa).alias("ra"),
            F.row_number().over(wd).alias("rd"),
        )
        (
            t.groupBy("hr")
            .agg(
                F.max(
                    F.when(
                        F.col("ra") == 1,
                        F.struct("ts", "event_id", F.col("v").alias("v")),
                    )
                ).alias("o"),
                F.max(
                    F.when(
                        F.col("rd") == 1,
                        F.struct("ts", "event_id", F.col("v").alias("v")),
                    )
                ).alias("c"),
                F.max("v").alias("hi"),
                F.min("v").alias("lo"),
                F.count("*").alias("n"),
            )
            .select(
                "hr",
                F.col("o.ts").alias("ots"),
                F.col("o.event_id").alias("oeid"),
                F.col("o.v").alias("ov"),
                F.col("c.ts").alias("cts"),
                F.col("c.event_id").alias("ceid"),
                F.col("c.v").alias("cv"),
                "hi",
                "lo",
                "n",
            )
            .write.mode("append")
            .parquet(os.path.join(partials_dir, "p"))
        )

    _run_foreach_batch(spark, topic, apply)

    merged = (
        spark.read.parquet(os.path.join(partials_dir, "p"))
        .groupBy("hr")
        .agg(
            # min/max over (ts, event_id, v) structs: the unique total
            # order makes the struct extremum the global argmin/argmax
            F.min(F.struct("ots", "oeid", "ov")).alias("o"),
            F.max(F.struct("cts", "ceid", "cv")).alias("c"),
            F.max("hi").cast("bigint").alias("high_milli"),
            F.min("lo").cast("bigint").alias("low_milli"),
            F.sum("n").cast("bigint").alias("n_trades"),
        )
        .select(
            "hr",
            F.col("o.ov").cast("bigint").alias("open_milli"),
            "high_milli",
            "low_milli",
            F.col("c.cv").cast("bigint").alias("close_milli"),
            "n_trades",
        )
        .filter(F.col("n_trades") >= 3)
    )
    out = materialize(merged)
    cleanup_scratch()
    return out
