"""Streaming change-point monitoring: CUSUM maintained over an event
stream via its additive sufficient statistic.

CUSUM looks inherently batch — it is a cumulative scan over the
time-ordered daily series — but its input is just the daily histogram
(day → count), which is additive across micro-batches in ANY arrival
order. So the stream maintains only that bounded state (one row per
calendar day, regardless of event volume) and the CUSUM scan replays
over the final state in milliseconds. The oracle is single-sourced
from the batch ``ev_cusum_changepoint`` registration: the stream must
converge to the batch answer exactly, which is precisely the
additivity claim under test. Segment replay and state plumbing reuse
streaming/incremental.py (maxFilesPerTrigger=1 parquet segments,
foreachBatch append of per-batch partials).

Scale note: at 100 TB/day the per-batch partial is one map-side-combined
groupBy(day) — a few hundred output rows per batch — and the state
table is O(days). The CUSUM finishing scan is a window over days, not
events, so monitoring cost is independent of event volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark import registry as _registry
from big_data_training_spark.data import load_table
from big_data_training_spark.operators import behavior as _behavior  # noqa: F401
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
    "st_cusum_stream",
    # single-sourced from the batch CUSUM scan — additivity of the
    # daily-count sufficient statistic is what is being verified
    _registry._REGISTRY["ev_cusum_changepoint"].oracle,
    doc="streaming CUSUM: per-batch daily-count partials folded"
    " additively; change-point scan over the bounded day state equals"
    " the batch scan",
    bench=True,
)
def st_cusum_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitor the event-rate regime while events stream in: each
    micro-batch appends its own groupBy(day) counts (map-side combined,
    O(days) rows); the state is the additive sum per day. The finishing
    CUSUM — cumulative deviation from the global mean, integer-scaled —
    runs over the day table only, so it is volume-free. Segments are
    event_id-ordered, i.e. arrival order is NOT time order, which is
    the point: the sufficient statistic is order-insensitive even
    though CUSUM itself is a time-ordered scan."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    topic = _write_id_segments(spark, events, "event_id", "bdts_cusum_topic_")
    partials_dir = scratch_dir("bdts_cusum_partials_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
            F.count("*").alias("n")
        ).write.mode("append").parquet(os.path.join(partials_dir, "p"))

    _run_foreach_batch(spark, topic, apply)

    d = (
        spark.read.parquet(os.path.join(partials_dir, "p"))
        .groupBy("day")
        .agg(F.sum("n").alias("n"))
    )
    t = d.agg(F.sum("n").alias("total"), F.count("*").alias("nd"))
    w = Window.orderBy("day")
    c = d.select(
        "day",
        "n",
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(w).alias("rn"),
    )
    scored = c.crossJoin(F.broadcast(t)).select(
        "day",
        "n",
        (F.col("cum") * F.col("nd") - F.col("rn") * F.col("total"))
        .cast("bigint")
        .alias("cusum"),
    )
    peak = scored.agg(F.max(F.abs("cusum")).alias("m"))
    out = materialize(
        scored.crossJoin(F.broadcast(peak)).select(
            "day",
            F.col("n").alias("n_events"),
            F.col("cusum").alias("cusum_scaled"),
            F.when(F.abs("cusum") == F.col("m"), 1).otherwise(0).alias("is_peak"),
        )
    )
    cleanup_scratch()
    return out
