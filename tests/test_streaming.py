"""Streaming semantics: stream-batch equivalence (SURVEY.md §5) and
checkpoint/recovery (ST3)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.streaming.replay import (
    read_stream_table,
    run_to_completion,
)


def test_stream_batch_equivalence_counts(spark, sf_dir):
    stream = read_stream_table(spark, sf_dir, "events")
    got = run_to_completion(
        stream.groupBy("event_type").agg(F.count("*").alias("n")), "complete"
    )
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_checkpoint_recovery_resumes_not_reprocesses(spark, sf_dir):
    """ST3: restart from checkpoint must not re-emit processed offsets
    (kafka/README.md:357-358 changelog-restore analog)."""
    src_dir = tempfile.mkdtemp(prefix="bdts_ck_src_")
    ckpt = tempfile.mkdtemp(prefix="bdts_ck_")
    sink_dir = tempfile.mkdtemp(prefix="bdts_ck_sink_")

    events = load_table(spark, sf_dir, "events").limit(200).select("event_id")
    events.write.mode("overwrite").parquet(os.path.join(src_dir, "batch1"))

    schema = "event_id bigint"

    def run_once() -> int:
        stream = spark.readStream.schema(schema).parquet(src_dir + "/*")
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.read.parquet(sink_dir).count()

    n1 = run_once()
    assert n1 == 200
    # restart with the same checkpoint, no new data → no re-emission,
    # sink still holds exactly one copy of each offset
    n2 = run_once()
    assert n2 == 200
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(sink_dir, ignore_errors=True)
