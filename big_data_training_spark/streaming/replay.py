"""Replay helpers: run a bounded streaming topology to completion.

ST5 reprocessing (kafka/README.md:310, 335-337) rests on replayable
logs; here any fixture Parquet "topic" can be re-consumed as a stream
(S1 stream form). ``run_to_completion`` drives the micro-batch loop
synchronously and returns the materialized sink table.

Scratch hygiene: every temp dir a streaming query creates (topic
symlink dirs, checkpoints, parquet sinks) is tracked per-thread and
removed once the sink is materialized, so a long-lived driver session
sweeping the registry repeatedly does not accumulate disk or leak
memory-sink temp views. Thread-local tracking keeps concurrent queries
on separate threads from deleting each other's scratch space.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession

_scratch = threading.local()


def scratch_dir(prefix: str) -> str:
    """mkdtemp tracked for post-materialization cleanup (this thread)."""
    d = tempfile.mkdtemp(prefix=prefix)
    if not hasattr(_scratch, "dirs"):
        _scratch.dirs = []
    _scratch.dirs.append(d)
    return d


def cleanup_scratch() -> None:
    """Remove every scratch dir created on this thread. Call only after
    the result no longer references the files (post-``localCheckpoint``)."""
    dirs = getattr(_scratch, "dirs", [])
    while dirs:
        shutil.rmtree(dirs.pop(), ignore_errors=True)


def materialize(df: DataFrame) -> DataFrame:
    """Decouple a result from its backing files/views: eager
    localCheckpoint stores the partitions block-side, after which the
    source scratch dirs and temp views can be dropped."""
    return df.localCheckpoint(eager=True)


def read_stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1 stream form: subscribe to a Parquet topic as an unbounded
    source. The static schema read is metadata-only (no data scan)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    from big_data_training_spark.data import _read_parquet_nanosafe, canonicalize_ts

    schema = _read_parquet_nanosafe(spark, path).schema
    # The file stream source wants a directory to monitor (a "topic"
    # directory into which new log segments land); expose the fixture
    # file through a scratch dir of symlinks.
    topic_dir = scratch_dir(f"bdts_topic_{name}_")
    os.symlink(path, os.path.join(topic_dir, f"{name}.parquet"))
    return canonicalize_ts(spark.readStream.schema(schema).parquet(topic_dir))


def run_to_completion(
    result: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Start result → memory sink, process all available input, stop, and
    return the sink contents (materialized — the memory-sink view and all
    scratch dirs this thread created are cleaned before returning).
    Bounded input arrives as one micro-batch (file source picks up every
    available file at the first trigger), so complete/update-mode output
    is deterministic.

    Streaming state operators get one task (and for Python-state ops one
    Python worker) per shuffle partition with no AQE coalescing — under
    an untuned session's default 200 that is pure startup overhead, so
    pin a sane count for the query's lifetime and restore after.
    """
    spark = result.sparkSession
    qname = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = scratch_dir("bdts_ckpt_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        query = (
            result.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    out = materialize(spark.table(qname))
    spark.catalog.dropTempView(qname)
    cleanup_scratch()
    return out
