"""Custom Python DataSource (S1-S4 via the official connector API):
filter pushdown prunes partitions source-side, batch read matches the
native parquet scan, streaming replay is offset-chunked."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, StringStartsWith

from big_data_training_spark.data import load_table
from big_data_training_spark.operators.pydatasource import (
    KafkaLogBatchReader,
    N_PARTITIONS,
    register_kafkalog,
)

def test_pushfilters_prunes_and_seeks():
    reader = KafkaLogBatchReader({"path": "unused"})
    leftover = reader.pushFilters(
        [
            EqualTo(("partition",), 3),
            GreaterThanOrEqual(("offset",), 100),
            StringStartsWith(("key",), "1"),
        ]
    )
    assert reader.assigned == [3]
    assert reader.min_offset == 100
    # unsupported filters are handed back for Spark to evaluate
    assert list(leftover) == [StringStartsWith(("key",), "1")]
    assert len(reader.partitions()) == 1


def test_pushfilters_default_full_scan():
    reader = KafkaLogBatchReader({"path": "unused"})
    assert list(reader.pushFilters([])) == []
    assert len(reader.partitions()) == N_PARTITIONS
    assert reader.min_offset == 0


def test_batch_read_matches_native_scan(spark, sf_dir):
    register_kafkalog(spark)
    env = (
        spark.read.format("kafkalog")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .load()
    )
    got = env.groupBy("partition").agg(
        F.count("*").alias("n"), F.max("offset").alias("max_offset")
    )
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.pmod("user_id", F.lit(N_PARTITIONS)).cast("int").alias("partition"))
        .agg(F.count("*").alias("n"), F.max("event_id").alias("max_offset"))
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_value_payload_is_decodable_json(spark, sf_dir):
    register_kafkalog(spark)
    env = (
        spark.read.format("kafkalog")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .load()
        .limit(50)
    )
    decoded = env.select(
        F.get_json_object("value", "$.event_type").alias("et"),
        F.get_json_object("value", "$.value").cast("double").alias("v"),
    )
    rows = decoded.collect()
    assert len(rows) == 50
    assert all(r.et is not None and r.v is not None for r in rows)


def test_batch_writer_abort_leaves_log_unchanged(spark, sf_dir):
    import shutil
    import tempfile

    import pytest as _pytest

    from big_data_training_spark.operators.pydatasource import (
        _load_manifest,
        read_committed,
    )

    register_kafkalog(spark)
    base = tempfile.mkdtemp(prefix="bdts_txlog_test_")
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    good = events.filter(F.col("event_id") < 100)
    good.write.format("kafkalog").mode("append").option("path", base).save()
    n_committed = read_committed(spark, base).count()
    assert n_committed == good.count()

    # second append fails mid-task → abort() → manifest and log unchanged
    def boom(pdf_iter):
        raise RuntimeError("injected task failure")
        yield  # pragma: no cover

    bad = events.filter(F.col("event_id") >= 100).mapInPandas(
        boom, events.schema
    )
    with _pytest.raises(Exception):
        bad.write.format("kafkalog").mode("append").option("path", base).save()
    # manifest unchanged, committed view unchanged, staging swept
    assert read_committed(spark, base).count() == n_committed
    assert len(_load_manifest(base)["segments"]) > 0
    staging = os.path.join(base, ".staging")
    assert not os.path.isdir(staging) or os.listdir(staging) == []
    shutil.rmtree(base, ignore_errors=True)


def test_stream_writer_restart_is_exactly_once(spark, sf_dir):
    import shutil
    import tempfile

    from big_data_training_spark.operators.pydatasource import read_committed

    register_kafkalog(spark)
    base = tempfile.mkdtemp(prefix="bdts_txsink_test_")
    ckpt = tempfile.mkdtemp(prefix="bdts_txsink_ckpt_test_")

    def run_once():
        # kafkalog stream source: its path is the fixture itself (stable
        # across restarts), unlike the per-run symlink topic dirs
        stream = (
            spark.readStream.format("kafkalog")
            .option("path", os.path.join(sf_dir, "events.parquet"))
            .load()
            .select("partition", "offset", "key")
        )
        q = (
            stream.writeStream.format("kafkalog")
            .outputMode("append")
            .option("path", base)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return read_committed(spark, base).count()

    n_events = load_table(spark, sf_dir, "events").count()
    assert run_once() == n_events
    # restart on the same checkpoint: no new input → no re-publication
    assert run_once() == n_events
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_pushdown_prunes_scan_tasks(spark, sf_dir):
    """With pushdown enabled, `partition = 3` must reach the reader:
    the DSv2 scan plans exactly ONE input partition (of 8) — pruning
    happened source-side, not as a post-scan filter."""
    register_kafkalog(spark)
    path = os.path.join(sf_dir, "events.parquet")
    full = spark.read.format("kafkalog").option("path", path).load()
    assert full.rdd.getNumPartitions() == N_PARTITIONS
    pruned = full.filter(F.col("partition") == 3)
    assert pruned.rdd.getNumPartitions() == 1


def test_stream_source_progresses_in_chunks(spark, sf_dir):
    """The kafkalog streaming source must advance its {'id': n} offset
    in chunk-sized micro-batches — several committed batches, not one
    big replay (the checkpoint offsets log is the progress record)."""
    import tempfile

    register_kafkalog(spark)
    ckpt = tempfile.mkdtemp(prefix="bdts_chunk_ckpt_")
    stream = (
        spark.readStream.format("kafkalog")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .option("chunk", 300)
        .load()
    )
    import uuid

    qname = f"chunk_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_rows = spark.table(qname).count()
    n_batches = len(
        [f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()]
    )
    assert n_rows == load_table(spark, sf_dir, "events").count()
    assert n_batches >= 3, f"expected chunked progression, got {n_batches} batches"
    spark.catalog.dropTempView(qname)
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)


def test_partitioned_stream_reader_slices_executor_side(spark, sf_dir):
    """Without a chunk option the source plans the executor-partitioned
    DataSourceStreamReader: the whole log arrives in ONE micro-batch
    split into offset slices read as Arrow batches by parallel tasks,
    and the result matches the chunk-paced replay exactly."""
    import shutil
    import tempfile
    import uuid

    from big_data_training_spark.operators.pydatasource import (
        KafkaLogStreamReader,
        _OffsetSlice,
    )

    # partition planning is a pure function of the offset range
    r = KafkaLogStreamReader({"path": "unused", "slices": 8})
    parts = r.partitions({"id": 0}, {"id": 1000})
    assert len(parts) == 8
    assert all(isinstance(p, _OffsetSlice) for p in parts)
    assert parts[0].lo == 0 and parts[-1].hi == 1000
    # contiguous, non-overlapping slices
    for a, b in zip(parts, parts[1:]):
        assert a.hi == b.lo
    assert r.partitions({"id": 5}, {"id": 5}) == []
    # slice count scales with the range (not a fixed fan-out): a big
    # catch-up range plans ~range/slice_rows tasks, capped
    big = r.partitions({"id": 0}, {"id": 10_000_000})
    assert len(big) == 40  # 10M / 250k
    huge = r.partitions({"id": 0}, {"id": 10_000_000_000})
    assert len(huge) == r.MAX_SLICES

    register_kafkalog(spark)
    ckpt = tempfile.mkdtemp(prefix="bdts_part_ckpt_")
    stream = (
        spark.readStream.format("kafkalog")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .load()
    )
    qname = f"part_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        tuple(r)
        for r in spark.table(qname)
        .groupBy("partition")
        .agg(F.count("*").alias("n"), F.max("offset").alias("mx"))
        .collect()
    }
    want = {
        tuple(r)
        for r in load_table(spark, sf_dir, "events")
        .groupBy(
            F.pmod("user_id", F.lit(N_PARTITIONS)).cast("int").alias("partition")
        )
        .agg(F.count("*").alias("n"), F.max("event_id").alias("mx"))
        .collect()
    }
    assert got == want
    n_batches = len(
        [f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()]
    )
    assert n_batches == 1, f"expected one catch-up micro-batch, got {n_batches}"
    spark.catalog.dropTempView(qname)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_paced_reader_recovery_matches_first_delivery(sf_dir):
    """The paced reader's recovery path (readBetweenOffsets) must
    reproduce the committed range byte-for-byte — same envelope builder
    as first delivery — and must NOT be capped by chunk."""
    import pyarrow as pa

    from big_data_training_spark.operators.pydatasource import (
        KafkaLogPacedStreamReader,
    )

    path = os.path.join(sf_dir, "events.parquet")
    r = KafkaLogPacedStreamReader({"path": path, "chunk": 300})

    it, end = r.read({"id": 0})
    first = pa.Table.from_batches(list(it))
    assert end == {"id": 300}
    assert first.num_rows == 300

    replay = pa.Table.from_batches(list(r.readBetweenOffsets({"id": 0}, end)))
    assert replay.equals(first)

    # recovery of a range wider than chunk is NOT capped
    wide = pa.Table.from_batches(
        list(r.readBetweenOffsets({"id": 0}, {"id": 900}))
    )
    assert wide.num_rows == 900

    # past the log end: empty iterator, offset unchanged
    it2, end2 = r.read({"id": 10_000_000_000})
    assert list(it2) == [] and end2 == {"id": 10_000_000_000}


def test_paced_reader_without_chunk_fails_intelligibly(sf_dir):
    """Constructing the paced reader without the 'chunk' option (only
    reachable via a pyspark resolution-order change or direct
    construction) must raise a descriptive error, not a bare KeyError
    from the implicit streamReader/simpleStreamReader coupling."""
    import pytest

    from big_data_training_spark.operators.pydatasource import (
        KafkaLogPacedStreamReader,
    )

    path = os.path.join(sf_dir, "events.parquet")
    with pytest.raises(ValueError, match="chunk"):
        KafkaLogPacedStreamReader({"path": path})


def test_read_committed_empty_manifest(spark, sf_dir):
    """A committed write of zero rows is a valid log state: the manifest
    exists with no segments and read_committed returns an empty
    DataFrame instead of raising."""
    import shutil
    import tempfile

    from big_data_training_spark.operators.pydatasource import read_committed

    register_kafkalog(spark)
    base = tempfile.mkdtemp(prefix="bdts_txlog_empty_")
    empty = load_table(spark, sf_dir, "events").filter("event_id < 0").select(
        "event_id", "event_type"
    )
    empty.write.format("kafkalog").mode("append").option("path", base).save()
    out = read_committed(spark, base)
    assert out.count() == 0
    assert len(out.schema.fields) > 0
    shutil.rmtree(base, ignore_errors=True)
