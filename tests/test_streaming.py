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


def test_watermark_drops_late_data(spark):
    """W5 (kafka/README.md:334): an event arriving after the watermark
    passed its window is dropped, not aggregated. Two micro-batches:
    batch 1 advances the watermark past 10:00-11:00; batch 2 delivers a
    late 10:30 event (beyond the 10-minute bound) plus an on-time one."""
    import os
    import time

    src = tempfile.mkdtemp(prefix="bdts_late_")
    schema = "ts timestamp, k string"

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        path = os.path.join(src, name)
        df.write.mode("overwrite").parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (mtime, mtime))
        os.utime(path, (mtime, mtime))

    import datetime as dt

    t = lambda h, m: dt.datetime(2024, 6, 1, h, m)
    now = time.time()
    # batch 1: on-time data; batch 2: advances the watermark past the
    # 10:00 window (evicts + emits it); batch 3: a 10:45 straggler —
    # beyond the bound, must be dropped, never re-opening the window.
    write_file("f1", [(t(10, 30), "a"), (t(12, 30), "a")], now - 100)
    write_file("f2", [(t(12, 40), "a")], now - 50)
    write_file("f3", [(t(10, 45), "late"), (t(12, 50), "a")], now - 10)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            if p.get("stateOperators")
        )
    finally:
        q.stop()
    got = {(r.ws.hour, r.n) for r in spark.table("late_out").collect()}
    # the 10:00 window finalized with ONLY the on-time 10:30 event
    assert (10, 1) in got, got
    assert (10, 2) not in got, got
    assert dropped >= 1, f"late row not dropped (dropped={dropped}, got={got})"
    shutil.rmtree(src, ignore_errors=True)


def test_w6_event_time_timer_evicts_session(spark):
    """W6 (flink/README.md:28): a registered event-time timer actually
    FIRES — the session row is emitted by the timeout path
    (state.hasTimedOut), not by any data-carrying call. Three
    micro-batches: batch 1 opens sessions for users 1 and 2; batch 2
    extends user 2 and advances the watermark past user 1's
    last-event+gap timer; batch 3 runs the fired timer, evicting user
    1's session. User 2's timer (not yet passed) must NOT fire."""
    import datetime as dt
    import time

    from big_data_training_spark.streaming.queries import w6_session_timeout

    src = tempfile.mkdtemp(prefix="bdts_timer_")
    schema = "user_id bigint, ts timestamp"

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        path = os.path.join(src, name)
        df.write.mode("overwrite").parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (mtime, mtime))
        os.utime(path, (mtime, mtime))

    t = lambda h, m: dt.datetime(2024, 6, 1, h, m)
    now = time.time()
    write_file("f1", [(1, t(0, 0)), (1, t(0, 1)), (2, t(0, 1))], now - 100)
    write_file("f2", [(2, t(1, 0))], now - 50)
    write_file("f3", [(3, t(2, 0))], now - 10)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        w6_session_timeout(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("timer_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(spark.table("timer_out").collect(), key=lambda r: r.user_id)
    # user 1's timer (00:01+10m = 00:11) fires once the watermark passes
    # it (batch 3, watermark 01:00); user 2's (01:10) fires in the
    # closing no-data micro-batch after the watermark reaches 02:00.
    # user 3's (02:10) never passes the final watermark — no eviction,
    # proving rows come from fired timers, not stream shutdown.
    assert [(r.user_id, r.n_events) for r in rows] == [(1, 2), (2, 2)], rows
    assert (rows[0].session_start, rows[0].session_end) == (t(0, 0), t(0, 1))
    assert (rows[1].session_start, rows[1].session_end) == (t(0, 1), t(1, 0))
    spark.catalog.dropTempView("timer_out")
    shutil.rmtree(src, ignore_errors=True)


def test_transform_with_state_gate(spark, sf_dir):
    """The Spark 4 stateful API degrades loudly, not silently."""
    from big_data_training_spark.streaming.queries import (
        transform_with_state_available,
    )

    assert transform_with_state_available() in (True, False)


def test_u4_query_listener_lifecycle(spark, sf_dir):
    """U4 (kafka/README.md rebalance-listener analog): a registered
    StreamingQueryListener observes the consumer lifecycle — start,
    per-batch progress with row counts and the source's offset range,
    and termination."""
    import time

    from pyspark.sql.streaming import StreamingQueryListener

    seen: dict[str, object] = {"rows": 0}

    class Lifecycle(StreamingQueryListener):
        def onQueryStarted(self, event):
            seen["started"] = str(event.id)

        def onQueryProgress(self, event):
            seen["rows"] += event.progress.numInputRows
            srcs = event.progress.sources
            if srcs and srcs[0].endOffset is not None:
                seen["end_offset"] = srcs[0].endOffset

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            seen["terminated"] = str(event.id)

    listener = Lifecycle()
    spark.streams.addListener(listener)
    try:
        stream = read_stream_table(spark, sf_dir, "events")
        run_to_completion(
            stream.groupBy("event_type").agg(F.count("*").alias("n")),
            "complete",
        )
        # listener events post asynchronously on the listener bus
        deadline = time.time() + 15
        while time.time() < deadline and "terminated" not in seen:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert seen.get("started") is not None
    assert seen.get("terminated") == seen["started"]
    assert seen["rows"] > 0
    assert "end_offset" in seen


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


def test_rocksdb_state_store_engages(spark, sf_dir):
    """ST2: the RocksDB provider must actually back the state operator
    (customMetrics carry rocksdb* counters), the result must match the
    batch aggregate (stream-batch equivalence on a different backend),
    and the provider pin must live ONLY on the dedicated clone — the
    shared session's conf is never written (no set/restore window a
    concurrent query could observe)."""
    import uuid

    from big_data_training_spark.streaming.replay import reroot
    from big_data_training_spark.streaming.statestore import (
        ROCKSDB_PROVIDER,
        rocksdb_stream_session,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(provider_key, None)
    ss = rocksdb_stream_session(spark)
    assert ss is not spark
    assert ss.conf.get(provider_key) == ROCKSDB_PROVIDER
    # parent conf untouched by building or using the clone
    assert spark.conf.get(provider_key, None) == prior

    stream = reroot(read_stream_table(spark, sf_dir, "events"), ss)
    agg = stream.groupBy("user_id").agg(F.count("*").alias("n_events"))
    qname = f"rocks_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="bdts_rocks_ckpt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()
    assert spark.conf.get(provider_key, None) == prior
    metrics = progress["stateOperators"][0]["customMetrics"]
    assert any(k.startswith("rocksdb") for k in metrics), metrics
    got = {tuple(r) for r in ss.table(qname).collect()}
    want = {
        tuple(r)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert got == want
    ss.catalog.dropTempView(qname)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_cached_topic_memoizes_and_invalidates(tmp_path, spark):
    """replay.cached_topic: same file-backed source -> one build, same
    dir; in-place source rewrite -> freshness miss, rebuilt; memory-
    backed source (no input files) -> never memoized (two same-schema
    in-memory dfs must not alias one topic)."""
    from big_data_training_spark.streaming.replay import cached_topic

    src = tmp_path / "t.parquet"
    spark.range(10).write.parquet(str(src))
    df = spark.read.parquet(str(src))

    calls = []

    def build(d):
        calls.append(d)
        (tmp_path / "marker").touch()

    d1 = cached_topic(df, "test", "bdts_test_topic_", build)
    d2 = cached_topic(spark.read.parquet(str(src)), "test", "bdts_test_topic_", build)
    assert d1 == d2 and len(calls) == 1

    # a different label is a different topic
    d3 = cached_topic(df, "test-b", "bdts_test_topic_", build)
    assert d3 != d1 and len(calls) == 2

    # in-place rewrite (different content + mtime) invalidates
    shutil.rmtree(src)
    spark.range(20).write.parquet(str(src))
    d4 = cached_topic(spark.read.parquet(str(src)), "test", "bdts_test_topic_", build)
    assert d4 != d1 and len(calls) == 3

    # memory-backed: builds EVERY call, never cached
    mem = spark.createDataFrame([(1,)], "a bigint")
    m1 = cached_topic(mem, "test", "bdts_test_topic_", build)
    m2 = cached_topic(spark.createDataFrame([(2,)], "a bigint"), "test", "bdts_test_topic_", build)
    assert m1 != m2 and len(calls) == 5
