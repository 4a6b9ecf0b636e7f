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
    _scratch.trigger_bytes = []


def materialize(df: DataFrame) -> DataFrame:
    """Decouple a result from its backing files/views: eager
    localCheckpoint stores the partitions block-side, after which the
    source scratch dirs and temp views can be dropped."""
    return df.localCheckpoint(eager=True)


# Schema memo for immutable parquet files (fixtures, cached replay
# topics): a warm footer read still costs ~120 ms of driver round-trips,
# paid once per streaming query per bench iteration without this. Keyed
# on (path, mtime, size) so an externally rebuilt file misses the cache.
# Metadata only — never rows.
_SCHEMA_CACHE: dict[tuple, object] = {}


def cached_schema(read_df, path: str):
    """``read_df()`` must return a DataFrame over ``path``; its schema is
    memoized under the file's identity."""
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    s = _SCHEMA_CACHE.get(key)
    if s is None:
        s = read_df().schema
        _SCHEMA_CACHE[key] = s
    return s


_pinned_clones: dict[tuple, SparkSession] = {}
_stream_lock = threading.Lock()

# Replayed-topic memo: (canonicalized source plan, source-file
# freshness, builder label) -> topic dir. A replayed topic is a
# DETERMINISTIC function of its source fixture, and a real
# deployment's topic exists ONCE and is consumed many times — so
# re-synthesizing segments on every invocation is pure harness
# overhead multiplied across the st_* family. Cached dirs live OUTSIDE
# the per-query scratch tracking (consumers only read them) and are
# removed at process exit.
_TOPIC_CACHE: dict[tuple, str] = {}
_TOPIC_CACHE_MAX = 64
# Evicted dirs are NOT deleted eagerly — a concurrent query may still
# be streaming them — they retire here and are removed at exit.
_RETIRED_TOPICS: list[str] = []


def _cleanup_topic_cache() -> None:
    with _stream_lock:
        while _TOPIC_CACHE:
            shutil.rmtree(_TOPIC_CACHE.popitem()[1], ignore_errors=True)
        while _RETIRED_TOPICS:
            shutil.rmtree(_RETIRED_TOPICS.pop(), ignore_errors=True)


import atexit  # noqa: E402

atexit.register(_cleanup_topic_cache)


def _topic_key(df: DataFrame, label: str) -> tuple:
    """Cache identity of a replayed topic: the CANONICALIZED analyzed
    plan (exprIds normalized — two semantically identical reads hash
    equal) plus (path, size, mtime_ns) of every input file, so an
    in-place fixture rewrite misses (same rule as hints._freshness),
    plus the builder's label (segmenting scheme + params)."""
    fresh = []
    for uri in sorted(df.inputFiles()):
        p = uri.removeprefix("file:")
        try:
            st = os.stat(p)
            fresh.append((uri, st.st_size, st.st_mtime_ns))
        except OSError:
            fresh.append((uri, -1, -1))
    # semanticHash is computed over the full canonicalized tree — unlike
    # toString(), it does not truncate field lists at
    # spark.sql.debug.maxToStringFields, so two >25-column derivations of
    # the same files can never alias one key. The schema DDL string is a
    # cheap non-truncating second factor.
    canon = df._jdf.queryExecution().analyzed().canonicalized()
    plan = (canon.semanticHash(), df.schema.simpleString())
    return (plan, tuple(fresh), label)


def cached_topic(df: DataFrame, label: str, prefix: str, build) -> str:
    """Return the topic directory for (``df``, ``label``), building it
    with ``build(topic_dir)`` on first use. The builder must populate
    ``topic_dir`` deterministically from ``df``; consumers treat the
    returned directory as read-only.

    Only FILE-BACKED sources are memoized: a memory-backed df
    (``createDataFrame``) has no input files and its canonicalized
    plan does not identify the DATA, so two same-schema in-memory dfs
    would alias one topic — those build fresh every call instead."""
    if not df.inputFiles():
        d = tempfile.mkdtemp(prefix=prefix)
        try:
            build(d)
        except BaseException:
            shutil.rmtree(d, ignore_errors=True)
            raise
        # tracked like any other per-query scratch: cleaned after the
        # calling query materializes
        if not hasattr(_scratch, "dirs"):
            _scratch.dirs = []
        _scratch.dirs.append(d)
        return d
    key = _topic_key(df, label)
    with _stream_lock:
        cached = _TOPIC_CACHE.get(key)
        if cached is not None and os.path.isdir(cached):
            return cached
    # NOT scratch_dir: the topic outlives the calling query.
    topic = tempfile.mkdtemp(prefix=prefix)
    try:
        build(topic)
    except BaseException:
        shutil.rmtree(topic, ignore_errors=True)
        raise
    with _stream_lock:
        if len(_TOPIC_CACHE) >= _TOPIC_CACHE_MAX:
            # retire oldest (insertion order) — deleted at exit, not
            # now: a concurrent query may still be streaming it
            _RETIRED_TOPICS.append(_TOPIC_CACHE.pop(next(iter(_TOPIC_CACHE))))
        other = _TOPIC_CACHE.get(key)
        if other is None or not os.path.isdir(other):
            # first build, or the cached dir was deleted externally (tmp
            # cleaner in a long-lived driver): install the fresh build,
            # retiring any stale path, so the stale entry can never be
            # handed back after its directory vanished
            _TOPIC_CACHE[key] = topic
            return topic
    # a concurrent builder won the race with a LIVE directory; keep one copy
    shutil.rmtree(topic, ignore_errors=True)
    return other

# Streaming state operators get one task (and for Python-state ops one
# Python worker) per shuffle partition with no AQE coalescing — under an
# untuned session's default 200 that is pure startup overhead per
# micro-batch, so streaming helpers plan under a SIZED pin:
#
#     pin = clamp(ceil(per_trigger_bytes / TARGET_BYTES_PER_TASK),
#                 floor, cap)
#
# The volume term is the cluster rule (size the pin to per-trigger
# volume, never to executor count — VERDICT r14 #5): at 100 TB a
# constant pin would serialize the stateful operators, so the task
# count grows with the bytes each trigger actually moves. The FLOORS
# are the two measured sf0.1 regimes (see the sweep notes below): they
# govern when per-trigger volume is tiny and per-partition fixed costs
# (state-store load/commit, task startup) dominate; the volume term
# takes over as soon as ceil(bytes/target) exceeds them. TARGET is
# compressed source bytes per task (~2 MiB ≈ 8-16 MiB of in-memory
# rows — streaming state tasks want smaller partitions than the
# 100 MB-1 GB batch guidance because every partition also pays a state
# store); the cap bounds task explosion for pathological volumes.
_STREAM_PIN_FLOOR = 16
_LIGHT_STREAM_PIN_FLOOR = 4
_STREAM_PIN_CAP = 4096
_TARGET_TRIGGER_BYTES_PER_TASK = 2 << 20


def pin_for_trigger_bytes(n_bytes: int | None, floor: int) -> str:
    """The documented pin rule. ``n_bytes`` is the (compressed) source
    volume one trigger delivers; ``None``/0 means unknown → floor."""
    if not n_bytes or n_bytes <= 0:
        return str(floor)
    import math

    return str(
        max(
            floor,
            min(
                _STREAM_PIN_CAP,
                math.ceil(n_bytes / _TARGET_TRIGGER_BYTES_PER_TASK),
            ),
        )
    )


def max_segment_bytes(topic_dir: str) -> int:
    """Per-trigger volume of a segment-replay topic consumed with
    ``maxFilesPerTrigger=1``: the largest single segment file."""
    sizes = [
        os.path.getsize(os.path.join(topic_dir, f))
        for f in os.listdir(topic_dir)
        if f.endswith(".parquet")
    ]
    return max(sizes, default=0)


# Per-thread record of the source fixture bytes behind topics built by
# ``read_stream_table`` on this thread — ``run_to_completion`` (same
# thread, immediately after the query is assembled) sums it as the
# bounded replay's single-trigger volume. Cleared on consumption and by
# ``cleanup_scratch`` so one query's volume never leaks into the next.
def _record_trigger_bytes(n: int) -> None:
    if not hasattr(_scratch, "trigger_bytes"):
        _scratch.trigger_bytes = []
    _scratch.trigger_bytes.append(n)


def take_recorded_trigger_bytes() -> int:
    vols = getattr(_scratch, "trigger_bytes", [])
    total = sum(vols)
    _scratch.trigger_bytes = []
    return total


def pinned_clone(spark: SparkSession, conf: dict[str, str]) -> SparkSession:
    """A cached CLONE of ``spark`` with ``conf`` pinned, keyed by
    (parent, conf set). Same isolation mechanism as the batch pin
    session (extensions/graph.py): ``cloneSession`` copies the SQLConf
    (shared SparkContext and cache), so the caller's shared session is
    never mutated — concurrent unrelated queries keep planning under
    their own conf instead of racing a set/restore window.

    StreamingQueryListeners are per-session (each SessionState owns a
    StreamingQueryManager), so U4 listeners the user registered on the
    PARENT are mirrored onto the clone on every fetch — a query running
    here still fires the user's lifecycle callbacks.

    The streaming shuffle-partition pin is merged into every conf set
    (caller's value wins if present): ``run_to_completion`` treats any
    pinned clone as ready-to-run, so a clone built without the pin
    would silently lose the task-count invariant the state-operator
    replays rely on. RocksDB changelog checkpointing is merged in for
    the same reason it is production guidance: without it every
    micro-batch commit uploads a full per-partition snapshot
    (zip + fsync dominated w6's addBatch profile — 13.7s → 11.7s
    measured at sf0.1 with identical values); with it the per-batch
    upload is the small changelog and snapshots amortize."""
    conf = {
        "spark.sql.shuffle.partitions": str(_STREAM_PIN_FLOOR),
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
        # with tracking on (default), EVERY state put/delete performs a
        # RocksDB read first just to maintain the numRowsTotal metric —
        # the standard production setting for write-heavy state is off
        # (the metric reports -1; nothing in the engine or tests reads
        # it, and probe tools build their own sessions). Caller's value
        # still wins, so a metrics-focused session can re-enable it.
        "spark.sql.streaming.stateStore.rocksdb."
        "trackTotalNumberOfRows": "false",
        **conf,
    }
    key = (spark, tuple(sorted(conf.items())))
    with _stream_lock:
        s = _pinned_clones.get(key)
        if s is None:
            jclone = spark._jsparkSession.cloneSession()
            for k, v in conf.items():
                jclone.conf().set(k, v)
            s = SparkSession(spark.sparkContext, jsparkSession=jclone)
            _pinned_clones[key] = s
        _sync_listeners(spark, s)
    return s


def stream_session(
    spark: SparkSession, trigger_bytes: int | None = None
) -> SparkSession:
    """The default streaming clone: volume-sized shuffle pin with the
    stateful floor. Floor provenance (sf0.1 sweeps): Python-state
    operators (applyInPandasWithState — w6) are compute-bound and the
    knee of per-partition fixed costs (state-store load/commit, timer
    scan) sits at 16 (2=26.4s, 4=16.9s, 16=12.2s, 32=14.6s)."""
    return pinned_clone(
        spark,
        {
            "spark.sql.shuffle.partitions": pin_for_trigger_bytes(
                trigger_bytes, _STREAM_PIN_FLOOR
            )
        },
    )


def light_stream_session(
    spark: SparkSession, trigger_bytes: int | None = None
) -> SparkSession:
    """Streaming clone for small-per-batch foreachBatch segment replays
    and bounded stream-stream joins: same volume rule, lower floor.
    Floor provenance (sf0.1 interleaved sweeps): ~25k-row micro-batches
    are task-startup-bound — pin 4 beats 16 by 15-20% on st_cms/
    st_path_trigrams/st_ewma, and the st_j2 stream-stream joins read
    monotone 4 < 8 < 16 < 32 (docs/SCALING.md)."""
    return pinned_clone(
        spark,
        {
            "spark.sql.shuffle.partitions": pin_for_trigger_bytes(
                trigger_bytes, _LIGHT_STREAM_PIN_FLOOR
            )
        },
    )


def parallel_actions(*thunks) -> None:
    """Run independent Spark actions concurrently (guide §2.6 "overlap
    independent jobs"): inside a foreachBatch the cost of each small
    write job is dominated by scheduling + file-commit latency, and two
    independent outputs (e.g. a fact append and the advanced state dir)
    can back-fill each other's idle capacity instead of serializing.
    Caller sequencing stays intact: this returns only after EVERY action
    finished, and re-raises the first failure — so a manifest swap placed
    after it keeps exactly the commit semantics of sequential writes."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [
            pool.submit(inheritable_thread_target(t)) for t in thunks
        ]
        for f in futures:
            f.result()


def _sync_listeners(parent: SparkSession, clone: SparkSession) -> None:
    """Make the clone's JVM listener set equal the parent's (add missing,
    drop removed) so lifecycle events reach listeners registered on the
    user-facing session. JVM listener objects compare by identity, so
    ``equals`` is exact."""
    pj = list(parent.streams._jsqm.listListeners())
    cj = list(clone.streams._jsqm.listListeners())
    for l in pj:
        if not any(l.equals(c) for c in cj):
            clone.streams._jsqm.addListener(l)
    for c in cj:
        if not any(c.equals(l) for l in pj):
            clone.streams._jsqm.removeListener(c)


def reroot(df: DataFrame, target: SparkSession) -> DataFrame:
    """Re-root a DataFrame's logical plan onto ``target`` (a clone of
    the session it was built on) so it plans under the clone's conf.

    Spark 4 moved the JVM Dataset to org.apache.spark.sql.classic (the
    Connect split); 3.5.x still has it at org.apache.spark.sql.Dataset.
    Resolve lazily and fall back so either runtime works."""
    from py4j.java_gateway import JavaClass

    jvm = df.sparkSession._jvm
    # py4j yields a JavaPackage (not an error) for an absent class.
    dataset_cls = jvm.org.apache.spark.sql.classic.Dataset
    if not isinstance(dataset_cls, JavaClass):
        dataset_cls = jvm.org.apache.spark.sql.Dataset
    jdf = dataset_cls.ofRows(target._jsparkSession, df._jdf.logicalPlan())
    return DataFrame(jdf, target)


def read_stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1 stream form: subscribe to a Parquet topic as an unbounded
    source. The static schema read is metadata-only (no data scan)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    from big_data_training_spark.data import _read_parquet_nanosafe, canonicalize_ts

    schema = cached_schema(lambda: _read_parquet_nanosafe(spark, path), path)
    # Bounded replay delivers the whole fixture as ONE micro-batch, so
    # the fixture size IS this source's per-trigger volume; recorded for
    # the pin rule (run_to_completion / _j2_light consume it).
    _record_trigger_bytes(os.path.getsize(path))
    # The file stream source wants a directory to monitor (a "topic"
    # directory into which new log segments land); expose the fixture
    # file through a scratch dir of symlinks.
    topic_dir = scratch_dir(f"bdts_topic_{name}_")
    os.symlink(path, os.path.join(topic_dir, f"{name}.parquet"))
    return canonicalize_ts(spark.readStream.schema(schema).parquet(topic_dir))


def run_to_completion(
    result: DataFrame, output_mode: str = "complete", await_also=()
) -> DataFrame:
    """Start result → memory sink, process all available input, stop, and
    return the sink contents (materialized — the memory-sink view and all
    scratch dirs this thread created are cleaned before returning).
    Bounded input arrives as one micro-batch (file source picks up every
    available file at the first trigger), so complete/update-mode output
    is deterministic.

    The query runs on a pinned-conf CLONE of the caller's session
    (see ``stream_session``) — the shared session's conf is never
    touched; the memory-sink view lives (and is dropped) on the clone,
    and the materialized result is session-agnostic. A plan already
    rooted on a pinned clone (e.g. statestore.rocksdb_stream_session)
    runs there as-is — no clone-of-clone.
    """
    spark = result.sparkSession
    with _stream_lock:
        already_pinned = any(spark is v for v in _pinned_clones.values())
    if already_pinned:
        ss = spark
    else:
        ss = stream_session(spark, trigger_bytes=take_recorded_trigger_bytes())
        result = reroot(result, ss)
    qname = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = scratch_dir("bdts_ckpt_")
    query = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        query.processAllAvailable()
        # queries the caller overlapped with this one (guide §2.6) must
        # finish before the shared scratch topics are cleaned below;
        # stopping them stays the caller's job
        for other in await_also:
            other.processAllAvailable()
    finally:
        query.stop()
    out = materialize(ss.table(qname))
    ss.catalog.dropTempView(qname)
    cleanup_scratch()
    return out
