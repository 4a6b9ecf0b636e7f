"""Source/sink connectors and log-layout operators (SURVEY.md §2.1).

S2 pattern subscribe (glob paths), S5 topic append, S6 in-memory source,
S8 external connectors (CSV/JSON), S11 retention/TTL expiry — each
realized over the partitioned-Parquet log layout: a topic at rest is a
date-partitioned Parquet directory, segments are files, retention is
partition drop, subscribe-by-pattern is a path glob.

Round-trip queries write to a scratch dir, read back through the
connector under test, and aggregate — so the oracle (which sees only
the original table) verifies the connector preserved the data.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

RETENTION_CUTOFF = "2024-01-15"


def kafka_source_available(spark: SparkSession) -> bool:
    """S1's native Kafka form needs the spark-sql-kafka package on the
    classpath; absent in this container, so the Parquet-log topic layout
    stands in (same S1-S5 semantics). The reader would be:
    ``spark.readStream.format("kafka").option("subscribe", topic)``."""
    try:
        spark.readStream.format("kafka").option("subscribe", "probe").option(
            "kafka.bootstrap.servers", "localhost:9092"
        ).load()
        return True
    except Exception:
        return False


def write_topic_log(events: DataFrame, base: str) -> str:
    """S5: append the event stream to a date-partitioned Parquet log —
    the durable-topic layout (kafka/README.md:9-10,29). Partition column
    ``dt`` is the segment key; at 100 TB this is the unit of retention
    drop (S11) and of partition pruning on read."""
    out = os.path.join(base, "events_log")
    (
        events.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(out)
    )
    return out


@register(
    "s5_s2_log_roundtrip",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n,
           max(event_id) AS max_offset
    FROM events GROUP BY 1
    """,
    doc="S5+S2: append to a partitioned topic log, glob-subscribe it back",
)
def s5_s2_log_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the day-partitioned log, re-read via path glob (pattern
    subscribe), verify per-segment counts/offsets survive the round trip."""
    events = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="bdts_log_")
    out = write_topic_log(events, base)
    back = spark.read.parquet(os.path.join(out, "dt=2024-*"))
    # glob consumed the partition dirs, so dt returns via the file path —
    # recover it from ts (identical by construction).
    return (
        back.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
        .agg(F.count("*").alias("n"), F.max("event_id").alias("max_offset"))
    )


@register(
    "s11_retention_expiry",
    f"""
    SELECT count(*) AS n_live, min(strftime(ts, '%Y-%m-%d')) AS oldest_day
    FROM events WHERE ts >= TIMESTAMP '{RETENTION_CUTOFF}'
    """,
    doc="S11: retention/TTL — drop expired log segments by partition",
)
def s11_retention_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention as partition pruning: the filter on the partition column
    prunes whole directories at planning time (the reference's
    segment-level expiry, kafka/README.md:29-31) — no data read from
    expired segments."""
    events = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="bdts_ttl_")
    out = write_topic_log(events, base)
    live = spark.read.parquet(out).filter(F.col("dt") >= RETENTION_CUTOFF)
    return live.agg(
        F.count("*").alias("n_live"),
        F.min(F.date_format("ts", "yyyy-MM-dd")).alias("oldest_day"),
    )


@register(
    "s3_partition_assign_scan",
    """
    SELECT count(*) AS n, count(DISTINCT user_id) AS n_keys,
           min(event_id) AS min_offset, max(event_id) AS max_offset
    FROM events WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-05' AND '2024-01-09'
    """,
    doc="S3: standalone partition-assign scan (read specific log segments)",
)
def s3_partition_assign_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standalone-consumer pattern (kafka/README.md:117-118): read an
    explicit subset of the topic's partitions — here five dt= segment
    directories of the partitioned log, no group subscription."""
    events = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="bdts_assign_")
    out = write_topic_log(events, base)
    assigned = [f"{out}/dt=2024-01-{d:02d}" for d in range(5, 10)]
    part = spark.read.parquet(*assigned)
    return part.agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_keys"),
        F.min("event_id").alias("min_offset"),
        F.max("event_id").alias("max_offset"),
    )


_DIM_ROWS = [
    ("signup", "engagement"),
    ("click", "engagement"),
    ("view", "engagement"),
    ("purchase", "revenue"),
    ("error", "ops"),
]
_DIM_SQL = ", ".join(f"('{t}', '{c}')" for t, c in _DIM_ROWS)


@register(
    "s6_inmemory_dim_join",
    f"""
    SELECT dim.category AS category, count(*) AS n,
           round(CAST(sum(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_value
    FROM events e
    JOIN (VALUES {_DIM_SQL}) AS dim(event_type, category)
      ON e.event_type = dim.event_type
    GROUP BY 1
    """,
    doc="S6: in-memory literal source (fromElements) joined as a dimension",
)
def s6_inmemory_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """env.fromElements analog: createDataFrame from literals, broadcast
    into the event stream as an enrichment dim (J1 with an S6 source)."""
    events = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(_DIM_ROWS, "event_type string, category string")
    return (
        events.join(F.broadcast(dim), "event_type")
        .groupBy("category")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 2).alias(
                "total_value"
            ),
        )
    )


@register(
    "s8_csv_roundtrip",
    """
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_value
    FROM events WHERE event_id < 2000 GROUP BY event_type
    """,
    doc="S8: CSV sink + source connector round-trip",
)
def s8_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export a slice to CSV, re-read with an explicit schema (no
    inference scan), aggregate — connector fidelity is what the oracle
    checks. Doubles survive CSV via Spark's round-trippable formatting."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    out = tempfile.mkdtemp(prefix="bdts_csv_") + "/slice"
    events.select("event_id", "event_type", "value").write.mode(
        "overwrite"
    ).option("header", True).csv(out)
    back = spark.read.schema("event_id bigint, event_type string, value double").option(
        "header", True
    ).csv(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 2).alias(
                "total_value"
            ),
        )
    )


@register(
    "s8_json_roundtrip",
    """
    SELECT user_id, count(*) AS n, max(event_id) AS max_offset
    FROM events WHERE event_id < 2000 GROUP BY user_id
    """,
    doc="S8: JSON-lines sink + source connector round-trip",
)
def s8_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines round trip with explicit read schema (semi-structured
    events, kafka/README.md:312)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    out = tempfile.mkdtemp(prefix="bdts_json_") + "/slice"
    events.select("event_id", "user_id").write.mode("overwrite").json(out)
    back = spark.read.schema("event_id bigint, user_id bigint").json(out)
    return back.groupBy("user_id").agg(
        F.count("*").alias("n"), F.max("event_id").alias("max_offset")
    )


@register(
    "s9_warehouse_saveastable",
    """
    SELECT o_orderpriority AS priority, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_price
    FROM orders GROUP BY 1
    """,
    doc="S9: warehouse storage — bucketed saveAsTable, read back via catalog",
)
def s9_warehouse_saveastable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse write-through (README.md:20 table-storage story): persist
    orders as a catalog table — bucketed by o_custkey so later joins on
    the key can skip their Exchange (tests/test_scale_strategies.py
    proves that plan) — then read it back through ``spark.table`` and
    aggregate. The table is external (explicit path) so the scratch dir,
    not a global warehouse, owns the files; metadata round-trips through
    the session catalog, which is this container's stand-in for a Hive
    metastore."""
    import shutil

    from big_data_training_spark.streaming.replay import materialize

    orders = load_table(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="bdts_wh_") + "/orders_tbl"
    name = "bdts_s9_orders"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        orders.write.mode("overwrite")
        .option("path", d)
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable(name)
    )
    out = materialize(
        spark.table(name)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"),
                2,
            ).alias("total_price"),
        )
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(os.path.dirname(d), ignore_errors=True)
    return out


@register(
    "s_schema_evolution",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(count(props) AS BIGINT) AS n_with_props
    FROM (
        SELECT event_type, NULL AS props FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT event_type, props FROM events WHERE event_id % 2 = 1
    )
    GROUP BY event_type
    """,
    doc="schema evolution: old segments lack a column; mergeSchema unifies",
)
def s_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across log segments (the registry-compatibility
    story of kafka/README.md:294-296 realized on the Parquet log): v1
    segments were written before the ``props`` column existed, v2
    segments carry it. ``mergeSchema`` resolves the union schema at
    read; v1 rows surface NULL props — exactly backward-compatible
    reader behavior. The aggregate proves no rows were lost and only v2
    rows carry the new column. At 100 TB schema merging reads footers,
    not data, and per-segment pruning still applies."""
    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="bdts_evo_")
    v1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "event_type")
    v2 = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type", "props"
    )
    v1.write.mode("overwrite").parquet(os.path.join(base, "seg=v1"))
    v2.write.mode("overwrite").parquet(os.path.join(base, "seg=v2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "seg=v1"), os.path.join(base, "seg=v2")
    )
    return merged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("props").cast("bigint").alias("n_with_props"),
    )


# Exact output schema of Spark's native Kafka source (structured
# streaming guide, spark.apache.org): downstream code written against
# ``format("kafka")`` sees these seven columns.
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def to_kafka_envelope(events: DataFrame, topic: str = "events") -> DataFrame:
    """Producer side of S1's native-Kafka form (kafka/README.md:69-84):
    wrap records in the exact wire envelope the Kafka source emits —
    StringSerializer key (user_id), JSON value bytes, sticky
    partition = hash(key) % 8, offset = event_id, CreateTime
    timestampType. Swapping the stand-in for a real broker changes one
    format string; every consumer downstream is schema-identical."""
    return events.select(
        F.encode(F.col("user_id").cast("string"), "UTF-8").alias("key"),
        F.encode(
            F.to_json(F.struct("event_id", "event_type", "value")), "UTF-8"
        ).alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod("user_id", F.lit(8)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),  # CreateTime
    )


@register(
    "s1_kafka_envelope_consume",
    """
    SELECT CAST(user_id % 8 AS INT) AS partition, count(*) AS n,
           max(event_id) AS max_offset,
           count(DISTINCT user_id) AS n_keys,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_value
    FROM events GROUP BY 1
    """,
    doc="S1 native form: Kafka wire envelope produce + consumer decode",
)
def s1_kafka_envelope_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round trip through the Kafka source contract: produce the
    seven-column envelope, then the consumer side deserializes key
    (string) and value (JSON bytes with explicit schema) and computes
    per-partition offsets/counts — the consumer-group bookkeeping of
    kafka/README.md:131-157. All JVM expressions: encode/decode and
    from_json stay inside whole-stage codegen."""
    events = load_table(spark, sf_dir, "events")
    env = to_kafka_envelope(events)
    assert dict(env.dtypes) == dict(
        spark.createDataFrame([], KAFKA_SOURCE_SCHEMA).dtypes
    )
    parsed = env.select(
        "partition",
        "offset",
        F.decode("key", "UTF-8").cast("bigint").alias("key_id"),
        F.from_json(
            F.decode("value", "UTF-8"),
            "event_id bigint, event_type string, value double",
        ).alias("rec"),
    )
    return parsed.groupBy("partition").agg(
        F.count("*").alias("n"),
        F.max("offset").alias("max_offset"),
        F.countDistinct("key_id").alias("n_keys"),
        F.round(
            F.sum(F.col("rec.value").cast("decimal(38,6)")).cast("double"), 2
        ).alias("total_value"),
    )


def _read_manifest_snapshot(spark: SparkSession, base: str, version: int) -> DataFrame:
    """Time-travel read: resolve the segment list from the version's
    manifest (driver-side metadata, like any table format), then one
    distributed read over exactly those segments."""
    import json

    with open(os.path.join(base, f"manifest-{version}.json")) as f:
        segments = json.load(f)["segments"]
    return spark.read.parquet(*[os.path.join(base, s) for s in segments])


@register(
    "s9_snapshot_time_travel",
    f"""
    SELECT 1 AS version, count(*) AS n, max(event_id) AS max_offset
    FROM events WHERE ts < TIMESTAMP '{RETENTION_CUTOFF}'
    UNION ALL
    SELECT 2 AS version, count(*) AS n, max(event_id) AS max_offset
    FROM events
    """,
    doc="S9+: manifest-versioned snapshots — read the log as of version N",
)
def s9_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse-style snapshot isolation on the parquet log (the
    public Delta/Iceberg design: immutable data files + a versioned
    manifest naming which files each snapshot comprises). Version 1
    commits the pre-cutoff segments; an append commits version 2 with
    both. Reading as-of v1 after the append still sees only v1's
    files — time travel without copying data. At 100 TB the manifest
    is KBs of metadata; snapshot reads prune to exactly the named
    segments and appends never rewrite history."""
    import json
    import shutil

    from big_data_training_spark.streaming.replay import materialize

    events = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="bdts_snap_")
    v1 = events.filter(F.col("ts") < F.lit(RETENTION_CUTOFF).cast("timestamp"))
    v2_delta = events.filter(F.col("ts") >= F.lit(RETENTION_CUTOFF).cast("timestamp"))
    v1.write.parquet(os.path.join(base, "seg-000"))
    with open(os.path.join(base, "manifest-1.json"), "w") as f:
        json.dump({"segments": ["seg-000"]}, f)
    v2_delta.write.parquet(os.path.join(base, "seg-001"))
    with open(os.path.join(base, "manifest-2.json"), "w") as f:
        json.dump({"segments": ["seg-000", "seg-001"]}, f)

    def stats(version: int) -> DataFrame:
        return _read_manifest_snapshot(spark, base, version).agg(
            F.lit(version).alias("version"),
            F.count("*").alias("n"),
            F.max("event_id").alias("max_offset"),
        ).select("version", "n", "max_offset")

    out = materialize(stats(1).unionAll(stats(2)))
    shutil.rmtree(base, ignore_errors=True)
    return out


@register(
    "s9_partitioned_layout_prune",
    """
    SELECT l_returnflag, count(*) AS n_items,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_price
    FROM lineitem
    WHERE l_returnflag IN ('R', 'A')
    GROUP BY l_returnflag
    """,
    doc="S9/S11: hive-partitioned layout + partition-pruned scan",
)
def s9_partitioned_layout_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-partitioned warehouse layout (the retention/pruning
    lever S11 exploits): lineitem is rewritten ``partitionBy(l_returnflag)``
    and queried with a partition predicate, so the scan's
    PartitionFilters skip every non-matching directory without opening a
    single file — at 100 TB this is the difference between scanning one
    mode's share and scanning the table. The plan assertion lives in
    tests/test_scale_strategies.py; here the pruned result is
    oracle-checked against the unpartitioned table."""
    import shutil

    from big_data_training_spark.streaming.replay import materialize

    li = load_table(spark, sf_dir, "lineitem")
    base = tempfile.mkdtemp(prefix="bdts_part_")
    (
        li.select("l_returnflag", "l_extendedprice")
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(base)
    )
    out = materialize(
        spark.read.parquet(base)
        .filter(F.col("l_returnflag").isin("R", "A"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double"),
                2,
            ).alias("total_price"),
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


@register(
    "s8_orc_roundtrip",
    """
    SELECT event_type, count(*) AS n, max(event_id) AS max_offset,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_value
    FROM events WHERE event_id < 2000 GROUP BY event_type
    """,
    doc="S8: ORC columnar sink + source connector round-trip",
)
def s8_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round trip — the second columnar format the warehouse tier
    speaks natively (Hive's default, README.md:20 storage story).
    Binary-faithful for doubles unlike text formats, with the same
    predicate-pushdown/column-pruning scan behavior as Parquet."""
    import shutil

    from big_data_training_spark.streaming.replay import materialize

    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    base = tempfile.mkdtemp(prefix="bdts_orc_")
    out = base + "/slice"
    events.select("event_id", "event_type", "value").write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    result = materialize(
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("event_id").alias("max_offset"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 2
            ).alias("total_value"),
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    return result


COMPACT_TARGET_FILES = 4


@register(
    "s11_segment_compaction",
    """
    SELECT event_type, count(*) AS n, max(event_id) AS max_offset
    FROM events GROUP BY event_type
    """,
    doc="S11: small-file segment compaction (OPTIMIZE) preserving content",
)
def s11_segment_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OPTIMIZE half of retention management: a log accumulates many
    small segments (here 32 via round-robin write); compaction rewrites
    them into a few target-sized files with one shuffle-free coalesce —
    the metadata-and-IO fix for the small-files problem that kills scan
    parallelism bookkeeping at 100 TB. The oracle checks content
    fidelity; the file-count contract is asserted in-line (compacted
    directory must have ≤ target files)."""
    import shutil

    from big_data_training_spark.streaming.replay import materialize

    events = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="bdts_compact_")
    frag_dir = os.path.join(base, "fragmented")
    compact_dir = os.path.join(base, "compacted")
    events.repartition(32).write.mode("overwrite").parquet(frag_dir)
    frag = spark.read.parquet(frag_dir)
    frag.coalesce(COMPACT_TARGET_FILES).write.mode("overwrite").parquet(compact_dir)
    back = spark.read.parquet(compact_dir)
    n_files = len(
        [f for f in os.listdir(compact_dir) if f.endswith(".parquet")]
    )
    if n_files > COMPACT_TARGET_FILES:
        raise RuntimeError(
            f"compaction produced {n_files} files > {COMPACT_TARGET_FILES}"
        )
    out = materialize(
        back.groupBy("event_type").agg(
            F.count("*").alias("n"), F.max("event_id").alias("max_offset")
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    return out
