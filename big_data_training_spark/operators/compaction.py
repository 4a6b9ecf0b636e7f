"""Log compaction / tombstone / dedup semantics (SURVEY.md §2.8).

C1 log compaction keeps only the newest record per key
(kafka/README.md:27, 433-435) — expressed as a window-ranked
latest-per-key, which Spark executes as one hash exchange on the key +
in-partition sort (no driver involvement, scales linearly).
C2 tombstone delete: a compacted key whose latest record is a delete
marker disappears (kafka/README.md:436-437).
C3 deduplicated consumption under at-least-once delivery
(kafka/README.md:171).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

_LATEST_SQL = """
    WITH ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
"""


@register(
    "c1_compaction_latest_per_key",
    _LATEST_SQL
    + """
    SELECT user_id, event_id AS last_offset, ts AS last_ts,
           event_type AS last_type, round(value, 2) AS last_value
    FROM ranked WHERE rn = 1
    """,
    doc="C1: log compaction — latest record per key",
    bench=True,
)
def c1_compaction_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key via row_number over (key, ts desc) — one shuffle."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_offset"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.round("value", 2).alias("last_value"),
        )
    )


@register(
    "c1_materialized_compact_topic",
    _LATEST_SQL
    + """
    SELECT event_type AS last_type, count(*) AS n_keys,
           max(event_id) AS max_offset
    FROM ranked WHERE rn = 1
    GROUP BY event_type
    """,
    doc="C1 end-to-end: compact the topic, persist it, re-consume the compact log",
)
def c1_materialized_compact_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Kafka as a long-term table' (kafka/README.md:27): the compaction
    query materializes a compacted topic (Parquet write), and consumers
    read the compact log — verified by aggregating the re-read copy."""
    import tempfile

    compacted = c1_compaction_latest_per_key(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="bdts_compact_") + "/topic"
    compacted.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("last_type")
        .agg(
            F.count("*").alias("n_keys"),
            F.max("last_offset").alias("max_offset"),
        )
    )


@register(
    "c2_compaction_tombstone",
    _LATEST_SQL
    + """
    SELECT user_id, event_id AS last_offset, event_type AS last_type
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
    doc="C2: tombstone delete — drop keys whose latest record is a marker",
)
def c2_compaction_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction + tombstone: 'error' as the delete-marker analog of a
    null-value record; keys whose latest record is a tombstone vanish."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_id").alias("last_offset"),
            F.col("event_type").alias("last_type"),
        )
    )


@register(
    "c3_dedup_redelivery",
    """
    WITH delivered AS (
        SELECT * FROM events WHERE event_id % 10 < 3
        UNION ALL
        SELECT * FROM events WHERE event_id % 10 < 3
    )
    SELECT event_type, count(*) AS n_after_dedup
    FROM (SELECT DISTINCT event_id, event_type FROM delivered)
    GROUP BY event_type
    """,
    doc="C3: dedup of at-least-once redelivery (kafka/README.md:171)",
)
def c3_dedup_redelivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulate duplicate delivery (union of two reads), then
    dropDuplicates on the offset — counts return to exactly-once."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 10 < 3)
    delivered = events.unionAll(events)
    return (
        delivered.select("event_id", "event_type")
        .dropDuplicates(["event_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_after_dedup"))
    )
