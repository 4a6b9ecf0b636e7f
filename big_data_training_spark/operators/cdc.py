"""CDC ingest / changelog upsert (S10) and set-operation utilities.

S10 (kafka/README.md:332): capture change events as a stream and keep a
derived table fresh. Without a MERGE-capable table format in this
container, the upsert is the canonical emulation: latest-change-per-key
anti-joined against the snapshot, unioned — exactly what
``foreachBatch`` + MERGE does per micro-batch on Delta/Iceberg.

Set ops realize the reference's reprocessing comparison
(kafka/README.md:336, "compare the two result sets") as first-class
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

CDC_CUTOVER = "2024-01-20"

_LATEST_ALL_SQL = """
    WITH ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_id AS last_offset, event_type AS last_type,
           round(value, 2) AS last_value
    FROM ranked WHERE rn = 1
"""


def _latest_per_key(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_offset"),
            F.col("event_type").alias("last_type"),
            F.round("value", 2).alias("last_value"),
        )
    )


@register(
    "s10_cdc_upsert",
    _LATEST_ALL_SQL,
    doc="S10: apply a change stream onto a snapshot (MERGE emulation)",
)
def s10_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot (state at cutover) + change batch (events after cutover)
    → upsert = latest-change-per-key ∪ (snapshot ⟕-anti changes). The
    result must equal compaction over the full log — which is what the
    oracle computes, so the MERGE algebra itself is what's verified."""
    events = load_table(spark, sf_dir, "events")
    cut = F.lit(CDC_CUTOVER).cast("timestamp")
    snapshot = _latest_per_key(events.filter(F.col("ts") < cut))
    changes = _latest_per_key(events.filter(F.col("ts") >= cut))
    kept = snapshot.join(changes.select("user_id"), "user_id", "left_anti")
    return kept.unionByName(changes)


@register(
    "set_reprocess_compare",
    """
    SELECT 'only_v1' AS side, count(*) AS n FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'both' AS side, count(*) AS n FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    doc="set ops: EXCEPT/INTERSECT as the reprocessing diff primitive",
)
def set_reprocess_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """except/intersect over keyed result sets (ST5's comparison step)."""
    events = load_table(spark, sf_dir, "events")
    signup = events.filter(F.col("event_type") == "signup").select("user_id").distinct()
    purchase = (
        events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    only_v1 = signup.subtract(purchase).select(
        F.lit("only_v1").alias("side"), F.lit(1).alias("c")
    )
    both = signup.intersect(purchase).select(
        F.lit("both").alias("side"), F.lit(1).alias("c")
    )
    # zero anchors keep both sides present even when a set is empty
    anchors = spark.createDataFrame(
        [("only_v1", 0), ("both", 0)], "side string, c int"
    )
    return (
        anchors.unionByName(only_v1)
        .unionByName(both)
        .groupBy("side")
        .agg(F.sum("c").cast("bigint").alias("n"))
    )


# Shared with the streaming form (streaming/cdc_stream.py): the stream's
# incremental merge must converge to exactly this table.
SCD2_SQL = """
    WITH changes AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), versions AS (
        SELECT user_id, ts AS valid_from, event_id, event_type,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from, valid_to,
           CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
    FROM versions
    """


@register(
    "cdc_scd2_history",
    SCD2_SQL,
    doc="S10+: SCD Type 2 — versioned dimension rows with validity ranges",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension history (the warehouse-side consumer of
    a CDC stream, kafka/README.md:332): collapse consecutive identical
    states per key (lag), then derive [valid_from, valid_to) ranges
    (lead) — NULL valid_to marks the current version. Two window passes
    over the same (user_id, ts) sort order → Catalyst plans ONE
    shuffle + sort reused by both Window operators. At 100 TB the
    changelog is already partitioned by key-hash, so the single
    exchange is the whole cost."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    versions = changes.withColumn("valid_to", F.lead("ts").over(w))
    return versions.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        "valid_to",
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).alias("is_current"),
    )
