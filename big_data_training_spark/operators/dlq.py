"""Dead-letter-queue routing with provenance (SURVEY.md §2.9, E1-E4).

The reference's DLQ pattern (kafka/README.md:202-271): per-record
validation; failures are forwarded to a dead-letter topic carrying
origin metadata so they stay traceable; DLQ size is monitored.

Spark realization: one scan, two complementary filters (the branch
pattern, flink/README.md:23) — Catalyst reuses the scan per branch and
both branches stay fully pipelined. Validation here = JSON payload must
parse and carry k in [0,80), and the event must not be of type 'error'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

# Validation predicate + failure-reason expression, shared by the ok/dlq
# branches. from_json returns null on unparseable payloads (PERMISSIVE).
_PROPS_SCHEMA = "k INT"


def _parsed(events: DataFrame) -> DataFrame:
    return events.withColumn("k", F.from_json("props", _PROPS_SCHEMA).getField("k"))


def _fail_reason() -> Column:
    return (
        F.when(F.col("event_type") == "error", F.lit("error_event"))
        .when(F.col("k").isNull(), F.lit("unparseable_props"))
        .when((F.col("k") < 0) | (F.col("k") >= 80), F.lit("k_out_of_range"))
        .otherwise(F.lit(None))
    )


_DLQ_SQL_REASON = """
    CASE WHEN event_type = 'error' THEN 'error_event'
         WHEN try_cast(json_extract_string(props, '$.k') AS INT) IS NULL
              THEN 'unparseable_props'
         WHEN try_cast(json_extract_string(props, '$.k') AS INT) < 0
           OR try_cast(json_extract_string(props, '$.k') AS INT) >= 80
              THEN 'k_out_of_range'
         ELSE NULL END
"""


@register(
    "e1_dlq_routing",
    f"""
    SELECT event_id AS origin_offset, user_id AS origin_key, ts AS failed_ts,
           'events' AS origin_topic, {_DLQ_SQL_REASON} AS error_reason
    FROM events WHERE {_DLQ_SQL_REASON} IS NOT NULL
    """,
    doc="E1+E2: route failing records to DLQ with provenance metadata",
)
def e1_dlq_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DLQ branch: failing records + origin metadata columns
    (topic/offset/key/reason — kafka/README.md:265-271)."""
    events = _parsed(load_table(spark, sf_dir, "events"))
    return (
        events.withColumn("error_reason", _fail_reason())
        .filter(F.col("error_reason").isNotNull())
        .select(
            F.col("event_id").alias("origin_offset"),
            F.col("user_id").alias("origin_key"),
            F.col("ts").alias("failed_ts"),
            F.lit("events").alias("origin_topic"),
            "error_reason",
        )
    )


@register(
    "e1_ok_branch",
    f"""
    SELECT event_type, count(*) AS n_ok,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_value
    FROM events WHERE {_DLQ_SQL_REASON} IS NULL
    GROUP BY event_type
    """,
    doc="E1: the success branch continues through the pipeline",
)
def e1_ok_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The success branch: complementary filter, downstream aggregation."""
    events = _parsed(load_table(spark, sf_dir, "events"))
    return (
        events.withColumn("error_reason", _fail_reason())
        .filter(F.col("error_reason").isNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_ok"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 2).alias(
                "total_value"
            ),
        )
    )


@register(
    "e1_permissive_corrupt_records",
    """
    SELECT CAST(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_corrupt,
           CAST(sum(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_good,
           max(CASE WHEN event_id % 7 <> 0 THEN event_id END) AS max_good_offset
    FROM events WHERE event_id < 2000
    """,
    doc="E1 parse path: PERMISSIVE JSON read routes corrupt rows to _corrupt_record",
)
def e1_permissive_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real schema-on-read failure mechanism: write a JSON-lines
    topic where every 7th payload is truncated mid-object, read it back
    PERMISSIVE with a ``_corrupt_record`` column, and split good rows
    from dead letters — no exceptions, per-record routing
    (kafka/README.md:202-264 without the try/catch)."""
    import tempfile

    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    lines = events.select(
        F.when(
            F.col("event_id") % 7 == 0,
            # truncated JSON — unparseable on read
            F.concat(F.lit('{"event_id": '), F.col("event_id").cast("string"), F.lit(', "user_i')),
        )
        .otherwise(
            F.to_json(F.struct("event_id", "user_id", "event_type"))
        )
        .alias("value")
    )
    out = tempfile.mkdtemp(prefix="bdts_perm_") + "/topic"
    lines.write.mode("overwrite").text(out)
    back = spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, _corrupt_record string"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(out)
    return back.agg(
        F.sum((F.col("_corrupt_record").isNotNull()).cast("int"))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum((F.col("_corrupt_record").isNull()).cast("int"))
        .cast("bigint")
        .alias("n_good"),
        F.max(
            F.when(F.col("_corrupt_record").isNull(), F.col("event_id"))
        ).alias("max_good_offset"),
    )


@register(
    "e3_retry_redrive",
    f"""
    SELECT event_type, count(*) AS n_recovered,
           round(CAST(sum(CAST(
               least(greatest(try_cast(json_extract_string(props, '$.k') AS INT), 0), 79)
           AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_k_fixed
    FROM events
    WHERE {_DLQ_SQL_REASON} = 'k_out_of_range'
    GROUP BY event_type
    """,
    doc="E3: re-drive DLQ records through a fixed pipeline (kafka/README.md:210)",
)
def e3_retry_redrive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry path: take the retryable DLQ class (k_out_of_range), apply
    the fix (clamp k into range), and re-run the downstream aggregation.
    Batch re-drive = re-run over the DLQ table, the reference's
    delayed-retry queue."""
    events = _parsed(load_table(spark, sf_dir, "events"))
    fixed_k = F.least(F.greatest(F.col("k"), F.lit(0)), F.lit(79))
    return (
        events.withColumn("error_reason", _fail_reason())
        .filter(F.col("error_reason") == "k_out_of_range")
        .withColumn("k_fixed", fixed_k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_recovered"),
            F.round(
                F.sum(F.col("k_fixed").cast("decimal(38,6)")).cast("double"), 2
            ).alias("total_k_fixed"),
        )
    )


@register(
    "e4_dlq_monitoring",
    f"""
    SELECT {_DLQ_SQL_REASON} AS error_reason, count(*) AS n,
           CAST(count(*) > 1000 AS VARCHAR) AS over_threshold
    FROM events WHERE {_DLQ_SQL_REASON} IS NOT NULL
    GROUP BY 1
    """,
    doc="E4: DLQ size monitoring with alert threshold (kafka/README.md:211)",
)
def e4_dlq_monitoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ depth per failure reason + threshold flag."""
    events = _parsed(load_table(spark, sf_dir, "events"))
    return (
        events.withColumn("error_reason", _fail_reason())
        .filter(F.col("error_reason").isNotNull())
        .groupBy("error_reason")
        .agg(
            F.count("*").alias("n"),
            (F.count("*") > 1000).cast("string").alias("over_threshold"),
        )
    )
