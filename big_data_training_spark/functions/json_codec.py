"""Codec layer (SURVEY.md §2.10): F1 serde, F3 JSON.

Events carry semi-structured JSON payloads (kafka/README.md:296,312);
``from_json`` with an explicit schema is the registry-validated
deserialize (F2's schema-compatibility check maps to the explicit reader
schema: incompatible payloads surface as nulls, not failures —
PERMISSIVE mode). ``to_json`` is the serialize side. Avro/Protobuf
(F2/F4) need external packages; see codecs_avro_protobuf() below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.numeric import davg, sql_davg
from big_data_training_spark.registry import register


@register(
    "f3_json_extract_agg",
    f"""
    SELECT event_type,
           {sql_davg("try_cast(json_extract_string(props, '$.k') AS INT)", 'avg_k')},
           max(try_cast(json_extract_string(props, '$.k') AS INT)) AS max_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="F3: JSON payload deserialize + aggregate (kafka/README.md:312)",
)
def f3_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with explicit schema → typed field → grouped agg."""
    events = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            davg("k", "avg_k"),
            F.max("k").cast("int").alias("max_k"),
            F.count("*").alias("n"),
        )
    )


@register(
    "f1_serde_roundtrip",
    """
    SELECT event_id, CAST(user_id AS VARCHAR) AS key_str,
           concat('{"t":"', event_type, '"}') AS payload
    FROM events WHERE event_id < 500
    """,
    doc="F1: serialize (to_json) the record back to wire shape",
)
def f1_serde_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Producer-side serialize: key → string, payload → JSON
    (StringSerializer analog, kafka/README.md:74-75)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") < 500).select(
        "event_id",
        F.col("user_id").cast("string").alias("key_str"),
        F.to_json(F.struct(F.col("event_type").alias("t"))).alias("payload"),
    )


def codecs_avro_protobuf_available() -> dict[str, bool]:
    """F2/F4: Avro and Protobuf codecs require the spark-avro /
    spark-protobuf packages on the classpath; report availability so
    callers can degrade to the JSON path (SURVEY.md §7 risks)."""
    out = {}
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401

        out["avro"] = True
    except Exception:
        out["avro"] = False
    try:
        from pyspark.sql.protobuf.functions import from_protobuf  # noqa: F401

        out["protobuf"] = True
    except Exception:
        out["protobuf"] = False
    return out
