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

from tests.conftest import SF_DIR


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
