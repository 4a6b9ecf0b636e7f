"""Table loaders over the partitioned-Parquet "log" layout.

A reference *topic* is a durable append-only log analogized to a table
(kafka/README.md:9-10, 29); here a topic at rest is a Parquet directory —
columnar, splittable, min/max-indexed, so offset-range scans (S4) and
predicate pushdown come for free at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are fixed-size; supplier/part/customer grow slowly).
BROADCAST_TABLES = ("region", "nation", "supplier")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one Parquet "topic".

    The ``events`` fixture stores TIMESTAMP(NANOS), which Spark's reader
    rejects by default; read the raw int64 nanos (legacy conf, runtime
    settable) and truncate to micros — byte-identical with what the
    DuckDB oracle does on ns→us conversion. Integer ``div`` matters:
    nanosecond epochs exceed 2^53, so double division would round.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    return canonicalize_ts(_read_parquet_nanosafe(spark, path))


def canonicalize_ts(df: DataFrame) -> DataFrame:
    """ns-epoch ``ts`` (bigint) → TimestampType, truncated to micros."""
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _read_parquet_nanosafe(spark: SparkSession, path: str) -> DataFrame:
    # Fixtures store naive timestamps (no isAdjustedToUTC); read them as
    # session-local TIMESTAMP, not TIMESTAMP_NTZ, so downstream epoch
    # casts (`cast(ts as bigint)`, unix_* functions) stay legal and the
    # values match the DuckDB oracle's naive-UTC reading. Scoped to this
    # read via the parquet reader option — the session conf of an
    # externally-built SparkSession is never mutated on the happy path.
    try:
        return spark.read.option("inferTimestampNTZ", "false").parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) columns: only the legacy *session* conf exposes
        # them (as raw int64 nanos; no per-read option exists). This is a
        # deliberate session-wide switch, taken only when a nanos file is
        # actually encountered; canonicalize_ts() then truncates to micros.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.option("inferTimestampNTZ", "false").parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def repartition_for_compute(df: DataFrame) -> DataFrame:
    """Spread rows across all cores before CPU-heavy per-row work.

    Small fixtures arrive as one Parquet file → one input split → one
    task, which serializes expression-heavy scans (hashing, shingling)
    onto a single core. A round-robin repartition to the default
    parallelism costs one cheap exchange of the raw rows and buys full
    fan-out. At 100 TB inputs are already thousands of splits and this
    becomes a no-op choice — keyed operators must NOT rely on it.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
