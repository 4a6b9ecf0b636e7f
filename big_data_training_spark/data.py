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
    """Normalize ``ts`` to session-local TimestampType whatever physical
    form the fixture took: ns-epoch bigint (legacy nanos read) →
    truncate to micros; TIMESTAMP_NTZ (naive micros under the default
    ``inferTimestampNTZ=true``) → cast, which attaches the session zone
    (UTC everywhere here — engine sessions pin it, the harness runs in
    a UTC container) and matches the oracle's naive-UTC reading.
    Event-time ops (watermarks, ``unix_micros``) require TIMESTAMP, so
    an un-normalized NTZ column would fail on default-config sessions —
    caught by the round-4 default-session driver simulation."""
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Per-session schema memo for the immutable fixture files, keyed on
# (path, mtime, size): schema INFERENCE costs ~100 ms of driver
# round-trips per spark.read.parquet() while an explicit-schema read
# costs ~20 ms — and every query pays this 1-3x per run. Metadata only,
# never rows; keyed per session because the nanos legacy conf (below) is
# session-scoped, so each session's FIRST read of a nanos file must still
# take the inference path that flips it. WeakKey so dead sessions drop.
import weakref as _weakref

_SCHEMA_MEMO: "_weakref.WeakKeyDictionary[SparkSession, dict]" = (
    _weakref.WeakKeyDictionary()
)


def _read_parquet_nanosafe(spark: SparkSession, path: str) -> DataFrame:
    # The parquet reader has no working per-read switch for NTZ
    # inference (the `inferTimestampNTZ` *option* is silently ignored;
    # only the session conf works, verified round 4) — so the read takes
    # whatever the session infers and canonicalize_ts() normalizes the
    # dtype afterwards, leaving external sessions' conf untouched.
    st = os.stat(path)
    pkey = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    per = _SCHEMA_MEMO.setdefault(spark, {})
    schema = per.get(pkey)
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    try:
        df = spark.read.parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) columns: only the legacy *session* conf exposes
        # them (as raw int64 nanos; no per-read option exists). This is a
        # deliberate session-wide switch, taken only when a nanos file is
        # actually encountered; canonicalize_ts() then truncates to micros.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    per[pkey] = df.schema
    return df


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
