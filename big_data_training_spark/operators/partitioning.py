"""Partitioning / keying / ordering semantics (SURVEY.md §2.2, §2.11).

P1 hash-partition-by-key, P5 re-key, P7 per-key order, P8 global order,
K2 per-partition order preservation, F6 hash partition assignment.

The reference's guarantee (kafka/README.md:361-378): same key → same
partition → per-key total order; global order needs a single partition.
In Spark the per-key form is ``repartition(n, key)`` +
``sortWithinPartitions`` or, query-level, a window ordered within the
key partition; the global form is a total ``orderBy`` (range-partitioned
sort — better than the reference's 1-partition bottleneck because Spark
samples range bounds and keeps the sort distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60
from big_data_training_spark.registry import register


@register(
    "p7_per_key_order",
    """
    SELECT event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
           CAST(coalesce(date_diff('second',
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts), 0)
            AS BIGINT) AS gap_s
    FROM events
    """,
    doc="P7/K2: per-key ordered consumption with sequence + gap",
)
def p7_per_key_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key order: hash-exchange on user_id, sort within partition —
    the Spark realization of 局部有序 (kafka/README.md:366-376)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.row_number().over(w).cast("bigint").alias("seq"),
        F.coalesce(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w),
            F.lit(0),
        ).alias("gap_s"),
    )


@register(
    "p8_global_order_head",
    """
    SELECT event_id, ts, event_type FROM events
    ORDER BY ts ASC, event_id ASC LIMIT 100
    """,
    doc="P8: global total order (single-partition analog)",
)
def p8_global_order_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global order head: TakeOrderedAndProject — no single-partition
    bottleneck, unlike the reference's 1-partition topic."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .limit(100)
    )


@register(
    "p1_partition_balance",
    None,  # hash functions differ across engines; contract check only
    doc="P1/F6: hash-partition balance contract (rows-only check)",
)
def p1_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-assignment contract (same key → same partition; balanced):
    count keys and rows per pmod(hash(key), 32) bucket. Spark's Murmur3 ≠
    Kafka murmur2 ≠ DuckDB hash, so the *values* are engine-specific and
    the driver records a rows-only check (SURVEY.md §7 hard parts)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.pmod(F.hash("user_id"), F.lit(32)).alias("bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_keys"),
        )
    )


@register(
    "f6_hash_partition_assign",
    """
    SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 32
               AS partition_id,
           count(*) AS n_rows, count(DISTINCT user_id) AS n_keys
    FROM events GROUP BY 1
    """,
    doc="F6: engine-portable hash partition assignment (value-verified)",
)
def f6_hash_partition_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key → hash → mod n_partitions (kafka/README.md:375-378) with the
    md5-derived portable hash, so the oracle verifies actual assignments
    (unlike p1, which checks only the native-Murmur3 contract)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            (hash60(F.col("user_id").cast("string")) % 32).alias("partition_id")
        )
        .agg(F.count("*").alias("n_rows"), F.countDistinct("user_id").alias("n_keys"))
    )


@register(
    "p3_custom_partitioner",
    """
    SELECT user_id % 8 AS partition_id, count(*) AS n,
           count(DISTINCT user_id) AS n_keys
    FROM events GROUP BY 1
    """,
    doc="P3/U2: user-defined partitioner via the RDD escape hatch",
)
def p3_custom_partitioner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `implements Partitioner` (kafka/README.md:24):
    an arbitrary Python key→partition function through RDD partitionBy —
    the one operator family where we drop below the DataFrame API.
    Used only when hash/range partitioning genuinely can't express the
    placement policy; everything else in this engine stays declarative."""
    events = load_table(spark, sf_dir, "events")
    pairs = events.select("user_id").rdd.map(lambda r: (r.user_id, 1))
    parted = pairs.partitionBy(8, lambda key: key % 8)

    def per_partition(idx: int, it):
        n = 0
        keys = set()
        for k, _ in it:
            n += 1
            keys.add(k)
        yield (idx, n, len(keys))

    out = parted.mapPartitionsWithIndex(per_partition)
    return spark.createDataFrame(
        out, "partition_id int, n bigint, n_keys bigint"
    ).select(F.col("partition_id").cast("bigint").alias("partition_id"), "n", "n_keys")


@register(
    "p_skew_salted_agg",
    """
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="skew strategy: salted two-stage aggregation (same result, bounded keys)",
)
def p_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key mitigation for when AQE isn't enough: salt the key into 16
    sub-keys, aggregate partials per (key, salt), then merge partials per
    key. The oracle checks it equals the plain aggregation — salting must
    never change semantics. The 5-key event_type domain is exactly the
    shape that melts a 1000-executor cluster without this."""
    events = load_table(spark, sf_dir, "events")
    salted = events.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
    partial = (
        salted.groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("pv"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("pv").cast("double"), 2).alias("total_value"),
        )
    )


@register(
    "p5_rekey_counts",
    """
    SELECT CAST(value >= 100 AS VARCHAR) AS high_value, event_type,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
    doc="P5: re-key by derived key (KeySelector, flink/README.md:24)",
)
def p5_rekey_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a new grouping key from the element, then group — the
    keyBy(KeySelector) pattern."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("high_value", (F.col("value") >= 100).cast("string"))
        .groupBy("high_value", "event_type")
        .agg(F.count("*").alias("n"))
    )


N_SALTS = 8


@register(
    "j_skew_salted_join",
    """
    SELECT e.event_type, count(*) AS n,
           round(CAST(sum(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_value
    FROM events e
    JOIN (VALUES ('signup', 10), ('click', 1), ('view', 2),
                 ('purchase', 50), ('error', 0)) AS w(event_type, weight)
      ON e.event_type = w.event_type
    WHERE w.weight > 0
    GROUP BY e.event_type
    """,
    doc="skew strategy: salted replicate-join (hot keys spread over N_SALTS)",
)
def j_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-join mitigation when the small side is too big to broadcast
    and AQE's skew split can't help (a single hot key): salt the fact
    side into N_SALTS sub-keys and replicate each dimension row across
    all salts, so the join shuffles on (key, salt) — every hot key's
    rows spread across N_SALTS reducers instead of melting one. The
    oracle verifies against the plain join: salting must never change
    semantics. (Here the dim WOULD broadcast — the query disables that
    deliberately to exercise the shuffle-path strategy; j1 covers the
    broadcast answer.)"""
    events = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("signup", 10), ("click", 1), ("view", 2), ("purchase", 50), ("error", 0)],
        "event_type string, weight int",
    ).filter(F.col("weight") > 0)
    salted_facts = events.withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)).cast("int")
    )
    replicated_dim = (
        dim.withColumn("salt", F.explode(F.expr(f"sequence(0, {N_SALTS - 1})")))
        .withColumn("salt", F.col("salt").cast("int"))
        .hint("SHUFFLE_HASH")
    )
    return (
        salted_facts.join(replicated_dim, ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 2
            ).alias("total_value"),
        )
    )
