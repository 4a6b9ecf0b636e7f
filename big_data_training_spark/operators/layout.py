"""Physical-layout operators: Z-order clustering and deterministic
per-key sampling.

The reference's storage layer is a partitioned log plus a warehouse
(README.md:20 HDFS/Hive; kafka/README.md:29 retention-segmented logs).
At 100 TB the *layout* of data inside those files decides how much a
query reads: Z-ordering interleaves the bits of two filter columns so
range-partitioned files are simultaneously clustered on both — Parquet
min/max pruning then works for predicates on either column, the trick
Delta/Iceberg expose as OPTIMIZE ZORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60, sql_hash60
from big_data_training_spark.registry import register

Z_BITS = 16  # bits interleaved per dimension → 32-bit z-value
Z_BUCKETS_SHIFT = 27  # top 5 bits → 32 layout buckets


def _z_expr(a: str, b: str) -> str:
    """Bit-interleave expression (codegen-friendly: a flat sum of shifts,
    no higher-order functions)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(shiftleft(({a} >> {i}) & 1, {2 * i}))")
        terms.append(f"(shiftleft(({b} >> {i}) & 1, {2 * i + 1}))")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _sql_z(a: str, b: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "s9_zorder_layout",
    f"""
    WITH mx AS (
        SELECT max(l_orderkey) AS ma, max(l_partkey) AS mb FROM lineitem
    ), z AS (
        SELECT l_orderkey AS a, l_partkey AS b,
               {_sql_z("(l_orderkey * 65535 // ma)", "(l_partkey * 65535 // mb)")} AS zv
        FROM lineitem, mx
    )
    SELECT CAST(zv >> {Z_BUCKETS_SHIFT} AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(a) AS BIGINT) AS min_a, CAST(max(a) AS BIGINT) AS max_a,
           CAST(min(b) AS BIGINT) AS min_b, CAST(max(b) AS BIGINT) AS max_b
    FROM z GROUP BY 1
    """,
    doc="S9 layout: Z-order bucket stats — both dims clustered per bucket",
    bench=True,
)
def s9_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit: normalize (l_orderkey, l_partkey) into
    the 16-bit range (integer scaling by the broadcast column maxima —
    scale-factor independent), interleave their bits into a 32-bit
    z-value, and report per-bucket min/max of BOTH dimensions — the
    per-file footer ranges a Z-ordered rewrite would produce, showing
    each bucket covers a tight square in (a, b) space so predicates on
    either column prune. The z-value is a flat codegen-able sum of bit
    shifts (no HOFs, no Python). The write path at scale is
    ``repartitionByRange(n, zv).sortWithinPartitions(zv)`` before the
    Parquet write; the top-bits bucket here is the deterministic
    stand-in for the sampled range boundaries so the oracle hashes
    exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(
        F.max("l_orderkey").alias("ma"), F.max("l_partkey").alias("mb")
    )
    a = "(l_orderkey * 65535 div ma)"
    b = "(l_partkey * 65535 div mb)"
    return (
        li.crossJoin(F.broadcast(mx))
        .select(
            F.col("l_orderkey").alias("a"),
            F.col("l_partkey").alias("b"),
            F.expr(_z_expr(a, b)).alias("zv"),
        )
        .groupBy(F.expr(f"zv >> {Z_BUCKETS_SHIFT}").cast("bigint").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("a").cast("bigint").alias("min_a"),
            F.max("a").cast("bigint").alias("max_a"),
            F.min("b").cast("bigint").alias("min_b"),
            F.max("b").cast("bigint").alias("max_b"),
        )
    )


SAMPLE_PER_SOURCE = 20


@register(
    "tx_per_source_sample",
    f"""
    WITH ranked AS (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {sql_hash60("CAST(doc_id AS VARCHAR)")}, doc_id
               ) AS rk
        FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {SAMPLE_PER_SOURCE}
    """,
    doc="deterministic per-source reservoir: N smallest doc-id hashes per shard",
)
def tx_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample per source shard: rank documents by
    their portable 60-bit hash (a fixed random permutation) and keep the
    first N per source — the reproducible "reservoir" every eval/debug
    pipeline draws, stable across reruns and engines. The per-key
    window prunes to N rows per group before the final collect
    (WindowGroupLimit); one shuffle on source."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        hash60(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select(
            "source", "doc_id", F.row_number().over(w).cast("bigint").alias("rk")
        )
        .filter(F.col("rk") <= SAMPLE_PER_SOURCE)
    )
