"""J3 made first-class: a bucketed co-located join through the session
catalog (kafka/README.md:92 co-partitioned consumption; the Kafka
"both topics partitioned by the same key count" contract).

Both sides are written ``bucketBy(8, key)`` into warehouse tables, so
the sort-merge join plans with ZERO Exchange on either side — the
bucketed layout IS the shuffle, paid once at write time and amortized
over every later join on the key. tests/test_scale_strategies.py
asserts that plan property (no ShuffleExchange under the join);
this query certifies the VALUES through the driver's DuckDB gate
(bucketing must never change results, only movement).

Scale: this is the canonical 100 TB co-location strategy — fact tables
bucketed by join key at ingest join without reshuffling 100 TB per
query. Bucket count on a real cluster is sized so a bucket fits an
executor's shuffle-read budget (docs/SCALING.md); 8 here mirrors the
existing J3 plan test.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register


@register(
    "j3_bucketed_coloc_join",
    """
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY 1
    """,
    doc="J3 co-located join: both sides bucketed by the join key in the"
    " warehouse, sort-merge joined with no Exchange on either side",
    bench=True,
)
def j3_bucketed_coloc_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem and orders bucketed by the SAME key into catalog
    tables, then join through ``spark.table`` — Catalyst sees matching
    HashClusteredDistribution from the bucket spec and plans the
    sort-merge join with no Exchange on either side (the plan test
    asserts it). The filter stays on the probe side so pushdown is
    visible through the bucketed scan too. Values must equal the plain
    join — which is exactly what the oracle checks.

    The catalog table names carry a per-run suffix derived from the
    tempdir, so concurrent sessions sharing a metastore/warehouse never
    clobber each other's tables mid-query. NOTE on the bench=True row:
    its time INCLUDES the two bucketed warehouse writes every run — it
    measures the amortization cost a real pipeline pays once at ingest,
    not just the Exchange-free join (docs/SCALING.md carries the same
    note)."""
    from big_data_training_spark.streaming.replay import materialize

    base = tempfile.mkdtemp(prefix="bdts_j3_wh_")
    lt, ot = _table_names(base)
    try:
        return materialize(
            _coloc_join(_write_bucketed(spark, sf_dir, base), lt, ot)
        )
    finally:
        _drop_bucketed(spark, lt, ot)
        shutil.rmtree(base, ignore_errors=True)


def _table_names(base: str) -> tuple[str, str]:
    """Per-run catalog table names: a uuid4 suffix (not the mkdtemp token,
    which is unique only per local filesystem and loses entropy when
    non-alnum chars are stripped) so two hosts sharing one metastore
    cannot collide (advisory r13). The uuid is cached per tempdir so the
    create/join/drop trio in one run agrees on the names."""
    token = _RUN_TOKENS.setdefault(base, uuid.uuid4().hex[:12])
    return f"bdts_j3_lineitem_{token}", f"bdts_j3_orders_{token}"


_RUN_TOKENS: dict[str, str] = {}


def _write_bucketed(spark: SparkSession, sf_dir: str, base: str) -> SparkSession:
    lt, ot = _table_names(base)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    for name, df, key in ((lt, li, "l_orderkey"), (ot, orders, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", os.path.join(base, name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    return spark


def _coloc_join(spark: SparkSession, lt: str, ot: str) -> DataFrame:
    return (
        spark.table(lt)
        .join(
            spark.table(ot),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_items"),
            # quantities are integral doubles: cast BEFORE summing so
            # the sum is exact integer arithmetic in both engines
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("sum_qty"),
        )
    )


def _drop_bucketed(spark: SparkSession, lt: str, ot: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {ot}")
