"""Exact quantiles WITHOUT a global sort: the two-phase
histogram-then-drill plan — how you take an exact p50/p95 over 100 TB.

percentile_disc is exact but plans as a single-node sort-based
aggregate over all values; at cluster scale the standard trick is:
(1) one scan builds a BOUNDED coarse histogram (value-domain buckets),
(2) a cumulative pass over the bucket table (bounded, single task)
locates the bucket containing the target rank k = ceil(p*n) and the
rank mass before it, (3) a second scan touches ONLY that bucket's rows
(a scan-stage range predicate) and picks element k - cum_before
within it. No step sorts more than one bucket's residents; recursing
on the bucket would bound phase 3 too. The oracle is plain
percentile_disc — same value, radically different plan, which is the
point.

Determinism: ranks are over (value) only, and the k-th VALUE is
well-defined under ties regardless of row permutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

PCTS = (50, 95)
BUCKET_SHIFT = 12  # cents div 4096 -> ~2.5k buckets over the domain


@register(
    "agg_exact_quantile_twophase",
    f"""
    WITH c AS (
        SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    )
    {' UNION ALL '.join(
        f'''SELECT CAST({p} AS BIGINT) AS pct,
            CAST(floor(percentile_disc({p / 100.0})
                 WITHIN GROUP (ORDER BY cents)) AS BIGINT) AS value_cents
            FROM c'''
        for p in PCTS
    )}
    ORDER BY pct
    """,
    doc="exact p50/p95 of line-item price via the scalable two-phase "
    "plan (bounded histogram + single-bucket drill) — value-equal to "
    "percentile_disc, no global sort anywhere",
)
def agg_exact_quantile_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 1: histogram on cents div 4096 (bounded by the value
    domain, map-side combinable). Phase 2: cumulative counts over the
    bucket table locate bucket b with cum >= k and its preceding mass.
    Phase 3: only bucket b's rows are ranked (per-pct partitioned
    window over one bucket's residents) and the (k - cum_before)-th
    value is the answer. The second scan's bucket predicate is a
    scan-stage filter (computed column, so evaluated in codegen right
    after the reader rather than as a parquet PushedFilter)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.selectExpr(
        "CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents"
    ).localCheckpoint(eager=True)
    nrow = cents.agg(F.count("*").alias("n"))
    ps = (
        spark.createDataFrame([(p,) for p in PCTS], "pct long")
        .crossJoin(F.broadcast(nrow))
        .selectExpr("pct", "(n * pct + 99) div 100 AS k")
    )
    h = cents.groupBy(
        F.expr(f"cents div {1 << BUCKET_SHIFT}").alias("b")
    ).agg(F.count("*").alias("cnt"))
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    hc = h.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "cum_before", F.col("cum") - F.col("cnt")
    )
    # the FIRST bucket whose cumulative count reaches k, per pct
    sel = (
        ps.crossJoin(hc)
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("pct", "k")
        .agg(F.min(F.struct("b", "cum_before")).alias("m"))
        .selectExpr("pct", "k", "m.b AS b", "m.cum_before AS cum_before")
    )
    wrank = Window.partitionBy("pct").orderBy("cents")
    return (
        cents.join(
            F.broadcast(sel),
            F.expr(f"cents div {1 << BUCKET_SHIFT}") == F.col("b"),
        )
        .withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") == F.col("k") - F.col("cum_before"))
        .selectExpr("CAST(pct AS BIGINT) AS pct",
                    "cents AS value_cents")
        .orderBy("pct")
    )
