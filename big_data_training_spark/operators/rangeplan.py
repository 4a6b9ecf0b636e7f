"""Range-partition planning (P8's missing half): derive equi-depth
range boundaries from a bounded histogram synopsis and audit how
balanced the resulting partitions would be.

Spark's own RangePartitioner reservoir-samples keys to pick boundaries;
engines' equi-depth histograms do the same from a synopsis. The
deterministic, engine-portable form here: quantize the key space into
1000 equal-width micro-bins (one aggregation — the synopsis), take the
cumulative bin counts (a window over <= 1000 rows, bounded at any data
size), and cut where the cumulative count crosses each k/N_PARTS
target. Everything is integer arithmetic (bin ids, counts,
cross-multiplied threshold compares), so the DuckDB oracle matches
hash-exact.

Reference anchor: kafka/README.md partitioning story (P1/P8) — hash
partitioning balances but destroys order; range partitioning preserves
order but needs boundary planning. This query IS that planning step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

N_BINS = 1000
N_PARTS = 8


@register(
    "p9_equidepth_range_plan",
    f"""
    WITH keyed AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS key FROM orders
    ),
    ext AS (SELECT min(key) AS mn, max(key) AS mx, count(*) AS n FROM keyed),
    binned AS (
        SELECT (key - mn) * {N_BINS} // (mx - mn + 1) AS bin
        FROM keyed, ext
    ),
    hist AS (SELECT bin, count(*) AS cnt FROM binned GROUP BY 1),
    cum AS (
        SELECT bin, cnt,
               sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS c
        FROM hist
    ),
    parts AS (SELECT unnest(generate_series(1, {N_PARTS})) AS part),
    cuts AS (
        SELECT p.part,
               min(cum.bin) AS boundary_bin,
               min(cum.c) AS cum_rows
        FROM parts p, ext, cum
        WHERE cum.c * {N_PARTS} >= p.part * ext.n
        GROUP BY 1
    )
    SELECT CAST(part AS BIGINT) AS part,
           CAST(boundary_bin AS BIGINT) AS boundary_bin,
           CAST(cum_rows AS BIGINT) AS cum_rows,
           CAST(cum_rows * 1000 // ext.n AS BIGINT) AS cum_permille
    FROM cuts, ext
    """,
    doc="equi-depth range-partition boundaries from a 1000-bin histogram"
    " synopsis, with achieved cumulative balance per cut",
)
def p9_equidepth_range_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan N_PARTS range partitions over the order-price key: one
    corpus aggregation builds the 1000-bin synopsis, the cumulative
    window runs over <= 1000 rows (driver-scale regardless of input),
    and each cut is the first bin whose cumulative count reaches
    k/N_PARTS of the rows. cum_permille vs k*125 exposes how much
    equal-depth balance the synopsis resolution gives up — the exact
    trade Spark's RangePartitioner makes with samples. Min/max/count
    ride one broadcast row; compares are cross-multiplied integers
    (c * N >= k * n), never divisions."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("key")
    )
    ext = keyed.agg(
        F.min("key").alias("mn"), F.max("key").alias("mx"), F.count("*").alias("n")
    )
    binned = keyed.crossJoin(F.broadcast(ext)).select(
        F.expr(f"(key - mn) * {N_BINS} div (mx - mn + 1)").alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("cnt"))
    cum = hist.withColumn(
        "c",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    parts = spark.range(1, N_PARTS + 1).select(F.col("id").alias("part"))
    joined = (
        cum.crossJoin(F.broadcast(ext))
        .join(
            F.broadcast(parts),
            F.col("c") * N_PARTS >= F.col("part") * F.col("n"),
        )
        .groupBy("part")
        .agg(
            F.min("bin").alias("boundary_bin"),
            F.min("c").alias("cum_rows"),
            F.first("n").alias("n"),
        )
    )
    return joined.select(
        F.col("part").cast("bigint").alias("part"),
        F.col("boundary_bin").cast("bigint").alias("boundary_bin"),
        F.col("cum_rows").cast("bigint").alias("cum_rows"),
        F.expr("cum_rows * 1000 div n").cast("bigint").alias("cum_permille"),
    )
