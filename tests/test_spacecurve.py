"""Hilbert-curve correctness: properties only the full grid can prove."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.operators.spacecurve import (
    H_BITS,
    H_SIDE,
    s9_hilbert_layout,
)


def _hilbert_df(spark):
    """Index every cell of the 256x256 grid through the production
    expression chain (same codegen path as the registered query)."""
    grid = (
        spark.range(H_SIDE * H_SIDE)
        .select(
            (F.col("id") % H_SIDE).alias("x0"),
            (F.col("id") / H_SIDE).cast("long").alias("y0"),
        )
        .select("x0", "y0", F.col("x0").alias("x"), F.col("y0").alias("y"),
                F.lit(0).cast("bigint").alias("d"))
    )
    n1 = H_SIDE - 1
    for i in range(H_BITS):
        s = 1 << (H_BITS - 1 - i)
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        grid = grid.select(
            "x0",
            "y0",
            F.expr(f"d + {s * s} * ((3 * {rx}) ^ {ry})").alias("d"),
            F.expr(
                f"CASE WHEN {ry} = 0 THEN"
                f" (CASE WHEN {rx} = 1 THEN {n1} - y ELSE y END) ELSE x END"
            ).alias("x"),
            F.expr(
                f"CASE WHEN {ry} = 0 THEN"
                f" (CASE WHEN {rx} = 1 THEN {n1} - x ELSE x END) ELSE y END"
            ).alias("y"),
        )
    return grid.select("x0", "y0", "d")


def test_hilbert_is_a_bijection_on_the_grid(spark):
    """xy2d must be a permutation of [0, side²): any collision or gap
    means the reflect/swap chain is wrong."""
    agg = _hilbert_df(spark).agg(
        F.countDistinct("d").alias("nd"),
        F.min("d").alias("lo"),
        F.max("d").alias("hi"),
    ).collect()[0]
    assert agg.nd == H_SIDE * H_SIDE
    assert agg.lo == 0 and agg.hi == H_SIDE * H_SIDE - 1


def test_hilbert_adjacency(spark):
    """The defining Hilbert property: consecutive indices are grid
    neighbors (|dx| + |dy| == 1) — z-order fails this at every power-of-
    two boundary, which is exactly why Hilbert prunes better."""
    df = _hilbert_df(spark)
    nxt = df.select(
        (F.col("d") + 1).alias("d"),
        F.col("x0").alias("px"),
        F.col("y0").alias("py"),
    )
    bad = (
        df.join(nxt, "d")
        .filter(F.abs(F.col("x0") - F.col("px")) + F.abs(F.col("y0") - F.col("py")) != 1)
        .count()
    )
    assert bad == 0


def test_layout_audit_covers_both_curves(spark, sf_dir):
    rows = s9_hilbert_layout(spark, sf_dir).collect()
    layouts = {r.layout for r in rows}
    assert layouts == {"hilbert", "zorder"}
    for r in rows:
        assert r.n > 0 and 0 <= r.bucket < 32
