"""Independent-truth checks for the round-13 additions — invariants
the DuckDB oracle cannot establish because both engines share the SQL
formulation (the oracle proves ENGINE parity; these prove the
FORMULATION, the mergeability claim, or the operational contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table


def test_cms_stream_equals_batch(spark, sf_dir):
    """The streaming counter grid must finish to the exact batch CMS
    estimates — the cell-wise-additive mergeability claim itself."""
    from big_data_training_spark.extensions.sketches import (
        sk_cms_heavy_hitters,
    )
    from big_data_training_spark.streaming.sketch_stream import st_cms_stream

    batch = {tuple(r) for r in sk_cms_heavy_hitters(spark, sf_dir).collect()}
    stream = {tuple(r) for r in st_cms_stream(spark, sf_dir).collect()}
    assert stream == batch
    assert batch  # vacuous equality would certify nothing


def test_p95_stream_equals_percentile_disc(spark, sf_dir):
    """The rank-select finish over streamed histogram state must equal
    Spark's own percentile_disc on the raw rows — an INDEPENDENT
    formulation (sort-based, not histogram-based), so agreement proves
    the k = ceil(0.95·n) arithmetic and the cumulative walk, not just
    engine parity on a shared string."""
    from big_data_training_spark.streaming.sketch_stream import (
        st_p95_value_stream,
    )

    got = {
        (r["event_type"], r["n"], r["k"], r["p95_cents"])
        for r in st_p95_value_stream(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .selectExpr(
            "event_type", "CAST(floor(value * 100) AS BIGINT) AS cents"
        )
    )
    truth = {
        (r["event_type"], r["n"], (r["n"] * 95 + 99) // 100, r["p95"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)")
            .cast("bigint")
            .alias("p95"),
        )
        .collect()
    }
    assert got == truth
    assert truth


def test_p95_finish_is_batch_boundary_independent(spark, sf_dir):
    """Mergeability, tested directly: slice the events into 3 arbitrary
    'micro-batches', build per-slice partial histograms, merge by
    addition, finish — must equal the finish over the one-shot
    histogram. This is the property that makes the streaming state
    correct under ANY trigger boundary, proved without the stream."""
    from big_data_training_spark.streaming.sketch_stream import _p95_finish

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .selectExpr(
            "event_type",
            "CAST(floor(value * 100) AS BIGINT) AS cents",
            "event_id",
        )
    )
    one_shot = _p95_finish(
        ev.groupBy("event_type", "cents").agg(F.count("*").alias("cnt"))
    )
    partials = [
        ev.filter(F.col("event_id") % 3 == i)
        .groupBy("event_type", "cents")
        .agg(F.count("*").alias("cnt"))
        for i in range(3)
    ]
    merged = (
        partials[0]
        .unionByName(partials[1])
        .unionByName(partials[2])
        .groupBy("event_type", "cents")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert {tuple(r) for r in _p95_finish(merged).collect()} == {
        tuple(r) for r in one_shot.collect()
    }
