"""Independent-truth checks for the round-14 additions — invariants
the DuckDB oracle cannot establish because both engines share the SQL
formulation (the oracle proves ENGINE parity; these prove the
FORMULATION, the two-phase exactness claim, or the operational
contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table


def test_p95_coarse_stream_equals_fine_stream(spark, sf_dir):
    """The unbounded-domain regime (coarse histogram + hot-bucket drill)
    must return the exact same p95 as the fine-domain twin — the
    two-phase-never-approximates claim itself, independent of any SQL
    oracle."""
    from big_data_training_spark.streaming.sketch_stream import (
        st_p95_coarse_stream,
        st_p95_value_stream,
    )

    fine = {tuple(r) for r in st_p95_value_stream(spark, sf_dir).collect()}
    coarse = {tuple(r) for r in st_p95_coarse_stream(spark, sf_dir).collect()}
    assert coarse == fine
    assert fine  # vacuous equality would certify nothing


def test_p95_coarse_stream_equals_percentile_disc(spark, sf_dir):
    """Coarse-state finish + drill must equal Spark's own
    percentile_disc on the raw rows — an independent engine-side truth
    (the oracle only proves DuckDB agrees with the same rank walk)."""
    from big_data_training_spark.streaming.sketch_stream import (
        st_p95_coarse_stream,
    )

    got = {
        (r["event_type"], r["p95_cents"])
        for r in st_p95_coarse_stream(spark, sf_dir).collect()
    }
    want = {
        (r["event_type"], r["p95"])
        for r in (
            load_table(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .selectExpr(
                "event_type",
                "CAST(floor(value * 100) AS BIGINT) AS cents",
            )
            .groupBy("event_type")
            .agg(
                F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)")
                .cast("bigint")
                .alias("p95")
            )
            .collect()
        )
    }
    assert got == want


def test_p95_coarse_state_is_bucket_bounded(spark, sf_dir):
    """The boundedness claim that motivates the coarse regime: online
    state (distinct (type, bucket) rows) must be a small fraction of the
    fine twin's (distinct (type, cents) rows) on the same fixture, and
    bounded by |types| x |buckets|."""
    from big_data_training_spark.streaming.sketch_stream import COARSE_SHIFT

    # Dense deterministic fixture (the sparse sf0.001 sample under-fills
    # both histograms and hides the ratio): 60k values covering a 20k-cent
    # domain across 3 types. Fine state saturates to |types|x|domain|;
    # coarse must saturate to |types|x|domain/2^shift| — a 2^shift = 128x
    # reduction, and the reduction holds at ANY domain width, which is the
    # unbounded-domain regime's whole point.
    cents = spark.range(60_000).selectExpr(
        "CONCAT('t', id % 3) AS event_type",
        "(id * 2654435761) % 20000 AS cents",
    )
    fine_state = cents.distinct().count()
    coarse_state = (
        cents.selectExpr("event_type", f"cents div {1 << COARSE_SHIFT} AS b")
        .distinct()
        .count()
    )
    n_types = 3
    max_bucket = (20_000 - 1) >> COARSE_SHIFT
    assert coarse_state <= n_types * (max_bucket + 1)
    assert coarse_state * 16 <= fine_state, (
        f"coarse state {coarse_state} not meaningfully below fine "
        f"{fine_state} — bucket shift too small"
    )


def test_stream_stream_joins_plan_on_light_pin(spark):
    """The r14 light-pin wins (st_j2 ~1.6x, st_pyds ~1.3x — measured
    tables in docs/SCALING.md) are conf-wiring, invisible to every
    oracle: assert the reroot targets a session whose shuffle pin is
    the light value, so a silent rewiring back to the default pin is a
    red test, not a quiet bench regression."""
    from big_data_training_spark.streaming.queries import _j2_light
    from big_data_training_spark.streaming.replay import (
        _LIGHT_STREAM_PIN_FLOOR,
        light_stream_session,
    )

    light_pin = str(_LIGHT_STREAM_PIN_FLOOR)
    df = spark.range(10).selectExpr("id", "id % 3 AS k")
    rerooted = _j2_light(df)
    assert (
        rerooted.sparkSession.conf.get("spark.sql.shuffle.partitions")
        == light_pin
    )
    # and the light clone itself carries the pin (covers st_pyds too)
    assert (
        light_stream_session(spark).conf.get("spark.sql.shuffle.partitions")
        == light_pin
    )
    # the parent session's conf must be untouched by the clone
    assert (
        spark.conf.get("spark.sql.shuffle.partitions") != light_pin
    )
