"""Streaming model-evaluation twins: live AUC and live conformal
coverage over the event stream.

Production monitoring keeps the classifier-quality dials (AUC,
coverage) current as data arrives; both reduce to streaming-updatable
state plus a tiny finalization:

* AUC: the sufficient statistic is the bounded per-bucket (pos, neg)
  count table — an additive streaming aggregation. The rank algebra
  (a window over the bucket table) is not stream-expressible, so it
  runs in foreachBatch over each micro-batch's complete state — the
  same two-stage split as st_k1_foreachbatch_topk, state store in
  place of the intermediate topic.
* Conformal: the band table (predictor + quantile per type) is
  calibrated OFFLINE on the hash-half of the warehouse copy; the
  stream carries the complement half through a stream-static
  broadcast join and a stateless hit/miss flag, then one streaming
  aggregation counts coverage. Ratios are finalized after the sink
  (a streaming agg can't divide by a not-yet-final count).

Oracles are the batch SQL of the corresponding batch operators —
stream-batch equivalence at value level. Registers last; rotation
untouched.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.functions.hashing import hash60_expr
from big_data_training_spark.operators.conformal import ALPHA_PCT, CAL_MOD
from big_data_training_spark.operators.mleval import _POS, _NEG
from big_data_training_spark.registry import _REGISTRY, register
from big_data_training_spark.streaming.replay import (
    cleanup_scratch,
    materialize,
    read_stream_table,
    run_to_completion,
    scratch_dir,
)


@register(
    "st_auc_stream",
    _REGISTRY["ev_auc_mannwhitney"].oracle,
    doc="streaming AUC: additive per-bucket pos/neg state in the "
    "stream, Mann-Whitney finalization per micro-batch in "
    "foreachBatch — value-identical to the batch AUC oracle",
)
def st_auc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUC's sufficient statistic (bounded score histogram) is an
    additive streaming aggregation — redeliveries and late data fold
    in exactly; the rank finalization reads each epoch's complete
    state. At scale the state is |score domain| rows per store,
    independent of stream volume."""
    from pyspark.sql.window import Window

    ev = read_stream_table(spark, sf_dir, "events")
    b = (
        ev.filter(F.col("event_type").isin(_POS, _NEG))
        .selectExpr(
            "CAST(floor(value * 100) AS BIGINT) AS s",
            f"CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END AS pos",
        )
        .groupBy("s")
        .agg(
            F.expr("CAST(sum(pos) AS BIGINT)").alias("p"),
            F.expr("CAST(count(*) - sum(pos) AS BIGINT)").alias("g"),
        )
    )
    out_dir = scratch_dir("bdts_aucstream_") + "/out"

    def finalize(batch_df: DataFrame, epoch_id: int) -> None:
        w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
        c = batch_df.withColumn(
            "gb", F.coalesce(F.sum("g").over(w), F.lit(0))
        )
        (
            c.agg(
                F.expr("CAST(sum(p) AS BIGINT)").alias("np"),
                F.expr("CAST(sum(g) AS BIGINT)").alias("ng"),
                F.expr("CAST(sum(p * (2 * gb + g)) AS BIGINT)").alias(
                    "u2"
                ),
            )
            .selectExpr(
                "np AS n_pos",
                "ng AS n_neg",
                "u2 AS u_times2",
                "CAST(u2 * 1000000 div (2 * np * ng) AS BIGINT)"
                " AS auc_ppm",
            )
            .write.mode("overwrite")
            .parquet(out_dir)
        )

    q = (
        b.writeStream.outputMode("complete")
        .foreachBatch(finalize)
        .queryName(f"aucstream_{uuid.uuid4().hex[:8]}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = materialize(spark.read.parquet(out_dir))
    cleanup_scratch()
    return out


@register(
    "st_conformal_stream",
    _REGISTRY["ml_conformal_coverage"].oracle,
    doc="streaming conformal coverage: bands calibrated offline on the "
    "hash-half, test half streamed through a stream-static broadcast "
    "join + stateless hit flag + one streaming aggregation",
    bench=True,
)
def st_conformal_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The monitoring half of split conformal: the |types|-row band
    table is static (calibrated on the warehouse copy); the stream
    keeps only the complement hash-half, flags each event in/out of
    band statelessly, and counts per type. Ratio columns are
    finalized post-sink. State: |types| aggregation rows."""
    from big_data_training_spark.data import load_table
    from big_data_training_spark.operators.conformal import (
        ml_conformal_coverage,
    )

    # reuse the batch operator's calibration by rebuilding its pred/q
    # tables: run the batch pipeline on the calibration half only.
    half_hash = hash60_expr("event_id || '#conf'")
    static = load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS cents",
        f"{half_hash} % {CAL_MOD} AS half",
    )
    from pyspark.sql.window import Window

    pred = (
        static.filter("half = 0")
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST(floor(percentile_disc(0.5)"
                " WITHIN GROUP (ORDER BY cents)) AS BIGINT)"
            ).alias("pred_cents")
        )
    )
    cal = (
        static.filter("half = 0")
        .join(F.broadcast(pred), "event_type")
        .selectExpr("event_type", "abs(cents - pred_cents) AS score")
    )
    wr = Window.partitionBy("event_type").orderBy("score")
    wn = Window.partitionBy("event_type")
    target = f"CAST(ceil((n + 1) * (100 - {ALPHA_PCT}) / 100.0) AS BIGINT)"
    q = (
        cal.withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.count("*").over(wn))
        .filter(F.expr(f"rn = {target} OR (rn = n AND n < {target})"))
        .selectExpr("event_type", "CAST(score AS BIGINT) AS q_cents")
    )
    bands = materialize(pred.join(q, "event_type"))

    stream = read_stream_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS cents",
        f"{half_hash} % {CAL_MOD} AS half",
    )
    counted = (
        stream.filter("half = 1")
        .join(F.broadcast(bands), "event_type")
        .selectExpr(
            "event_type",
            "pred_cents",
            "q_cents",
            "CASE WHEN abs(cents - pred_cents) <= q_cents"
            " THEN 1 ELSE 0 END AS hit",
        )
        .groupBy("event_type", "pred_cents", "q_cents")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_test"),
            F.expr("CAST(sum(hit) AS BIGINT)").alias("n_covered"),
        )
    )
    sunk = run_to_completion(counted, "complete")
    return materialize(
        sunk.selectExpr(
            "event_type",
            "pred_cents",
            "q_cents",
            "n_test",
            "n_covered",
            "CAST(n_covered * 1000000 div n_test AS BIGINT)"
            " AS coverage_ppm",
        ).orderBy("event_type")
    )
