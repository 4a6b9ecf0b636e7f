"""User-function surface (SURVEY.md §2.12): vectorized scoring and
grouped-map UDAFs — the slow path, Arrow-batched, never row-at-a-time.

T5 ML-scoring map (flink/README.md:36-59): the reference's
ProcessFunction calls a model per element; here a pandas UDF scores an
Arrow batch per call (~10-100× the row-at-a-time throughput).
U1 AggregateFunction analog: ``applyInPandas`` grouped map.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register


@F.pandas_udf(DoubleType())
def score_udf(value: pd.Series) -> pd.Series:
    """T5 stub model: logistic score over the event measure. Stands in
    for any per-batch model.predict; deterministic so the oracle can
    replicate it arithmetically."""
    import numpy as np

    return np.round(1.0 / (1.0 + np.exp(-(value / 100.0 - 0.5))), 6)


@register(
    "t5_model_scoring",
    """
    SELECT event_id,
           round(1.0 / (1.0 + exp(-(value / 100.0 - 0.5))), 6) AS score
    FROM events WHERE event_id < 3000
    """,
    doc="T5: per-element model scoring via vectorized pandas UDF",
)
def t5_model_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scoring map — one Python roundtrip per batch."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    return events.select("event_id", score_udf("value").alias("score"))


_W3_SCHEMA = "user_id bigint, day timestamp, n bigint, median_value double, value_range double"


def _window_apply(pdf: pd.DataFrame) -> pd.DataFrame:
    """W3 WindowFunction: one call per KEY, windows handled with a
    vectorized inner groupby. Grouping the Python boundary by the
    coarser key matters: per-(key, window) calls would mean one Arrow
    round trip per tiny group (40k at sf0.1 — observed 100× slower when
    AQE packs them into few tasks); per-key calls amortize it."""
    g = pdf.groupby("day")["value"]
    out = g.agg(n="size", median_value="median", mn="min", mx="max").reset_index()
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"].iloc[0],
            "day": out["day"],
            "n": out["n"],
            "median_value": out["median_value"].round(4),
            "value_range": (out["mx"] - out["mn"]).round(4),
        }
    )


@register(
    "w3_window_apply",
    """
    SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n,
           round(quantile_cont(value, 0.5), 4) AS median_value,
           round(max(value) - min(value), 4) AS value_range
    FROM events GROUP BY user_id, date_trunc('day', ts)
    """,
    doc="W3: full-window apply (arbitrary per-window logic) via applyInPandas",
    bench=True,
)
def w3_window_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WindowFunction (flink/README.md:27): aggregate all elements of a
    (key, window) group with arbitrary Python — grouped-map pandas UDF
    keyed on the user, tumbling 1-day windows resolved vectorized
    inside the group."""
    events = load_table(spark, sf_dir, "events")
    # Explicit keyed repartition: AQE coalesces the grouped-map's own
    # ENSURE_REQUIREMENTS exchange to ~1 partition at small SF (the
    # shuffle is tiny in bytes), serializing every per-group Python call
    # onto one worker (measured 10.6s → 0.6s at sf0.1). A user-specified
    # REPARTITION_BY_NUM exchange is exempt from coalescing, already
    # satisfies the grouping distribution, and is what you'd want at
    # 100 TB anyway: Python fan-out sized to the cluster, not to the
    # shuffle's byte count.
    target = spark.sparkContext.defaultParallelism
    return (
        events.select(
            "user_id", F.date_trunc("day", "ts").alias("day"), "value"
        )
        .repartition(target, "user_id")
        .groupBy("user_id")
        .applyInPandas(_window_apply, schema=_W3_SCHEMA)
    )


_Z_SCHEMA = "event_id bigint, event_type string, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """U1/A3 grouped aggregate-then-transform: standardize within key.

    Degenerate groups (single row → std is NaN; zero variance → std 0)
    emit NaN, matching the oracle's stddev_samp semantics (NULL for
    n=1, 0/0 for constant groups) instead of a fake 0.0 — and avoiding
    the scalar-0.0 `.round` crash on valid inputs.
    """
    std = pdf["value"].std()
    if pd.notna(std) and std > 0:
        z = ((pdf["value"] - pdf["value"].mean()) / std).round(4)
    else:
        z = pd.Series([float("nan")] * len(pdf), index=pdf.index)
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "zscore": z,
        }
    )


@register(
    "u1_grouped_zscore",
    """
    SELECT event_id, event_type,
           round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4)
               AS zscore
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
    doc="U1: custom grouped aggregate via applyInPandas (z-score per key)",
)
def u1_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregateFunction analog: the whole key group arrives as one
    pandas frame (flink/README.md:26's accumulator generalized). Note
    the scale bound: a group must fit an executor's memory — for
    unbounded keys use the two-pass join formulation instead."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_zscore_group, schema=_Z_SCHEMA)
    )
