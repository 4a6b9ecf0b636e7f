"""Registered streaming queries (driver-verifiable via stream-batch
equivalence where the sink is complete-mode).

S1 stream scan, A1 streaming word count, A11/W1 windowed counts, ST1/ST4
keyed state via applyInPandasWithState, ST5 reprocessing diff.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.numeric import dsum, sql_dsum
from big_data_training_spark.registry import register
from big_data_training_spark.streaming.replay import read_stream_table, run_to_completion
from big_data_training_spark.functions.text import SQL_TOKENS, STOPWORD, tokens


@register(
    "st_stream_wordcount",
    f"""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest({SQL_TOKENS.format(col='text')}) AS w FROM documents)
    WHERE w <> '{STOPWORD}'
    GROUP BY w
    """,
    doc="A1 streaming form: word-count topology over the replayed corpus",
)
def st_stream_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream → flatMap → filter → keyed stateful count → complete
    sink; equals the batch word count (stream-batch equivalence)."""
    lines = read_stream_table(spark, sf_dir, "documents")
    counts = (
        lines.select(F.explode(tokens("text")).alias("word"))
        .filter(F.col("word") != STOPWORD)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    return run_to_completion(counts, "complete")


@register(
    "st_stream_hourly_counts",
    f"""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour_start, event_type,
           count(*) AS n, {sql_dsum('value', 'total_value')}
    FROM events GROUP BY 1, 2
    """,
    doc="A11/W1 streaming form: tumbling 1-hour windowed counts",
)
def st_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation, complete mode — the
    windowed keyed count of the Flink word-count example at event-time."""
    events = read_stream_table(spark, sf_dir, "events")
    agg = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("hour_start"), "event_type", "n", "total_value"
        )
    )
    return run_to_completion(agg, "complete")


_STATE_SCHEMA = "n BIGINT, total DOUBLE"
_OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"


def _count_sum_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """ST1/ST4: per-key running (count, sum) held in the state store."""
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


@register(
    "st4_stateful_user_counts",
    """
    SELECT user_id, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    doc="ST1/ST4: arbitrary keyed state via applyInPandasWithState",
)
def st4_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ProcessFunction analog (flink/README.md:28): per-key mutable state
    updated per micro-batch via applyInPandasWithState; bounded replay
    arrives as one batch so the emitted running totals equal the batch
    aggregate.

    Note: pandas float sum vs decimal-exact oracle — values are 2-decimal
    fixture doubles summed per small key group, so round(…, 2) agrees."""
    events = read_stream_table(spark, sf_dir, "events")
    result = (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _count_sum_state,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_completion(result, "update")


@register(
    "st5_reprocess_diff",
    """
    WITH v1 AS (
        SELECT event_type, count(*) AS n FROM events GROUP BY 1
    ), v2 AS (
        SELECT event_type, count(*) AS n FROM events
        WHERE try_cast(json_extract_string(props, '$.k') AS INT) < 90
        GROUP BY 1
    )
    SELECT coalesce(v1.event_type, v2.event_type) AS event_type,
           coalesce(v1.n, 0) AS n_v1, coalesce(v2.n, 0) AS n_v2,
           coalesce(v1.n, 0) - coalesce(v2.n, 0) AS diff
    FROM v1 FULL OUTER JOIN v2 ON v1.event_type = v2.event_type
    """,
    doc="ST5: reprocess the replayable log with app v2, diff the results",
)
def st5_reprocess_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's cutover methodology (kafka/README.md:335-337): run
    old and new pipeline versions over the same retained log and compare
    result tables (full-outer diff)."""
    events = load_table(spark, sf_dir, "events")
    v1 = events.groupBy("event_type").agg(F.count("*").alias("n_v1"))
    k = F.from_json("props", "k INT").getField("k")
    v2 = (
        events.withColumn("k", k)
        .filter(F.col("k") < 90)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_v2"))
    )
    j = v1.join(v2, "event_type", "full_outer")
    return j.select(
        "event_type",
        F.coalesce("n_v1", F.lit(0)).alias("n_v1"),
        F.coalesce("n_v2", F.lit(0)).alias("n_v2"),
        (F.coalesce("n_v1", F.lit(0)) - F.coalesce("n_v2", F.lit(0))).alias("diff"),
    )
