"""Temporal-holdout model evaluation inside the engine: train on the
past, score on the future, never let the split leak.

The corpus pipeline's models (the Markov transition matrix of
ev_markov_transitions, the trend lines, the LM statistics) are only
trustworthy if evaluated out-of-time — fitting and scoring on the
same window is the tabular version of test-set contamination
(dd_decontaminate_* guards the text version). This module makes the
temporal-split evaluation a first-class, integer-exact query: the
transition model is FIT on events before the cutover and SCORED on
events after it, entirely in one plan, with the split enforced by
predicates on the same column both halves read.

Scale: fit = one (prev,next) count aggregate over the train window;
the argmax model is |states|² rows broadcast; scoring = one window
pass over the test half. Nothing is quadratic, nothing re-reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

EVAL_CUTOVER = "2024-01-20"  # fit before, score on-and-after


@register(
    "ev_markov_holdout_accuracy",
    f"""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_ts
        FROM events
    ), train AS (
        SELECT event_type AS prev, next_type AS nxt, count(*) AS n
        FROM seq
        WHERE next_type IS NOT NULL
          AND next_ts < TIMESTAMP '{EVAL_CUTOVER}'
        GROUP BY 1, 2
    ), model AS (
        SELECT prev, nxt AS predicted
        FROM (
            SELECT prev, nxt,
                   row_number() OVER (PARTITION BY prev
                                      ORDER BY n DESC, nxt) AS rk
            FROM train
        ) WHERE rk = 1
    ), test AS (
        SELECT event_type AS prev, next_type AS actual
        FROM seq
        WHERE next_type IS NOT NULL
          AND ts >= TIMESTAMP '{EVAL_CUTOVER}'
    )
    SELECT t.prev,
           m.predicted,
           count(*) AS n_test_transitions,
           CAST(sum(CASE WHEN t.actual = m.predicted
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(sum(CASE WHEN t.actual = m.predicted THEN 1 ELSE 0 END)
                * 1000 // count(*) AS BIGINT) AS hit_permille
    FROM test t JOIN model m ON m.prev = t.prev
    GROUP BY 1, 2
    ORDER BY 1
    """,
    doc="temporal-holdout eval: argmax Markov next-event model fit"
    f" before {EVAL_CUTOVER}, scored on transitions after it —"
    " hit-rate@1 per source state, leak-free by construction",
)
def ev_markov_holdout_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does yesterday's transition matrix predict tomorrow? Fit the
    argmax next-event model on transitions that COMPLETE before the
    cutover (the leak-free criterion is on next_ts — a transition
    straddling the boundary belongs to the future), broadcast the
    |states|-row model, score every post-cutover transition, report
    hit-rate@1 per source state in exact permille. The train/test
    predicate pair shares one window pass; nothing about the fit sees
    test rows, which is the discipline dd_split_leakage_audit checks
    for corpora and this query hard-codes for models. Ties in the
    argmax break lexicographically so the fitted model is
    engine-deterministic."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    train = (
        seq.filter(
            F.col("next_type").isNotNull()
            & (F.col("next_ts") < EVAL_CUTOVER)
        )
        .groupBy(
            F.col("event_type").alias("prev"),
            F.col("next_type").alias("nxt"),
        )
        .agg(F.count("*").alias("n"))
    )
    model = (
        train.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("prev").orderBy(
                    F.desc("n"), F.asc("nxt")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("prev", F.col("nxt").alias("predicted"))
    )
    test = seq.filter(
        F.col("next_type").isNotNull() & (F.col("ts") >= EVAL_CUTOVER)
    ).select(
        F.col("event_type").alias("prev"),
        F.col("next_type").alias("actual"),
    )
    return (
        test.join(F.broadcast(model), "prev")
        .groupBy("prev", "predicted")
        .agg(
            F.count("*").alias("n_test_transitions"),
            F.sum(
                (F.col("actual") == F.col("predicted")).cast("bigint")
            ).alias("n_hits"),
        )
        .selectExpr(
            "prev",
            "predicted",
            "n_test_transitions",
            "n_hits",
            "n_hits * 1000 div n_test_transitions AS hit_permille",
        )
        .orderBy("prev")
    )


BAL_BUCKET = 1000  # acctbal generalization width, in whole currency units


@register(
    "dq_generalization_mask",
    f"""
    SELECT CAST(('0x' || substr(md5('cust:' || CAST(c_custkey AS VARCHAR)),
                1, 15)) AS BIGINT) AS cust_token,
           c_mktsegment,
           c_nationkey,
           CAST(floor(c_acctbal / {BAL_BUCKET}) AS BIGINT)
               * {BAL_BUCKET} AS acctbal_bucket,
           CAST(length(c_name) AS BIGINT) AS name_len
    FROM customer
    ORDER BY cust_token
    """,
    doc="privacy-preserving serving view: stable pseudonymous token"
    " (salted md5), generalized balance bucket, direct identifiers"
    " dropped — the masked twin of the customer table",
)
def dq_generalization_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The view an analyst gets when the raw customer table is
    restricted: the key is replaced by a salted-hash pseudonym (stable
    across tables and runs, so joins still work — the property that
    makes tokenization usable), the name is reduced to its length,
    the balance is generalized to a {bucket}-unit bucket, and the
    quasi-identifiers that k-anonymity/l-diversity audit (segment,
    nation) pass through for aggregate analytics. Pure projection —
    zero shuffles, applies at any scale as a reader-side view, and
    composes with the audits: dq_k_anonymity tells you whether THIS
    view's quasi-identifier classes are large enough to publish."""
    cust = load_table(spark, sf_dir, "customer")
    token = F.expr(
        "CAST(conv(substr(md5(concat('cust:', CAST(c_custkey AS STRING))),"
        " 1, 15), 16, 10) AS BIGINT)"
    )
    return cust.select(
        token.alias("cust_token"),
        "c_mktsegment",
        "c_nationkey",
        (
            F.floor(F.col("c_acctbal") / BAL_BUCKET).cast("bigint")
            * BAL_BUCKET
        ).alias("acctbal_bucket"),
        F.length("c_name").cast("bigint").alias("name_len"),
    ).orderBy("cust_token")
