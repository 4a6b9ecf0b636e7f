"""Sequential path mining: the event-type trigrams users actually
walk — the next granularity up from the certified Markov bigram
transition matrix (ev_markov_transitions), and the input a funnel
designer reads before hard-coding step orders.

One window pass: per user, events ordered by (ts, event_id) — the
unique event id breaks timestamp ties identically in both engines —
with two leads building (step1, step2, step3); then a global count
over a key space bounded by |event_types|^3 (125 here), so the
aggregate after the per-user window is constant-size at any volume.
The window partitions by user — the same per-key ordering contract as
P7 — so the shuffle is one hash exchange on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register


def finish_trigrams(tri: DataFrame) -> DataFrame:
    """Final share computation over (step1, step2, step3, n_paths)
    partials — shared by the batch query and the streaming twin so
    both finish through the same code path."""
    tot = tri.agg(F.sum("n_paths").alias("tot"))
    return (
        tri.crossJoin(F.broadcast(tot))
        .select(
            "step1",
            "step2",
            "step3",
            F.col("n_paths").cast("bigint").alias("n_paths"),
            F.expr("CAST(n_paths * 1000 div tot AS BIGINT)").alias(
                "share_permille"
            ),
        )
        .orderBy(F.desc("n_paths"), "step1", "step2", "step3")
    )


@register(
    "ev_path_trigrams",
    """
    WITH seq AS (
        SELECT user_id, event_type AS step1,
               lead(event_type, 1) OVER w AS step2,
               lead(event_type, 2) OVER w AS step3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
        SELECT step1, step2, step3, count(*) AS n_paths
        FROM seq WHERE step3 IS NOT NULL
        GROUP BY 1, 2, 3
    )
    SELECT step1, step2, step3,
           CAST(n_paths AS BIGINT) AS n_paths,
           CAST(n_paths * 1000 // (SELECT sum(n_paths) FROM tri)
                AS BIGINT) AS share_permille
    FROM tri
    ORDER BY n_paths DESC, step1, step2, step3
    """,
    doc="path mining: per-user event-type trigrams (two leads over the"
    " (ts, event_id)-ordered stream) with exact global share permille",
)
def ev_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What do users do three steps in a row? Two lead() columns over
    the per-user time-ordered stream turn every event into the head
    of a trigram; counting them yields the behavioral path table the
    funnel queries (ev_funnel_*) pick their step orders from. The
    count key space is |event_types|^3, so the second aggregate is
    constant-size; share is an exact permille against the trigram
    total (scalar broadcast)."""
    seq = load_table(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_type AS step1",
        "lead(event_type, 1) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS step2",
        "lead(event_type, 2) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS step3",
    )
    tri = (
        seq.filter(F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count("*").alias("n_paths"))
    )
    return finish_trigrams(tri)
