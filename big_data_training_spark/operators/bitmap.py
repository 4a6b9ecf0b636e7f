"""Bitmap-index operators: audience membership as packed bit words.

A bitmap (Roaring-style) index is how warehouses answer "how many
users did X AND Y" without a distinct-count shuffle per question: each
audience's membership is packed into ``ceil(U/32)`` words (word
``user_id div 32``, bit ``user_id % 32``), set ops become bitwise
AND/OR on co-indexed words, and cardinality is ``sum(bit_count(w))``.
The reference frames events as replayable per-user logs
(kafka/README.md:9-10 topics-as-tables, kafka/README.md:305-311) whose
downstream analytics are exactly these audience set operations.

Scale: the bitmap build is one groupBy((audience, word_idx)) with a
map-side-combinable bit_or — partials OR together, so the shuffle
carries at most one word per (audience, word_idx) per map task. The
set op joins word tables on (audience, word_idx): for U users the word
table is U/32 rows per audience regardless of event volume, so the
intersect of two 10^9-event audiences joins two ~10^7-row tables. No
COUNT(DISTINCT) re-scan per question — the index answers any boolean
combination of indexed audiences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register


@register(
    "ev_bitmap_retention",
    """
    WITH words AS (
        SELECT event_type,
               date_trunc('day', ts) AS day,
               user_id // 32 AS word_idx,
               bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER))
                   AS w
        FROM events
        GROUP BY 1, 2, 3
    ), daily AS (
        SELECT event_type, day,
               CAST(sum(bit_count(w)) AS BIGINT) AS n_users
        FROM words GROUP BY 1, 2
    ), overlap AS (
        SELECT a.event_type, a.day,
               CAST(sum(bit_count(a.w & b.w)) AS BIGINT) AS n_retained
        FROM words a
        JOIN words b
          ON b.event_type = a.event_type
         AND b.word_idx = a.word_idx
         AND b.day = a.day + INTERVAL 1 DAY
        GROUP BY 1, 2
    )
    SELECT d.event_type, d.day, d.n_users,
           n.n_users AS n_users_next,
           coalesce(o.n_retained, 0) AS n_retained,
           coalesce(o.n_retained, 0) * 1000 // d.n_users
               AS retained_permille
    FROM daily d
    JOIN daily n
      ON n.event_type = d.event_type AND n.day = d.day + INTERVAL 1 DAY
    LEFT JOIN overlap o
      ON o.event_type = d.event_type AND o.day = d.day
    """,
    doc="bitmap-index day-over-day retention: per-(event_type, day)"
    " audiences packed into bit words, overlap = popcount of ANDed"
    " words — no COUNT(DISTINCT) per question",
    bench=True,
)
def ev_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention per event type answered from a bitmap
    index instead of repeated distinct-count scans. Build once: pack
    each (event_type, day) audience into words keyed by
    ``user_id div 32`` with an OR-aggregate (map-side combinable —
    partial words OR into final words, so the build shuffles at most
    one word per key per map task). Query: join the word table to
    itself shifted by one day on (event_type, word_idx) and popcount
    the ANDed words. The word table has |audiences| * U/32 rows —
    independent of event volume — so at 100 TB the retention matrix is
    a join of two small int tables, and ANY boolean audience question
    (AND/OR/NOT) is answerable from the same index without touching
    the event log again. Exactness proven against COUNT(DISTINCT)
    overlap in tests/test_bitmap.py."""
    events = load_table(spark, sf_dir, "events")
    words = events.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.expr("user_id div 32").alias("word_idx"),
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT),"
            " CAST(user_id % 32 AS INT)))"
        ).alias("w")
    )
    return finish_retention(words)


def finish_retention(words: DataFrame) -> DataFrame:
    """Retention report over a (event_type, day, word_idx, w) word
    table — shared by the batch build and the streaming leg
    (st_bitmap_stream), whose OR-merged word state must finish
    identically."""
    daily = words.groupBy("event_type", "day").agg(
        F.expr("CAST(sum(bit_count(w)) AS BIGINT)").alias("n_users")
    )
    b = words.select(
        "event_type",
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        "word_idx",
        F.col("w").alias("wb"),
    )
    overlap = (
        words.join(b, ["event_type", "day", "word_idx"])
        .groupBy("event_type", "day")
        .agg(
            F.expr("CAST(sum(bit_count(w & wb)) AS BIGINT)").alias(
                "n_retained"
            )
        )
    )
    nxt = daily.select(
        "event_type",
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("n_users").alias("n_users_next"),
    )
    return (
        daily.join(nxt, ["event_type", "day"])
        .join(overlap, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            "n_users",
            "n_users_next",
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.expr(
                "coalesce(n_retained, 0) * 1000 div n_users"
            ).alias("retained_permille"),
        )
    )


@register(
    "ev_bitmap_audience_algebra",
    """
    WITH words AS (
        SELECT event_type,
               user_id // 32 AS word_idx,
               bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER))
                   AS w
        FROM events
        WHERE ts < TIMESTAMP '2024-01-04'
        GROUP BY 1, 2
    ), p AS (SELECT word_idx, w FROM words WHERE event_type = 'purchase'),
       c AS (SELECT word_idx, w FROM words WHERE event_type = 'click'),
       e AS (SELECT word_idx, w FROM words WHERE event_type = 'error'),
       j AS (
        SELECT coalesce(p.word_idx, c.word_idx, e.word_idx) AS word_idx,
               coalesce(p.w, 0) AS pw, coalesce(c.w, 0) AS cw,
               coalesce(e.w, 0) AS ew
        FROM p FULL JOIN c ON c.word_idx = p.word_idx
        FULL JOIN e ON e.word_idx = coalesce(p.word_idx, c.word_idx)
       )
    SELECT 'purchase AND click' AS audience,
           CAST(sum(bit_count(pw & cw)) AS BIGINT) AS n_users FROM j
    UNION ALL
    SELECT 'purchase OR click',
           CAST(sum(bit_count(pw | cw)) AS BIGINT) FROM j
    UNION ALL
    SELECT 'purchase AND NOT error',
           CAST(sum(bit_count(pw & ~ew)) AS BIGINT) FROM j
    UNION ALL
    SELECT '(purchase OR click) AND NOT error',
           CAST(sum(bit_count((pw | cw) & ~ew)) AS BIGINT) FROM j
    ORDER BY audience
    """,
    doc="bitmap audience algebra: AND/OR/AND-NOT cardinalities computed"
    " by popcounting bitwise-combined words from one index build",
)
def ev_bitmap_audience_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean audience arithmetic from one bitmap build: who purchased
    AND clicked, purchased OR clicked, purchased but never errored —
    each a popcount over bitwise-combined words, NOT a fresh
    distinct-count over the log. AND-NOT is safe on the full-join
    grid because ``pw & ~ew`` is zero wherever the purchase word is
    absent — missing words coalesce to 0, so the universe never needs
    materializing. One index build (single OR-aggregate shuffle) then
    answers every question; this is the operator a segmentation UI
    issues per widget, and at 100 TB each answer costs a join of
    U/32-row tables."""
    events = load_table(spark, sf_dir, "events")
    words = (
        events.filter(F.col("ts") < "2024-01-04")
        .groupBy("event_type", F.expr("user_id div 32").alias("word_idx"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT),"
                " CAST(user_id % 32 AS INT)))"
            ).alias("w")
        )
    )

    def leg(t: str, alias: str) -> DataFrame:
        return words.filter(F.col("event_type") == t).select(
            "word_idx", F.col("w").alias(alias)
        )

    j = (
        leg("purchase", "pw")
        .join(leg("click", "cw"), "word_idx", "full")
        .join(leg("error", "ew"), "word_idx", "full")
        .select(
            F.coalesce("pw", F.lit(0)).alias("pw"),
            F.coalesce("cw", F.lit(0)).alias("cw"),
            F.coalesce("ew", F.lit(0)).alias("ew"),
        )
    )
    rows = [
        ("purchase AND click", "pw & cw"),
        ("purchase OR click", "pw | cw"),
        ("purchase AND NOT error", "pw & ~ew"),
        ("(purchase OR click) AND NOT error", "(pw | cw) & ~ew"),
    ]
    out = None
    for name, expr in rows:
        part = j.agg(
            F.lit(name).alias("audience"),
            F.expr(f"CAST(sum(bit_count({expr})) AS BIGINT)").alias(
                "n_users"
            ),
        )
        out = part if out is None else out.unionAll(part)
    assert out is not None
    return out.orderBy("audience")
