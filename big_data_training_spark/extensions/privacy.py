"""Privacy auditing beyond k-anonymity: l-diversity.

k-anonymity (operators/governance.py dq_k_anonymity) only counts how
many rows share a quasi-identifier; if all of them share the same
SENSITIVE value, the class is large but still leaks (the homogeneity
attack of Machanavajjhala et al., "l-Diversity", ICDE 2006). The
l-diversity audit therefore measures, per quasi-identifier class, how
many DISTINCT sensitive values it contains, and flags classes below
each l threshold.

Fixture mapping: the event log's quasi-identifier is what an observer
can see — (event_type, hour of day); the sensitive attribute is the
payload value bucket carried in the props JSON. Scale: one
groupBy(qid, sensitive) to collapse duplicates, one groupBy(qid) for
the diversity count, then the threshold grid multiplies class rows
only — the same one-corpus-pass shape as the k-anonymity audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

L_THRESHOLDS = (2, 3, 5, 10)
SENS_BUCKET = 10  # props.k integer value, bucketed


@register(
    "dq_l_diversity",
    f"""
    WITH obs AS (
        SELECT event_type,
               CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
               CAST(json_extract_string(props, '$.k') AS BIGINT)
                   // {SENS_BUCKET} AS sens,
               count(*) AS n
        FROM events
        GROUP BY 1, 2, 3
    ), cls AS (
        SELECT event_type, hour_of_day,
               count(*) AS diversity,
               CAST(sum(n) AS BIGINT) AS n_rows
        FROM obs GROUP BY 1, 2
    )
    SELECT l,
           CAST(sum(CASE WHEN diversity < l THEN 1 ELSE 0 END) AS BIGINT)
               AS n_classes_below,
           CAST(sum(CASE WHEN diversity < l THEN n_rows ELSE 0 END)
               AS BIGINT) AS n_rows_at_risk,
           CAST(min(diversity) AS BIGINT) AS min_diversity
    FROM cls,
         (VALUES {", ".join(f"({v})" for v in L_THRESHOLDS)}) AS ls(l)
    GROUP BY l
    ORDER BY l
    """,
    doc="privacy: l-diversity audit — distinct sensitive-value count"
    " per (event_type, hour) quasi-identifier class vs l thresholds"
    f" {L_THRESHOLDS}",
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The homogeneity-attack audit: a quasi-identifier class whose
    rows all carry the same sensitive value leaks it no matter how
    large the class is. Per (event_type, hour-of-day) class, count
    distinct sensitive buckets (props.k div {bucket}); report, for
    each l, how many classes and rows fall below l distinct values.
    Two keyed aggregations over the log (the second over class rows
    only), threshold grid applied to the tiny class table — audit
    cost is one corpus pass at any scale, like dq_k_anonymity whose
    VALUES-grid idiom this mirrors."""
    events = load_table(spark, sf_dir, "events")
    obs = events.groupBy(
        "event_type",
        F.expr("CAST(extract(hour FROM ts) AS BIGINT)").alias(
            "hour_of_day"
        ),
        F.expr(
            "CAST(get_json_object(props, '$.k') AS BIGINT)"
            f" div {SENS_BUCKET}"
        ).alias("sens"),
    ).agg(F.count("*").alias("n"))
    cls = obs.groupBy("event_type", "hour_of_day").agg(
        F.count("*").alias("diversity"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    ls = F.explode(
        F.array(*[F.lit(v) for v in L_THRESHOLDS])
    ).alias("l")
    return (
        cls.select("diversity", "n_rows", ls)
        .groupBy("l")
        .agg(
            F.sum((F.col("diversity") < F.col("l")).cast("bigint"))
            .alias("n_classes_below"),
            F.sum(
                F.when(F.col("diversity") < F.col("l"), F.col("n_rows"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_rows_at_risk"),
            F.min("diversity").cast("bigint").alias("min_diversity"),
        )
        .orderBy("l")
    )
