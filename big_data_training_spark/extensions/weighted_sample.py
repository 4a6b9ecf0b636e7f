"""Weighted sampling without replacement: deterministic sequential
Poisson (priority) sampling.

Uniform bottom-k sampling (extensions/sampling.py) treats every
document equally; a curation pipeline usually wants
probability-proportional-to-size — long documents, high-traffic
sources, heavy customers — while keeping the run deterministic and
mergeable. Ohlsson's sequential Poisson scheme does exactly that:
give row i priority q_i = u_i / w_i with u_i a uniform hash in (0,1]
and keep the k smallest priorities. Inclusion probability is
approximately proportional to w_i, the sample is reproducible (the
"randomness" is the salted md5 hash, no RNG state), and selection is
a bounded-state top-k: per-partition heaps of k rows, merged — the
TakeOrderedAndProject shape, so a 100 TB corpus ships k rows per
partition and nothing else.

Cross-engine exactness: the priority is a DOUBLE ratio hash/weight,
safe because IEEE-754 division is exactly rounded — identical inputs
give the bit-identical double in Spark and DuckDB, and the emitted
column is floored to micro-units (BIGINT) so the hash compare never
sees a float."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60, sql_hash60
from big_data_training_spark.registry import register

WSAMPLE_K = 48
_H_MAX = float(1 << 60)


@register(
    "sm_weighted_priority_sample",
    f"""
    SELECT doc_id, n_chars AS weight,
           CAST(floor(
               ({sql_hash60("'wsample:' || CAST(doc_id AS VARCHAR)")}
                / {_H_MAX!r}) / n_chars * 1e12) AS BIGINT)
               AS priority_micro
    FROM documents
    WHERE n_chars > 0
    ORDER BY priority_micro, doc_id
    LIMIT {WSAMPLE_K}
    """,
    doc=f"sequential Poisson weighted sample: {WSAMPLE_K} docs with the"
    " smallest hash/n_chars priorities — PPS without replacement,"
    " deterministic, bounded-state top-k",
)
def sm_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size sample of documents, weight =
    n_chars: priority q = (md5-hash normalized to (0,1]) / weight,
    keep the {k} smallest. Long documents get small priorities more
    often, short ones still have a chance — the estimator-friendly
    PPS scheme (Ohlsson 1998), with the hash replacing the RNG so
    retries, re-runs and engines all agree. The plan is a single scan
    + TakeOrderedAndProject (per-partition k-heaps); the double
    division is IEEE-exact-rounded on identical int inputs, and the
    reported priority is floored to integer micro-units so the
    cross-engine compare is on BIGINTs."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    h = hash60(F.concat(F.lit("wsample:"), F.col("doc_id").cast("string")))
    pri = F.floor(
        (h / F.lit(_H_MAX)) / F.col("n_chars") * F.lit(1e12)
    ).cast("bigint")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            pri.alias("priority_micro"),
        )
        .orderBy("priority_micro", "doc_id")
        .limit(WSAMPLE_K)
    )
