"""Deterministic distributed sampling: bottom-k-by-hash (the mergeable
uniform sample) and a MinHash-estimate calibration histogram.

Bottom-k hashing is the sampling scheme that actually composes at
100 TB: hash every key with a fixed function and keep the k smallest
hashes. The sample is (a) uniform (md5 scrambles), (b) deterministic
(re-runs and retries agree — no RNG seeds to coordinate), and (c)
mergeable: bottom-k of a union == bottom-k of the per-partition
bottom-ks, which is exactly Spark's TakeOrderedAndProject shape — each
partition ships at most k rows. The same property powers the KMV
distinct sketch (extensions/sketches.py); here it is surfaced as the
sampling primitive a curation pipeline uses for eval panels and manual
audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60, sql_hash60
from big_data_training_spark.registry import register

SAMPLE_K = 64


@register(
    "sm_bottomk_sample",
    f"""
    SELECT doc_id, h AS sample_hash
    FROM (
        SELECT doc_id, {sql_hash60("'sample:' || CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
    )
    ORDER BY h, doc_id
    LIMIT {SAMPLE_K}
    """,
    doc=f"deterministic uniform sample: {SAMPLE_K} smallest md5-derived"
    " key hashes (mergeable bottom-k, no RNG)",
)
def sm_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k documents with the smallest salted key hashes — a uniform,
    reproducible sample whose distributed plan is TakeOrderedAndProject
    (per-partition bottom-k heaps, k rows per partition to the driver;
    no global sort, no shuffle). Adding data can only evict sample
    members, never perturb the rest — the property that makes bottom-k
    panels stable across incremental corpus builds."""
    docs = load_table(spark, sf_dir, "documents")
    h = hash60(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", h.alias("sample_hash"))
        .orderBy("sample_hash", "doc_id")
        .limit(SAMPLE_K)
    )


CALIB_BIN_PERMILLE = 100

# The oracle aggregates dd_minhash_vs_exact's certified SQL (importing
# the module registers it; the CTE stays single-sourced in dedup.py).
from big_data_training_spark import registry as _registry  # noqa: E402
from big_data_training_spark.extensions import dedup as _dedup  # noqa: E402, F401

_VS_EXACT_SQL = _registry._REGISTRY["dd_minhash_vs_exact"].oracle
assert _VS_EXACT_SQL is not None

_CALIB_SQL = f"""
    WITH pair_table AS ({_VS_EXACT_SQL})
    SELECT CAST(floor(est_jaccard * 1000 / {CALIB_BIN_PERMILLE})
                * {CALIB_BIN_PERMILLE} AS BIGINT) AS est_bin_permille,
           count(*) AS n_pairs,
           CAST(CAST(sum(exact_pm) AS BIGINT)
                // count(*) AS BIGINT) AS mean_exact_permille
    FROM (SELECT est_jaccard,
                 CAST(floor(exact_jaccard * 1000) AS BIGINT) AS exact_pm
          FROM pair_table)
    GROUP BY 1
    """


@register(
    "dd_minhash_calibration",
    _CALIB_SQL,
    doc="MinHash estimator calibration: mean exact Jaccard per"
    " estimated-Jaccard bin over all LSH-surfaced pairs",
    bench=True,
)
def dd_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the 16-hash MinHash estimate biased? Bin every LSH-surfaced
    pair by its estimated Jaccard (permille, width 100) and report the
    bin's pair count and mean exact Jaccard (permille, floor) — the
    calibration table that tells you whether a threshold of 0.5
    estimated means 0.5 real. Built on the certified pair miner
    (dd_minhash_vs_exact), so the audit costs two tiny joins beyond
    work already done. Integer-exact: permille floor-divisions of
    count sums."""
    from big_data_training_spark.extensions.dedup import dd_minhash_vs_exact

    pairs = dd_minhash_vs_exact(spark, sf_dir)
    binned = pairs.select(
        (
            F.floor(F.col("est_jaccard") * 1000 / CALIB_BIN_PERMILLE)
            * CALIB_BIN_PERMILLE
        )
        .cast("bigint")
        .alias("est_bin_permille"),
        F.floor(F.col("exact_jaccard") * 1000).cast("bigint").alias("exact_pm"),
    )
    return binned.groupBy("est_bin_permille").agg(
        F.count("*").alias("n_pairs"),
        F.expr("sum(exact_pm) div count(*)").alias("mean_exact_permille"),
    )


