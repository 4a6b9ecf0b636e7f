"""Sketch set-operations and embedding-column profiling.

Extends the mergeable-sketch family (extensions/sketches.py) with the
KMV set-intersection estimator — the sketch answer to "how much do two
event audiences overlap?" — self-audited against the exact answer, and
adds per-dimension embedding statistics (the feature-quality profile a
training pipeline publishes for an ``array<float>`` column).

Scale design
------------
KMV machinery is a ``TakeOrderedAndProject`` (per-partition top-K by
hash, merged at the driver-side limit) — never a global sort. The
exact audit is two distinct aggregates on user_id. Embedding stats
shuffle (pos, partial-sums) cells: 64×|partitions| rows, corpus-free.
All estimator arithmetic is integer (permille) so the DuckDB oracle
hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60, sql_hash60
from big_data_training_spark.functions.text import SQL_TOKENS
from big_data_training_spark.registry import register

KMV_K = 64


@register(
    "sk_kmv_jaccard",
    f"""
    WITH a AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ), b AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), tagged AS (
        SELECT {sql_hash60("CAST(user_id AS VARCHAR)")} AS h,
               max(in_a) AS in_a, max(in_b) AS in_b
        FROM (
            SELECT user_id, 1 AS in_a, 0 AS in_b FROM a
            UNION ALL
            SELECT user_id, 0, 1 FROM b
        ) GROUP BY 1
    ), union_k AS (
        SELECT * FROM tagged ORDER BY h LIMIT {KMV_K}
    ), est AS (
        SELECT count(*) AS k_used,
               CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared_in_k
        FROM union_k
    ), exact AS (
        SELECT CAST(count(*) AS BIGINT) AS n_union,
               CAST(sum(in_a * in_b) AS BIGINT) AS n_intersect
        FROM tagged
    )
    SELECT est.k_used, est.n_shared_in_k,
           CAST(est.n_shared_in_k * 1000 // est.k_used AS BIGINT)
               AS jaccard_est_permille,
           exact.n_intersect, exact.n_union,
           CAST(exact.n_intersect * 1000 // exact.n_union AS BIGINT)
               AS jaccard_exact_permille
    FROM est, exact
    """,
    doc="KMV sketch Jaccard between click/purchase audiences, with exact audit",
)
def sk_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-overlap estimate: tag each distinct user with audience
    membership flags, keep the K smallest portable hashes of the union
    (TakeOrderedAndProject — per-partition top-K, no global sort), and
    read the Jaccard off the shared fraction inside that bottom-K
    sample. The exact permille rides along so the estimate is
    self-auditing — on a 100 TB log only the tagged-distinct aggregate
    scales with data; the sketch itself is K rows."""
    ev = load_table(spark, sf_dir, "events")

    def audience(t: str, col: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .select("user_id")
            .distinct()
            .select("user_id", F.lit(1).alias(col))
        )

    a = audience("click", "in_a").withColumn("in_b", F.lit(0))
    b = audience("purchase", "in_b").withColumn("in_a", F.lit(0))
    tagged = (
        a.unionByName(b)
        .groupBy("user_id")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .select(
            hash60(F.col("user_id").cast("string")).alias("h"), "in_a", "in_b"
        )
    )
    union_k = tagged.orderBy("h").limit(KMV_K)
    est = union_k.agg(
        F.count("*").alias("k_used"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("int"))
        .cast("bigint")
        .alias("n_shared_in_k"),
    )
    exact = tagged.agg(
        F.count("*").cast("bigint").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_intersect"),
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "k_used",
            "n_shared_in_k",
            F.expr("n_shared_in_k * 1000 div k_used").cast("bigint").alias(
                "jaccard_est_permille"
            ),
            "n_intersect",
            "n_union",
            F.expr("n_intersect * 1000 div n_union").cast("bigint").alias(
                "jaccard_exact_permille"
            ),
        )
    )


EMB_DIM = 64


@register(
    "emb_dim_stats",
    f"""
    SELECT i - 1 AS pos,
           round(CAST(sum(CAST(embedding[i] AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 6) AS mean,
           round(CAST(min(embedding[i]) AS DOUBLE), 6) AS vmin,
           round(CAST(max(embedding[i]) AS DOUBLE), 6) AS vmax,
           count(*) AS n
    FROM embeddings, generate_series(1, {EMB_DIM}) AS g(i)
    GROUP BY 1
    """,
    doc="per-dimension embedding stats: decimal-exact mean, min/max, count",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-quality profile of the embedding column: per dimension,
    the decimal-exact mean plus min/max — the check that catches dead
    or exploding dimensions before they poison ANN indexes. posexplode
    + grouped partial aggregation: the shuffle carries (pos, partial)
    cells, 64 output rows regardless of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy(F.col("pos").cast("bigint").alias("pos"))
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count("*"),
                6,
            ).alias("mean"),
            F.round(F.min("v").cast("double"), 6).alias("vmin"),
            F.round(F.max("v").cast("double"), 6).alias("vmax"),
            F.count("*").alias("n"),
        )
    )


@register(
    "dd_cross_source_dupes",
    f"""
    SELECT md5(array_to_string(list_sort(list_distinct(
               {SQL_TOKENS.format(col='text')})), ' ')) AS fingerprint,
           count(*) AS n_docs,
           count(DISTINCT source) AS n_sources,
           min(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1 AND count(DISTINCT source) > 1
    """,
    doc="dedup: duplicate content that spans multiple sources (cross-shard leaks)",
)
def dd_cross_source_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate audit: bag-of-words fingerprint groups
    that appear in more than one source shard — the leak class
    (mirrors, syndicated pages) that per-source dedup passes miss
    entirely. One shuffle on the 16-byte fingerprint; output is only
    the offending groups."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(F.expr("filter(split(text, '\\\\s+'), w -> w != '')"))
            ),
        )
    )
    return (
        docs.groupBy(fp.alias("fingerprint"))
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter((F.col("n_docs") > 1) & (F.col("n_sources") > 1))
    )
