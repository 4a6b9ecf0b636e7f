"""Matryoshka-style dimension-truncation evaluation: how much ANN
recall survives when the index serves only a PREFIX of each embedding?

Modern embedding models (MRL — Matryoshka Representation Learning)
are trained so prefixes of the vector are usable embeddings; serving
then stores the first d' dims hot and re-ranks with the full vector.
Before adopting that layout you measure exactly this operator:
overlap@k between full-dimension top-k and prefix-dimension top-k for
one query. It completes the repo's embedding-compression eval axis
(int8 = fewer bits/dim, PQ = codebooks, binary = 1 bit/dim, THIS =
fewer dims).

Exactness: elements are floored to 2^20 fixed point FIRST, then all
dot products are pure int64 sums (64 dims x (3*2^20)^2 per term stays
far under 2^63) — rankings and overlaps are engine-identical, no
float dot anywhere.

Scale: one corpus scan computes both scores (prefix sum is a slice of
the same arrays); each top-k is TakeOrderedAndProject (never a full
sort); the overlap join runs on two k-row tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

QUERY_VEC = 0
DIMS_FULL = 64
DIMS_TRUNC = 16
TOPK = 10
_FP = 1 << 20


def _duck_dot(a: str, b: str, n: int) -> str:
    return (
        f"(SELECT CAST(sum(CAST(floor(CAST({a}[i] AS DOUBLE) * {_FP})"
        f" AS BIGINT) * CAST(floor(CAST({b}[i] AS DOUBLE) * {_FP})"
        f" AS BIGINT)) AS BIGINT)"
        f" FROM generate_series(1, {n}) AS g(i))"
    )


def _spark_dot(a: str, b: str, n: int) -> str:
    return (
        f"aggregate(zip_with(slice({a}, 1, {n}), slice({b}, 1, {n}),"
        f" (x, y) -> CAST(floor(CAST(x AS DOUBLE) * {_FP}) AS BIGINT)"
        f" * CAST(floor(CAST(y AS DOUBLE) * {_FP}) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (s, t) -> s + t)"
    )


@register(
    "sim_dim_truncation_recall",
    f"""
    WITH q AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC}
    ),
    scored AS (
        SELECT e.vec_id AS vec_id,
               {_duck_dot('e.embedding', 'q.qv', DIMS_FULL)} AS dot_full,
               {_duck_dot('e.embedding', 'q.qv', DIMS_TRUNC)} AS dot_trunc
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> {QUERY_VEC}
    ),
    tf AS (
        SELECT vec_id, row_number() OVER (
            ORDER BY dot_full DESC, vec_id) AS rf
        FROM scored QUALIFY rf <= {TOPK}
    ),
    tt AS (
        SELECT vec_id, row_number() OVER (
            ORDER BY dot_trunc DESC, vec_id) AS rt
        FROM scored QUALIFY rt <= {TOPK}
    ),
    ks AS (SELECT unnest([1, 5, {TOPK}]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(count(tt.vec_id) AS BIGINT) AS n_overlap,
           CAST(count(tt.vec_id) * 1000000 // ks.k AS BIGINT)
               AS recall_ppm
    FROM ks
    LEFT JOIN tf ON tf.rf <= ks.k
    LEFT JOIN tt ON tt.vec_id = tf.vec_id AND tt.rt <= ks.k
    GROUP BY ks.k
    ORDER BY k
    """,
    doc=f"Matryoshka truncation eval: overlap@k (k=1,5,{TOPK}) between "
    f"{DIMS_FULL}-dim and {DIMS_TRUNC}-dim-prefix top-k for one query, "
    f"exact fixed-point integer dots",
)
def sim_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the corpus once against the broadcast query vector with
    BOTH the full and the prefix dot (same scan, same arrays); each
    top-k is orderBy+limit (TakeOrderedAndProject); recall@k comes
    from joining the two k-row lists. The number this emits is the
    one that decides whether the hot tier stores 16 or 64 dims."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC).select(
        F.col("embedding").alias("qv")
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id",
            f"{_spark_dot('embedding', 'qv', DIMS_FULL)} AS dot_full",
            f"{_spark_dot('embedding', 'qv', DIMS_TRUNC)} AS dot_trunc",
        )
        .localCheckpoint(eager=True)
    )
    wf = Window.orderBy(F.desc("dot_full"), "vec_id")
    wt = Window.orderBy(F.desc("dot_trunc"), "vec_id")
    tf = (
        scored.orderBy(F.desc("dot_full"), "vec_id")
        .limit(TOPK)
        .withColumn("rf", F.row_number().over(wf))
        .select("vec_id", "rf")
    )
    tt = (
        scored.orderBy(F.desc("dot_trunc"), "vec_id")
        .limit(TOPK)
        .withColumn("rt", F.row_number().over(wt))
        .select(F.col("vec_id").alias("tid"), "rt")
    )
    ks = spark.createDataFrame(
        [(1,), (5,), (TOPK,)], "k long"
    )
    return (
        ks.join(tf, tf["rf"] <= ks["k"], "left")
        .join(
            tt,
            (tt["tid"] == tf["vec_id"]) & (tt["rt"] <= ks["k"]),
            "left",
        )
        .groupBy("k")
        .agg(F.expr("CAST(count(tid) AS BIGINT)").alias("n_overlap"))
        .selectExpr(
            "CAST(k AS BIGINT) AS k",
            "n_overlap",
            "CAST(n_overlap * 1000000 div k AS BIGINT) AS recall_ppm",
        )
        .orderBy("k")
    )
