"""Maximal-Marginal-Relevance reranking of an ANN candidate pool.

Retrieval pipelines rarely serve raw cosine top-k: near-duplicate
neighbors crowd the result page, so the pool is *diversified* with MMR
(Carbonell & Goldstein, SIGIR'98): greedily pick the candidate that
maximizes lambda*relevance - (1-lambda)*max-similarity-to-already-picked.
This registers the serving-shaped version: one corpus scan produces the
top-``POOL_N`` candidate pool (the expensive, distributed part —
TakeOrderedAndProject, same plan as sim_bruteforce_topk), then the
greedy K-step rerank runs on the O(POOL_N²) pool — constant work
independent of corpus size, which is exactly why MMR is applied to a
pool and never to the corpus.

Exactness: relevance and pairwise similarity are floored to scaled
BIGINTs (floor(1e6*cos) — same IEEE double on both engines, explicit
floor because Spark CAST(double->int) truncates while DuckDB rounds),
and lambda=0.7 is applied as integer 7*rel - 3*maxsim (the common
denominator 10 is monotone-irrelevant), so the greedy argmax — where a
single ulp could flip a pick — is bit-deterministic. Ties break on
vec_id. The DuckDB oracle unrolls the K greedy steps as MATERIALIZED
CTEs (each step is referenced by every later step; inlining would
re-expand exponentially).

Scale note (100 TB): the pool scan is the certified brute-force/IVF
serving path; the rerank itself touches POOL_N embeddings — the two
``localCheckpoint`` calls pin the 20-row pool and 380-row sim matrix so
the K greedy plan steps reuse them instead of re-scanning the corpus
once per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.similarity import (
    QUERY_VEC_ID,
    _cos_expr,
    _sql_dot,
)
from big_data_training_spark.registry import register

POOL_N = 20  # candidate pool from the distributed scan
MMR_K = 5  # picks served to the user
LAMBDA_TENTHS = 7  # lambda = 0.7 applied as 7*rel - 3*maxsim


def _sql_mmr() -> str:
    """Unrolled greedy MMR as chained MATERIALIZED CTEs."""
    lam, comp = LAMBDA_TENTHS, 10 - LAMBDA_TENTHS
    steps = []
    for t in range(2, MMR_K + 1):
        prev = " UNION ALL ".join(f"SELECT vec_id FROM sel{i}" for i in range(1, t))
        steps.append(
            f"""sel{t} AS MATERIALIZED (
        SELECT {t} AS pick_rank, c.vec_id, c.rel,
               {lam} * c.rel - {comp} * (
                   SELECT max(p.sim) FROM pairs p
                   WHERE p.a_id = c.vec_id AND p.b_id IN ({prev})
               ) AS mmr
        FROM pool c
        WHERE c.vec_id NOT IN ({prev})
        ORDER BY mmr DESC, c.vec_id ASC LIMIT 1
    )"""
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM sel{i}" for i in range(1, MMR_K + 1)
    )
    return f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    pool AS MATERIALIZED (
        SELECT e.vec_id, e.embedding,
               CAST(floor(1000000 * (
                   {_sql_dot('e.embedding', 'q.qv')} /
                   (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                    sqrt({_sql_dot('q.qv', 'q.qv')}))
               )) AS BIGINT) AS rel
        FROM embeddings e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY rel DESC, e.vec_id ASC LIMIT {POOL_N}
    ),
    pairs AS MATERIALIZED (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(floor(1000000 * (
                   {_sql_dot('a.embedding', 'b.embedding')} /
                   (sqrt({_sql_dot('a.embedding', 'a.embedding')}) *
                    sqrt({_sql_dot('b.embedding', 'b.embedding')}))
               )) AS BIGINT) AS sim
        FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
    ),
    sel1 AS MATERIALIZED (
        SELECT 1 AS pick_rank, vec_id, rel, {lam} * rel AS mmr
        FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1
    ),
    {', '.join(steps)}
    SELECT pick_rank, vec_id, rel AS rel_scaled, mmr AS mmr_scaled
    FROM ({union})
    """


@register(
    "sim_mmr_rerank",
    _sql_mmr(),
    doc=f"MMR diversification: greedy {MMR_K} picks from the cosine"
    f" top-{POOL_N} pool at lambda=0.7, integer-exact scaled scores",
    bench=True,
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve a diversified top-{K}: the corpus scan produces the scaled-
    relevance pool (distributed, one pass); pool and pairwise-sim matrix
    are pinned with localCheckpoint (20 / 380 rows) so each greedy step
    is a constant-size join, not a corpus re-scan. Step t anti-joins the
    picked set, takes max similarity to it per candidate, and picks
    argmax(7*rel - 3*maxsim) with vec_id tiebreak — all BIGINT."""
    lam, comp = LAMBDA_TENTHS, 10 - LAMBDA_TENTHS
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    pool = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            F.expr(
                f"cast(floor(1000000 * ({_cos_expr('embedding', 'qv')})) as bigint)"
            ).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(POOL_N)
        .localCheckpoint()
    )
    a = pool.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea")
    )
    b = pool.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.expr(
                f"cast(floor(1000000 * ({_cos_expr('ea', 'eb')})) as bigint)"
            ).alias("sim"),
        )
        .localCheckpoint()
    )
    slim = pool.select("vec_id", "rel")
    out = (
        slim.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select(
            F.lit(1).alias("pick_rank"),
            "vec_id",
            "rel",
            (F.lit(lam) * F.col("rel")).alias("mmr"),
        )
    )
    picked = out.select("vec_id")
    for t in range(2, MMR_K + 1):
        cand = slim.join(picked, "vec_id", "left_anti")
        maxsim = (
            pairs.join(
                picked.withColumnRenamed("vec_id", "b_id"), "b_id"
            )
            .groupBy(F.col("a_id").alias("vec_id"))
            .agg(F.max("sim").alias("maxsim"))
        )
        pick = (
            cand.join(maxsim, "vec_id")
            .select(
                F.lit(t).alias("pick_rank"),
                "vec_id",
                "rel",
                (F.lit(lam) * F.col("rel") - F.lit(comp) * F.col("maxsim")).alias(
                    "mmr"
                ),
            )
            .orderBy(F.desc("mmr"), F.asc("vec_id"))
            .limit(1)
        )
        out = out.unionByName(pick)
        picked = out.select("vec_id")
    return out.select(
        "pick_rank",
        "vec_id",
        F.col("rel").alias("rel_scaled"),
        F.col("mmr").alias("mmr_scaled"),
    )
