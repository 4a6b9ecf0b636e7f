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

from pyspark.sql import DataFrame, SparkSession, Window
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


QUERY_TERMS = ("hash", "join", "merge")  # lexical leg of the hybrid query
RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_POOL = 100  # per-leg candidate list length
RRF_TOP = 10


def _sql_hybrid() -> str:
    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    return f"""
    WITH lexpool AS (
        SELECT doc_id, lex FROM (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ({terms}))) AS lex
            FROM documents WHERE doc_id <> {QUERY_VEC_ID}
        ) ORDER BY lex DESC, doc_id ASC LIMIT {RRF_POOL}
    ),
    lexr AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY lex DESC, doc_id ASC) AS rank_lex
        FROM lexpool
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    sempool AS (
        SELECT vec_id AS doc_id, cos FROM (
            SELECT e.vec_id,
                   {_sql_dot('e.embedding', 'q.qv')} /
                   (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                    sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos
            FROM embeddings e, q WHERE e.vec_id <> {QUERY_VEC_ID}
        ) ORDER BY cos DESC, vec_id ASC LIMIT {RRF_POOL}
    ),
    semr AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS rank_sem
        FROM sempool
    ),
    fused AS (
        SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
               CAST(coalesce(l.rank_lex, 0) AS BIGINT) AS rank_lex,
               CAST(coalesce(s.rank_sem, 0) AS BIGINT) AS rank_sem,
               CAST(
                   (CASE WHEN l.rank_lex IS NULL THEN 0
                         ELSE 1000000 // ({RRF_K} + l.rank_lex) END)
                   + (CASE WHEN s.rank_sem IS NULL THEN 0
                           ELSE 1000000 // ({RRF_K} + s.rank_sem) END)
                   AS BIGINT) AS rrf_scaled
        FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, rank_lex, rank_sem, rrf_scaled
    FROM fused ORDER BY rrf_scaled DESC, doc_id ASC LIMIT {RRF_TOP}
    """


@register(
    "sim_hybrid_rrf",
    _sql_hybrid(),
    doc="hybrid retrieval: lexical term-match and cosine legs fused by"
    f" reciprocal-rank fusion (k={RRF_K}) over top-{RRF_POOL} candidate"
    f" lists, integer-exact scaled scores, top-{RRF_TOP} served",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-leg retrieval the way RAG stacks actually serve it: a keyword
    leg (query-term hit count over the shared whitespace tokenizer) and
    a semantic leg (cosine against the query vector, doc_id == vec_id
    in the fixture id space), each truncated to its own top-100
    candidate list by a distributed TakeOrderedAndProject — RRF is
    defined over candidate LISTS, which is what keeps it corpus-size-
    free at 100 TB. Fusion is 10^6 div (60 + rank) summed over the legs
    where the doc appears (full-outer join of the two 100-row lists),
    all integer, rank ties broken by doc_id."""
    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lexpool = (
        docs.filter(F.col("doc_id") != QUERY_VEC_ID)
        .select(
            "doc_id",
            F.expr(
                f"size(filter(filter(split(text, ' '), w -> w <> ''),"
                f" t -> t IN ({terms})))"
            ).alias("lex"),
        )
        .orderBy(F.desc("lex"), F.asc("doc_id"))
        .limit(RRF_POOL)
    )
    lexr = lexpool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("lex"), F.asc("doc_id")))
        .cast("bigint")
        .alias("rank_lex"),
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    sempool = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(_cos_expr("embedding", "qv")).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(RRF_POOL)
    )
    semr = sempool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos"), F.asc("doc_id")))
        .cast("bigint")
        .alias("rank_sem"),
    )
    fused = (
        lexr.join(semr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rank_lex", F.lit(0)).cast("bigint").alias("rank_lex"),
            F.coalesce("rank_sem", F.lit(0)).cast("bigint").alias("rank_sem"),
            (
                F.when(
                    F.col("rank_lex").isNull(), F.lit(0).cast("bigint")
                ).otherwise(F.expr(f"1000000 div ({RRF_K} + rank_lex)"))
                + F.when(
                    F.col("rank_sem").isNull(), F.lit(0).cast("bigint")
                ).otherwise(F.expr(f"1000000 div ({RRF_K} + rank_sem)"))
            )
            .cast("bigint")
            .alias("rrf_scaled"),
        )
    )
    return fused.orderBy(F.desc("rrf_scaled"), F.asc("doc_id")).limit(RRF_TOP)
