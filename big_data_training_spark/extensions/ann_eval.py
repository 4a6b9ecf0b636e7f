"""ANN index-compression evaluation: recall@k of reduced-precision
representations against the full-precision brute-force truth.

Two compression schemes every 100 TB vector deployment weighs:

* **Matryoshka truncation** — rank by cosine over only the first
  ``TRUNC_DIMS`` coordinates (Kusupati et al. 2022: embeddings trained
  so nested prefixes are themselves usable), a 4x index-size cut with
  zero re-encoding. The measured recall@k is the number that decides
  how many dims the serving tier can drop.
* **Int8 symmetric quantization** — rank by cosine over the per-vector
  max-abs int8 codes (the storage layout of ``emb_int8_quantize``).
  Cosine is scale-invariant, so the per-vector scale factors cancel
  and the quantized ranking is pure integer dot products — bit-exact
  in any engine.

Both reuse the recall skeleton of ``sim_ivf_recall_at_k``: truth and
candidate top-k are TakeOrderedAndProject scans (broadcast 1-row query,
no corpus shuffle), the overlap is a semi-join of two k-row sets, and
the report is integer permille.

The module also composes the two production approximations into the
full serving architecture (``sim_ivfpq_topk`` — IVF cell routing over
PQ ADC scoring — with its stacked recall audit) and carries the
pre-index data-quality gate (``dq_embedding_health``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.similarity import (
    QUERY_VEC_ID,
    TOP_K,
    _cos_expr,
    _sql_dot,
    sim_bruteforce_topk,
)
from big_data_training_spark.registry import register

TRUNC_DIMS = 16


def _recall_report(truth: DataFrame, cand: DataFrame) -> DataFrame:
    truth = truth.localCheckpoint(eager=False)
    cand = cand.localCheckpoint(eager=False)
    recalled = truth.join(cand, "vec_id", "left_semi")
    return (
        truth.agg(F.count("*").alias("k"))
        .crossJoin(F.broadcast(recalled.agg(F.count("*").alias("n_recalled"))))
        .select(
            "k",
            "n_recalled",
            F.expr("(n_recalled * 1000) div greatest(k, 1)").alias(
                "recall_permille"
            ),
        )
    )


_SQL_RECALL_TAIL = f"""
    SELECT (SELECT count(*) FROM truth) AS k,
           (SELECT count(*) FROM truth t JOIN cand c USING (vec_id))
               AS n_recalled,
           CAST((SELECT count(*) FROM truth t JOIN cand c USING (vec_id)) * 1000
                // greatest((SELECT count(*) FROM truth), 1)
                AS BIGINT) AS recall_permille
"""


@register(
    "sim_matryoshka_recall",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    scored AS (
        SELECT e.vec_id,
               {_sql_dot('e.embedding', 'q.qv')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos_full,
               {_sql_dot('e.embedding', 'q.qv', TRUNC_DIMS)} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding', TRUNC_DIMS)}) *
                sqrt({_sql_dot('q.qv', 'q.qv', TRUNC_DIMS)})) AS cos_trunc
        FROM embeddings e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
    ),
    truth AS (
        SELECT vec_id FROM scored ORDER BY cos_full DESC, vec_id ASC LIMIT {TOP_K}
    ),
    cand AS (
        SELECT vec_id FROM scored ORDER BY cos_trunc DESC, vec_id ASC LIMIT {TOP_K}
    )
    {_SQL_RECALL_TAIL}
    """,
    doc=f"matryoshka recall@k: first-{TRUNC_DIMS}-dims ranking vs full cosine",
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} when the serving index keeps only the first
    {TRUNC_DIMS} of 64 coordinates. Both rankings are single pipelined
    scans over a broadcast query vector; the truncated scan reads the
    same column and slices in the expression, so at scale the only
    saved cost is index bytes — exactly what the trade-off measures."""
    truth = sim_bruteforce_topk(spark, sf_dir).select("vec_id")
    return _recall_report(truth, matryoshka_candidates(spark, sf_dir))


def matryoshka_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k under the truncated-prefix cosine (the serving-side ranking;
    exposed separately so plan tests can assert TakeOrderedAndProject
    before the recall report checkpoints it away)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .withColumn("te", F.expr(f"slice(embedding, 1, {TRUNC_DIMS})"))
        .withColumn("tq", F.expr(f"slice(qv, 1, {TRUNC_DIMS})"))
        .withColumn("cos_trunc", F.expr(_cos_expr("te", "tq")))
    )
    return (
        scored.orderBy(F.desc("cos_trunc"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id")
    )


# Int8 code for coordinate i (1-based), given a per-vector maxabs alias.
def _sql_q(vec: str, maxabs: str, i: str = "i") -> str:
    return f"CAST(round(CAST({vec}[{i}] AS DOUBLE) / {maxabs} * 127) AS BIGINT)"


_SQL_MAXABS = (
    "(SELECT max(abs(CAST({v}[i] AS DOUBLE))) FROM generate_series(1, 64) AS g(i))"
)


@register(
    "sim_int8_recall_at_k",
    f"""
    WITH q AS (
        SELECT embedding AS qv, {_SQL_MAXABS.format(v='embedding')} AS qm
        FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    coded AS (
        SELECT e.vec_id, e.embedding, q.qv, q.qm,
               {_SQL_MAXABS.format(v='e.embedding')} AS em
        FROM embeddings e, q WHERE e.vec_id <> {QUERY_VEC_ID}
    ),
    scored AS (
        SELECT vec_id,
               {_sql_dot('embedding', 'qv')} /
               (sqrt({_sql_dot('embedding', 'embedding')}) *
                sqrt({_sql_dot('qv', 'qv')})) AS cos_full,
               (SELECT sum({_sql_q('embedding', 'em')} * {_sql_q('qv', 'qm')})
                FROM generate_series(1, 64) AS g(i)) /
               (sqrt((SELECT sum({_sql_q('embedding', 'em')} *
                                 {_sql_q('embedding', 'em')})
                      FROM generate_series(1, 64) AS g(i))) *
                sqrt((SELECT sum({_sql_q('qv', 'qm')} * {_sql_q('qv', 'qm')})
                      FROM generate_series(1, 64) AS g(i)))) AS cos_q
        FROM coded
    ),
    truth AS (
        SELECT vec_id FROM scored ORDER BY cos_full DESC, vec_id ASC LIMIT {TOP_K}
    ),
    cand AS (
        SELECT vec_id FROM scored ORDER BY cos_q DESC, vec_id ASC LIMIT {TOP_K}
    )
    {_SQL_RECALL_TAIL}
    """,
    doc="int8-quantization recall@k: integer-code cosine vs float cosine",
)
def sim_int8_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} when vectors are served as per-vector-scaled int8
    codes (4x smaller index). The quantized ranking needs no scale
    factors at all — cosine's scale invariance cancels them — so the
    candidate ordering is integer dot products of the codes, exact in
    every engine; only the final cosine normalization is float."""
    truth = sim_bruteforce_topk(spark, sf_dir).select("vec_id")
    return _recall_report(truth, int8_candidates(spark, sf_dir))


def int8_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k under the int8-code cosine (scale factors cancel); exposed
    for the serving-plan test, as with :func:`matryoshka_candidates`."""
    emb = load_table(spark, sf_dir, "embeddings")
    maxabs = (
        "aggregate({v}, cast(0 as double), (m, x) -> greatest(m, abs(cast(x as"
        " double))))"
    )
    qcode = (
        "transform({v}, x -> cast(round(cast(x as double) / {m} * 127) as bigint))"
    )
    idot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as bigint),"
        " (acc, v) -> acc + v)"
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.expr(qcode.format(v="embedding", m=maxabs.format(v="embedding"))).alias(
            "qc"
        )
    )
    coded = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .withColumn(
            "ec",
            F.expr(qcode.format(v="embedding", m=maxabs.format(v="embedding"))),
        )
        .withColumn(
            "cos_q",
            F.expr(
                f"cast({idot.format(a='ec', b='qc')} as double) /"
                f" (sqrt(cast({idot.format(a='ec', b='ec')} as double)) *"
                f"  sqrt(cast({idot.format(a='qc', b='qc')} as double)))"
            ),
        )
    )
    return (
        coded.orderBy(F.desc("cos_q"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id")
    )


# ---------------------------------------------------------------------------
# IVF+PQ: the combined billion-vector serving architecture — coarse cells
# route the query (IVF), PQ codes score the candidates (ADC). Composed
# from the audited building blocks so the deployed path and its parts
# can never diverge: cells/probe from extensions.similarity, codebook/
# codes/distance-table from extensions.sketchops.
# ---------------------------------------------------------------------------

from big_data_training_spark.extensions.similarity import (  # noqa: E402
    N_PROBE,
    _SQL_CENTROIDS,
    _SQL_IVF_PROBE,
)
from big_data_training_spark.extensions.sketchops import (  # noqa: E402
    PQ_SUB_DIM,
    _SQL_PQ_CB_CTE,
    _pq_codebook,
    _pq_codes,
)


def _ivfpq_sql_body() -> str:
    return (
        _SQL_PQ_CB_CTE
        + f"""
    , q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
{_SQL_CENTROIDS},
{_SQL_IVF_PROBE}
    dtable AS (
        SELECT c.s, c.code,
               CAST(floor((SELECT sum((CAST(q.qv[c.s * {PQ_SUB_DIM} + i] AS DOUBLE) - c.cv[i])
                                      * (CAST(q.qv[c.s * {PQ_SUB_DIM} + i] AS DOUBLE) - c.cv[i]))
                           FROM generate_series(1, {PQ_SUB_DIM}) AS g(i)) * 1000000)
                    AS BIGINT) AS dmic
        FROM cbv c, q
    ), ivfpq AS (
        SELECT a.vec_id, CAST(sum(t.dmic) AS BIGINT) AS adc_dist_micro
        FROM assigned a
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN dtable t ON a.s = t.s AND a.code = t.code
        WHERE a.rk = 1 AND a.vec_id <> {QUERY_VEC_ID}
          AND e.label IN (SELECT label FROM probe)
        GROUP BY 1
    )"""
    )


@register(
    "sim_ivfpq_topk",
    _ivfpq_sql_body()
    + f"""
    SELECT vec_id, adc_dist_micro FROM ivfpq
    ORDER BY adc_dist_micro, vec_id LIMIT {TOP_K}
    """,
    doc="IVF+PQ top-k: probe coarse cells, ADC-score codes inside them",
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The billion-vector serving architecture in one query: the query
    routes to its N_PROBE nearest coarse cells (IVF), and only the PQ
    codes of vectors in those cells are scored against the query's
    32-entry asymmetric distance table. Raw vectors are never read at
    query time. Locally the cell id is joined from the embeddings table;
    a production index stores (cell, codes) together, so the candidate
    restriction is partition pruning, not a join — the micro-quantized
    integer distances make the ranking bit-exact either way."""
    return _ivfpq_candidates(spark, sf_dir, with_dist=True)


def _ivfpq_candidates(
    spark: SparkSession, sf_dir: str, with_dist: bool = False
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count("*"),
                6,
            ).alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s.c
            ).alias("cv")
        )
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    probe = (
        cent.join(F.broadcast(q))
        .withColumn("ccos", F.expr(_cos_expr("cv", "qv")))
        .orderBy(F.desc("ccos"), F.asc("label"))
        .limit(N_PROBE)
        .select("label")
    )
    cb = _pq_codebook(spark, sf_dir)
    qemb = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qemb")
    )
    dtable = cb.crossJoin(F.broadcast(qemb)).select(
        "s",
        "code",
        F.floor(
            F.expr(
                f"aggregate(zip_with(slice(cast(qemb AS array<double>),"
                f" s * {PQ_SUB_DIM} + 1, {PQ_SUB_DIM}), cv,"
                f" (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
                f" * 1000000"
            )
        )
        .cast("bigint")
        .alias("dmic"),
    )
    probed_ids = emb.select("vec_id", "label").join(F.broadcast(probe), "label")
    codes = _pq_codes(spark, sf_dir)
    ranked = (
        codes.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(probed_ids.select("vec_id"), "vec_id", "left_semi")
        .join(
            F.broadcast(dtable),
            (codes["subspace"] == dtable["s"]) & (codes["code"] == dtable["code"]),
        )
        .groupBy("vec_id")
        .agg(F.sum("dmic").cast("bigint").alias("adc_dist_micro"))
        .orderBy("adc_dist_micro", "vec_id")
        .limit(TOP_K)
    )
    if with_dist:
        return ranked.select("vec_id", "adc_dist_micro")
    return ranked.select("vec_id")


@register(
    "sim_ivfpq_recall_at_k",
    _ivfpq_sql_body()
    + f"""
    , fullscore AS (
        SELECT e.vec_id,
               {_sql_dot('e.embedding', 'q.qv')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos_full
        FROM embeddings e, q WHERE e.vec_id <> {QUERY_VEC_ID}
    ),
    truth AS (
        SELECT vec_id FROM fullscore ORDER BY cos_full DESC, vec_id ASC LIMIT {TOP_K}
    ),
    cand AS (
        SELECT vec_id FROM ivfpq ORDER BY adc_dist_micro, vec_id LIMIT {TOP_K}
    )
    {_SQL_RECALL_TAIL}
    """,
    doc="IVF+PQ recall@k against the brute-force truth (both approximations stacked)",
)
def sim_ivfpq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the stacked approximation — cell routing misses
    (IVF) compound with quantization error (PQ), so this is the number a
    deployment actually serves at; comparing it to sim_ivf_recall_at_k
    and sim_pq_recall_at_k attributes the loss between the two stages."""
    truth = sim_bruteforce_topk(spark, sf_dir).select("vec_id")
    return _recall_report(truth, _ivfpq_candidates(spark, sf_dir))


@register(
    "dq_embedding_health",
    f"""
    WITH m AS (
        SELECT vec_id, embedding,
               len(embedding) AS dim,
               {_sql_dot('embedding', 'embedding')} AS sq
        FROM embeddings
    )
    SELECT count(*) AS n_vectors,
           CAST(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_wrong_dim,
           CAST(sum(CASE WHEN len(list_filter(embedding, x -> x IS NULL)) > 0
                          OR isnan(sq) OR NOT isfinite(sq)
                     THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nonfinite,
           CAST(sum(CASE WHEN sq = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_norm,
           round(min(sqrt(sq)), 6) AS min_norm,
           round(max(sqrt(sq)), 6) AS max_norm
    FROM m
    """,
    doc="embedding index health: dim/NaN/zero-norm audit + norm envelope",
)
def dq_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-index gate every vector pipeline runs: wrong-dimension,
    non-finite, and zero-norm vectors each break a different stage
    (zip_with misalignment, NaN-poisoned distances, division by zero in
    normalization), so they are counted separately (null elements are
    flagged explicitly — Spark's fold propagates element nulls where
    DuckDB's sum skips them, so the audit must not lean on either
    engine's null arithmetic); the norm envelope
    catches scale drift between embedding batches. One pipelined scan,
    one scalar aggregate — shuffle-free at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.expr(
        "aggregate(zip_with(embedding, embedding,"
        " (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    m = emb.select("embedding", F.size("embedding").alias("dim"), sq.alias("sq"))
    return m.agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.when(F.col("dim") != 64, 1).otherwise(0))
        .cast("bigint")
        .alias("n_wrong_dim"),
        F.sum(
            F.when(
                F.expr("exists(embedding, x -> x IS NULL)")
                | F.col("sq").isNull()
                | F.isnan("sq")
                | (F.col("sq") == F.expr("double('Infinity')"))
                | (F.col("sq") == F.expr("double('-Infinity')")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_nonfinite"),
        F.sum(F.when(F.col("sq") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_norm"),
        F.round(F.min(F.sqrt("sq")), 6).alias("min_norm"),
        F.round(F.max(F.sqrt("sq")), 6).alias("max_norm"),
    )
