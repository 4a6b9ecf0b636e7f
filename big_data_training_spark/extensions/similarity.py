"""Similarity search over an embedding column (``array<float>``).

* brute-force cosine top-k — the exact baseline: broadcast the query
  vector, one pipelined scan computing the dot product with higher-order
  array functions, TakeOrderedAndProject for the top-k. Linear, no
  shuffle, JVM-side.
* sign-LSH bucketed ANN — the scale path: a deterministic bucket key
  from coordinate signs restricts candidates to one bucket (random
  hyperplanes at 100 TB; fixed coordinate planes here so the oracle can
  replicate the bucketing).
* per-label centroids — the IVF building block (coarse quantizer =
  groupBy + element-wise mean).

All arithmetic is cast to double before aggregation on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

QUERY_VEC_ID = 0
TOP_K = 10
# Fixed "hyperplanes" for sign-LSH: coordinate axes, engine-portable.
LSH_DIMS = (0, 13, 27, 41, 55)

# cosine(a, b) with double accumulation, as a Spark SQL expression.
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0 as double), (acc, v) -> acc + v)"
)


def _cos_expr(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def _with_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Attach the L2 norm as a column. The pairwise blocked joins use
    cos = dot/(a.nrm*b.nrm): hoisting the two norms out of the per-PAIR
    expression computes them once per VECTOR instead of once per pair —
    the aggregate/zip_with lambdas are interpreted (no whole-stage
    codegen for HOFs), so per-pair work drops ~3x. sqrt over the same
    double accumulation order keeps the value bit-identical to the
    inline form (and the oracle)."""
    nrm = "sqrt(" + _DOT.format(a=col, b=col) + ")"
    return df.withColumn("nrm", F.expr(nrm))


_PAIR_COS = (
    "(" + _DOT.format(a="a.embedding", b="b.embedding") + ") / (a.nrm * b.nrm)"
)


def _sql_dot(a: str, b: str, n: int = 64) -> str:
    return (
        f"(SELECT sum(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))"
        f" FROM generate_series(1, {n}) AS g(i))"
    )


@register(
    "sim_bruteforce_topk",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    scored AS (
        SELECT e.vec_id, e.label,
               {_sql_dot('e.embedding', 'q.qv')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos
        FROM embeddings e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, round(cos, 6) AS cosine
    FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {TOP_K}
    """,
    doc="brute-force cosine top-k (exact ANN baseline)",
    bench=True,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast 1-row query vector, pipelined cosine scan, global top-k
    (TakeOrderedAndProject — per-partition heads merged on the driver)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .withColumn("cos", F.expr(_cos_expr("embedding", "qv")))
        .select("vec_id", "label", F.round("cos", 6).alias("cosine"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
    )


_SIGN_BITS = "".join(
    f" || CASE WHEN embedding[{d + 1}] >= 0 THEN '1' ELSE '0' END" for d in LSH_DIMS
)


@register(
    "sim_lsh_buckets",
    f"""
    SELECT ('' {_SIGN_BITS}) AS bucket,
           count(*) AS n_vectors, count(DISTINCT label) AS n_labels
    FROM embeddings GROUP BY 1
    """,
    doc="sign-LSH bucketing: hyperplane-sign key → bucket histogram",
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN index layout: 2^5 sign-pattern buckets; at scale the join
    for a query touches one bucket instead of the full corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.col("embedding").getItem(d) >= 0, "1").otherwise("0")
            for d in LSH_DIMS
        ]
    )
    return (
        emb.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_vectors"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


@register(
    "sim_lsh_ann_topk",
    f"""
    WITH keyed AS (
        SELECT *, ('' {_SIGN_BITS}) AS bucket FROM embeddings
    ), q AS (SELECT embedding AS qv, bucket AS qb FROM keyed WHERE vec_id = {QUERY_VEC_ID}),
    scored AS (
        SELECT e.vec_id, e.label,
               {_sql_dot('e.embedding', 'q.qv')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos
        FROM keyed e, q
        WHERE e.bucket = q.qb AND e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, round(cos, 6) AS cosine
    FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {TOP_K}
    """,
    doc="LSH-bucketed ANN top-k: candidates restricted to the query bucket",
)
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: equi-join on the sign-LSH bucket key prunes the
    candidate set (~1/2^5 of the corpus) before exact cosine rescoring."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.col("embedding").getItem(d) >= 0, "1").otherwise("0")
            for d in LSH_DIMS
        ]
    )
    keyed = emb.withColumn("bucket", bucket)
    q = keyed.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qb")
    )
    return (
        keyed.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .withColumn("cos", F.expr(_cos_expr("embedding", "qv")))
        .select("vec_id", "label", F.round("cos", 6).alias("cosine"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
    )


N_PROBE = 2

# Rounded decimal-exact centroids: identical on both engines, so probe
# ranking can't flip on float noise.
_SQL_CENTROIDS = """
    cent AS (
        SELECT label, list(c ORDER BY pos) AS cv
        FROM (
            SELECT label, i - 1 AS pos,
                   round(CAST(sum(CAST(embedding[i] AS DECIMAL(38,12))) AS DOUBLE)
                         / count(*), 6) AS c
            FROM embeddings, generate_series(1, 64) AS g(i)
            GROUP BY label, i
        ) GROUP BY label
    )
"""


def ivf_centroids(emb: DataFrame) -> DataFrame:
    """Per-label rounded decimal-exact centroid vectors (label, cv) —
    the coarse quantizer shared by the batch IVF query and the
    streaming serving path (streaming/serving.py)."""
    return (
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


# The nprobe cell-routing CTE — shared by the IVF query and its recall
# audit so the deployed IVF and the measured IVF can never diverge.
_SQL_IVF_PROBE = f"""\
    probe AS (
        SELECT cent.label,
               {_sql_dot('cent.cv', 'q.qv')} /
               (sqrt({_sql_dot('cent.cv', 'cent.cv')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS ccos
        FROM cent, q
        ORDER BY ccos DESC, cent.label ASC LIMIT {N_PROBE}
    ),"""


@register(
    "sim_ivf_topk",
    f"""
    WITH {_SQL_CENTROIDS},
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
{_SQL_IVF_PROBE}
    scored AS (
        SELECT e.vec_id, e.label,
               {_sql_dot('e.embedding', 'q.qv')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos
        FROM embeddings e, q
        WHERE e.label IN (SELECT label FROM probe)
          AND e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, round(cos, 6) AS cosine
    FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {TOP_K}
    """,
    doc="IVF ANN: coarse-quantizer centroids → probe top cells → exact rescore",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF scale path: per-cell centroids (label as the cell id — a
    trained k-means drops in the same slot), the query probes the
    N_PROBE nearest cells, exact cosine runs only inside those cells.
    At 100 TB the candidate scan touches nprobe/k of the corpus;
    centroids are rounded decimal-exact so cell routing is deterministic
    across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent = ivf_centroids(emb)
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
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probe), "label")
        .join(F.broadcast(q))
        .withColumn("cos", F.expr(_cos_expr("embedding", "qv")))
        .select("vec_id", "label", F.round("cos", 6).alias("cosine"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "emb_l2_normalize",
    f"""
    SELECT vec_id,
           round(CAST(sqrt({_sql_dot('embedding', 'embedding')}) AS DOUBLE), 6)
               AS norm,
           round(CAST(embedding[1] AS DOUBLE)
                 / sqrt({_sql_dot('embedding', 'embedding')}), 6) AS unit_dim0
    FROM embeddings
    """,
    doc="embedding L2 normalization (higher-order array arithmetic)",
)
def emb_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalize vectors so cosine reduces to a dot product —
    the standard pre-index transform; pure JVM array math (verified via
    the norm and the first unit coordinate)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.expr(f"sqrt({_DOT.format(a='embedding', b='embedding')})")
    return emb.select(
        "vec_id",
        F.round(norm, 6).alias("norm"),
        F.round(F.col("embedding").getItem(0).cast("double") / norm, 6).alias(
            "unit_dim0"
        ),
    )


@register(
    "emb_int8_quantize",
    """
    WITH scaled AS (
        SELECT vec_id, embedding,
               (SELECT max(abs(CAST(embedding[i] AS DOUBLE)))
                FROM generate_series(1, 64) AS g(i)) AS maxabs
        FROM embeddings
    )
    SELECT vec_id, round(maxabs, 6) AS scale_factor,
           CAST(round(CAST(embedding[1] AS DOUBLE) / maxabs * 127) AS INT) AS q0,
           CAST(round(CAST(embedding[64] AS DOUBLE) / maxabs * 127) AS INT) AS q63,
           (SELECT CAST(sum(abs(CAST(round(CAST(embedding[i] AS DOUBLE) / maxabs * 127) AS INT))) AS BIGINT)
            FROM generate_series(1, 64) AS g(i)) AS l1_quantized
    FROM scaled
    """,
    doc="embedding int8 quantization (4x storage cut for the 100 TB index)",
)
def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization with a per-vector scale — the storage
    layout an ANN index uses at scale (4 bytes → 1 byte per dim).
    Verified via the scale factor, two quantized coordinates, and the L1
    mass of the quantized vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    maxabs = F.expr(
        "aggregate(embedding, cast(0 as double),"
        " (m, x) -> greatest(m, abs(cast(x as double))))"
    )
    q = emb.withColumn("maxabs", maxabs)
    qexpr = "cast(round(cast(embedding[{i}] as double) / maxabs * 127) as int)"
    l1 = F.expr(
        "aggregate(embedding, cast(0 as bigint),"
        " (s, x) -> s + abs(cast(round(cast(x as double) / maxabs * 127) as bigint)))"
    )
    return q.select(
        "vec_id",
        F.round("maxabs", 6).alias("scale_factor"),
        F.expr(qexpr.format(i=0)).alias("q0"),
        F.expr(qexpr.format(i=63)).alias("q63"),
        l1.alias("l1_quantized"),
    )


NEARDUP_TAU = 0.2


@register(
    "dd_embedding_neardup",
    f"""
    WITH keyed AS (
        SELECT *, ('' {_SIGN_BITS}) AS bucket FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS vec_i, b.vec_id AS vec_j,
               {_sql_dot('a.embedding', 'b.embedding')} /
               (sqrt({_sql_dot('a.embedding', 'a.embedding')}) *
                sqrt({_sql_dot('b.embedding', 'b.embedding')})) AS cos
        FROM keyed a JOIN keyed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_i, vec_j, round(cos, 6) AS cosine
    FROM pairs WHERE cos >= {NEARDUP_TAU}
    """,
    doc="embedding-cosine near-dup pairs, sign-LSH bucket-blocked",
    bench=True,
)
def dd_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection in embedding space: candidates blocked by
    the sign-LSH bucket (the all-pairs cross product never materializes),
    exact cosine within buckets. The dedup analog of sim_lsh_ann_topk."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.col("embedding").getItem(d) >= 0, "1").otherwise("0")
            for d in LSH_DIMS
        ]
    )
    keyed = _with_norm(
        emb.withColumn("bucket", bucket).select("vec_id", "bucket", "embedding")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_i"),
        F.col("b.vec_id").alias("vec_j"),
        F.expr(_PAIR_COS).alias("cos"),
    )
    return (
        pairs.filter(F.col("cos") >= NEARDUP_TAU)
        .select("vec_i", "vec_j", F.round("cos", 6).alias("cosine"))
    )


@register(
    "sim_label_centroids",
    """
    SELECT label, i - 1 AS pos,
           round(CAST(sum(CAST(embedding[i] AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 6) AS centroid,
           count(*) AS n
    FROM embeddings, generate_series(1, 64) AS g(i)
    GROUP BY label, i
    """,
    doc="per-label centroids (IVF coarse-quantizer building block)",
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean per label via posexplode + grouped avg — the
    shuffle keys on (label, pos), 64×|labels| cells regardless of corpus
    size."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "v")
        )
        .groupBy("label", F.col("pos").cast("bigint").alias("pos"))
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count("*"),
                6,
            ).alias("centroid"),
            F.count("*").alias("n"),
        )
    )


N_QUERIES_KNN = 5
KNN_K = 3


@register(
    "sim_knn_join",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < {N_QUERIES_KNN}),
    corpus AS (SELECT vec_id, label, embedding FROM embeddings
               WHERE vec_id >= {N_QUERIES_KNN}),
    scored AS (
        SELECT q.query_id, c.vec_id, c.label,
               {_sql_dot('c.embedding', 'q.qv')} /
               (sqrt({_sql_dot('c.embedding', 'c.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos
        FROM corpus c, q
    ), ranked AS (
        SELECT query_id, vec_id, label, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, vec_id ASC) AS rk
        FROM scored
    )
    SELECT query_id, vec_id, label, round(cos, 6) AS cosine
    FROM ranked WHERE rk <= {KNN_K}
    """,
    doc="k-NN join: per-query top-k cosine neighbors (batched exact kNN)",
    bench=True,
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact k-NN: broadcast the (small) query batch against the
    corpus scan — a nested-loop scored product with NO shuffle of the
    corpus — then per-query top-k via row_number (WindowGroupLimit
    prunes to k rows per query before the final exchange). This is the
    reranking primitive: at 100 TB the IVF/LSH variants shrink the
    candidate product, and this same plan shape scores the survivors.
    Ranking compares raw doubles (bit-identical in both engines);
    rounding happens only at output."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES_KNN).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES_KNN)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        corpus.join(F.broadcast(q))
        .withColumn("cos", F.expr(_cos_expr("embedding", "qv")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KNN_K)
        .select("query_id", "vec_id", "label", F.round("cos", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# K-means (one Lloyd round) over the embedding corpus: the semantic-
# clustering primitive behind topic bucketing / semantic dedup of
# training data, and the trainer for the IVF coarse quantizer above.
# Determinism contract: initial centroids are decimal-exact means of the
# vec_id % k seed groups rounded to 6 dp (exact doubles in any engine);
# distances to those rounded centroids are rounded to 6 dp before the
# argmin, ties broken by cluster id — so the assignment is reproducible
# bit-for-bit against the SQL oracle even though it is float math.
# Scale shape: k×64 centroids broadcast to every executor; the corpus is
# scanned once and never shuffles for assignment (the groupBy(vec_id)
# argmin folds 8 candidate rows per vector); the update step shuffles
# (cluster, pos) cells — k·64 groups regardless of corpus size.
# ---------------------------------------------------------------------------

KMEANS_K = 8
EMB_DIM = 64

_SQL_KMEANS_CENT_CTE = f"""
    WITH init AS (
        SELECT vec_id % {KMEANS_K} AS cluster, i - 1 AS pos,
               round(CAST(sum(CAST(embedding[i] AS DECIMAL(38,12))) AS DOUBLE)
                     / count(*), 6) AS c
        FROM embeddings, generate_series(1, {EMB_DIM}) AS g(i)
        GROUP BY 1, 2
    ), cent AS (
        SELECT cluster, list(c ORDER BY pos) AS cv FROM init GROUP BY 1
    ), scored AS (
        SELECT e.vec_id, c.cluster,
               round((SELECT sum((CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) *
                                 (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]))
                      FROM generate_series(1, {EMB_DIM}) AS g(i)), 6) AS d
        FROM embeddings e, cent c
    ), assigned AS (
        SELECT vec_id, cluster, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rk
        FROM scored
    )
"""


def _kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed centroids: decimal-exact elementwise mean per vec_id % k."""
    emb = load_table(spark, sf_dir, "embeddings")
    init = (
        emb.select(
            (F.col("vec_id") % KMEANS_K).alias("cluster"),
            F.posexplode("embedding").alias("pos", "v"),
        )
        .groupBy("cluster", "pos")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count("*"),
                6,
            ).alias("c")
        )
    )
    return init.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cv")
    )


def _kmeans_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent = _kmeans_centroids(spark, sf_dir)
    sqdist = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("cv"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cluster", F.round(sqdist, 6).alias("d")
    )
    best = (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("d", "cluster")).alias("m"))
        .select("vec_id", F.col("m.cluster").alias("cluster"), F.col("m.d").alias("dist"))
    )
    return best


@register(
    "sim_kmeans_assign",
    _SQL_KMEANS_CENT_CTE
    + """
    SELECT vec_id, cluster, d AS dist FROM assigned WHERE rk = 1
    """,
    doc="k-means Lloyd assignment: nearest of k broadcast centroids",
)
def sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment step: k×dim centroids broadcast, corpus scanned once,
    argmin folded in a tiny groupBy(vec_id) over k candidate rows."""
    return _kmeans_assignment(spark, sf_dir)


@register(
    "sim_kmeans_update",
    _SQL_KMEANS_CENT_CTE
    + f"""
    SELECT a.cluster, i - 1 AS pos,
           round(CAST(sum(CAST(e.embedding[i] AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 6) AS centroid,
           count(*) AS n
    FROM assigned a
    JOIN embeddings e USING (vec_id), generate_series(1, {EMB_DIM}) AS g(i)
    WHERE a.rk = 1
    GROUP BY 1, 2
    """,
    doc="k-means Lloyd update: decimal-exact recentering from assignment",
)
def sim_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update step: new centroids from the fresh assignment. The shuffle
    carries (cluster, pos) cells — k·dim groups, corpus-size-free."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = _kmeans_assignment(spark, sf_dir).select("vec_id", "cluster")
    return (
        emb.join(assigned, "vec_id")
        .select("cluster", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cluster", F.col("pos").cast("bigint").alias("pos"))
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count("*"),
                6,
            ).alias("centroid"),
            F.count("*").alias("n"),
        )
    )


@register(
    "dd_semantic_neardup_kmeans",
    _SQL_KMEANS_CENT_CTE
    + f"""
    , blocked AS (
        SELECT vec_id, cluster FROM assigned WHERE rk = 1
    ), p AS (
        SELECT a.vec_id AS vec_i, b.vec_id AS vec_j,
               {_sql_dot('ea.embedding', 'eb.embedding')} /
               (sqrt({_sql_dot('ea.embedding', 'ea.embedding')}) *
                sqrt({_sql_dot('eb.embedding', 'eb.embedding')})) AS cos
        FROM blocked a
        JOIN blocked b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
    )
    SELECT vec_i, vec_j, round(cos, 6) AS cosine
    FROM p WHERE cos >= {NEARDUP_TAU}
    """,
    doc="semantic near-dup pairs blocked by k-means cell (IVF-style dedup)",
    bench=True,
)
def dd_semantic_neardup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third blocking strategy for embedding near-dup, alongside
    sign-LSH buckets and MinHash text shingles: candidates pair only
    within their k-means cell (the IVF idea applied to dedup), so the
    pairwise cosine work is sum of squared cell sizes, not corpus².
    Cells with semantic structure beat random sign-planes on recall at
    the same candidate budget; run both and union for the production
    droplist."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = _kmeans_assignment(spark, sf_dir).select("vec_id", "cluster")
    keyed = _with_norm(
        assigned.join(emb.select("vec_id", "embedding"), "vec_id")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_i"),
        F.col("b.vec_id").alias("vec_j"),
        F.expr(_PAIR_COS).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= NEARDUP_TAU).select(
        "vec_i", "vec_j", F.round("cos", 6).alias("cosine")
    )


_SQL_KMEANS_ROUND2_CTE = (
    _SQL_KMEANS_CENT_CTE
    + f"""
    , upd AS (
        SELECT a.cluster, i - 1 AS pos,
               round(CAST(sum(CAST(e.embedding[i] AS DECIMAL(38,12))) AS DOUBLE)
                     / count(*), 6) AS c
        FROM assigned a
        JOIN embeddings e USING (vec_id), generate_series(1, {EMB_DIM}) AS g(i)
        WHERE a.rk = 1
        GROUP BY 1, 2
    ), cent2 AS (
        SELECT cluster, list(c ORDER BY pos) AS cv FROM upd GROUP BY 1
    ), scored2 AS (
        SELECT e.vec_id, c.cluster,
               round((SELECT sum((CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) *
                                 (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]))
                      FROM generate_series(1, {EMB_DIM}) AS g(i)), 6) AS d
        FROM embeddings e, cent2 c
    ), assigned2 AS (
        SELECT vec_id, cluster, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rk
        FROM scored2
    )
"""
)


@register(
    "sim_kmeans_round2",
    _SQL_KMEANS_ROUND2_CTE
    + """
    SELECT vec_id, cluster, d AS dist FROM assigned2 WHERE rk = 1
    """,
    doc="k-means second Lloyd round: re-assignment against updated centroids",
)
def sim_kmeans_round2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full iterate-until-converged shape, value-exact for two
    rounds: centroids recenter from round 1's assignment (decimal-exact,
    rounded), then every vector re-assigns against the new cells. Same
    per-round cost profile as round 1 — broadcast centroids, one corpus
    scan, k-row argmin fold — so N rounds cost N linear scans, never
    anything quadratic."""
    emb = load_table(spark, sf_dir, "embeddings")
    upd = sim_kmeans_update(spark, sf_dir)
    cent2 = upd.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "centroid"))),
            lambda s: s["centroid"],
        ).alias("cv")
    )
    sqdist = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("cv"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.crossJoin(F.broadcast(cent2)).select(
        "vec_id", "cluster", F.round(sqdist, 6).alias("d")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("d", "cluster")).alias("m"))
        .select(
            "vec_id", F.col("m.cluster").alias("cluster"), F.col("m.d").alias("dist")
        )
    )


RADIUS_TAU = 0.3


@register(
    "sim_radius_search",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    scored AS (
        SELECT e.vec_id, e.label,
               {_sql_dot('e.embedding', 'q.qv')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos
        FROM embeddings e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, round(cos, 6) AS cosine
    FROM scored WHERE cos >= {RADIUS_TAU}
    """,
    doc="radius (range) similarity search: all vectors within cosine >= tau",
)
def sim_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other ANN query shape: instead of top-k, return *everything*
    within a similarity radius (duplicate sweeps, recall-oriented
    retrieval). Same broadcast-query + linear-scan plan as the top-k
    baseline but with a selective filter instead of
    TakeOrderedAndProject — result size is data-dependent, so at scale
    the IVF/LSH cell routing above prunes the scan the same way."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") != QUERY_VEC_ID)
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        F.expr(_cos_expr("embedding", "qv")).alias("cos"),
    )
    return scored.filter(F.col("cos") >= RADIUS_TAU).select(
        "vec_id", "label", F.round("cos", 6).alias("cosine")
    )


@register(
    "sim_kmeans_label_confusion",
    _SQL_KMEANS_CENT_CTE
    + """
    SELECT a.cluster, e.label, count(*) AS n
    FROM assigned a JOIN embeddings e USING (vec_id)
    WHERE a.rk = 1
    GROUP BY 1, 2
    """,
    doc="cluster-vs-label confusion matrix (unsupervised quality check)",
)
def sim_kmeans_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How well unsupervised cells recover the labeled structure: the
    (cluster, label) contingency table — the evaluation step after any
    clustering run, and the input to purity/NMI scores. One shuffle
    equi-join on vec_id (both sides corpus-sized); only the k×|labels|
    aggregate output is small."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    assigned = _kmeans_assignment(spark, sf_dir).select("vec_id", "cluster")
    return (
        emb.join(assigned, "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count("*").alias("n"))
    )


@register(
    "sim_ivf_recall_at_k",
    f"""
    WITH {_SQL_CENTROIDS},
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    probe AS (
        SELECT cent.label,
               {_sql_dot('cent.cv', 'q.qv')} /
               (sqrt({_sql_dot('cent.cv', 'cent.cv')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS ccos
        FROM cent, q
        ORDER BY ccos DESC, cent.label ASC LIMIT {N_PROBE}
    ),
    all_scored AS (
        SELECT e.vec_id, e.label,
               {_sql_dot('e.embedding', 'q.qv')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos
        FROM embeddings e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
    ),
    truth AS (
        SELECT vec_id FROM all_scored
        ORDER BY cos DESC, vec_id ASC LIMIT {TOP_K}
    ),
    ivf AS (
        SELECT vec_id FROM all_scored
        WHERE label IN (SELECT label FROM probe)
        ORDER BY cos DESC, vec_id ASC LIMIT {TOP_K}
    )
    SELECT (SELECT count(*) FROM truth) AS k,
           (SELECT count(*) FROM truth t JOIN ivf i USING (vec_id))
               AS n_recalled,
           CAST((SELECT count(*) FROM truth t JOIN ivf i USING (vec_id)) * 1000
                // greatest((SELECT count(*) FROM truth), 1)
                AS BIGINT) AS recall_permille
    """,
    doc="ANN quality: IVF top-k recall against the brute-force truth",
)
def sim_ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k for the IVF path — the number every ANN deployment
    monitors when tuning nprobe. Ground truth is the brute-force top-k
    (runnable at audit scale, sampled in production); the IVF candidate
    set only sees the probed cells, so missing neighbors in unprobed
    cells are exactly what this measures."""
    truth = sim_bruteforce_topk(spark, sf_dir).select("vec_id").localCheckpoint(
        eager=False
    )
    ivf = sim_ivf_topk(spark, sf_dir).select("vec_id").localCheckpoint(eager=False)
    recalled = truth.join(ivf, "vec_id", "left_semi")
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


SWEEP_TAUS_PERMILLE = (200, 300, 400, 500, 600)


@register(
    "sim_threshold_sweep",
    f"""
    WITH keyed AS (
        SELECT *, ('' {_SIGN_BITS}) AS bucket FROM embeddings
    ), pairs AS (
        SELECT {_sql_dot('a.embedding', 'b.embedding')} /
               (sqrt({_sql_dot('a.embedding', 'a.embedding')}) *
                sqrt({_sql_dot('b.embedding', 'b.embedding')})) AS cos
        FROM keyed a JOIN keyed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT t AS threshold_permille,
           CAST(sum(CASE WHEN cos >= t / 1000.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs
    FROM pairs, (VALUES {", ".join(f"({t})" for t in SWEEP_TAUS_PERMILLE)})
                AS ts(t)
    GROUP BY t
    """,
    doc="embedding dedup tuning: near-dup pair count per cosine threshold"
    " over the sign-LSH blocked candidates",
)
def sim_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggressiveness curve for embedding near-dup removal: how many
    candidate pairs each cosine threshold would merge. Candidates come
    from the same sign-LSH blocking as dd_embedding_neardup (the
    all-pairs product never materializes), each pair's exact cosine is
    computed ONCE, and the threshold list multiplies pair rows, not
    corpus rows — so sweeping 5 thresholds costs the same single
    blocked pass as checking one. This is the table you read before
    committing a dedup threshold on the full corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.col("embedding").getItem(d) >= 0, "1").otherwise("0")
            for d in LSH_DIMS
        ]
    )
    keyed = _with_norm(
        emb.withColumn("bucket", bucket).select("vec_id", "bucket", "embedding")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(F.expr(_PAIR_COS).alias("cos"))
    ts = F.explode(
        F.array(*[F.lit(t) for t in SWEEP_TAUS_PERMILLE])
    ).alias("t")
    return (
        pairs.select("cos", ts)
        .groupBy(F.col("t").alias("threshold_permille"))
        .agg(
            F.sum(
                F.when(F.col("cos") >= F.col("t") / 1000.0, 1).otherwise(0)
            ).alias("n_pairs")
        )
    )


@register(
    "sim_kmeans_centroid_drift",
    _SQL_KMEANS_CENT_CTE
    + f"""
    , upd AS (
        SELECT a.cluster, i - 1 AS pos,
               round(CAST(sum(CAST(e.embedding[i] AS DECIMAL(38,12))) AS DOUBLE)
                     / count(*), 6) AS c_new,
               count(*) AS n
        FROM assigned a
        JOIN embeddings e USING (vec_id), generate_series(1, {EMB_DIM}) AS g(i)
        WHERE a.rk = 1
        GROUP BY 1, 2
    )
    SELECT u.cluster AS cluster,
           max(u.n) AS n,
           CAST(sum((CAST(round(u.c_new * 1000000) AS BIGINT)
                     - CAST(round(i.c * 1000000) AS BIGINT))
                    * (CAST(round(u.c_new * 1000000) AS BIGINT)
                       - CAST(round(i.c * 1000000) AS BIGINT))) AS BIGINT)
               AS drift_e12
    FROM upd u JOIN init i ON i.cluster = u.cluster AND i.pos = u.pos
    GROUP BY 1
    """,
    doc="k-means convergence audit: per-cluster squared centroid movement"
    " of the Lloyd update, in exact micro-unit integers",
)
def sim_kmeans_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stopping criterion for the IVF trainer's Lloyd loop: how far
    each centroid moved in the last update, as the squared L2 distance
    in micro-units (both centroid tables are round-6 doubles, so
    micro-unit deltas are exact integers and the sum is associative —
    no float-summation-order hazard between engines, the same
    fixed-point trick as the PageRank convergence audit). Movement
    below threshold for every cluster = training converged. Cost: the
    two centroid tables are k x dim cells; the audit join and aggregate
    never touch the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    init = (
        emb.select(
            (F.col("vec_id") % KMEANS_K).alias("cluster"),
            F.posexplode("embedding").alias("pos", "v"),
        )
        .groupBy("cluster", "pos")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count("*"),
                6,
            ).alias("c")
        )
    )
    assigned = _kmeans_assignment(spark, sf_dir).select("vec_id", "cluster")
    upd = (
        emb.join(assigned, "vec_id")
        .select("cluster", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count("*"),
                6,
            ).alias("c_new"),
            F.count("*").alias("n"),
        )
    )
    dm = F.round(F.col("c_new") * 1000000, 0).cast("bigint") - F.round(
        F.col("c") * 1000000, 0
    ).cast("bigint")
    return (
        upd.join(init, ["cluster", "pos"])
        .select(F.col("cluster").cast("bigint").alias("cluster"), "n", dm.alias("dm"))
        .groupBy("cluster")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("dm") * F.col("dm")).alias("drift_e12"),
        )
    )


SEMDEDUP_TAU = 0.5


@register(
    "dd_semdedup_prune_rate",
    _SQL_KMEANS_CENT_CTE
    + f"""
    , upd AS (
        SELECT a.cluster, i - 1 AS pos,
               round(CAST(sum(CAST(e.embedding[i] AS DECIMAL(38,12))) AS DOUBLE)
                     / count(*), 6) AS c_new
        FROM assigned a
        JOIN embeddings e USING (vec_id), generate_series(1, {EMB_DIM}) AS g(i)
        WHERE a.rk = 1
        GROUP BY 1, 2
    ), cent2 AS (
        SELECT cluster, list(c_new ORDER BY pos) AS cv FROM upd GROUP BY 1
    ), coscore AS (
        SELECT a.cluster, a.vec_id,
               round((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * c.cv[i])
                      FROM generate_series(1, {EMB_DIM}) AS g(i)) /
                     (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                      sqrt((SELECT sum(c.cv[i] * c.cv[i])
                            FROM generate_series(1, {EMB_DIM}) AS g(i)))), 6)
                   AS cos_c
        FROM assigned a
        JOIN embeddings e USING (vec_id)
        JOIN cent2 c ON c.cluster = a.cluster
        WHERE a.rk = 1
    )
    SELECT cluster, count(*) AS n_vectors,
           CAST(sum(CASE WHEN cos_c >= {SEMDEDUP_TAU} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_prunable,
           CAST(sum(CASE WHEN cos_c >= {SEMDEDUP_TAU} THEN 1 ELSE 0 END)
                * 1000 // count(*) AS BIGINT) AS prune_permille
    FROM coscore GROUP BY 1
    """,
    doc="SemDeDup-style screening: per k-means cell, how many vectors sit"
    " within the cosine-typicality threshold of their centroid",
)
def dd_semdedup_prune_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup capacity planning: vectors very close to their
    cluster centroid are the 'typical' redundant mass SemDeDup removes
    first; this audit counts them per cell before any pairwise pass
    runs, so you can size (or skip) the expensive within-cell pair scan.
    Cost shape: centroids are k x dim cells (corpus-size-free shuffle),
    the cosine-to-centroid scan is one broadcast join over the corpus —
    no pairs anywhere, which is the point: the pairwise SemDeDup pass
    (dd_semantic_neardup_kmeans) only runs where this report says the
    mass is."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = _kmeans_assignment(spark, sf_dir).select("vec_id", "cluster")
    upd = (
        emb.join(assigned, "vec_id")
        .select("cluster", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count("*"),
                6,
            ).alias("c_new")
        )
    )
    cent2 = upd.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c_new"))), lambda s: s["c_new"]
        ).alias("cv")
    )
    dot_ec = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("cv"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_e = F.sqrt(
        F.aggregate(
            F.transform(
                F.col("embedding").cast("array<double>"), lambda x: x * x
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    norm_c = F.sqrt(
        F.aggregate(
            F.transform(F.col("cv"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    coscore = (
        emb.join(assigned, "vec_id")
        .join(F.broadcast(cent2), "cluster")
        .select(
            F.col("cluster").cast("bigint").alias("cluster"),
            F.round(dot_ec / (norm_e * norm_c), 6).alias("cos_c"),
        )
    )
    return coscore.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.when(F.col("cos_c") >= SEMDEDUP_TAU, 1).otherwise(0)).alias(
            "n_prunable"
        ),
        F.floor(
            F.sum(F.when(F.col("cos_c") >= SEMDEDUP_TAU, 1).otherwise(0))
            * 1000
            / F.count("*")
        ).alias("prune_permille"),
    )
