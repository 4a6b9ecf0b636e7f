"""IVF tuning sweep: recall@k and candidate-scan cost as a function of
nprobe, in one pass.

sim_ivf_recall_at_k certifies recall at the deployed N_PROBE; the
question an operator actually asks when tuning a 100 TB ANN deployment
is *the curve* — "how much recall does each extra probed cell buy, and
at what scan cost?". This query produces that curve in a single job:
every vector is cosine-scored once, cells are ranked once, and each
sweep point is a partition of one window function — no per-nprobe
re-scan. All building blocks are the certified ones from
extensions/similarity.py (same centroid CTE, same dot/cosine
expressions), so the sweep can never diverge from the deployed path.

Scale note: at audit scale the full scoring pass doubles as the truth
set; at 100 TB you run the identical plan over a sampled query panel
(sm_bottomk_sample) with the truth from sim_bruteforce_topk on that
panel — the sweep's cost is then nprobe-independent (one corpus scan),
which is exactly why it is shaped as score-once + windowed ranking
instead of one IVF query per nprobe value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.similarity import (
    _SQL_CENTROIDS,
    QUERY_VEC_ID,
    TOP_K,
    _cos_expr,
    _sql_dot,
    ivf_centroids,
)
from big_data_training_spark.registry import register

SWEEP_NPROBES = (1, 2, 4, 8)

_SQL_SWEEP = f"""
    WITH {_SQL_CENTROIDS},
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    cellrank AS (
        SELECT label,
               row_number() OVER (ORDER BY ccos DESC, label ASC) AS cell_rank
        FROM (
            SELECT cent.label,
                   {_sql_dot('cent.cv', 'q.qv')} /
                   (sqrt({_sql_dot('cent.cv', 'cent.cv')}) *
                    sqrt({_sql_dot('q.qv', 'q.qv')})) AS ccos
            FROM cent, q
        )
    ),
    scored AS (
        SELECT e.vec_id, e.label,
               {_sql_dot('e.embedding', 'q.qv')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos
        FROM embeddings e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
    ),
    truth AS (
        SELECT vec_id FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {TOP_K}
    ),
    sweep AS (
        SELECT CAST(unnest([{', '.join(map(str, SWEEP_NPROBES))}]) AS BIGINT)
               AS nprobe
    ),
    ranked AS (
        SELECT w.nprobe, s.vec_id,
               row_number() OVER (
                   PARTITION BY w.nprobe ORDER BY s.cos DESC, s.vec_id ASC
               ) AS rk
        FROM sweep w, scored s JOIN cellrank c ON s.label = c.label
        WHERE c.cell_rank <= w.nprobe
    )
    SELECT r.nprobe,
           count(*) AS n_candidates,
           count(*) FILTER (
               WHERE r.rk <= {TOP_K} AND t.vec_id IS NOT NULL
           ) AS hits_at_k,
           (1000 * count(*) FILTER (
               WHERE r.rk <= {TOP_K} AND t.vec_id IS NOT NULL
           )) // {TOP_K} AS recall_permille
    FROM ranked r LEFT JOIN truth t ON r.vec_id = t.vec_id
    GROUP BY 1
"""


@register(
    "sim_nprobe_recall_sweep",
    _SQL_SWEEP,
    doc=f"IVF tuning curve: recall@{TOP_K} and candidate count at"
    f" nprobe in {SWEEP_NPROBES}, one scoring pass + windowed ranking",
    bench=True,
)
def sim_nprobe_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe-vs-recall tuning table. Vectors are scored against the
    query once; each sweep point replays as a window partition (rank
    within the cells whose rank <= nprobe), so adding sweep points costs
    a row-replication factor, never another corpus scan. Candidate count
    is the scan-cost axis of the curve; recall is permille against the
    brute-force truth top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    cellrank = (
        ivf_centroids(emb)
        .join(F.broadcast(q))
        .withColumn("ccos", F.expr(_cos_expr("cv", "qv")))
        .withColumn(
            "cell_rank",
            F.row_number().over(Window.orderBy(F.desc("ccos"), F.asc("label"))),
        )
        .select("label", "cell_rank")
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", "label", F.expr(_cos_expr("embedding", "qv")).alias("cos"))
    )
    truth = (
        scored.orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.lit(True).alias("is_truth"))
    )
    sweep = spark.range(1).select(
        F.explode(F.array(*[F.lit(p).cast("long") for p in SWEEP_NPROBES])).alias(
            "nprobe"
        )
    )
    ranked = (
        scored.join(F.broadcast(cellrank), "label")
        .crossJoin(F.broadcast(sweep))
        .filter(F.col("cell_rank") <= F.col("nprobe"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("nprobe").orderBy(F.desc("cos"), F.asc("vec_id"))
            ),
        )
    )
    hit = (F.col("rk") <= TOP_K) & F.col("is_truth").isNotNull()
    return (
        ranked.join(F.broadcast(truth), "vec_id", "left")
        .groupBy("nprobe")
        .agg(
            F.count("*").alias("n_candidates"),
            F.count(F.when(hit, True)).alias("hits_at_k"),
            F.expr(f"(1000 * count(CASE WHEN rk <= {TOP_K} AND is_truth IS NOT NULL"
                   f" THEN 1 END)) div {TOP_K}").alias("recall_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-probe LSH: recall bought by probing Hamming-adjacent buckets.
# ---------------------------------------------------------------------------

from big_data_training_spark.extensions.similarity import (  # noqa: E402
    LSH_DIMS,
    _SIGN_BITS,
)

PROBE_LEVELS = (0, 1)  # Hamming radius of the probed bucket set

_N_BITS = len(LSH_DIMS)
_SQL_HAM = " + ".join(
    f"(CASE WHEN substr(e.bucket, {i + 1}, 1) <> substr(q.qb, {i + 1}, 1)"
    " THEN 1 ELSE 0 END)"
    for i in range(_N_BITS)
)

_SQL_MULTIPROBE = f"""
    WITH keyed AS (
        SELECT *, ('' {_SIGN_BITS}) AS bucket FROM embeddings
    ),
    q AS (
        SELECT embedding AS qv, bucket AS qb FROM keyed
        WHERE vec_id = {QUERY_VEC_ID}
    ),
    scored AS (
        SELECT e.vec_id, ({_SQL_HAM}) AS ham,
               {_sql_dot('e.embedding', 'q.qv')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos
        FROM keyed e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
    ),
    truth AS (
        SELECT vec_id FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {TOP_K}
    ),
    lv AS (SELECT unnest([{', '.join(map(str, PROBE_LEVELS))}]) AS level),
    ranked AS (
        SELECT lv.level, s.vec_id,
               row_number() OVER (
                   PARTITION BY lv.level ORDER BY s.cos DESC, s.vec_id ASC
               ) AS rk
        FROM lv, scored s WHERE s.ham <= lv.level
    )
    SELECT CAST(r.level AS BIGINT) AS probe_level,
           CAST(1 + {_N_BITS} * r.level AS BIGINT) AS n_buckets_probed,
           count(*) AS n_candidates,
           CAST((1000 * count(*) FILTER (
               WHERE r.rk <= {TOP_K} AND t.vec_id IS NOT NULL
           )) // {TOP_K} AS BIGINT) AS recall_permille
    FROM ranked r LEFT JOIN truth t ON t.vec_id = r.vec_id
    GROUP BY r.level
"""


@register(
    "sim_lsh_multiprobe",
    _SQL_MULTIPROBE,
    doc="multi-probe LSH: candidate count and recall@10 at Hamming probe"
    f" radius {PROBE_LEVELS} over the sign-LSH buckets — the classic"
    " recall-vs-scan trade of probing adjacent buckets",
)
def sim_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH (Lv et al., VLDB'07, public): instead of more
    hash tables, probe the buckets Hamming-adjacent to the query's —
    radius 1 probes 1+5 of the 32 sign buckets and typically recovers
    most of the recall a second table would buy, at ~6/32 of the scan.
    Shaped like the nprobe sweep: every vector's bucket distance and
    cosine are computed in ONE pass, each radius is a window partition,
    so adding radii costs row replication, never another corpus scan.
    At serving scale the WHERE ham <= r becomes an IN-list equi-join on
    the 1+5r precomputed probe keys — the audit here measures what that
    buys."""
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
    ham = " + ".join(
        f"(CASE WHEN substr(bucket, {i + 1}, 1) <> substr(qb, {i + 1}, 1)"
        " THEN 1 ELSE 0 END)"
        for i in range(_N_BITS)
    )
    scored = (
        keyed.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            F.expr(ham).alias("ham"),
            F.expr(_cos_expr("embedding", "qv")).alias("cos"),
        )
    )
    truth = (
        scored.orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.lit(True).alias("is_truth"))
    )
    lv = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(p).cast("long") for p in PROBE_LEVELS])
        ).alias("level")
    )
    ranked = (
        scored.crossJoin(F.broadcast(lv))
        .filter(F.col("ham") <= F.col("level"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("level").orderBy(F.desc("cos"), F.asc("vec_id"))
            ),
        )
    )
    return (
        ranked.join(F.broadcast(truth), "vec_id", "left")
        .groupBy(F.col("level").cast("bigint").alias("probe_level"))
        .agg(
            F.expr(f"cast(1 + {_N_BITS} * first(level) as bigint)").alias(
                "n_buckets_probed"
            ),
            F.count("*").alias("n_candidates"),
            F.expr(
                f"cast((1000 * count(CASE WHEN rk <= {TOP_K} AND is_truth"
                f" IS NOT NULL THEN 1 END)) div {TOP_K} as bigint)"
            ).alias("recall_permille"),
        )
    )
