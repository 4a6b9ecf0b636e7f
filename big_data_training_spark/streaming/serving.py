"""Online ANN serving: a stream of query vectors answered against the
static IVF index (stream-static serving — the production shape of
similarity search).

The index side — decimal-exact cell centroids and the cell-routed
corpus — is built ONCE and broadcast into every micro-batch; each batch
routes its queries to the N_PROBE nearest cells, rescans only those
cells exactly, and emits per-query top-k. The oracle is the same
multi-query IVF in closed form, so what is verified is that per-batch
serving over any partitioning of the query stream equals the one-shot
batch answer (serving is stateless per query — the strongest possible
replay guarantee).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.similarity import (
    N_PROBE,
    TOP_K,
    _cos_expr,
    _sql_dot,
    _SQL_CENTROIDS,
    ivf_centroids,
)
from big_data_training_spark.registry import register
from big_data_training_spark.streaming.incremental import (
    _run_foreach_batch,
    _write_id_segments,
)
from big_data_training_spark.streaming.replay import (
    cleanup_scratch,
    materialize,
    scratch_dir,
)

N_QUERIES = 8  # vec_id < 8 are the streamed queries


@register(
    "st_ivf_serving_stream",
    f"""
    WITH {_SQL_CENTROIDS},
    q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id < {N_QUERIES}),
    routed AS (
        SELECT q.qid, q.qv, cent.label,
               row_number() OVER (
                   PARTITION BY q.qid
                   ORDER BY {_sql_dot('cent.cv', 'q.qv')} /
                            (sqrt({_sql_dot('cent.cv', 'cent.cv')}) *
                             sqrt({_sql_dot('q.qv', 'q.qv')})) DESC,
                            cent.label ASC) AS prn
        FROM cent, q
    ),
    scored AS (
        SELECT r.qid, e.vec_id, e.label,
               {_sql_dot('e.embedding', 'r.qv')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('r.qv', 'r.qv')})) AS cos,
               row_number() OVER (
                   PARTITION BY r.qid
                   ORDER BY {_sql_dot('e.embedding', 'r.qv')} /
                            (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                             sqrt({_sql_dot('r.qv', 'r.qv')})) DESC,
                            e.vec_id ASC) AS rn
        FROM embeddings e
        JOIN (SELECT * FROM routed WHERE prn <= {N_PROBE}) r
          ON e.label = r.label AND e.vec_id <> r.qid
    )
    SELECT qid, vec_id, label, round(cos, 6) AS cosine
    FROM scored WHERE rn <= {TOP_K}
    """,
    doc="online ANN serving: streamed query vectors routed through the"
    " static IVF index per micro-batch; equals one-shot batch serving",
    bench=True,
)
def st_ivf_serving_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queries stream in (4 micro-batches); the IVF index — centroids
    plus cell-routed corpus — is built once, checkpointed, and closed
    over by foreachBatch. Per batch: broadcast the (tiny) query set,
    route each query to its N_PROBE nearest cells, exact-rescore only
    inside those cells, per-query top-k appended to the sink. Serving
    is stateless per query, so ANY segmentation of the stream equals
    the batch answer — the oracle says exactly that. At 100 TB the
    corpus side stays partitioned by cell and each batch touches
    nprobe/k of it; only queries and results move."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "label", "embedding").localCheckpoint(eager=True)
    cent = ivf_centroids(corpus).localCheckpoint(eager=True)

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    topic = _write_id_segments(spark, queries, "qid", "bdts_serve_topic_")
    out_dir = scratch_dir("bdts_serve_out_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        routed = (
            cent.join(F.broadcast(batch_df))
            .withColumn("ccos", F.expr(_cos_expr("cv", "qv")))
            .withColumn(
                "prn",
                F.row_number().over(
                    Window.partitionBy("qid").orderBy(
                        F.desc("ccos"), F.asc("label")
                    )
                ),
            )
            .filter(F.col("prn") <= N_PROBE)
            .select("qid", "qv", "label")
        )
        hits = (
            corpus.join(F.broadcast(routed), "label")
            .filter(F.col("vec_id") != F.col("qid"))
            .withColumn("cos", F.expr(_cos_expr("embedding", "qv")))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("qid").orderBy(
                        F.desc("cos"), F.asc("vec_id")
                    )
                ),
            )
            .filter(F.col("rn") <= TOP_K)
            .select("qid", "vec_id", "label", F.round("cos", 6).alias("cosine"))
        )
        hits.write.mode("append").parquet(os.path.join(out_dir, "results"))

    _run_foreach_batch(spark, topic, apply)
    out = materialize(spark.read.parquet(os.path.join(out_dir, "results")))
    cleanup_scratch()
    return out
