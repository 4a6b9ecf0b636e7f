"""Incremental maintenance of mergeable statistics under streaming
ingest: the bottom-k sample and the embedding Gram matrix, each proven
equal to its batch closed form (same oracle SQL).

These two demonstrate the algebraic property that makes statistics
maintainable at 100 TB without reprocessing: bottom-k is mergeable
(bottom-k of state ∪ batch == global bottom-k) and the Gram matrix is
additive (G = Σ per-batch partials). Each micro-batch folds its
contribution into constant-size state; the log is never replayed.
Segment replay mirrors streaming/cdc_stream.py: quantile-cut parquet
segments consumed with maxFilesPerTrigger=1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register
from big_data_training_spark.streaming.replay import (
    cleanup_scratch,
    materialize,
    scratch_dir,
)

N_SEGMENTS = 4


def _write_id_segments(
    spark: SparkSession, df: DataFrame, id_col: str, prefix: str
) -> str:
    """Split df into N_SEGMENTS id-ordered plain parquet files with
    ascending mtimes (the file-stream source replays in mtime order).

    ONE write job for all segments (the w6 replay template): the
    segment index is ``count(cuts < id)``, repartitioning on it gives
    every segment a single task, so ``partitionBy`` emits exactly one
    file per segment — vs the previous N filter+coalesce jobs that each
    rescanned ``df``. Shared by 13 streaming replays, so the saved jobs
    compound across the whole st_* family. Memoized per source content
    (``replay.cached_topic``): the topic is deterministic from the
    fixture (exact quantile cuts, id-ordered content, forced mtimes),
    so the first call builds it and repeat consumers stream the same
    read-only directory — 0.5-0.7s off every replay at sf0.1."""
    import functools
    import shutil

    from big_data_training_spark.streaming.replay import cached_topic

    def build(topic: str) -> None:
        cuts = df.approxQuantile(
            id_col, [i / N_SEGMENTS for i in range(1, N_SEGMENTS)], 0.0
        )
        seg = functools.reduce(
            lambda acc, c: acc + (F.col(id_col) > F.lit(c)).cast("int"),
            cuts,
            F.lit(0),
        )
        staged = os.path.join(topic, "_staged")
        (
            df.withColumn("_seg", seg)
            .repartition(N_SEGMENTS, "_seg")
            # write-level pin: a session-level maxRecordsPerFile would
            # split a segment and break one-file-per-micro-batch replay
            .write.option("maxRecordsPerFile", "0")
            .partitionBy("_seg")
            .parquet(staged)
        )
        for i in range(N_SEGMENTS):
            seg_dir = os.path.join(staged, f"_seg={i}")
            path = os.path.join(topic, f"seg{i:02d}.parquet")
            if os.path.isdir(seg_dir):
                files = [
                    f for f in os.listdir(seg_dir) if f.endswith(".parquet")
                ]
                if len(files) != 1:
                    raise RuntimeError(
                        f"segment {i} must be exactly one file for "
                        f"maxFilesPerTrigger=1 replay; got {files}"
                    )
                os.replace(os.path.join(seg_dir, files[0]), path)
            else:
                # duplicate quantile cuts can empty a segment; keep the
                # trigger-per-segment contract with a schema-only file
                spark.createDataFrame([], df.schema).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(seg_dir)
                part = next(
                    f for f in os.listdir(seg_dir) if f.endswith(".parquet")
                )
                os.replace(os.path.join(seg_dir, part), path)
            t = 1_600_000_000 + i
            os.utime(path, (t, t))
        shutil.rmtree(staged, ignore_errors=True)

    return cached_topic(df, f"idseg:{id_col}:{N_SEGMENTS}", prefix, build)


def _run_foreach_batch(spark: SparkSession, topic: str, apply) -> None:
    # Plans on a pinned-conf clone so the shared session's
    # shuffle.partitions is never mutated; the LIGHT pin because these
    # replays move ~25k rows per micro-batch (see replay.py's regime
    # note — task startup dominates, fewer tasks win 15-20%). Pin is
    # sized by the largest segment (= one trigger's volume).
    from big_data_training_spark.streaming.replay import (
        cached_schema,
        light_stream_session,
        max_segment_bytes,
    )

    ss = light_stream_session(spark, trigger_bytes=max_segment_bytes(topic))
    seg0 = os.path.join(topic, "seg00.parquet")
    schema = cached_schema(lambda: spark.read.parquet(seg0), seg0)
    stream = (
        ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(topic)
    )
    ckpt = scratch_dir("bdts_incr_ckpt_")
    q = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


from big_data_training_spark import registry as _registry  # noqa: E402
from big_data_training_spark.extensions import sampling as _sampling  # noqa: E402, F401
from big_data_training_spark.extensions import corpusstats as _corpusstats  # noqa: E402, F401
from big_data_training_spark.extensions import similarity as _similarity  # noqa: E402, F401


@register(
    "st_bottomk_sample_stream",
    # identical closed form as the batch sample (single-sourced from its
    # registration) — the merge property is exactly what is verified
    _registry._REGISTRY["sm_bottomk_sample"].oracle,
    doc="streaming bottom-k sample maintenance: per-batch merge of the"
    " k smallest key hashes; converges to the batch sample",
    bench=True,
)
def st_bottomk_sample_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the uniform panel while the corpus streams in: each
    micro-batch computes its own bottom-k and merges with the k-row
    state (bottom-k of the union — the KMV merge law, property-tested
    in tests/test_properties.py). State is k rows forever; adding a
    segment never touches prior data. Equals the batch sample exactly."""
    from big_data_training_spark.extensions.sampling import SAMPLE_K

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    topic = _write_id_segments(spark, docs, "doc_id", "bdts_bk_topic_")
    state_dir = scratch_dir("bdts_bk_state_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        sp = batch_df.sparkSession
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        batch_k = (
            batch_df.select("doc_id", h.alias("sample_hash"))
            .orderBy("sample_hash", "doc_id")
            .limit(SAMPLE_K)
        )
        cur = os.path.join(state_dir, "current")
        if os.path.exists(cur):
            with open(cur) as fh:
                merged = sp.read.parquet(fh.read().strip()).unionByName(batch_k)
        else:
            merged = batch_k
        new = merged.orderBy("sample_hash", "doc_id").limit(SAMPLE_K)
        nxt = os.path.join(state_dir, f"state_{epoch_id:06d}")
        new.write.mode("overwrite").parquet(nxt)
        with open(cur + ".tmp", "w") as fh:
            fh.write(nxt)
        os.replace(cur + ".tmp", cur)

    _run_foreach_batch(spark, topic, apply)
    with open(os.path.join(state_dir, "current")) as fh:
        out = materialize(spark.read.parquet(fh.read().strip()))
    cleanup_scratch()
    return out


@register(
    "st_gram_stream",
    # identical closed form as emb_gram_exact (single-sourced from its
    # registration) — additivity is what is being verified
    _registry._REGISTRY["emb_gram_exact"].oracle,
    doc="streaming Gram-matrix maintenance: additive per-batch partials"
    " folded into d^2 state; converges to the batch Gram",
    bench=True,
)
def st_gram_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PCA input stays fresh while embeddings stream in: each
    micro-batch contributes its partial Q^T Q (the same Arrow-batched
    numpy kernel as the batch query) and the d^2-row state is the
    running sum — G is additive, so the stream state equals the batch
    Gram at every point. State is d^2 rows regardless of corpus size."""
    from big_data_training_spark.extensions.corpusstats import _gram_batches

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    topic = _write_id_segments(spark, emb, "vec_id", "bdts_gram_topic_")
    partials_dir = scratch_dir("bdts_gram_partials_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.select("embedding").mapInPandas(
            _gram_batches, "i bigint, j bigint, dot bigint"
        ).write.mode("append").parquet(os.path.join(partials_dir, "p"))

    _run_foreach_batch(spark, topic, apply)
    out = materialize(
        spark.read.parquet(os.path.join(partials_dir, "p"))
        .groupBy("i", "j")
        .agg(F.sum("dot").alias("dot"))
    )
    cleanup_scratch()
    return out


@register(
    "st_kmeans_update_stream",
    # single-sourced from the batch Lloyd update — additivity of the
    # per-cell (sum, count) sufficient statistics is what is verified
    _registry._REGISTRY["sim_kmeans_update"].oracle,
    doc="mini-batch k-means: per-batch decimal (sum, count) sufficient"
    " statistics folded additively; equals the batch Lloyd update",
    bench=True,
)
def st_kmeans_update_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lloyd update as mini-batch streaming: seed centroids are
    static (built once, broadcast into every batch); each micro-batch
    assigns its vectors to the nearest seed and appends per-(cluster,
    pos) DECIMAL sums and counts — the sufficient statistics, whose
    addition is exact, so the final recenter (round(sum/count)) is
    bit-identical to the one-shot batch update. State is k x dim rows
    at any corpus size; this is how k-means actually trains over
    corpora too large to re-scan per iteration."""
    from big_data_training_spark.extensions.similarity import (
        _kmeans_centroids,
    )

    cent = _kmeans_centroids(spark, sf_dir).localCheckpoint(eager=True)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    topic = _write_id_segments(spark, emb, "vec_id", "bdts_km_topic_")
    partials_dir = scratch_dir("bdts_km_partials_")

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        sqdist = F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("cv"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = batch_df.crossJoin(F.broadcast(cent)).select(
            "vec_id", "embedding", "cluster", F.round(sqdist, 6).alias("d")
        )
        assigned = (
            scored.groupBy("vec_id")
            .agg(
                F.min(F.struct("d", "cluster")).alias("m"),
                F.first("embedding").alias("embedding"),
            )
            .select("vec_id", F.col("m.cluster").alias("cluster"), "embedding")
        )
        (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", F.col("pos").cast("bigint").alias("pos"))
            .agg(
                F.sum(F.col("v").cast("decimal(38,12)")).alias("s"),
                F.count("*").alias("n"),
            )
            .write.mode("append")
            .parquet(os.path.join(partials_dir, "p"))
        )

    _run_foreach_batch(spark, topic, apply)
    out = materialize(
        spark.read.parquet(os.path.join(partials_dir, "p"))
        .groupBy("cluster", "pos")
        .agg(
            F.round(
                F.sum("s").cast("double") / F.sum("n"),
                6,
            ).alias("centroid"),
            F.sum("n").alias("n"),
        )
    )
    cleanup_scratch()
    return out
