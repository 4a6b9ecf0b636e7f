"""Streaming model serving: the Naive Bayes classifier trained on the
warehouse corpus, applied to a document ingest stream.

The reference's ML-scoring ProcessFunction (flink/README.md:29-62,
T5) is exactly this topology: model fitted offline, broadcast into
the stream, every arriving record scored statelessly. Here the model
is the (class, term) fixed-point nll table from extensions/nbayes —
bounded by vocabulary x classes, so the broadcast is corpus-size-free
— and each micro-batch is scored in foreachBatch through the SAME
`nb_predictions` code path the batch confusion matrix uses. Since the
scorer is deterministic integer math, the streamed confusion matrix
is row-identical to the batch oracle (stream-batch equivalence at
value level, not just counts).

Registers last so the driver's certification rotation is untouched.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.extensions.nbayes import (
    CONFUSION_ORACLE,
    _nb_model,
    nb_predictions,
)
from big_data_training_spark.registry import register
from big_data_training_spark.streaming.replay import (
    cleanup_scratch,
    materialize,
    read_stream_table,
    scratch_dir,
)


@register(
    "st_nb_classify_stream",
    CONFUSION_ORACLE,
    doc="streaming NB serving: offline-trained model broadcast into a "
    "document stream, micro-batches scored in foreachBatch via the "
    "batch scorer — confusion matrix row-identical to the batch oracle",
    bench=True,
)
def st_nb_classify_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train offline (batch aggregation over the warehouse copy), then
    attach the scorer to the ingest stream: foreachBatch applies the
    integer-exact NB argmin to each micro-batch and appends
    (doc_id, true_lang, pred_lang) to the predictions topic; the
    confusion matrix aggregates the topic after the stream drains.
    State: none — scoring is stateless; the model broadcast is the
    only side input, so the topology scales with the stream, not the
    corpus."""
    docs_static, _, lang_aug, nllterm = _nb_model(spark, sf_dir)
    # pin the model: micro-batches must not re-derive it per batch
    lang_aug = materialize(lang_aug)
    nllterm = materialize(nllterm)

    stream = read_stream_table(spark, sf_dir, "documents")
    out_dir = scratch_dir("bdts_nbserve_") + "/preds"

    def score_batch(batch_df: DataFrame, epoch_id: int) -> None:
        nb_predictions(batch_df, lang_aug, nllterm).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(score_batch)
        .queryName(f"nbserve_{uuid.uuid4().hex[:8]}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    preds = spark.read.parquet(out_dir)
    out = materialize(
        preds.groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )
    cleanup_scratch()
    return out
