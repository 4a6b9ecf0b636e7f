"""Epoch shuffle planning: the deterministic, engine-portable answer
to "what order does the data loader read the corpus in epoch e, and
which worker gets which document?" — reproducibility machinery every
multi-epoch training run needs (re-runs, crash recovery, and bisecting
a loss spike to a data batch all depend on the order being a pure
function of (seed, epoch, doc)).

Design: the per-epoch order key is hash60(epoch:doc_id) — the repo's
md5-derived engine-portable hash (functions/hashing.py), so the
permutation is reproducible on ANY engine, not just Spark, and
re-keying per epoch gives independent permutations without ever
materializing one (the classic salt-the-key reshuffle). Worker
assignment is the same hash mod the shard count.

Scale: the shuffle plan head is a per-epoch top-k (window over an
epoch-replicated scan — |epochs| x corpus rows, each row carrying only
ids and a hash); the balance audit is one groupBy over
|epochs| x |shards| keys. No global sort anywhere — the full epoch
order never exists as a sorted artifact, only as a sort KEY, which is
exactly how a distributed loader consumes it (each worker range-reads
its own hash slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

EPOCHS = (1, 2, 3)
SHARDS = 8
HEAD_PER_EPOCH = 10

_EPOCH_VALUES = ", ".join(f"({e})" for e in EPOCHS)


def _keyed_sql() -> str:
    h = sql_hash60("ep.epoch || ':' || d.doc_id")
    return f"""
    keyed AS (
        SELECT ep.epoch AS epoch, d.doc_id AS doc_id,
               {h} AS order_key,
               {h} % {SHARDS} AS shard
        FROM documents d
        CROSS JOIN (VALUES {_EPOCH_VALUES}) ep(epoch)
    )
"""


def _keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(1).select(
        F.explode(F.array(*[F.lit(e) for e in EPOCHS])).alias("epoch")
    )
    h = hash60_expr("concat(epoch, ':', doc_id)")
    return docs.crossJoin(F.broadcast(epochs)).selectExpr(
        "epoch",
        "doc_id",
        f"{h} AS order_key",
        f"{h} % {SHARDS} AS shard",
    )


@register(
    "tx_epoch_shuffle",
    f"""
    WITH {_keyed_sql()},
    ranked AS (
        SELECT epoch, doc_id, shard,
               row_number() OVER (PARTITION BY epoch ORDER BY order_key,
                                  doc_id) AS position
        FROM keyed
    )
    SELECT epoch, CAST(position AS BIGINT) AS position, doc_id, shard
    FROM ranked
    WHERE position <= {HEAD_PER_EPOCH}
    ORDER BY epoch, position
    """,
    doc=f"epoch shuffle plan: first {HEAD_PER_EPOCH} docs per epoch"
    f" under the portable hash60(epoch:doc) permutation, with worker"
    f" shard assignment",
)
def tx_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-loader order, reproducible forever: epoch e reads the
    corpus sorted by hash60(e:doc_id) — a fresh pseudo-random
    permutation per epoch from the same engine-portable hash, with no
    stored permutation table to version or lose. The head of each
    epoch's order (what batch 0 will contain) is exactly the debugging
    artifact a loss-spike bisection asks for. Per-epoch top-k window;
    the corpus is never globally sorted — workers range-read their own
    hash slice."""
    ranked = _keyed(spark, sf_dir).selectExpr(
        "epoch",
        "doc_id",
        "shard",
        "CAST(row_number() OVER (PARTITION BY epoch ORDER BY order_key,"
        " doc_id) AS BIGINT) AS position",
    )
    return (
        ranked.filter(F.col("position") <= HEAD_PER_EPOCH)
        .select("epoch", "position", "doc_id", "shard")
        .orderBy("epoch", "position")
    )


@register(
    "tx_epoch_shard_balance",
    f"""
    WITH {_keyed_sql()},
    per AS (
        SELECT epoch, shard, count(*) AS n_docs
        FROM keyed GROUP BY 1, 2
    )
    SELECT epoch, shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_docs * {SHARDS} * 1000
                // (SELECT count(*) FROM documents) AS BIGINT)
               AS load_permille
    FROM per
    ORDER BY epoch, shard
    """,
    doc=f"epoch shard balance: docs per (epoch, worker-shard) under the"
    f" hash60 assignment with exact load factor (permille of fair"
    f" share)",
)
def tx_epoch_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the hash assignment actually balance the loader workers?
    Counts per (epoch, shard) with the load factor as a permille of
    the fair share (1000 = perfectly even). A skewed shard here means
    a straggler every epoch — this audit is the cheap insurance run
    before a 10^5-step training job. One groupBy over
    |epochs| x |shards| keys; the scan carries ids only."""
    keyed = _keyed(spark, sf_dir)
    n = load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n")
    )
    return (
        keyed.groupBy("epoch", "shard")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .crossJoin(F.broadcast(n))
        .select(
            "epoch",
            "shard",
            "n_docs",
            F.expr(
                f"CAST(n_docs * {SHARDS} * 1000 div n AS BIGINT)"
            ).alias("load_permille"),
        )
        .orderBy("epoch", "shard")
    )
