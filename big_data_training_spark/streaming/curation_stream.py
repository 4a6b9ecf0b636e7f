"""Streaming corpus curation: batch-derived policy applied to a
document stream.

The production shape for corpus filters at scale: the POLICY (here the
temperature-sampling rate table — |sources| rows) is computed offline
on the warehouse copy, then broadcast into a stateless streaming filter
over the ingest stream. Membership is a salted content-key hash, so the
stream decision for any document is identical to the batch decision —
the oracle is simply the batch SQL, making this a strong stream-batch
equivalence check (row-level, not just counts).

Registers last so the driver's certification rotation order is
untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.filters import TEMP_SALT
from big_data_training_spark.registry import register
from big_data_training_spark.streaming.replay import (
    materialize,
    read_stream_table,
    run_to_completion,
)


@register(
    "st_temperature_filter_stream",
    f"""
    WITH cnt AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ), mn AS (
        SELECT min(n_docs) AS n_min FROM cnt
    ), rates AS (
        SELECT c.source,
               CAST(floor(sqrt((1000000 * m.n_min) // c.n_docs)) AS BIGINT)
                   AS rate_permille
        FROM cnt c CROSS JOIN mn m
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON r.source = d.source
    WHERE CAST(('0x' || substr(md5('{TEMP_SALT}' || CAST(d.doc_id AS VARCHAR)),
                               1, 15)) AS BIGINT) % 1000 < r.rate_permille
    """,
    doc="streaming curation: batch-derived temperature-sampling policy on a stream",
)
def st_temperature_filter_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The offline/online split of every large curation deployment: the
    rate table comes from a batch aggregation of the warehouse corpus,
    the ingest stream is filtered statelessly against it (stream-static
    broadcast join + hash-bucket predicate, append mode — no state, no
    watermark). Because the keep decision is a deterministic salted
    hash, the streamed keep-set is row-identical to the batch keep-set,
    which is exactly what the oracle asserts."""
    docs_static = load_table(spark, sf_dir, "documents")
    cnt = docs_static.groupBy("source").agg(F.count("*").alias("n_docs"))
    mn = cnt.agg(F.min("n_docs").alias("n_min"))
    rates = cnt.crossJoin(F.broadcast(mn)).select(
        "source",
        F.floor(F.sqrt(F.expr("(1000000 * n_min) div n_docs")))
        .cast("bigint")
        .alias("rate_permille"),
    )
    stream = read_stream_table(spark, sf_dir, "documents")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(TEMP_SALT), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    kept = (
        stream.join(F.broadcast(rates), "source")
        .filter(b < F.col("rate_permille"))
        .select("doc_id", "source")
    )
    return materialize(run_to_completion(kept, "append"))
