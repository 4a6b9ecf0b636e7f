"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct (README.md:10 names text/images/video as the
unstructured tier). The Spark-side plumbing — schema, Arrow-batched
``mapInPandas``, partition-sized batches — is real; the actual media
decode is stubbed (``decode_image``) because no codec libraries ship in
this container.

Scale notes: binary payloads stay columnar in Parquet and are never
row-exploded; feature extraction is a ``mapInPandas`` over Arrow batches
(one Python roundtrip per batch, not per row). Oversized payloads
should be stored out-of-line (object store) with the column holding a
locator — the same pattern as the reference's external-state option
(kafka/README.md:318).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table, repartition_for_compute
from big_data_training_spark.registry import register

MM_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_sha string, modality string, "
    "width int, height int"
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """STUB — real image decode needs PIL/ffmpeg (not in this container).

    Deterministic fake: derive a (width, height) from payload length so
    the pipeline shape (schema, batching, downstream groupBy) is fully
    testable. Replace with a real decoder in production.
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads."""
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        dims = [decode_image(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in payloads],
                "content_sha": [hashlib.sha256(p).hexdigest() for p in payloads],
                "modality": "image",
                "width": [w for w, _ in dims],
                "height": [h for _, h in dims],
            }
        )


@register(
    "mm_binary_metadata",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha,
           'image' AS modality,
           CAST((octet_length(encode(text)) % 640) + 1 AS INT) AS width,
           CAST((octet_length(encode(text)) % 480) + 1 AS INT) AS height
    FROM documents
    """,
    doc="multimodal: binary payload + typed metadata via mapInPandas",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded as the binary payload stand-in; features
    extracted in Arrow batches via mapInPandas (the real multimodal
    plumbing), with the decode step a deterministic stub."""
    docs = load_table(spark, sf_dir, "documents")
    # CPU-heavy decode wants full fan-out; the single-file fixture is one
    # input split (→ one Python worker) without this. At 100 TB the scan
    # already has thousands of splits and a real pipeline would skip the
    # exchange rather than shuffle raw payload bytes.
    payloads = repartition_for_compute(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )
    return payloads.mapInPandas(_extract_features, schema=MM_SCHEMA)


_FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_sha string, frame_bytes bigint"


def sample_frames(payload: bytes) -> list[bytes]:
    """STUB — real video decode needs ffmpeg (not in this container).

    Deterministic fake: derive (len % 4) + 1 "frames" as byte slices so
    frame-count logic, explode shape and downstream joins are testable.
    """
    n_frames = (len(payload) % 4) + 1
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)]


def _explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        rows = {"doc_id": [], "frame_idx": [], "frame_sha": [], "frame_bytes": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for i, fr in enumerate(sample_frames(payload)):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(i)
                rows["frame_sha"].append(hashlib.sha256(bytes(fr)).hexdigest())
                rows["frame_bytes"].append(len(fr))
        yield pd.DataFrame(rows)


@register(
    "mm_frame_sample",
    """
    SELECT doc_id,
           CAST((octet_length(encode(text)) % 4) + 1 AS BIGINT) AS n_frames,
           CAST(greatest(octet_length(encode(text))
                         // ((octet_length(encode(text)) % 4) + 1), 1)
                AS BIGINT) AS frame_bytes_0
    FROM documents
    """,
    doc="multimodal: frame sampling — 1 binary row → n frame rows (mapInPandas)",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: mapInPandas explodes each payload into
    frame rows (1→n, the multimodal flatMap), then per-doc stats. The
    oracle recomputes the deterministic stub arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = repartition_for_compute(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )
    frames = payloads.mapInPandas(_explode_frames, schema=_FRAME_SCHEMA)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.max(F.when(F.col("frame_idx") == 0, F.col("frame_bytes"))).alias(
                "frame_bytes_0"
            ),
        )
    )


@register(
    "mm_modality_stats",
    """
    SELECT 'image' AS modality,
           count(*) AS n,
           round(CAST(sum(CAST(octet_length(encode(text)) AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_bytes,
           max(CAST(octet_length(encode(text)) AS BIGINT)) AS max_bytes
    FROM documents
    """,
    doc="multimodal: per-modality storage stats (built-ins only)",
)
def mm_modality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage accounting per modality — pure JVM aggregate over the
    payload length (no Python in this path)."""
    docs = load_table(spark, sf_dir, "documents")
    payload_len = F.octet_length(F.encode("text", "UTF-8")).cast("bigint")
    return (
        docs.select(payload_len.alias("n_bytes"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("n_bytes").cast("decimal(38,6)")).cast("double"), 2).alias(
                "total_bytes"
            ),
            F.max("n_bytes").alias("max_bytes"),
        )
        .select(F.lit("image").alias("modality"), "n", "total_bytes", "max_bytes")
    )
