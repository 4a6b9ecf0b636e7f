"""Audio multimodal plumbing: WAV (RIFF) container round-trip.

Companion to extensions/multimodal.py (images/video): audio payloads
ride as ``binary`` columns, metadata comes from a pure-Python header
walk over the real wire format (RIFF/WAVE, the canonical 44-byte PCM
header), and the heavy work runs in Arrow-batched ``mapInPandas``.
Actual sample decode would need soundfile/ffmpeg (not in this
container); the header fields — channels, sample rate, bit depth,
sample count — come straight from the container bytes, so the parser
is exercised against the true format. See README.md:10 (audio/video in
the unstructured tier) and kafka/README.md:312 (unstructured event
payloads).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table, repartition_for_compute
from big_data_training_spark.registry import register

_RATES = (8000, 16000, 32000)


def synth_wav(doc_id: int, body: bytes) -> bytes:
    """Wrap ``body`` in a structurally-valid PCM WAV container whose
    header fields derive deterministically from the doc row: real RIFF
    framing, little-endian fields, canonical 44-byte layout (RIFF spec /
    WAVEFORMATEX: fmt chunk at offset 12, data chunk at 36)."""
    channels = 1 + (doc_id % 2)
    rate = _RATES[doc_id % 3]
    bits = 16
    block_align = channels * bits // 8
    # body is the "sample data"; truncate to whole frames
    n_frames = len(body) // block_align
    data = body[: n_frames * block_align]
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Pure-Python RIFF/WAVE header parser — walks the chunk list, no
    codec libs. Returns (channels, sample_rate, bits_per_sample,
    n_frames) or None for non-WAV bytes."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    channels = rate = bits = block_align = None
    n_frames = 0
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if cid == b"fmt " and i + 8 + 16 <= len(payload):
            _, channels, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", payload[i + 8 : i + 24]
            )
        elif cid == b"data" and block_align:
            n_frames = clen // block_align
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if channels is None:
        return None
    return channels, rate, bits, n_frames


_WAV_SCHEMA = (
    "doc_id bigint, channels int, sample_rate int, bits int, "
    "n_frames bigint, duration_ms bigint"
)


def _synth_and_parse_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        parsed = [
            parse_wav_header(synth_wav(d, bytes(b)))
            for d, b in zip(pdf["doc_id"], pdf["body"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "channels": [p[0] if p else None for p in parsed],
                "sample_rate": [p[1] if p else None for p in parsed],
                "bits": [p[2] if p else None for p in parsed],
                "n_frames": [p[3] if p else None for p in parsed],
                "duration_ms": [
                    p[3] * 1000 // p[1] if p else None for p in parsed
                ],
            }
        )


@register(
    "mm_audio_header_parse",
    """
    WITH meta AS (
        SELECT doc_id,
               1 + (doc_id % 2) AS channels,
               CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                    ELSE 32000 END AS sample_rate,
               16 AS bits,
               octet_length(encode(text))
                   // ((1 + (doc_id % 2)) * 2) AS n_frames
        FROM documents
    )
    SELECT doc_id, CAST(channels AS INT) AS channels,
           CAST(sample_rate AS INT) AS sample_rate, CAST(bits AS INT) AS bits,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms
    FROM meta
    """,
    doc="multimodal audio: real RIFF/WAVE header parse (chunk walk → metadata)",
    bench=True,
)
def mm_audio_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips every document's bytes through a structurally-valid
    PCM WAV container and parses channels / sample rate / bit depth /
    frame count back out of the actual RIFF chunk list in Arrow-batched
    mapInPandas. The oracle recomputes the deterministic header
    arithmetic, so a parser that misreads offsets, endianness or the
    word-alignment rule hash-mismatches immediately."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = repartition_for_compute(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("body"))
    )
    return payloads.mapInPandas(_synth_and_parse_wav, schema=_WAV_SCHEMA)


CHUNK_SECONDS = 1


@register(
    "mm_audio_chunk_plan",
    f"""
    WITH meta AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                    ELSE 32000 END AS sample_rate,
               octet_length(encode(text))
                   // ((1 + (doc_id % 2)) * 2) AS n_frames
        FROM documents
    )
    SELECT CAST(sample_rate AS INT) AS sample_rate,
           count(*) AS n_files,
           CAST(sum((n_frames + sample_rate * {CHUNK_SECONDS} - 1)
                    // (sample_rate * {CHUNK_SECONDS})) AS BIGINT)
               AS total_chunks,
           CAST(max(n_frames) AS BIGINT) AS max_frames
    FROM meta GROUP BY 1
    """,
    doc="multimodal audio: fixed-window chunking plan per sample rate",
)
def mm_audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking plan for audio feature extraction: per sample rate, how
    many fixed 1-second windows the corpus splits into (ceil division
    per file, integer-exact). Reuses the header-parse output — the
    mapInPandas plumbing feeds a plain JVM aggregate, the shape every
    batched audio featurizer job has."""
    parsed = mm_audio_header_parse(spark, sf_dir)
    chunk = f"(CAST(sample_rate AS BIGINT) * {CHUNK_SECONDS})"
    return (
        parsed.groupBy("sample_rate")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(F.expr(f"(n_frames + {chunk} - 1) div {chunk}"))
            .cast("bigint")
            .alias("total_chunks"),
            F.max("n_frames").alias("max_frames"),
        )
    )
