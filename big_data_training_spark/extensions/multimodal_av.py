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


# --- Video: ISO-BMFF (MP4) container ---------------------------------------
# Same plumbing contract as WAV/PNG: payloads are opaque binary columns,
# metadata comes from a pure-Python walk over the real wire format (the
# ISO base media file format box structure: big-endian [size][4cc] boxes,
# ftyp / moov{mvhd, trak{tkhd}} / mdat). Actual frame decode would need
# ffmpeg (absent); the container fields — timescale, duration, display
# dimensions — come straight from the spec'd byte offsets, so the box
# walker is exercised against the true format.

_TIMESCALES = (600, 1000, 90000)
_FPS = (24, 25, 30)


def synth_mp4(doc_id: int, body: bytes) -> bytes:
    """Wrap ``body`` in a structurally-valid minimal MP4: ftyp, then
    moov holding a spec-complete mvhd (v0, 108 bytes) and one trak/tkhd
    (v0, 92 bytes) carrying 16.16 fixed-point display dimensions, then
    the payload as mdat. Every field derives deterministically from the
    doc row so the oracle can recompute the parse."""
    timescale = _TIMESCALES[doc_id % 3]
    fps = _FPS[doc_id % 3]
    n_frames = len(body) // 256
    duration = n_frames * timescale // fps
    width = 320 + 16 * (doc_id % 8)
    height = 240 + 16 * ((doc_id * 3) % 8)

    ftyp = struct.pack(">I", 20) + b"ftypisom" + struct.pack(">I", 0) + b"isom"
    mvhd = (
        struct.pack(">I", 108)
        + b"mvhd"
        + struct.pack(">BBH", 0, 0, 0)  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2)  # next_track_ID
    )
    tkhd = (
        struct.pack(">I", 92)
        + b"tkhd"
        + struct.pack(">BBH", 0, 0, 7)  # v0, flags: enabled|in_movie|in_preview
        + struct.pack(">IIIII", 0, 0, 1, 0, duration)  # ctime mtime id rsvd dur
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer alt_group volume rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16)  # 16.16 fixed point
    )
    trak = struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
    moov = struct.pack(">I", 8 + len(mvhd) + len(trak)) + b"moov" + mvhd + trak
    mdat = struct.pack(">I", 8 + len(body)) + b"mdat" + body
    return ftyp + moov + mdat


def _walk_boxes(payload: bytes, lo: int, hi: int):
    """Yield (type, start, size) for each box in payload[lo:hi] — sizes
    drive the walk, so payload bytes that *look* like box headers inside
    mdat can never be misparsed."""
    i = lo
    while i + 8 <= hi:
        (size,) = struct.unpack(">I", payload[i : i + 4])
        if size < 8 or i + size > hi:
            return
        yield payload[i + 4 : i + 8], i, size
        i += size


def parse_mp4(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Pure-Python ISO-BMFF walk. Returns (timescale, duration_units,
    width, height, n_top_boxes) or None for non-MP4 bytes."""
    if payload[4:8] != b"ftyp":
        return None
    timescale = duration = width = height = None
    n_top = 0
    for btype, start, size in _walk_boxes(payload, 0, len(payload)):
        n_top += 1
        if btype == b"moov":
            for ctype, cstart, csize in _walk_boxes(payload, start + 8, start + size):
                if ctype == b"mvhd" and csize >= 28:
                    timescale, duration = struct.unpack(
                        ">II", payload[cstart + 20 : cstart + 28]
                    )
                elif ctype == b"trak":
                    for t, ts_, tsz in _walk_boxes(
                        payload, cstart + 8, cstart + csize
                    ):
                        if t == b"tkhd" and tsz >= 92:
                            w_fixed, h_fixed = struct.unpack(
                                ">II", payload[ts_ + 84 : ts_ + 92]
                            )
                            width, height = w_fixed >> 16, h_fixed >> 16
    if timescale is None:
        return None
    return timescale, duration, width, height, n_top


_MP4_SCHEMA = (
    "doc_id bigint, timescale int, width int, height int, "
    "n_boxes int, duration_ms bigint"
)


def _synth_and_parse_mp4(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        parsed = [
            parse_mp4(synth_mp4(d, bytes(b)))
            for d, b in zip(pdf["doc_id"], pdf["body"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "timescale": [p[0] if p else None for p in parsed],
                "width": [p[2] if p else None for p in parsed],
                "height": [p[3] if p else None for p in parsed],
                "n_boxes": [p[4] if p else None for p in parsed],
                "duration_ms": [
                    p[1] * 1000 // p[0] if p else None for p in parsed
                ],
            }
        )


@register(
    "mm_video_header_parse",
    """
    WITH meta AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
                    ELSE 90000 END AS timescale,
               CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 25
                    ELSE 30 END AS fps,
               octet_length(encode(text)) // 256 AS n_frames,
               320 + 16 * (doc_id % 8) AS width,
               240 + 16 * ((doc_id * 3) % 8) AS height
        FROM documents
    )
    SELECT doc_id, CAST(timescale AS INT) AS timescale,
           CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           CAST(3 AS INT) AS n_boxes,
           CAST((n_frames * timescale // fps) * 1000 // timescale AS BIGINT)
               AS duration_ms
    FROM meta
    """,
    doc="multimodal video: real ISO-BMFF (MP4) box walk → container metadata",
)
def mm_video_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the image/audio/video multimodal trio: every document's
    bytes ride as the mdat payload of a structurally-valid MP4 whose
    moov/mvhd/tkhd fields derive from the doc row; the Arrow-batched box
    walk recovers timescale, duration and display dimensions from the
    actual container bytes — nested box traversal (moov → trak → tkhd),
    size-driven so mdat content can never be misparsed. The oracle
    recomputes the deterministic header arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = repartition_for_compute(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("body"))
    )
    return payloads.mapInPandas(_synth_and_parse_mp4, schema=_MP4_SCHEMA)
