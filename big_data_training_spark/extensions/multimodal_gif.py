"""Multimodal: GIF and BMP container parsing — the little-endian
members of the image-header family (multimodal.py parses PNG/JPEG,
whose dimension fields are big-endian; GIF87a/89a and BMP store
theirs little-endian, so these parsers exercise the opposite byte
order end to end).

Same contract as the rest of the mm_* family: each document is
round-tripped through a STRUCTURALLY VALID container built from
deterministic header arithmetic, and the parser reads the dimensions
back out of the actual bytes (GIF: logical-screen descriptor u16le at
offsets 6/8, GIF89a spec §18; BMP: BITMAPINFOHEADER i32le at offsets
18/22, Windows BMP spec). The oracle recomputes the arithmetic, so an
offset or endianness mistake hash-mismatches immediately.

Scale: payloads stay columnar; parsing is Arrow-batched mapInPandas —
one Python roundtrip per batch, never per row (the repo's standing
multimodal rule).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.data import repartition_for_compute
from big_data_training_spark.registry import register


def synth_gif(width: int, height: int, body: bytes) -> bytes:
    """Minimal valid GIF89a: header + logical screen descriptor +
    trailer, body carried as a comment-extension-like tail."""
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + b"\x00\x00\x00"  # packed fields, bg color, aspect
        + body[:32]
        + b"\x3b"  # trailer
    )


def synth_bmp(width: int, height: int, body: bytes) -> bytes:
    """Minimal BMP: BITMAPFILEHEADER (14B) + BITMAPINFOHEADER (40B)."""
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 2835, 2835, 0, 0
    )
    size = 14 + 40 + min(len(body), 32)
    head = b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
    return head + info + body[:32]


def parse_gif(payload: bytes) -> tuple[int, int] | None:
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h
    return None


def parse_bmp(payload: bytes) -> tuple[int, int] | None:
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return w, abs(h)  # negative height = top-down rows
    return None


_SCHEMA = "doc_id bigint, fmt string, width int, height int"


def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {"doc_id": [], "fmt": [], "width": [], "height": []}
        for doc_id, n_chars, body in zip(
            pdf["doc_id"], pdf["n_chars"], pdf["body"]
        ):
            w = int(n_chars % 640) + 1
            h = int(doc_id % 480) + 1
            if doc_id % 2 == 0:
                payload = synth_gif(w, h, bytes(body))
                parsed = parse_gif(payload)
                fmt = "gif"
            else:
                payload = synth_bmp(w, h, bytes(body))
                parsed = parse_bmp(payload)
                fmt = "bmp"
            pw, ph = parsed if parsed else (-1, -1)
            rows["doc_id"].append(doc_id)
            rows["fmt"].append(fmt)
            rows["width"].append(pw)
            rows["height"].append(ph)
        yield pd.DataFrame(rows)


@register(
    "mm_gif_bmp_header_parse",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'gif' ELSE 'bmp' END AS fmt,
           CAST((n_chars % 640) + 1 AS INT) AS width,
           CAST((doc_id % 480) + 1 AS INT) AS height
    FROM documents
    """,
    doc="multimodal: real GIF89a/BMP header round-trip (little-endian "
    "dimension fields, complementing the big-endian PNG/JPEG parsers)",
)
def mm_gif_bmp_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds byte-valid GIF (u16le at 6/8) or BMP (i32le at 18/22,
    top-down negative height handled) containers per document and
    parses the dimensions back from the raw bytes. Oracle recomputes
    the header arithmetic — parsing the wrong offsets or byte order
    fails the hash, exactly like the PNG/JPEG twin."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = repartition_for_compute(
        docs.select(
            "doc_id", "n_chars", F.encode("text", "UTF-8").alias("body")
        )
    )
    return payloads.mapInPandas(_roundtrip, schema=_SCHEMA)
