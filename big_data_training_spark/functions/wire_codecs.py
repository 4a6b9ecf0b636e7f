"""Binary wire codecs (SURVEY.md §2.10): F2 Avro, F4 Protobuf.

The reference serializes topic values with Avro/Protobuf
(kafka/README.md:296, 394-399). The spark-avro / spark-protobuf
connector jars are absent from this container (no network, checked
round 2), so the codecs are implemented directly from the public wire
specifications:

- Avro binary encoding (avro.apache.org/docs/1.12.1/specification):
  zigzag-varint longs, length-prefixed UTF-8 strings, little-endian
  IEEE-754 doubles, union index prefixes. The bytes produced here are
  real Avro — ``tests/test_wire_codecs.py`` decodes them with the
  org.apache.avro 1.12.1 Java library that *does* ship in Spark's jars,
  via the driver JVM.
- Protobuf wire format (protobuf.dev/programming-guides/encoding):
  tag = (field_number << 3) | wire_type; varint ints, 64-bit fixed
  doubles, length-delimited strings; proto3 explicit presence
  (``optional``) — an absent field round-trips as NULL.

Both codecs run as Arrow-batched ``mapInPandas`` stages: serde is
inherently per-record, but the Python boundary is crossed once per
batch, and the intermediate is a genuine one-column binary DataFrame —
the same shape a Kafka value column would have. At 100 TB this is the
embarrassingly-parallel map path: no shuffle, no state, codec cost
linear in bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

# Writer schema for the event record (Avro JSON schema, public spec).
AVRO_EVENT_SCHEMA_JSON = """
{
  "type": "record",
  "name": "Event",
  "namespace": "big_data_training_spark",
  "fields": [
    {"name": "event_id", "type": "long"},
    {"name": "ts_us", "type": {"type": "long", "logicalType": "timestamp-micros"}},
    {"name": "user_id", "type": "long"},
    {"name": "event_type", "type": "string"},
    {"name": "value", "type": "double"},
    {"name": "props", "type": ["null", "string"], "default": null}
  ]
}
"""


# --- varint / zigzag primitives (shared by both formats) -----------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_uvarint(out: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


# --- Avro binary encoding ------------------------------------------------


def _avro_write_long(out: bytearray, n: int) -> None:
    _write_uvarint(out, _zigzag(n))


def _avro_read_long(buf: bytes, pos: int) -> tuple[int, int]:
    n, pos = _read_uvarint(buf, pos)
    return _unzigzag(n), pos


def _avro_write_string(out: bytearray, s: str) -> None:
    raw = s.encode("utf-8")
    _avro_write_long(out, len(raw))
    out.extend(raw)


def _avro_read_string(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = _avro_read_long(buf, pos)
    return buf[pos : pos + n].decode("utf-8"), pos + n


def avro_encode_event(
    event_id: int, ts_us: int, user_id: int, event_type: str, value: float,
    props: str | None,
) -> bytes:
    """One Event record in Avro binary (field order = writer schema)."""
    out = bytearray()
    _avro_write_long(out, event_id)
    _avro_write_long(out, ts_us)
    _avro_write_long(out, user_id)
    _avro_write_string(out, event_type)
    out.extend(struct.pack("<d", value))
    if props is None:
        _avro_write_long(out, 0)  # union branch 0 = null, no payload
    else:
        _avro_write_long(out, 1)  # union branch 1 = string
        _avro_write_string(out, props)
    return bytes(out)


def avro_decode_event(buf: bytes) -> tuple[int, int, int, str, float, str | None]:
    event_id, pos = _avro_read_long(buf, 0)
    ts_us, pos = _avro_read_long(buf, pos)
    user_id, pos = _avro_read_long(buf, pos)
    event_type, pos = _avro_read_string(buf, pos)
    (value,) = struct.unpack_from("<d", buf, pos)
    pos += 8
    branch, pos = _avro_read_long(buf, pos)
    props = None
    if branch == 1:
        props, pos = _avro_read_string(buf, pos)
    if pos != len(buf):
        raise ValueError(f"trailing bytes: {len(buf) - pos}")
    return event_id, ts_us, user_id, event_type, value, props


# --- Protobuf wire format ------------------------------------------------
# message Event { int64 event_id=1; int64 ts_us=2; int64 user_id=3;
#                 string event_type=4; double value=5;
#                 optional string props=6; }

_PB_VARINT, _PB_I64, _PB_LEN = 0, 1, 2


def _pb_tag(out: bytearray, field: int, wire_type: int) -> None:
    _write_uvarint(out, (field << 3) | wire_type)


def _pb_write_sint64(out: bytearray, field: int, n: int) -> None:
    # int64 encodes negatives as 10-byte two's-complement varints; the
    # event fields are non-negative so plain varint is exact and minimal.
    _pb_tag(out, field, _PB_VARINT)
    _write_uvarint(out, n & 0xFFFFFFFFFFFFFFFF)


def _pb_write_string(out: bytearray, field: int, s: str) -> None:
    raw = s.encode("utf-8")
    _pb_tag(out, field, _PB_LEN)
    _write_uvarint(out, len(raw))
    out.extend(raw)


def pb_encode_event(
    event_id: int, ts_us: int, user_id: int, event_type: str, value: float,
    props: str | None,
) -> bytes:
    out = bytearray()
    _pb_write_sint64(out, 1, event_id)
    _pb_write_sint64(out, 2, ts_us)
    _pb_write_sint64(out, 3, user_id)
    _pb_write_string(out, 4, event_type)
    _pb_tag(out, 5, _PB_I64)
    out.extend(struct.pack("<d", value))
    if props is not None:  # proto3 optional: absent field = NULL
        _pb_write_string(out, 6, props)
    return bytes(out)


def pb_decode_event(buf: bytes) -> tuple[int, int, int, str, float, str | None]:
    fields: dict[int, object] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == _PB_VARINT:
            v, pos = _read_uvarint(buf, pos)
            if v >= 1 << 63:
                v -= 1 << 64
            fields[field] = v
        elif wt == _PB_I64:
            (fields[field],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif wt == _PB_LEN:
            n, pos = _read_uvarint(buf, pos)
            fields[field] = buf[pos : pos + n].decode("utf-8")
            pos += n
        else:  # pragma: no cover - schema uses only the three above
            raise ValueError(f"unsupported wire type {wt}")
    return (
        int(fields.get(1, 0)),
        int(fields.get(2, 0)),
        int(fields.get(3, 0)),
        str(fields.get(4, "")),
        float(fields.get(5, 0.0)),
        fields.get(6),  # absent → None (explicit presence)
    )


# --- Spark plumbing: encode stage / decode stage -------------------------

_DECODED_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _encode_batches(encode_row) -> "callable":
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            blobs = [
                encode_row(
                    int(e), int(t), int(u), et, float(v),
                    None if p is None or (isinstance(p, float) and pd.isna(p)) else str(p),
                )
                for e, t, u, et, v, p in zip(
                    pdf["event_id"], ts_us, pdf["user_id"],
                    pdf["event_type"], pdf["value"], pdf["props"],
                )
            ]
            yield pd.DataFrame({"event_id": pdf["event_id"], "wire": blobs})

    return run


def _decode_batches(decode_row) -> "callable":
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_row(bytes(b)) for b in pdf["wire"]]
            out = pd.DataFrame(
                rows,
                columns=[
                    "event_id", "ts_us", "user_id", "event_type", "value",
                    "props",
                ],
            )
            out["ts"] = pd.to_datetime(out["ts_us"], unit="us")
            yield out[
                ["event_id", "ts", "user_id", "event_type", "value", "props"]
            ]

    return run


def _roundtrip(
    spark: SparkSession, sf_dir: str, encode_row, decode_row
) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 500
    )
    wire = events.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).mapInPandas(_encode_batches(encode_row), schema="event_id bigint, wire binary")
    return wire.mapInPandas(_decode_batches(decode_row), schema=_DECODED_SCHEMA)


_ROUNDTRIP_ORACLE = """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events WHERE event_id < 500
"""


@register(
    "f2_avro_roundtrip",
    _ROUNDTRIP_ORACLE,
    doc="F2: Avro binary codec round trip (spec-implemented; jar absent)",
)
def f2_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Producer serialize → binary topic column → consumer deserialize
    (kafka/README.md:296, 394-399). The wire bytes are true Avro binary
    — Java org.apache.avro decodes them (tests/test_wire_codecs.py)."""
    return _roundtrip(spark, sf_dir, avro_encode_event, avro_decode_event)


@register(
    "f4_protobuf_roundtrip",
    _ROUNDTRIP_ORACLE,
    doc="F4: Protobuf wire-format codec round trip (spec-implemented)",
)
def f4_protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proto3 Event message round trip; optional-string presence keeps
    NULL props distinct from empty string (kafka/README.md:394-399)."""
    return _roundtrip(spark, sf_dir, pb_encode_event, pb_decode_event)
