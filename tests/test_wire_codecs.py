"""F2/F4 wire-codec verification: spec vectors, property round trips,
and — for Avro — cross-validation against the org.apache.avro 1.12.1
Java library that ships in Spark's jars (the bytes must be real Avro,
not merely self-consistent)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_training_spark.functions.wire_codecs import (
    AVRO_EVENT_SCHEMA_JSON,
    _read_uvarint,
    _write_uvarint,
    _zigzag,
    avro_decode_event,
    avro_encode_event,
    f2_avro_roundtrip,
    f4_protobuf_roundtrip,
    pb_decode_event,
    pb_encode_event,
)
from tests.conftest import assert_matches_oracle


# --- spec vectors (public encoding specifications) ----------------------


def test_avro_long_spec_vectors():
    # avro.apache.org spec: zigzag examples 0→00, -1→01, 1→02, -2→03, 2→04
    for value, expected in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                            (-2, b"\x03"), (2, b"\x04"), (64, b"\x80\x01")]:
        out = bytearray()
        _write_uvarint(out, _zigzag(value))
        assert bytes(out) == expected, value


def test_avro_string_encoding():
    # "foo" = length 3 (zigzag 06) + UTF-8 bytes
    blob = avro_encode_event(0, 0, 0, "foo", 0.0, None)
    assert b"\x06foo" in blob
    # null props = union branch 0 only (single 00 byte at the tail)
    assert blob.endswith(b"\x00")


def test_protobuf_spec_vector():
    # protobuf.dev encoding guide: field 1 varint 150 → 08 96 01
    blob = pb_encode_event(150, 0, 0, "", 0.0, None)
    assert blob.startswith(b"\x08\x96\x01")


def test_protobuf_null_vs_empty_props():
    absent = pb_encode_event(1, 2, 3, "t", 1.0, None)
    empty = pb_encode_event(1, 2, 3, "t", 1.0, "")
    assert absent != empty  # explicit presence
    assert pb_decode_event(absent)[5] is None
    assert pb_decode_event(empty)[5] == ""


def test_uvarint_roundtrip_boundaries():
    for n in [0, 1, 127, 128, 16383, 16384, (1 << 63) - 1]:
        out = bytearray()
        _write_uvarint(out, n)
        got, pos = _read_uvarint(bytes(out), 0)
        assert got == n and pos == len(out)


# --- property round trips -----------------------------------------------

_event = st.tuples(
    st.integers(min_value=0, max_value=(1 << 62)),
    st.integers(min_value=0, max_value=(1 << 52)),
    st.integers(min_value=0, max_value=(1 << 62)),
    st.text(max_size=40),
    st.floats(allow_nan=False),
    st.one_of(st.none(), st.text(max_size=40)),
)


@given(_event)
@settings(max_examples=200, deadline=None)
def test_avro_roundtrip_property(ev):
    assert avro_decode_event(avro_encode_event(*ev)) == ev


@given(_event)
@settings(max_examples=200, deadline=None)
def test_protobuf_roundtrip_property(ev):
    assert pb_decode_event(pb_encode_event(*ev)) == ev


# --- JVM interop: our bytes ARE Avro ------------------------------------


def _java_decode(spark, blob: bytes):
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(AVRO_EVENT_SCHEMA_JSON)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(
        bytearray(blob), None
    )
    return reader.read(None, dec)


def test_avro_bytes_decode_with_java_library(spark):
    ev = (42, 1_700_000_000_000_000, 7, "click", 3.5, '{"k":1}')
    rec = _java_decode(spark, avro_encode_event(*ev))
    assert rec.get("event_id") == 42
    assert rec.get("ts_us") == 1_700_000_000_000_000
    assert rec.get("user_id") == 7
    assert str(rec.get("event_type")) == "click"
    assert rec.get("value") == 3.5
    assert str(rec.get("props")) == '{"k":1}'


def test_avro_null_props_decode_with_java_library(spark):
    rec = _java_decode(spark, avro_encode_event(1, 2, 3, "t", -1.25, None))
    assert rec.get("props") is None
    assert rec.get("value") == -1.25


def test_java_encoded_bytes_decode_with_our_reader(spark):
    """Bidirectional: Java GenericDatumWriter → our Python decoder."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(AVRO_EVENT_SCHEMA_JSON)
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("event_id", jvm.java.lang.Long.valueOf(99))
    rec.put("ts_us", jvm.java.lang.Long.valueOf(123456))
    rec.put("user_id", jvm.java.lang.Long.valueOf(5))
    rec.put("event_type", "purchase")
    rec.put("value", jvm.java.lang.Double.valueOf(2.5))
    rec.put("props", None)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    baos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, None)
    writer.write(rec, enc)
    enc.flush()
    blob = bytes(baos.toByteArray())
    assert avro_decode_event(blob) == (99, 123456, 5, "purchase", 2.5, None)


# --- end-to-end oracle parity -------------------------------------------


@pytest.mark.parametrize("fn", [f2_avro_roundtrip, f4_protobuf_roundtrip])
def test_roundtrip_matches_oracle(spark, sf_dir, duck, fn):
    assert_matches_oracle(
        fn(spark, sf_dir),
        duck,
        """
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events WHERE event_id < 500
        """,
    )
