"""F-family completion: base64 / hex binary-text codecs, round-trip
proven — the transport encodings (HTTP payloads, Kafka headers,
debezium blobs) every ingest layer decodes before the wire codecs
(Avro/Protobuf/JSON, functions/wire_codecs.py) take over.

Both engines implement RFC 4648 base64 and lowercase hex natively
(Spark base64/unbase64/hex; DuckDB to_base64/from_base64/hex), so
the round-trip runs fully JVM-side / vectorized — the oracle proves
the ENCODINGS agree byte-for-byte across engines, not just that each
engine inverts itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

_N = 200  # slice: deterministic, enough to cover padding variants


@register(
    "f_base64_hex_roundtrip",
    f"""
    WITH d AS (
        SELECT doc_id, encode(text) AS body FROM documents
        WHERE doc_id < {_N}
    ),
    enc AS (
        SELECT doc_id, body,
               to_base64(body) AS b64,
               lower(hex(body)) AS hx,
               octet_length(body) AS n_bytes
        FROM d
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN from_base64(b64) = body
                    THEN 1 ELSE 0 END) AS BIGINT) AS b64_roundtrips,
           CAST(sum(length(b64)) AS BIGINT) AS b64_chars,
           CAST(sum(length(hx)) AS BIGINT) AS hex_chars,
           CAST(sum(n_bytes) AS BIGINT) AS raw_bytes,
           CAST(sum(CASE WHEN length(b64) % 4 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS b64_padded_ok
    FROM enc
    """,
    doc="base64 + hex transport-codec round-trip over a document "
    "slice: cross-engine encoding equality (sizes, padding) and "
    "decode-inverts-encode counts",
)
def f_base64_hex_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encode -> decode -> compare, plus the size identities
    (|b64| = 4*ceil(n/3), |hex| = 2n) that only hold if both engines
    produce the SAME RFC 4648 output. All built-ins, all codegen."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(f"doc_id < {_N}")
        .select("doc_id", F.encode("text", "UTF-8").alias("body"))
    )
    # Spark's base64() emits MIME-chunked output (a line break every
    # 76 chars); canonical RFC 4648 has none — strip to match DuckDB.
    enc = d.select(
        "doc_id",
        "body",
        F.expr(
            "replace(replace(base64(body), '\\r', ''), '\\n', '')"
        ).alias("b64"),
        F.lower(F.hex("body")).alias("hx"),
        F.octet_length("body").alias("n_bytes"),
    )
    return enc.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
        F.expr(
            "CAST(sum(CASE WHEN unbase64(b64) = body THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("b64_roundtrips"),
        F.expr("CAST(sum(length(b64)) AS BIGINT)").alias("b64_chars"),
        F.expr("CAST(sum(length(hx)) AS BIGINT)").alias("hex_chars"),
        F.expr("CAST(sum(n_bytes) AS BIGINT)").alias("raw_bytes"),
        F.expr(
            "CAST(sum(CASE WHEN length(b64) % 4 = 0 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("b64_padded_ok"),
    )
