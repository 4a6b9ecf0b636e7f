"""S8 extension: fixed-width (mainframe/COBOL copybook style) text
ingest — the legacy flat-file format every enterprise lake still
receives, round-tripped through real files.

Writer: rpad each column into its byte lane and emit one text line
per record (`spark.write.text`). Reader: `spark.read.text` +
substr/trim/cast lane parsing — the exact recipe for copybook feeds
when no dedicated datasource is installed. The oracle reads the same
rows relationally, so any lane-offset or padding mistake breaks the
hash (the same connector-fidelity contract as the CSV/JSON/ORC
round-trips in operators/sources.py).

Scale: text source splits by line ranges like any file source;
parsing is substring arithmetic in whole-stage codegen — no Python,
no regex backtracking.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

# lanes: custkey [1,12), name [12,38), nationkey [38,44), acctbal
# cents [44,60) — right-padded, newline-terminated records
_LANES = "custkey 11, name 26, nationkey 6, acctbal_cents 16"


@register(
    "s8_fixed_width_roundtrip",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM customer WHERE c_custkey < 500
    GROUP BY 1 ORDER BY 1
    """,
    doc="S8: fixed-width flat-file round-trip — rpad lane writer, "
    "substr/trim lane reader, aggregate parity vs the relational rows",
)
def s8_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer slice -> 59-byte fixed-lane records on disk -> text
    source -> lane parse -> aggregate. Everything after the read is
    substring+cast in codegen; the write is the rpad mirror. Floor-
    cents for the money lane (DOUBLE column, CAST-rounding trap)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        "c_custkey < 500"
    )
    out = tempfile.mkdtemp(prefix="bdts_fw_") + "/slice"
    (
        cust.selectExpr(
            "concat("
            " rpad(CAST(c_custkey AS STRING), 11, ' '),"
            " rpad(c_name, 26, ' '),"
            " rpad(CAST(c_nationkey AS STRING), 6, ' '),"
            " rpad(CAST(CAST(floor(c_acctbal * 100) AS BIGINT)"
            "      AS STRING), 16, ' ')"
            ") AS value"
        )
        .write.mode("overwrite")
        .text(out)
    )
    back = spark.read.text(out).selectExpr(
        "CAST(trim(substr(value, 1, 11)) AS BIGINT) AS custkey",
        "trim(substr(value, 12, 26)) AS name",
        "CAST(trim(substr(value, 38, 6)) AS BIGINT) AS nationkey",
        "CAST(trim(substr(value, 44, 16)) AS BIGINT) AS acctbal_cents",
    )
    return (
        back.groupBy("nationkey")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_customers"),
            F.expr("CAST(sum(acctbal_cents) AS BIGINT)").alias(
                "total_cents"
            ),
        )
        .orderBy("nationkey")
    )
