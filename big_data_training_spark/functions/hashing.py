"""Engine-portable hashing (F6, kafka/README.md:17,22,375).

Spark's ``hash()`` (Murmur3), Kafka's murmur2 and DuckDB's ``hash()``
all differ, so operators whose *values* must verify against the oracle
use an md5-derived 60-bit integer: identical in any engine with md5 +
hex parsing. Spark-internal partitioning (P1) keeps using the native
Murmur3 ``hash()`` — only the contract is checked there.

``hash60(s) = int(hex(md5(s))[0:15], 16)`` — 60 bits, always positive,
fits BIGINT in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """md5-derived 60-bit hash of a string column (engine-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash60_expr(expr: str) -> str:
    """Spark SQL-expression form, for use inside higher-order lambdas."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def sql_hash60(expr: str) -> str:
    """DuckDB oracle twin of :func:`hash60`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
