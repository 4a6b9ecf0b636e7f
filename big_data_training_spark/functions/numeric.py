"""Deterministic numeric aggregation helpers.

Floating-point sums depend on accumulation order, which Spark does not
guarantee across partitions (and which differs from the DuckDB oracle).
For every money/measure aggregate we therefore sum in DECIMAL(38,6) —
exact, order-independent — then round and cast back to double. The same
recipe is used in the oracle SQL so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM: decimal-exact, rounded, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), scale).alias(alias)


def davg(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent AVG = decimal SUM / COUNT, rounded double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(DEC)).cast("double") / F.count(c), scale
    ).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE), {scale})"
        f" AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / count({expr}), {scale}) AS {alias}"
    )
