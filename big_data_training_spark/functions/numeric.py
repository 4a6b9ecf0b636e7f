"""Deterministic numeric aggregation helpers.

Floating-point sums depend on accumulation order, which Spark does not
guarantee across partitions (and which differs from the DuckDB oracle).
Every money/measure aggregate therefore sums in DECIMAL(38,6) — exact,
order-independent.

Rounding must also happen in exact arithmetic: double `round()` at an
exact half boundary (x.xx5000…) diverges BETWEEN engines (Spark rounds
the shortest decimal repr HALF_UP; DuckDB scales the binary double), and
2-decimal fixture values produce such halves routinely (sum/count with
even divisors). So:

* sums round in DECIMAL space (both engines round decimals
  half-away-from-zero, verified identical), then cast to double;
* averages use exact integer arithmetic: micros = sum·10^6 as BIGINT,
  HALF_UP via floor((micros + n·h/2) / (n·h)) — the float division is
  safe because a non-integer quotient is ≥ 1/(n·h) from any integer,
  orders of magnitude above one ulp.

Assumes non-negative measures (floor-based HALF_UP rounds toward +inf)
and decimal sums below 2^63/10^6 ≈ 9.2e12 — true for every fixture; a
100 TB deployment with larger group sums should keep the round inside
DECIMAL (dsum) or raise the micros width.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM: decimal-exact, decimal-rounded, double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), scale).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent AVG with exact HALF_UP at ``scale``."""
    c = F.col(col) if isinstance(col, str) else col
    micros = (F.sum(c.cast(DEC)) * F.lit(1_000_000)).cast("long")
    cnt = F.count(c)
    half = cnt * (5 * 10 ** (5 - scale))
    div = cnt * (10 ** (6 - scale))
    rounded = F.floor((micros + half) / div)
    return (rounded / F.lit(10**scale)).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return (
        f"CAST(round(sum(CAST(({expr}) AS DECIMAL(38,6))), {scale}) AS DOUBLE)"
        f" AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    half = 5 * 10 ** (5 - scale)
    div = 10 ** (6 - scale)
    return (
        f"floor((CAST(sum(CAST(({expr}) AS DECIMAL(38,6))) * 1000000 AS BIGINT)"
        f" + count({expr}) * {half})"
        f" / (count({expr}) * {div})) / {10**scale}.0 AS {alias}"
    )
