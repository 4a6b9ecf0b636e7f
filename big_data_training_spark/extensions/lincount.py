"""Linear counting: the low-cardinality-regime distinct estimator
(Whang et al. 1990) — the standard companion to HLL (sk_hll_estimate):
when the cardinality is small relative to the bitmap, LC's occupancy
estimate m*ln(m/z) beats HLL's harmonic mean, which is why production
sketches (e.g. the HLL paper's own recommendation) switch to LC below
the crossover.

Exactness: the estimate needs a logarithm, and the repo's rule is no
cross-engine float math — so ln comes from the 1/16-bit fixed-point
log2 kernel (extensions/retrieval.log2_fp16_steps) times the ln(2)
constant: est = m * log2fp16(m/z) * 693147 // 16000000. Identical
integer text in both dialects; the bitmap occupancy itself is exact
(distinct cells under the portable hash60). In the very-sparse regime
the 1/16-bit kernel quantizes ln(m/z) to 0, so the estimate is floored
at the occupied-cell count — a true lower bound (m*ln(m/z) >= m-z
always) that equals n up to hash collisions exactly where the kernel
loses resolution.

Scale: the whole sketch is m=4096 cells per key — the shuffle carries
(key, cell) pairs deduplicated map-side, so the state per key is
bounded at any stream volume, and cells from different partitions
merge by set union (the same mergeability contract as the HLL/KMV
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.retrieval import (
    _nest_sql,
    log2_fp16_steps,
)
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

LC_M = 4096  # bitmap cells per key
_LN2_MICRO = 693147  # floor(ln(2) * 1e6)


def _lc_oracle() -> str:
    steps = log2_fp16_steps("m", "z", "log2fp16", " // ")
    nested = _nest_sql(
        "SELECT event_type, n_exact, z, m FROM occ", steps
    )
    return f"""
    WITH cells AS (
        SELECT event_type,
               {sql_hash60("user_id || ''")} % {LC_M} AS cell
        FROM events
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1
    ),
    occ AS (
        SELECT e.event_type AS event_type, e.n_exact AS n_exact,
               greatest({LC_M} - count(*), 1) AS z,
               CAST({LC_M} AS BIGINT) AS m
        FROM cells c JOIN exact e ON e.event_type = c.event_type
        GROUP BY 1, 2
    ),
    est AS ({nested})
    SELECT event_type,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(m - z AS BIGINT) AS occupied_cells,
           CAST(greatest(m * log2fp16 * {_LN2_MICRO} // 16000000,
                         m - z) AS BIGINT) AS lc_estimate,
           CAST((greatest(m * log2fp16 * {_LN2_MICRO} // 16000000,
                          m - z) - n_exact)
                * 1000 // n_exact AS BIGINT) AS err_permille
    FROM est
    ORDER BY event_type
    """


@register(
    "sk_linear_counting",
    _lc_oracle(),
    doc=f"linear counting distinct estimate per event type: m={LC_M}"
    f" cell occupancy under the portable hash, ln via the 1/16-bit"
    f" fixed-point log2 kernel, with exact error permille vs true"
    f" distinct",
)
def sk_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type from a 4096-cell occupancy
    bitmap: n-hat = m*ln(m/z) with z empty cells — the estimator that
    dominates HLL below the load-factor crossover. The logarithm is
    the same square-and-renormalize fixed-point kernel BM25 ranks
    with, so the estimate (and its signed error vs the exact count,
    reported per key) is bit-identical across engines. The cell set
    is deduplicated map-side (groupBy(key, cell)), so the merge state
    per key is at most m rows no matter the volume."""
    events = load_table(spark, sf_dir, "events")
    uid_str = "concat(user_id, '')"
    cells = events.selectExpr(
        "event_type", f"{hash60_expr(uid_str)} % {LC_M} AS cell"
    ).distinct()
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    occ = (
        cells.groupBy("event_type")
        .agg(
            F.expr(f"greatest({LC_M} - count(*), 1)").alias("z"),
            F.expr(f"CAST({LC_M} AS BIGINT)").alias("m"),
        )
        .join(F.broadcast(exact), "event_type")
    )
    for name, expr in log2_fp16_steps("m", "z", "log2fp16", " div "):
        occ = occ.selectExpr("*", f"{expr} AS {name}")
    return occ.select(
        "event_type",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.expr("CAST(m - z AS BIGINT)").alias("occupied_cells"),
        F.expr(
            f"CAST(greatest(m * log2fp16 * {_LN2_MICRO} div 16000000,"
            " m - z) AS BIGINT)"
        ).alias("lc_estimate"),
        F.expr(
            f"CAST((greatest(m * log2fp16 * {_LN2_MICRO} div 16000000,"
            " m - z) - n_exact)"
            " * 1000 div n_exact AS BIGINT)"
        ).alias("err_permille"),
    ).orderBy("event_type")
