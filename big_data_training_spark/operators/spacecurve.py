"""Space-filling-curve layout audit: Hilbert vs Z-order clustering.

s9_zorder_layout (operators/layout.py) audits the Z-order rewrite;
warehouses that care about worst-case pruning (Databricks liquid
clustering, Snowflake auto-clustering) use the Hilbert curve instead,
because Z-order's diagonal jumps put far-apart points in the same file.
This registers the head-to-head: both curves at the same 8-bit/dim
resolution over (l_orderkey, l_partkey), same top-5-bit file bucketing,
reporting each bucket's min/max footprint in BOTH dimensions — exactly
the Parquet footer ranges min/max pruning would see after each rewrite.
Tighter spans == fewer false-positive file reads.

The Hilbert index is the public xy2d algorithm (Wikipedia's C version):
per bit level s, the quadrant digit (3*rx XOR ry) weights s², then the
(x, y) frame is reflected/swapped. Both engines evaluate the SAME
generated 8-round expression chain — integer-only (masks, shifts,
CASE), so the audit hashes exactly. The Spark side is 8 chained
``select``s over BIGINT columns: one whole-stage-codegen pass, no UDF,
no shuffle before the final 64-group aggregate.

Scale note: a real rewrite is ``repartitionByRange(n_files, curve_key)
.sortWithinPartitions(curve_key)`` + Parquet write; the audit itself is
one scan + one 64-row aggregate at any corpus size, and the curve key
costs ~50 integer ops/row in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

H_BITS = 8  # curve resolution per dimension (256 x 256 grid)
H_SIDE = 1 << H_BITS
BUCKET_SHIFT = 2 * H_BITS - 5  # top 5 bits of the 16-bit index -> 32 files


def _round_sql(s: int, xor_fn) -> str:
    """One xy2d bit level as a SELECT over (a, b, x, y, d)."""
    n1 = H_SIDE - 1
    rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
    return (
        f"SELECT a, b, d + {s * s} * {xor_fn(f'(3 * {rx})', ry)} AS d, "
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {n1} - y ELSE y END)"
        " ELSE x END AS x, "
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {n1} - x ELSE x END)"
        " ELSE y END AS y"
    )


def _hilbert_chain(src: str, xor_fn) -> str:
    """Chained subqueries applying all H_BITS rounds; src must provide
    (a, b, x, y, d) with x/y already normalized to [0, side)."""
    q = src
    for i in range(H_BITS):
        s = 1 << (H_BITS - 1 - i)
        q = f"{_round_sql(s, xor_fn)} FROM ({q})"
    return q


def _zorder16(a: str, b: str, shl) -> str:
    terms = []
    for i in range(H_BITS):
        terms.append(shl(f"(({a} >> {i}) & 1)", 2 * i))
        terms.append(shl(f"(({b} >> {i}) & 1)", 2 * i + 1))
    return "(" + " + ".join(terms) + ")"


_DUCK_SRC = f"""
    SELECT l_orderkey AS a, l_partkey AS b,
           (l_orderkey * {H_SIDE - 1} // ma) AS x,
           (l_partkey * {H_SIDE - 1} // mb) AS y,
           0 AS d
    FROM lineitem, (SELECT max(l_orderkey) AS ma, max(l_partkey) AS mb
                    FROM lineitem) mx
"""

_SQL_HILBERT = f"""
    WITH hil AS (
        {_hilbert_chain(_DUCK_SRC, lambda p, q: f"xor({p}, {q})")}
    ),
    keys AS (
        SELECT 'hilbert' AS layout, a, b, d AS curve FROM hil
        UNION ALL
        SELECT 'zorder' AS layout, a, b,
               {_zorder16('x', 'y', lambda e, k: f"({e} << {k})")} AS curve
        FROM ({_DUCK_SRC})
    )
    SELECT layout, CAST(curve >> {BUCKET_SHIFT} AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(max(a) - min(a) AS BIGINT) AS span_a,
           CAST(max(b) - min(b) AS BIGINT) AS span_b
    FROM keys GROUP BY 1, 2
"""


@register(
    "s9_hilbert_layout",
    _SQL_HILBERT,
    doc="S9 layout: Hilbert-curve vs Z-order file buckets — per-bucket"
    " row count and min/max span of both clustered dimensions at the"
    " same 8-bit resolution",
    bench=True,
)
def s9_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit both curve layouts in one job: normalize the two cluster
    columns to the 256-grid, compute the Hilbert index by unrolling the
    8 xy2d bit levels as chained integer selects (reflection + swap per
    level, quadrant digit weighted s²) and the z-value by bit
    interleave, then report each top-5-bit bucket's row count and
    dimension spans. The span columns ARE the pruning quality: a
    predicate on either column skips every file whose span misses it."""
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(F.max("l_orderkey").alias("ma"), F.max("l_partkey").alias("mb"))
    base = li.crossJoin(F.broadcast(mx)).select(
        F.col("l_orderkey").alias("a"),
        F.col("l_partkey").alias("b"),
        F.expr(f"l_orderkey * {H_SIDE - 1} div ma").alias("x"),
        F.expr(f"l_partkey * {H_SIDE - 1} div mb").alias("y"),
        F.lit(0).cast("bigint").alias("d"),
    )
    hil = base
    n1 = H_SIDE - 1
    for i in range(H_BITS):
        s = 1 << (H_BITS - 1 - i)
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        hil = hil.select(
            "a",
            "b",
            F.expr(f"d + {s * s} * ((3 * {rx}) ^ {ry})").alias("d"),
            F.expr(
                f"CASE WHEN {ry} = 0 THEN"
                f" (CASE WHEN {rx} = 1 THEN {n1} - y ELSE y END)"
                " ELSE x END"
            ).alias("x"),
            F.expr(
                f"CASE WHEN {ry} = 0 THEN"
                f" (CASE WHEN {rx} = 1 THEN {n1} - x ELSE x END)"
                " ELSE y END"
            ).alias("y"),
        )
    zexpr = _zorder16("x", "y", lambda e, k: f"shiftleft({e}, {k})")
    keys = hil.select(
        F.lit("hilbert").alias("layout"), "a", "b", F.col("d").alias("curve")
    ).unionByName(
        base.select(
            F.lit("zorder").alias("layout"), "a", "b", F.expr(zexpr).alias("curve")
        )
    )
    return keys.groupBy(
        "layout", F.expr(f"curve >> {BUCKET_SHIFT}").cast("bigint").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        (F.max("a") - F.min("a")).cast("bigint").alias("span_a"),
        (F.max("b") - F.min("b")).cast("bigint").alias("span_b"),
    )
