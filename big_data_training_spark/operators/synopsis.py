"""Wavelet synopses: integer Haar decomposition of a value histogram
and the top-coefficient summary — the classic OLAP synopsis
(Matias/Vitter/Wang SIGMOD'98) that answers range-count queries from
a handful of numbers.

Shape at scale: the raw scan collapses to a BOUNDED histogram (64
width-8 buckets over the value domain — same bounded-cumsum argument
as the AUC/histogram operators), and the transform itself runs on
that 64-row table: 6 levels of pair-sum/pair-difference aggregations,
each a groupBy(idx div 2) over <= 64 rows. The synopsis is the top-8
coefficients by retained energy; with unnormalized integer Haar the
orthonormal energy of a level-l detail d is d^2/2^l, so scaling by
2^levels keeps Parseval exact in BIGINT: E*64 = sum d^2 * 2^(6-l)
+ s^2. Everything — coefficients, energy shares, ranking — is
engine-identical integer math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

N_BUCKETS = 64
BUCKET_W = 8
LEVELS = 6  # log2(N_BUCKETS)
SYN_TOP = 8


def _haar_oracle() -> str:
    ctes = [
        f"""h AS (
        SELECT CAST(floor(value / {BUCKET_W}) AS BIGINT) AS idx,
               count(*) AS c
        FROM events GROUP BY 1
    )""",
        f"""l0 AS (
        SELECT g.idx AS idx, coalesce(h.c, 0) AS s
        FROM (SELECT unnest(range({N_BUCKETS})) AS idx) g
        LEFT JOIN h ON h.idx = g.idx
    )""",
    ]
    for k in range(1, LEVELS + 1):
        ctes.append(
            f"""l{k} AS (
            SELECT t.idx // 2 AS idx,
                   CAST(sum(t.s * (CASE WHEN t.idx % 2 = 0
                                        THEN 1 ELSE -1 END))
                        AS BIGINT) AS d,
                   CAST(sum(t.s) AS BIGINT) AS s
            FROM l{k - 1} t GROUP BY 1
        )"""
        )
    details = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS level, CAST(idx AS BIGINT) AS idx,"
        f" d AS coeff, d * d * {1 << (LEVELS - k)} AS e FROM l{k}"
        for k in range(1, LEVELS + 1)
    )
    return f"""
    WITH {','.join(ctes)},
    coeffs AS (
        {details}
        UNION ALL
        SELECT CAST(0 AS BIGINT) AS level, CAST(0 AS BIGINT) AS idx,
               s AS coeff, s * s AS e
        FROM l{LEVELS}
    ),
    tot AS (SELECT CAST(sum(e) AS BIGINT) AS te FROM coeffs),
    ranked AS (
        SELECT level, idx, coeff, e,
               row_number() OVER (ORDER BY e DESC, level, idx) AS rnk
        FROM coeffs
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, level, idx, coeff,
           CAST(e * 1000000 // te AS BIGINT) AS energy_ppm
    FROM ranked CROSS JOIN tot
    WHERE rnk <= {SYN_TOP}
    ORDER BY rnk
    """


@register(
    "syn_haar_histogram",
    _haar_oracle(),
    doc=f"Haar-wavelet synopsis of the event-value histogram: "
    f"{N_BUCKETS} buckets -> {LEVELS}-level integer transform, top "
    f"{SYN_TOP} coefficients by exact Parseval energy share (ppm)",
)
def syn_haar_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus scan builds the bounded histogram; the wavelet
    cascade then runs entirely on <= 64-row tables (level k pairs
    bucket 2i with 2i+1: detail = difference, smooth = sum). The
    released synopsis — 8 coefficients — answers any range-count to
    within the dropped-energy bound, which is the point at 100 TB:
    the synopsis is what you ship to the dashboard, not the scan."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    h = ev.selectExpr(
        f"CAST(floor(value / {BUCKET_W}) AS BIGINT) AS idx"
    ).groupBy("idx").agg(F.count("*").alias("c"))
    cur = (
        spark.range(N_BUCKETS)
        .selectExpr("CAST(id AS BIGINT) AS idx")
        .join(h, "idx", "left")
        .selectExpr("idx", "CAST(coalesce(c, 0) AS BIGINT) AS s")
    )
    coeff_legs = []
    for k in range(1, LEVELS + 1):
        lvl = cur.groupBy(F.expr("idx div 2").alias("idx")).agg(
            F.expr(
                "CAST(sum(s * (CASE WHEN idx % 2 = 0 THEN 1 ELSE -1 END))"
                " AS BIGINT)"
            ).alias("d"),
            F.expr("CAST(sum(s) AS BIGINT)").alias("s"),
        )
        coeff_legs.append(
            lvl.selectExpr(
                f"CAST({k} AS BIGINT) AS level",
                "CAST(idx AS BIGINT) AS idx",
                "d AS coeff",
                f"d * d * {1 << (LEVELS - k)} AS e",
            )
        )
        cur = lvl.select("idx", "s")
    coeff_legs.append(
        cur.selectExpr(
            "CAST(0 AS BIGINT) AS level",
            "CAST(0 AS BIGINT) AS idx",
            "s AS coeff",
            "s * s AS e",
        )
    )
    coeffs = coeff_legs[0]
    for leg in coeff_legs[1:]:
        coeffs = coeffs.unionAll(leg)
    tot = coeffs.agg(F.expr("CAST(sum(e) AS BIGINT)").alias("te"))
    w = Window.orderBy(F.desc("e"), "level", "idx")
    return (
        coeffs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= SYN_TOP)
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "rnk",
            "level",
            "idx",
            "coeff",
            "CAST(e * 1000000 div te AS BIGINT) AS energy_ppm",
        )
        .orderBy("rnk")
    )
