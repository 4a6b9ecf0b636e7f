"""Heaps'-law exponent fit: V(n) ~ K * n^beta estimated from the
vocabulary-growth checkpoints — the one-number summary of how fast a
crawl keeps discovering new vocabulary (beta near 1: still novel;
beta small: saturating; a regime change between snapshots flags a
domain shift).

Fit: ordinary least squares on the log-log curve, with BOTH logs from
the 1/16-bit fixed-point kernel and the slope as a division-last
integer rational — beta_milli = 1000*(n*Sxy - Sx*Sy) //
(n*Sxx - Sx*Sx). Checkpoints are the same ~50 ingestion buckets
tx_vocab_growth reports (cumulative char-trigram tokens vs cumulative
distinct trigrams), so the regression runs over a bounded table and
every intermediate is a small exact BIGINT (x, y <= 16*log2(2^42)).

Scale: one gram scan -> two bounded aggregates; the fit itself is a
single reduce over <= 50 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.retrieval import (
    _nest_sql,
    log2_fp16_steps,
)
from big_data_training_spark.registry import register


def _heaps_oracle() -> str:
    steps = log2_fp16_steps("cum_toks", "1", "x16", " // ", pfx="hx") + \
        log2_fp16_steps("vocab", "1", "y16", " // ", pfx="hy")
    logged = _nest_sql(
        "SELECT doc_bucket, cum_toks, vocab FROM curve", steps
    )
    return f"""
    WITH grams AS (
        SELECT doc_id,
               unnest([substr(text, i, 3)
                       for i in generate_series(1, len(text) - 2)]) AS g
        FROM documents WHERE len(text) >= 3
    ),
    width AS (SELECT (max(doc_id) // 50) + 1 AS bw FROM documents),
    toks_b AS (
        SELECT doc_id // (SELECT bw FROM width) AS doc_bucket,
               count(*) AS n_toks
        FROM grams GROUP BY 1
    ),
    first_seen AS (
        SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
    ),
    new_b AS (
        SELECT first_doc // (SELECT bw FROM width) AS doc_bucket,
               count(*) AS new_grams
        FROM first_seen GROUP BY 1
    ),
    curve AS (
        SELECT t.doc_bucket AS doc_bucket,
               sum(t.n_toks) OVER (ORDER BY t.doc_bucket) AS cum_toks,
               sum(coalesce(n.new_grams, 0)) OVER (ORDER BY t.doc_bucket)
                   AS vocab
        FROM toks_b t LEFT JOIN new_b n ON n.doc_bucket = t.doc_bucket
    ),
    logged AS ({logged}),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x16) AS BIGINT) AS sx,
               CAST(sum(y16) AS BIGINT) AS sy,
               CAST(sum(x16 * x16) AS BIGINT) AS sxx,
               CAST(sum(x16 * y16) AS BIGINT) AS sxy
        FROM logged
    )
    SELECT n AS n_checkpoints,
           CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                     ELSE 1000 * (n * sxy - sx * sy) // (n * sxx - sx * sx)
                END AS BIGINT) AS beta_milli
    FROM s
    """


@register(
    "lm_heaps_exponent",
    _heaps_oracle(),
    doc="Heaps'-law exponent from the vocab-growth checkpoints: "
    "log-log OLS slope in exact milli units, logs from the 1/16-bit "
    "kernel — the crawl-saturation dial",
    bench=True,
)
def lm_heaps_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """beta from V ~ K n^beta over ~50 ingestion buckets: cumulative
    trigram tokens (x) vs cumulative distinct trigrams (y), both in
    fixed-point log2, slope division-last. The windows run over the
    bounded bucket table; the corpus is scanned once for grams."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.filter(F.length("text") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 2, 0)),"
                " i -> substring(text, i, 3))"
            )
        ).alias("g"),
    )
    width = docs.agg(F.expr("(max(doc_id) div 50) + 1").alias("bw"))
    toks_b = (
        grams.crossJoin(F.broadcast(width))
        .groupBy(F.expr("doc_id div bw").alias("doc_bucket"))
        .agg(F.count("*").alias("n_toks"))
    )
    new_b = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("first_doc"))
        .crossJoin(F.broadcast(width))
        .groupBy(F.expr("first_doc div bw").alias("doc_bucket"))
        .agg(F.count("*").alias("new_grams"))
    )
    w = Window.orderBy("doc_bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    curve = (
        toks_b.join(new_b, "doc_bucket", "left")
        .select(
            "doc_bucket",
            F.sum("n_toks").over(w).alias("cum_toks"),
            F.sum(F.coalesce("new_grams", F.lit(0))).over(w).alias(
                "vocab"
            ),
        )
    )
    steps = log2_fp16_steps(
        "cum_toks", "1", "x16", " div ", pfx="hx"
    ) + log2_fp16_steps("vocab", "1", "y16", " div ", pfx="hy")
    for name, expr in steps:
        curve = curve.selectExpr("*", f"{expr} AS {name}")
    s = curve.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n"),
        F.expr("CAST(sum(x16) AS BIGINT)").alias("sx"),
        F.expr("CAST(sum(y16) AS BIGINT)").alias("sy"),
        F.expr("CAST(sum(x16 * x16) AS BIGINT)").alias("sxx"),
        F.expr("CAST(sum(x16 * y16) AS BIGINT)").alias("sxy"),
    )
    return s.selectExpr(
        "n AS n_checkpoints",
        # a degenerate fit (all checkpoints in one bucket -> zero x
        # variance) must yield NULL, not an ANSI divide-by-zero
        "CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL"
        " ELSE 1000 * (n * sxy - sx * sy) div (n * sxx - sx * sx)"
        " END AS BIGINT) AS beta_milli",
    )
