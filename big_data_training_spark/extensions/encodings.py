"""Weight-of-evidence / information-value binning — the credit-scoring
categorical encoder, joining the feature-engineering suite
(extensions/feateng.py: hashing, target encoding, string indexing,
negative sampling).

WOE(bin) = ln(P(x∈bin|y=1)/P(x∈bin|y=0)) is the supervised encoding
scorecards use, and IV = Σ (p₁−p₀)·WOE ranks features by predictive
power. Both need a log — here the shared 1/16-bit fixed-point log2
kernel (extensions/retrieval.py), signed by which class dominates the
bin, so the encoder is bit-exact in both engines (a float ln diverges
at the ulp between libm implementations; lm_collocations_pmi proved
the kernel route).

Scale: one shuffle reduces the corpus to per-bin (n, pos) cells over
the ~56 value buckets; the WOE/IV arithmetic runs on that bounded
table. The encoder's output (bin → woe16) is exactly the lookup a
scoring pipeline broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.infotheory import _apply_steps
from big_data_training_spark.extensions.retrieval import (
    _nest_sql,
    log2_fp16_steps,
)
from big_data_training_spark.registry import register

_Y = "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
_BIN_D = "CAST(floor(value * 1000) AS BIGINT) // 100000"
_BIN_S = "CAST(floor(value * 1000) AS BIGINT) div 100000"


def _woe_oracle() -> str:
    grid = f"""
    SELECT b, n, pos, neg, tp, tn,
           pos * tn AS num, neg * tp AS den
    FROM (
        SELECT {_BIN_D} AS b,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_Y}) AS BIGINT) AS pos,
               CAST(count(*) - sum({_Y}) AS BIGINT) AS neg
        FROM events GROUP BY 1
    ) cells,
    (SELECT CAST(sum({_Y}) AS BIGINT) AS tp,
            CAST(count(*) - sum({_Y}) AS BIGINT) AS tn
     FROM events) tot
    WHERE pos > 0 AND neg > 0
    """
    pos_side = _nest_sql(
        f"SELECT * FROM ({grid}) WHERE num >= den",
        log2_fp16_steps("num", "den", "woe16", " // "),
    )
    neg_side = _nest_sql(
        f"SELECT * FROM ({grid}) WHERE num < den",
        log2_fp16_steps("den", "num", "neg16", " // "),
    )
    return f"""
    WITH woed AS (
        SELECT b, n, pos, neg, tp, tn, CAST(woe16 AS BIGINT) AS woe16
        FROM ({pos_side})
        UNION ALL
        SELECT b, n, pos, neg, tp, tn, CAST(-neg16 AS BIGINT)
        FROM ({neg_side})
    )
    SELECT b AS bin, n, pos, neg, woe16,
           CAST((pos * 1000000 // tp - neg * 1000000 // tn) * woe16
                AS BIGINT) AS iv_contrib_u
    FROM woed
    ORDER BY bin
    """


@register(
    "fe_woe_iv_binning",
    _woe_oracle(),
    doc="weight-of-evidence encoding of value buckets vs the purchase"
    " label, with per-bin information-value contributions — exact"
    " 1/16-bit fixed-point logs",
)
def fe_woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scorecard encoder: per value-bucket WOE = log2-ratio of the
    bin's class shares in signed 16th-bits (base-2 vs ln is a constant
    factor — monotone, so feature ranking is unchanged), and the IV
    contribution (p₁−p₀)·WOE in composite fixed point (ppm × 16th-bit
    units). Bins with a zero class are excluded (the standard
    zero-cell rule; a deployment adds Laplace smoothing). One shuffle
    to ~56 bins, kernel arithmetic on the bounded table."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(F.expr(_BIN_S).alias("b")).agg(
        F.count("*").alias("n"),
        F.sum(F.expr(_Y)).cast("bigint").alias("pos"),
        (F.count("*") - F.sum(F.expr(_Y))).cast("bigint").alias("neg"),
    )
    tot = ev.agg(
        F.sum(F.expr(_Y)).cast("bigint").alias("tp"),
        (F.count("*") - F.sum(F.expr(_Y))).cast("bigint").alias("tn"),
    )
    grid = (
        cells.crossJoin(F.broadcast(tot))
        .filter((F.col("pos") > 0) & (F.col("neg") > 0))
        .selectExpr(
            "b", "n", "pos", "neg", "tp", "tn",
            "pos * tn AS num", "neg * tp AS den",
        )
    )
    pos_side = _apply_steps(
        grid.filter("num >= den"),
        log2_fp16_steps("num", "den", "woe16", " div "),
    ).selectExpr("b", "n", "pos", "neg", "tp", "tn",
                 "CAST(woe16 AS BIGINT) AS woe16")
    neg_side = _apply_steps(
        grid.filter("num < den"),
        log2_fp16_steps("den", "num", "neg16", " div "),
    ).selectExpr("b", "n", "pos", "neg", "tp", "tn",
                 "CAST(-neg16 AS BIGINT) AS woe16")
    return (
        pos_side.unionByName(neg_side)
        .selectExpr(
            "b AS bin",
            "n",
            "pos",
            "neg",
            "woe16",
            "CAST((pos * 1000000 div tp - neg * 1000000 div tn) * woe16"
            " AS BIGINT) AS iv_contrib_u",
        )
    )
