"""Good–Turing frequency smoothing: the count-of-counts table.

Completes the LM-statistics suite (Kneser–Ney discounting, bigram
continuations, Zipf checkpoints in extensions/lmstats.py and
corpusstats.py) with the other classic public smoother: Good–Turing
re-estimates a frequency-r type's effective count as
r* = (r+1)·N_{r+1}/N_r, and the total unseen-event mass as N_1/N
(Gale & Sampson's "simple Good–Turing" builds directly on this table).
Everything is ratios of integer counts, reported in permille with floor
division — bit-exact on both engines, no float smoothing curve.

Scale shape: one token-count shuffle (map-side combined), then a
count-of-counts aggregate over the *vocabulary* (already corpus-size-
free), then an O(R_MAX) report. The heavy stage is shared with every
other lm_* scan; the count-of-counts table is tiny (distinct
frequencies ≤ vocabulary size, in practice a few hundred rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.text import SQL_TOKENS, tokens
from big_data_training_spark.registry import register

GT_MAX_R = 10  # report the N smallest observed frequencies (synthetic
# corpora can have no singletons at all, so an absolute r<=K cut could
# return nothing; the smallest-observed cut always shows the head)

_SQL_GT = f"""
    WITH wc AS (
        SELECT w, count(*) AS freq
        FROM (SELECT unnest({SQL_TOKENS.format(col='text')}) AS w FROM documents)
        GROUP BY 1
    ),
    cofc AS (
        SELECT freq AS r, count(*) AS n_types FROM wc GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(freq) AS BIGINT) AS n_tokens,
               count(*) AS n_vocab
        FROM wc
    )
    SELECT CAST(c.r AS BIGINT) AS r,
           c.n_types,
           CAST(coalesce(cn.n_types, 0) AS BIGINT) AS n_types_next,
           CAST(((c.r + 1) * coalesce(cn.n_types, 0) * 1000) // c.n_types
               AS BIGINT) AS r_star_permille
    FROM cofc c LEFT JOIN cofc cn ON cn.r = c.r + 1
    WHERE c.r IN (SELECT r FROM cofc ORDER BY r ASC LIMIT {GT_MAX_R})
    UNION ALL
    SELECT 0 AS r,
           CAST(t.n_vocab AS BIGINT) AS n_types,
           CAST(coalesce((SELECT n_types FROM cofc WHERE r = 1), 0)
               AS BIGINT) AS n_types_next,
           CAST((coalesce((SELECT n_types FROM cofc WHERE r = 1), 0) * 1000)
               // t.n_tokens AS BIGINT) AS r_star_permille
    FROM tot t
"""


@register(
    "lm_good_turing",
    _SQL_GT,
    doc="Good-Turing count-of-counts: r* = (r+1)N_{r+1}/N_r in permille"
    f" at the {GT_MAX_R} smallest observed frequencies, plus the r=0"
    " unseen-mass row N_1/N",
)
def lm_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The smoothing table an n-gram LM reads before assigning mass to
    unseen words: for each observed frequency r, how many types carry it
    (N_r) and the Good–Turing adjusted count r* in permille; the r=0 row
    reports the full vocabulary size and the unseen-event probability
    mass N_1/N. Token counting is the shared whitespace tokenizer, so
    this composes with the Kneser–Ney and Zipf reports on the same
    vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    cofc = wc.groupBy(F.col("freq").alias("r")).agg(F.count("*").alias("n_types"))
    tot = wc.agg(
        F.sum("freq").alias("n_tokens"), F.count("*").alias("n_vocab")
    )
    nxt = cofc.select(
        (F.col("r") - 1).alias("r"), F.col("n_types").alias("n_types_next")
    )
    head = (
        cofc.orderBy(F.asc("r"))
        .limit(GT_MAX_R)
        .join(nxt, "r", "left")
        .select(
            F.col("r").cast("bigint").alias("r"),
            "n_types",
            F.coalesce("n_types_next", F.lit(0)).cast("bigint").alias("n_types_next"),
            F.expr("((r + 1) * coalesce(n_types_next, 0) * 1000) div n_types")
            .cast("bigint")
            .alias("r_star_permille"),
        )
    )
    c1 = (
        cofc.filter(F.col("r") == 1)
        .groupBy()
        .agg(F.coalesce(F.sum("n_types"), F.lit(0)).alias("n1"))
    )
    zero = (
        tot.crossJoin(F.broadcast(c1))
        .select(
            F.lit(0).cast("bigint").alias("r"),
            F.col("n_vocab").cast("bigint").alias("n_types"),
            F.col("n1").cast("bigint").alias("n_types_next"),
            F.expr("(n1 * 1000) div n_tokens").cast("bigint").alias(
                "r_star_permille"
            ),
        )
    )
    return head.unionByName(zero)
