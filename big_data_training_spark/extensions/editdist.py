"""Entity resolution by blocked edit distance — the classic
dedup-for-dirty-names operator (Levenshtein is exact INTEGER in both
engines' built-ins, so unlike jaro-winkler it is oracle-safe and runs
JVM-side in Spark's codegen — no UDF).

Complements the set-similarity family (trigram Jaccard, PPJoin,
MinHash): token-set methods miss single-character typos that edit
distance catches, which is why production ER stacks run both. The
all-pairs trap is handled the standard way: BLOCK first (here: shared
first token + second-token length within +/-1), compare only within
blocks. The report is per-block candidate/match counts — the blocking
QUALITY audit an ER pipeline tunes (block width vs recall), output
bounded by the number of blocks.

Scale: one shuffle on the block key; within-block pair fan-out is
sum_b |b|^2 — the operator reports exactly the numbers you need to
see a hot block BEFORE it explodes (same philosophy as
dd_lsh_bucket_skew), and the length band cuts each block's fan-out
further. Edit distance evaluates inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.hints import broadcast_gate, table_count
from big_data_training_spark.registry import register

LEV_MAX = 2


@register(
    "er_blocked_editdist",
    f"""
    WITH p AS (
        SELECT p_partkey AS pk, p_name AS name,
               string_split(p_name, ' ')[1] AS blk,
               length(p_name) AS ln
        FROM part
    ),
    pairs AS (
        SELECT a.blk AS blk,
               CASE WHEN levenshtein(a.name, b.name) <= {LEV_MAX}
                    THEN 1 ELSE 0 END AS hit
        FROM p a JOIN p b
          ON b.blk = a.blk AND a.pk < b.pk
         AND abs(a.ln - b.ln) <= 1
    ),
    members AS (
        SELECT blk, CAST(count(*) AS BIGINT) AS n_members
        FROM p GROUP BY 1
    ),
    agg AS (
        SELECT blk,
               CAST(count(*) AS BIGINT) AS n_candidate_pairs,
               CAST(sum(hit) AS BIGINT) AS n_matches
        FROM pairs GROUP BY 1
    )
    SELECT a.blk AS block_token, m.n_members,
           a.n_candidate_pairs, a.n_matches
    FROM agg a JOIN members m ON m.blk = a.blk
    ORDER BY block_token
    """,
    doc=f"blocked Levenshtein entity resolution over part names: "
    f"first-token blocks, +/-1 length band, edit distance <= "
    f"{LEV_MAX}; per-block member/candidate/match counts (the "
    f"blocking-quality audit)",
    bench=True,
)
def er_blocked_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block -> band -> compare: the ER triangle. The self-join is
    keyed on the block token (one shuffle), the length band prunes
    the in-block fan-out, and levenshtein() is a JVM built-in so the
    comparison stays in codegen. The output IS the skew report: a
    block whose candidate count dwarfs its member count is the one to
    re-key before scaling 100x."""
    part = load_table(spark, sf_dir, "part")
    p = part.selectExpr(
        "p_partkey AS pk",
        "p_name AS name",
        "split(p_name, ' ')[0] AS blk",
        "length(p_name) AS ln",
    )
    members = p.groupBy("blk").agg(F.count("*").alias("n_members"))
    # members is block-keyed (distinct first tokens <= |part|); the
    # parquet-metadata count bounds the broadcast, shuffle past it.
    # row_bytes models (short string token + long) rather than the
    # 16 B numeric-lookup default.
    bcast = broadcast_gate(table_count(spark, sf_dir, "part"), row_bytes=48)
    a = p.selectExpr("blk", "pk AS pka", "name AS na", "ln AS lna")
    b = p.selectExpr("blk", "pk AS pkb", "name AS nb", "ln AS lnb")
    pairs = (
        a.join(b, "blk")
        .filter("pka < pkb AND abs(lna - lnb) <= 1")
        .selectExpr(
            "blk",
            f"CASE WHEN levenshtein(na, nb) <= {LEV_MAX}"
            f" THEN 1 ELSE 0 END AS hit",
        )
    )
    return (
        pairs.groupBy("blk")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_candidate_pairs"),
            F.expr("CAST(sum(hit) AS BIGINT)").alias("n_matches"),
        )
        .join(bcast(members), "blk")
        .selectExpr(
            "blk AS block_token",
            "CAST(n_members AS BIGINT) AS n_members",
            "n_candidate_pairs",
            "n_matches",
        )
        .orderBy("block_token")
    )
