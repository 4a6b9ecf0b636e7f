"""Skip-gram training pairs from the deterministic walk corpus — the
step that turns graph walks into (center, context) examples, i.e. the
DeepWalk pipeline's handoff to the embedding trainer.

Word2vec-style trainers consume (center, context) pairs harvested
from sequences within a +/-window; for graph embeddings the sequences
are the random walks (extensions/graphwalk). Pairing is a self-join
of the walk corpus on walk_id with |step distance| in [1, WINDOW] —
per-walk bounded (walks are L+1 rows), so the join output is at most
|walks| * L * 2W rows: linear in the corpus, no skew beyond walk
length. Counting collapses pairs into the weighted co-occurrence
table the trainer (or a downstream PMI/SPPMI factorization) reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.extensions.graphwalk import (
    _walks_oracle,
    gr_deterministic_walks,
)
from big_data_training_spark.lineage import truncate_lineage
from big_data_training_spark.registry import register

SG_WINDOW = 2
SG_TOP = 20


@register(
    "gr_walk_skipgrams",
    f"""
    WITH walks AS (
        {_walks_oracle()}
    ),
    pairs AS (
        SELECT a.node AS center, b.node AS context
        FROM walks a JOIN walks b
          ON b.walk_id = a.walk_id
         AND b.step <> a.step
         AND abs(b.step - a.step) <= {SG_WINDOW}
    )
    SELECT center, context, CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs
    GROUP BY 1, 2
    ORDER BY n_pairs DESC, center, context
    LIMIT {SG_TOP}
    """,
    doc=f"skip-gram (center, context) pair counts within a +/-"
    f"{SG_WINDOW} window over the deterministic walk corpus — the "
    f"graph-embedding trainer's input table, top {SG_TOP} pairs",
    bench=True,
)
def gr_walk_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join the walk corpus per walk within the window; count
    co-occurrences. The walk corpus is |walks| x (L+1) rows and the
    join key is walk_id, so the pair stage is one bounded-fan-out
    shuffle — the heavy lifting (graph traversal) already happened in
    the walk generator, which is the right split at scale."""
    walks = truncate_lineage(gr_deterministic_walks(spark, sf_dir))
    a = walks.selectExpr("walk_id", "step AS sa", "node AS center")
    b = walks.selectExpr("walk_id", "step AS sb", "node AS context")
    return (
        a.join(b, "walk_id")
        .filter(
            (F.col("sb") != F.col("sa"))
            & (F.abs(F.col("sb") - F.col("sa")) <= SG_WINDOW)
        )
        .groupBy("center", "context")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "center", "context")
        .limit(SG_TOP)
    )
