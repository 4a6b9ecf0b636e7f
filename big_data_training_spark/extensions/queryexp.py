"""Query expansion: Rocchio pseudo-relevance feedback over the BM25
stack (extensions/retrieval.py) — the classic close-the-loop retrieval
operator: run the query, treat the top-R results as relevant, and mine
the terms that characterize them to expand the query.

Single-sourcing: the feedback set IS ``ix_bm25_topk``'s ranking — the
Spark side calls the registered query function, the oracle embeds the
same certified BM25 CTE — so the expansion provably consumes the
serving ranking, not a re-derivation that could drift.

Exactness: term weights are tf_sum x idf16 where idf16 is the same
1/16-bit fixed-point log2 kernel BM25 ranks with (all-int64, identical
text in both dialects), so the expansion ranking is bit-stable across
engines.

Scale: the feedback token aggregation is a broadcast semi-join of the
corpus against R=10 doc ids (one scan, prunes to matching docs at the
parquet reader); the df lookup for candidate terms is a term-keyed
shuffle bounded by the candidate vocabulary (union of R documents'
terms), never the corpus vocabulary; everything after is broadcast-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.retrieval import (
    BM25_TERMS,
    _bm25_oracle,
    _nest_sql,
    _TOKS,
    ix_bm25_topk,
    log2_fp16_steps,
)
from big_data_training_spark.registry import register

EXPANSION_TOP = 10
MIN_CAND_DF = 2


def _rocchio_oracle() -> str:
    not_in = ", ".join(f"'{t}'" for t in BM25_TERMS)
    steps = log2_fp16_steps("2 * n + 2", "2 * df + 1", "idf16", " // ")
    idfd = _nest_sql(
        "SELECT term, tf_sum, df, n FROM joined", steps
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), clean AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    n AS (SELECT count(*) AS n FROM documents),
    top10 AS (SELECT doc_id FROM ({_bm25_oracle()})),
    fb_tf AS (
        SELECT c.term, count(*) AS tf_sum
        FROM clean c JOIN top10 USING (doc_id)
        GROUP BY 1
    ),
    cand_df AS (
        SELECT c.term, count(DISTINCT c.doc_id) AS df
        FROM clean c
        JOIN (SELECT DISTINCT term FROM fb_tf) cand USING (term)
        GROUP BY 1
    ),
    joined AS (
        SELECT f.term AS term, f.tf_sum AS tf_sum, d.df AS df, n.n AS n
        FROM fb_tf f JOIN cand_df d USING (term) CROSS JOIN n
    ),
    weighted AS ({idfd})
    SELECT term,
           CAST(tf_sum AS BIGINT) AS tf_sum,
           CAST(df AS BIGINT) AS doc_freq,
           CAST(idf16 AS BIGINT) AS idf16,
           CAST(tf_sum * idf16 AS BIGINT) AS rocchio_scaled
    FROM weighted
    WHERE term NOT IN ({not_in}) AND df >= {MIN_CAND_DF}
    ORDER BY rocchio_scaled DESC, term
    LIMIT {EXPANSION_TOP}
    """


@register(
    "ix_rocchio_expansion",
    _rocchio_oracle(),
    doc=f"Rocchio pseudo-relevance feedback: top-{EXPANSION_TOP}"
    f" expansion terms (tf_sum x fixed-point idf) mined from BM25's"
    f" top-10 result docs for {' '.join(BM25_TERMS)!r}",
    bench=True,
)
def ix_rocchio_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the retrieval loop: the BM25 top-10 docs are assumed
    relevant (pseudo-relevance feedback), their concatenated text is
    the Rocchio positive centroid, and the highest tf x idf terms in
    it — minus the original query terms — are the expansion
    candidates a second-round query would add. The feedback tf table
    is corpus-scan + broadcast-semi-join against 10 doc ids; document
    frequencies are computed only for the candidate vocabulary (a
    term-keyed shuffle bounded by the feedback docs' vocab); idf is
    the same 1/16-bit fixed-point log2 BM25 itself ranks with, so the
    whole expansion is integer-exact."""
    docs = load_table(spark, sf_dir, "documents")
    fb = ix_bm25_topk(spark, sf_dir).select("doc_id")
    clean = docs.select(
        "doc_id", F.explode(F.expr(_TOKS)).alias("term")
    )
    fb_tf = (
        clean.join(F.broadcast(fb), "doc_id")
        .groupBy("term")
        .agg(F.count("*").alias("tf_sum"))
    )
    cand = fb_tf.select("term").distinct()
    cand_df = (
        clean.join(F.broadcast(cand), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    n = docs.agg(F.count("*").alias("n"))
    joined = fb_tf.join(cand_df, "term").crossJoin(F.broadcast(n))
    for name, expr in log2_fp16_steps(
        "2 * n + 2", "2 * df + 1", "idf16", " div "
    ):
        joined = joined.selectExpr("*", f"{expr} AS {name}")
    return (
        joined.filter(
            ~F.col("term").isin(*BM25_TERMS)
            & (F.col("df") >= MIN_CAND_DF)
        )
        .select(
            "term",
            F.col("tf_sum").cast("bigint").alias("tf_sum"),
            F.col("df").cast("bigint").alias("doc_freq"),
            F.col("idf16").cast("bigint").alias("idf16"),
            F.expr("CAST(tf_sum * idf16 AS BIGINT)").alias("rocchio_scaled"),
        )
        .orderBy(F.desc("rocchio_scaled"), F.asc("term"))
        .limit(EXPANSION_TOP)
    )
