"""Text layer: tokenize / flatMap / word count / cleaning.

A1 keyed word count is the reference's canonical topology
(kafka/stream-top.png via kafka/README.md:343-345; flink/README.md:69-77):
lines → split into words (F5) → re-key per word (P5) → filter the
stop-word 'the' (T3) → group → stateful count. Here it is one
explode+groupBy — the explode is a pipelined flatMap (T2), the groupBy
the keyed shuffle + partial/final count.

Scale notes: explode multiplies rows ~|tokens| but never materializes
beyond the pipeline; the only shuffle keys on the word with map-side
partial counts, so hot words (Zipf skew) ship one partial row per
upstream partition, not one per occurrence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

STOPWORD = "the"


def tokens(col: str | Column = "text") -> Column:
    """F5: split on runs of whitespace, dropping empties."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


# DuckDB twin: documents.text is single-space separated, so a plain
# string_split(text, ' ') with empty-string filter is equivalent.
SQL_TOKENS = "list_filter(string_split({col}, ' '), w -> w <> '')"


@register(
    "a1_word_count",
    f"""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest({SQL_TOKENS.format(col='text')}) AS w FROM documents)
    WHERE w <> '{STOPWORD}'
    GROUP BY w
    """,
    doc="A1: the word-count topology (kafka/stream-top.png)",
    bench=True,
)
def a1_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode (flatMap T2) → stop-word filter (T3) → keyed count."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .filter(F.col("word") != STOPWORD)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "t1_map_projection",
    """
    SELECT doc_id, upper(lang) AS lang_uc, n_chars * 2 AS n_chars_2x
    FROM documents
    """,
    doc="T1: 1-in→1-out map (clean/convert), flink/README.md:21",
)
def t1_map_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure pipelined map — stays inside one WholeStageCodegen span."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        (F.col("n_chars") * 2).alias("n_chars_2x"),
    )


@register(
    "f7_cleaning",
    f"""
    SELECT doc_id,
           len({SQL_TOKENS.format(col='text')}) AS n_tokens,
           trim(lower(source)) AS source_clean,
           coalesce(lang, 'unknown') AS lang_filled
    FROM documents
    """,
    doc="F7: cleaning/normalization stage (README.md:21)",
)
def f7_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-fill + case/whitespace normalization + token counts."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        F.trim(F.lower("source")).alias("source_clean"),
        F.coalesce("lang", F.lit("unknown")).alias("lang_filled"),
    )


@register(
    "t2_flatmap_bigrams",
    f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKENS.format(col='text')} AS ws FROM documents
    )
    SELECT bigram, count(*) AS n
    FROM (SELECT unnest([concat(ws[i], ' ', ws[i + 1])
                         for i in generate_series(1, len(ws) - 1)]) AS bigram
          FROM toks)
    GROUP BY 1
    HAVING count(*) >= 5
    """,
    doc="T2: flatMap 1→0..n (bigram expansion), flink/README.md:22",
)
def t2_flatmap_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap to bigrams via zip of the token array with its own tail —
    array ops stay JVM-side (no Python in the row path)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens("text")
    bigrams = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )
