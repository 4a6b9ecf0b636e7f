"""Text analysis over the document corpus: quality scoring, language ID,
token counting, document fingerprinting.

All deterministic and expressed with built-in functions (JVM-side), so
each has an exact DuckDB oracle. At 100 TB these are embarrassingly
parallel scans — no shuffle except the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.text import SQL_TOKENS, tokens
from big_data_training_spark.registry import register

# A tiny English stopword list for quality/LID heuristics. Deterministic
# and engine-portable (identical list in the oracle SQL).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_SQL_STOP = "['" + "','".join(EN_STOPWORDS) + "']"


@register(
    "tx_quality_score",
    f"""
    WITH t AS (
        SELECT doc_id, n_chars, {SQL_TOKENS.format(col='text')} AS ws FROM documents
    )
    SELECT doc_id,
           len(ws) AS n_tokens,
           round(n_chars::DOUBLE / len(ws), 4) AS avg_token_len,
           round(len(list_filter(ws, w -> list_contains({_SQL_STOP}, w)))::DOUBLE
                 / len(ws), 4) AS stopword_ratio,
           round(len(list_distinct(ws))::DOUBLE / len(ws), 4) AS distinct_ratio
    FROM t WHERE len(ws) > 0
    """,
    doc="text quality scoring: length / stopword / vocabulary-diversity ratios",
    bench=True,
)
def tx_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features — the standard pretraining-corpus
    filters (length, stopword ratio, repetition) as one scan."""
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens("text")
    n = F.size("ws")
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    return (
        docs.select("doc_id", "n_chars", ws.alias("ws"))
        .filter(F.size("ws") > 0)
        .select(
            "doc_id",
            n.cast("bigint").alias("n_tokens"),
            F.round(F.col("n_chars") / n, 4).alias("avg_token_len"),
            F.round(
                F.size(F.filter(F.col("ws"), lambda w: F.array_contains(stop_arr, w)))
                / n,
                4,
            ).alias("stopword_ratio"),
            F.round(F.size(F.array_distinct("ws")) / n, 4).alias("distinct_ratio"),
        )
    )


@register(
    "tx_lang_id",
    f"""
    WITH t AS (
        SELECT doc_id, lang, {SQL_TOKENS.format(col='text')} AS ws FROM documents
    ), scored AS (
        SELECT doc_id, lang,
               len(list_filter(ws, w -> list_contains({_SQL_STOP}, w)))::DOUBLE
                   / len(ws) AS en_score
        FROM t WHERE len(ws) > 0
    )
    SELECT doc_id, lang,
           CASE WHEN en_score >= 0.05 THEN 'en' ELSE 'other' END AS predicted,
           round(en_score, 4) AS en_score
    FROM scored
    """,
    doc="language ID: stopword-overlap n-gram heuristic",
)
def tx_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic LID: fraction of tokens in an English function-word list.
    (The fixture corpus shares one synthetic vocabulary across langs, so
    accuracy is incidental; the operator contract is the deterministic
    score + decision.)"""
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    en_score = F.size(
        F.filter(tokens("text"), lambda w: F.array_contains(stop_arr, w))
    ) / F.size(tokens("text"))
    return (
        docs.filter(F.size(tokens("text")) > 0)
        .select(
            "doc_id",
            "lang",
            F.when(en_score >= 0.05, F.lit("en")).otherwise(F.lit("other")).alias(
                "predicted"
            ),
            F.round(en_score, 4).alias("en_score"),
        )
    )


@register(
    "tx_fingerprint",
    f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               {SQL_TOKENS.format(col='text')})), ' ')) AS fingerprint
    FROM documents
    """,
    doc="document fingerprint: md5 of the sorted distinct-token bag",
)
def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint (bag-of-words hash) — the
    cheap exact-dup key for shuffle-based dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens("text"))))
        ).alias("fingerprint"),
    )


@register(
    "tx_token_count_bpe",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
           CAST(ceil(len(text) / 4.0) AS BIGINT) AS n_tokens_est
    FROM documents
    """,
    doc="token counting: BPE-ish regex segmentation + chars/4 estimator",
)
def tx_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-free token counting: regex word/number/punct segmentation
    plus the chars/4 LLM-token estimate."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
            )
        ).cast("bigint").alias("n_bpe_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_tokens_est"),
    )
