"""Text analysis over the document corpus: quality scoring, language ID,
token counting, document fingerprinting.

All deterministic and expressed with built-in functions (JVM-side), so
each has an exact DuckDB oracle. At 100 TB these are embarrassingly
parallel scans — no shuffle except the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap


@register(
    "tx_chunking",
    f"""
    WITH t AS (
        SELECT doc_id, {SQL_TOKENS.format(col='text')} AS ws FROM documents
    )
    SELECT doc_id, CAST(i // {CHUNK_STRIDE} AS INT) AS chunk_idx,
           array_to_string(ws[i + 1 : i + {CHUNK_TOKENS}], ' ') AS chunk,
           CAST(least({CHUNK_TOKENS}, len(ws) - i) AS INT) AS chunk_len
    FROM t, (SELECT unnest(range(0, 100000, {CHUNK_STRIDE})) AS i)
    WHERE i < len(ws)
    """,
    doc="document chunking: fixed-size token windows with overlap",
)
def tx_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining chunker: stride-{CHUNK_STRIDE} windows of
    {CHUNK_TOKENS} tokens (overlap keeps boundary context). Pure array
    ops — sequence + slice + explode, no Python; rows expand ~len/stride
    but never materialize outside the pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens("text")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("ws") - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    return (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") > 0)
        .select("doc_id", "ws", F.explode(starts).alias("i"))
        .select(
            "doc_id",
            (F.col("i") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(F.col("ws"), F.col("i") + 1, F.lit(CHUNK_TOKENS))
            ).alias("chunk"),
            F.least(F.lit(CHUNK_TOKENS), F.size("ws") - F.col("i"))
            .cast("int")
            .alias("chunk_len"),
        )
    )


@register(
    "tx_pii_scrub",
    """
    WITH synth AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
                   AS raw
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                              '<EMAIL>', 'g'),
               '\\+?[0-9][0-9()\\-\\. ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
               AS n_emails
    FROM synth
    """,
    doc="PII scrubbing: email/phone redaction with counts",
)
def tx_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety filter for training corpora: regex redaction of emails and
    phone-shaped spans (synthetic PII appended so the operator has real
    work on the fixture). JVM regexp — no Python."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9][0-9()\-\. ]{7,}[0-9]"
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(raw, email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all(raw, F.lit(email_re), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
    )


@register(
    "tx_repetition",
    f"""
    WITH t AS (
        SELECT doc_id, {SQL_TOKENS.format(col='text')} AS ws FROM documents
    ), grams AS (
        SELECT doc_id,
               [array_to_string(ws[i:i+2], ' ')
                for i in generate_series(1, len(ws) - 2)] AS gs
        FROM t WHERE len(ws) >= 3
    ), freq AS (
        SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
        GROUP BY doc_id, g
    )
    SELECT doc_id, max(c) AS max_trigram_count,
           round(max(c)::DOUBLE / sum(c), 4) AS repetition_ratio
    FROM freq GROUP BY doc_id
    """,
    doc="repetition scoring: dominant trigram frequency ratio",
)
def tx_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/repetition quality signal: how dominant is the most
    frequent 3-gram. High ratio = templated/spammy text — a standard
    pretraining filter."""
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens("text")
    grams = F.expr(
        "transform(sequence(1, greatest(size(ws) - 2, 0)),"
        " i -> concat_ws(' ', slice(ws, i, 3)))"
    )
    return (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 3)
        .select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("max_trigram_count"),
            F.round(F.max("c") / F.sum("c"), 4).alias("repetition_ratio"),
        )
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


@register(
    "tx_split_assign",
    """
    SELECT doc_id,
           CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                      1, 15)) AS BIGINT) % 100 AS b
          FROM documents)
    """,
    doc="deterministic train/val/test split by salted content-key hash",
)
def tx_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split assignment: a salted md5 of the
    document key buckets each row, so membership is stable across runs,
    machines and engines (no rand(), no global sort or count needed —
    the property that matters when the corpus is rewritten incrementally
    at 100 TB: previously assigned docs never migrate splits)."""
    docs = load_table(spark, sf_dir, "documents")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return docs.select(
        "doc_id",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )


@register(
    "tx_stratified_sample",
    """
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)),
                                    1, 15)) AS BIGINT) % 1000 AS b
        FROM documents)
    WHERE b < (CASE WHEN lang = 'en' THEN 100 ELSE 300 END)
    """,
    doc="stratified per-language sampling via deterministic hash buckets",
)
def tx_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified downsampling (10% of the dominant 'en'
    stratum, 30% of the rest — the rebalancing move of a multilingual
    corpus build). Hash-bucket membership instead of rand() keeps the
    sample deterministic and join-stable; the filter is a pure map, so
    the sample never materializes the full corpus anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    rate = F.when(F.col("lang") == "en", 100).otherwise(300)
    return docs.select("doc_id", "lang", b.alias("b"), rate.alias("rate")).filter(
        F.col("b") < F.col("rate")
    ).select("doc_id", "lang")


@register(
    "tx_table_profile",
    """
    SELECT 'doc_id' AS column_name, count(doc_id) AS n_nonnull,
           count(DISTINCT doc_id) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_value,
           CAST(max(doc_id) AS VARCHAR) AS max_value
    FROM documents
    UNION ALL
    SELECT 'text', count(text), count(DISTINCT text),
           CAST(min(text) AS VARCHAR), CAST(max(text) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'lang', count(lang), count(DISTINCT lang),
           CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', count(source), count(DISTINCT source),
           CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(n_chars), count(DISTINCT n_chars),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    """,
    doc="one-pass table profile: null/distinct/min/max per column",
)
def tx_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (the first query run against any new corpus
    drop): per-column non-null count, exact distinct count, min and max
    — computed in ONE scan as a wide aggregate, then unpivoted to one
    row per column with stack(). The oracle spells it as five scans;
    Spark executes ours as a single pass, which is the difference that
    matters when the table is 100 TB. min/max compare in native type
    and cast to string only for display."""
    docs = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.countDistinct(c).alias(f"{c}__d"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__d, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nonnull, n_distinct, min_value, max_value)"
        )
    )


@register(
    "tx_token_pack",
    """
    WITH t AS (
        SELECT doc_id, source,
               CAST(ceil(len(text) / 4.0) AS BIGINT) AS n_tok
        FROM documents
    ), c AS (
        SELECT doc_id, source, n_tok,
               sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT source, CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM c GROUP BY 1, 2
    """,
    doc="sequence packing: fixed 2048-token bins per source shard",
    bench=True,
)
def tx_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~2048-token training sequences: a running
    token total per source shard (window cumsum), bin = the budget
    multiple the PREVIOUS cumulative total sits in, so a document that
    crosses a boundary starts its own bin (deterministic sequential
    packing — the streaming-friendly approximation of bin packing that
    real pretraining pipelines use; greedy best-fit would need global
    state). One shuffle on source; the window sort is per-shard, which
    is exactly how a 100 TB corpus is physically laid out anyway."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.withColumn(
            "pack_id",
            F.floor((F.col("cum") - F.col("n_tok")) / 2048.0).cast("bigint"),
        )
        .groupBy("source", "pack_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )


@register(
    "tx_mixture_rebalance",
    """
    WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
    m AS (SELECT min(n) AS mn FROM cnt)
    SELECT d.doc_id AS doc_id, d.lang AS lang
    FROM documents d JOIN cnt ON d.lang = cnt.lang, m
    WHERE CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)),
                               1, 15)) AS BIGINT) % 1000000
          < CAST(m.mn AS DOUBLE) / cnt.n * 1000000
    """,
    doc="dataset mixture rebalance: hash-downsample each language to the smallest stratum",
)
def tx_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equalize the language mixture by downsampling every stratum to
    the size of the smallest one (expected-count equality via hash
    buckets — deterministic, no rand(), no per-stratum limit/sort).
    The per-stratum counts are one aggregate broadcast back onto the
    scan, so the whole rebalance is a single full pass regardless of
    corpus size; changing the target mixture only changes the keep-rate
    expression."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang").agg(F.count("*").alias("n"))
    mn = cnt.agg(F.min("n").alias("mn"))
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    return (
        docs.join(F.broadcast(cnt), "lang")
        .join(F.broadcast(mn))
        .filter(b < F.col("mn").cast("double") / F.col("n") * 1000000)
        .select("doc_id", "lang")
    )


TFIDF_TOP_K = 3


@register(
    "tx_tfidf_top_terms",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({SQL_TOKENS.format(col='text')}) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM tf
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * ((n.n_docs - df.df + 0.5) / (df.df + 0.5)) AS score
        FROM tf JOIN df ON df.term = tf.term, n
    )
    SELECT doc_id, term, tf, df, score FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
        FROM scored
    ) WHERE rn <= {TFIDF_TOP_K}
    """,
    doc="TF-IDF top terms per document (rational BM25-style idf — "
    "engine-exact; keyword extraction for corpus curation)",
)
def tx_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: term frequency joined with document frequency
    and ranked per doc. The idf is the rational BM25 form
    (N - df + 0.5)/(df + 0.5) rather than a log — same monotonicity,
    but every arithmetic step is IEEE-identical across engines, so the
    scores (not just the ranks) verify exactly.

    Scale: tf is one shuffle on (doc, term); df one on term; the join
    back is term-keyed (broadcastable when the vocabulary is small);
    the per-doc top-k plans WindowGroupLimit, so the rank shuffle
    carries at most k rows per document."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = tf.agg(F.count_distinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * ((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_K)
        .drop("rn")
    )


@register(
    "tx_vocab_growth",
    """
    WITH grams AS (
        SELECT doc_id,
               unnest([substr(text, i, 3)
                       for i in generate_series(1, len(text) - 2)]) AS g
        FROM documents WHERE len(text) >= 3
    ), first_seen AS (
        SELECT g, min(doc_id) AS first_doc
        FROM grams GROUP BY g
    ), width AS (
        SELECT (max(doc_id) // 50) + 1 AS bw FROM documents
    ), bucketed AS (
        SELECT first_doc // (SELECT bw FROM width) AS doc_bucket,
               count(*) AS new_grams
        FROM first_seen GROUP BY 1
    )
    SELECT doc_bucket, new_grams,
           CAST(sum(new_grams) OVER (ORDER BY doc_bucket) AS BIGINT)
               AS vocab_size
    FROM bucketed
    """,
    doc="vocabulary growth curve: first-seen char trigrams per ingestion bucket",
    bench=True,
)
def tx_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-monitoring heap law in practice: character trigrams are
    attributed to the bucket of the first document that used them (min
    over doc_id — a partial-agg-friendly shuffle on the gram), then a
    running sum gives the vocabulary-size curve. Char trigrams, not
    words: the unit must be large-vocabulary for the curve to have
    shape (the fixtures' word vocabulary is a few dozen types, all
    first seen in bucket 0). A flattening curve says the crawl is
    saturating; a jump flags a domain shift. The running sum's window
    is over a fixed ~50 bucket rows — bounded by construction, never
    corpus-scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.length("text") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 2, 0)),"
                " i -> substring(text, i, 3))"
            )
        ).alias("w"),
    )
    first_seen = toks.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    # fixed 50-bucket width derived from the data: the running-sum window
    # below therefore always spans ~50 rows no matter how large the
    # corpus — a bounded global window, not a per-doc funnel.
    width = docs.agg(F.expr("(max(doc_id) div 50) + 1").alias("bw"))
    bucketed = (
        first_seen.crossJoin(F.broadcast(width))
        .groupBy(F.expr("first_doc div bw").alias("doc_bucket"))
        .agg(F.count("*").alias("new_grams"))
    )
    w = Window.orderBy("doc_bucket").rowsBetween(Window.unboundedPreceding, 0)
    return bucketed.select(
        "doc_bucket",
        "new_grams",
        F.sum("new_grams").over(w).cast("bigint").alias("vocab_size"),
    )
