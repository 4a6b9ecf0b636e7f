"""RAKE keyword extraction (Rapid Automatic Keyword Extraction, Rose
et al. 2010 — public algorithm): candidate phrases are the maximal
token runs between stopwords; a word scores deg/freq where deg sums
the lengths of the phrases it appears in; a phrase scores the sum of
its words' scores.

Spark-first shape: phrase segmentation is a per-document cumulative
window (islands = running count of stopword delimiters — the
gaps-and-islands idiom, same as ev_streak_islands), word statistics
are one term-keyed shuffle, and the phrase scoring joins word scores
(a vocabulary-sized table) back onto phrase members. Nothing is
quadratic; the corpus-sized work is the tokenize scan plus two keyed
aggregations — word-count shape at any scale.

Exactness: scores are permille integers via floor division (Spark
``div`` == DuckDB ``//`` on BIGINT); phrase text is reconstructed with
an order-pinned aggregation in both dialects (ORDER BY position), so
rows hash identically across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

RAKE_STOPWORDS = ("a", "the")
RAKE_TOP_WORDS = 20
RAKE_TOP_PHRASES = 15
RAKE_MAX_PHRASE_LEN = 8  # longer runs are word soup, not keyphrases

_STOP_IN = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)

_SQL_ISLANDS = f"""
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    words AS (
        SELECT doc_id, w, o
        FROM (SELECT doc_id, unnest(ws) AS w,
                     generate_subscripts(ws, 1) AS o
              FROM toks)
        WHERE w <> ''
    ),
    marked AS (
        SELECT doc_id, w, o,
               CASE WHEN w IN ({_STOP_IN}) THEN 1 ELSE 0 END AS is_stop,
               CAST(sum(CASE WHEN w IN ({_STOP_IN}) THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY o) AS BIGINT)
                   AS island
        FROM words
    ),
    members AS (
        SELECT doc_id, island, w, o
        FROM marked WHERE is_stop = 0
    ),
    phrases AS (
        SELECT doc_id, island, count(*) AS plen
        FROM members GROUP BY 1, 2
        HAVING count(*) <= {RAKE_MAX_PHRASE_LEN}
    ),
    wstats AS (
        SELECT m.w,
               count(*) AS freq,
               CAST(sum(p.plen) AS BIGINT) AS deg
        FROM members m
        JOIN phrases p ON p.doc_id = m.doc_id AND p.island = m.island
        GROUP BY m.w
    )
"""


def _islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, island, w, o) phrase members + (doc_id, island, plen)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.posexplode(F.expr("split(text, ' ')")).alias("o0", "w")
    ).filter(F.col("w") != "").select(
        "doc_id", "w", (F.col("o0") + 1).alias("o")
    )
    stop = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)
    return words.selectExpr(
        "doc_id",
        "w",
        "o",
        f"CASE WHEN w IN ({stop}) THEN 1 ELSE 0 END AS is_stop",
        f"CAST(sum(CASE WHEN w IN ({stop}) THEN 1 ELSE 0 END)"
        " OVER (PARTITION BY doc_id ORDER BY o) AS BIGINT) AS island",
    ).filter("is_stop = 0").drop("is_stop")


def _members_with_plen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, island, w, o, plen): phrase members joined with their
    phrase lengths — the one token-grain intermediate both RAKE layers
    aggregate over."""
    members = _islands(spark, sf_dir)
    phrases = (
        members.groupBy("doc_id", "island")
        .agg(F.count("*").alias("plen"))
        .filter(F.col("plen") <= RAKE_MAX_PHRASE_LEN)
    )
    return members.join(phrases, ["doc_id", "island"])


def _word_stats(members_plen: DataFrame) -> DataFrame:
    return members_plen.groupBy("w").agg(
        F.count("*").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )


@register(
    "tx_rake_word_scores",
    f"""
    WITH {_SQL_ISLANDS}
    SELECT w AS word,
           CAST(freq AS BIGINT) AS freq,
           deg,
           CAST(deg * 1000 // freq AS BIGINT) AS score_permille
    FROM wstats
    ORDER BY score_permille DESC, freq DESC, word
    LIMIT {RAKE_TOP_WORDS}
    """,
    doc=f"RAKE keyword scores: top-{RAKE_TOP_WORDS} words by exact"
    f" degree/frequency (permille) over stopword-delimited phrases",
    bench=True,
)
def tx_rake_word_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE's word layer: segment every document into phrases at the
    stopword delimiters (one cumulative window per doc — the
    gaps-and-islands idiom), then score each word deg/freq where deg
    accumulates the lengths of the phrases it occurs in. Words that
    live in long multi-word keyphrases outrank equally-frequent words
    that appear alone — that asymmetry is the whole trick. Two keyed
    shuffles (phrase lengths, word stats) over the tokenized scan."""
    ws = _word_stats(_members_with_plen(spark, sf_dir))
    return (
        ws.select(
            F.col("w").alias("word"),
            F.col("freq").cast("bigint").alias("freq"),
            "deg",
            F.expr("CAST(deg * 1000 div freq AS BIGINT)").alias(
                "score_permille"
            ),
        )
        .orderBy(
            F.desc("score_permille"), F.desc("freq"), F.asc("word")
        )
        .limit(RAKE_TOP_WORDS)
    )


@register(
    "tx_rake_top_phrases",
    f"""
    WITH {_SQL_ISLANDS},
    scored AS (
        SELECT m.doc_id, m.island,
               string_agg(m.w, ' ' ORDER BY m.o) AS phrase,
               CAST(min(p.plen) AS BIGINT) AS plen,
               CAST(sum(s.deg * 1000 // s.freq) AS BIGINT)
                   AS score_permille
        FROM members m
        JOIN phrases p ON p.doc_id = m.doc_id AND p.island = m.island
        JOIN wstats s ON s.w = m.w
        GROUP BY m.doc_id, m.island
    )
    SELECT phrase,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(plen) AS BIGINT) AS phrase_len,
           CAST(min(score_permille) AS BIGINT) AS score_permille
    FROM scored
    WHERE plen >= 2
    GROUP BY phrase
    ORDER BY score_permille DESC, n_occurrences DESC, phrase
    LIMIT {RAKE_TOP_PHRASES}
    """,
    doc=f"RAKE keyphrases: top-{RAKE_TOP_PHRASES} multi-word phrases by"
    f" summed word scores (permille), occurrences deduped by text",
    bench=True,
)
def tx_rake_top_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE's phrase layer: each candidate phrase scores the sum of
    its member words' deg/freq scores, so phrases made of
    keyphrase-prone words float to the top; identical phrase texts
    across documents collapse to one row with an occurrence count.
    The phrase text is rebuilt with position-ordered aggregation in
    both engines (sort_array of (pos, word) structs on the Spark
    side, ORDER BY inside string_agg in DuckDB) — same bytes, same
    hash. The word-score table is vocabulary-sized and joins onto
    phrase members by term; everything else is the segmentation scan.

    Both RAKE layers (global word stats, per-phrase scoring) aggregate
    the same token-grain (members ⋈ plen) intermediate, so it is
    materialized ONCE with a lazy localCheckpoint — Spark does not
    dedupe common subplans, and before round 12 the segmentation scan
    (tokenize + posexplode + per-doc cumulative window) executed twice,
    doubling the query's cost. On a cluster the equivalent is
    persist(DISK_ONLY) or a checkpoint to the shuffle service; the
    intermediate is token-grain — the same order of bytes the two
    keyed shuffles already move."""
    mp = _members_with_plen(spark, sf_dir).localCheckpoint(eager=False)
    ws = _word_stats(mp).select(
        "w", F.expr("CAST(deg * 1000 div freq AS BIGINT)").alias("wscore")
    )
    scored = (
        mp.join(ws, "w")
        .groupBy("doc_id", "island")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(o, w))), x -> x.w), ' ')"
            ).alias("phrase"),
            F.min("plen").cast("bigint").alias("plen"),
            F.sum("wscore").cast("bigint").alias("score_permille"),
        )
    )
    return (
        scored.filter(F.col("plen") >= 2)
        .groupBy("phrase")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.min("plen").cast("bigint").alias("phrase_len"),
            F.min("score_permille").cast("bigint").alias("score_permille"),
        )
        .orderBy(
            F.desc("score_permille"), F.desc("n_occurrences"), F.asc("phrase")
        )
        .limit(RAKE_TOP_PHRASES)
    )
