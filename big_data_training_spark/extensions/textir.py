"""Text / IR additions — canonicalized entity-resolution blocking,
Dirichlet-smoothed query likelihood retrieval, syllable-complexity
profiling, and type-token lexical stats.

Reference stage "analyze" + the curation text stack (extensions/
filters.py, extensions/retrieval.py): BM25 is certified there; query
likelihood with Dirichlet smoothing (Zhai & Lafferty 2001) is the
other classic probabilistic ranking and exercises a different
smoothing structure. The ER query adds the canonicalize-then-match
blocking shape (dedupe surface forms FIRST, then pair distinct forms
within a block) that entity resolution uses when surface forms repeat
heavily — exactly this fixture's part-name distribution (64 distinct
names across 20k parts at sf0.1).

Determinism: counts/lengths are exact integers; the retrieval score is
a fixed-order product of per-term doubles over exact integers, floored
to e12 fixed point; levenshtein is integer in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

LEV_MAX = 5

_TOKS_D = "string_split(text, ' ')"
_TOKS_S = "split(text, ' ')"


@register(
    "er_token_blocking_pairs",
    f"""
    WITH forms AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS n,
               string_split(p_name, ' ')[2] AS noun
        FROM part GROUP BY 1, 3
    )
    SELECT a.noun, a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
           CAST(a.n * b.n AS BIGINT) AS pair_weight
    FROM forms a JOIN forms b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {LEV_MAX}
    """,
    doc="ER blocking: canonicalize surface forms, block on the head"
    " noun, pair within blocks under a levenshtein cap",
)
def er_token_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize-then-match: surface forms collapse to distinct
    strings WITH multiplicities first (one groupBy — at sf0.1 that is
    20k parts → 64 forms), then only forms sharing the blocking key
    (head noun) pair up, under an integer edit-distance cap. The pair
    weight n_a·n_b is how many raw-record pairs each form pair stands
    for — the blocking-efficiency readout. At 100 TB the dedupe-first
    step is what keeps pairing affordable: blocks are over distinct
    forms, never raw rows."""
    part = load_table(spark, sf_dir, "part")
    forms = part.groupBy(
        "p_name", F.element_at(F.split("p_name", " "), 2).alias("noun")
    ).agg(F.count("*").alias("n"))
    a = forms.selectExpr("noun", "p_name AS name_a", "n AS na")
    b = forms.selectExpr("noun AS noun_b", "p_name AS name_b", "n AS nb")
    return (
        a.join(
            F.broadcast(b),
            (F.col("noun") == F.col("noun_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("lev", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("lev") <= LEV_MAX)
        .selectExpr(
            "noun",
            "name_a",
            "name_b",
            "lev",
            "CAST(na * nb AS BIGINT) AS pair_weight",
        )
    )


QL_TERMS = ("merge", "vector", "stream")
QL_MU = 2000
QL_TOP = 10


def _ql_oracle() -> str:
    tf_cols = ", ".join(
        f"CAST(len(list_filter({_TOKS_D}, w -> w = '{t}')) AS BIGINT)"
        f" AS tf_{t}"
        for t in QL_TERMS
    )
    cf_cols = ", ".join(
        f"CAST(sum(tf_{t}) AS BIGINT) AS cf_{t}" for t in QL_TERMS
    )
    prob = " * ".join(
        f"((tf_{t} * ctot + {QL_MU}.0 * cf_{t})"
        f" / (CAST(ctot AS DOUBLE) * (dlen + {QL_MU})))"
        for t in QL_TERMS
    )
    return f"""
    WITH d AS (
        SELECT doc_id, CAST(len({_TOKS_D}) AS BIGINT) AS dlen, {tf_cols}
        FROM documents
    ),
    c AS (SELECT CAST(sum(dlen) AS BIGINT) AS ctot, {cf_cols} FROM d),
    scored AS (
        SELECT doc_id, dlen,
               CAST(floor(1e12 * ({prob})) AS BIGINT) AS score_e12
        FROM d, c
    )
    SELECT doc_id, dlen, score_e12
    FROM (SELECT *, row_number() OVER (ORDER BY score_e12 DESC, doc_id)
                    AS rk FROM scored)
    WHERE rk <= {QL_TOP}
    """


@register(
    "ix_query_likelihood_dirichlet",
    _ql_oracle(),
    doc=f"Dirichlet-smoothed query likelihood: top-{QL_TOP} docs for a"
    f" {len(QL_TERMS)}-term query (mu={QL_MU}), fixed-point scores",
)
def ix_query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The language-modeling retrieval score: P(q|d) = Π_t
    (tf + μ·P(t|C))/(|d| + μ). Per-doc term frequencies and lengths
    are one scan (conditional counts over the token array — no
    explode); corpus statistics are one tiny aggregate broadcast back.
    The score multiplies the per-term factors in FIXED textual order
    over exact integers, then floors to e12 fixed point — bit-equal in
    both engines. Ranking is (score, doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    tf_cols = [
        F.expr(f"size(filter({_TOKS_S}, w -> w = '{t}'))")
        .cast("bigint")
        .alias(f"tf_{t}")
        for t in QL_TERMS
    ]
    d = docs.select(
        "doc_id",
        F.expr(f"size({_TOKS_S})").cast("bigint").alias("dlen"),
        *tf_cols,
    )
    c = d.agg(
        F.sum("dlen").cast("bigint").alias("ctot"),
        *[
            F.sum(f"tf_{t}").cast("bigint").alias(f"cf_{t}")
            for t in QL_TERMS
        ],
    )
    prob = " * ".join(
        f"((tf_{t} * ctot + {QL_MU}.0 * cf_{t})"
        f" / (CAST(ctot AS DOUBLE) * (dlen + {QL_MU})))"
        for t in QL_TERMS
    )
    scored = d.crossJoin(F.broadcast(c)).selectExpr(
        "doc_id",
        "dlen",
        f"CAST(floor(1e12 * ({prob})) AS BIGINT) AS score_e12",
    )
    w = Window.orderBy(F.desc("score_e12"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QL_TOP)
        .select("doc_id", "dlen", "score_e12")
    )


@register(
    "tx_syllable_complexity",
    f"""
    WITH w AS (
        SELECT doc_id, lang, unnest({_TOKS_D}) AS word
        FROM documents
    ),
    syl AS (
        SELECT lang, word,
               CAST(len(regexp_extract_all(word, '[aeiou]+')) AS BIGINT)
                   AS sy
        FROM w WHERE word <> ''
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(sy) AS BIGINT) AS n_syllables,
           CAST(sum(sy) * 1000000 // count(*) AS BIGINT)
               AS syllables_per_word_micro,
           CAST(count(*) FILTER (WHERE sy >= 3) * 1000 // count(*)
                AS BIGINT) AS polysyllabic_permille
    FROM syl GROUP BY 1
    """,
    doc="syllable-complexity profile per language: vowel-group"
    " syllable proxy, mean per word and polysyllabic share",
)
def tx_syllable_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The readability INPUTS (SMOG/Flesch consume syllables-per-word
    and polysyllable density; this fixture has no sentence punctuation,
    so the sentence-dependent composite is out of domain): syllables
    approximated by vowel-group runs — the standard heuristic, exact
    under regexp in both engines — aggregated per language in integer
    micro/permille. One explode + one keyed aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "lang", F.explode(F.expr(_TOKS_S)).alias("word")
    ).filter(F.col("word") != "")
    syl = w.select(
        "lang",
        F.expr("size(regexp_extract_all(word, '[aeiou]+', 0))")
        .cast("bigint")
        .alias("sy"),
    )
    return syl.groupBy("lang").agg(
        F.count("*").alias("n_words"),
        F.sum("sy").cast("bigint").alias("n_syllables"),
        F.expr("sum(sy) * 1000000 div count(*)")
        .cast("bigint")
        .alias("syllables_per_word_micro"),
        F.expr("count_if(sy >= 3) * 1000 div count(*)")
        .cast("bigint")
        .alias("polysyllabic_permille"),
    )


@register(
    "tx_type_token_ratio",
    f"""
    WITH w AS (
        SELECT source, unnest({_TOKS_D}) AS word
        FROM documents
    ),
    f AS (SELECT source, word FROM w WHERE word <> '')
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT word) AS BIGINT) AS n_types,
           CAST(count(DISTINCT word) * 1000000 // count(*) AS BIGINT)
               AS ttr_micro,
           CAST(sum(length(word)) * 1000 // count(*) AS BIGINT)
               AS mean_word_len_milli
    FROM f GROUP BY 1
    """,
    doc="type-token ratio and mean word length per source — lexical"
    " diversity profile in exact fixed point",
)
def tx_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: TTR = |vocabulary|/|tokens| (the
    quick richness check; lm_heaps_exponent certifies its growth law)
    plus mean word length. Exact integer fixed point; one explode +
    one aggregate with a distinct count."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "source", F.explode(F.expr(_TOKS_S)).alias("word")
    ).filter(F.col("word") != "")
    return w.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("word").alias("n_types"),
        F.expr("count(DISTINCT word) * 1000000 div count(*)")
        .cast("bigint")
        .alias("ttr_micro"),
        F.expr("sum(length(word)) * 1000 div count(*)")
        .cast("bigint")
        .alias("mean_word_len_milli"),
    )
