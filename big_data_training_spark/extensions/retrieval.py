"""Lexical retrieval: inverted-index statistics and BM25 ranked search,
integer-exact across engines.

The reference's pipeline ends in analysis/serving over collected text
(README.md:18-22 collect→store→process; kafka/README.md:312 events as
unstructured text), and a corpus engine that curates training text
also has to SEARCH it — for eval-set leakage triage, for "show me docs
like this failure", for the lexical leg of hybrid RAG retrieval
(extensions/rerank.py's sim_hybrid_rrf consumes exactly this leg).

Design notes (scale + exactness):

* The inverted index is the term-major view of the corpus: one
  explode + groupBy(term) — the same one-shuffle shape as word count
  (A1), with posting lists collapsed to their aggregate stats.
* BM25's IDF needs a log, and cross-engine float logs are exactly the
  trap the oracle methodology forbids. :func:`log2_fp16_steps` emits a
  **fixed-point base-2 log at 1/16-bit resolution** from pure int64
  ops available identically in Spark SQL and DuckDB: normalize the
  20-bit fixed-point ratio by its binary digit count (``length(bin(x))``
  = floor(log2)+1), then extract four fraction bits by the classic
  square-and-renormalize recurrence (m ∈ [2^20, 2^21), m² div 2^20
  stays < 2^42 — no overflow up to corpora of 2^30 documents).
* idf uses Lucene's always-positive form log2((N+1)/(df+0.5)) =
  log2((2N+2)/(2df+1)), so every matching term contributes.
* The tf-saturation part is an exact rational: with k1=6/5, b=3/4,
  tf*(k1+1)/(tf + k1*(1-b) + k1*b*dl/avgdl) scaled by 10*A (A = total
  corpus tokens, avgdl = A/N) gives 22*tf*A*1000 div
  (10*tf*A + 3*A + 9*dl*N) — one floor division, Spark ``div`` ==
  DuckDB ``//`` proven by the repo's hypothesis property.
* Serving shape: corpus scan computing (tf, dl) JVM-side, broadcast of
  the one-row stats/idf aggregate, TakeOrderedAndProject top-k — the
  same plan the vector leg (sim_bruteforce_topk) serves with, so both
  legs cost one corpus scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

POSTINGS_TOP = 20
BM25_TOP = 10
BM25_TERMS = ("dup", "merge", "window")

_TOKS = "filter(split(text, ' '), w -> w <> '')"

_FP = 1048576  # 2^20: fixed-point scale of the normalized mantissa


def log2_fp16_steps(num: str, den: str, out: str, div: str, pfx: str = ""
                    ) -> list[tuple[str, str]]:
    """Column-derivation steps computing ``out`` ≈ 16*log2(num/den) for
    integer expressions with num >= den >= 1, as (name, expr) pairs
    valid in BOTH Spark SQL (div=' div ') and DuckDB (div=' // ').

    r0 is the ratio in 20-bit fixed point; e0 its integer log2 (binary
    digit count); m* the mantissa renormalized to [2^20, 2^21), squared
    four times to peel four fraction bits. All intermediates < 2^42."""
    d, p = div, pfx

    def sq(prev: str, ms: str, b: str, m: str) -> list[tuple[str, str]]:
        return [
            (ms, f"({prev} * {prev}){d}{_FP}"),
            (b, f"CASE WHEN {ms} >= {2 * _FP} THEN 1 ELSE 0 END"),
            (m, f"{ms}{d}(1 + {b})"),
        ]

    return [
        (f"{p}r0", f"(({num}) * {_FP}){d}({den})"),
        (f"{p}e0", f"length(bin({p}r0)) - 21"),
        (f"{p}m0", f"{p}r0{d}CAST(pow(2, {p}e0) AS BIGINT)"),
        *sq(f"{p}m0", f"{p}m1s", f"{p}b1", f"{p}m1"),
        *sq(f"{p}m1", f"{p}m2s", f"{p}b2", f"{p}m2"),
        *sq(f"{p}m2", f"{p}m3s", f"{p}b3", f"{p}m3"),
        (f"{p}m4s", f"({p}m3 * {p}m3){d}{_FP}"),
        (f"{p}b4", f"CASE WHEN {p}m4s >= {2 * _FP} THEN 1 ELSE 0 END"),
        (out, f"16 * {p}e0 + 8 * {p}b1 + 4 * {p}b2 + 2 * {p}b3 + {p}b4"),
    ]


@register(
    "ix_postings_stats",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), tf AS (
        SELECT term, doc_id, count(*) AS tf
        FROM toks WHERE term <> '' GROUP BY 1, 2
    )
    SELECT term,
           count(*) AS doc_freq,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           CAST(max(tf) AS BIGINT) AS max_tf,
           CAST(sum(tf) AS BIGINT) // count(*) AS mean_tf_floor
    FROM tf
    GROUP BY term
    ORDER BY doc_freq DESC, term
    LIMIT {POSTINGS_TOP}
    """,
    doc=f"inverted-index postings statistics: df, total/max/mean tf for"
    f" the {POSTINGS_TOP} highest-df terms — the index catalog page",
)
def ix_postings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statistics page of an inverted index: for each term, how
    many documents carry it (df), how often in total, and how
    concentrated its heaviest posting is. One explode + one
    groupBy((term, doc)) + one groupBy(term) — the word-count shuffle
    shape (A1, flink/README.md:64-78) with the posting list collapsed
    to its aggregate, so the index build stays a single keyed pass at
    any corpus size. These df numbers are exactly what the BM25 scorer
    (ix_bm25_topk) and the LSH shingle df-cap (dd_ngram_jaccard_pairs)
    consume."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.expr(_TOKS)).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.max("tf").cast("bigint").alias("max_tf"),
            F.expr("CAST(sum(tf) AS BIGINT) div count(*)").alias(
                "mean_tf_floor"
            ),
        )
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(POSTINGS_TOP)
    )


def _nest_sql(base: str, steps: list[tuple[str, str]]) -> str:
    """Wrap a base SELECT in one derivation layer per step (DuckDB)."""
    q = base
    for name, expr in steps:
        q = f"SELECT *, {expr} AS {name} FROM ({q})"
    return q


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    idf_steps = log2_fp16_steps(
        "2 * n + 2", "2 * df + 1", "idf16", " // "
    )
    df_idf = _nest_sql(
        "SELECT term, df, n FROM df CROSS JOIN n", idf_steps
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), clean AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM clean GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    a AS (SELECT count(*) AS a FROM clean),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM clean WHERE term IN ({terms}) GROUP BY 1, 2
    ), df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    df_idf AS ({df_idf}),
    scored AS (
        SELECT tf.doc_id,
               df_idf.idf16
               * (22 * tf.tf * a.a * 1000
                  // (10 * tf.tf * a.a + 3 * a.a + 9 * dl.dl * df_idf.n))
                   AS s
        FROM tf
        JOIN df_idf ON df_idf.term = tf.term
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN a
    )
    SELECT doc_id, CAST(sum(s) AS BIGINT) AS bm25_scaled
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25_scaled DESC, doc_id
    LIMIT {BM25_TOP}
    """


@register(
    "ix_bm25_topk",
    _bm25_oracle(),
    doc=f"BM25 ranked retrieval (k1=1.2, b=0.75) for the query"
    f" {' '.join(BM25_TERMS)!r}: 1/16-bit fixed-point log2 idf, exact"
    f" rational tf saturation, top-{BM25_TOP} by scaled score",
    bench=True,
)
def ix_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked lexical search: BM25 over the whitespace-token index for
    a three-term query. Everything is integer so the ranking is
    bit-identical across engines: idf = 16*log2((N+1)/(df+0.5)) in
    sixteenth-bit fixed point (square-and-renormalize — see module
    docstring), tf saturation as one exact rational with k1=1.2,
    b=0.75 folded into integer coefficients (22, 10, 3, 9) scaled by
    the corpus token count. The plan is the serving plan: one corpus
    scan computing per-doc (tf, dl) JVM-side (``size(filter(...))``
    per query term — no explode), broadcast of the one-row
    stats+idf aggregate, TakeOrderedAndProject top-k. At 100 TB the
    index stats (N, A, df) come from the standing postings catalog
    (ix_postings_stats) instead of a re-scan; the scan itself prunes
    to the text column and the tf>0 filter cuts the ranked set to
    docs that match at all."""
    docs = load_table(spark, sf_dir, "documents")
    nt = len(BM25_TERMS)
    toks = docs.select(
        "doc_id", F.expr(_TOKS).alias("toks")
    ).select(
        "doc_id",
        F.expr("size(toks)").alias("dl"),
        *[
            F.expr(f"size(filter(toks, t -> t = '{t}'))").alias(f"tf_{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    globs = toks.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("a"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(nt)
        ],
    )
    for i in range(nt):
        steps = log2_fp16_steps(
            "2 * n + 2", f"2 * df_{i} + 1", f"idf16_{i}", " div ", f"t{i}_"
        )
        for name, expr in steps:
            globs = globs.selectExpr("*", f"{expr} AS {name}")
    globs = globs.select("n", "a", *[f"idf16_{i}" for i in range(nt)])
    per_term = [
        f"(CASE WHEN tf_{i} > 0 THEN idf16_{i}"
        f" * (22 * tf_{i} * a * 1000"
        f" div (10 * tf_{i} * a + 3 * a + 9 * dl * n))"
        f" ELSE 0 END)"
        for i in range(nt)
    ]
    return (
        toks.filter(" OR ".join(f"tf_{i} > 0" for i in range(nt)))
        .join(F.broadcast(globs))
        .select(
            "doc_id",
            F.expr(" + ".join(per_term)).cast("bigint").alias("bm25_scaled"),
        )
        .orderBy(F.desc("bm25_scaled"), F.asc("doc_id"))
        .limit(BM25_TOP)
    )


SNIPPET_BEFORE = 20
SNIPPET_LEN = 60
_NOPOS = 999_999_999


def _minpos_exprs() -> tuple[str, str]:
    """(minpos, first_term) SQL over per-term `pos_i` columns —
    identical text in both dialects (0 = not found → sentinel)."""
    sent = [
        f"(CASE WHEN pos_{i} = 0 THEN {_NOPOS} ELSE pos_{i} END)"
        for i in range(len(BM25_TERMS))
    ]
    minpos = f"least({', '.join(sent)})"
    first = "CASE " + " ".join(
        f"WHEN {s} = {minpos} THEN '{t}'"
        for s, t in zip(sent, BM25_TERMS)
    ) + " END"
    return minpos, first


def _snippets_oracle() -> str:
    topk = _registry._REGISTRY["ix_bm25_topk"].oracle
    pos_cols = ", ".join(
        f"position('{t}' IN text) AS pos_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    minpos, first = _minpos_exprs()
    return f"""
    WITH topk AS ({topk}),
    pos AS (
        SELECT d.doc_id, d.text, {pos_cols}
        FROM documents d JOIN topk USING (doc_id)
    )
    SELECT doc_id,
           {first} AS first_term,
           CAST({minpos} AS BIGINT) AS match_pos,
           substr(text, greatest(1, {minpos} - {SNIPPET_BEFORE}),
                  {SNIPPET_LEN}) AS snippet
    FROM pos
    ORDER BY doc_id
    """


from big_data_training_spark import registry as _registry  # noqa: E402


@register(
    "ix_snippets",
    _snippets_oracle(),
    doc="KWIC snippet generation for the BM25 top-k: earliest query-"
    "term hit located with pure string ops, fixed-width context"
    " window — the search-results page",
)
def ix_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last mile of search serving: for each BM25 top-k document,
    locate the earliest query-term occurrence (position(), 1-based,
    sentinel when absent — every served doc matches at least one
    term) and cut a fixed keyword-in-context window around it. The
    top-k set is single-sourced from ix_bm25_topk (its oracle CTE is
    embedded verbatim), so ranking and snippets can never disagree.
    Plan: the k-row serving set joins the corpus by key — broadcast
    the k ids at scale — and the string work is per-hit, not
    per-corpus."""
    topk = ix_bm25_topk(spark, sf_dir).select("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    pos_cols = [
        F.expr(f"position('{t}' IN text)").alias(f"pos_{i}")
        for i, t in enumerate(BM25_TERMS)
    ]
    pos = docs.join(F.broadcast(topk), "doc_id").select(
        "doc_id", "text", *pos_cols
    )
    minpos, first = _minpos_exprs()
    return pos.selectExpr(
        "doc_id",
        f"{first} AS first_term",
        f"CAST({minpos} AS BIGINT) AS match_pos",
        f"substr(text, greatest(1, {minpos} - {SNIPPET_BEFORE}),"
        f" {SNIPPET_LEN}) AS snippet",
    ).orderBy("doc_id")


PHRASE = ("slow", "hash", "batch")


@register(
    "ix_phrase_query",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), words AS (
        SELECT doc_id, w, o
        FROM (SELECT doc_id, unnest(ws) AS w,
                     generate_subscripts(ws, 1) AS o
              FROM toks)
        WHERE w <> ''
    )
    SELECT p1.doc_id,
           count(*) AS n_occurrences,
           CAST(min(p1.o) AS BIGINT) AS first_pos
    FROM words p1
    JOIN words p2 ON p2.doc_id = p1.doc_id AND p2.o = p1.o + 1
    JOIN words p3 ON p3.doc_id = p1.doc_id AND p3.o = p1.o + 2
    WHERE p1.w = '{PHRASE[0]}' AND p2.w = '{PHRASE[1]}'
      AND p3.w = '{PHRASE[2]}'
    GROUP BY p1.doc_id
    ORDER BY p1.doc_id
    """,
    doc=f"positional-index phrase query: exact consecutive match of"
    f" {' '.join(PHRASE)!r} via position-list intersection",
)
def ix_phrase_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search — the query class a bag-of-words index
    cannot answer and a positional index answers with equi-joins:
    posting rows are (doc, term, position), and the phrase
    '{p}' matches where the three terms' position lists intersect at
    offsets (o, o+1, o+2). Each join leg is pre-filtered to ONE
    term's postings before joining, so the join input is the phrase
    terms' df, not the corpus; the joins are equi-joins on
    (doc_id, position) — no window, no UDF, hot-doc-safe. Substring
    LIKE '%{p}%' would scan every byte of every document and still
    miss tokenization boundaries; this is why search engines ship
    positional postings."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.posexplode(F.expr("split(text, ' ')")).alias("o", "w"),
    ).filter(F.col("w") != "")

    def leg(i: int) -> DataFrame:
        return words.filter(F.col("w") == PHRASE[i]).select(
            "doc_id", (F.col("o") - i).alias("start")
        )

    matches = leg(0).join(leg(1), ["doc_id", "start"]).join(
        leg(2), ["doc_id", "start"]
    )
    return (
        matches.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_occurrences"),
            # oracle positions are 1-based generate_subscripts; ours are
            # 0-based posexplode — align by +1
            F.expr("CAST(min(start) + 1 AS BIGINT)").alias("first_pos"),
        )
        .orderBy("doc_id")
    )
