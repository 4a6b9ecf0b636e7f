"""Information-theoretic corpus statistics on the exact fixed-point
log kernel: PMI collocation mining and column entropy profiling.

Both need logarithms, and both reuse the 1/16-bit fixed-point log2
(extensions/retrieval.py log2_fp16_steps — binary-digit-count
normalization + square-and-renormalize fraction bits) so the numbers
are bit-identical across engines, which a float log cannot promise.

* **PMI collocations** (Church & Hanks 1990): pmi(x,y) =
  log2(n_xy·T / (n_x·n_y)) over bigram/unigram counts (T = bigram
  total). The ratio can be < 1, so the kernel is applied to the larger
  /smaller side and signed. A min-count floor keeps the estimator out
  of its high-variance regime, standard practice.
* **Column entropy** (profiling): H = log2(N) − (Σ n_v·log2(n_v))/N
  over value frequencies — computed as integer sixteenth-bits. A
  near-zero entropy column is a constant (drop it from ML features);
  entropy near log2(ndv) means uniform (a good partition key); the
  gap between them is the skew the shuffle planner cares about.

Scale: collocations are the word-count shuffle over bigrams with the
unigram table broadcast back; entropy is one groupBy(value) per
audited column plus a scalar combine — both single-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.retrieval import (
    _nest_sql,
    log2_fp16_steps,
)
from big_data_training_spark.registry import register

PMI_MIN_COUNT = 5
PMI_TOP = 20

_TOKS = "filter(split(text, ' '), w -> w <> '')"


def _apply_steps(df: DataFrame, steps) -> DataFrame:
    for name, expr in steps:
        df = df.selectExpr("*", f"{expr} AS {name}")
    return df


def _pmi_oracle() -> str:
    # signed kernel: num/den or den/num depending on which is larger
    pos = _nest_sql(
        "SELECT * FROM grid WHERE num >= den",
        log2_fp16_steps("num", "den", "pmi16", " // "),
    )
    neg = _nest_sql(
        "SELECT * FROM grid WHERE num < den",
        log2_fp16_steps("den", "num", "neg16", " // "),
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), words AS (
        SELECT doc_id, w, o
        FROM (SELECT doc_id, unnest(ws) AS w,
                     generate_subscripts(ws, 1) AS o
              FROM toks)
        WHERE w <> ''
    ), bi AS (
        SELECT a.w AS w1, b.w AS w2, count(*) AS n_xy
        FROM words a JOIN words b
          ON b.doc_id = a.doc_id AND b.o = a.o + 1
        GROUP BY 1, 2
        HAVING count(*) >= {PMI_MIN_COUNT}
    ), uni AS (
        SELECT w, count(*) AS n FROM words GROUP BY 1
    ), t AS (
        SELECT CAST(sum(n_xy) AS BIGINT) AS t FROM (
            SELECT a.w AS w1, b.w AS w2, count(*) AS n_xy
            FROM words a JOIN words b
              ON b.doc_id = a.doc_id AND b.o = a.o + 1
            GROUP BY 1, 2
        )
    ), grid AS (
        SELECT bi.w1, bi.w2, bi.n_xy,
               bi.n_xy * t.t AS num, u1.n * u2.n AS den
        FROM bi
        JOIN uni u1 ON u1.w = bi.w1
        JOIN uni u2 ON u2.w = bi.w2
        CROSS JOIN t
    ), signed AS (
        SELECT w1, w2, n_xy, pmi16 FROM ({pos})
        UNION ALL
        SELECT w1, w2, n_xy, -neg16 AS pmi16 FROM ({neg})
    )
    SELECT w1, w2, CAST(n_xy AS BIGINT) AS n_xy,
           CAST(pmi16 AS BIGINT) AS pmi16
    FROM signed
    ORDER BY pmi16 DESC, w1, w2
    LIMIT {PMI_TOP}
    """


@register(
    "lm_collocations_pmi",
    _pmi_oracle(),
    doc=f"PMI collocation mining: top-{PMI_TOP} adjacent-word pairs by"
    f" pointwise mutual information (1/16-bit fixed point, min count"
    f" {PMI_MIN_COUNT})",
)
def lm_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which word pairs stick together more than chance — the
    collocation table a tokenizer-merge or phrase-mining pass starts
    from. Bigram counts via posexplode (the word-count shuffle over
    adjacent pairs), unigram counts joined back, then
    pmi = log2(n_xy·T/(n_x·n_y)) in exact sixteenth-bits via the
    shared fixed-point kernel, signed by which side of 1 the ratio
    falls. The min-count floor ({mc}) is the standard variance guard.
    Sub-1 ratios go through the kernel mirrored (den/num) and
    negated, so the full signed PMI range is covered without ever
    logging a number below 1."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.posexplode(F.expr("split(text, ' ')")).alias("o", "w"),
    ).filter(F.col("w") != "")
    a = words.select("doc_id", F.col("o").alias("oa"), F.col("w").alias("w1"))
    b = words.select("doc_id", F.col("o").alias("ob"), F.col("w").alias("w2"))
    bi_all = (
        a.join(b, "doc_id")
        .filter(F.col("ob") == F.col("oa") + 1)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_xy"))
    )
    t = bi_all.agg(F.sum("n_xy").cast("bigint").alias("t"))
    bi = bi_all.filter(F.col("n_xy") >= PMI_MIN_COUNT)
    uni = words.groupBy(F.col("w").alias("u")).agg(F.count("*").alias("n"))
    grid = (
        bi.join(F.broadcast(uni.selectExpr("u AS w1", "n AS n1")), "w1")
        .join(F.broadcast(uni.selectExpr("u AS w2", "n AS n2")), "w2")
        .crossJoin(F.broadcast(t))
        .selectExpr("w1", "w2", "n_xy", "n_xy * t AS num", "n1 * n2 AS den")
    )
    pos = _apply_steps(
        grid.filter("num >= den"),
        log2_fp16_steps("num", "den", "pmi16", " div "),
    ).select("w1", "w2", "n_xy", "pmi16")
    neg = (
        _apply_steps(
            grid.filter("num < den"),
            log2_fp16_steps("den", "num", "neg16", " div "),
        )
        .selectExpr("w1", "w2", "n_xy", "-neg16 AS pmi16")
    )
    return (
        pos.unionByName(neg)
        .select(
            "w1",
            "w2",
            F.col("n_xy").cast("bigint").alias("n_xy"),
            F.col("pmi16").cast("bigint").alias("pmi16"),
        )
        .orderBy(F.desc("pmi16"), "w1", "w2")
        .limit(PMI_TOP)
    )


_ENTROPY_COLS = (
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
)


def _entropy_oracle() -> str:
    legs = []
    for table, col in _ENTROPY_COLS:
        per_val = _nest_sql(
            f"SELECT count(*) AS nv, "
            f"(SELECT count(*) FROM {table}) AS n "
            f"FROM {table} GROUP BY {col}",
            log2_fp16_steps("nv", "1", "h_nv", " // "),
        )
        total = _nest_sql(
            f"SELECT count(*) AS n, count(DISTINCT {col}) AS ndv"
            f" FROM {table}",
            log2_fp16_steps("n", "1", "h_n", " // "),
        )
        legs.append(f"""
        SELECT '{table}.{col}' AS column_name,
               t.n AS n_rows, t.ndv,
               CAST(t.h_n - (SELECT sum(nv * h_nv) FROM ({per_val})) // t.n
                   AS BIGINT) AS entropy16
        FROM ({total}) t""")
    leg_sql = " UNION ALL ".join(legs)
    return f"SELECT * FROM ({leg_sql}) ORDER BY column_name"


@register(
    "dq_column_entropy",
    _entropy_oracle(),
    doc="profiling: Shannon entropy (1/16-bit fixed point) of five"
    " categorical columns — constant vs uniform vs skewed at a glance",
)
def dq_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much information a categorical column actually carries:
    H = log2(N) − Σ n_v·log2(n_v)/N in exact sixteenth-bits (the
    identity form keeps every log argument ≥ 1, so the unsigned
    kernel suffices). entropy16 == 0 → constant column; entropy16 ≈
    16·log2(ndv) → uniform, a good partition key; in between → skew
    (compare dq_skew_profile, which names the hot keys this number
    summarizes). One groupBy per audited column + a scalar combine —
    the ANALYZE-TABLE cost shape."""
    out = None
    for table, col in _ENTROPY_COLS:
        df = load_table(spark, sf_dir, table)
        per_val = _apply_steps(
            df.groupBy(col).agg(F.count("*").alias("nv")),
            log2_fp16_steps("nv", "1", "h_nv", " div "),
        )
        weighted = per_val.agg(
            F.expr("CAST(sum(nv * h_nv) AS BIGINT)").alias("s"),
        )
        total = _apply_steps(
            df.agg(
                F.count("*").alias("n"),
                F.countDistinct(col).alias("ndv"),
            ),
            log2_fp16_steps("n", "1", "h_n", " div "),
        )
        leg = total.crossJoin(F.broadcast(weighted)).selectExpr(
            f"'{table}.{col}' AS column_name",
            "n AS n_rows",
            "ndv",
            "CAST(h_n - s div n AS BIGINT) AS entropy16",
        )
        out = leg if out is None else out.unionByName(leg)
    assert out is not None
    return out.orderBy("column_name")


def _kl_oracle() -> str:
    # per-lang signed contribution a_i*log2(a_i*B / (b_i*A)), summed;
    # Laplace add-1 keeps every ratio finite and positive
    pos = _nest_sql(
        "SELECT * FROM grid WHERE num >= den",
        log2_fp16_steps("num", "den", "c16", " // "),
    )
    neg = _nest_sql(
        "SELECT * FROM grid WHERE num < den",
        log2_fp16_steps("den", "num", "n16", " // "),
    )
    return f"""
    WITH mid AS (
        SELECT CAST(min(doc_id) + (max(doc_id) - min(doc_id)) // 2
               AS BIGINT) AS m FROM documents
    ), counts AS (
        SELECT lang,
               CAST(sum(CASE WHEN doc_id <= m THEN 1 ELSE 0 END) + 1
                   AS BIGINT) AS a,
               CAST(sum(CASE WHEN doc_id > m THEN 1 ELSE 0 END) + 1
                   AS BIGINT) AS b
        FROM documents, mid GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
        FROM counts
    ), grid AS (
        SELECT lang, a, b, a * tb AS num, b * ta AS den, ta
        FROM counts CROSS JOIN tot
    ), signed AS (
        SELECT lang, a, b, ta, c16 FROM ({pos})
        UNION ALL
        SELECT lang, a, b, ta, -n16 AS c16 FROM ({neg})
    )
    SELECT lang, a AS n_first_half, b AS n_second_half,
           CAST(c16 AS BIGINT) AS pointwise16,
           CAST(a * c16 // ta AS BIGINT) AS contribution16
    FROM signed
    ORDER BY lang
    """


@register(
    "dq_kl_drift",
    _kl_oracle(),
    doc="distribution drift as information: per-language pointwise"
    " log-ratio and KL contribution (1/16-bit fixed point) between"
    " corpus halves, Laplace-smoothed",
)
def dq_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The information-theoretic drift monitor: split the corpus into
    id-halves, compare the language mix as pointwise log2 ratios
    log2(p_lang/q_lang) and their KL contributions p·log2(p/q), both
    in exact sixteenth-bits via the shared kernel (signed by mirroring
    sub-1 ratios). Add-1 smoothing keeps a language that vanished
    from one half finite instead of infinite — the standard guard.
    Σ contribution16 ≈ 16·KL(P||Q) ≥ 0 (tested); a language whose
    pointwise16 swings hard is WHERE the mix moved, which the
    chi-square-style dq_distribution_drift number alone cannot tell
    you. One aggregate over the corpus, a |langs|-row grid after."""
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(
        F.expr(
            "CAST(min(doc_id) + (max(doc_id) - min(doc_id)) div 2"
            " AS BIGINT)"
        ).alias("m")
    )
    counts = (
        docs.crossJoin(F.broadcast(mid))
        .groupBy("lang")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN doc_id <= m THEN 1 ELSE 0 END) + 1"
                " AS BIGINT)"
            ).alias("a"),
            F.expr(
                "CAST(sum(CASE WHEN doc_id > m THEN 1 ELSE 0 END) + 1"
                " AS BIGINT)"
            ).alias("b"),
        )
    )
    tot = counts.agg(
        F.sum("a").cast("bigint").alias("ta"),
        F.sum("b").cast("bigint").alias("tb"),
    )
    grid = counts.crossJoin(F.broadcast(tot)).selectExpr(
        "lang", "a", "b", "a * tb AS num", "b * ta AS den", "ta"
    )
    pos = _apply_steps(
        grid.filter("num >= den"),
        log2_fp16_steps("num", "den", "c16", " div "),
    ).select("lang", "a", "b", "ta", "c16")
    neg = (
        _apply_steps(
            grid.filter("num < den"),
            log2_fp16_steps("den", "num", "n16", " div "),
        )
        .selectExpr("lang", "a", "b", "ta", "-n16 AS c16")
    )
    return (
        pos.unionByName(neg)
        .selectExpr(
            "lang",
            "a AS n_first_half",
            "b AS n_second_half",
            "CAST(c16 AS BIGINT) AS pointwise16",
            "CAST(a * c16 div ta AS BIGINT) AS contribution16",
        )
        .orderBy("lang")
    )


XENT_TOP = 25


def _xent_oracle() -> str:
    word_s = _nest_sql(
        "SELECT w, n, t FROM uni CROSS JOIN t",
        log2_fp16_steps("t", "n", "s16", " // "),
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), occ AS (SELECT doc_id, w FROM toks WHERE w <> ''),
    uni AS (SELECT w, count(*) AS n FROM occ GROUP BY 1),
    t AS (SELECT count(*) AS t FROM occ),
    word_s AS ({word_s})
    SELECT o.doc_id,
           count(*) AS n_tokens,
           CAST(sum(ws.s16) // count(*) AS BIGINT)
               AS cross_entropy16
    FROM occ o JOIN word_s ws ON ws.w = o.w
    GROUP BY o.doc_id
    ORDER BY cross_entropy16 DESC, o.doc_id
    LIMIT {XENT_TOP}
    """


@register(
    "lm_cross_entropy_rank",
    _xent_oracle(),
    doc=f"unigram-LM cross-entropy per document (1/16-bit fixed-point"
    f" log2), top-{XENT_TOP} most surprising docs — the true log-prob"
    " outlier ranking",
)
def lm_cross_entropy_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The upgrade lm_unigram_doc_score's docstring said was off the
    table ('a true log-prob perplexity would hinge on ln() ULPs'):
    with the fixed-point log kernel, per-doc cross-entropy under the
    corpus unigram LM — H(doc) = mean over tokens of log2(T/n_w) —
    is exact sixteenth-bits, no float logs anywhere. Per-token
    surprisal is a |vocab|-row broadcast table; the doc score is one
    keyed aggregation. High scores = rare-token-heavy documents (the
    quality-filter outliers); 16·log2(T/1) bounds the score (a doc of
    hapaxes), tested. This is perplexity ranking as a data-curation
    primitive, corpus-sized like word count."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", F.explode(F.expr(_TOKS)).alias("w")
    )
    uni = occ.groupBy("w").agg(F.count("*").alias("n"))
    t = occ.agg(F.count("*").alias("t"))
    word_s = _apply_steps(
        uni.crossJoin(F.broadcast(t)),
        log2_fp16_steps("t", "n", "s16", " div "),
    ).select("w", "s16")
    return (
        occ.join(F.broadcast(word_s), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.expr("CAST(sum(s16) div count(*) AS BIGINT)").alias(
                "cross_entropy16"
            ),
        )
        .orderBy(F.desc("cross_entropy16"), "doc_id")
        .limit(XENT_TOP)
    )


def _trans_entropy_oracle() -> str:
    per_next = _nest_sql(
        "SELECT prev, n, np FROM cnt",
        log2_fp16_steps("np", "n", "s16", " // "),
    )
    return f"""
    WITH seq AS (
        SELECT event_type AS prev,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS nxt
        FROM events
    ), cnt AS (
        SELECT prev, nxt, count(*) AS n,
               CAST(sum(count(*)) OVER (PARTITION BY prev) AS BIGINT)
                   AS np
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), scored AS ({per_next})
    SELECT prev,
           CAST(max(np) AS BIGINT) AS n_transitions,
           count(*) AS n_next_states,
           CAST(sum(n * s16) // max(np) AS BIGINT) AS entropy16
    FROM scored
    GROUP BY prev
    ORDER BY prev
    """


@register(
    "ev_transition_entropy",
    _trans_entropy_oracle(),
    doc="conditional entropy H(next | prev) of the event-type Markov"
    " chain per source state, 1/16-bit fixed point — how predictable"
    " each state's future is",
)
def ev_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much the argmax predictor (ev_markov_holdout_accuracy) can
    possibly achieve: per source state, H(next|prev) = Σ (n_i/n)·
    log2(n/n_i) over observed next-states, in exact sixteenth-bits
    via the shared log kernel (each term's ratio n/n_i ≥ 1, so the
    unsigned kernel suffices; the division by n floors once at the
    end to keep the sum exact). entropy16 near 0 → the state's future
    is deterministic and the holdout hit-rate should be high;
    entropy16 near 16·log2(|states|) → irreducibly unpredictable, and
    a low hit-rate is the CEILING, not a modeling failure. One window
    pass + one |states|²-row grid — volume-free after the transition
    count."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cnt = (
        seq.groupBy("prev", "nxt")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "np",
            F.expr(
                "CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT)"
            ),
        )
    )
    scored = _apply_steps(
        cnt.select("prev", "n", "np"),
        log2_fp16_steps("np", "n", "s16", " div "),
    )
    return (
        scored.groupBy("prev")
        .agg(
            F.max("np").cast("bigint").alias("n_transitions"),
            F.count("*").alias("n_next_states"),
            F.expr("CAST(sum(n * s16) div max(np) AS BIGINT)").alias(
                "entropy16"
            ),
        )
        .orderBy("prev")
    )
