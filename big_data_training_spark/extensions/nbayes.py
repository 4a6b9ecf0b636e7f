"""Multinomial Naive Bayes text classifier — trained and served
entirely as DataFrame aggregations, integer-exact across engines.

Why it belongs in this engine: the reference's pipeline is
collect -> store -> process(clean/transform/analyze) -> visualize
(README.md:18-22), and the canonical "analyze" step of an LLM-data
curation pipeline is a cheap linear text classifier — CCNet / fastText
style language-ID and quality gates that decide which documents enter
the training mix. NB is the simplest member of that family whose
training IS a groupBy: the model is the (class, term) count table plus
per-class totals, so "fit" is one shuffle and "predict" is a corpus
scan against the broadcast model. That shape survives 100 TB: the
model size is bounded by vocabulary x classes (independent of corpus
row count), training is map-side-combinable counting, and scoring
never shuffles anything wider than (doc_id, class) partial sums.

Exactness: NB scores are sums of log-probabilities, and cross-engine
float logs are forbidden by the oracle methodology — so the
log-likelihoods come from the repo's 1/16-bit fixed-point log2 kernel
(extensions/retrieval.log2_fp16_steps): with Laplace smoothing the
per-term negative log-likelihood is

    nll16(c, t) = 16*log2( (tok_total_c + V) / (cnt_{c,t} + 1) )

a ratio of integers >= 1, computed by the identical
square-and-renormalize text in Spark SQL (`div`) and DuckDB (`//`).
A document's class score is the integer
prior_nll16(c) + sum_t tf_t * nll16(c, t); argmin with (score, class)
tie-break is deterministic, so the confusion matrix is bit-identical
across engines.

Overflow bound: tok_total + V < 2^42 keeps every kernel intermediate
< 2^62; per-doc scores are < dl * 16*42 — safely BIGINT at any corpus
size whose per-class token total fits 2^42 (~4.4e12 tokens per class;
beyond that, shard classes or rescale the kernel).
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

_TOKS = "filter(split(text, ' '), w -> w <> '')"

NB_PROFILE_TOP = 3  # most-likely terms surfaced per class


def _apply_steps(df: DataFrame, steps: list[tuple[str, str]]) -> DataFrame:
    for name, expr in steps:
        df = df.selectExpr("*", f"{expr} AS {name}")
    return df


# Shared oracle CTE prefix: token counts, corpus constants, per-class
# totals, and the smoothed (class, term) model with fixed-point nll.
def _model_ctes(div: str) -> str:
    term_steps = _nest_sql(
        "SELECT lang, term, cnt, tok_total, v FROM model",
        log2_fp16_steps("tok_total + v", "cnt + 1", "nll16", div),
    )
    miss_steps = _nest_sql(
        "SELECT lang, n_docs, tok_total, v, n_all FROM langstat CROSS JOIN corpus",
        log2_fp16_steps("tok_total + v", "1", "miss16", div, pfx="ms"),
    )
    prior_steps = _nest_sql(
        "SELECT lang, n_docs, tok_total, v, miss16, n_all FROM nllmiss",
        log2_fp16_steps("n_all", "n_docs", "prior16", div, pfx="pr"),
    )
    return f"""
    toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    doctf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks WHERE term <> '' GROUP BY 1, 2
    ),
    corpus AS (
        SELECT count(DISTINCT term) AS v,
               (SELECT count(*) FROM documents) AS n_all
        FROM doctf
    ),
    langstat AS (
        SELECT d.lang AS lang,
               count(DISTINCT d.doc_id) AS n_docs,
               coalesce(sum(t.tf), 0) AS tok_total
        FROM documents d LEFT JOIN doctf t ON t.doc_id = d.doc_id
        GROUP BY 1
    ),
    model AS (
        SELECT d.lang AS lang, t.term AS term,
               sum(t.tf) AS cnt, l.tok_total AS tok_total, c.v AS v
        FROM doctf t
        JOIN documents d ON d.doc_id = t.doc_id
        JOIN langstat l ON l.lang = d.lang
        CROSS JOIN corpus c
        GROUP BY 1, 2, 4, 5
    ),
    nllterm AS ({term_steps}),
    nllmiss AS ({miss_steps}),
    nllprior AS ({prior_steps})
    """


def _nb_model(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, ...]:
    """(docs, doctf, langstat+miss16+prior16, nllterm) DataFrames
    mirroring the oracle CTEs, fixed-point steps applied with Spark
    `div`. doctf is materialized once (corpus constants, class totals,
    the model AND the scorer all read it — without pinning, each
    consumer re-runs the tokenize+count scan); the two model tables
    are |classes|- and |vocab x classes|-bounded, pinned by callers
    that reuse them across jobs."""
    docs = load_table(spark, sf_dir, "documents")
    doctf = (
        docs.selectExpr("doc_id", f"explode({_TOKS}) AS term")
        .groupBy("doc_id", "term")
        .count()
        .withColumnRenamed("count", "tf")
        .localCheckpoint(eager=True)
    )
    corpus = doctf.selectExpr("term").agg(
        F.countDistinct("term").alias("v")
    ).crossJoin(F.broadcast(docs.agg(F.count("*").alias("n_all"))))
    langstat = (
        docs.join(doctf, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.expr("coalesce(sum(tf), 0)").alias("tok_total"),
        )
    )
    model = (
        doctf.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "term")
        .agg(F.sum("tf").alias("cnt"))
        .join(F.broadcast(langstat.select("lang", "tok_total")), "lang")
        .crossJoin(F.broadcast(corpus.select("v")))
    )
    nllterm = _apply_steps(
        model, log2_fp16_steps("tok_total + v", "cnt + 1", "nll16", " div ")
    )
    lang_aug = _apply_steps(
        langstat.crossJoin(F.broadcast(corpus)),
        log2_fp16_steps("tok_total + v", "1", "miss16", " div ", pfx="ms"),
    )
    lang_aug = _apply_steps(
        lang_aug.select("lang", "n_docs", "tok_total", "v", "miss16", "n_all"),
        log2_fp16_steps("n_all", "n_docs", "prior16", " div ", pfx="pr"),
    )
    return docs, doctf, lang_aug, nllterm


@register(
    "lm_nb_class_stats",
    f"""
    WITH {_model_ctes(" // ")}
    SELECT lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(tok_total AS BIGINT) AS n_tokens,
           CAST(prior16 AS BIGINT) AS prior_nll16,
           CAST(miss16 AS BIGINT) AS unseen_nll16
    FROM nllprior
    ORDER BY lang
    """,
    doc="Naive-Bayes class table: per language the document count, "
    "token total, fixed-point prior nll and unseen-term nll — the "
    "broadcast half of the model",
)
def lm_nb_class_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-class row of a multinomial NB model: how many docs and
    tokens back each class, the prior -log2 P(class) and the Laplace
    floor -log2 P(unseen term | class), both in 1/16-bit fixed point.
    One groupBy(lang) over the corpus — the class side of the model is
    |classes| rows no matter the corpus size."""
    _, _, lang_aug, _ = _nb_model(spark, sf_dir)
    return lang_aug.select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("tok_total").cast("bigint").alias("n_tokens"),
        F.col("prior16").cast("bigint").alias("prior_nll16"),
        F.col("miss16").cast("bigint").alias("unseen_nll16"),
    ).orderBy("lang")


@register(
    "lm_nb_class_profile",
    f"""
    WITH {_model_ctes(" // ")},
    ranked AS (
        SELECT lang, term, cnt, nll16,
               row_number() OVER (
                   PARTITION BY lang ORDER BY nll16, term
               ) AS rnk
        FROM nllterm
    )
    SELECT lang, term, CAST(cnt AS BIGINT) AS cnt,
           CAST(nll16 AS BIGINT) AS nll16, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {NB_PROFILE_TOP}
    ORDER BY lang, rnk
    """,
    doc=f"per-class NB profile: the {NB_PROFILE_TOP} most likely terms "
    f"per language with their smoothed fixed-point nll — what the "
    f"model believes each class looks like",
)
def lm_nb_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-probable terms per class from the smoothed model — the
    interpretability view ("what does the classifier think Spanish
    looks like"). Ranking is per-class over the bounded model table,
    so the window never sees more than |vocab| rows per class."""
    from pyspark.sql.window import Window

    _, _, _, nllterm = _nb_model(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("nll16", "term")
    return (
        nllterm.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= NB_PROFILE_TOP)
        .select(
            "lang",
            "term",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("nll16").cast("bigint").alias("nll16"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("lang", "rnk")
    )


# Shared with the streaming twin (streaming/nbserve_stream.py): the
# stream scores micro-batches against the same broadcast model, so its
# oracle is this exact batch SQL.
CONFUSION_ORACLE = f"""
    WITH {_model_ctes(" // ")},
    contrib AS (
        SELECT t.doc_id AS doc_id, m.lang AS cand,
               sum(t.tf * coalesce(n.nll16, m.miss16)) AS tok_nll
        FROM doctf t
        CROSS JOIN nllmiss m
        LEFT JOIN nllterm n ON n.lang = m.lang AND n.term = t.term
        GROUP BY 1, 2
    ),
    score AS (
        SELECT d.doc_id AS doc_id, d.lang AS true_lang, p.lang AS cand,
               p.prior16 + coalesce(c.tok_nll, 0) AS s
        FROM documents d
        CROSS JOIN nllprior p
        LEFT JOIN contrib c ON c.doc_id = d.doc_id AND c.cand = p.lang
    ),
    pred AS (
        SELECT doc_id, true_lang, cand,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY s, cand
               ) AS rn
        FROM score
    )
    SELECT true_lang, cand AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY 1, 2
    ORDER BY 1, 2
    """


@register(
    "lm_nb_confusion",
    CONFUSION_ORACLE,
    doc="NB resubstitution confusion matrix: every document scored "
    "against every class with integer fixed-point log-likelihoods, "
    "argmin class vs true lang — the curation-gate quality readout",
    bench=True,
)
def lm_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score = prior_nll + sum(tf * nll(term|class)) per (doc, class),
    predicted class = deterministic argmin — then the confusion matrix
    of predicted vs labeled language. Serving shape at 100 TB: one
    corpus token scan, the (class, term) model and the |classes|-row
    class table broadcast, partial sums shuffled only on
    (doc_id, class); the matrix itself is |classes|^2 rows."""
    docs, doctf, lang_aug, nllterm = _nb_model(spark, sf_dir)
    return nb_predictions(docs, lang_aug, nllterm, doctf=doctf).groupBy(
        "true_lang", "pred_lang"
    ).agg(F.count("*").cast("bigint").alias("n_docs")).orderBy(
        "true_lang", "pred_lang"
    )


def nb_predictions(
    docs: DataFrame,
    lang_aug: DataFrame,
    nllterm: DataFrame,
    doctf: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, true_lang, pred_lang) for any batch of document rows
    against a trained model — the serving step shared by the batch
    confusion matrix (which passes the already-materialized training
    doctf) and the streaming twin (micro-batches tokenize fresh)."""
    if doctf is None:
        doctf = (
            docs.selectExpr("doc_id", f"explode({_TOKS}) AS term")
            .groupBy("doc_id", "term")
            .count()
            .withColumnRenamed("count", "tf")
        )
    miss = lang_aug.select("lang", "miss16")
    contrib = (
        doctf.crossJoin(F.broadcast(miss.withColumnRenamed("lang", "cand")))
        .join(
            F.broadcast(
                nllterm.select(
                    F.col("lang").alias("cand"), "term", "nll16"
                )
            ),
            ["cand", "term"],
            "left",
        )
        .groupBy("doc_id", "cand")
        .agg(
            F.expr("sum(tf * coalesce(nll16, miss16))").alias("tok_nll")
        )
    )
    score = (
        docs.selectExpr("doc_id", "lang AS true_lang")
        .crossJoin(
            F.broadcast(
                lang_aug.selectExpr("lang AS cand", "prior16")
            )
        )
        .join(contrib, ["doc_id", "cand"], "left")
        .selectExpr(
            "doc_id",
            "true_lang",
            "cand",
            "prior16 + coalesce(tok_nll, 0) AS s",
        )
    )
    # argmin via min(struct(score, class)): lexicographic struct order
    # == the oracle's (s, cand) tie-break, but as a hash aggregate —
    # no per-doc window sort in the serving path.
    return (
        score.groupBy("doc_id", "true_lang")
        .agg(F.min(F.struct("s", "cand")).alias("m"))
        .selectExpr("doc_id", "true_lang", "m.cand AS pred_lang")
    )
