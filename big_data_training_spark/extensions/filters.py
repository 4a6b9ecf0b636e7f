"""Corpus hard-filtering passes for pretraining-data curation.

Three standard filters a large-scale training-data pipeline runs over
the raw corpus before tokenization (the reference's clean/transform
stage, README.md:18-22, specialized to LLM data work):

* **Gopher-style rule report** — the published hard-filter rule family
  (word-count bounds, mean-word-length bounds, minimum stopword
  presence, alphabetic-token ratio; Rae et al. 2021, "Scaling Language
  Models: ... Gopher", appendix A): one embarrassingly parallel scan
  emitting per-rule booleans plus the conjunctive keep decision, so
  downstream stages can both filter and audit *which* rule fired.
* **DSIR-style importance score** — data selection by importance
  resampling (Xie et al. 2023): score every document by how target-like
  its unigram distribution is. The target/overall frequency tables are
  vocabulary-sized (broadcastable at 100 TB); arithmetic is permille
  integer (floor division) so the score is bit-identical in any engine
  where a log-likelihood-ratio would hinge on ln() ULPs.
* **Sliding-window duplicate spans** — the suffix-array substring-dedup
  approximation (Lee et al. 2022, "Deduplicating Training Data Makes
  Language Models Better"): every overlapping W-token window is hashed
  corpus-wide; a document's duplicated-window fraction measures how
  much of it is verbatim-repeated *somewhere* in the corpus, at finer
  granularity than the aligned-paragraph pass (dd_paragraph_dedup).
  One shuffle on the window hash; window count is ~token count, the
  same order as the tokenize pass itself.

The rule/score scans are JVM-side built-ins; the window hashing runs
as an Arrow-batched ``mapInPandas`` pass (HOF lambdas don't codegen —
see ``dd_substring_dup_spans``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table, repartition_for_compute
from big_data_training_spark.extensions.textstats import EN_STOPWORDS, _SQL_STOP
from big_data_training_spark.functions.text import SQL_TOKENS, tokens
from big_data_training_spark.registry import register

# Gopher-rule thresholds (fixture-calibrated analogues of the published
# 50..100k words / 3..10 mean chars / >=2 stopwords / >=80% alpha rules).
MIN_WORDS, MAX_WORDS = 30, 10_000
MIN_MEAN_CENTILEN, MAX_MEAN_CENTILEN = 300, 1_000  # mean token chars x100
MIN_STOPWORDS = 2
MIN_ALPHA_PERMILLE = 800

DSIR_TARGET_LANG = "en"
DSIR_SELECT_PERMILLE = 450

SPAN_W = 8  # sliding-window width in tokens

TEMP_SALT = "temp:"  # salted hash domain for the temperature sampler


@register(
    "tx_gopher_rules",
    f"""
    WITH t AS (
        SELECT doc_id, {SQL_TOKENS.format(col='text')} AS ws FROM documents
    ), m AS (
        SELECT doc_id,
               len(ws) AS n_words,
               CAST(list_sum(list_transform(ws, w -> length(w))) * 100
                    // len(ws) AS BIGINT) AS mean_token_centilen,
               CAST(len(list_filter(ws, w -> list_contains({_SQL_STOP}, w)))
                    AS BIGINT) AS n_stopwords,
               CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
                    * 1000 // len(ws) AS BIGINT) AS alpha_permille
        FROM t WHERE len(ws) > 0
    )
    SELECT doc_id, n_words, mean_token_centilen, n_stopwords, alpha_permille,
           n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS} AS flag_word_count,
           mean_token_centilen BETWEEN {MIN_MEAN_CENTILEN} AND {MAX_MEAN_CENTILEN}
               AS flag_word_length,
           n_stopwords >= {MIN_STOPWORDS} AS flag_stopwords,
           alpha_permille >= {MIN_ALPHA_PERMILLE} AS flag_alpha,
           (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS})
               AND (mean_token_centilen BETWEEN {MIN_MEAN_CENTILEN}
                    AND {MAX_MEAN_CENTILEN})
               AND n_stopwords >= {MIN_STOPWORDS}
               AND alpha_permille >= {MIN_ALPHA_PERMILLE} AS keep
    FROM m
    """,
    doc="Gopher-style hard-filter rule report (per-rule flags + keep)",
)
def tx_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule audit: each rule is its own boolean so a
    curation run can report *why* documents were dropped, not just how
    many. All statistics are integer (centi-length, permille ratios with
    floor division) — bit-exact in any engine. One codegen'd scan, no
    shuffle; at 100 TB this is the cheapest pass in the pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    t = docs.select("doc_id", tokens("text").alias("ws")).filter(F.size("ws") > 0)
    n = F.size("ws").cast("bigint")
    m = t.select(
        "doc_id",
        n.alias("n_words"),
        F.expr(
            "aggregate(ws, cast(0 as bigint), (a, w) -> a + length(w)) * 100"
            " div size(ws)"
        )
        .cast("bigint")
        .alias("mean_token_centilen"),
        F.size(F.filter(F.col("ws"), lambda w: F.array_contains(stop_arr, w)))
        .cast("bigint")
        .alias("n_stopwords"),
        F.expr(
            "size(filter(ws, w -> w rlike '[a-zA-Z]')) * cast(1000 as bigint)"
            " div size(ws)"
        )
        .cast("bigint")
        .alias("alpha_permille"),
    )
    f_wc = F.col("n_words").between(MIN_WORDS, MAX_WORDS)
    f_wl = F.col("mean_token_centilen").between(MIN_MEAN_CENTILEN, MAX_MEAN_CENTILEN)
    f_st = F.col("n_stopwords") >= MIN_STOPWORDS
    f_al = F.col("alpha_permille") >= MIN_ALPHA_PERMILLE
    return m.select(
        "doc_id",
        "n_words",
        "mean_token_centilen",
        "n_stopwords",
        "alpha_permille",
        f_wc.alias("flag_word_count"),
        f_wl.alias("flag_word_length"),
        f_st.alias("flag_stopwords"),
        f_al.alias("flag_alpha"),
        (f_wc & f_wl & f_st & f_al).alias("keep"),
    )


@register(
    "lm_dsir_importance",
    f"""
    WITH occ AS (
        SELECT doc_id, lang, unnest({SQL_TOKENS.format(col='text')}) AS w
        FROM documents
    ), freq AS (
        SELECT w,
               count(*) AS cnt_all,
               count(*) FILTER (lang = '{DSIR_TARGET_LANG}') AS cnt_target
        FROM occ GROUP BY w
    ), ratio AS (
        SELECT w, CAST(cnt_target * 1000 // cnt_all AS BIGINT) AS r
        FROM freq
    )
    SELECT o.doc_id, max(o.lang) AS lang, count(*) AS n_tokens,
           CAST(sum(f.r) // count(*) AS BIGINT) AS dsir_score_permille,
           CAST(sum(f.r) // count(*) AS BIGINT) >= {DSIR_SELECT_PERMILLE}
               AS selected
    FROM occ o JOIN ratio f ON f.w = o.w
    GROUP BY o.doc_id
    """,
    doc="DSIR-style importance score: target-likeness of each doc's unigrams",
)
def lm_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection by importance resampling: each token's target share
    (occurrences inside the target slice / all occurrences, permille) is
    averaged over the document — a count-based stand-in for the hashed
    n-gram log-likelihood ratio of DSIR, exact in integer arithmetic.
    The per-token ratio table is vocabulary-sized and broadcast, so the
    corpus-side scan is shuffle-free up to the final per-doc aggregate;
    at 100 TB the vocabulary table is the only state that moves."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select("doc_id", "lang", F.explode(tokens("text")).alias("w"))
    freq = occ.groupBy("w").agg(
        F.count("*").alias("cnt_all"),
        F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias("cnt_target"),
    )
    ratio = freq.select(
        "w", F.expr("cnt_target * 1000 div cnt_all").cast("bigint").alias("r")
    )
    score = F.expr("sum(r) div count(*)").cast("bigint")
    return (
        occ.join(F.broadcast(ratio), "w")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.count("*").alias("n_tokens"),
            score.alias("dsir_score_permille"),
            (score >= DSIR_SELECT_PERMILLE).alias("selected"),
        )
    )


def _window_hash_batches(batches):
    """Arrow-batched sliding-window hashing: every overlapping SPAN_W-token
    window as (doc_id, md5 hex) — one row per window occurrence (NOT
    deduped: within-doc repeats must count toward corpus multiplicity,
    matching the oracle's semantics)."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        out_d: list[int] = []
        out_h: list[str] = []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            ws = t.split() if t else []
            for i in range(len(ws) - SPAN_W + 1):
                s = " ".join(ws[i : i + SPAN_W])
                out_d.append(d)
                out_h.append(hashlib.md5(s.encode()).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype="int64"),
                "h": pd.Series(out_h, dtype="object"),
            }
        )


@register(
    "dd_substring_dup_spans",
    f"""
    WITH t AS (
        SELECT doc_id, {SQL_TOKENS.format(col='text')} AS ws FROM documents
    ), win AS (
        SELECT doc_id,
               unnest([md5(array_to_string(ws[i:i + {SPAN_W - 1}], ' '))
                       for i in generate_series(1, len(ws) - {SPAN_W - 1})]) AS h
        FROM t WHERE len(ws) >= {SPAN_W}
    ), cnt AS (
        SELECT h, count(*) AS n FROM win GROUP BY h
    )
    SELECT w.doc_id,
           count(*) AS n_windows,
           CAST(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_windows,
           CAST(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS dup_permille
    FROM win w JOIN cnt c ON c.h = w.h
    GROUP BY w.doc_id
    """,
    doc="substring-level dup audit: corpus-duplicated sliding-window fraction",
    bench=True,
)
def dd_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array dedup, approximated: hash every overlapping
    {SPAN_W}-token window and measure, per document, the fraction of
    windows that occur >= 2 times corpus-wide — verbatim repetition at
    sub-paragraph granularity (templated boilerplate, quoted spans,
    near-identical mirrors). Unlike dd_paragraph_dedup's aligned chunks,
    windows overlap, so a duplicated run of any alignment is caught.
    Plan: one window-hash scan (window count ~ token count), ONE shuffle
    keyed on the hash (a keyed count window annotates multiplicity in
    place — a groupBy+join-back would shuffle twice and run the scan
    twice), then the per-doc aggregate. No pairwise blowup anywhere.
    Windowing+hashing runs in Arrow-batched ``mapInPandas``, not the
    equivalent ``transform``/``slice``/``md5`` higher-order chain: HOF
    lambdas evaluate interpreted (no whole-stage codegen) — the same
    measured ~8x lesson as the decontamination shingler
    (curation._decon_shingled). Measured at sf0.1: 3.0s (HOF + join) →
    1.15s (batched + keyed window)."""
    docs = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    win = docs.select("doc_id", "text").mapInPandas(
        _window_hash_batches, "doc_id bigint, h string"
    )
    n = F.count("*").over(Window.partitionBy("h"))
    dup = F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).cast("bigint")
    return (
        win.withColumn("n", n)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            dup.alias("n_dup_windows"),
            F.expr(
                "sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) * 1000 div count(*)"
            )
            .cast("bigint")
            .alias("dup_permille"),
        )
    )


@register(
    "tx_temperature_sample",
    f"""
    WITH cnt AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ), mn AS (
        SELECT min(n_docs) AS n_min FROM cnt
    ), rates AS (
        SELECT c.source, c.n_docs,
               CAST(floor(sqrt((1000000 * m.n_min) // c.n_docs)) AS BIGINT)
                   AS rate_permille
        FROM cnt c CROSS JOIN mn m
    ), kept AS (
        SELECT d.source
        FROM documents d JOIN rates r ON r.source = d.source
        WHERE CAST(('0x' || substr(md5('{TEMP_SALT}' || CAST(d.doc_id AS VARCHAR)),
                                   1, 15)) AS BIGINT) % 1000 < r.rate_permille
    )
    SELECT r.source, r.n_docs, r.rate_permille,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM rates r LEFT JOIN (
        SELECT source, count(*) AS n_kept FROM kept GROUP BY source
    ) k ON k.source = r.source
    """,
    doc="temperature-scaled (alpha=0.5) mixture sampling across sources",
)
def tx_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling over source shards: each source keeps
    sqrt(n_min/n_s) of its documents (alpha = 0.5 — the UniMax/multilingual
    rebalancing curve between proportional and uniform), decided by a
    salted content-key hash so membership is deterministic, join-stable
    and incremental-rewrite-safe (no rand(), no global sort). The rate
    table is |sources| rows — broadcast; the corpus pass is a pure map
    filter. floor(sqrt(integer)) is exact for these magnitudes, so the
    rates are bit-identical in any engine."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    mn = cnt.agg(F.min("n_docs").alias("n_min"))
    rates = cnt.crossJoin(F.broadcast(mn)).select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.expr("(1000000 * n_min) div n_docs")))
        .cast("bigint")
        .alias("rate_permille"),
    )
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(TEMP_SALT), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(b < F.col("rate_permille"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "rate_permille",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )


N_PHASES = 3  # curriculum stages


@register(
    "tx_curriculum_order",
    f"""
    WITH scored AS (
        SELECT source,
               CAST(len(list_filter({SQL_TOKENS.format(col='text')},
                                    w -> list_contains({_SQL_STOP}, w))) * 1000
                    // len({SQL_TOKENS.format(col='text')}) AS BIGINT)
                   AS doc_score
        FROM documents
        WHERE len({SQL_TOKENS.format(col='text')}) > 0
    ), per_source AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(doc_score) // count(*) AS BIGINT)
                   AS mean_score_permille
        FROM scored GROUP BY source
    )
    SELECT source, n_docs, mean_score_permille,
           CAST(ntile({N_PHASES}) OVER (ORDER BY mean_score_permille DESC,
                                        source ASC) AS BIGINT) AS phase
    FROM per_source
    """,
    doc="curriculum ordering: sources ranked into training phases by quality",
)
def tx_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment: sources ranked by mean document quality
    (integer permille stopword density as the proxy score) and cut into
    {N_PHASES} training phases — cleanest sources first, the standard
    staged-pretraining schedule. The per-source table is |sources| rows,
    so the ntile window is trivially small; the corpus pass is one
    map-side-combined aggregation. ntile is cast to bigint per the
    dtype-strict rule (Spark emits int where DuckDB emits BIGINT)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens("text")
    scored = docs.filter(F.size(ws) > 0).select(
        "source",
        F.expr(
            "size(filter(filter(split(text, ' '), w -> w != ''),"
            f" w -> array_contains(array({','.join(repr(w) for w in EN_STOPWORDS)}), w)))"
            " * cast(1000 as bigint)"
            " div size(filter(split(text, ' '), w -> w != ''))"
        )
        .cast("bigint")
        .alias("doc_score"),
    )
    per_source = scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.expr("sum(doc_score) div count(*)").cast("bigint").alias(
            "mean_score_permille"
        ),
    )
    w = Window.orderBy(F.desc("mean_score_permille"), F.asc("source"))
    return per_source.select(
        "source",
        "n_docs",
        "mean_score_permille",
        F.ntile(N_PHASES).over(w).cast("bigint").alias("phase"),
    )


from big_data_training_spark.extensions.dedup import (  # noqa: E402
    _SQL_COMPONENTS_CTES,
    dd_cluster_components,
)


@register(
    "dd_inflation_report",
    _SQL_COMPONENTS_CTES
    + """
    , keep_exact AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), keep_near AS (
        SELECT min(node) AS doc_id FROM labels GROUP BY comp
        UNION ALL
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT node FROM labels)
    )
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN ke.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after_exact,
           CAST(sum(CASE WHEN kn.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after_near,
           CAST((count(*) - sum(CASE WHEN kn.doc_id IS NOT NULL THEN 1 ELSE 0 END))
                * 1000 // count(*) AS BIGINT) AS inflation_permille
    FROM documents d
    LEFT JOIN keep_exact ke ON ke.doc_id = d.doc_id
    LEFT JOIN keep_near kn ON kn.doc_id = d.doc_id
    GROUP BY d.source
    """,
    doc="dedup accounting: per-source corpus shrinkage under exact and near dedup",
    bench=True,
)
def dd_inflation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The number a curation run reports upward: how much of each source
    survives exact dedup (keep min doc_id per content hash) and
    near-dup family dedup (keep min doc_id per LSH connected component;
    docs in no family keep themselves), with the duplicated share in
    permille. Sources whose inflation is high are mirror-heavy — the
    candidates for crawler-side blocking. Reuses the certified
    clustering (dd_cluster_components), so the report and the dedup it
    describes can never disagree; the extra cost over clustering is two
    vocabulary-of-keepers semi-joins and one per-source aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    keep_exact = docs.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    labels = dd_cluster_components(spark, sf_dir)
    in_family = labels.select("doc_id")
    keep_family = labels.groupBy("component_id").agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    keep_near = keep_family.unionAll(
        docs.select("doc_id").join(in_family, "doc_id", "left_anti")
    )
    flagged = (
        docs.select("doc_id", "source")
        .join(
            keep_exact.withColumn("ke", F.lit(1)), "doc_id", "left"
        )
        .join(keep_near.withColumn("kn", F.lit(1)), "doc_id", "left")
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("ke").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_after_exact"),
        F.sum(F.when(F.col("kn").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_after_near"),
        F.expr(
            "(count(*) - sum(CASE WHEN kn IS NOT NULL THEN 1 ELSE 0 END))"
            " * 1000 div count(*)"
        )
        .cast("bigint")
        .alias("inflation_permille"),
    )
