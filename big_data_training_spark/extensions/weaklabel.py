"""Weak supervision over the document corpus: programmatic labeling
functions (LFs) and their diagnostics — the Snorkel-style data-programming
workflow (Ratner et al., "Data Programming", NeurIPS 2016) every
large-scale training-data pipeline uses to bootstrap labels it cannot
afford to annotate by hand. The reference's closest analog is the
stream-branch routing predicate (flink/README.md filter/branch, T3);
here the predicates VOTE instead of route.

Five deterministic LFs label each document pos(1)/neg(0)/abstain(-1):
three keyword-frequency comparators (occurrence counts recovered
integer-exactly from length(text)-length(replace(...)) so both engines
agree byte-for-byte), one metadata LF on ``lang`` and one on
``n_chars``. On top of the long (doc_id, lf, label) relation:

- ``wl_lf_diagnostics`` — per-LF coverage / overlap / conflict, the
  Snorkel LFAnalysis summary.
- ``wl_majority_vote`` — the zero-parameter label model: per-doc
  majority with ties/no-votes abstaining.
- ``wl_lf_loo_accuracy`` — each LF scored against the leave-one-out
  majority of the OTHER LFs (self-vote excluded, so an LF cannot
  inflate its own gold).
- ``wl_cohen_kappa`` — chance-corrected pairwise agreement, exact
  integer kappa in ppm with sign-safe floor division (Spark ``div``
  truncates toward zero, DuckDB ``//`` floors — they agree only on
  nonnegative operands, so the sign is factored out first).

Design for 100 TB: the LF matrix is a row-local map (one scan, no
shuffle — each LF reads only its own row's columns); every diagnostic
reduces over doc_id or (lf, lf) keys, so the shuffles carry one row per
document (bounded width: n_LF votes) or one row per LF pair. Nothing is
ever ranked globally and no pairwise doc×doc work exists — LF count,
not corpus size, bounds the blow-up (the long table is n_LF × docs,
linear). All arithmetic is integer fixed-point (ppm / milli), so the
DuckDB oracles match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

# Keyword-frequency LF: label 1 when `pos` occurs strictly more often
# than `neg`, 0 when strictly less, abstain on ties. Counts are
# recovered exactly as (length(text) - length(replace(text, kw, ''))) /
# len(kw); the division is avoided by cross-multiplying with the other
# keyword's length, keeping everything in BIGINT.
def _kw_lf(pos: str, neg: str) -> str:
    dp = f"(length(text) - length(replace(text, '{pos}', '')))"
    dn = f"(length(text) - length(replace(text, '{neg}', '')))"
    return (
        f"CASE WHEN {len(neg)} * {dp} > {len(pos)} * {dn} THEN 1 "
        f"WHEN {len(neg)} * {dp} < {len(pos)} * {dn} THEN 0 ELSE -1 END"
    )


LF_EXPRS: dict[str, str] = {
    "lf_streambatch": _kw_lf("stream", "batch"),
    "lf_joinagg": _kw_lf("join", "agg"),
    "lf_sparkvector": _kw_lf("spark", "vector"),
    "lf_lang": "CASE WHEN lang = 'en' THEN 1 WHEN lang = 'zh' THEN 0 ELSE -1 END",
    "lf_length": (
        "CASE WHEN n_chars >= 400 THEN 1 WHEN n_chars < 150 THEN 0 ELSE -1 END"
    ),
}
N_LF = len(LF_EXPRS)

# Long relation (doc_id, lf, label), abstains kept: Spark builds it in
# ONE scan via stack(); the oracle mirrors it as a UNION ALL (DuckDB
# re-reads the view per branch, which is fine for an oracle).
_STACK_ARGS = ", ".join(f"'{name}', {expr}" for name, expr in LF_EXPRS.items())
_SQL_LONG = " UNION ALL ".join(
    f"SELECT doc_id, '{name}' AS lf, {expr} AS label FROM documents"
    for name, expr in LF_EXPRS.items()
)


def _long(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id", f"stack({N_LF}, {_STACK_ARGS}) AS (lf, label)"
    )


_SQL_DOCAGG = """
    SELECT doc_id,
           CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
    FROM long WHERE label <> -1 GROUP BY doc_id
"""


def _docagg(long: DataFrame) -> DataFrame:
    return (
        long.filter(F.col("label") != -1)
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("n1"),
            F.expr("CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("n0"),
        )
    )


@register(
    "wl_lf_diagnostics",
    f"""
    WITH long AS ({_SQL_LONG}),
    da AS ({_SQL_DOCAGG}),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    lab AS (
        SELECT l.lf, l.label, d.n1, d.n0
        FROM long l JOIN da d ON d.doc_id = l.doc_id
        WHERE l.label <> -1
    )
    SELECT lf,
           CAST(count(*) AS BIGINT) AS n_labeled,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CAST(count(*) - sum(label) AS BIGINT) AS n_neg,
           CAST(count(*) * 1000000 // n_docs AS BIGINT) AS coverage_ppm,
           CAST(sum(CASE WHEN n1 + n0 >= 2 THEN 1 ELSE 0 END) * 1000000
                // n_docs AS BIGINT) AS overlap_ppm,
           CAST(sum(CASE WHEN (label = 1 AND n0 >= 1)
                           OR (label = 0 AND n1 >= 1) THEN 1 ELSE 0 END)
                * 1000000 // n_docs AS BIGINT) AS conflict_ppm
    FROM lab CROSS JOIN nt
    GROUP BY lf, n_docs ORDER BY lf
    """,
    doc="Snorkel LFAnalysis: per labeling function coverage, overlap "
    "with any other LF, and conflict rate, exact ppm over the corpus",
)
def wl_lf_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage = labeled/total; overlap = labeled docs where >=2 LFs
    voted; conflict = labeled docs where some other LF voted the other
    way (label-1 rows conflict iff the doc has any 0-vote, and vice
    versa — the doc-level (n1, n0) pair decides both without a second
    self-join). One doc-keyed shuffle; the LF-keyed reduce is tiny."""
    long = _long(spark, sf_dir)
    da = _docagg(long)
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_docs")
    )
    lab = (
        long.filter(F.col("label") != -1)
        .join(da, "doc_id")
        .crossJoin(F.broadcast(n_docs))
    )
    return (
        lab.groupBy("lf", "n_docs")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_labeled"),
            F.expr("CAST(sum(label) AS BIGINT)").alias("n_pos"),
            F.expr("CAST(count(*) - sum(label) AS BIGINT)").alias("n_neg"),
            F.expr(
                "CAST(sum(CASE WHEN n1 + n0 >= 2 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_overlap"),
            F.expr(
                "CAST(sum(CASE WHEN (label = 1 AND n0 >= 1)"
                " OR (label = 0 AND n1 >= 1) THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_conflict"),
        )
        .selectExpr(
            "lf",
            "n_labeled",
            "n_pos",
            "n_neg",
            "CAST(n_labeled * 1000000 div n_docs AS BIGINT) AS coverage_ppm",
            "CAST(n_overlap * 1000000 div n_docs AS BIGINT) AS overlap_ppm",
            "CAST(n_conflict * 1000000 div n_docs AS BIGINT) AS conflict_ppm",
        )
        .orderBy("lf")
    )


@register(
    "wl_majority_vote",
    f"""
    WITH long AS ({_SQL_LONG}),
    da AS ({_SQL_DOCAGG}),
    v AS (
        SELECT d.doc_id,
               coalesce(a.n1, 0) AS n1, coalesce(a.n0, 0) AS n0,
               CASE WHEN coalesce(a.n1, 0) > coalesce(a.n0, 0) THEN 1
                    WHEN coalesce(a.n0, 0) > coalesce(a.n1, 0) THEN 0
                    ELSE -1 END AS vote
        FROM documents d LEFT JOIN da a ON a.doc_id = d.doc_id
    )
    SELECT vote,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(abs(n1 - n0)) AS BIGINT) AS sum_margin,
           CAST(sum(abs(n1 - n0)) * 1000 // count(*) AS BIGINT)
               AS avg_margin_milli
    FROM v GROUP BY vote ORDER BY vote
    """,
    doc="zero-parameter label model: per-doc majority vote over the LF "
    "matrix (ties and no-votes abstain), with vote-margin stats",
)
def wl_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The baseline label model every weak-supervision pipeline starts
    from. Docs no LF covered (and exact ties) land in the abstain
    bucket — the residue a human annotation budget gets spent on."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    da = _docagg(_long(spark, sf_dir))
    v = docs.join(da, "doc_id", "left").selectExpr(
        "coalesce(n1, 0) AS n1",
        "coalesce(n0, 0) AS n0",
        "CASE WHEN coalesce(n1, 0) > coalesce(n0, 0) THEN 1"
        " WHEN coalesce(n0, 0) > coalesce(n1, 0) THEN 0 ELSE -1 END AS vote",
    )
    return (
        v.groupBy("vote")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(sum(abs(n1 - n0)) AS BIGINT)").alias("sum_margin"),
        )
        .selectExpr(
            "vote",
            "n_docs",
            "sum_margin",
            "CAST(sum_margin * 1000 div n_docs AS BIGINT) AS avg_margin_milli",
        )
        .orderBy("vote")
    )


@register(
    "wl_lf_loo_accuracy",
    f"""
    WITH long AS ({_SQL_LONG}),
    da AS ({_SQL_DOCAGG}),
    e AS (
        SELECT l.lf, l.label,
               d.n1 - CASE WHEN l.label = 1 THEN 1 ELSE 0 END AS o1,
               d.n0 - CASE WHEN l.label = 0 THEN 1 ELSE 0 END AS o0
        FROM long l JOIN da d ON d.doc_id = l.doc_id
        WHERE l.label <> -1
    ),
    g AS (SELECT lf, label, CASE WHEN o1 > o0 THEN 1 WHEN o0 > o1 THEN 0
                                 ELSE -1 END AS gold
          FROM e)
    SELECT lf,
           CAST(sum(CASE WHEN gold <> -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_eval,
           CAST(sum(CASE WHEN gold = label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree,
           CAST(sum(CASE WHEN gold = label THEN 1 ELSE 0 END) * 1000000
                // greatest(sum(CASE WHEN gold <> -1 THEN 1 ELSE 0 END), 1)
                AS BIGINT) AS acc_ppm
    FROM g GROUP BY lf ORDER BY lf
    """,
    doc="per-LF empirical accuracy against the leave-one-out majority "
    "of the other LFs (self-vote excluded; undecided LOO docs skipped)",
)
def wl_lf_loo_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate each LF's accuracy without gold labels: score it against
    the majority of the OTHER LFs' votes on each doc it labeled.
    Subtracting the LF's own vote from the doc's (n1, n0) tally gives
    the leave-one-out majority for free — no per-pair recount."""
    long = _long(spark, sf_dir)
    da = _docagg(long)
    g = (
        long.filter(F.col("label") != -1)
        .join(da, "doc_id")
        .selectExpr(
            "lf",
            "label",
            "CASE WHEN n1 - CASE WHEN label = 1 THEN 1 ELSE 0 END"
            " > n0 - CASE WHEN label = 0 THEN 1 ELSE 0 END THEN 1"
            " WHEN n0 - CASE WHEN label = 0 THEN 1 ELSE 0 END"
            " > n1 - CASE WHEN label = 1 THEN 1 ELSE 0 END THEN 0"
            " ELSE -1 END AS gold",
        )
    )
    return (
        g.groupBy("lf")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN gold <> -1 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_eval"),
            F.expr(
                "CAST(sum(CASE WHEN gold = label THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_agree"),
        )
        .selectExpr(
            "lf",
            "n_eval",
            "n_agree",
            "CAST(n_agree * 1000000 div greatest(n_eval, 1) AS BIGINT)"
            " AS acc_ppm",
        )
        .orderBy("lf")
    )


@register(
    "wl_cohen_kappa",
    f"""
    WITH long AS ({_SQL_LONG}),
    lab AS (SELECT doc_id, lf, label FROM long WHERE label <> -1),
    p AS (
        SELECT a.lf AS lf_a, b.lf AS lf_b,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN a.label = b.label THEN 1 ELSE 0 END)
                    AS BIGINT) AS agree,
               CAST(sum(a.label) AS BIGINT) AS a1,
               CAST(sum(b.label) AS BIGINT) AS b1
        FROM lab a JOIN lab b ON a.doc_id = b.doc_id AND a.lf < b.lf
        GROUP BY a.lf, b.lf
    ),
    k AS (
        SELECT lf_a, lf_b, n, agree,
               a1 * b1 + (n - a1) * (n - b1) AS pe_num,
               agree * n - (a1 * b1 + (n - a1) * (n - b1)) AS knum,
               n * n - (a1 * b1 + (n - a1) * (n - b1)) AS kden
        FROM p
    )
    SELECT lf_a, lf_b, n, agree,
           CAST(agree * 1000000 // n AS BIGINT) AS po_ppm,
           CAST(pe_num * 1000000 // (n * n) AS BIGINT) AS pe_ppm,
           CAST(CASE WHEN kden = 0 THEN NULL
                     WHEN knum >= 0 THEN knum * 1000000 // kden
                     ELSE -((-knum) * 1000000 // kden) END AS BIGINT)
               AS kappa_ppm
    FROM k ORDER BY lf_a, lf_b
    """,
    doc="chance-corrected pairwise agreement (Cohen's kappa) between "
    "every LF pair on co-labeled docs, exact integer ppm",
)
def wl_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kappa = (p_o - p_e) / (1 - p_e) with p_e from the pair's marginal
    label rates, kept as exact integer ratios: knum/kden over n². The
    floor division is applied to |knum| and the sign re-attached, since
    Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors —
    they only agree on nonnegative operands. kden = 0 (degenerate
    all-one-label pair) yields NULL on both engines. The doc_id
    self-join carries one row per (doc, LF-pair) — n_LF² bounded per
    doc, never doc×doc."""
    lab = _long(spark, sf_dir).filter(F.col("label") != -1)
    a = lab.selectExpr("doc_id", "lf AS lf_a", "label AS la")
    b = lab.selectExpr("doc_id", "lf AS lf_b", "label AS lb")
    p = (
        a.join(b, ["doc_id"])
        .filter(F.col("lf_a") < F.col("lf_b"))
        .groupBy("lf_a", "lf_b")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n"),
            F.expr(
                "CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("agree"),
            F.expr("CAST(sum(la) AS BIGINT)").alias("a1"),
            F.expr("CAST(sum(lb) AS BIGINT)").alias("b1"),
        )
    )
    k = p.selectExpr(
        "lf_a",
        "lf_b",
        "n",
        "agree",
        "a1 * b1 + (n - a1) * (n - b1) AS pe_num",
        "agree * n - (a1 * b1 + (n - a1) * (n - b1)) AS knum",
        "n * n - (a1 * b1 + (n - a1) * (n - b1)) AS kden",
    )
    return k.selectExpr(
        "lf_a",
        "lf_b",
        "n",
        "agree",
        "CAST(agree * 1000000 div n AS BIGINT) AS po_ppm",
        "CAST(pe_num * 1000000 div (n * n) AS BIGINT) AS pe_ppm",
        "CAST(CASE WHEN kden = 0 THEN NULL"
        " WHEN knum >= 0 THEN knum * 1000000 div kden"
        " ELSE -((-knum) * 1000000 div kden) END AS BIGINT) AS kappa_ppm",
    ).orderBy("lf_a", "lf_b")


# Leave-one-out gold + per-LF accuracy as reusable SQL (the
# wl_lf_loo_accuracy CTE chain, shared by the weighted vote below).
_SQL_LOO_ACC = f"""
    e AS (
        SELECT l.lf, l.label,
               d.n1 - CASE WHEN l.label = 1 THEN 1 ELSE 0 END AS o1,
               d.n0 - CASE WHEN l.label = 0 THEN 1 ELSE 0 END AS o0
        FROM long l JOIN da d ON d.doc_id = l.doc_id
        WHERE l.label <> -1
    ),
    g AS (SELECT lf, label, CASE WHEN o1 > o0 THEN 1 WHEN o0 > o1 THEN 0
                                 ELSE -1 END AS gold
          FROM e),
    w AS (
        SELECT lf,
               CAST(sum(CASE WHEN gold = label THEN 1 ELSE 0 END) * 1000000
                    // greatest(sum(CASE WHEN gold <> -1 THEN 1 ELSE 0 END), 1)
                    AS BIGINT) - 500000 AS wt
        FROM g GROUP BY lf
    )
"""


@register(
    "wl_weighted_vote",
    f"""
    WITH long AS ({_SQL_LONG}),
    da AS ({_SQL_DOCAGG}),
    {_SQL_LOO_ACC},
    s AS (
        SELECT l.doc_id,
               CAST(sum(w.wt * (2 * l.label - 1)) AS BIGINT) AS score
        FROM long l JOIN w ON w.lf = l.lf
        WHERE l.label <> -1 GROUP BY l.doc_id
    ),
    v AS (
        SELECT d.doc_id,
               CASE WHEN coalesce(s.score, 0) > 0 THEN 1
                    WHEN coalesce(s.score, 0) < 0 THEN 0
                    ELSE -1 END AS vote,
               CASE WHEN coalesce(a.n1, 0) > coalesce(a.n0, 0) THEN 1
                    WHEN coalesce(a.n0, 0) > coalesce(a.n1, 0) THEN 0
                    ELSE -1 END AS maj
        FROM documents d
        LEFT JOIN s ON s.doc_id = d.doc_id
        LEFT JOIN da a ON a.doc_id = d.doc_id
    )
    SELECT CAST(vote AS BIGINT) AS vote,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN vote = maj THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree_majority
    FROM v GROUP BY vote ORDER BY vote
    """,
    doc="accuracy-weighted LF vote (one EM-lite label-model step): each "
    "LF votes with weight = LOO accuracy − chance; distribution plus "
    "agreement with the plain majority",
)
def wl_weighted_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step from majority vote toward a learned label model: weight
    each LF's vote by its excess leave-one-out accuracy (acc_ppm −
    500000), so a below-chance LF pushes the OTHER way and a chance-
    level LF is ignored — the linearized form of Snorkel's log-odds
    weighting, kept integer-exact. The 5-row weight table broadcasts;
    the per-doc reduce is the same doc-keyed shuffle as the majority
    vote, so the label model costs one extra tiny aggregate, not a new
    pass over the corpus."""
    long = _long(spark, sf_dir)
    da = _docagg(long)
    lab = long.filter(F.col("label") != -1)
    g = lab.join(da, "doc_id").selectExpr(
        "lf",
        "label",
        "CASE WHEN n1 - CASE WHEN label = 1 THEN 1 ELSE 0 END"
        " > n0 - CASE WHEN label = 0 THEN 1 ELSE 0 END THEN 1"
        " WHEN n0 - CASE WHEN label = 0 THEN 1 ELSE 0 END"
        " > n1 - CASE WHEN label = 1 THEN 1 ELSE 0 END THEN 0"
        " ELSE -1 END AS gold",
    )
    w = g.groupBy("lf").agg(
        F.expr(
            "CAST(sum(CASE WHEN gold = label THEN 1 ELSE 0 END) * 1000000"
            " div greatest(sum(CASE WHEN gold <> -1 THEN 1 ELSE 0 END), 1)"
            " AS BIGINT) - 500000"
        ).alias("wt")
    )
    s = (
        lab.join(F.broadcast(w), "lf")
        .groupBy("doc_id")
        .agg(F.expr("CAST(sum(wt * (2 * label - 1)) AS BIGINT)").alias("score"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    v = (
        docs.join(s, "doc_id", "left")
        .join(da, "doc_id", "left")
        .selectExpr(
            "CASE WHEN coalesce(score, 0) > 0 THEN 1"
            " WHEN coalesce(score, 0) < 0 THEN 0 ELSE -1 END AS vote",
            "CASE WHEN coalesce(n1, 0) > coalesce(n0, 0) THEN 1"
            " WHEN coalesce(n0, 0) > coalesce(n1, 0) THEN 0"
            " ELSE -1 END AS maj",
        )
    )
    return (
        v.groupBy("vote")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
            F.expr(
                "CAST(sum(CASE WHEN vote = maj THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_agree_majority"),
        )
        .selectExpr("CAST(vote AS BIGINT) AS vote", "n_docs", "n_agree_majority")
        .orderBy("vote")
    )
