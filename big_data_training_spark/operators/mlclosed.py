"""Closed-form / single-step ML trainers as pure relational plans —
OLS via the normal equations, ridge regression, one Newton step of
univariate logistic regression, k-NN classification, and a decision
stump (best Gini split).

Reference stage "analyze → model" (README.md:18-22; the T5
model-scoring map is flink/README.md:29-62): scoring is certified by
t5_model_scoring, and these queries certify the TRAINING side that is
exactly expressible as aggregation — every estimator here is a formula
over sufficient statistics (n, Σx, Σy, Σxy, Σx², per-cell counts), so
the "fit" is one map-side-combinable shuffle plus scalar arithmetic.
That is the 100 TB story: the model is O(1) state, the data is scanned
once, and there is no iteration loop to schedule (the one Newton step
documents how an iterative fit composes — each step is the same
aggregate shape).

Determinism: all sufficient statistics are exact integers (milli-unit
measure, BIGINT sums); the estimator is a single double expression
over identical exact operands in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.similarity import _cos_expr, _sql_dot
from big_data_training_spark.registry import register

# exact integer features: y = milli-value, x = hour-of-day surrogate
# (user_id % 24 — pure integer arithmetic, no timezone surface)
_Y = "CAST(floor(value * 1000) AS BIGINT)"
_X = "CAST(user_id % 24 AS BIGINT)"

_SQL_SUFF = f"""
    suff AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_X}) AS BIGINT) AS sx,
               CAST(sum({_Y}) AS BIGINT) AS sy,
               CAST(sum({_X} * {_Y}) AS BIGINT) AS sxy,
               CAST(sum({_X} * {_X}) AS BIGINT) AS sxx
        FROM events
    )
"""


def _suff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x, y = F.expr(_X), F.expr(_Y)
    return ev.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )


@register(
    "ml_linreg_normal_eq",
    f"""
    WITH {_SQL_SUFF}
    SELECT n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
               AS slope_milli,
           round((CAST(sy AS DOUBLE)
                  - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
                    * sx) / n, 6) AS intercept_milli
    FROM suff
    """,
    doc="univariate OLS via the normal equations: slope/intercept from"
    " one pass of exact sufficient statistics",
)
def ml_linreg_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS without an optimizer: β̂ = (XᵀX)⁻¹Xᵀy collapses to
    slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) for one regressor. The five
    sufficient statistics are exact BIGINTs from one scan; slope and
    intercept are single double expressions. At 100 TB this is the
    canonical one-pass fit — model state is 2 numbers."""
    return _suff(spark, sf_dir).selectExpr(
        "n",
        "round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)"
        " / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)"
        " AS slope_milli",
        "round((CAST(sy AS DOUBLE)"
        " - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)"
        " / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))"
        " * sx) / n, 6) AS intercept_milli",
    )


@register(
    "ml_ridge_closed_form",
    f"""
    WITH {_SQL_SUFF}
    SELECT lam, n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx
                    + CAST(lam AS DOUBLE) * n), 6) AS slope_milli
    FROM suff, (VALUES (CAST(0 AS BIGINT)), (CAST(100000 AS BIGINT)),
                       (CAST(10000000 AS BIGINT))) AS l(lam)
    """,
    doc="ridge regression closed form: the regularization path of the"
    " slope over three lambda values from one statistics pass",
)
def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge shrinks the OLS slope by adding λ·n to the centered-x
    Gram term: β_λ = (nΣxy − ΣxΣy)/(nΣx² − (Σx)² + λn). One statistics
    pass serves the whole λ path (the cross join against 3 literal
    rows is free) — the hyperparameter sweep costs nothing beyond the
    single scan."""
    lams = F.array(
        F.lit(0).cast("bigint"),
        F.lit(100_000).cast("bigint"),
        F.lit(10_000_000).cast("bigint"),
    )
    return (
        _suff(spark, sf_dir)
        .select(F.explode(lams).alias("lam"), "n", "sx", "sy", "sxy", "sxx")
        .selectExpr(
            "lam",
            "n",
            "round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)"
            " / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx"
            " + CAST(lam AS DOUBLE) * n), 6) AS slope_milli",
        )
    )


_YBIN = "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
_V = "CAST(floor(value * 1000) AS BIGINT)"

# the four scaled statistics, derived from exact BIGINT milli-sums in
# ONE double expression each (x = v/1000 never enters an aggregation —
# float sums of non-integral doubles would be order-dependent)
_LOGREG_SCALED = (
    ("sx", "CAST(sv AS DOUBLE) / 1000"),
    ("sxx", "CAST(svv AS DOUBLE) / 1000000"),
    ("g0", "sy - n / 2.0"),
    ("g1", "CAST(svy AS DOUBLE) / 1000 - CAST(sv AS DOUBLE) / 2000"),
)
_LOGREG_PROJ = ", ".join(f"{e} AS {a}" for a, e in _LOGREG_SCALED)
_LOGREG_OUT = (
    "round(4 * (sxx * g0 - sx * g1) / (n * sxx - sx * sx), 6) AS beta0",
    "round(4 * (n * g1 - sx * g0) / (n * sxx - sx * sx), 6) AS beta1",
)


@register(
    "ml_logreg_newton_univariate",
    f"""
    WITH s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_V}) AS BIGINT) AS sv,
               CAST(sum({_V} * {_V}) AS BIGINT) AS svv,
               CAST(sum({_YBIN}) AS BIGINT) AS sy,
               CAST(sum({_V} * {_YBIN}) AS BIGINT) AS svy
        FROM events
    ), sc AS (SELECT n, sy, {_LOGREG_PROJ} FROM s)
    SELECT n, sy, {_LOGREG_OUT[0]}, {_LOGREG_OUT[1]} FROM sc
    """,
    doc="one Newton-Raphson step of univariate logistic regression"
    " from beta = 0 (closed-form 2x2 solve over one pass)",
)
def ml_logreg_newton_univariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At β = 0 every fitted probability is ½, so the logistic
    gradient is [Σ(y−½), Σx(y−½)] and the Hessian is ¼[[n, Σx],
    [Σx, Σx²]] — the first Newton step is a closed-form 2×2 solve over
    the same sufficient statistics as OLS. Iterating = repeating this
    aggregate shape with reweighted terms (IRLS); each step is one
    scan, model state is 2 numbers. Every aggregation is an exact
    BIGINT milli-sum; the unit-scale statistics (x = v/1000) are
    derived AFTER aggregation in single double expressions, so both
    engines divide the same exact integers."""
    ev = load_table(spark, sf_dir, "events")
    v, y = F.expr(_V), F.expr(_YBIN)
    s = ev.agg(
        F.count("*").alias("n"),
        F.sum(v).alias("sv"),
        F.sum(v * v).alias("svv"),
        F.sum(y).cast("bigint").alias("sy"),
        F.sum(v * y).alias("svy"),
    )
    sc = s.selectExpr("n", "sy", *[f"{e} AS {a}" for a, e in _LOGREG_SCALED])
    return sc.selectExpr("n", "sy", *_LOGREG_OUT)


_KNN_K = 5
_QMOD = 199


@register(
    "ml_knn_classify",
    f"""
    WITH q AS (SELECT vec_id AS query_id, label AS true_label,
                      embedding AS qv
               FROM embeddings WHERE vec_id % {_QMOD} = 0),
    corpus AS (SELECT vec_id, label, embedding FROM embeddings
               WHERE vec_id % {_QMOD} <> 0),
    scored AS (
        SELECT q.query_id, q.true_label, c.vec_id, c.label,
               {_sql_dot('c.embedding', 'q.qv')} /
               (sqrt({_sql_dot('c.embedding', 'c.embedding')}) *
                sqrt({_sql_dot('q.qv', 'q.qv')})) AS cos
        FROM corpus c, q
    ), topk AS (
        SELECT query_id, true_label, label FROM (
            SELECT query_id, true_label, label,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, vec_id ASC) AS rk
            FROM scored
        ) WHERE rk <= {_KNN_K}
    ), votes AS (
        SELECT query_id, true_label, label,
               CAST(count(*) AS BIGINT) AS n_votes,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY count(*) DESC, label ASC) AS vr
        FROM topk GROUP BY 1, 2, 3
    )
    SELECT query_id, CAST(true_label AS BIGINT) AS true_label,
           CAST(label AS BIGINT) AS predicted_label, n_votes,
           CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END AS BIGINT)
               AS correct
    FROM votes WHERE vr = 1
    """,
    doc="k-NN classification: majority label of the 5 nearest cosine"
    " neighbors, deterministic tie-breaks at both ranking layers",
)
def ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy-learner classifier on top of the certified exact-kNN
    plan (sim_knn_join): broadcast the query batch, score the corpus
    in one pass (no corpus shuffle), WindowGroupLimit keeps k rows per
    query, then a majority vote with (count DESC, label ASC)
    tie-break. Scoring compares raw doubles (identical in both
    engines); everything after is integer counting."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % _QMOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qv"),
    )
    corpus = emb.filter(F.col("vec_id") % _QMOD != 0)
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    topk = (
        corpus.join(F.broadcast(q))
        .withColumn("cos", F.expr(_cos_expr("embedding", "qv")))
        .withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= _KNN_K)
        .select("query_id", "true_label", "label")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    return (
        topk.groupBy("query_id", "true_label", "label")
        .agg(F.count("*").alias("n_votes"))
        .withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .selectExpr(
            "query_id",
            "CAST(true_label AS BIGINT) AS true_label",
            "CAST(label AS BIGINT) AS predicted_label",
            "n_votes",
            "CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END AS BIGINT)"
            " AS correct",
        )
    )


# stump thresholds: 10-unit value buckets (0..~56 candidates)
_BUCKET = "CAST(floor(value * 1000) AS BIGINT) // 10000"
_BUCKET_SPARK = "CAST(floor(value * 1000) AS BIGINT) div 10000"


@register(
    "ml_decision_stump",
    f"""
    WITH cells AS (
        SELECT {_BUCKET} AS b,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_YBIN}) AS BIGINT) AS pos
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT b,
               CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS cn,
               CAST(sum(pos) OVER (ORDER BY b) AS BIGINT) AS cp,
               CAST(sum(n) OVER () AS BIGINT) AS tn,
               CAST(sum(pos) OVER () AS BIGINT) AS tp
        FROM cells
    ),
    splits AS (
        SELECT b, cn, cp, tn - cn AS rn, tp - cp AS rp,
               CAST(floor(1000000 * (
                   cn * (1 - (CAST(cp AS DOUBLE)/cn)*(CAST(cp AS DOUBLE)/cn)
                           - (CAST(cn-cp AS DOUBLE)/cn)*(CAST(cn-cp AS DOUBLE)/cn))
                 + (tn-cn) * (1 - (CAST(tp-cp AS DOUBLE)/(tn-cn))*(CAST(tp-cp AS DOUBLE)/(tn-cn))
                                - (CAST((tn-cn)-(tp-cp) AS DOUBLE)/(tn-cn))*(CAST((tn-cn)-(tp-cp) AS DOUBLE)/(tn-cn)))
               ) / tn) AS BIGINT) AS gini_micro
        FROM cum WHERE cn < tn
    )
    SELECT b AS best_bucket, cn AS n_left, rn AS n_right,
           cp AS pos_left, rp AS pos_right, gini_micro
    FROM (SELECT *, row_number() OVER (ORDER BY gini_micro, b) AS rk
          FROM splits)
    WHERE rk = 1
    """,
    doc="decision stump: best Gini split of the purchase label over"
    " value buckets, deterministic fixed-point impurity",
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The depth-1 tree: candidate thresholds are the ~56 value
    buckets, split quality is weighted Gini impurity floored to
    integer micro-units (identical doubles → identical floors), and
    the argmin tie-breaks on the bucket id. One shuffle reduces the
    corpus to bucket cells; the cumulative scan and argmin run over
    ≤56 rows. This is exactly how tree libraries bin at scale
    (histogram-based split finding à la LightGBM)."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(F.expr(_BUCKET_SPARK).alias("b")).agg(
        F.count("*").alias("n"),
        F.sum(F.expr(_YBIN)).cast("bigint").alias("pos"),
    )
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = cells.select(
        "b",
        F.sum("n").over(wc).cast("bigint").alias("cn"),
        F.sum("pos").over(wc).cast("bigint").alias("cp"),
        F.sum("n").over(wt).cast("bigint").alias("tn"),
        F.sum("pos").over(wt).cast("bigint").alias("tp"),
    )
    splits = cum.filter(F.col("cn") < F.col("tn")).selectExpr(
        "b",
        "cn",
        "cp",
        "tn - cn AS rn",
        "tp - cp AS rp",
        "CAST(floor(1000000 * ("
        " cn * (1 - (CAST(cp AS DOUBLE)/cn)*(CAST(cp AS DOUBLE)/cn)"
        " - (CAST(cn-cp AS DOUBLE)/cn)*(CAST(cn-cp AS DOUBLE)/cn))"
        " + (tn-cn) * (1 - (CAST(tp-cp AS DOUBLE)/(tn-cn))*(CAST(tp-cp AS DOUBLE)/(tn-cn))"
        " - (CAST((tn-cn)-(tp-cp) AS DOUBLE)/(tn-cn))*(CAST((tn-cn)-(tp-cp) AS DOUBLE)/(tn-cn)))"
        ") / tn) AS BIGINT) AS gini_micro",
    )
    wr = Window.orderBy("gini_micro", "b")
    return (
        splits.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            F.col("b").alias("best_bucket"),
            F.col("cn").alias("n_left"),
            F.col("rn").alias("n_right"),
            F.col("cp").alias("pos_left"),
            F.col("rp").alias("pos_right"),
            "gini_micro",
        )
    )
