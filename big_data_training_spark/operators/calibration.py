"""Probability-calibration readouts for a scored population: reliability
bins, expected/maximum calibration error (ECE/MCE), Brier score, and a
decile lift/gains table — the post-AUC diagnostics (operators/mleval.py)
a curation-classifier retrain ships with. Reference stage "analyze"
(README.md:18-22); the scoring map itself is T5 (flink/README.md:29-62).

The score is a deterministic squashing of the event value into a
pseudo-probability, kept in integer milli-units from the first step:
p_milli = floor(value*1000) * 1000 // (floor(value*1000) + 50000) —
i.e. v/(v+50) in exact integer arithmetic, in [0, 1000). floor(value *
1000) is an IEEE-binary64 product + floor, bit-identical across
engines; everything after is BIGINT, so Spark and DuckDB agree exactly
(``div`` == ``//`` on nonnegative operands). Label: event_type =
'purchase'.

Design for 100 TB: reliability/ECE reduce the corpus to <=10 fixed bins
in one map-side-combinable shuffle — no global sort, no per-row state.
The decile lift table does rank globally (ntile over the score); that
is the textbook gains-chart definition, and the oracle needs the exact
tie-broken assignment. At scale the same table is computed from the
bounded score histogram (cumulative counts give decile thresholds; only
boundary buckets need the tiebreak), the route ev_auc_mannwhitney
documents — the ntile here keeps the oracle byte-exact at test SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

_POS = "purchase"

# v/(v+50) squashing in exact integer milli-units.
_SCORE = (
    "CAST(CAST(floor(value * 1000) AS BIGINT) * 1000"
    " {d} (CAST(floor(value * 1000) AS BIGINT) + 50000) AS BIGINT)"
)

_SQL_SCORED = f"""
    SELECT event_id, {_SCORE.format(d='//')} AS p_milli,
           CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END AS y
    FROM events
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.selectExpr(
        "event_id",
        f"{_SCORE.format(d=' div ')} AS p_milli",
        f"CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END AS y",
    )


_SQL_BINS = f"""
    scored AS ({_SQL_SCORED}),
    bins AS (
        SELECT p_milli // 100 AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos,
               CAST(sum(p_milli) AS BIGINT) AS sum_p
        FROM scored GROUP BY 1
    )
"""


def _bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _scored(spark, sf_dir)
        .groupBy(F.expr("p_milli div 100").alias("bin"))
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n"),
            F.expr("CAST(sum(y) AS BIGINT)").alias("pos"),
            F.expr("CAST(sum(p_milli) AS BIGINT)").alias("sum_p"),
        )
    )


@register(
    "ml_reliability_bins",
    f"""
    WITH {_SQL_BINS}
    SELECT bin, n, pos,
           CAST(pos * 1000000 // n AS BIGINT) AS acc_ppm,
           CAST(sum_p * 1000 // n AS BIGINT) AS conf_ppm,
           CAST(abs(pos * 1000000 // n - sum_p * 1000 // n) AS BIGINT)
               AS gap_ppm
    FROM bins ORDER BY bin
    """,
    doc="reliability diagram: per score-decile-bin observed positive "
    "rate vs mean predicted probability, exact ppm",
)
def ml_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reliability diagram's data: 10 fixed probability bins, each
    with observed accuracy and mean confidence. One bounded shuffle."""
    return _bins(spark, sf_dir).selectExpr(
        "bin",
        "n",
        "pos",
        "CAST(pos * 1000000 div n AS BIGINT) AS acc_ppm",
        "CAST(sum_p * 1000 div n AS BIGINT) AS conf_ppm",
        "CAST(abs(pos * 1000000 div n - sum_p * 1000 div n) AS BIGINT)"
        " AS gap_ppm",
    ).orderBy("bin")


@register(
    "ml_ece_calibration",
    f"""
    WITH {_SQL_BINS},
    g AS (
        SELECT bin, n, pos,
               abs(pos * 1000000 // n - sum_p * 1000 // n) AS gap_ppm
        FROM bins
    ),
    sq AS (
        SELECT CAST(sum((p_milli - 1000 * y) * (p_milli - 1000 * y))
                    AS BIGINT) AS sum_sq,
               CAST(count(*) AS BIGINT) AS n_total
        FROM scored
    )
    SELECT n_total,
           CAST((SELECT count(*) FROM g) AS BIGINT) AS n_bins,
           CAST((SELECT sum(n * gap_ppm) FROM g) // n_total AS BIGINT)
               AS ece_ppm,
           CAST((SELECT max(gap_ppm) FROM g) AS BIGINT) AS mce_ppm,
           CAST(sum_sq // n_total AS BIGINT) AS brier_ppm
    FROM sq
    """,
    doc="expected + maximum calibration error and Brier score of the "
    "squashed value score against the purchase label, exact integer ppm",
)
def ml_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECE = sum_b (n_b/N)·|acc_b − conf_b|, MCE = max_b gap, Brier =
    mean (p − y)² — all in exact ppm (milli² = ppm for the Brier term).
    Both reductions reuse the same single scan; nothing global but a
    <=10-row aggregate."""
    scored = _scored(spark, sf_dir)
    g = _bins(spark, sf_dir).selectExpr(
        "n", "abs(pos * 1000000 div n - sum_p * 1000 div n) AS gap_ppm"
    )
    gt = g.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_bins"),
        F.expr("CAST(sum(n * gap_ppm) AS BIGINT)").alias("wsum"),
        F.expr("CAST(max(gap_ppm) AS BIGINT)").alias("mce_ppm"),
    )
    sq = scored.agg(
        F.expr(
            "CAST(sum((p_milli - 1000 * y) * (p_milli - 1000 * y)) AS BIGINT)"
        ).alias("sum_sq"),
        F.expr("CAST(count(*) AS BIGINT)").alias("n_total"),
    )
    return sq.crossJoin(F.broadcast(gt)).selectExpr(
        "n_total",
        "n_bins",
        "CAST(wsum div n_total AS BIGINT) AS ece_ppm",
        "mce_ppm",
        "CAST(sum_sq div n_total AS BIGINT) AS brier_ppm",
    )


@register(
    "ml_lift_deciles",
    f"""
    WITH scored AS ({_SQL_SCORED}),
    d AS (
        SELECT y, ntile(10) OVER (ORDER BY p_milli DESC, event_id) AS decile
        FROM scored
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS nt, CAST(sum(y) AS BIGINT) AS pt
          FROM scored),
    a AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos
        FROM d GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile, n, pos,
           CAST(pos * 1000000 // n AS BIGINT) AS rate_ppm,
           CAST(pos * nt * 1000000 // greatest(n * pt, 1) AS BIGINT)
               AS lift_ppm,
           CAST(sum(pos) OVER (ORDER BY decile) * 1000000
                // greatest(pt, 1) AS BIGINT) AS cum_gain_ppm
    FROM a CROSS JOIN t ORDER BY decile
    """,
    doc="decile lift/gains table: positives per score decile, lift vs "
    "the global rate, cumulative gain — the campaign-targeting readout",
)
def ml_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank by score descending (event_id tiebreak makes the ntile
    assignment a total order, so both engines bucket identically), then
    report per-decile positive rate, lift and cumulative gain in exact
    ppm. See the module doc for the bounded-histogram route that
    replaces the global ntile at scale."""
    from pyspark.sql.window import Window

    scored = _scored(spark, sf_dir)
    d = scored.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.desc("p_milli"), F.asc("event_id"))),
    )
    t = scored.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("nt"),
        F.expr("CAST(sum(y) AS BIGINT)").alias("pt"),
    )
    a = d.groupBy("decile").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n"),
        F.expr("CAST(sum(y) AS BIGINT)").alias("pos"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        a.crossJoin(F.broadcast(t))
        .withColumn("cum_pos", F.sum("pos").over(w))
        .selectExpr(
            "CAST(decile AS BIGINT) AS decile",
            "n",
            "pos",
            "CAST(pos * 1000000 div n AS BIGINT) AS rate_ppm",
            # pt = 0 (no positives in a small fixture slice) must degrade
            # to 0-lift rows, not an ANSI divide-by-zero (Spark throws
            # where DuckDB // returns NULL); pos <= pt so the guard never
            # changes a nonzero result.
            "CAST(pos * nt * 1000000 div greatest(n * pt, 1) AS BIGINT)"
            " AS lift_ppm",
            "CAST(cum_pos * 1000000 div greatest(pt, 1) AS BIGINT)"
            " AS cum_gain_ppm",
        )
        .orderBy("decile")
    )
