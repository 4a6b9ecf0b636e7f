"""Classical statistical tests over event measures — Welch t, chi²
independence, Spearman rank correlation, a Pearson correlation matrix,
one-way ANOVA, and a trimmed mean.

Reference stage "analyze" (README.md:18-22): after the A/B readouts
(operators/abtest.py, ab_mean_diff_ztest) the next questions a metrics
pipeline answers are "are these two segments different" (Welch, ANOVA),
"are these two factors independent" (chi²), and "do these metrics move
together" (Spearman/Pearson) — each here as one aggregation pass whose
sufficient statistics are EXACT integers (the calibration.py milli-unit
idiom: v = floor(value·1000) is an IEEE product+floor, bit-identical
across engines; every sum/square-sum after that is BIGINT/DECIMAL).
The final statistic is a single double expression over those exact
integers, so both engines evaluate identical operands with correctly
rounded IEEE ops — deterministic without any float aggregation.

Scale notes: Welch/chi²/ANOVA/Pearson reduce the corpus to O(groups)
or O(cells) sufficient statistics in one map-side-combinable shuffle.
Spearman and the trimmed mean rank WITHIN each event type (bounded
partitions at test SF; the 100 TB route is two-phase histogram ranking
— ev_auc_mannwhitney documents it — since ranks only feed sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

# exact milli-unit measure: IEEE product + floor, identical across engines
_V_SPARK = "CAST(floor(value * 1000) AS BIGINT)"
_V_DUCK = "CAST(floor(value * 1000) AS BIGINT)"

_A, _B = "purchase", "click"


@register(
    "stat_welch_ttest",
    f"""
    WITH g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_V_DUCK}) AS BIGINT) AS s,
               CAST(sum({_V_DUCK} * {_V_DUCK}) AS BIGINT) AS q
        FROM events WHERE event_type IN ('{_A}', '{_B}')
        GROUP BY 1
    ),
    w AS (
        SELECT
            (SELECT n FROM g WHERE event_type = '{_A}') AS n_a,
            (SELECT n FROM g WHERE event_type = '{_B}') AS n_b,
            (SELECT s FROM g WHERE event_type = '{_A}') AS s_a,
            (SELECT s FROM g WHERE event_type = '{_B}') AS s_b,
            (SELECT q FROM g WHERE event_type = '{_A}') AS q_a,
            (SELECT q FROM g WHERE event_type = '{_B}') AS q_b
    )
    SELECT n_a, n_b,
           round(s_a / CAST(n_a AS DOUBLE) / 1000, 6) AS mean_a,
           round(s_b / CAST(n_b AS DOUBLE) / 1000, 6) AS mean_b,
           round(
             (s_a / CAST(n_a AS DOUBLE) - s_b / CAST(n_b AS DOUBLE))
             / sqrt(
                 ((q_a - s_a / CAST(n_a AS DOUBLE) * s_a) / (n_a - 1)) / n_a
               + ((q_b - s_b / CAST(n_b AS DOUBLE) * s_b) / (n_b - 1)) / n_b
             ), 6) AS t_stat
    FROM w
    """,
    doc="Welch two-sample t statistic (purchase vs click event values)"
    " from exact integer sufficient statistics",
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t: one groupBy produces (n, Σv, Σv²)
    per arm as exact BIGINTs; mean, variance, and t are one double
    expression over those six integers — identical operands, identical
    IEEE ops, identical bits in both engines. No float ever enters an
    aggregation."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_A, _B)
    )
    v = F.expr(_V_SPARK)
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("q"),
    )
    a = g.filter(F.col("event_type") == _A).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"), F.col("q").alias("q_a")
    )
    b = g.filter(F.col("event_type") == _B).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"), F.col("q").alias("q_b")
    )
    return a.crossJoin(F.broadcast(b)).selectExpr(
        "n_a",
        "n_b",
        "round(s_a / CAST(n_a AS DOUBLE) / 1000, 6) AS mean_a",
        "round(s_b / CAST(n_b AS DOUBLE) / 1000, 6) AS mean_b",
        "round((s_a / CAST(n_a AS DOUBLE) - s_b / CAST(n_b AS DOUBLE))"
        " / sqrt(((q_a - s_a / CAST(n_a AS DOUBLE) * s_a) / (n_a - 1)) / n_a"
        "      + ((q_b - s_b / CAST(n_b AS DOUBLE) * s_b) / (n_b - 1)) / n_b"
        "), 6) AS t_stat",
    )


@register(
    "stat_chi2_independence",
    """
    WITH cells AS (
        SELECT event_type, user_id % 4 AS bucket,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    rows_ AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r
              FROM cells GROUP BY 1),
    cols_ AS (SELECT bucket, CAST(sum(o) AS BIGINT) AS c
              FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS t FROM cells),
    contrib AS (
        SELECT CAST(floor(
                 (CAST(o AS DOUBLE) * t - CAST(r AS DOUBLE) * c)
                 * (CAST(o AS DOUBLE) * t - CAST(r AS DOUBLE) * c)
                 * 1000000 / (CAST(t AS DOUBLE) * r * c)
               ) AS BIGINT) AS chi2_micro_cell
        FROM cells JOIN rows_ USING (event_type)
                   JOIN cols_ USING (bucket), tot
    )
    SELECT CAST(sum(chi2_micro_cell) AS BIGINT) AS chi2_micro,
           CAST((SELECT count(*) FROM rows_) - 1 AS BIGINT)
             * CAST((SELECT count(*) FROM cols_) - 1 AS BIGINT) AS dof
    FROM contrib
    """,
    doc="chi-square independence (event type x user-id bucket) in"
    " deterministic fixed-point micro-units",
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi² for the event-type × user-bucket contingency table.
    Each cell's (oT − rc)²/(Trc) is FLOORED to integer micro-units
    before summation — floors of identical doubles (built from exact
    BIGINT counts) are identical, and the integer sum is order-free,
    so the statistic is reproducible to the last digit. Cells, row,
    and column margins are tiny (types × 4); everything after the one
    count shuffle is broadcast arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("bucket")
    ).agg(F.count("*").alias("o"))
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_ = cells.groupBy("bucket").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("t"))
    contrib = (
        cells.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "bucket")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            # o,t,r,c are cast to DOUBLE BEFORE multiplying: o*t ~ n^2
            # overflows BIGINT past n ~ 3e9 events (Spark non-ANSI wraps,
            # DuckDB raises — the engines would diverge exactly at scale).
            # Past ~1e8 total events the products exceed 2^53 and the doubles
            # are no longer exact integers; both engines then compute the SAME
            # rounded double (IEEE-754 is deterministic), so engine parity
            # holds, but floor(chi2_micro) may differ from the exact-integer
            # formulation in that regime.
            "CAST(floor((CAST(o AS DOUBLE) * t - CAST(r AS DOUBLE) * c)"
            " * (CAST(o AS DOUBLE) * t - CAST(r AS DOUBLE) * c)"
            " * 1000000 / (CAST(t AS DOUBLE) * r * c)) AS BIGINT)"
            " AS chi2_micro_cell"
        )
    )
    ndof = (
        rows_.agg(F.count("*").alias("nr"))
        .crossJoin(F.broadcast(cols_.agg(F.count("*").alias("nc"))))
        .selectExpr("CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof")
    )
    return (
        contrib.agg(F.sum("chi2_micro_cell").cast("bigint").alias("chi2_micro"))
        .crossJoin(F.broadcast(ndof))
    )


@register(
    "stat_spearman_corr",
    f"""
    WITH ranked AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY {_V_DUCK}, event_id) AS rx,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY user_id, event_id) AS ry
        FROM events
    ),
    g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS d2
        FROM ranked GROUP BY 1
    )
    SELECT event_type, n, d2,
           round(1 - 6.0 * d2 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                 * CAST(n AS DOUBLE) - 1)), 6) AS rho
    FROM g
    """,
    doc="Spearman rank correlation (value vs user id) per event type,"
    " exact integer rank differences",
)
def stat_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman's ρ = 1 − 6Σd²/(n(n²−1)) with ranks assigned under a
    TOTAL order ((measure, event_id) — no average-rank ties, so both
    engines produce identical integer ranks) and Σd² summed exactly in
    BIGINT. Per-type ranking; the scale route is the two-phase
    histogram rank since only Σd² is needed downstream."""
    ev = load_table(spark, sf_dir, "events")
    v = F.expr(_V_SPARK)
    wx = Window.partitionBy("event_type").orderBy(v, "event_id")
    wy = Window.partitionBy("event_type").orderBy("user_id", "event_id")
    ranked = ev.select(
        "event_type",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    d = F.col("rx") - F.col("ry")
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(d * d).cast("bigint").alias("d2"),
        )
        .selectExpr(
            "event_type",
            "n",
            "d2",
            "round(1 - 6.0 * d2 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)"
            " * CAST(n AS DOUBLE) - 1)), 6) AS rho",
        )
    )


@register(
    "stat_pearson_matrix",
    f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS x,
               CAST(sum({_V_DUCK}) AS BIGINT) AS y,
               CAST(count(DISTINCT event_type) AS BIGINT) AS z
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS DECIMAL(38,0)) AS sx,
               CAST(sum(y) AS DECIMAL(38,0)) AS sy,
               CAST(sum(z) AS DECIMAL(38,0)) AS sz,
               CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
               CAST(sum(y * y) AS DECIMAL(38,0)) AS syy,
               CAST(sum(z * z) AS DECIMAL(38,0)) AS szz,
               CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
               CAST(sum(x * z) AS DECIMAL(38,0)) AS sxz,
               CAST(sum(y * z) AS DECIMAL(38,0)) AS syz
        FROM per_user
    )
    SELECT n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0), 6)
             AS r_events_value,
           round((n * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
             / nullif(sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 0), 6)
             AS r_events_types,
           round((n * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
             / nullif(sqrt((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 0), 6)
             AS r_value_types
    FROM s
    """,
    doc="Pearson correlation matrix over per-user metrics (activity,"
    " spend, breadth) from exact decimal sufficient statistics",
)
def stat_pearson_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson r between three per-user metrics. The inner
    aggregate (per user) and the outer sufficient statistics (Σx, Σx²,
    Σxy, … as DECIMAL(38,0) — exact at any SF) are two
    map-side-combinable shuffles; each r is one double expression over
    ten exact numbers."""
    ev = load_table(spark, sf_dir, "events")
    v = F.expr(_V_SPARK)
    pu = ev.groupBy("user_id").agg(
        F.count("*").alias("x"),
        F.sum(v).alias("y"),
        F.countDistinct("event_type").alias("z"),
    )
    dec = "decimal(38,0)"
    s = pu.agg(
        F.count("*").alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum("z").cast(dec).alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec).alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast(dec).alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast(dec).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast(dec).alias("syz"),
    )

    def _r(sab: str, sa: str, sb: str, saa: str, sbb: str, out: str) -> str:
        return (
            f"round((n * CAST({sab} AS DOUBLE) - CAST({sa} AS DOUBLE) *"
            f" CAST({sb} AS DOUBLE))"
            f" / nullif(sqrt((n * CAST({saa} AS DOUBLE) - CAST({sa} AS DOUBLE) *"
            f" CAST({sa} AS DOUBLE))"
            f" * (n * CAST({sbb} AS DOUBLE) - CAST({sb} AS DOUBLE) *"
            f" CAST({sb} AS DOUBLE))), 0), 6) AS {out}"
        )

    return s.selectExpr(
        "n",
        _r("sxy", "sx", "sy", "sxx", "syy", "r_events_value"),
        _r("sxz", "sx", "sz", "sxx", "szz", "r_events_types"),
        _r("syz", "sy", "sz", "syy", "szz", "r_value_types"),
    )


@register(
    "stat_anova_oneway",
    f"""
    WITH g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_V_DUCK}) AS BIGINT) AS s,
               CAST(sum({_V_DUCK} * {_V_DUCK}) AS BIGINT) AS q
        FROM events GROUP BY 1
    ),
    per AS (
        SELECT n, s, q,
               CAST(floor(CAST(s AS DOUBLE) * s / n) AS BIGINT) AS s2n
        FROM g
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS n_all,
               CAST(sum(s) AS BIGINT) AS s_all,
               CAST(sum(q) AS BIGINT) AS q_all,
               CAST(sum(s2n) AS BIGINT) AS sum_s2n
        FROM per
    )
    SELECT k, n_all,
           sum_s2n - CAST(floor(CAST(s_all AS DOUBLE) * s_all / n_all)
                          AS BIGINT) AS ssb_unit,
           q_all - sum_s2n AS ssw_unit,
           CAST(floor(1000.0
               * ((sum_s2n - CAST(floor(CAST(s_all AS DOUBLE) * s_all / n_all) AS BIGINT))
                  / CAST(k - 1 AS DOUBLE))
               / ((q_all - sum_s2n) / CAST(n_all - k AS DOUBLE))
             ) AS BIGINT) AS f_milli
    FROM tot
    """,
    doc="one-way ANOVA (event value across types): between/within sums"
    " of squares and the F statistic in deterministic fixed point",
)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA with order-free arithmetic: per-group S²/n is
    floored to an integer BEFORE the cross-group sum (floors of
    identical doubles are identical; integer sums commute), giving
    SSB/SSW in exact units and F in fixed-point milli. One shuffle to
    5 group rows; the rest is scalar arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    v = F.expr(_V_SPARK)
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("q"),
    )
    per = g.selectExpr(
        "n", "s", "q",
        "CAST(floor(CAST(s AS DOUBLE) * s / n) AS BIGINT) AS s2n",
    )
    tot = per.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_all"),
        F.sum("s").alias("s_all"),
        F.sum("q").alias("q_all"),
        F.sum("s2n").alias("sum_s2n"),
    )
    return tot.selectExpr(
        "k",
        "n_all",
        "sum_s2n - CAST(floor(CAST(s_all AS DOUBLE) * s_all / n_all)"
        " AS BIGINT) AS ssb_unit",
        "q_all - sum_s2n AS ssw_unit",
        "CAST(floor(1000.0"
        " * ((sum_s2n - CAST(floor(CAST(s_all AS DOUBLE) * s_all / n_all)"
        " AS BIGINT)) / CAST(k - 1 AS DOUBLE))"
        " / ((q_all - sum_s2n) / CAST(n_all - k AS DOUBLE))) AS BIGINT)"
        " AS f_milli",
    )


@register(
    "agg_trimmed_mean",
    f"""
    WITH ranked AS (
        SELECT event_type, {_V_DUCK} AS v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY {_V_DUCK}, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    kept AS (
        SELECT event_type, v, n FROM ranked
        WHERE rn > n // 10 AND rn <= n - n // 10
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(v) * 1000 // count(*) AS BIGINT) AS trimmed_mean_micro
    FROM kept GROUP BY 1
    """,
    doc="10%-trimmed mean per event type (robust center, exact"
    " integer micro-units)",
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust center: drop the lowest and highest ⌊n/10⌋ observations
    under the total order (v, event_id) and average the rest in exact
    integer micro-units. Complements agg_winsorized_stats (clamping)
    with the discarding estimator. Per-type ranking; two-phase
    histogram ranks at scale."""
    ev = load_table(spark, sf_dir, "events")
    v = F.expr(_V_SPARK)
    w = Window.partitionBy("event_type").orderBy(v, "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        v.alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    kept = ranked.filter(
        (F.col("rn") > F.expr("n div 10"))
        & (F.col("rn") <= F.col("n") - F.expr("n div 10"))
    )
    return kept.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_total"),
        F.count("*").alias("n_kept"),
        F.expr("sum(v) * 1000 div count(*)")
        .cast("bigint")
        .alias("trimmed_mean_micro"),
    )
