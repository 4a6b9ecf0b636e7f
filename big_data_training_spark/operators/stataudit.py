"""Statistical audits: t-closeness (privacy), independence deviation
(contingency cells vs the product-of-marginals null), autocorrelation
sufficient statistics, and graph degree-mixing — the measurement layer
a curation pipeline runs before it trusts a grouping, a split, or a
graph-derived feature (reference scope: the keyed-aggregation and
windowing patterns of /root/reference/flink/README.md, applied to the
audit questions the privacy/stats literature standardizes).

Everything is exact integer arithmetic (floor division; Spark ``div``
and DuckDB ``//`` both truncate toward zero on BIGINT operands), and
every query is one or two keyed shuffles over pre-collapsed tables:

* t-closeness cumulates over a fixed 10-bucket grid — the grid and
  every marginal table is O(|groups| x 10) rows, broadcast;
* the independence audit is a |rows| x |cols| grid built from three
  tiny marginal aggregates broadcast onto each other;
* ACF statistics ride a lag equi-join on integer day numbers over the
  daily pre-aggregate (|days| rows — the big shuffle is the daily
  collapse, map-side combinable);
* degree mixing joins the degree table back onto the edge list — the
  one real shuffle is keyed by node, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.graphalgo import _undirected_edges
from big_data_training_spark.lineage import truncate_lineage
from big_data_training_spark.registry import register

T_BUCKETS = 10
ACF_LAGS = (1, 2, 7)

_SQL_CENTS = """
    c AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    bounds AS (
        SELECT min(cents) AS lo, max(cents) AS hi,
               count(*) AS n FROM c
    )
"""


@register(
    "dq_t_closeness",
    f"""
    WITH {_SQL_CENTS},
    bucketed AS (
        SELECT c.event_type,
               least({T_BUCKETS - 1},
                     (c.cents - b.lo) * {T_BUCKETS} // (b.hi - b.lo + 1))
                   AS bucket
        FROM c, bounds b
    ),
    gb AS (
        SELECT event_type, bucket, count(*) AS n_gb
        FROM bucketed GROUP BY 1, 2
    ),
    gl AS (SELECT bucket, count(*) AS n_b FROM bucketed GROUP BY 1),
    gt AS (SELECT event_type, count(*) AS n_g FROM bucketed GROUP BY 1),
    grid AS (
        SELECT gt.event_type, gt.n_g, gl.bucket, gl.n_b, b.n,
               coalesce(gb.n_gb, 0) AS n_gb
        FROM gt CROSS JOIN gl CROSS JOIN bounds b
        LEFT JOIN gb ON gb.event_type = gt.event_type
                    AND gb.bucket = gl.bucket
    ),
    cum AS (
        SELECT event_type, n_g, n,
               CAST(sum(n_gb * n - n_b * n_g)
                    OVER (PARTITION BY event_type ORDER BY bucket)
                    AS BIGINT) AS cumdiff
        FROM grid
    )
    SELECT event_type,
           CAST(min(n_g) AS BIGINT) AS n_rows,
           CAST(sum(abs(cumdiff)) * 1000
                // ((count(*) - 1) * min(n_g) * min(n)) AS BIGINT)
               AS t_permille
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="t-closeness: exact earth-mover distance (permille) between each"
    " group's value distribution and the global one over a fixed ordered"
    " 10-bucket grid",
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The privacy audit k-anonymity and l-diversity cannot do: does a
    quasi-identifier group's SENSITIVE-VALUE DISTRIBUTION leak? The
    earth-mover distance between group and global distributions over an
    ordered equal-width bucket grid is, for 1-D histograms, the mean
    |cumulative difference| — computed exactly in integers by scaling
    both distributions to the common denominator n_g*N (diff per bucket
    = n_gb*N - n_b*n_g). One pass buckets the rows; every marginal
    (grid, group totals, global bounds) is tiny and broadcast; the
    cumulative window runs per group over 10 rows."""
    c = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents")
    )
    bounds = c.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count("*").alias("n"),
    )
    bucketed = c.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "n",
        F.expr(
            f"least({T_BUCKETS - 1},"
            f" (cents - lo) * {T_BUCKETS} div (hi - lo + 1))"
        ).alias("bucket"),
    )
    gb = bucketed.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n_gb")
    )
    gl = bucketed.groupBy("bucket", "n").agg(F.count("*").alias("n_b"))
    gt = bucketed.groupBy("event_type").agg(F.count("*").alias("n_g"))
    grid = (
        gt.crossJoin(F.broadcast(gl))
        .join(F.broadcast(gb), ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "n_g",
            "bucket",
            "n_b",
            "n",
            F.coalesce("n_gb", F.lit(0)).alias("n_gb"),
        )
    )
    cum = grid.selectExpr(
        "event_type",
        "n_g",
        "n",
        "CAST(sum(n_gb * n - n_b * n_g)"
        " OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT)"
        " AS cumdiff",
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.min("n_g").cast("bigint").alias("n_rows"),
            F.expr(
                "CAST(sum(abs(cumdiff)) * 1000"
                " div ((count(*) - 1) * min(n_g) * min(n)) AS BIGINT)"
            ).alias("t_permille"),
        )
        .orderBy("event_type")
    )


@register(
    "dq_independence_cells",
    """
    WITH e AS (
        SELECT event_type,
               CAST(date_part('isodow', ts) AS BIGINT) AS dow
        FROM events
    ),
    tot AS (SELECT count(*) AS n FROM e),
    r AS (SELECT event_type, count(*) AS r_c FROM e GROUP BY 1),
    col AS (SELECT dow, count(*) AS c_c FROM e GROUP BY 1),
    o AS (SELECT event_type, dow, count(*) AS obs FROM e GROUP BY 1, 2)
    SELECT r.event_type AS event_type, col.dow AS dow,
           CAST(coalesce(o.obs, 0) AS BIGINT) AS observed,
           CAST(r.r_c * col.c_c * 1000000 // t.n AS BIGINT)
               AS expected_micro,
           CAST((t.n * coalesce(o.obs, 0) - r.r_c * col.c_c) * 1000000
                // (r.r_c * col.c_c) AS BIGINT) AS deviation_ppm
    FROM r CROSS JOIN col CROSS JOIN tot t
    LEFT JOIN o ON o.event_type = r.event_type AND o.dow = col.dow
    ORDER BY r.event_type, col.dow
    """,
    doc="independence audit: event_type x ISO-dow contingency cells with"
    " exact expected count (micro) and lift-from-independence (ppm)"
    " under the product-of-marginals null",
)
def dq_independence_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the event mix the same every day of the week? Each
    contingency cell is compared to the independence null E = R*C/N:
    expected count in exact micro-units and the relative deviation
    (N*O - R*C)/(R*C) in ppm — the chi-square ingredients, kept as
    exact integers instead of a lossy float statistic. The dense grid
    (missing cells = 0) comes from crossing the two marginal tables,
    both tiny and broadcast; the only corpus-size shuffle is the
    initial cell count. Numerators stay under int64 below ~10^9 rows;
    past that cast the products to DECIMAL(38,0) in both dialects."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(date_part('DOW_ISO', ts) AS BIGINT)").alias("dow"),
    )
    tot = e.agg(F.count("*").alias("n"))
    r = e.groupBy("event_type").agg(F.count("*").alias("r_c"))
    col = e.groupBy("dow").agg(F.count("*").alias("c_c"))
    o = e.groupBy("event_type", "dow").agg(F.count("*").alias("obs"))
    return (
        r.crossJoin(F.broadcast(col))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(o), ["event_type", "dow"], "left")
        .select(
            "event_type",
            "dow",
            F.coalesce("obs", F.lit(0)).cast("bigint").alias("observed"),
            F.expr("CAST(r_c * c_c * 1000000 div n AS BIGINT)").alias(
                "expected_micro"
            ),
            F.expr(
                "CAST((n * coalesce(obs, 0) - r_c * c_c) * 1000000"
                " div (r_c * c_c) AS BIGINT)"
            ).alias("deviation_ppm"),
        )
        .orderBy("event_type", "dow")
    )


@register(
    "ev_acf_sufficient",
    f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS BIGINT) AS day_num,
               count(*) AS x
        FROM events GROUP BY 1
    ),
    lags AS (SELECT * FROM (VALUES {", ".join(f"({k})" for k in ACF_LAGS)})
             AS t(lag))
    SELECT lags.lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(d.x) AS BIGINT) AS s_x,
           CAST(sum(l.x) AS BIGINT) AS s_y,
           CAST(sum(d.x * l.x) AS BIGINT) AS s_xy,
           CAST(sum(d.x * d.x) AS BIGINT) AS s_xx,
           CAST(sum(l.x * l.x) AS BIGINT) AS s_yy,
           CAST(count(*) * sum(d.x * l.x) - sum(d.x) * sum(l.x)
                AS BIGINT) AS acf_num,
           CAST(count(*) * sum(d.x * d.x) - sum(d.x) * sum(d.x)
                AS BIGINT) AS acf_den_x,
           CAST(count(*) * sum(l.x * l.x) - sum(l.x) * sum(l.x)
                AS BIGINT) AS acf_den_y
    FROM lags
    JOIN daily d ON true
    JOIN daily l ON l.day_num = d.day_num - lags.lag
    GROUP BY lags.lag
    ORDER BY lags.lag
    """,
    doc="autocorrelation at lags 1/2/7 over the daily event series:"
    " exact integer sufficient statistics (sums, cross products,"
    " Pearson numerator and denominator factors)",
)
def ev_acf_sufficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the series remember yesterday (lag 1) or last week
    (lag 7)? The Pearson autocorrelation per lag is carried as exact
    integer sufficient statistics — n, sums, cross-products, and the
    already-combined numerator n*s_xy - s_x*s_y with both denominator
    factors — so the caller takes one square root at the very end and
    nothing upstream ever rounds. The corpus-size work is the daily
    collapse (map-side combinable count); the lag join runs on the
    |days|-row series against a 3-row lag spine, both broadcastable at
    any event volume."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
        ).alias("day_num")
    ).agg(F.count("*").alias("x"))
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in ACF_LAGS])).alias("lag")
    )
    d = daily.alias("d")
    l = daily.alias("l")
    pairs = F.broadcast(lags).join(
        d, F.lit(True)
    ).join(
        l,
        F.col("l.day_num") == F.col("d.day_num") - F.col("lag"),
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.expr("CAST(sum(d.x) AS BIGINT)").alias("s_x"),
            F.expr("CAST(sum(l.x) AS BIGINT)").alias("s_y"),
            F.expr("CAST(sum(d.x * l.x) AS BIGINT)").alias("s_xy"),
            F.expr("CAST(sum(d.x * d.x) AS BIGINT)").alias("s_xx"),
            F.expr("CAST(sum(l.x * l.x) AS BIGINT)").alias("s_yy"),
            F.expr(
                "CAST(count(*) * sum(d.x * l.x) - sum(d.x) * sum(l.x)"
                " AS BIGINT)"
            ).alias("acf_num"),
            F.expr(
                "CAST(count(*) * sum(d.x * d.x) - sum(d.x) * sum(d.x)"
                " AS BIGINT)"
            ).alias("acf_den_x"),
            F.expr(
                "CAST(count(*) * sum(l.x * l.x) - sum(l.x) * sum(l.x)"
                " AS BIGINT)"
            ).alias("acf_den_y"),
        )
        .orderBy("lag")
    )


_SQL_UEDGES_STAT = """
    ed AS (
        SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    ue AS (SELECT src, dst FROM ed
           UNION ALL SELECT dst AS src, src AS dst FROM ed),
    deg AS (SELECT src AS node, count(*) AS d FROM ue GROUP BY 1),
    ex AS (
        SELECT da.d AS x, db.d AS y
        FROM ue
        JOIN deg da ON da.node = ue.src
        JOIN deg db ON db.node = ue.dst
    )
"""


def _edge_endpoint_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    ue = _undirected_edges(spark, sf_dir).transform(truncate_lineage)
    deg = ue.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("x"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("y"))
    return ue.join(da, "src").join(db, "dst").select("x", "y")


@register(
    "gr_degree_mixing_curve",
    f"""
    WITH {_SQL_UEDGES_STAT}
    SELECT x AS degree,
           CAST(count(*) AS BIGINT) AS n_endpoints,
           CAST(sum(y) * 1000000 // count(*) AS BIGINT)
               AS mean_neighbor_degree_micro
    FROM ex
    GROUP BY x
    ORDER BY degree
    """,
    doc="degree-mixing curve knn(k): exact mean neighbor degree (micro)"
    " per source degree over the undirected co-order graph",
)
def gr_degree_mixing_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assortativity question as a curve: for nodes of degree k,
    what degree do their neighbors have? A falling knn(k) means hubs
    attach to leaves (disassortative — typical for bipartite-derived
    commerce graphs). Both joins are keyed by node (the degree table
    is |V| rows); the output is one row per distinct degree, exact
    integer micro-units."""
    ex = _edge_endpoint_degrees(spark, sf_dir)
    return (
        ex.groupBy(F.col("x").alias("degree"))
        .agg(
            F.count("*").cast("bigint").alias("n_endpoints"),
            F.expr("CAST(sum(y) * 1000000 div count(*) AS BIGINT)").alias(
                "mean_neighbor_degree_micro"
            ),
        )
        .orderBy("degree")
    )


@register(
    "gr_degree_assortativity_stats",
    f"""
    WITH {_SQL_UEDGES_STAT}
    SELECT CAST(count(*) AS BIGINT) AS m2,
           CAST(sum(x) AS BIGINT) AS s_x,
           CAST(sum(x * y) AS BIGINT) AS s_xy,
           CAST(sum(x * x) AS BIGINT) AS s_xx
    FROM ex
    """,
    doc="degree assortativity sufficient statistics: exact edge-endpoint"
    " degree sums over the undirected co-order graph (Pearson r ="
    " (m2*s_xy - s_x^2) / (m2*s_xx - s_x^2) by symmetry)",
)
def gr_degree_assortativity_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Newman's degree assortativity r, shipped as its sufficient
    statistics: over both orientations of every undirected edge the
    distributions of x and y are identical (s_x = s_y, s_xx = s_yy),
    so r = (m2*s_xy - s_x^2) / (m2*s_xx - s_x^2) — one division the
    caller performs after the exact integer sums land. The combined
    products can exceed int64 at extreme edge counts, which is exactly
    why the statistics are emitted raw instead of pre-divided. One
    node-keyed join chain, one global aggregate."""
    ex = _edge_endpoint_degrees(spark, sf_dir)
    return ex.agg(
        F.count("*").cast("bigint").alias("m2"),
        F.expr("CAST(sum(x) AS BIGINT)").alias("s_x"),
        F.expr("CAST(sum(x * y) AS BIGINT)").alias("s_xy"),
        F.expr("CAST(sum(x * x) AS BIGINT)").alias("s_xx"),
    )
