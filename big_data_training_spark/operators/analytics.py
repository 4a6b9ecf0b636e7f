"""Engine-addition analytics: grouping sets, pivot, exact/approx
distincts, percentiles, per-group top-k, as-of join, sessionization.

These are not described by the reference corpus (SURVEY.md §2.4 note,
§2.11 note) but come free with Spark SQL and round out the warehouse
surface a user of the reference's pipeline stage (README.md:21-22)
expects. Sessionization is W2's session-window form in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.numeric import dsum, sql_dsum
from big_data_training_spark.registry import register

SESSION_GAP_S = 1800
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "w2_sessionization",
    f"""
    WITH o AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        >= {SESSION_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM o
    )
    SELECT user_id, session_id, min(ts) AS session_start,
           max(ts) AS session_end, count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    doc="W2 batch form: gap-based sessionization (lag + cumulative sum)",
    bench=True,
)
def w2_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows in batch: a session breaks when the per-key gap
    reaches the 30-min threshold — one shuffle on the key, two window
    passes, no Python. Gaps compare in exact microseconds so the split
    decision matches session_window's half-open [start, last+gap)
    interval (second-truncated gaps would split 1799.3s apart events
    that streaming merges)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gaps: whole-second truncation would split a
    # 1799.3s gap that session_window (exact event time) merges
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_s = F.when(gap_us.isNull() | (gap_us >= SESSION_GAP_S * 1_000_000), 1).otherwise(0)
    return (
        events.withColumn("new_s", new_s)
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "k_topk_per_group",
    """
    SELECT o_orderstatus, o_orderkey, o_totalprice, rk
    FROM (
        SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
    doc="K1 generalization: top-k per group via ranked window",
)
def k_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per status: rank inside the key partition — the
    distributed form of per-key top-k (no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


@register(
    "agg_rollup_daily",
    f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           count(*) AS n, {sql_dsum('value', 'total_value')}
    FROM events GROUP BY ROLLUP (day, event_type)
    """,
    doc="rollup: day × type hierarchy with subtotals and grand total",
)
def agg_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — partial-aggregate-friendly subtotals."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.rollup(F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("event_type"))
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )


@register(
    "agg_cube_returns",
    f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity', 'sum_qty')},
           count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="cube: all grouping-set combinations over returnflag × linestatus",
)
def agg_cube_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "lineitem")
    return (
        events.cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count("*").alias("n"))
    )


_PIVOT_SQL_COLS = ",\n           ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES
)


@register(
    "agg_pivot_daily_types",
    f"""
    SELECT date_trunc('day', ts) AS day,
           {_PIVOT_SQL_COLS}
    FROM events GROUP BY 1
    """,
    doc="pivot: event types to columns (wide daily activity matrix)",
)
def agg_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-discovery
    scan — required form at scale)."""
    events = load_table(spark, sf_dir, "events")
    df = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    renamed = df.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES]
    )
    return renamed


@register(
    "agg_unpivot_daily",
    f"""
    WITH wide AS (
        SELECT date_trunc('day', ts) AS day,
               {_PIVOT_SQL_COLS}
        FROM events GROUP BY 1
    )
    SELECT day, kind, n FROM (
        {' UNION ALL '.join(
            f"SELECT day, '{t}' AS kind, n_{t} AS n FROM wide" for t in EVENT_TYPES
        )}
    )
    """,
    doc="unpivot/melt: wide daily matrix back to long (stack)",
)
def agg_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse of pivot via the stack() generator — wide → long
    without N scans (one pass, row-expanding projection)."""
    wide = agg_pivot_daily_types(spark, sf_dir)
    stack_expr = "stack({}, {}) as (kind, n)".format(
        len(EVENT_TYPES),
        ", ".join(f"'{t}', n_{t}" for t in EVENT_TYPES),
    )
    return wide.select("day", F.expr(stack_expr))


@register(
    "agg_exact_distinct",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="exact distinct aggregation (two-phase distinct expand)",
)
def agg_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "agg_approx_sketches",
    None,  # HLL/quantile-sketch values are engine-specific
    doc="approximate sketches: approx_count_distinct + approx percentile (rows-only)",
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB forms: HyperLogLog++ distinct and GK-sketch quantiles —
    constant memory per group, one pass, no exact-distinct expansion.
    Sketch internals differ per engine, so the driver does a rows-only
    check; accuracy is asserted against exact values in tests/."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        )
    )


@register(
    "agg_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
    doc="exact percentiles (linear interpolation) per key",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
    )


@register(
    "j_asof_join",
    f"""
    WITH pairs AS (
        SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
               s.user_id AS user_id,
               CAST(date_diff('second', p.ts, s.ts) AS BIGINT) AS age_s,
               row_number() OVER (PARTITION BY s.event_id
                                  ORDER BY p.ts DESC, p.event_id DESC) AS rk
        FROM events s JOIN events p
          ON s.user_id = p.user_id
         AND p.ts <= s.ts AND p.ts > s.ts - INTERVAL 7 DAY
        WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
    )
    SELECT signup_id, purchase_id, user_id, age_s FROM pairs WHERE rk = 1
    """,
    doc="as-of join: latest purchase at-or-before each signup (7-day horizon)",
)
def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join — Spark has no native operator, so: bounded
    range equi-join on the key + rank-1 per left row. The 7-day horizon
    bounds the intermediate; at scale, bucketize ts into horizon-sized
    bins to turn the range predicate into an equi-key (docs/SCALING.md)."""
    events = load_table(spark, sf_dir, "events")
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", F.col("ts").alias("s_ts")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = s.join(
        p,
        (s.user_id == p.p_user)
        & (p.p_ts <= s.s_ts)
        & (p.p_ts > s.s_ts - F.expr("INTERVAL 7 DAYS")),
    )
    w = Window.partitionBy("signup_id").orderBy(F.desc("p_ts"), F.desc("purchase_id"))
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "signup_id",
            "purchase_id",
            "user_id",
            (F.col("s_ts").cast("long") - F.col("p_ts").cast("long")).alias("age_s"),
        )
    )


@register(
    "ev_funnel_steps",
    """
    WITH a AS (
        SELECT user_id, min(ts) AS ta FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), b AS (
        SELECT e.user_id, min(e.ts) AS tb
        FROM events e JOIN a ON e.user_id = a.user_id
        WHERE e.event_type = 'click' AND e.ts > a.ta
        GROUP BY e.user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS tc
        FROM events e JOIN b ON e.user_id = b.user_id
        WHERE e.event_type = 'purchase' AND e.ts > b.tb
        GROUP BY e.user_id
    )
    SELECT 1 AS step, 'view' AS stage, count(*) AS n_users FROM a
    UNION ALL
    SELECT 2, 'view>click', count(*) FROM b
    UNION ALL
    SELECT 3, 'view>click>purchase', count(*) FROM c
    """,
    doc="ordered conversion funnel: view → click → purchase per user",
)
def ev_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (each stage strictly after the previous one for
    the same user): stage N is a per-user min-timestamp aggregate joined
    back into the event scan of stage N+1. Every stage shuffles on
    user_id, so the three aggregations co-partition and AQE plans the
    stage-to-stage joins without extra exchanges; per-user state never
    leaves the executors."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ta"))
    )
    b = (
        ev.filter(F.col("event_type") == "click")
        .join(a, "user_id")
        .filter(F.col("ts") > F.col("ta"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tb"))
    )
    c = (
        ev.filter(F.col("event_type") == "purchase")
        .join(b, "user_id")
        .filter(F.col("ts") > F.col("tb"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    def stage(df: DataFrame, step: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(name).alias("stage"),
            F.count("*").alias("n_users"),
        )
    return (
        stage(a, 1, "view")
        .unionByName(stage(b, 2, "view>click"))
        .unionByName(stage(c, 3, "view>click>purchase"))
    )


@register(
    "ev_retention_cohorts",
    """
    WITH first_seen AS (
        SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day AS cohort_day,
           datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="retention cohorts: first-seen day × activity-day offset matrix",
    bench=True,
)
def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: cohort = first active day per user (one
    user_id-keyed aggregate), joined back onto the event stream and
    re-aggregated by (cohort, day offset) with an exact distinct-user
    count. Both aggregations and the join share the user_id
    partitioning; the second groupBy re-keys once. At 100 TB the exact
    countDistinct is the only expensive step — swap for
    approx_count_distinct when ±2% is acceptable."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    return (
        ev.join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


SESSION_TTL_SEC = 300


@register(
    "ev_peak_concurrency",
    f"""
    WITH bounds AS (
        SELECT date_trunc('day', ts) AS day, ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT date_trunc('day', ts), ts + INTERVAL {SESSION_TTL_SEC} SECOND, -1
        FROM events
    ), sweep AS (
        SELECT day,
               sum(delta) OVER (PARTITION BY day ORDER BY t, delta) AS conc
        FROM bounds
    )
    SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrency FROM sweep GROUP BY day
    """,
    doc="interval sweep: peak concurrent in-flight events per day",
)
def ev_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the +1/−1 boundary sweep: each event is an
    in-flight interval [ts, ts+TTL); emit +1 at start and −1 at end,
    running-sum in time order, take the max. Attribution is to the
    start day, so the window PARTITIONs by day — no global sort, one
    exchange keyed on day. Ties are handled identically in both
    engines because a RANGE-framed running sum aggregates peer rows
    together (and −1 sorts before +1, making intervals half-open).
    At 100 TB this is the textbook replacement for a self-join
    "count overlapping intervals" quadratic."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    starts = events.select(day, F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = events.select(
        day,
        (F.col("ts") + F.expr(f"INTERVAL {SESSION_TTL_SEC} SECONDS")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    bounds = starts.unionByName(ends)
    w = Window.partitionBy("day").orderBy("t", "delta")
    return (
        bounds.withColumn("conc", F.sum("delta").over(w))
        .groupBy("day")
        .agg(F.max("conc").alias("peak_concurrency"))
    )


@register(
    "ev_funnel_conversion",
    """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
    )
    SELECT 1 AS step, 'signup' AS name, count(*) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'view_after_signup', count(*) FROM s2
    UNION ALL
    SELECT 3, 'purchase_after_view', count(*) FROM s3
    """,
    doc="ordered funnel: signup -> view -> purchase, strictly increasing ts",
)
def ev_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic ordered-sequence funnel over the event stream: each stage
    keeps the earliest qualifying timestamp and the next stage requires a
    strictly later event — all min-aggregations and joins on user_id, so
    every stage shuffles once on the same key (Catalyst reuses the
    partitioning across stages) and the frame shrinks monotonically."""
    events = load_table(spark, sf_dir, "events")
    s1 = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, step: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(name).alias("name"),
            F.count("*").alias("n_users"),
        ).select("step", "name", "n_users")

    return (
        stage(s1, 1, "signup")
        .unionAll(stage(s2, 2, "view_after_signup"))
        .unionAll(stage(s3, 3, "purchase_after_view"))
    )


@register(
    "ev_burst_detection",
    """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT event_type,
               count(*) AS n,
               CAST(sum(c) AS DECIMAL(38,0)) AS s1,
               CAST(sum(CAST(c AS DECIMAL(19,0)) * c) AS DECIMAL(38,0)) AS s2
        FROM hourly GROUP BY 1
    )
    SELECT h.event_type, h.hour_start, h.c AS n_events
    FROM hourly h JOIN stats s USING (event_type)
    WHERE (CAST(h.c AS DECIMAL(38,0)) * s.n - s.s1)
          * (CAST(h.c AS DECIMAL(38,0)) * s.n - s.s1)
          > 9 * (s.n * s.s2 - s.s1 * s.s1)
      AND h.c * s.n > s.s1
    """,
    doc="burst detection: hours with event counts beyond 3 sigma, integer-exact",
)
def ev_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-anomaly flagging with *no* floating point: the 3σ test
    (c-μ)² > 9σ² is multiplied through by n² to the all-integer form
    (cn-S1)² > 9(nS2-S1²), so the flag set is bit-exact in any engine —
    no sqrt, no rounding boundary. Two aggregates: hourly counts
    (shuffle on type,hour) and per-type moments (|types| rows,
    broadcast back). Only upward bursts flag (c above the mean).

    Overflow contract: the products cap at DECIMAL(38,0); they fit as
    long as |c·n − S1| < 10¹⁹ and n·S2 < ~10³⁷ — with hourly counts
    that holds until a single event type exceeds ~10⁹ events/hour
    sustained over ~10⁹ hours, far beyond 100 TB of events. Because
    c/n/S1/S2 are non-null aggregates, a NULL in any derived term can
    only mean decimal overflow, so rather than letting ANSI-off Spark
    silently drop the row (the opposite of DuckDB, which errors) the
    filter raises on NULL terms."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count("*").alias("c"))
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    dev = F.col("c").cast("decimal(38,0)") * F.col("n") - F.col("s1")
    lhs = dev * dev
    rhs = 9 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    exceeds = F.when(
        lhs.isNull() | rhs.isNull(),
        F.raise_error(F.lit("ev_burst_detection: DECIMAL(38,0) overflow in 3-sigma test")),
    ).otherwise(lhs > rhs)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(exceeds & (F.col("c") * F.col("n") > F.col("s1")))
        .select("event_type", "hour_start", F.col("c").alias("n_events"))
    )


@register(
    "ev_funnel_windowed",
    """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY 1
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s2.t2 + INTERVAL 7 DAY
        GROUP BY 1
    )
    SELECT 1 AS step, 'signup' AS name, count(*) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'view_within_7d', count(*) FROM s2
    UNION ALL
    SELECT 3, 'purchase_within_7d', count(*) FROM s3
    """,
    doc="attribution-window funnel: each step within 7 days of the previous",
)
def ev_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribution-window form of the funnel: a step only counts if
    it lands within 7 days of the previous step's earliest qualifying
    event — the semantics marketing attribution actually uses (unbounded
    funnels overcount loyal-but-slow users). Same single-key shuffle
    chain as ev_funnel_conversion, one extra band predicate per stage."""
    events = load_table(spark, sf_dir, "events")
    window = F.expr("INTERVAL 7 DAY")
    s1 = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + window))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + window))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, step: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(name).alias("name"),
            F.count("*").alias("n_users"),
        ).select("step", "name", "n_users")

    return (
        stage(s1, 1, "signup")
        .unionAll(stage(s2, 2, "view_within_7d"))
        .unionAll(stage(s3, 3, "purchase_within_7d"))
    )
