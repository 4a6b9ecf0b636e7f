"""Behavioral event analytics: Markov transitions, RFM segmentation,
nearest-event (bidirectional as-of) attribution.

The reference's stream model treats the event log as the system of
record for user behavior (kafka/README.md:9-10 topics-as-tables;
kafka/README.md:305-311 replayable streams); these operators are the
standard batch analyses a warehouse derives from that log.

Scale design
------------
Every operator here shuffles once on ``user_id`` (the natural key of
the log) and reduces to per-key windows or aggregates; output sizes
are |event types|², |users| and |purchases| — none scale with raw
event volume beyond the first keyed exchange. All arithmetic is
integer-exact (permille ratios, cent-quantized money) so the DuckDB
oracle hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register


@register(
    "ev_markov_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ), pairs AS (
        SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n * 1000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
               AS p_permille
    FROM pairs
    """,
    doc="behavior: first-order Markov transition matrix over per-user event sequences",
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: per user, consecutive event pairs
    in (ts, event_id) order; globally, counts and integer-permille
    transition probabilities. One shuffle on user_id for the sequence
    window, one on from_type for the matrix — the matrix itself is
    |types|² rows, so the permille window is over a tiny frame at any
    corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000 div sum(n) OVER (PARTITION BY from_type)")
        .cast("bigint")
        .alias("p_permille"),
    )


N_RFM_BUCKETS = 5


@register(
    "ev_rfm_segments",
    f"""
    WITH per_user AS (
        SELECT user_id,
               max(ts) AS last_ts,
               count(*) AS frequency,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM events GROUP BY user_id
    ), g AS (
        SELECT max(last_ts) AS now_ts FROM per_user
    )
    SELECT user_id,
           CAST(date_diff('day', last_ts, now_ts) AS BIGINT) AS recency_days,
           frequency, monetary_cents,
           CAST(ntile({N_RFM_BUCKETS}) OVER (ORDER BY last_ts DESC, user_id)
                AS BIGINT) AS r_score,
           CAST(ntile({N_RFM_BUCKETS}) OVER (ORDER BY frequency DESC, user_id)
                AS BIGINT) AS f_score,
           CAST(ntile({N_RFM_BUCKETS}) OVER (ORDER BY monetary_cents DESC, user_id)
                AS BIGINT) AS m_score
    FROM per_user, g
    """,
    doc="behavior: RFM (recency/frequency/monetary) quintile segmentation per user",
    bench=True,
)
def ev_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (days before the dataset's
    last event), frequency and cent-quantized monetary value, each
    scored into deterministic quintiles (ntile with user_id tiebreak).
    Money is floor(value*100) BIGINT cents — double multiplication is
    IEEE-identical across engines and the integer sum is order-free,
    so the oracle hashes exactly. One shuffle on user_id; the ntile
    windows run over the per-user frame (|users| rows, not events).
    At 100 TB replace the global ntile sort with percentile cutoffs
    from a first aggregate pass if |users| itself is huge."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("frequency"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    glob = per_user.agg(F.max("last_ts").alias("now_ts"))
    wr = Window.orderBy(F.desc("last_ts"), F.asc("user_id"))
    wf = Window.orderBy(F.desc("frequency"), F.asc("user_id"))
    wm = Window.orderBy(F.desc("monetary_cents"), F.asc("user_id"))
    return (
        per_user.crossJoin(F.broadcast(glob))
        .select(
            "user_id",
            F.datediff(F.col("now_ts"), F.col("last_ts")).cast("bigint").alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
            F.ntile(N_RFM_BUCKETS).over(wr).cast("bigint").alias("r_score"),
            F.ntile(N_RFM_BUCKETS).over(wf).cast("bigint").alias("f_score"),
            F.ntile(N_RFM_BUCKETS).over(wm).cast("bigint").alias("m_score"),
        )
    )


@register(
    "j_nearest_click",
    """
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'click' THEN ts END AS click_ts
        FROM events WHERE event_type IN ('click', 'purchase')
    ), resolved AS (
        SELECT user_id, ts, event_id, event_type,
               last_value(click_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_click_ts,
               first_value(click_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
               ) AS next_click_ts
        FROM tagged
    )
    SELECT event_id AS purchase_id, user_id,
           CASE
             WHEN next_click_ts IS NULL THEN prev_click_ts
             WHEN prev_click_ts IS NULL THEN next_click_ts
             WHEN date_diff('second', prev_click_ts, ts)
                  <= date_diff('second', ts, next_click_ts) THEN prev_click_ts
             ELSE next_click_ts
           END AS nearest_click_ts,
           CAST(least(
               coalesce(date_diff('second', prev_click_ts, ts), 9223372036854775807),
               coalesce(date_diff('second', ts, next_click_ts), 9223372036854775807)
           ) AS BIGINT) AS dt_seconds
    FROM resolved
    WHERE event_type = 'purchase'
      AND (prev_click_ts IS NOT NULL OR next_click_ts IS NOT NULL)
    """,
    doc="behavior: bidirectional as-of — nearest click in time per purchase",
    bench=True,
)
def j_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event join: for every purchase, the user's closest click
    in EITHER direction (ties favor the earlier click). Same
    union-window formulation as the backward as-of join (one shuffle on
    user_id, one running window in each direction) — no range explode,
    no per-row subquery, so the plan is a per-key sorted merge that
    survives any scale."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    order = ["ts", "event_id"]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    resolved = tagged.select(
        "*",
        F.last("click_ts", ignorenulls=True).over(w_prev).alias("prev_click_ts"),
        F.first("click_ts", ignorenulls=True).over(w_next).alias("next_click_ts"),
    )
    big = F.lit(9223372036854775807)
    dt_prev = F.coalesce(
        F.col("ts").cast("long") - F.col("prev_click_ts").cast("long"), big
    )
    dt_next = F.coalesce(
        F.col("next_click_ts").cast("long") - F.col("ts").cast("long"), big
    )
    return (
        resolved.filter(F.col("event_type") == "purchase")
        .filter(F.col("prev_click_ts").isNotNull() | F.col("next_click_ts").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(dt_prev <= dt_next, F.col("prev_click_ts"))
            .otherwise(F.col("next_click_ts"))
            .alias("nearest_click_ts"),
            F.least(dt_prev, dt_next).cast("bigint").alias("dt_seconds"),
        )
    )


@register(
    "dq_distribution_drift",
    """
    WITH bounds AS (
        SELECT make_timestamp(epoch_us(min(ts))
               + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2) AS t_mid
        FROM events
    ), halves AS (
        SELECT event_type,
               CAST(sum(CASE WHEN ts < t_mid THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN ts >= t_mid THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM events, bounds GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n_a) AS BIGINT) AS tot_a,
               CAST(sum(n_b) AS BIGINT) AS tot_b
        FROM halves
    )
    SELECT event_type, n_a, n_b,
           CAST(n_a * 1000 // tot_a AS BIGINT) AS share_a_permille,
           CAST(n_b * 1000 // tot_b AS BIGINT) AS share_b_permille,
           CAST(abs(n_a * 1000 // tot_a - n_b * 1000 // tot_b) AS BIGINT)
               AS drift_permille
    FROM halves, tot
    """,
    doc="data quality: event-type distribution drift between time halves",
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: the event-type mix of the first time
    half vs the second (per-type permille shares and their absolute
    delta — the integer-exact total-variation components). The snapshot
    boundary is the timespan midpoint, computed from a 1-row broadcast
    aggregate; one shuffle on event_type. This is the check a pipeline
    runs per ingest window to catch upstream mix changes before they
    skew training mixtures."""
    ev = load_table(spark, sf_dir, "events")
    # integer-exact midpoint in microseconds: t_mid = t0 + (t1 - t0) div 2
    bounds = ev.agg(
        F.unix_micros(F.min("ts")).alias("t0u"),
        F.unix_micros(F.max("ts")).alias("t1u"),
    ).select(
        F.timestamp_micros(
            F.col("t0u") + F.expr("(t1u - t0u) div 2")
        ).alias("t_mid")
    )
    halves = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("ts") < F.col("t_mid"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_a"),
            F.sum(F.when(F.col("ts") >= F.col("t_mid"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_b"),
        )
    )
    tot = halves.agg(
        F.sum("n_a").cast("bigint").alias("tot_a"),
        F.sum("n_b").cast("bigint").alias("tot_b"),
    )
    share_a = F.expr("n_a * 1000 div tot_a")
    share_b = F.expr("n_b * 1000 div tot_b")
    return (
        halves.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_a",
            "n_b",
            share_a.cast("bigint").alias("share_a_permille"),
            share_b.cast("bigint").alias("share_b_permille"),
            F.abs(share_a - share_b).cast("bigint").alias("drift_permille"),
        )
    )


@register(
    "ev_anomaly_mad",
    """
    WITH med AS (
        SELECT event_type,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
        FROM events GROUP BY 1
    ), dev AS (
        SELECT e.event_type, m.med, abs(e.value - m.med) AS ad, e.value
        FROM events e JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, med,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS mad
        FROM dev GROUP BY 1, 2
    )
    SELECT d.event_type, m.med, m.mad,
           count(*) AS n,
           CAST(sum(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1, 2, 3
    """,
    doc="robust anomaly scan: median absolute deviation outliers per event type",
)
def ev_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: median / MAD instead of mean / sigma,
    so a burst of anomalies cannot mask itself by inflating its own
    threshold (the failure mode of the 3-sigma scan it complements).
    Discrete percentiles pick actual data elements — bit-identical in
    any engine, no interpolation. Two keyed aggregates plus a broadcast
    of the |types|-row median/MAD tables; per-group sort is the cost,
    traded for approx_percentile at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("ad") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@register(
    "ev_session_cooccurrence",
    """
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, event_type,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM o
    ), types AS (
        SELECT DISTINCT user_id, session_id, event_type FROM sess
    ), per_type AS (
        SELECT event_type, count(*) AS n_sessions_with FROM types GROUP BY 1
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_sessions
        FROM types a JOIN types b
          ON a.user_id = b.user_id AND a.session_id = b.session_id
         AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_sessions,
           CAST(p.n_sessions * 1000
                // least(pa.n_sessions_with, pb.n_sessions_with) AS BIGINT)
               AS affinity_permille
    FROM pairs p
    JOIN per_type pa ON pa.event_type = p.type_a
    JOIN per_type pb ON pb.event_type = p.type_b
    """,
    doc="behavioral: event-type co-occurrence within 30-min sessions,"
    " with integer affinity (pair sessions / rarer type's sessions)",
)
def ev_session_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis on the session grain: which event types
    happen together inside the same 30-minute session, and how strongly
    (pair count over the rarer type's session count, permille — a
    confidence-style affinity that is 1000 when one type implies the
    other). Reuses w2_sessionization's microsecond-exact gap rule; the
    per-session type sets are tiny (≤ |event types|), so the
    within-session self-join is bounded per key and the output is at
    most |types|² rows regardless of event volume. One shuffle on
    user_id, one on the pair key."""
    from big_data_training_spark.operators.analytics import SESSION_GAP_S

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_s = F.when(
        gap_us.isNull() | (gap_us >= SESSION_GAP_S * 1_000_000), 1
    ).otherwise(0)
    types = (
        events.withColumn("new_s", new_s)
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("user_id", "session_id", "event_type")
        .distinct()
    )
    per_type = types.groupBy("event_type").agg(
        F.count("*").alias("n_sessions_with")
    )
    a, b = types.alias("a"), types.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_id") == F.col("b.session_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_sessions"))
    )
    return (
        pairs.join(
            F.broadcast(
                per_type.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n_sessions_with").alias("na"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                per_type.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n_sessions_with").alias("nb"),
                )
            ),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_sessions",
            F.floor(
                F.col("n_sessions") * 1000 / F.least("na", "nb")
            ).alias("affinity_permille"),
        )
    )


@register(
    "ev_cusum_changepoint",
    """
    WITH d AS (
        SELECT date_trunc('day', ts) AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    t AS (SELECT sum(n) AS total, count(*) AS nd FROM d),
    c AS (
        SELECT day, n,
               sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
               row_number() OVER (ORDER BY day) AS rn
        FROM d
    ),
    scored AS (
        SELECT day, n, CAST(cum * t.nd - rn * t.total AS BIGINT) AS cusum
        FROM c, t
    ),
    peak AS (SELECT max(abs(cusum)) AS m FROM scored)
    SELECT day, n AS n_events, cusum AS cusum_scaled,
           CAST(CASE WHEN abs(cusum) = peak.m THEN 1 ELSE 0 END AS INT)
               AS is_peak
    FROM scored, peak
    """,
    doc="CUSUM change-point scan over daily event volume: scaled"
    " cumulative deviation from the global mean, peak day flagged",
)
def ev_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where did the event-rate regime change? Classic CUSUM with the
    mean division cleared: CUSUM_k = sum_{i<=k}(n_i) * N - k * total is
    the cumulative deviation from the global daily mean scaled by N —
    all integers, no float drift, peaks exactly where the float CUSUM
    peaks. One groupBy builds the daily series; the cumulative window
    runs over calendar-bounded rows (days, not events), so the scan
    costs one corpus aggregation at any scale."""
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    t = d.agg(F.sum("n").alias("total"), F.count("*").alias("nd"))
    w = Window.orderBy("day")
    c = d.select(
        "day",
        "n",
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(w).alias("rn"),
    )
    scored = c.crossJoin(F.broadcast(t)).select(
        "day",
        "n",
        (F.col("cum") * F.col("nd") - F.col("rn") * F.col("total"))
        .cast("bigint")
        .alias("cusum"),
    )
    peak = scored.agg(F.max(F.abs("cusum")).alias("m"))
    return scored.crossJoin(F.broadcast(peak)).select(
        "day",
        F.col("n").alias("n_events"),
        F.col("cusum").alias("cusum_scaled"),
        F.when(F.abs("cusum") == F.col("m"), 1).otherwise(0).alias("is_peak"),
    )
