"""Advanced window-frame surface: ntile/percent_rank/cume_dist
ranking, RANGE (value-based) frames, lag/lead gap profiles, and an
ISO-week calendar rollup.

The reference's windowing chapter (W1-W4, flink/README.md:63-96) is
about TIME-bucketed aggregation; this module certifies the other half
of the window story — ORDER-based analytic frames over keyed
partitions, which Spark executes with one shuffle on the partition key
and a per-partition sort (no global sort anywhere). The ISO-week
rollup closes the calendar-bucketing gap (A8 daily extremes /
a11_hourly_counts cover day/hour grains; business weeks need the ISO
8601 week-date rules, which neither engine exposes portably — so the
Thursday-anchor construction is spelled out identically on both
sides).

Scale notes: every window here partitions by a bounded-cardinality or
per-entity key (mktsegment quartiles are per-segment sorts that
two-phase histogram ranking replaces at 100 TB — the ev_auc route;
customer/user frames are per-key bounded). The rollup is one
map-side-combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.numeric import dsum, sql_dsum
from big_data_training_spark.registry import register


@register(
    "win_ntile_percentiles",
    """
    WITH ranked AS (
        SELECT c_custkey, c_mktsegment,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
    )
    SELECT c_custkey, c_mktsegment, quartile,
           round(pct_rank, 6) AS pct_rank, round(cume, 6) AS cume
    FROM ranked WHERE c_custkey % 53 = 0
    """,
    doc="ntile quartiles + percent_rank + cume_dist per market segment"
    " (deterministic tie-break on the key)",
)
def win_ntile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranking inside each segment: quartile assignment,
    percent_rank = (rank-1)/(n-1) and cume_dist = rank/n. The order key
    (c_acctbal, c_custkey) is a total order, so every rank — and hence
    every ratio — is deterministic; the ratios are single divisions of
    exact integers, identical doubles in both engines. At 100 TB the
    per-segment sort becomes two-phase histogram ranking (the
    ev_auc_mannwhitney route); the definitions here are the oracle."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .filter(F.col("c_custkey") % 53 == 0)
    )


@register(
    "win_range_frame_sum",
    """
    SELECT o_orderkey, o_custkey, day,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                    PARTITION BY o_custkey ORDER BY day
                    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
                ), 2) AS DOUBLE) AS trailing_30d_revenue
    FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               datediff('day', DATE '1992-01-01',
                        CAST(o_orderdate AS DATE)) AS day
        FROM orders
    ) WHERE o_custkey % 101 = 0
    """,
    doc="RANGE (value-based) window frame: per-customer trailing-30-day"
    " revenue, decimal-exact",
)
def win_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based frames: RANGE BETWEEN 30 PRECEDING bounds the frame
    by the ORDER-key VALUE (days since epoch), not by row position —
    the trailing-window semantics a calendar rollup can't express when
    rows are irregular. Sums are decimal(38,6)-exact (order-free),
    rounded in decimal space, so frame-content equality is the only
    thing being tested. One shuffle on o_custkey; per-customer frames
    are bounded."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("day"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        base.select(
            "o_orderkey",
            "o_custkey",
            "day",
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w), 2
            )
            .cast("double")
            .alias("trailing_30d_revenue"),
        )
        .filter(F.col("o_custkey") % 101 == 0)
    )


@register(
    "win_lag_lead_gaps",
    """
    WITH g AS (
        SELECT user_id, event_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
               lead(epoch_us(ts)) OVER w - epoch_us(ts) AS next_gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, gap_us, next_gap_us
    FROM g WHERE user_id % 199 = 0
    """,
    doc="lag/lead inter-event gaps per user in exact microseconds"
    " (NULL at series edges)",
)
def win_lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inter-arrival profile as raw lag/lead deltas: exact integer
    microseconds between consecutive events per user, NULL at the
    first/last row of each series (no default-fill — edge visibility
    is the point). One shuffle on user_id, per-user frames bounded by
    user activity."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return (
        ev.select(
            "user_id",
            "event_id",
            (us - F.lag(us).over(w)).alias("gap_us"),
            (F.lead(us).over(w) - us).alias("next_gap_us"),
        )
        .filter(F.col("user_id") % 199 == 0)
    )


# ISO 8601 week-date: the week containing a date's nearest Thursday
# defines both the ISO year and the week number. Implemented from
# primitives both engines share bit-for-bit (weekday arithmetic +
# dayofyear), NOT from engine week() functions, whose ISO-ness is
# locale/config-dependent.
_ISO_SPARK = {
    "wd": "weekday(CAST(o_orderdate AS DATE))",  # Monday=0
    "thu": "date_add(CAST(o_orderdate AS DATE), 3 - weekday(CAST(o_orderdate AS DATE)))",
}
_ISO_DUCK = {
    "wd": "(isodow(CAST(o_orderdate AS DATE)) - 1)",  # Monday=0
    "thu": "CAST(o_orderdate AS DATE)"
    " + to_days(CAST(3 - (isodow(CAST(o_orderdate AS DATE)) - 1) AS INT))",
}


@register(
    "cal_iso_week_rollup",
    f"""
    SELECT CAST(year({_ISO_DUCK['thu']}) AS BIGINT) AS iso_year,
           CAST((dayofyear({_ISO_DUCK['thu']}) - 1) // 7 + 1 AS BIGINT)
               AS iso_week,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY 1, 2
    """,
    doc="ISO 8601 week rollup via the Thursday-anchor construction"
    " (year boundaries assigned to the correct ISO year)",
)
def cal_iso_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-week bucketing done right: Dec 29-31 / Jan 1-3 belong
    to whichever ISO year owns their week's Thursday. iso_week =
    (dayofyear(thursday)-1) div 7 + 1 needs no week() builtin, so the
    bucketing is engine-portable by construction. One integer-keyed
    aggregate; revenue decimal-exact."""
    orders = load_table(spark, sf_dir, "orders")
    thu = F.expr(_ISO_SPARK["thu"])
    return (
        orders.groupBy(
            F.year(thu).cast("bigint").alias("iso_year"),
            F.expr(f"(dayofyear({_ISO_SPARK['thu']}) - 1) div 7 + 1")
            .cast("bigint")
            .alias("iso_week"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
    )
