"""Market-data style series analytics over the event stream — OHLC
bars, VWAP, maximum drawdown, rolling Sharpe, a runs test, and
Bollinger-band breakouts.

Reference stage "analyze" (README.md:18-22): the windowed-aggregation
chapter (W1-W4, flink/README.md:63-96) certifies time bucketing;
these queries certify the SERIES-shaped readouts a metrics/trading
pipeline derives from those buckets. Everything reduces the corpus to
a DAY- or HOUR-grain series first (one map-side-combinable shuffle to
O(days) rows), so the window arithmetic that follows runs over
hundreds of rows regardless of corpus size — the cheap-after-reduce
shape that scales to 100 TB by construction. Time buckets are pure
integer arithmetic on epoch microseconds (no timezone or calendar
surface).

Determinism: measures are exact milli-int sums; band/breakout
comparisons and ratio statistics are single double expressions over
identical exact integers (strict inequalities of identical doubles
never flip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

_V = "CAST(floor(value * 1000) AS BIGINT)"
_HR_S = "unix_micros(ts) div 3600000000"
_HR_D = "epoch_us(ts) // 3600000000"
_DAY_S = "unix_micros(ts) div 86400000000"
_DAY_D = "epoch_us(ts) // 86400000000"

_SQL_DAILY = f"""
    daily AS (
        SELECT {_DAY_D} AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum({_V}) AS BIGINT) AS d_milli
        FROM events GROUP BY 1
    )
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.expr(_DAY_S).alias("day")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.expr(_V)).alias("d_milli"),
    )


@register(
    "fin_ohlc_bars",
    f"""
    WITH t AS (
        SELECT {_HR_D} AS hr, {_V} AS v,
               row_number() OVER (PARTITION BY {_HR_D}
                                  ORDER BY ts, event_id) AS ra,
               row_number() OVER (PARTITION BY {_HR_D}
                                  ORDER BY ts DESC, event_id DESC) AS rd
        FROM events WHERE event_type = 'purchase'
    )
    SELECT hr,
           CAST(max(CASE WHEN ra = 1 THEN v END) AS BIGINT) AS open_milli,
           CAST(max(v) AS BIGINT) AS high_milli,
           CAST(min(v) AS BIGINT) AS low_milli,
           CAST(max(CASE WHEN rd = 1 THEN v END) AS BIGINT) AS close_milli,
           CAST(count(*) AS BIGINT) AS n_trades
    FROM t GROUP BY 1 HAVING count(*) >= 3
    """,
    doc="hourly OHLC bars over purchase values: first/last by total"
    " event-time order plus high/low, exact milli-units",
)
def fin_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick reduction: open/close are the first/last
    observation under the TOTAL order (ts, event_id) — row_number, not
    min_by/arg_min, because those tie-break arbitrarily — and high/low
    are plain extremes. One shuffle on the hour key; at 100 TB the bar
    key gains a symbol/entity component so no single hour is a hot
    partition (this single-series fixture is the degenerate case)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    hr = F.expr(_HR_S)
    wa = Window.partitionBy(hr).orderBy("ts", "event_id")
    wd = Window.partitionBy(hr).orderBy(F.desc("ts"), F.desc("event_id"))
    t = ev.select(
        hr.alias("hr"),
        F.expr(_V).alias("v"),
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return (
        t.groupBy("hr")
        .agg(
            F.max(F.when(F.col("ra") == 1, F.col("v")))
            .cast("bigint")
            .alias("open_milli"),
            F.max("v").cast("bigint").alias("high_milli"),
            F.min("v").cast("bigint").alias("low_milli"),
            F.max(F.when(F.col("rd") == 1, F.col("v")))
            .cast("bigint")
            .alias("close_milli"),
            F.count("*").alias("n_trades"),
        )
        .filter(F.col("n_trades") >= 3)
    )


@register(
    "fin_vwap_monthly",
    """
    SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
               AS ship_month,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * 100
                         AS BIGINT) * CAST(l_quantity AS BIGINT))
                // sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS vwap_cents,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS volume
    FROM lineitem GROUP BY 1
    """,
    doc="volume-weighted average price per ship month, exact integer"
    " cents (decimal-derived, order-free)",
)
def fin_vwap_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VWAP = Σ(price·qty)/Σqty in exact integer arithmetic: prices
    become cents through a decimal cast (never a float product), both
    sums are BIGINT, and the final integer division is exact. One
    map-side-combinable shuffle to 12·years rows."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * 100 AS BIGINT)"
    )
    qty = F.expr("CAST(l_quantity AS BIGINT)")
    return (
        li.groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("bigint")
            .alias("ship_month")
        )
        .agg(
            F.sum(cents * qty).alias("pq"),
            F.sum(qty).alias("volume"),
        )
        .selectExpr(
            "ship_month",
            "CAST(pq div volume AS BIGINT) AS vwap_cents",
            "CAST(volume AS BIGINT) AS volume",
        )
    )


@register(
    "fin_max_drawdown",
    f"""
    WITH {_SQL_DAILY},
    cum1 AS (
        SELECT day,
               CAST(sum(d_milli) OVER (ORDER BY day) AS BIGINT) AS equity
        FROM daily
    ),
    cum AS (
        SELECT day, equity,
               CAST(max(equity) OVER (ORDER BY day) AS BIGINT) AS peak
        FROM cum1
    ),
    dd AS (
        SELECT day, peak, equity, peak - equity AS drawdown_milli,
               row_number() OVER (ORDER BY peak - equity DESC, day) AS rk
        FROM cum
    )
    SELECT day, peak, equity, drawdown_milli FROM dd WHERE rk = 1
    """,
    doc="maximum drawdown of the cumulative daily value series"
    " (running-max minus equity, exact integers)",
)
def fin_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown: equity = running sum of daily totals, peak =
    running max of equity, drawdown = peak − equity; the argmax
    tie-breaks on the earlier day. The corpus reduces to O(days) rows
    before any window runs, so the unpartitioned scans are over
    hundreds of rows — the series grain, not the corpus, bounds the
    window."""
    cum_w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = _daily(spark, sf_dir).select(
        "day",
        F.sum("d_milli").over(cum_w).cast("bigint").alias("equity"),
    )
    cum = cum.select(
        "day",
        F.max("equity").over(cum_w).cast("bigint").alias("peak"),
        "equity",
    )
    wr = Window.orderBy(F.desc(F.col("peak") - F.col("equity")), F.asc("day"))
    return (
        cum.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "day",
            "peak",
            "equity",
            (F.col("peak") - F.col("equity")).alias("drawdown_milli"),
        )
    )


@register(
    "fin_rolling_sharpe",
    f"""
    WITH {_SQL_DAILY},
    roll AS (
        SELECT day,
               CAST(count(*) OVER w AS BIGINT) AS n7,
               CAST(sum(d_milli) OVER w AS BIGINT) AS s7,
               CAST(sum(d_milli * d_milli) OVER w AS BIGINT) AS q7
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           CAST(floor(1000 * (s7 / 7.0)
                / nullif(sqrt((7.0 * q7 - CAST(s7 AS DOUBLE) * s7) / 42.0), 0)
             ) AS BIGINT) AS sharpe_milli
    FROM roll WHERE n7 = 7 AND day % 5 = 0
    """,
    doc="rolling 7-day Sharpe ratio of the daily value series in"
    " deterministic fixed-point milli",
)
def fin_rolling_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling mean/volatility ratio: the 7-row frame carries exact
    integer (n, Σ, Σ²); sharpe = mean/std is one double expression
    floored to milli — identical doubles, identical floors. Full
    frames only; every-5th-day sampling keeps the certified row set
    compact."""
    return sharpe_finish(_daily(spark, sf_dir))


def sharpe_finish(daily: DataFrame) -> DataFrame:
    """Rolling-Sharpe readout over a (day, d_milli) series — shared by
    the batch query and its streaming twin (st_sharpe_stream), so the
    two can only ever diverge in how the day series is MAINTAINED,
    never in the statistic."""
    w = Window.orderBy("day").rowsBetween(-6, 0)
    roll = daily.select(
        "day",
        F.count("*").over(w).cast("bigint").alias("n7"),
        F.sum("d_milli").over(w).cast("bigint").alias("s7"),
        F.sum(F.col("d_milli") * F.col("d_milli"))
        .over(w)
        .cast("bigint")
        .alias("q7"),
    )
    return roll.filter((F.col("n7") == 7) & (F.col("day") % 5 == 0)).selectExpr(
        "day",
        "CAST(floor(1000 * (s7 / 7.0)"
        " / nullif(sqrt((7.0 * q7 - CAST(s7 AS DOUBLE) * s7) / 42.0), 0)"
        ") AS BIGINT) AS sharpe_milli",
    )


@register(
    "ts_runs_test_daily",
    f"""
    WITH {_SQL_DAILY},
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(n_events) AS BIGINT) AS total FROM daily),
    signs AS (
        SELECT day,
               CASE WHEN n_events * nd > total THEN 1 ELSE 0 END AS sgn
        FROM daily, tot
    ),
    runs AS (
        SELECT sgn,
               CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL
                     OR lag(sgn) OVER (ORDER BY day) <> sgn
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    ),
    agg AS (
        SELECT CAST(sum(new_run) AS BIGINT) AS r,
               CAST(sum(sgn) AS BIGINT) AS n1,
               CAST(count(*) - sum(sgn) AS BIGINT) AS n2
        FROM runs
    )
    SELECT n1, n2, r,
           CAST(floor(1000000 * (r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                           * (n1 + n2 - 1)))) AS BIGINT) AS z_micro
    FROM agg
    """,
    doc="Wald-Wolfowitz runs test on the daily activity series"
    " (above/below the exact mean), fixed-point z from exact counts",
)
def ts_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomness check without any float in the signal path: the
    above/below-mean sign compares c_t·n_days against Σc (exact
    integer cross-multiplication — no mean is ever materialized), run
    boundaries are lag comparisons, and the z statistic is one double
    expression over (n1, n2, R), FLOORED to micro fixed-point (round()
    at a half boundary diverges between engines — functions/numeric.py;
    floors of identical doubles cannot). The series is day-grain, so the
    ordered scan is over hundreds of rows."""
    daily = _daily(spark, sf_dir)
    tot = daily.agg(
        F.count("*").alias("nd"), F.sum("n_events").alias("total")
    )
    signs = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        F.when(
            F.col("n_events") * F.col("nd") > F.col("total"), 1
        )
        .otherwise(0)
        .alias("sgn"),
    )
    wd = Window.orderBy("day")
    runs = signs.select(
        "sgn",
        F.when(
            F.lag("sgn").over(wd).isNull()
            | (F.lag("sgn").over(wd) != F.col("sgn")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("bigint").alias("r"),
        F.sum("sgn").cast("bigint").alias("n1"),
        (F.count("*") - F.sum("sgn")).cast("bigint").alias("n2"),
    )
    return agg.selectExpr(
        "n1",
        "n2",
        "r",
        "CAST(floor(1000000 * (r - (2.0 * n1 * n2 / (n1 + n2) + 1))"
        " / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
        " / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2) * (n1 + n2 - 1))))"
        " AS BIGINT) AS z_micro",
    )


@register(
    "ts_bollinger_breakouts",
    f"""
    WITH {_SQL_DAILY},
    roll AS (
        SELECT day, d_milli,
               CAST(count(*) OVER w AS BIGINT) AS n20,
               CAST(sum(d_milli) OVER w AS BIGINT) AS s20,
               CAST(sum(d_milli * d_milli) OVER w AS BIGINT) AS q20
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, d_milli,
           CASE WHEN d_milli * 19 > s20 THEN 'up' ELSE 'down' END AS side
    FROM roll
    WHERE n20 = 19
      AND CAST(19 * d_milli - s20 AS DOUBLE)
          * CAST(19 * d_milli - s20 AS DOUBLE) * 18.0
          > 19.0 * (19.0 * q20 - CAST(s20 AS DOUBLE) * s20)
    """,
    doc="Bollinger-band breakouts: days beyond 1 sigma of the trailing"
    " 19-day window, cross-multiplied deterministic band test",
)
def ts_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breakout = |x − m| > kσ over the TRAILING window (current day
    excluded so the test point never contaminates its own band; k = 1
    here — the fixture's daily series is near-uniform, so the classic
    k = 2 never fires and would certify nothing). The
    comparison is cross-multiplied into one double inequality over
    exact integers — identical operands on both sides, so the strict
    inequality can never disagree between engines."""
    return bollinger_finish(_daily(spark, sf_dir))


def bollinger_finish(daily: DataFrame) -> DataFrame:
    """Breakout test over a (day, d_milli) series — shared by the batch
    query and its streaming twin (st_bollinger_stream)."""
    w = Window.orderBy("day").rowsBetween(-19, -1)
    roll = daily.select(
        "day",
        "d_milli",
        F.count("*").over(w).cast("bigint").alias("n20"),
        F.sum("d_milli").over(w).cast("bigint").alias("s20"),
        F.sum(F.col("d_milli") * F.col("d_milli"))
        .over(w)
        .cast("bigint")
        .alias("q20"),
    )
    return (
        roll.filter(F.col("n20") == 19)
        .filter(
            F.expr(
                "CAST(19 * d_milli - s20 AS DOUBLE)"
                " * CAST(19 * d_milli - s20 AS DOUBLE) * 18.0"
                " > 19.0 * (19.0 * q20 - CAST(s20 AS DOUBLE) * s20)"
            )
        )
        .selectExpr(
            "day",
            "d_milli",
            "CASE WHEN d_milli * 19 > s20 THEN 'up' ELSE 'down' END AS side",
        )
    )
