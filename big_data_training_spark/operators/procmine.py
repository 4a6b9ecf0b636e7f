"""Process mining: the eventually-follows relation and transition
waits over user event streams — the Celonis/PM4Py view of an event
log, complementing the DIRECTLY-follows graph the Markov-transition
operators already build.

Eventually-follows (a ->> b: some a precedes some b in the same case)
is the relation conformance checking and bottleneck analysis start
from; unlike directly-follows it is insensitive to interleaved noise
events. Computed without self-joining raw events: one scan reduces
each case (user) to its per-activity first/last timestamps (bounded:
|activities| columns), and every ordered activity pair is decided
from that summary — first(a) < last(b) means a eventually precedes
some b. The pair lattice is |activities|^2 rows.

The wait report gives the mean seconds from the case's first `a` to
its first `b` AFTER that `a` — the transition's bottleneck weight —
as exact floor integers (timestamps are microsecond-exact doubles
below 2^53 in both engines).

Scale: one groupBy(case) with conditional min/max aggregates, then a
SINGLE 20-count aggregation over the summary unpivoted via stack() —
no event-level self-join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

ACTS = ("click", "error", "purchase", "signup", "view")


def _minmax_sql() -> str:
    cols = ", ".join(
        f"min(CASE WHEN event_type = '{a}' THEN ts END) AS f_{a},"
        f" max(CASE WHEN event_type = '{a}' THEN ts END) AS l_{a}"
        for a in ACTS
    )
    return f"SELECT user_id, {cols} FROM events GROUP BY user_id"


@register(
    "pm_eventually_follows",
    f"""
    WITH u AS MATERIALIZED ({_minmax_sql()}),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
    pairs AS (
        {" UNION ALL ".join(
            f'''SELECT '{a}' AS act_a, '{b}' AS act_b,
                CAST(count(CASE WHEN f_{a} < l_{b} THEN 1 END)
                     AS BIGINT) AS n_cases
                FROM u'''
            for a in ACTS for b in ACTS if a != b
        )}
    )
    SELECT act_a, act_b, n_cases,
           CAST(n_cases * 1000000 // n AS BIGINT) AS support_ppm
    FROM pairs CROSS JOIN tot
    ORDER BY act_a, act_b
    """,
    doc="process-mining eventually-follows relation: for every ordered "
    "activity pair the share of cases where some a precedes some b — "
    "from per-case activity summaries, no event self-join",
)
def pm_eventually_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case summary (per-activity first/last ts via conditional
    min/max) decides a ->> b as first(a) < last(b). One case-keyed
    shuffle; the pair lattice is evaluated as 20 counting aggregates
    over the summary table — the event log is scanned exactly once
    however many activities exist."""
    ev = load_table(spark, sf_dir, "events")
    aggs = []
    for a in ACTS:
        aggs.append(
            F.expr(
                f"min(CASE WHEN event_type = '{a}' THEN ts END)"
            ).alias(f"f_{a}")
        )
        aggs.append(
            F.expr(
                f"max(CASE WHEN event_type = '{a}' THEN ts END)"
            ).alias(f"l_{a}")
        )
    u = ev.groupBy("user_id").agg(*aggs)
    pairs = [(a, b) for a in ACTS for b in ACTS if a != b]
    # ONE aggregation job computes all 20 pair counts + the case
    # total, then stack() unpivots the single row — the event log and
    # the case summary are each touched exactly once.
    count_exprs = [
        F.expr(
            f"CAST(count(CASE WHEN f_{a} < l_{b} THEN 1 END) AS BIGINT)"
        ).alias(f"c_{a}_{b}")
        for a, b in pairs
    ] + [F.expr("CAST(count(*) AS BIGINT)").alias("n")]
    row = u.agg(*count_exprs)
    stack_args = ", ".join(
        f"'{a}', '{b}', c_{a}_{b}" for a, b in pairs
    )
    legs = row.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (act_a, act_b, n_cases)",
        "n",
    )
    return (
        legs
        .selectExpr(
            "act_a",
            "act_b",
            "n_cases",
            "CAST(n_cases * 1000000 div n AS BIGINT) AS support_ppm",
        )
        .orderBy("act_a", "act_b")
    )


@register(
    "pm_transition_wait",
    """
    WITH fa AS (
        SELECT user_id, min(ts) AS t_click FROM events
        WHERE event_type = 'click' GROUP BY 1
    ),
    fb AS (
        SELECT e.user_id AS user_id,
               min(e.ts) AS t_purchase
        FROM events e JOIN fa ON fa.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > fa.t_click
        GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cases,
           CAST(sum(CAST(floor(epoch(t_purchase) - epoch(t_click))
                         AS BIGINT)) AS BIGINT) AS total_wait_sec,
           CAST(sum(CAST(floor(epoch(t_purchase) - epoch(t_click))
                         AS BIGINT)) // count(*) AS BIGINT)
               AS mean_wait_sec
    FROM fa JOIN fb ON fb.user_id = fa.user_id
    """,
    doc="process-mining bottleneck weight: exact mean seconds from a "
    "case's first click to its first subsequent purchase",
)
def pm_transition_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The edge weight for the click->purchase transition: first
    qualifying occurrence per case, exact integer seconds (floor of
    microsecond-exact epoch doubles), floor mean. Two conditional
    aggregations + one case-keyed join — no event self-join."""
    ev = load_table(spark, sf_dir, "events")
    fa = (
        ev.filter("event_type = 'click'")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    fb = (
        ev.filter("event_type = 'purchase'")
        .join(fa, "user_id")
        .filter("ts > t_click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    j = fa.join(fb, "user_id").selectExpr(
        "CAST(floor(CAST(t_purchase AS DOUBLE) - CAST(t_click AS DOUBLE))"
        " AS BIGINT) AS wait_sec"
    )
    return j.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_cases"),
        F.expr("CAST(sum(wait_sec) AS BIGINT)").alias("total_wait_sec"),
        F.expr(
            "CAST(sum(wait_sec) div count(*) AS BIGINT)"
        ).alias("mean_wait_sec"),
    )
