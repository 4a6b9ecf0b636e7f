"""Incremental maintenance of JOIN views: the delta-join expansion.

The existing MV operators (operators/maintenance.py) maintain
aggregate-only views; real warehouse views join first. The change
propagation rule for V = A ⋈ B under inserts is the bilinear
expansion

    ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

and for an aggregate over the join, partials add (the stream-table
duality of kafka/README.md:319: the view is the table, the deltas are
the stream). This module proves the rule end-to-end: a revenue-per-
customer view over orders ⋈ lineitem is maintained from a standing MV
plus the three delta joins, and the oracle recomputes the view from
scratch — merge(base, Δ-terms) must hash-match the full recompute.

Scale: each delta term joins ONE small (delta) side against one large
side, so the big tables are never re-joined with each other. The
ΔA ⋈ B_old and A_old ⋈ ΔB terms broadcast the delta when it fits
(here: days of new orders vs years of history), and ΔA ⋈ ΔB is
delta-sized on both sides. Refresh cost is O(Δ·log + |MV|), never
O(history²) — the argument Materialize/DBSP make, expressed as three
Spark joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

CUTOVER = "1997-01-01"  # orders/lineitems on or after this date are the delta

_REV_CENTS = (
    "CAST(round(CAST(l_extendedprice AS DECIMAL(38,6))"
    " * (1 - CAST(l_discount AS DECIMAL(38,6))) * 100, 0) AS BIGINT)"
)


@register(
    "mv_join_delta_refresh",
    f"""
    SELECT o.o_custkey AS custkey,
           count(*) AS n_items,
           CAST(sum({_REV_CENTS}) AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    doc="join-view IVM: revenue-per-customer over orders⋈lineitem"
    f" maintained via ΔA⋈B + A⋈ΔB + ΔA⋈ΔB (cutover {CUTOVER});"
    " oracle = full recompute",
    bench=True,
)
def mv_join_delta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain V(custkey) = (count, revenue) over orders ⋈ lineitem
    without re-joining history with history. The standing MV covers
    base orders ⋈ base lineitems (o_orderdate and l_shipdate before
    the cutover); the refresh adds exactly three delta terms —
    new-orders⋈old-items, old-orders⋈new-items, new⋈new — and merges
    partials by key. Each term has a delta on at least one side; both
    delta sides are broadcast-eligible at real scale (a day's inserts
    vs years of history), and the partial-merge is a single groupBy.
    The oracle is the from-scratch join — the bilinear expansion must
    be EXACT, which the BIGINT-cents revenue guarantees (no float
    reassociation across the four partial tables)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_shipdate",
        F.expr(_REV_CENTS).alias("cents"),
    )
    o_base = orders.filter(F.col("o_orderdate") < CUTOVER)
    o_delta = orders.filter(F.col("o_orderdate") >= CUTOVER)
    l_base = li.filter(F.col("l_shipdate") < CUTOVER)
    l_delta = li.filter(F.col("l_shipdate") >= CUTOVER)

    def partial(o: DataFrame, l: DataFrame) -> DataFrame:
        return (
            o.join(l, o["o_orderkey"] == l["l_orderkey"])
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.count("*").alias("n_items"),
                F.sum("cents").alias("revenue_cents"),
            )
        )

    # The standing MV (in production: read back from storage, not
    # recomputed — recomputed here so the query is self-contained) plus
    # the three delta terms of the bilinear expansion.
    terms = [
        partial(o_base, l_base),      # the standing MV
        partial(o_delta, l_base),     # ΔA ⋈ B_old
        partial(o_base, l_delta),     # A_old ⋈ ΔB
        partial(o_delta, l_delta),    # ΔA ⋈ ΔB
    ]
    merged = terms[0]
    for t in terms[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("custkey").agg(
        F.sum("n_items").cast("bigint").alias("n_items"),
        F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
    )
