"""Cost-model auditing: the optimizer's cardinality formulas checked
against ground truth.

Catalyst's CBO (like every System-R descendant) estimates equi-join
cardinality as |A|·|B| / max(ndv_A(k), ndv_B(k)) from column stats.
Whether that formula is trustworthy on a given corpus decides whether
stats-based join reordering helps or hurts — so a data platform audits
it: compute the estimate FROM THE SAME STATS the optimizer would use,
compute the true cardinality, and report the error. A large error on a
key means skew or correlation the uniform-frequency assumption misses
(exactly what dq_skew_profile measures from the other side).

Scale: the estimate needs only per-table aggregates (count + ndv per
key — the ANALYZE TABLE pass); the truth per join is one count over
the join, which the audit runs at sampling cadence, not per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

# (name, left table, left key, right table, right key)
_JOINS = (
    ("orders x customer ON custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem x orders ON orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem x part ON partkey", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem x supplier ON suppkey", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
)


def _oracle() -> str:
    legs = []
    for name, lt, lk, rt, rk in _JOINS:
        legs.append(f"""
        SELECT '{name}' AS join_name,
               (SELECT count(*) FROM {lt}) AS n_left,
               (SELECT count(*) FROM {rt}) AS n_right,
               (SELECT count(*) FROM {lt} a JOIN {rt} b
                 ON b.{rk} = a.{lk}) AS n_actual,
               (SELECT count(*) FROM {lt}) * (SELECT count(*) FROM {rt})
                 // greatest(
                      (SELECT count(DISTINCT {lk}) FROM {lt}),
                      (SELECT count(DISTINCT {rk}) FROM {rt}))
                 AS n_estimated""")
    leg_sql = " UNION ALL ".join(legs)
    return f"""
    SELECT join_name, n_left, n_right, n_actual, n_estimated,
           abs(n_estimated - n_actual) * 1000
               // greatest(n_actual, 1) AS err_permille
    FROM ({leg_sql})
    ORDER BY join_name
    """


@register(
    "dq_join_cardinality_audit",
    _oracle(),
    doc="CBO audit: System-R equi-join cardinality estimate"
    " |A||B|/max(ndv) vs true join size, error in permille, for the"
    " four fixture FK joins",
)
def dq_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the uniform-frequency assumption hold here? For each FK
    join: the System-R estimate |A|·|B| div max(ndv_A, ndv_B) computed
    from exactly the stats ANALYZE TABLE collects (row count + exact
    ndv per key), the true join cardinality, and the permille error.
    FK joins under uniformity should land near zero error; a hot key
    (skew) or filtered correlation pushes it up — the number that
    tells you whether to trust stats-driven join reordering on this
    data. Per-table stats are one aggregate each; the truth is one
    count per audited join."""
    out = None
    for name, lt, lk, rt, rk in _JOINS:
        a = load_table(spark, sf_dir, lt)
        b = load_table(spark, sf_dir, rt)
        stats_a = a.agg(
            F.count("*").alias("n_left"),
            F.countDistinct(lk).alias("ndv_l"),
        )
        stats_b = b.agg(
            F.count("*").alias("n_right"),
            F.countDistinct(rk).alias("ndv_r"),
        )
        actual = a.join(b, a[lk] == b[rk]).agg(
            F.count("*").alias("n_actual")
        )
        leg = (
            stats_a.crossJoin(stats_b)
            .crossJoin(actual)
            .selectExpr(
                f"'{name}' AS join_name",
                "n_left",
                "n_right",
                "n_actual",
                "n_left * n_right div greatest(ndv_l, ndv_r)"
                " AS n_estimated",
            )
        )
        out = leg if out is None else out.unionByName(leg)
    assert out is not None
    return out.selectExpr(
        "*",
        "abs(n_estimated - n_actual) * 1000 div greatest(n_actual, 1)"
        " AS err_permille",
    ).orderBy("join_name")
