"""Physical-design and optimizer-statistics advisors: clustering
factor and histogram selectivity, audited against ground truth.

Companion to the cost-model audit (operators/costmodel.py): those
check join cardinality; these check the two other inputs a 100 TB
planner runs on —

* **Clustering factor** (the Oracle-ism): for a candidate sort key,
  how many (file, key-bucket) pairs the current layout produces vs
  the minimum possible. A key already laid out contiguously scores
  near 0 — re-sorting by it buys nothing; a scattered key scores near
  1000 — it is the Z-order/CLUSTER BY candidate (measured benefit for
  the chosen one: s9_zonemap_prune_audit).
* **Equi-depth histogram selectivity**: the estimate a planner makes
  for a range predicate from a 10-bucket equi-depth histogram (bucket
  counts + linear interpolation inside the straddled bucket, exactly
  Postgres/Catalyst semantics), audited against the true row count.
  The histogram is built on integer cents with deterministic ntile
  tie-breaks so both engines see identical buckets.

Both audits are ANALYZE-cost: one pass per audited column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

FILE_ORDERKEYS = 256  # ingest-order files, as in s9_zonemap_prune_audit

# (label, bucket expression over lineitem rows) — bucket granularities
# chosen so n_buckets is comparable across candidates
_CLUSTER_KEYS = (
    ("l_shipdate_month", "year(l_shipdate) * 12 + month(l_shipdate)"),
    ("l_partkey_100", "l_partkey // 100"),
    ("l_suppkey_10", "l_suppkey // 10"),
    ("l_orderkey_256", "l_orderkey // 256"),
)


def _clustering_oracle() -> str:
    legs = []
    for label, bucket in _CLUSTER_KEYS:
        legs.append(f"""
        SELECT '{label}' AS sort_key, n_files, n_buckets, n_pairs,
               (n_pairs - greatest(n_files, n_buckets)) * 1000
                   // greatest(n_files * n_buckets
                               - greatest(n_files, n_buckets), 1)
                   AS scatter_permille
        FROM (
            SELECT CAST(count(DISTINCT f) AS BIGINT) AS n_files,
                   CAST(count(DISTINCT b) AS BIGINT) AS n_buckets,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM (
                SELECT DISTINCT l_orderkey // {FILE_ORDERKEYS} AS f,
                       {bucket} AS b
                FROM lineitem
            )
        )""")
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(legs)
        + ") ORDER BY sort_key"
    )


@register(
    "s9_clustering_factor",
    _clustering_oracle(),
    doc="layout advisor: (file, key-bucket) scatter per candidate sort"
    " key, 0 = already clustered, 1000 = fully scattered — ranks"
    " CLUSTER BY candidates before paying for the rewrite",
)
def s9_clustering_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which column deserves the table rewrite: per candidate key, the
    number of distinct (ingest-file, key-bucket) pairs, normalized
    between the clustered minimum (max(files, buckets)) and the
    scattered maximum (files·buckets) as a permille. l_orderkey
    scores 0 by construction (ingest order IS orderkey order);
    l_shipdate scores high (uncorrelated with ingest), which is why
    the zonemap audit shows its clustered rewrite paying off. Cost:
    one distinct-pair aggregate per candidate — file stats only,
    no data movement."""
    li = load_table(spark, sf_dir, "lineitem")
    out = None
    for label, bucket in _CLUSTER_KEYS:
        b = bucket.replace(" // ", " div ")
        pairs = (
            li.selectExpr(
                f"l_orderkey div {FILE_ORDERKEYS} AS f", f"{b} AS b"
            )
            .distinct()
            .agg(
                F.countDistinct("f").cast("bigint").alias("n_files"),
                F.countDistinct("b").cast("bigint").alias("n_buckets"),
                F.count("*").cast("bigint").alias("n_pairs"),
            )
        )
        leg = pairs.selectExpr(
            f"'{label}' AS sort_key",
            "n_files",
            "n_buckets",
            "n_pairs",
            "(n_pairs - greatest(n_files, n_buckets)) * 1000"
            " div greatest(n_files * n_buckets"
            " - greatest(n_files, n_buckets), 1) AS scatter_permille",
        )
        out = leg if out is None else out.unionByName(leg)
    assert out is not None
    return out.orderBy("sort_key")


HIST_BUCKETS = 10
# range predicates audited: o_totalprice >= V (cents)
_SEL_THRESHOLDS = (5_000_00, 15_000_00, 30_000_00)


def _selectivity_oracle() -> str:
    thresholds = ", ".join(f"({v})" for v in _SEL_THRESHOLDS)
    return f"""
    WITH p AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ), tiled AS (
        SELECT cents,
               ntile({HIST_BUCKETS}) OVER (ORDER BY cents, o_orderkey)
                   AS bucket
        FROM p
    ), hist AS (
        SELECT bucket, min(cents) AS lo, max(cents) AS hi,
               count(*) AS n
        FROM tiled GROUP BY 1
    ), est AS (
        SELECT v,
               CAST(sum(CASE
                   WHEN lo >= v THEN n
                   WHEN hi < v THEN 0
                   ELSE n * (hi - v) // greatest(hi - lo, 1)
               END) AS BIGINT) AS n_estimated
        FROM hist, (VALUES {thresholds}) AS ts(v)
        GROUP BY v
    ), act AS (
        SELECT v, CAST(count(*) AS BIGINT) AS n_actual
        FROM p, (VALUES {thresholds}) AS ts(v)
        WHERE cents >= v GROUP BY v
    )
    SELECT CAST(est.v AS BIGINT) AS threshold_cents,
           act.n_actual, est.n_estimated,
           abs(est.n_estimated - act.n_actual) * 1000
               // greatest(act.n_actual, 1) AS err_permille
    FROM est JOIN act ON act.v = est.v
    ORDER BY threshold_cents
    """


@register(
    "dq_selectivity_audit",
    _selectivity_oracle(),
    doc=f"optimizer-stats audit: {HIST_BUCKETS}-bucket equi-depth"
    " histogram range-selectivity estimates (with in-bucket linear"
    " interpolation) vs true counts for three price thresholds",
)
def dq_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would the planner's histogram get this predicate right? Build
    the 10-bucket equi-depth histogram on order price (integer cents,
    ntile with a deterministic tie-break), estimate ``price >= V`` the
    way Postgres/Catalyst do — full buckets above V plus linear
    interpolation inside the straddled bucket, all integer floor
    arithmetic — and report the permille error against the exact
    count. Large errors concentrate where the distribution is locally
    non-uniform inside a bucket; that is the signal to raise the
    bucket count for that column's stats."""
    p = load_table(spark, sf_dir, "orders").selectExpr(
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents", "o_orderkey"
    )
    tiled = p.selectExpr(
        "cents",
        f"ntile({HIST_BUCKETS}) OVER (ORDER BY cents, o_orderkey)"
        " AS bucket",
    )
    hist = tiled.groupBy("bucket").agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count("*").alias("n"),
    )
    vs = F.explode(
        F.array(*[F.lit(v) for v in _SEL_THRESHOLDS])
    ).alias("v")
    est = (
        hist.select("lo", "hi", "n", vs)
        .selectExpr(
            "v",
            "CASE WHEN lo >= v THEN n"
            " WHEN hi < v THEN CAST(0 AS BIGINT)"
            " ELSE n * (hi - v) div greatest(hi - lo, 1) END AS part",
        )
        .groupBy("v")
        .agg(F.sum("part").cast("bigint").alias("n_estimated"))
    )
    act = (
        p.select("cents", vs)
        .filter("cents >= v")
        .groupBy("v")
        .agg(F.count("*").cast("bigint").alias("n_actual"))
    )
    return (
        est.join(act, "v")
        .selectExpr(
            "CAST(v AS BIGINT) AS threshold_cents",
            "n_actual",
            "n_estimated",
            "abs(n_estimated - n_actual) * 1000"
            " div greatest(n_actual, 1) AS err_permille",
        )
        .orderBy("threshold_cents")
    )
