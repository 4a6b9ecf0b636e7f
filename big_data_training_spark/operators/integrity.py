"""Referential-integrity and key-uniqueness audits — the pre-flight
checks a warehouse runs before promoting a snapshot (S9 store stage).

Both audits are single-pass/single-join aggregate reports: orphan
foreign keys via left-anti joins (never materializing matches), and
duplicate-key classes via one groupBy. Integer outputs, trivially
oracle-exact. At 100 TB each FK check is one shuffle on the key (or
zero, with bucketed layouts co-partitioned on the join key — see
tests/test_scale_strategies.py's bucketed-join proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register


@register(
    "dq_referential_integrity",
    """
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier.s_nationkey -> nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
    """,
    doc="FK orphan audit across the star schema: anti-join counts per"
    " declared foreign key",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan counts for every declared FK edge. Each check is one
    left-anti join (the dimension side broadcasts when small); a
    non-zero orphan count fails the promotion gate. The report unions
    four constant-size aggregate rows — cost is the fact-table scans,
    shared nothing."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    def check(name: str, fact: DataFrame, fk: str, dim: DataFrame, pk: str):
        orphans = fact.join(
            dim.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
        )
        return (
            fact.agg(F.count("*").alias("n_rows"))
            .crossJoin(F.broadcast(orphans.agg(F.count("*").alias("n_orphans"))))
            .select(F.lit(name).alias("fk"), "n_rows", "n_orphans")
        )

    return (
        check("lineitem.l_orderkey -> orders", li, "l_orderkey", orders, "o_orderkey")
        .unionByName(
            check("orders.o_custkey -> customer", orders, "o_custkey", customer, "c_custkey")
        )
        .unionByName(
            check("customer.c_nationkey -> nation", customer, "c_nationkey", nation, "n_nationkey")
        )
        .unionByName(
            check("supplier.s_nationkey -> nation", supplier, "s_nationkey", nation, "n_nationkey")
        )
    )


@register(
    "dq_duplicate_key_audit",
    """
    SELECT 'orders.o_orderkey' AS key,
           CAST(count(*) AS BIGINT) AS n_dup_classes,
           CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS n_excess_rows
    FROM (SELECT o_orderkey, count(*) AS n FROM orders
          GROUP BY 1 HAVING count(*) > 1)
    UNION ALL
    SELECT 'lineitem.(l_orderkey,l_linenumber)',
           CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT l_orderkey, l_linenumber, count(*) AS n FROM lineitem
          GROUP BY 1, 2 HAVING count(*) > 1)
    UNION ALL
    SELECT 'events.event_id',
           CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT event_id, count(*) AS n FROM events
          GROUP BY 1 HAVING count(*) > 1)
    """,
    doc="primary/composite key uniqueness audit: duplicate classes and"
    " excess rows per declared key",
)
def dq_duplicate_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness audit for declared keys: one groupBy per key, report
    how many key values repeat and how many surplus rows they carry
    (what a MERGE would have to resolve). Zero rows above threshold =
    clean; the aggregation is the same partial/final hash-agg shape at
    any scale."""

    def audit(name: str, df: DataFrame, cols: list[str]):
        dupes = (
            df.groupBy(*cols)
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
        )
        return dupes.agg(
            F.count("*").cast("bigint").alias("n_dup_classes"),
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
            .cast("bigint")
            .alias("n_excess_rows"),
        ).select(F.lit(name).alias("key"), "n_dup_classes", "n_excess_rows")

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    return (
        audit("orders.o_orderkey", orders, ["o_orderkey"])
        .unionByName(
            audit(
                "lineitem.(l_orderkey,l_linenumber)",
                li,
                ["l_orderkey", "l_linenumber"],
            )
        )
        .unionByName(audit("events.event_id", events, ["event_id"]))
    )


# (determinant table.column -> dependent column) candidates: two that
# genuinely hold (key-determined) and three that plausibly-but-falsely
# look functional — the profiler must separate them by measurement.
FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),
    ("documents", "doc_id", "lang"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("events", "user_id", "event_type"),
)


def _fd_sql(table: str, det: str, dep: str) -> str:
    return f"""
    SELECT '{table}.{det} -> {dep}' AS fd,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_groups,
           CAST(max(nd) AS BIGINT) AS max_distinct_dependents,
           CAST(CASE WHEN max(nd) = 1 THEN 1 ELSE 0 END AS BIGINT) AS holds
    FROM (
        SELECT {det}, count(DISTINCT {dep}) AS nd
        FROM {table} GROUP BY 1
    )"""


@register(
    "dq_fd_discovery",
    " UNION ALL ".join(_fd_sql(t, a, b) for t, a, b in FD_CANDIDATES),
    doc="functional-dependency profiling: violation counts for candidate"
    " A -> B dependencies across the warehouse tables",
)
def dq_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The schema-profiling question behind every normalization and
    MERGE-key decision: does A functionally determine B? Each candidate
    costs one keyed count-distinct aggregate (map-side combined; the
    violation report is |determinant groups| rows collapsed to one);
    candidates on the same table share the scan under one job. Keys
    (o_orderkey, doc_id) must hold; behavioral pairs (user -> type,
    nation -> segment) must not — the report measures instead of
    assuming, which is the entire point of FD discovery."""
    out = None
    for table, det, dep in FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        grouped = (
            t.groupBy(det)
            .agg(F.countDistinct(dep).alias("nd"))
            .agg(
                F.lit(f"{table}.{det} -> {dep}").alias("fd"),
                F.count("*").alias("n_groups"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_groups"),
                F.max("nd").cast("bigint").alias("max_distinct_dependents"),
                F.when(F.max("nd") == 1, 1)
                .otherwise(0)
                .cast("bigint")
                .alias("holds"),
            )
        )
        out = grouped if out is None else out.unionByName(grouped)
    return out
