"""Graph link prediction: common-neighbors / resource-allocation /
neighbor-Jaccard scores over the supplier-customer bipartite graph.

The reference's graph story (flink/README.md iterative dataflow) covers
propagation (PageRank, components); link prediction is the other
workhorse graph primitive an LLM-data platform needs — "which two
sources behave like duplicates of each other", "which supplier pair is
an aliased entity" — and it is structurally the inverted-index
self-join already certified for n-gram dedup (extensions/dedup.py),
re-keyed on graph neighborhoods instead of shingles.

Scale design (100 TB): candidate pairs are generated per shared
neighbor — a self-equi-join on the neighbor key, never all-pairs. The
quadratic hazard is a hot neighbor (a customer served by k suppliers
emits k² pairs), exactly the hot-shingle hazard in dd_ngram_jaccard
— so the same guard applies: neighbors with degree > DEG_CAP are
dropped from pair generation BEFORE the self-join (standard practice:
a hub shared by everyone carries no signal, and its resource-allocation
weight 1/deg is ~0 anyway). All three scores are computed on the capped
graph, integer-exact: RA in micro-units via floor division (Spark
``div`` == DuckDB ``//``, property-tested in tests/test_properties.py),
Jaccard in permille. The final top-20 is TakeOrderedAndProject —
per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.hints import broadcast_gate, table_count
from big_data_training_spark.registry import register

# Hot-neighbor guard: customers with more distinct suppliers than this
# are excluded from pair generation (no-op at sf0.01 where max degree is
# 67; trims the k² head at sf0.1+ where degrees reach 102).
DEG_CAP = 80
RA_MICRO = 1_000_000  # resource-allocation fixed point: 1.0 == 10^6
TOP_N = 20

_SQL = f"""
    WITH e0 AS (
        SELECT DISTINCT l_suppkey AS s, o_custkey AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    cdeg AS (
        SELECT c, count(*) AS d FROM e0 GROUP BY 1
    ),
    e AS (
        SELECT e0.s, e0.c, cdeg.d
        FROM e0 JOIN cdeg ON e0.c = cdeg.c
        WHERE cdeg.d <= {DEG_CAP}
    ),
    sdeg AS (
        SELECT s, count(*) AS ds FROM e GROUP BY 1
    ),
    pairs AS (
        SELECT a.s AS s1, b.s AS s2,
               count(*) AS common_neighbors,
               CAST(sum({RA_MICRO} // a.d) AS BIGINT) AS ra_score_micro
        FROM e a JOIN e b ON a.c = b.c AND a.s < b.s
        GROUP BY 1, 2
    )
    SELECT p.s1, p.s2, p.common_neighbors, p.ra_score_micro,
           (1000 * p.common_neighbors)
               // (d1.ds + d2.ds - p.common_neighbors) AS jaccard_permille
    FROM pairs p
    JOIN sdeg d1 ON d1.s = p.s1
    JOIN sdeg d2 ON d2.s = p.s2
    ORDER BY p.common_neighbors DESC, p.ra_score_micro DESC, p.s1, p.s2
    LIMIT {TOP_N}
"""


@register(
    "gr_linkpred_scores",
    _SQL,
    doc="top-20 predicted supplier links: common-neighbor count,"
    " resource-allocation score (micro), neighbor-Jaccard (permille)"
    " over the degree-capped bipartite graph",
    bench=True,
)
def gr_linkpred_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which supplier pairs share the most customers? Candidates come
    from a self-equi-join on the customer key (one shuffle on c), with
    hubs above DEG_CAP dropped first so no bucket exceeds DEG_CAP² pairs
    — the skew guard that keeps this linear-ish at 100 TB. Scores:
    common-neighbor count; resource-allocation Σ 1/deg(z) in integer
    micro-units (hot shared neighbors count for less); neighbor-set
    Jaccard in permille. Top-20 via TakeOrderedAndProject."""
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    cdeg = e0.groupBy("c").agg(F.count("*").alias("d")).filter(F.col("d") <= DEG_CAP)
    e = e0.join(cdeg, "c")
    sdeg = e.groupBy("s").agg(F.count("*").alias("ds"))

    a = e.select(F.col("c"), F.col("s").alias("s1"), F.col("d"))
    b = e.select(F.col("c"), F.col("s").alias("s2"))
    pairs = (
        a.join(b, ["c"])
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.expr(f"sum({RA_MICRO} div d)").cast("long").alias("ra_score_micro"),
        )
    )
    # sdeg is supplier-sized (orders of magnitude below the pair table);
    # broadcasting both lookups keeps the pair table from re-shuffling
    # on s1 and then s2 just to pick up two degree columns. Size-gated
    # on the supplier-table bound (sdeg keys ⊆ supplier keys;
    # parquet-metadata count) — past the budget the plan falls back to
    # the two shuffle joins.
    bcast = broadcast_gate(table_count(spark, sf_dir, "supplier"))
    scored = (
        pairs.join(
            bcast(sdeg.select(F.col("s").alias("s1"), F.col("ds").alias("ds1"))),
            "s1",
        )
        .join(
            bcast(sdeg.select(F.col("s").alias("s2"), F.col("ds").alias("ds2"))),
            "s2",
        )
        .select(
            "s1",
            "s2",
            "common_neighbors",
            "ra_score_micro",
            F.expr(
                "(1000 * common_neighbors) div (ds1 + ds2 - common_neighbors)"
            ).alias("jaccard_permille"),
        )
    )
    return scored.orderBy(
        F.desc("common_neighbors"), F.desc("ra_score_micro"), "s1", "s2"
    ).limit(TOP_N)
