"""HITS hubs-and-authorities over the supplier→customer graph.

Kleinberg's HITS (public algorithm, J.ACM 1999) complements PageRank on
a bipartite commerce graph: suppliers act as hubs (they point at many
customers), customers as authorities. Two full mutual-reinforcement
rounds — auth = Σ hub over in-edges, hub = Σ auth over out-edges, each
half-step max-normalized — in exact integer arithmetic (fixed point
1.0 == 10^6, floor division), so the DuckDB oracle replays the same
rounds as MATERIALIZED CTEs and hashes bit-for-bit (every round is
referenced twice; inlining would re-expand the chain exponentially —
see extensions/graph.py's PageRank oracle for the same lesson).

Fixed-point bound: scores stay ≤ 10^6 after each normalization, so a
raw sum is ≤ in-degree·10^6 and the normalizing product raw·10^6 is
≤ deg·10^18/10^6 — safe in BIGINT up to degree ~9·10^6. Beyond that
(whale keys at 100 TB) you normalize by a power-of-two shift instead;
the graph here is TPC-H-shaped (degrees bounded by order behavior).

Scale shape: identical to a Pregel round — one join shuffling on the
edge key + one aggregation per half-step, edge table reused across
rounds (pre-partition by src/dst on a cluster, as
gr_pagerank_copartitioned does); top-k served by TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.hints import broadcast_gate, table_count
from big_data_training_spark.lineage import truncate_lineage
from big_data_training_spark.registry import register

HITS_SCALE = 1_000_000  # fixed point: 1.0 == 10^6
HITS_ROUNDS = 2
HITS_TOP_N = 20

_SQL_EDGES = """
        SELECT DISTINCT l_suppkey AS src, o_custkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def _hits_oracle() -> str:
    parts = [
        f"edges AS MATERIALIZED ({_SQL_EDGES})",
        f"hub0 AS MATERIALIZED (SELECT DISTINCT src AS node, {HITS_SCALE} AS s"
        " FROM edges)",
    ]
    prev_hub = "hub0"
    for r in range(1, HITS_ROUNDS + 1):
        parts.append(
            f"""araw{r} AS MATERIALIZED (
        SELECT e.dst AS node, CAST(sum(h.s) AS BIGINT) AS s
        FROM edges e JOIN {prev_hub} h ON h.node = e.src GROUP BY e.dst
    )"""
        )
        parts.append(
            f"""auth{r} AS MATERIALIZED (
        SELECT node, (s * {HITS_SCALE}) // (SELECT max(s) FROM araw{r}) AS s
        FROM araw{r}
    )"""
        )
        parts.append(
            f"""hraw{r} AS MATERIALIZED (
        SELECT e.src AS node, CAST(sum(a.s) AS BIGINT) AS s
        FROM edges e JOIN auth{r} a ON a.node = e.dst GROUP BY e.src
    )"""
        )
        parts.append(
            f"""hub{r} AS MATERIALIZED (
        SELECT node, (s * {HITS_SCALE}) // (SELECT max(s) FROM hraw{r}) AS s
        FROM hraw{r}
    )"""
        )
        prev_hub = f"hub{r}"
    last = HITS_ROUNDS
    return f"""
    WITH {', '.join(parts)}
    SELECT * FROM (
        SELECT 'hub' AS kind, node, s AS score
        FROM hub{last} ORDER BY s DESC, node ASC LIMIT {HITS_TOP_N}
    )
    UNION ALL
    SELECT * FROM (
        SELECT 'authority' AS kind, node, s AS score
        FROM auth{last} ORDER BY s DESC, node ASC LIMIT {HITS_TOP_N}
    )
    """


def _normalize(scores: DataFrame) -> DataFrame:
    m = scores.agg(F.max("s").alias("m"))
    return scores.crossJoin(F.broadcast(m)).select(
        "node", F.expr(f"(s * {HITS_SCALE}) div m").alias("s")
    )


@register(
    "gr_hits",
    _hits_oracle(),
    doc=f"HITS hubs/authorities: {HITS_ROUNDS} integer-exact mutual-"
    f"reinforcement rounds, top-{HITS_TOP_N} per side",
    bench=True,
)
def gr_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two HITS rounds over distinct fulfilled (supplier, customer)
    edges: each half-step is one equi-join shuffling on the edge key
    plus one keyed sum, then a broadcast max-normalization — the same
    two-exchange Pregel shape as PageRank, so the co-partitioning story
    carries over unchanged. Output: top-20 hubs and authorities in
    fixed-point 10^6."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst"))
        .distinct()
    )
    edges = edges.transform(truncate_lineage)  # reused 2x per round: scan once
    # score tables are NODE-sized (suppliers/customers), orders of
    # magnitude below the edge table; broadcasting them makes every
    # half-step's join map-side, so the edge table never crosses the
    # network after its build. Size-gated on the dimension-table bound
    # (hints.broadcast_gate, parquet-metadata counts): past the budget
    # the half-steps shuffle on the edge key instead — the
    # gr_pagerank_copartitioned layout.
    bcast = broadcast_gate(
        table_count(spark, sf_dir, "supplier")
        + table_count(spark, sf_dir, "customer")
    )
    hub = edges.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(HITS_SCALE).cast("bigint").alias("s")
    )
    auth = None
    for _ in range(HITS_ROUNDS):
        araw = (
            edges.join(bcast(hub.withColumnRenamed("node", "src")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("s").alias("s"))
        )
        auth = _normalize(araw)
        hraw = (
            edges.join(bcast(auth.withColumnRenamed("node", "dst")), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("s").alias("s"))
        )
        hub = _normalize(hraw)
    top_h = (
        hub.orderBy(F.desc("s"), F.asc("node"))
        .limit(HITS_TOP_N)
        .select(F.lit("hub").alias("kind"), "node", F.col("s").alias("score"))
    )
    top_a = (
        auth.orderBy(F.desc("s"), F.asc("node"))
        .limit(HITS_TOP_N)
        .select(F.lit("authority").alias("kind"), "node", F.col("s").alias("score"))
    )
    return top_h.unionByName(top_a)


# ---------------------------------------------------------------------------
# Global clustering coefficient over the part co-order graph — completes
# the triangle-count story (gr_triangle_count is the numerator).
# ---------------------------------------------------------------------------

from big_data_training_spark.extensions.graph import (  # noqa: E402
    _SQL_COPART_EDGES,
    gr_triangle_count,
    part_coorder_edges,
)


@register(
    "gr_clustering_coefficient",
    f"""
    WITH e AS ({_SQL_COPART_EDGES}
    ),
    tri AS (
        SELECT count(*) AS n_triangles FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e
        ) GROUP BY 1
    ),
    wed AS (
        SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM deg
    )
    SELECT tri.n_triangles, wed.n_wedges,
           CAST((3000 * tri.n_triangles) // wed.n_wedges AS BIGINT)
               AS c_permille
    FROM tri, wed
    """,
    doc="global clustering coefficient: 3*triangles / wedges over the"
    " part co-order graph, exact integers (permille)",
    bench=True,
)
def gr_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity of the co-order graph: the wedge denominator is one
    degree aggregate (Σ d(d-1)/2 over distinct-neighbor degrees), the
    triangle numerator REUSES the certified adjacency-intersect plan
    (gr_triangle_count — degree-oriented, O(m^1.5) bound), and the
    coefficient is 3000·tri div wedges. Single-sourcing the numerator
    means this query can never disagree with the standalone count; at
    100 TB the added cost over counting triangles is one keyed degree
    aggregate."""
    tri = gr_triangle_count(spark, sf_dir)
    und = part_coorder_edges(spark, sf_dir)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    wed = deg.agg(
        F.sum(F.expr("(d * (d - 1)) div 2")).cast("bigint").alias("n_wedges")
    )
    return (
        tri.crossJoin(F.broadcast(wed))
        .select(
            "n_triangles",
            "n_wedges",
            F.expr("(3000 * n_triangles) div n_wedges")
            .cast("bigint")
            .alias("c_permille"),
        )
    )
