"""Graph analytics over relational entities: iterative PageRank.

The reference's iterative-computation story (flink/README.md iterative
dataflow) usually forfeits the SQL oracle — here the iteration count is
fixed and the arithmetic is all-integer (scaled ranks, floor division),
so every intermediate is bit-exact and the DuckDB oracle replays the
same three iterations as chained CTEs. Connected components (the other
iterative op) live in extensions/components.py with the dedup suite.

Graph: supplier → customer edges derived from fulfilled line items
(distinct (l_suppkey, o_custkey) via the order key). Scale notes: each
iteration is one join (ranks × edges, shuffle on src) plus one
aggregation (shuffle on dst) — the textbook Pregel round as two
exchanges. Ranks and degrees are cached across iterations; at 100 TB
you'd pre-partition edges by src and co-partition ranks to make the
join exchange-free, and checkpoint every few rounds to truncate
lineage (as components.py does)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register
from big_data_training_spark.streaming.replay import materialize

SCALE = 1_000_000_000_000  # rank fixed-point: 1.0 == 10^12
N_ITER = 3
TOP_N = 20

_SQL_EDGES = """
        SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""

# One PageRank round in exact integer arithmetic:
#   contribution(u) = (85 * (rank(u) // outdeg(u))) // 100
#   rank'(v) = 0.15*SCALE + sum over in-neighbors
_SQL_ITER = """
    , r{next} AS (
        SELECT n.node,
               {base} + coalesce(s.contrib, 0) AS rank
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node,
                   sum((85 * (r.rank // d.outdeg)) // 100) AS contrib
            FROM r{cur} r
            JOIN edges e ON e.src = r.node
            JOIN outdeg d ON d.node = r.node
            GROUP BY e.dst
        ) s ON s.node = n.node
    )
"""


def _pagerank_oracle() -> str:
    base = (15 * SCALE) // 100
    iters = "".join(
        _SQL_ITER.format(cur=i, next=i + 1, base=base) for i in range(N_ITER)
    )
    return f"""
    WITH edges AS ({_SQL_EDGES}
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), outdeg AS (
        SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1
    ), r0 AS (
        SELECT node, CAST({SCALE} AS BIGINT) AS rank FROM nodes
    ){iters}
    SELECT node, rank FROM r{N_ITER}
    ORDER BY rank DESC, node LIMIT {TOP_N}
    """


@register(
    "gr_pagerank_3iter",
    _pagerank_oracle(),
    doc="iterative PageRank, 3 rounds, integer-exact (oracle replays CTEs)",
    bench=True,
)
def gr_pagerank_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over supplier→customer edges. Ranks are
    scaled bigints and every operation is integer (floor division), so
    the result is deterministic across engines — the rare iterative
    algorithm with a value-exact oracle. Customer node ids are offset
    to keep the two key spaces disjoint."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    edges = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1_000_000).alias("dst"),
        )
        .distinct()
        .cache()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    base = (15 * SCALE) // 100
    ranks = nodes.select("node", F.lit(SCALE).cast("bigint").alias("rank"))
    for _ in range(N_ITER):
        contribs = (
            ranks.join(outdeg, "node")
            .withColumn(
                "per_edge", (F.lit(85) * F.expr("rank div outdeg")).cast("bigint")
            )
            .join(edges, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("per_edge div 100")).alias("contrib"))
        )
        # eager checkpoint per round: truncates the growing lineage and
        # materializes the cached edges/nodes exactly once (round 1).
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("contrib", F.lit(0)))
                .cast("bigint")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    out = materialize(ranks.orderBy(F.desc("rank"), F.asc("node")).limit(TOP_N))
    edges.unpersist()
    nodes.unpersist()
    return out
