"""Iterative graph algorithms beyond PageRank/components: k-core
decomposition and multi-source BFS, both integer-exact with unrolled-CTE
oracles.

The reference's iterative-dataflow story (flink/README.md iteration
operators) is the semantic target; the Spark-first form is a bounded
number of join+aggregate rounds with per-round lineage truncation
(lineage.truncate_lineage: localCheckpoint locally, reliable
checkpoint under SPARK_GRAFT_RELIABLE_CHECKPOINT=1) to keep
lineage O(1), exactly like extensions/graph.py. Both queries run a FIXED
round count R mirrored by the oracle's unrolled CTEs; the Spark side
breaks out early once a round is a no-op (provably identical to running
the remaining no-op rounds) and raises — never returns silently-wrong
labels — if the fixed horizon was not enough.

Graph: the supplier→customer co-order graph symmetrized to undirected
(both directions materialized), the same edge derivation as
extensions/graph.py so the family shares one scale story: each peel /
frontier round is one self-equi-join on node plus one aggregation —
shuffle volume bounded by the live edge set, which only shrinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.hints import broadcast_gate, table_count
from big_data_training_spark.lineage import truncate_lineage
from big_data_training_spark.registry import register
from big_data_training_spark.streaming.replay import materialize


def _node_bound(spark: SparkSession, sf_dir: str) -> int:
    """Upper bound on graph nodes (suppliers + offset customers) from
    cached parquet-metadata dimension counts — the gate input for
    broadcasting node-sized per-round lookups (frontiers, live sets,
    rank vectors), which Catalyst cannot size itself."""
    return table_count(spark, sf_dir, "supplier") + table_count(
        spark, sf_dir, "customer"
    )

# Undirected co-order graph: both orientations of every distinct
# supplier→customer edge (customer ids offset into a disjoint space).
_SQL_UEDGES = """
    ed AS (
        SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    ue AS (SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed)
"""

KCORE_KS = (4, 8, 16, 32)
KCORE_ROUNDS = 6  # fixpoint measured at 2 rounds on sf0.01/sf0.1; 3x headroom


def _undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ed = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    return ed.union(ed.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _kcore_oracle() -> str:
    """Per k: R unrolled peel rounds (keep nodes whose degree within the
    surviving subgraph is >= k), then count core nodes and undirected
    core edges. Extra rounds past the fixpoint are no-ops, so a fixed R
    with headroom is value-exact."""
    per_k = []
    for k in KCORE_KS:
        # AS MATERIALIZED is load-bearing: each round references the
        # previous one twice (both join sides), so an inlining planner
        # re-expands the whole chain 2^R times (measured: 192s -> <1s
        # at sf0.01 with materialization forced).
        ctes = [
            f"a{k}_0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM ue)",
        ]
        for i in range(KCORE_ROUNDS):
            ctes.append(
                f"""a{k}_{i + 1} AS MATERIALIZED (
                SELECT ue.src AS node FROM ue
                JOIN a{k}_{i} sa ON ue.src = sa.node
                JOIN a{k}_{i} sb ON ue.dst = sb.node
                GROUP BY 1 HAVING count(*) >= {k}
            )"""
            )
        last = f"a{k}_{KCORE_ROUNDS}"
        per_k.append(
            (
                ",\n".join(ctes),
                f"""
            SELECT CAST({k} AS BIGINT) AS k,
                   (SELECT count(*) FROM {last}) AS n_core_nodes,
                   (SELECT count(*) // 2 FROM ue
                    JOIN {last} sa ON ue.src = sa.node
                    JOIN {last} sb ON ue.dst = sb.node) AS n_core_edges
            """,
            )
        )
    all_ctes = ",\n".join(c for c, _ in per_k)
    selects = "\nUNION ALL\n".join(s for _, s in per_k)
    return f"WITH {_SQL_UEDGES},\n{all_ctes}\n{selects}"


@register(
    "gr_kcore_ladder",
    _kcore_oracle(),
    doc="k-core decomposition ladder: iterative peeling at k=4/8/16/32,"
    " surviving node and edge counts per k",
    bench=True,
)
def gr_kcore_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core: repeatedly delete nodes with degree < k until none
    remain — the standard dense-subgraph / spam-cluster detector. One
    peel round = one equi-join of the live edge set against the live
    node set (both sides shrink monotonically) plus a degree
    aggregation; per-round truncate_lineage cuts the plan so the
    plan stays O(1) in rounds. Early-exit once a round removes nothing
    (identical to the oracle's remaining no-op rounds); raises if the
    fixed horizon is ever insufficient rather than emitting a wrong
    ladder. At 100 TB each round's shuffle is bounded by the live edge
    count, which only decreases — the first round dominates.

    All k values peel SIMULTANEOUSLY: the live set is keyed by (k,
    node) and every round is one composite-key join over the k-
    replicated edge list, so the whole ladder costs one loop of ~3
    rounds (one checkpoint + one count each) instead of 4 independent
    loops — measured 8.2s → ~3s at sf0.1, and at cluster scale the
    rounds for every k share the same shuffle."""
    ue = _undirected_edges(spark, sf_dir)
    ks = spark.createDataFrame([(k,) for k in KCORE_KS], "k bigint")
    edges_k = ue.crossJoin(F.broadcast(ks)).transform(truncate_lineage)
    alive = (
        edges_k.select("k", F.col("src").alias("node"))
        .distinct()
        .transform(truncate_lineage)
    )
    # the live set is (k, node)-keyed — at most |KCORE_KS| x nodes rows;
    # broadcasting it (size-gated) keeps the k-replicated edge table
    # from shuffling on BOTH composite keys every round (the truss
    # support-kernel pattern: Catalyst cannot size the distinct output)
    bcast = broadcast_gate(len(KCORE_KS) * _node_bound(spark, sf_dir))
    prev_n = -1
    n = alive.count()
    rounds = 0
    while n != prev_n:
        if rounds >= KCORE_ROUNDS:
            raise RuntimeError(
                f"k-core did not converge in {KCORE_ROUNDS} rounds"
            )
        prev_n = n
        sa = alive.select("k", F.col("node").alias("src"))
        sb = alive.select("k", F.col("node").alias("dst"))
        alive = (
            edges_k.join(bcast(sa), ["k", "src"])
            .join(bcast(sb), ["k", "dst"])
            .groupBy("k", F.col("src").alias("node"))
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= F.col("k"))
            .select("k", "node")
            .transform(truncate_lineage)
        )
        n = alive.count()
        rounds += 1
    sa = alive.select("k", F.col("node").alias("src"))
    sb = alive.select("k", F.col("node").alias("dst"))
    cores = (
        edges_k.join(bcast(sa), ["k", "src"])
        .join(bcast(sb), ["k", "dst"])
        .groupBy("k")
        .agg(F.expr("count(*) div 2").alias("n_core_edges"))
    )
    nodes_per_k = alive.groupBy("k").agg(F.count("*").alias("n_core_nodes"))
    # left joins from the k list: a fully-peeled (empty) core must still
    # report a (k, 0, 0) row, exactly as the oracle's scalar counts do
    return (
        ks.join(nodes_per_k, "k", "left")
        .join(cores, "k", "left")
        .select(
            "k",
            F.coalesce("n_core_nodes", F.lit(0)).cast("bigint").alias("n_core_nodes"),
            F.coalesce("n_core_edges", F.lit(0)).cast("bigint").alias("n_core_edges"),
        )
    )


BFS_ROUNDS = 4
BFS_SEEDS = 5  # the 5 lowest supplier node ids — deterministic seed set


def _bfs_oracle() -> str:
    ctes = [
        f"""seeds AS (
            SELECT DISTINCT src AS node FROM ed ORDER BY node LIMIT {BFS_SEEDS}
        )""",
        "v0 AS MATERIALIZED (SELECT node FROM seeds)",
    ]
    selects = ["SELECT CAST(0 AS BIGINT) AS layer, (SELECT count(*) FROM v0) AS n_new"]
    for i in range(BFS_ROUNDS):
        ctes.append(
            f"""v{i + 1} AS MATERIALIZED (
            SELECT node FROM v{i}
            UNION
            SELECT ue.dst AS node FROM ue JOIN v{i} f ON ue.src = f.node
        )"""
        )
        selects.append(
            f"SELECT CAST({i + 1} AS BIGINT) AS layer,"
            f" (SELECT count(*) FROM v{i + 1}) - (SELECT count(*) FROM v{i})"
            " AS n_new"
        )
    return (
        f"WITH {_SQL_UEDGES},\n"
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


@register(
    "gr_bfs_layers",
    _bfs_oracle(),
    doc="multi-source BFS reach: nodes newly reached per hop from the"
    " 5 lowest supplier ids, 4 hops",
    bench=True,
)
def gr_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier BFS — the reachability primitive under impact analysis
    ('which customers are within h hops of these suppliers'). Visited
    set and frontier advance as DataFrames; each hop is one
    edges×frontier join + distinct, checkpointed so lineage is O(1).
    The layer counts are set cardinalities — orientation- and
    order-free, hence engine-exact. At scale the visited set is the
    memory bound; at 100 TB you'd swap the distinct for a Bloom-guarded
    anti-join once layers stop growing."""
    ue = _undirected_edges(spark, sf_dir).transform(truncate_lineage)
    seeds = (
        ue.select(F.col("src").alias("node"))
        .filter(F.col("node") < 1_000_000)
        .distinct()
        .orderBy("node")
        .limit(BFS_SEEDS)
    )
    visited = seeds.transform(truncate_lineage)
    total = visited.count()
    rows = [(0, total)]
    # the visited set is node-sized: broadcast it (size-gated) into the
    # edge join so the edge table never shuffles on src per hop
    bcast = broadcast_gate(_node_bound(spark, sf_dir))
    for layer in range(1, BFS_ROUNDS + 1):
        expanded = (
            visited.union(
                ue.join(
                    bcast(visited.select(F.col("node").alias("src"))), "src"
                ).select(F.col("dst").alias("node"))
            )
            .distinct()
            .transform(truncate_lineage)
        )
        new_total = expanded.count()
        rows.append((layer, new_total - total))
        total = new_total
        visited = expanded
    return spark.createDataFrame(rows, "layer bigint, n_new bigint")


PPR_ITER = 3
PPR_SCALE = 1_000_000_000_000  # fixed-point: 1.0 == 10^12 (matches graph.py)
PPR_TOP = 20


def _ppr_oracle() -> str:
    """Unrolled personalized-PageRank rounds: teleport mass returns only
    to the seed set. Integer floor arithmetic identical to graph.py's
    global PageRank oracle; ranks stay nonnegative, so DuckDB's
    truncating // equals Spark's div."""
    base = (15 * PPR_SCALE) // 100
    seed_case = (
        "CASE WHEN n.node IN (SELECT node FROM seeds) "
        f"THEN {base} ELSE 0 END"
    )
    rounds = []
    for i in range(PPR_ITER):
        rounds.append(
            f""", r{i + 1} AS MATERIALIZED (
            SELECT n.node,
                   CAST({seed_case} + coalesce(s.contrib, 0) AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(sum((85 * (r.rank // d.outdeg)) // 100)
                            AS BIGINT) AS contrib
                FROM r{i} r
                JOIN ue e ON e.src = r.node
                JOIN outdeg d ON d.node = r.node
                WHERE r.rank > 0
                GROUP BY e.dst
            ) s ON s.node = n.node
        )"""
        )
    return f"""
    WITH {_SQL_UEDGES},
    seeds AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM ed ORDER BY node LIMIT {BFS_SEEDS}
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM ue),
    outdeg AS MATERIALIZED (
        SELECT src AS node, count(*) AS outdeg FROM ue GROUP BY 1
    ),
    r0 AS (
        SELECT node,
               CAST(CASE WHEN node IN (SELECT node FROM seeds)
                         THEN {PPR_SCALE} ELSE 0 END AS BIGINT) AS rank
        FROM nodes
    ){"".join(rounds)}
    SELECT node, rank FROM r{PPR_ITER}
    ORDER BY rank DESC, node LIMIT {PPR_TOP}
    """


@register(
    "gr_personalized_pagerank",
    _ppr_oracle(),
    doc=f"personalized PageRank from the {BFS_SEEDS} lowest supplier ids,"
    f" {PPR_ITER} integer-exact rounds, top-{PPR_TOP}",
    bench=True,
)
def gr_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPR — 'importance relative to THESE seeds', the link-based
    recommendation / related-entities primitive. Same Pregel shape as
    the global PageRank (one join + one aggregation per round over the
    undirected graph) with teleport mass restricted to the seed set;
    sparsity is the scale win: rank mass is zero outside the seeds'
    3-hop ball, and the `rank > 0` pre-filter keeps each round's join
    input proportional to the reached frontier, not the graph."""
    ue = _undirected_edges(spark, sf_dir).transform(truncate_lineage)
    nodes = truncate_lineage(
        ue.select(F.col("src").alias("node")).distinct()
    )
    seeds = (
        ue.select(F.col("src").alias("node"))
        .filter(F.col("node") < 1_000_000)
        .distinct()
        .orderBy("node")
        .limit(BFS_SEEDS)
        .withColumn("is_seed", F.lit(True))
        .transform(truncate_lineage)
    )
    outdeg = ue.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    base = (15 * PPR_SCALE) // 100
    marked = nodes.join(seeds, "node", "left")
    ranks = marked.select(
        "node",
        F.when(F.col("is_seed"), F.lit(PPR_SCALE))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rank"),
    )
    # rank/outdeg/contrib vectors are all node-sized: broadcast them
    # (size-gated) so the edge table joins map-side and the only
    # per-round shuffle is the dst aggregation (the LP/HITS pattern)
    bcast = broadcast_gate(_node_bound(spark, sf_dir))
    for _ in range(PPR_ITER):
        scored = (
            ranks.filter(F.col("rank") > 0)
            .join(bcast(outdeg), "node")
            .withColumn(
                "per_edge",
                (F.lit(85) * F.expr("rank div outdeg")).cast("bigint"),
            )
        )
        contribs = (
            bcast(scored)
            .join(ue, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("per_edge div 100")).alias("contrib"))
        )
        ranks = marked.join(bcast(contribs), "node", "left").select(
            "node",
            (
                F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
                + F.coalesce("contrib", F.lit(0))
            )
            .cast("bigint")
            .alias("rank"),
        )
        # No per-round truncation (round-15): PPR_ITER is fixed and small
        # and each round references `ranks` exactly once, so the chained
        # plan grows LINEARLY — the gr_pagerank_3iter plain-mode lesson
        # (chained 3-round plan measured cheaper than three eager
        # materializations) applies unchanged; leaves stay the
        # checkpointed ue/nodes/seeds.
    return materialize(
        ranks.orderBy(F.desc("rank"), F.asc("node")).limit(PPR_TOP)
    )
