"""k-truss peeling over the part co-order graph — the cohesion layer
above triangle counting (gr_triangle_count), the global clustering
coefficient (hits.gr_clustering_coefficient) and k-core
(gr_kcore_ladder).

A k-truss is the maximal subgraph where every edge sits in >= k-2
triangles — the standard community-core definition that is strictly
stronger than k-core and the usual next question after "how many
triangles". Like the repo's other iterative graph ops the query runs a
FIXED number of peel rounds (value-exact at any SF by construction,
no fixpoint claim), reporting the surviving-edge count per round.

Scale design (Spark side): per-edge triangle support is computed by
degree-oriented adjacency intersection, not a wedge self-join — the
same O(m^1.5) orientation bound gr_triangle_count uses (out-neighbor
arrays <= sqrt(2m) under the (degree, id) total order), with the
common neighbors exploded so each triangle can credit its three
edges. Round 1 does this over the full graph (the unavoidable cost:
one intersect + one 3T-row map-side-combined groupBy); every later
round runs the same plan over the *survivor* subgraph, which at k=12
collapses ~40x after the first peel (1.196M -> 29k edges at sf0.1),
so rounds 2..R are sub-second. A frontier-delta variant that
materializes the triangle incidence once was measured SLOWER here
(persisting 3T x 5-col rows + carrying triangle keys through the
round-1 shuffle costs more than re-intersecting the collapsed
survivor graph) — recompute-on-survivors is the right plan when the
peel converges fast. Each round truncates lineage via the shared
``lineage.truncate_lineage`` helper — executor-local blocks on a
single node, reliable df.checkpoint() (replayable on executor loss)
when SPARK_GRAFT_RELIABLE_CHECKPOINT=1 is set for a cluster run; see
the query docstring for the measured trade. The oracle
keeps the simple id-oriented wedge SQL (support counts are
orientation-invariant) with AS MATERIALIZED per round — the k-core
lesson: each round references the previous one on both join sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.hints import broadcast_gate
from big_data_training_spark.lineage import truncate_lineage
from big_data_training_spark.registry import register

TRUSS_K = 12
TRUSS_ROUNDS = 4

_SQL_EDGES = """
    e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""


def _part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared single-shuffle build (groupBy orderkey + in-row pair
    # explosion) — see graph.part_coorder_edges for the measured trade
    from big_data_training_spark.extensions.graph import part_coorder_edges

    return part_coorder_edges(spark, sf_dir)


def _ktruss_oracle() -> str:
    ctes = [_SQL_EDGES]
    for i in range(TRUSS_ROUNDS):
        ctes.append(
            f"""e{i + 1} AS MATERIALIZED (
            WITH tri AS (
                SELECT x.u AS a, x.v AS b, y.v AS c
                FROM e{i} x JOIN e{i} y ON y.u = x.v
                JOIN e{i} z ON z.u = x.u AND z.v = y.v
            ),
            supp AS (
                SELECT u, v, count(*) AS s FROM (
                    SELECT a AS u, b AS v FROM tri
                    UNION ALL SELECT b AS u, c AS v FROM tri
                    UNION ALL SELECT a AS u, c AS v FROM tri
                ) GROUP BY 1, 2
            )
            SELECT u, v FROM supp WHERE s >= {TRUSS_K - 2}
        )"""
        )
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS round,"
        f" (SELECT count(*) FROM e{i}) AS n_edges"
        for i in range(TRUSS_ROUNDS + 1)
    )
    return f"WITH {','.join(ctes)}\nSELECT * FROM ({rows}) ORDER BY round"


# Above this many edges the adjacency-list table (one entry per edge,
# ~8 B each) outgrows what every executor should hold a copy of
# (~64 MB) and the support computation falls back to shuffle joins.
# Clusters with bigger executors can raise it.
BROADCAST_EDGE_LIMIT = int(
    os.environ.get("SPARK_GRAFT_TRUSS_BROADCAST_EDGES", str(8_000_000))
)


def _edge_support(cur: DataFrame, n_edges: int | None = None) -> DataFrame:
    """(u, v, s): per-edge triangle support within the graph ``cur``.

    Degree-oriented adjacency intersection (gr_triangle_count's
    orientation: out-neighbor arrays <= sqrt(2m)) finds each triangle
    exactly once; exploding the common neighbors credits all three
    member edges, and the groupBy partial-aggregates map-side.

    When the graph is small enough (``n_edges`` <= BROADCAST_EDGE_LIMIT;
    the degree table is node-count-sized and the adjacency lists total
    one entry per edge), both lookup sides are BROADCAST so the edge
    table never crosses the network for the joins — Catalyst cannot
    infer this itself because aggregate outputs carry no size estimate.
    Measured at sf0.1 (1.2M edges): round-1 support 10.2s -> 3.0s, and
    the peel's shuffle volume drops ~400 MB -> ~30 MB. Above the limit
    (cluster-scale graphs) everything shuffles on node keys as before.
    """
    bcast = broadcast_gate(n_edges, limit=BROADCAST_EDGE_LIMIT)
    deg = (
        cur.select(F.col("u").alias("node"))
        .unionAll(cur.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    keyed = (
        cur.join(
            bcast(deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))),
            "u",
        )
        .join(
            bcast(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))),
            "v",
        )
        # orient low (degree, id) -> high: out-fan-out <= sqrt(2m)
        .selectExpr(
            "CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v"
            " END AS src",
            "CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u"
            " END AS dst",
        )
    )
    if n_edges is not None and n_edges > 200_000:
        # keyed is scanned twice (adjacency build + probe side); on the
        # full graph that repeats two broadcast joins over m rows —
        # materializing it once measured 2.8s -> 2.3s at sf0.1. Tiny
        # survivor rounds skip the extra job.
        keyed = truncate_lineage(keyed)
    nbrs = keyed.groupBy("src").agg(F.collect_list("dst").alias("ns"))
    tri = (
        keyed.join(
            bcast(nbrs.select(F.col("src").alias("ju"), F.col("ns").alias("ns_u"))),
            keyed["src"] == F.col("ju"),
        )
        .join(
            bcast(nbrs.select(F.col("src").alias("jv"), F.col("ns").alias("ns_v"))),
            keyed["dst"] == F.col("jv"),
        )
        .select(
            "src",
            "dst",
            F.explode(F.array_intersect("ns_u", "ns_v")).alias("w"),
        )
    )
    # one generator pass credits all three member edges per triangle —
    # a 3-way unionAll of tri would re-derive the (join + intersect +
    # explode) subtree per branch on a cold plan (measured 4.9s vs
    # 3.0s first-iteration at sf0.1; steady-state equal)
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("x"), F.col("dst").alias("y")),
                F.struct(F.col("src").alias("x"), F.col("w").alias("y")),
                F.struct(F.col("dst").alias("x"), F.col("w").alias("y")),
            )
        ).alias("p")
    ).select(
        F.least("p.x", "p.y").alias("u"), F.greatest("p.x", "p.y").alias("v")
    )
    return tri_edges.groupBy("u", "v").agg(F.count("*").alias("s"))


@register(
    "gr_ktruss_peel",
    _ktruss_oracle(),
    bench=True,
    doc=f"k-truss peeling (k={TRUSS_K}): {TRUSS_ROUNDS} rounds of "
    f"'drop edges in < k-2 triangles' over the part co-order graph, "
    f"surviving-edge count per round; support via degree-oriented "
    f"adjacency intersection over the (fast-collapsing) survivor graph",
)
def gr_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each round recomputes per-edge triangle support in the surviving
    subgraph and keeps edges with support >= k-2. Round 1 pays the
    full-graph cost; the survivor graph then collapses ~40x, so later
    rounds re-intersect a tiny subgraph — measured faster than a
    materialize-incidence-once frontier-delta peel (see module doc).

    Each round truncates lineage via ``truncate_lineage`` (round R's
    tree otherwise embeds ~7 copies of round R-1's — exponential
    plan-matching cost; .persist() alone, eager or lazy, was measured
    to hang the planner >300s). Locally that is ``localCheckpoint``
    (~12.6s at sf0.1); with SPARK_GRAFT_RELIABLE_CHECKPOINT=1 it is a
    reliable ``df.checkpoint`` (~14.5s — the one non-tiny write is the
    1.2M-edge base; later rounds write the collapsed 29k-row survivor
    set) so a lost executor replays from storage instead of failing
    the job. A persist-the-base hybrid measured WORSE (~26s: cache
    lookup over the nested plan re-plans poorly under AQE)."""
    edges = truncate_lineage(_part_edges(spark, sf_dir))
    ns = [edges.count()]
    cur = edges
    for i in range(TRUSS_ROUNDS):
        if len(ns) >= 2 and ns[-1] == ns[-2]:
            # fixpoint: peeling only REMOVES edges, so an unchanged
            # count after a peel means an unchanged edge SET — every
            # remaining round is the identity (saves ~0.9s/round of
            # pure stage overhead at sf0.1, where k=12 converges after
            # round 3 of 4).
            ns.append(ns[-1])
            continue
        nxt = (
            _edge_support(cur, n_edges=ns[-1])
            .filter(F.col("s") >= TRUSS_K - 2)
            .select("u", "v")
        )
        if ns[-1] <= BROADCAST_EDGE_LIMIT:
            # survivor graphs are tiny after the first peel (29k edges
            # at sf0.1): collapse to a handful of partitions so later
            # rounds don't pay 30+ near-empty tasks per stage
            nxt = nxt.coalesce(4)
        if i < TRUSS_ROUNDS - 1:
            # the survivor set feeds the NEXT round's support (3+
            # scans: degrees, orientation, adjacency) — truncate so
            # those scans hit materialized blocks, and the count below
            # rides the same blocks
            cur = truncate_lineage(nxt)
        else:
            # the last round is only ever counted once: a checkpoint
            # would just add a materialization job
            cur = nxt
        ns.append(cur.count())
    # the per-round survivor counts ARE the result and were already
    # computed by the distributed count jobs that gate each round's
    # broadcast-vs-shuffle plan — re-aggregating the checkpointed
    # frames would re-run one job per round for values the driver
    # holds. 5 literal rows, exactly the oracle's shape.
    return spark.createDataFrame(
        [(i, int(n)) for i, n in enumerate(ns)],
        schema="round bigint, n_edges bigint",
    ).orderBy("round")
