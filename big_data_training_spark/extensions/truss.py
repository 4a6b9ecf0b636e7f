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
arrays <= sqrt(2m) under the (degree, id) total order), except here
the common neighbors are exploded so each triangle can credit its
three edges. Per round: one degree aggregation, one collect_list, one
edge-level join + explode, one groupBy — all shuffles keyed on node or
edge ids, localCheckpoint between rounds to keep lineage O(1). The
oracle keeps the simple id-oriented wedge SQL (support counts are
orientation-invariant) with AS MATERIALIZED per round — the k-core
lesson: each round references the previous one on both join sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
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
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
    )


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


@register(
    "gr_ktruss_peel",
    _ktruss_oracle(),
    doc=f"k-truss peeling (k={TRUSS_K}): {TRUSS_ROUNDS} rounds of "
    f"'drop edges in < k-2 triangles' over the part co-order graph, "
    f"surviving-edge count per round; support via degree-oriented "
    f"adjacency intersection",
)
def gr_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each round recomputes per-edge triangle support in the surviving
    subgraph and keeps edges with support >= k-2. Support comes from
    the degree-oriented intersect (arrays bounded by sqrt(2m)), with
    the common neighbors exploded so each triangle credits its three
    edges — no wedge set is ever materialized."""
    edges = _part_edges(spark, sf_dir).localCheckpoint(eager=True)
    counts = [(0, edges)]
    cur = edges
    for i in range(TRUSS_ROUNDS):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keyed = (
            cur.join(
                deg.select(
                    F.col("node").alias("u"), F.col("deg").alias("du")
                ),
                "u",
            )
            .join(
                deg.select(
                    F.col("node").alias("v"), F.col("deg").alias("dv")
                ),
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
        nbrs = keyed.groupBy("src").agg(F.collect_list("dst").alias("ns"))
        tri = (
            keyed.join(
                nbrs.select(F.col("src").alias("ju"), F.col("ns").alias("ns_u")),
                keyed["src"] == F.col("ju"),
            )
            .join(
                nbrs.select(F.col("src").alias("jv"), F.col("ns").alias("ns_v")),
                keyed["dst"] == F.col("jv"),
            )
            .select(
                "src",
                "dst",
                F.explode(F.array_intersect("ns_u", "ns_v")).alias("w"),
            )
        )
        tri_edges = (
            tri.selectExpr("src AS x", "dst AS y")
            .unionAll(tri.selectExpr("src AS x", "w AS y"))
            .unionAll(tri.selectExpr("dst AS x", "w AS y"))
            .select(
                F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
            )
        )
        cur = (
            tri_edges.groupBy("u", "v")
            .agg(F.count("*").alias("s"))
            .filter(F.col("s") >= TRUSS_K - 2)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        counts.append((i + 1, cur))
    out = None
    for rnd, df in counts:
        row = df.agg(
            F.count("*").cast("bigint").alias("n_edges")
        ).select(
            F.lit(rnd).cast("bigint").alias("round"), "n_edges"
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("round")
