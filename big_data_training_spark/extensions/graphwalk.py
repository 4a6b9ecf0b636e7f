"""Deterministic random-walk sampling over the co-order graph — the
walk-corpus generator for DeepWalk/node2vec-style graph-embedding
training.

Embedding pipelines don't train on edges; they train on WALKS — short
vertex sequences whose skip-gram pairs feed the same training loop as
text (the LLM-pipeline tie-in: this operator emits sequence training
data exactly like the tokenizer ops emit token streams). The sampler
here is the hash-argmin walker: at step i from node v the walk moves
to argmin_{w in N(v)} h(seed, i, w) — a reproducible stand-in for the
uniform choice (h is the portable 60-bit hash both engines share), so
the emitted corpus is bit-identical across engines and across reruns,
which is what makes walk corpora cacheable and diffable in a real
pipeline. Swapping h for a salted RNG recovers true uniformity without
touching the dataflow.

Scale: each step is ONE shuffle — join the frontier on its current
node against the edge table, then a per-(walk, step) argmin hash
aggregate (min(struct(h, w)) — no window, no skew beyond node degree,
and the frontier never grows: |walks| rows throughout). W walks x L
steps = L keyed joins, the same per-round shape as PageRank. The
oracle unrolls the L steps as MATERIALIZED CTEs (each step references
the previous frontier once and the edge list once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.lineage import truncate_lineage
from big_data_training_spark.registry import register

WALK_STEPS = 3
WALK_SEED_MOD = 37  # seeds: suppliers with suppkey % 37 == 0 (bounded fan)

# undirected supplier<->customer co-order edges, both orientations,
# customer ids offset into a disjoint space (same graph as graphalgo).
_SQL_UE = """
    ed AS (
        SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    ue AS (SELECT src, dst FROM ed
           UNION ALL SELECT dst AS src, src AS dst FROM ed)
"""


def _step_sql(i: int) -> str:
    h = sql_hash60(f"w{i}.walk_id || '#' || {i} || '#' || ue.dst")
    return f"""w{i + 1} AS MATERIALIZED (
        SELECT walk_id, node FROM (
            SELECT w{i}.walk_id AS walk_id, ue.dst AS node,
                   row_number() OVER (
                       PARTITION BY w{i}.walk_id
                       ORDER BY {h}, ue.dst
                   ) AS rn
            FROM w{i} JOIN ue ON ue.src = w{i}.node
        ) WHERE rn = 1
    )"""


def _walks_oracle() -> str:
    ctes = [
        _SQL_UE,
        f"""w0 AS MATERIALIZED (
        SELECT s_suppkey AS walk_id, s_suppkey AS node FROM supplier
        WHERE s_suppkey % {WALK_SEED_MOD} = 0
    )""",
    ]
    ctes += [_step_sql(i) for i in range(WALK_STEPS)]
    legs = "\nUNION ALL\n".join(
        f"SELECT walk_id, CAST({i} AS BIGINT) AS step, node FROM w{i}"
        for i in range(WALK_STEPS + 1)
    )
    return f"""
    WITH {','.join(ctes)}
    SELECT walk_id, step, CAST(node AS BIGINT) AS node
    FROM ({legs})
    ORDER BY walk_id, step
    """


@register(
    "gr_deterministic_walks",
    _walks_oracle(),
    doc=f"DeepWalk-style walk corpus: {WALK_STEPS}-step hash-argmin "
    f"walks from a hash-chosen supplier seed set over the co-order "
    f"graph — reproducible sequence training data, one keyed join "
    f"per step",
    bench=True,
)
def gr_deterministic_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier-join walker: step i joins the |walks|-row frontier on
    its current node, picks the next hop by min(struct(hash, node))
    (the engine-portable 'uniform' choice, deterministic tie-break),
    and appends the hop to the corpus. The frontier row count is
    constant, the per-step shuffle is keyed on node id, and dead ends
    simply stop extending — the same dataflow runs W=10^9 walks when
    the seed set is every node."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    ed = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    ue = ed.union(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(truncate_lineage)

    frontier = supplier.filter(
        F.expr(f"s_suppkey % {WALK_SEED_MOD} = 0")
    ).selectExpr("s_suppkey AS walk_id", "s_suppkey AS node")
    legs = [
        frontier.selectExpr(
            "walk_id", "CAST(0 AS BIGINT) AS step", "CAST(node AS BIGINT) AS node"
        )
    ]
    for i in range(WALK_STEPS):
        h = hash60_expr(f"walk_id || '#' || {i} || '#' || dst")
        frontier = (
            frontier.join(ue, frontier["node"] == ue["src"])
            .selectExpr("walk_id", "dst", f"{h} AS h")
            .groupBy("walk_id")
            .agg(F.min(F.struct("h", "dst")).alias("m"))
            .selectExpr("walk_id", "m.dst AS node")
        )
        legs.append(
            frontier.selectExpr(
                "walk_id",
                f"CAST({i + 1} AS BIGINT) AS step",
                "CAST(node AS BIGINT) AS node",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.orderBy("walk_id", "step")
