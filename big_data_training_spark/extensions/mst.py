"""Distributed minimum-spanning-forest: Borůvka rounds over the
weighted supplier-customer co-order graph.

Borůvka is THE shuffle-friendly MST algorithm: every round, each
component picks its minimum outgoing edge (a per-key argmin — one
shuffle), the picked edges join the forest, and components contract.
Component count at least halves per round, so 100 TB needs O(log V)
rounds of bounded-size shuffles — the same Pregel shape as the
repo's PageRank/k-core/CC operators.

Determinism: edge weights are exact cents and the edge ORDER is the
total order (w, u, v), so argmin choices, the forest, and every round
metric are unique — no float comparisons, no ties.

Contraction: each component's chosen edge defines a pointer
F(c) = other-endpoint component. The pointer graph is functional with
only 2-cycles (mutual minimum pairs — guaranteed by the total edge
order), so after collapsing 2-cycles to their min id, ``D_DOUBLE``
pointer-doubling joins contract chains of length up to 2^D_DOUBLE.
The test proves full contraction at fixture scale against a pure
union-find reimplementation; at larger diameters raise D_DOUBLE
(log-cost) exactly as the oracle does.

Oracle: the identical rounds unrolled as SQL CTEs. Iterative CTEs
referenced more than once are AS MATERIALIZED — DuckDB otherwise
inlines and re-expands them exponentially (the k-core lesson,
extensions/graphalgo.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.hints import broadcast_gate, table_count
from big_data_training_spark.lineage import truncate_lineage
from big_data_training_spark.registry import register

N_ROUNDS = 3
D_DOUBLE = 3  # pointer-doubling steps per round: contracts 2^3-hop chains

_SQL_WEDGES = """
    wedges AS (
        SELECT l_suppkey AS u, o_custkey + 1000000 AS v,
               CAST(min(floor(l_extendedprice * 100)) AS BIGINT) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    nodes AS (
        SELECT u AS node FROM wedges UNION SELECT v FROM wedges
    ),
    lab0 AS MATERIALIZED (SELECT node, node AS lbl FROM nodes)
"""


def _round_sql(r: int) -> str:
    """One Borůvka round: choose, pick forest edges, contract."""
    doubling = "".join(
        f"""
    p{r}_{d + 1} AS MATERIALIZED (
        SELECT a.c, coalesce(b.p, a.p) AS p
        FROM p{r}_{d} a LEFT JOIN p{r}_{d} b ON b.c = a.p
    ),"""
        for d in range(D_DOUBLE)
    )
    return f"""
    el{r} AS (
        SELECT lu.lbl AS cu, lv.lbl AS cv, e.w, e.u, e.v
        FROM wedges e
        JOIN lab{r} lu ON lu.node = e.u
        JOIN lab{r} lv ON lv.node = e.v
        WHERE lu.lbl <> lv.lbl
    ),
    dir{r} AS (
        SELECT cu AS c, cv AS o, w, u, v FROM el{r}
        UNION ALL
        SELECT cv AS c, cu AS o, w, u, v FROM el{r}
    ),
    ch{r} AS MATERIALIZED (
        SELECT c, o, w, u, v FROM (
            SELECT c, o, w, u, v,
                   row_number() OVER (PARTITION BY c ORDER BY w, u, v)
                       AS rn
            FROM dir{r}
        ) t WHERE rn = 1
    ),
    fe{r} AS MATERIALIZED (SELECT DISTINCT w, u, v FROM ch{r}),
    p{r}_0 AS MATERIALIZED (
        SELECT a.c,
               CASE WHEN b.o = a.c THEN least(a.c, a.o) ELSE a.o END AS p
        FROM ch{r} a JOIN ch{r} b ON b.c = a.o
    ),{doubling}
    lab{r + 1} AS MATERIALIZED (
        SELECT l.node, coalesce(p.p, l.lbl) AS lbl
        FROM lab{r} l LEFT JOIN p{r}_{D_DOUBLE} p ON p.c = l.lbl
    )
"""


def _boruvka_oracle() -> str:
    rounds = ",".join(_round_sql(r) for r in range(N_ROUNDS))
    metrics = "\nUNION ALL\n".join(
        f"""
    SELECT {r + 1} AS round,
           (SELECT CAST(count(DISTINCT lbl) AS BIGINT) FROM lab{r + 1})
               AS n_components,
           (SELECT CAST(count(*) AS BIGINT) FROM fe{r}) AS edges_added,
           (SELECT CAST(coalesce(sum(w), 0) AS BIGINT) FROM fe{r})
               AS weight_added_cents"""
        for r in range(N_ROUNDS)
    )
    return f"""
    WITH {_SQL_WEDGES},
    {rounds}
    SELECT * FROM ({metrics})
    ORDER BY round
    """


@register(
    "gr_boruvka_msf_rounds",
    _boruvka_oracle(),
    doc=f"minimum spanning forest: {N_ROUNDS} Borůvka rounds over the"
    f" weighted co-order graph — per round the component count, forest"
    f" edges added, and exact forest weight (cents)",
    bench=True,
)
def gr_boruvka_msf_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borůvka's MST, the distributed way: per round every component
    argmins its outgoing edges under the total order (w, u, v) — one
    keyed shuffle — the chosen edges enter the forest, and components
    contract by pointer-doubling over the choice graph (functional,
    2-cycles only, so D doubling joins contract 2^D-hop chains).
    Emits the audit a scheduler wants: components remaining, edges and
    exact weight added per round. Component count at least halves per
    round — the 100 TB cost is O(log V) bounded shuffles, with the
    edge list shrinking as components close (only inter-component
    edges survive the label join)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    wedges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_suppkey").alias("u"),
            (F.col("o_custkey") + 1_000_000).alias("v"),
        )
        .agg(
            F.expr("CAST(min(floor(l_extendedprice * 100)) AS BIGINT)")
            .alias("w")
        )
        .transform(truncate_lineage)
    )
    nodes = (
        wedges.select(F.col("u").alias("node"))
        .union(wedges.select(F.col("v").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("lbl"))
    # labels / choice-graph / pointer tables are all node-sized or
    # smaller (components only merge); broadcasting them (size-gated on
    # the dimension-count bound) keeps the weighted edge table from
    # shuffling on u and v every round — the LP/HITS/truss pattern.
    bcast = broadcast_gate(
        table_count(spark, sf_dir, "supplier")
        + table_count(spark, sf_dir, "customer")
    )
    per_round = []
    for r in range(N_ROUNDS):
        lu = labels.select(
            F.col("node").alias("u"), F.col("lbl").alias("cu")
        )
        lv = labels.select(
            F.col("node").alias("v"), F.col("lbl").alias("cv")
        )
        el = (
            wedges.join(bcast(lu), "u")
            .join(bcast(lv), "v")
            .filter(F.col("cu") != F.col("cv"))
        )
        dirr = el.select(
            F.col("cu").alias("c"), F.col("cv").alias("o"), "w", "u", "v"
        ).unionAll(
            el.select(
                F.col("cv").alias("c"), F.col("cu").alias("o"), "w", "u", "v"
            )
        )
        ch = (
            dirr.selectExpr(
                "c",
                "o",
                "w",
                "u",
                "v",
                "row_number() OVER (PARTITION BY c ORDER BY w, u, v) AS rn",
            )
            .filter("rn = 1")
            .drop("rn")
            .transform(truncate_lineage)
        )
        fe = ch.select("w", "u", "v").distinct()
        a = ch.select(F.col("c"), F.col("o"))
        b = ch.select(F.col("c").alias("bc"), F.col("o").alias("bo"))
        p = a.join(bcast(b), F.col("bc") == F.col("o")).select(
            "c",
            F.expr(
                "CASE WHEN bo = c THEN least(c, o) ELSE o END"
            ).alias("p"),
        )
        for _ in range(D_DOUBLE):
            nxt = p.select(F.col("c").alias("nc"), F.col("p").alias("np"))
            p = p.join(bcast(nxt), F.col("nc") == F.col("p"), "left").select(
                "c", F.coalesce("np", "p").alias("p")
            )
        # No truncation of p (round-15): it is consumed exactly once (the
        # labels rebuild below) and its plan is bounded — 2^D_DOUBLE
        # references to the CHECKPOINTED ch, all component-count-sized —
        # so the old per-round materialization job bought nothing.
        # Measured: jobs/invocation 45 → 42 (tools/probe_gr_jobs.py).
        labels = (
            labels.join(bcast(p), labels.lbl == p.c, "left")
            .select("node", F.coalesce("p", "lbl").alias("lbl"))
            .transform(truncate_lineage)
        )
        metrics = (
            fe.agg(
                F.count("*").cast("bigint").alias("edges_added"),
                F.expr("CAST(coalesce(sum(w), 0) AS BIGINT)").alias(
                    "weight_added_cents"
                ),
            )
            .crossJoin(
                labels.agg(
                    F.countDistinct("lbl").cast("bigint").alias(
                        "n_components"
                    )
                )
            )
            .select(
                F.lit(r + 1).cast("int").alias("round"),
                "n_components",
                "edges_added",
                "weight_added_cents",
            )
        )
        per_round.append(metrics)
    out = per_round[0]
    for m in per_round[1:]:
        out = out.unionAll(m)
    return out.orderBy("round")
