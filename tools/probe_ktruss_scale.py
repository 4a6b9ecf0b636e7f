"""One-off scale probe: k-truss peeling cost growth vs graph size
(VERDICT r6 #3 asked for the peel to be benched and scale-proven).

gr_ktruss_peel's cost is dominated by round 1 (full-graph support =
degree-oriented intersection + one 3T-row groupBy); rounds 2..R run on
the survivor subgraph, which collapses ~40x at k=12. This probe
synthesizes co-order-shaped bipartite baskets at 1x / 2x / 4x the
sf0.1 scale, derives the part co-occurrence graph the same way the
query does, and times the full peel — documenting that cost grows with
the *edge/triangle* count (near-linearly thanks to the sqrt(2m)
orientation bound) and not quadratically, plus the per-round survivor
collapse that justifies the recompute-on-survivors design over a
materialize-incidence frontier-delta (measured slower; see
extensions/truss.py module doc). Results go to docs/SCALING.md.

Usage: python tools/probe_ktruss_scale.py [multipliers...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from big_data_training_spark import get_session
from big_data_training_spark.extensions.truss import (
    TRUSS_K,
    TRUSS_ROUNDS,
    _edge_support,
)
from big_data_training_spark.lineage import truncate_lineage

MULTS = [int(a) for a in sys.argv[1:]] or [1, 2, 4]

# sf0.1 shape: ~150k orders x ~4 lineitems -> 1.196M distinct co-order
# part pairs over 20k parts. Scale orders and parts together so basket
# size (the pair fan-out per order) stays constant — the realistic way
# a corpus grows.
BASE_ORDERS = 150_000
BASE_PARTS = 20_000
ITEMS_PER_ORDER = 4


def build_edges(spark, mult: int):
    n_orders = BASE_ORDERS * mult
    n_parts = BASE_PARTS * mult
    li = spark.range(n_orders * ITEMS_PER_ORDER).select(
        (F.col("id") % n_orders).alias("okey"),
        # squared-uniform skew: popular parts co-occur often, giving a
        # dense triangle core like the real fixture's
        F.floor(F.pow(F.rand(seed=11), F.lit(2.0)) * n_parts)
        .cast("bigint")
        .alias("pkey"),
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.pkey") < F.col("b.pkey")),
        )
        .select(F.col("a.pkey").alias("u"), F.col("b.pkey").alias("v"))
        .distinct()
    )


def peel(edges):
    cur = truncate_lineage(edges)
    sizes = [cur.count()]
    for _ in range(TRUSS_ROUNDS):
        cur = truncate_lineage(
            _edge_support(cur, n_edges=sizes[-1])
            .filter(F.col("s") >= TRUSS_K - 2)
            .select("u", "v")
        )
        sizes.append(cur.count())
    return sizes


def main() -> None:
    spark = get_session("probe-ktruss")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: codegen/JIT on a tiny graph
    peel(build_edges(spark, 1).limit(50_000))
    for mult in MULTS:
        edges = truncate_lineage(build_edges(spark, mult))
        m = edges.count()
        t0 = time.time()
        sizes = peel(edges)
        dt = time.time() - t0
        print(
            f"mult={mult} edges={m} peel_sec={dt:.2f} "
            f"survivors_per_round={sizes}"
        )


if __name__ == "__main__":
    main()
