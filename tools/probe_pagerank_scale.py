"""One-off scale probe: co-partitioned vs plain PageRank at ~10x the
sf0.1 edge count (VERDICT r4 #7).

At sf0.1 the co-partitioned variant's advantage sits inside the
container's ~30% single-query noise floor; this probe synthesizes a
6M-edge bipartite graph (10x sf0.1's 587k supplier→customer edges, same
shape: power-law-ish src degrees, disjoint key spaces) and times
N_ITER=3 rounds under both layouts, standalone, to document the
crossover that justifies the 100x claim. Results go to docs/SCALING.md.

Usage: python tools/probe_pagerank_scale.py [edge_multiplier]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from big_data_training_spark import get_session
from big_data_training_spark.extensions.graph import (
    COPART_PARTS,
    N_ITER,
    SCALE,
    _pinned_checkpoint,
    pagerank_round,
)

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 10
BASE_EDGES = 586_871  # distinct supplier→customer edges at sf0.1
N_SRC = 1_000 * MULT  # suppliers scale with SF
N_DST = 15_000 * MULT


def build_edges(spark):
    # Zipf-ish src degrees via squared-uniform skew: hub suppliers get
    # ~sqrt-range more edges, matching the real edge set's skew without
    # needing the (driver-read-only) fixture at a bigger SF.
    n = BASE_EDGES * MULT
    return (
        spark.range(n)
        .select(
            (F.floor(F.pow(F.rand(seed=7), F.lit(2.0)) * N_SRC))
            .cast("bigint")
            .alias("src"),
            (F.floor(F.rand(seed=11) * N_DST) + 1_000_000)
            .cast("bigint")
            .alias("dst"),
        )
        .distinct()
    )


def run(spark, co_partitioned: bool) -> tuple[float, int]:
    t0 = time.time()
    edges = build_edges(spark)
    if co_partitioned:
        edges = _pinned_checkpoint(edges.repartition(COPART_PARTS, "src"))
    else:
        edges = edges.cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if co_partitioned:
        nodes = _pinned_checkpoint(nodes.repartition(COPART_PARTS, "node"))
    else:
        nodes = nodes.cache()
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    if co_partitioned:
        outdeg = _pinned_checkpoint(outdeg.repartition(COPART_PARTS, "node"))
    ranks = nodes.select("node", F.lit(SCALE).cast("bigint").alias("rank"))
    for _ in range(N_ITER):
        round_df = pagerank_round(ranks, edges, outdeg, nodes, co_partitioned)
        ranks = _pinned_checkpoint(round_df) if co_partitioned else round_df
    top = ranks.orderBy(F.desc("rank"), F.asc("node")).limit(20).collect()
    dt = time.time() - t0
    if not co_partitioned:
        edges.unpersist()
        nodes.unpersist()
    return dt, sum(r.rank for r in top)


def main() -> None:
    spark = get_session("pagerank-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup compiles both pipelines at 1x
    global MULT  # noqa: PLW0603
    probe_mult = MULT
    MULT = 1
    run(spark, False)
    run(spark, True)
    MULT = probe_mult

    results = {}
    for label, co in (("plain", False), ("co_partitioned", True)):
        runs = []
        checksum = None
        for _ in range(3):
            dt, chk = run(spark, co)
            runs.append(round(dt, 2))
            checksum = chk
        results[label] = {"runs": runs, "median": sorted(runs)[1], "checksum": checksum}
        print(label, results[label], flush=True)
    assert results["plain"]["checksum"] == results["co_partitioned"]["checksum"], (
        "layouts must agree on the integer-exact result"
    )
    print(
        f"edges={BASE_EDGES * MULT} mult={MULT} speedup="
        f"{results['plain']['median'] / results['co_partitioned']['median']:.2f}x"
    )


if __name__ == "__main__":
    main()
