"""One-off scale probe: growth of the remaining iterative graph
kernels — gr_kcore_ladder, gr_personalized_pagerank,
gr_boruvka_msf_rounds — at 1x / 2x / 4x the sf0.1 graph (VERDICT r10
#6 asked for these on the probe_ktruss template).

All three kernels derive the supplier↔customer co-order graph from
lineitem ⋈ orders, so the probe synthesizes scaled versions of just
those two tables (orders, customers, suppliers, and lineitems all
scale together — edge count grows linearly, degree distribution keeps
its squared-uniform skew) into a temp fixture dir and times the
REGISTERED query functions end-to-end: what's measured is exactly the
shipped plan, including its broadcast gates and lineage truncation.
Results go to docs/SCALING.md.

Usage: python tools/probe_graph_kernels_scale.py [multipliers...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from big_data_training_spark import get_session

MULTS = [int(a) for a in sys.argv[1:]] or [1, 2, 4]

# sf0.1 shape
BASE_ORDERS = 150_000
BASE_CUSTS = 15_000
BASE_SUPPS = 1_000
ITEMS_PER_ORDER = 4


def build_fixture(spark, mult: int) -> str:
    d = tempfile.mkdtemp(prefix=f"bdts_gk_probe_{mult}x_")
    n_orders = BASE_ORDERS * mult
    n_custs = BASE_CUSTS * mult
    n_supps = BASE_SUPPS * mult
    (
        spark.range(n_orders)
        .select(
            F.col("id").alias("o_orderkey"),
            # squared-uniform skew: hot customers, like the fixture
            F.floor(F.pow(F.rand(seed=7), F.lit(2.0)) * n_custs)
            .cast("bigint")
            .alias("o_custkey"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(d, "orders.parquet"))
    )
    (
        spark.range(n_orders * ITEMS_PER_ORDER)
        .select(
            (F.col("id") % n_orders).alias("l_orderkey"),
            F.floor(F.pow(F.rand(seed=13), F.lit(2.0)) * n_supps)
            .cast("bigint")
            .alias("l_suppkey"),
            (F.floor(F.rand(seed=17) * 90000) / 100 + 100).alias(
                "l_extendedprice"
            ),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(d, "lineitem.parquet"))
    )
    # the kernels' broadcast gates size their node-lookup broadcasts
    # from the supplier/customer FOOTER row counts — ship key-only
    # tables so the gates see the scaled entity counts
    (
        spark.range(n_supps)
        .select(F.col("id").alias("s_suppkey"))
        .write.mode("overwrite")
        .parquet(os.path.join(d, "supplier.parquet"))
    )
    (
        spark.range(n_custs)
        .select(F.col("id").alias("c_custkey"))
        .write.mode("overwrite")
        .parquet(os.path.join(d, "customer.parquet"))
    )
    return d


def main() -> None:
    spark = get_session("probe-graph-kernels")
    spark.sparkContext.setLogLevel("ERROR")
    from big_data_training_spark.extensions.graphalgo import (
        gr_kcore_ladder,
        gr_personalized_pagerank,
    )
    from big_data_training_spark.extensions.mst import gr_boruvka_msf_rounds

    kernels = (
        ("kcore", gr_kcore_ladder),
        ("ppr", gr_personalized_pagerank),
        ("boruvka", gr_boruvka_msf_rounds),
    )
    # warmup compiles every pipeline on a small graph
    warm = build_fixture(spark, 1)
    try:
        for _, fn in kernels:
            fn(spark, warm).collect()
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    for mult in MULTS:
        d = build_fixture(spark, mult)
        try:
            parts = [f"mult={mult}"]
            for name, fn in kernels:
                runs = []
                rows = 0
                for _ in range(3):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    rows = len(fn(spark, d).collect())
                    runs.append(round(time.time() - t0, 2))
                parts.append(
                    f"{name}: median={sorted(runs)[1]}s rows={rows}"
                    f" runs={runs}"
                )
            print(" | ".join(parts), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
