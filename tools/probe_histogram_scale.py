"""Scale probe: bounded-histogram rank statistics (AUC, two-phase
quantile) at 1x vs 10x row count.

Claim under test (docs/SCALING.md round-6): operators that collapse
the scan to a value-domain-bounded histogram scale linearly in rows
with a CONSTANT single-task tail (the bucket-table window), because
the bucket count depends on the value domain, not the row count.

Method: replicate sf0.1 events 1x and 10x via explode over a replica
index (values deterministically perturbed per replica so the score
distribution stays continuous), run the AUC bucket pipeline and the
two-phase quantile, record wall time and bucket-table cardinality.

Run: python tools/probe_histogram_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark import get_session
from big_data_training_spark.data import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, k: int):
    ev = load_table(spark, SF_DIR, "events")
    return (
        ev.crossJoin(F.broadcast(spark.range(k).selectExpr("id AS rep")))
        .selectExpr(
            "event_type",
            # perturb per replica, keep [0, 500) domain
            "value + rep * 0.0937 AS value",
        )
    )


def auc(df) -> tuple[int, float]:
    t0 = time.time()
    b = (
        df.filter(F.col("event_type").isin("purchase", "view"))
        .selectExpr(
            "CAST(floor(value * 100) AS BIGINT) AS s",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos",
        )
        .groupBy("s")
        .agg(
            F.expr("CAST(sum(pos) AS BIGINT)").alias("p"),
            F.expr("CAST(count(*) - sum(pos) AS BIGINT)").alias("g"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    c = b.withColumn("gb", F.coalesce(F.sum("g").over(w), F.lit(0)))
    row = c.agg(
        F.expr("CAST(sum(p) AS BIGINT)").alias("np"),
        F.expr("CAST(sum(g) AS BIGINT)").alias("ng"),
        F.expr("CAST(sum(p * (2 * gb + g)) AS BIGINT)").alias("u2"),
        F.count("*").alias("n_buckets"),
    ).collect()[0]
    return row.n_buckets, time.time() - t0


def main() -> None:
    spark = get_session("probe_histogram")
    spark.sparkContext.setLogLevel("ERROR")
    for k in (1, 10):
        df = replicated(spark, k).localCheckpoint(eager=True)
        n = df.count()
        auc(df)  # warm
        buckets, secs = auc(df)
        print(
            f"k={k}: rows={n:,} auc_buckets={buckets} auc_sec={secs:.2f}"
        )


if __name__ == "__main__":
    main()
