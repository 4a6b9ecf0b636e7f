"""One-off scale probe: brute-force vs IVF batch serving as the vector
corpus grows 1x → 4x → 10x.

The 100 TB ANN claim (docs/SCALING.md): brute-force serving cost grows
as |queries| x corpus, while IVF pays one linear index build (centroid
pass) plus a per-query scan of only the probed cells (nprobe/cells of
the corpus). This probe replicates the sf0.1 embeddings fixture K times
(vec_id offset per replica, labels preserved so the coarse quantizer
keeps the same cell COUNT and cells grow in size — the regime a fixed
quantizer sees as data accumulates), then serves the same 16-query
panel both ways and reports wall-clock growth.

Usage: python tools/probe_ann_scale.py [max_K]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_training_spark import get_session
from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.similarity import (
    N_PROBE,
    TOP_K,
    _cos_expr,
    ivf_centroids,
)

BASE_SF = "/root/testdata/sf0.1"
KS = (1, 4, int(sys.argv[1]) if len(sys.argv) > 1 else 10)
KS = tuple(dict.fromkeys(KS))  # dedupe if max_K collides
N_QUERIES = 16


def build_corpus(spark, k_replicas: int) -> str:
    emb = load_table(spark, BASE_SF, "embeddings")
    parts = [emb]
    for k in range(1, k_replicas):
        parts.append(
            emb.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    out = tempfile.mkdtemp(prefix=f"bdts_ann_scale_{k_replicas}x_")
    corpus.coalesce(8).write.parquet(os.path.join(out, "embeddings.parquet"))
    return out


def queries_df(spark):
    return (
        load_table(spark, BASE_SF, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    )


def brute_serve(spark, sf_dir: str) -> int:
    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_df(spark)
    scored = emb.join(F.broadcast(q)).select(
        "qid", "vec_id", F.expr(_cos_expr("embedding", "qv")).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= TOP_K
    ).count()


def ivf_serve(spark, sf_dir: str) -> int:
    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_df(spark)
    cents = ivf_centroids(emb)
    route = (
        cents.join(F.broadcast(q))
        .select("qid", "label", F.expr(_cos_expr("cv", "qv")).alias("ccos"))
        .withColumn(
            "crk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("ccos"), F.asc("label"))
            ),
        )
        .filter(F.col("crk") <= N_PROBE)
        .select("qid", "label")
    )
    scored = emb.join(F.broadcast(route), "label").join(
        F.broadcast(q), "qid"
    ).select("qid", "vec_id", F.expr(_cos_expr("embedding", "qv")).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= TOP_K
    ).count()


def main() -> None:
    spark = get_session("ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup compiles both pipelines
    brute_serve(spark, "/root/testdata/sf0.001")
    ivf_serve(spark, "/root/testdata/sf0.001")

    for k in KS:
        d = build_corpus(spark, k)
        try:
            res = {}
            for name, fn in (("brute", brute_serve), ("ivf", ivf_serve)):
                runs = []
                n = 0
                for _ in range(3):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    n = fn(spark, d)
                    runs.append(round(time.time() - t0, 2))
                res[name] = (sorted(runs)[1], n, runs)
            print(
                f"K={k:2d} vectors={5000 * k}:"
                f" brute median={res['brute'][0]}s rows={res['brute'][1]}"
                f" runs={res['brute'][2]}"
                f" | ivf median={res['ivf'][0]}s rows={res['ivf'][1]}"
                f" runs={res['ivf'][2]}",
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
