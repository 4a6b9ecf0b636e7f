"""One-off scale probe: MinHash-LSH banding vs the exact inverted-index
Jaccard audit as the corpus grows 1x → 4x → 10x.

The central 100 TB claim (docs/SCALING.md) is that the LSH path's cost
is ~linear in corpus size while the exact audit grows with the sum of
squared shingle document-frequencies. This probe synthesizes scaled
corpora by replicating the sf0.1 documents fixture K times with a
replica token spliced in after every third word: within a replica the
near-duplicate structure is preserved exactly, while cross-replica
3-gram shingle overlap drops to ~1/4 (below the 0.5 MinHash threshold),
so the true pair count — and therefore the OUTPUT — stays linear in K
and wall-clock growth measures the engines, not a quadratic answer.

Usage: python tools/probe_dedup_scale.py [max_K]
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
from big_data_training_spark.data import load_table

BASE_SF = "/root/testdata/sf0.1"
KS = (1, 4, int(sys.argv[1]) if len(sys.argv) > 1 else 10)


def build_corpus(spark, k_replicas: int) -> str:
    docs = load_table(spark, BASE_SF, "documents")
    parts = []
    for k in range(k_replicas):
        if k == 0:
            parts.append(docs)
            continue
        marked = docs.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            F.expr(
                "array_join(transform(split(text, ' '),"
                f" (w, i) -> IF(i % 3 = 2, concat(w, ' xr{k}x'), w)), ' ')"
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(marked)
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    out = tempfile.mkdtemp(prefix=f"bdts_dedup_scale_{k_replicas}x_")
    corpus.coalesce(8).write.parquet(os.path.join(out, "documents.parquet"))
    return out


def main() -> None:
    spark = get_session("dedup-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from big_data_training_spark.extensions.dedup import (
        dd_minhash_lsh_pairs,
        dd_ngram_jaccard_pairs,
    )

    # warmup compiles both pipelines
    dd_minhash_lsh_pairs(spark, "/root/testdata/sf0.001").count()
    dd_ngram_jaccard_pairs(spark, "/root/testdata/sf0.001").count()

    for k in KS:
        d = build_corpus(spark, k)
        try:
            res = {}
            for name, fn in (
                ("lsh", dd_minhash_lsh_pairs),
                ("exact", dd_ngram_jaccard_pairs),
            ):
                runs = []
                n_pairs = 0
                for _ in range(3):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    n_pairs = fn(spark, d).count()
                    runs.append(round(time.time() - t0, 2))
                res[name] = (sorted(runs)[1], n_pairs, runs)
            print(
                f"K={k:2d} docs={5000 * k}:"
                f" lsh median={res['lsh'][0]}s pairs={res['lsh'][1]} runs={res['lsh'][2]}"
                f" | exact median={res['exact'][0]}s pairs={res['exact'][1]}"
                f" runs={res['exact'][2]}",
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
