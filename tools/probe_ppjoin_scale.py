"""One-off scale probe: PPJoin prefix-filter candidate generation vs
the full inverted-index self-join as the corpus grows 1x → 4x → 10x.

The 100 TB claim for dd_prefix_filter_join (extensions/ppjoin.py) is
that the prefix index — each document's n − ⌈τn⌉ + 1 RAREST shingles —
generates a candidate stream that grows like the true-pair count
(linear in corpus size when duplication density is constant), while
the full inverted index's candidate count grows with the sum of
squared shingle document-frequencies: mid-frequency boilerplate
shingles collide across unrelated documents and that term is what
explodes at scale. This probe measures both counts and both
wall-clocks on synthetically scaled corpora (same replica scheme as
probe_dedup_scale.py: a replica token spliced after every third word
preserves within-replica near-dup structure while pushing
cross-replica Jaccard below τ, so the TRUE answer stays linear in K
and growth measures candidate generation, not a quadratic answer).

Usage: python tools/probe_ppjoin_scale.py [max_K]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from big_data_training_spark import get_session

KS = (1, 4, int(sys.argv[1]) if len(sys.argv) > 1 else 10)


def main() -> None:
    spark = get_session("ppjoin-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from probe_dedup_scale import build_corpus

    from big_data_training_spark.extensions import dedup as _dedup
    from big_data_training_spark.extensions.ppjoin import (
        _index_candidates,
        _prefix_candidates,
    )

    # warmup compiles both candidate pipelines
    warm_inv = _dedup._capped_inverted_index(spark, "/root/testdata/sf0.001")
    _prefix_candidates(warm_inv).count()
    _index_candidates(warm_inv).count()

    for k in KS:
        d = build_corpus(spark, k)
        try:
            res = {}
            for name, fn in (
                ("prefix", _prefix_candidates),
                ("index", _index_candidates),
            ):
                runs = []
                n_cand = 0
                for _ in range(3):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    inv = _dedup._cache_tracked(
                        _dedup._capped_inverted_index(spark, d)
                    )
                    n_cand = fn(inv).count()
                    runs.append(round(time.time() - t0, 2))
                res[name] = (sorted(runs)[1], n_cand, runs)
            pn, ic = res["prefix"][1], res["index"][1]
            # what would the auto-selection gate choose at this K?
            from pyspark.sql import functions as F

            from big_data_training_spark.extensions.ppjoin import (
                PPJOIN_CAND_PER_DOC_CROSSOVER,
            )

            inv = _dedup._capped_inverted_index(spark, d)
            stats = (
                inv.groupBy("h")
                .agg(F.max("dc").alias("dc"))
                .agg(F.sum(F.expr("dc * (dc - 1) div 2")).alias("v"))
                .crossJoin(inv.agg(F.countDistinct("doc_id").alias("nd")))
                .selectExpr("v div greatest(nd, 1) AS cpd")
                .first()
            )
            gate = (
                "prefix"
                if stats["cpd"] > PPJOIN_CAND_PER_DOC_CROSSOVER
                else "index"
            )
            faster = (
                "prefix" if res["prefix"][0] < res["index"][0] else "index"
            )
            print(
                f"K={k:2d} docs={5000 * k}:"
                f" prefix median={res['prefix'][0]}s cands={pn}"
                f" runs={res['prefix'][2]}"
                f" | index median={res['index'][0]}s cands={ic}"
                f" runs={res['index'][2]}"
                f" | reduction={1000 * (ic - pn) // max(ic, 1)}‰"
                f" | cand/doc={stats['cpd']} gate={gate}"
                f" measured-faster={faster}",
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
