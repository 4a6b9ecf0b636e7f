"""Greedy-MMR invariants the oracle hash cannot express directly."""

from __future__ import annotations

from big_data_training_spark.extensions.rerank import MMR_K, sim_mmr_rerank
from big_data_training_spark.extensions.similarity import sim_bruteforce_topk


def test_mmr_greedy_invariants(spark, sf_dir):
    rows = sorted(
        sim_mmr_rerank(spark, sf_dir).collect(), key=lambda r: r.pick_rank
    )
    assert [r.pick_rank for r in rows] == list(range(1, MMR_K + 1))
    assert len({r.vec_id for r in rows}) == MMR_K
    # Pick 1 is pure relevance: must equal the brute-force top-1.
    top1 = sim_bruteforce_topk(spark, sf_dir).collect()[0]
    assert rows[0].vec_id == top1.vec_id
    # The greedy objective is non-increasing: each step maximizes over a
    # shrinking candidate set with a growing diversity penalty.
    for prev, cur in zip(rows, rows[1:]):
        assert cur.mmr_scaled <= prev.mmr_scaled
    # Later picks trade relevance for diversity, never gain it.
    assert all(r.rel_scaled <= rows[0].rel_scaled for r in rows)


def test_mmr_rerank_is_pool_bounded(spark, sf_dir):
    """The greedy stage must not rescan the corpus: pool and sim matrix
    are pinned as LogicalRDDs (localCheckpoint), so the executed plan of
    the final result contains 'ExistingRDD' scans, not 20 parquet scans."""
    df = sim_mmr_rerank(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
