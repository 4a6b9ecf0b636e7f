"""Invariant tests for extensions/graphalgo.py and corpusstats.py —
properties the oracle hash cannot express (monotonicity, bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.extensions.corpusstats import (
    COVERAGE_NS,
    EMB_DIM,
    ZIPF_RANKS,
    emb_gram_exact,
    lm_bigram_coverage_curve,
    lm_zipf_curve,
)
from big_data_training_spark.extensions.graphalgo import (
    BFS_SEEDS,
    KCORE_KS,
    gr_bfs_layers,
    gr_kcore_ladder,
)


def test_kcore_ladder_is_antitone(spark, sf_dir):
    """A (k+1)-core is a subgraph of the k-core: node and edge counts
    must be non-increasing in k."""
    rows = {r.k: r for r in gr_kcore_ladder(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(KCORE_KS)
    ks = sorted(rows)
    for lo, hi in zip(ks, ks[1:]):
        assert rows[hi].n_core_nodes <= rows[lo].n_core_nodes
        assert rows[hi].n_core_edges <= rows[lo].n_core_edges
    for r in rows.values():
        # every core node needs >= k neighbors, so edges >= nodes*k/2
        assert r.n_core_edges * 2 >= r.n_core_nodes * r.k


def test_bfs_layers_start_at_seeds_and_stay_nonnegative(spark, sf_dir):
    rows = sorted(gr_bfs_layers(spark, sf_dir).collect(), key=lambda r: r.layer)
    assert rows[0].layer == 0 and rows[0].n_new == BFS_SEEDS
    assert all(r.n_new >= 0 for r in rows)


def test_gram_matrix_shape_and_diagonal(spark, sf_dir):
    rows = emb_gram_exact(spark, sf_dir).collect()
    assert len(rows) == EMB_DIM * (EMB_DIM + 1) // 2
    by_ij = {(r.i, r.j): r.dot for r in rows}
    for d in range(1, EMB_DIM + 1):
        # diagonal = sum of squares: strictly positive for real vectors
        assert by_ij[(d, d)] > 0
    # Cauchy-Schwarz on a few off-diagonal cells
    for i, j in [(1, 2), (3, 40), (10, 64)]:
        assert by_ij[(i, j)] ** 2 <= by_ij[(i, i)] * by_ij[(j, j)]


def test_zipf_curve_frequencies_decrease_with_rank(spark, sf_dir):
    rows = sorted(lm_zipf_curve(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert rows, "corpus has words"
    assert all(r.rank in ZIPF_RANKS for r in rows)
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert all(r.rank_x_freq == r.rank * r.freq for r in rows)


def test_bigram_coverage_is_monotone_and_bounded(spark, sf_dir):
    rows = sorted(
        lm_bigram_coverage_curve(spark, sf_dir).collect(), key=lambda r: r.top_n
    )
    assert rows and all(r.top_n in COVERAGE_NS for r in rows)
    cov = [r.coverage_permille for r in rows]
    assert cov == sorted(cov)  # more bigrams cover more
    assert all(0 <= c <= 1000 for c in cov)


def test_zipf_topk_has_no_global_sort(spark, sf_dir):
    """The ranking window must be bounded by a distributed top-k:
    TakeOrderedAndProject in the plan, and the single-partition Window
    only ever sees max(ZIPF_RANKS) rows."""
    plan = (
        lm_zipf_curve(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
