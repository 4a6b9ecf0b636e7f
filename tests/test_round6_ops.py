"""Invariant tests for the round-6 operator families (NB classifier,
evaluation metrics, walks, truss, synopses, audits). Oracle parity is
covered by test_oracle_parity; these pin the semantic invariants the
oracles alone can't express."""

import pytest
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table


def _q(name):
    from big_data_training_spark.registry import all_queries

    return all_queries()[name].fn


def test_nb_confusion_partitions_docs(spark, sf_dir):
    rows = _q("lm_nb_confusion")(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    per_lang = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {}
    for r in rows:
        got[r.true_lang] = got.get(r.true_lang, 0) + r.n_docs
    assert got == per_lang  # every doc classified exactly once


def test_nb_profile_bounded_per_class(spark, sf_dir):
    from big_data_training_spark.extensions.nbayes import NB_PROFILE_TOP

    rows = _q("lm_nb_class_profile")(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append(r.rnk)
    for lang, rnks in per.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= NB_PROFILE_TOP


def test_auc_in_unit_range_and_u_consistent(spark, sf_dir):
    r = _q("ev_auc_mannwhitney")(spark, sf_dir).collect()[0]
    assert 0 <= r.auc_ppm <= 1_000_000
    assert 0 <= r.u_times2 <= 2 * r.n_pos * r.n_neg
    assert r.auc_ppm == r.u_times2 * 1_000_000 // (2 * r.n_pos * r.n_neg)


def test_ks_bounds(spark, sf_dir):
    r = _q("ev_ks_statistic")(spark, sf_dir).collect()[0]
    assert 0 <= r.ks_ppm <= 1_000_000
    assert r.ks_num <= r.n_pos * r.n_neg


def test_pr_curve_monotone_recall(spark, sf_dir):
    rows = _q("ev_pr_curve")(spark, sf_dir).collect()
    # descending threshold => cumulative tp/fp non-decreasing
    for a, b in zip(rows, rows[1:]):
        assert b.tp >= a.tp and b.fp >= a.fp
        assert b.recall_ppm >= a.recall_ppm
    assert rows[-1].recall_ppm == 1_000_000


def test_walks_are_paths_in_graph(spark, sf_dir):
    from big_data_training_spark.extensions.graphwalk import WALK_STEPS

    walks = _q("gr_deterministic_walks")(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ed = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .selectExpr("l_suppkey AS src", "o_custkey + 1000000 AS dst")
        .distinct()
        .collect()
    )
    adj = set()
    for e in ed:
        adj.add((e.src, e.dst))
        adj.add((e.dst, e.src))
    byw = {}
    for r in walks:
        byw.setdefault(r.walk_id, {})[r.step] = r.node
    assert byw
    for wid, seq in byw.items():
        assert seq[0] == wid  # seed is the walk id
        steps = sorted(seq)
        assert steps == list(range(len(steps)))  # contiguous prefix
        assert len(steps) <= WALK_STEPS + 1
        for s in steps[1:]:
            assert (seq[s - 1], seq[s]) in adj  # every hop is an edge


def test_skipgram_counts_symmetric(spark, sf_dir):
    rows = _q("gr_walk_skipgrams")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.center != r.context or r.n_pairs >= 0


def test_ktruss_edge_counts_non_increasing(spark, sf_dir):
    rows = _q("gr_ktruss_peel")(spark, sf_dir).collect()
    counts = [r.n_edges for r in sorted(rows, key=lambda r: r.round)]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 0


def test_haar_synopsis_dc_is_total_count(spark, sf_dir):
    rows = _q("syn_haar_histogram")(spark, sf_dir).collect()
    ev_n = load_table(spark, sf_dir, "events").count()
    dc = [r for r in rows if r.level == 0]
    assert len(dc) == 1 and dc[0].coeff == ev_n  # smooth coeff = N
    assert all(0 <= r.energy_ppm <= 1_000_000 for r in rows)
    assert sum(r.energy_ppm for r in rows) <= 1_000_000 + len(rows)


def test_benford_shares_partition(spark, sf_dir):
    rows = _q("dq_benford_deviation")(spark, sf_dir).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    n = load_table(spark, sf_dir, "orders").filter(
        "o_totalprice >= 1"
    ).count()
    assert sum(r.obs for r in rows) == n
    assert sum(r.benford_ppm for r in rows) == pytest.approx(
        1_000_000, abs=20_000  # 1/16-bit kernel quantization of w/53
    )


def test_editdist_blocks_consistent(spark, sf_dir):
    rows = _q("er_blocked_editdist")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_matches <= r.n_candidate_pairs
        assert r.n_candidate_pairs <= r.n_members * (r.n_members - 1) // 2


def test_conformal_coverage_near_target(spark, sf_dir):
    rows = _q("ml_conformal_coverage")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.q_cents >= 0 and r.n_test > 0
        # 90% target; loose finite-sample band at fixture sizes
        assert r.coverage_ppm >= 780_000


def test_rr_debiasing_algebra(spark, sf_dir):
    r = _q("dp_randomized_response")(spark, sf_dir).collect()[0]
    assert 0 <= r.n_true_yes <= r.n_users
    assert 0 <= r.n_reported_yes <= r.n_users
    assert r.debiased_ppm == (
        (4 * r.n_reported_yes - r.n_users) * 1_000_000
        // (2 * r.n_users)
    )


def test_sax_motifs_shape(spark, sf_dir):
    rows = _q("ts_sax_motifs")(spark, sf_dir).collect()
    assert rows
    assert all(len(r.motif) == 3 for r in rows)
    shares = [r.share_ppm for r in rows]
    assert all(0 <= s <= 1_000_000 for s in shares)
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
