"""Invariants for the round-5 audit/maintenance batch: join-view IVM,
CBO cardinality audit, l-diversity, EWMA smoothing, PPS sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.privacy import dq_l_diversity
from big_data_training_spark.extensions.weighted_sample import (
    WSAMPLE_K,
    sm_weighted_priority_sample,
)
from big_data_training_spark.operators.costmodel import (
    dq_join_cardinality_audit,
)
from big_data_training_spark.operators.forecast import ev_ewma_value
from big_data_training_spark.operators.ivm_join import mv_join_delta_refresh


def test_ivm_conserves_join_size_and_revenue(spark, sf_dir):
    """The bilinear delta expansion must partition the join exactly:
    Σ n_items over the maintained view == |orders ⋈ lineitem|."""
    view = mv_join_delta_refresh(spark, sf_dir).agg(
        F.sum("n_items").alias("items"), F.sum("revenue_cents").alias("cents")
    ).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"]).count()
    assert view.items == joined
    assert view.cents > 0


def test_fk_joins_estimate_accurately(spark, sf_dir):
    """On clean FK joins the System-R formula should be near-exact:
    every fact row matches exactly one dim row, and max(ndv) equals the
    dim key count."""
    rows = dq_join_cardinality_audit(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.n_actual == r.n_left, r.join_name  # FK: one match per row
        assert r.err_permille <= 50, (r.join_name, r.err_permille)


def test_l_diversity_monotone(spark, sf_dir):
    rows = {r.l: r for r in dq_l_diversity(spark, sf_dir).collect()}
    assert sorted(rows) == [2, 3, 5, 10]
    mins = {r.min_diversity for r in rows.values()}
    assert len(mins) == 1  # min_diversity is a class property, not an l one
    for lo, hi in zip([2, 3, 5], [3, 5, 10]):
        assert rows[hi].n_classes_below >= rows[lo].n_classes_below
        assert rows[hi].n_rows_at_risk >= rows[lo].n_rows_at_risk


def test_ewma_bounded_by_trailing_extremes(spark, sf_dir):
    """An average with positive weights can never leave the range of
    what it averages: ewma ∈ [min, max] of the trailing 16 values."""
    rows = ev_ewma_value(spark, sf_dir).collect()
    assert rows
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.event_type, []).append(r)
    for series in by_key.values():
        series.sort(key=lambda r: r.day)
        for i, r in enumerate(series):
            window = [x.cents for x in series[max(0, i - 15): i + 1]]
            assert min(window) - 1 <= r.ewma_cents <= max(window), r
            assert r.residual_cents == r.cents - r.ewma_cents


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    sample = sm_weighted_priority_sample(spark, sf_dir)
    rows = sample.collect()
    assert len(rows) == WSAMPLE_K
    pris = [r.priority_micro for r in rows]
    assert pris == sorted(pris)
    docs = load_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r.weight for r in rows) / len(rows)
    # PPS: expected sample weight is size-biased, so it must exceed the
    # corpus mean by a clear margin on any non-degenerate weight spread.
    assert sample_mean > corpus_mean


def test_weighted_sample_matches_python_spec(spark, sf_dir):
    """Third-implementation check: the engine's sample must equal the
    k smallest md5-hash/weight priorities computed in pure Python from
    the raw parquet — no Spark, no DuckDB."""
    import hashlib
    import math

    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pydict()
    pris = []
    for doc_id, w in zip(t["doc_id"], t["n_chars"]):
        if w <= 0:
            continue
        h = int(hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()[:15], 16)
        pri = math.floor((h / float(1 << 60)) / w * 1e12)
        pris.append((pri, doc_id))
    expected = sorted(pris)[:WSAMPLE_K]
    got = [
        (r.priority_micro, r.doc_id)
        for r in sm_weighted_priority_sample(spark, sf_dir).collect()
    ]
    assert got == expected


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    from big_data_training_spark.operators.skyline import ev_customer_skyline

    orders = load_table(spark, sf_dir, "orders")
    pts = {
        r.custkey: (r.cents, r.n)
        for r in orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
                " AS BIGINT)"
            ).alias("cents"),
            F.count("*").alias("n"),
        )
        .collect()
    }

    def dominated(a):
        ra, oa = pts[a]
        return any(
            (rb >= ra and ob <= oa and (rb > ra or ob < oa))
            for b, (rb, ob) in pts.items()
            if b != a
        )

    want = {c for c in pts if not dominated(c)}
    got = {r.custkey for r in ev_customer_skyline(spark, sf_dir).collect()}
    assert got == want


def test_prefix_filter_loses_no_true_pairs(spark, sf_dir):
    """The PPJoin theorem, empirically: every Jaccard >= tau pair must
    appear among the prefix candidates, and the prefix index must
    actually shrink the candidate set."""
    from big_data_training_spark.extensions.ppjoin import (
        dd_prefix_filter_join,
    )

    r = dd_prefix_filter_join(spark, sf_dir).collect()[0]
    assert r.n_matches_in_candidates == r.n_matches
    assert r.n_prefix_candidates < r.n_index_candidates
    assert r.candidate_reduction_permille > 0
    assert r.n_matches <= r.n_prefix_candidates


def test_binary_hamming_containment_curve(spark, sf_dir):
    """The filter-then-rescore economics: containment of the exact
    top-10 inside the Hamming top-D must be monotone in D and strong
    at the deepest rescoring depth."""
    from big_data_training_spark.extensions.binaryann import (
        BQ_DEPTHS,
        BQ_TOP,
        sim_binary_hamming_recall,
    )

    rows = sim_binary_hamming_recall(spark, sf_dir).collect()
    assert [r.depth for r in rows] == sorted(BQ_DEPTHS)
    contained = [r.n_exact_in_candidates for r in rows]
    assert contained == sorted(contained)  # monotone in depth
    assert all(0 <= c <= BQ_TOP for c in contained)
    assert contained[-1] >= 9  # deepest depth recovers ~all of top-10
