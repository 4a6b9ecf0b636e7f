"""Invariant tests for extensions/linkpred.py and operators/attribution.py
— conservation laws and plan shapes the oracle hash cannot express."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.extensions.linkpred import (
    DEG_CAP,
    TOP_N,
    gr_linkpred_scores,
)
from big_data_training_spark.operators.attribution import (
    ev_attribution_last_touch,
    ev_attribution_linear,
    ev_attribution_position,
    ev_attribution_time_decay,
)


def _total_purchase_cents(spark, sf_dir) -> int:
    from big_data_training_spark.data import load_table

    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.floor(F.col("value") * 100)))
        .collect()[0][0]
    )


def test_attribution_conserves_cents(spark, sf_dir):
    """Both models must credit EXACTLY the total purchase cents — the
    integer remainder handling is the whole point of the design."""
    total = _total_purchase_cents(spark, sf_dir)
    for fn in (
        ev_attribution_last_touch,
        ev_attribution_linear,
        ev_attribution_time_decay,
        ev_attribution_position,
    ):
        rows = fn(spark, sf_dir).collect()
        assert sum(r.credited_cents for r in rows) == total
        assert all(r.credited_cents >= 0 for r in rows)


def test_attribution_models_agree_on_unattributed(spark, sf_dir):
    """The unattributed channel is model-independent (same join, same
    window): both models must report the identical row."""
    lt = {r.channel: r for r in ev_attribution_last_touch(spark, sf_dir).collect()}
    ln = {r.channel: r for r in ev_attribution_linear(spark, sf_dir).collect()}
    assert ("unattributed" in lt) == ("unattributed" in ln)
    if "unattributed" in lt:
        assert lt["unattributed"].n_credits == ln["unattributed"].n_credits
        assert lt["unattributed"].credited_cents == ln["unattributed"].credited_cents


def test_linkpred_scores_bounds_and_plan(spark, sf_dir):
    df = gr_linkpred_scores(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # top-k must be served by per-partition heaps, not a global sort
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= TOP_N
    for r in rows:
        assert r.s1 < r.s2
        assert 0 <= r.jaccard_permille <= 1000
        # RA score: each shared neighbor contributes at most 10^6 (deg>=1)
        # and at least 10^6 // DEG_CAP (deg capped)
        assert (
            r.common_neighbors * (1_000_000 // DEG_CAP)
            <= r.ra_score_micro
            <= r.common_neighbors * 1_000_000
        )
    # the listing is sorted by (cn desc, ra desc, s1, s2)
    keys = [(-r.common_neighbors, -r.ra_score_micro, r.s1, r.s2) for r in rows]
    assert keys == sorted(keys)
