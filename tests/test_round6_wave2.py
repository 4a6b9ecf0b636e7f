"""Invariant tests for round-6 wave-2/3 operators (quantile, survival,
experimentation, estimation, governance)."""

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table


def _q(name):
    from big_data_training_spark.registry import all_queries

    return all_queries()[name].fn


def test_twophase_quantile_matches_percentile_disc(spark, sf_dir):
    rows = {r.pct: r.value_cents for r in
            _q("agg_exact_quantile_twophase")(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents"
    )
    for pct in (50, 95):
        ref = li.selectExpr(
            f"CAST(floor(percentile_disc({pct / 100.0})"
            f" WITHIN GROUP (ORDER BY cents)) AS BIGINT) AS v"
        ).collect()[0].v
        assert rows[pct] == ref, (pct, rows[pct], ref)


def test_km_curve_monotone(spark, sf_dir):
    rows = _q("ev_kaplan_meier")(spark, sf_dir).collect()
    assert rows
    at_risk = [r.n_at_risk for r in rows]
    nll = [r.km_nll16 for r in rows]
    assert at_risk == sorted(at_risk, reverse=True)
    assert nll == sorted(nll)  # survival only decreases
    for r in rows:
        assert r.n_deaths >= 1 and r.hazard_step16 >= 0


def test_aa_ztest_null_calibrated(spark, sf_dir):
    r = _q("ab_mean_diff_ztest")(spark, sf_dir).collect()[0]
    assert r.n_a > 0 and r.n_b > 0 and r.se_milli > 0
    # A/A by construction: the hash arm is independent of behavior.
    # Deterministic fixture, so this is a fixed number; bound loosely.
    assert abs(r.z_milli) < 10_000


def test_cuped_fraction_in_unit_range(spark, sf_dir):
    r = _q("ab_cuped_variance_reduction")(spark, sf_dir).collect()[0]
    assert 0 <= r.var_reduction_ppm <= 1_000_000
    assert r.varx_num > 0 and r.vary_num > 0


def test_shapley_efficiency_property(spark, sf_dir):
    rows = _q("ev_attribution_shapley")(spark, sf_dir).collect()
    assert len(rows) == 3
    total_x6 = sum(r.shapley_x6_ppm for r in rows)
    # efficiency: sum phi = v(full) - v(empty), exact at x6 scale
    from big_data_training_spark.operators.shapley import (
        CHANNELS,
        CONV_VALUE,
    )

    ev = load_table(spark, sf_dir, "events")
    f0 = ev.groupBy("user_id").agg(F.min("ts").alias("f"))
    bits = [
        f"(CASE WHEN max(CASE WHEN event_type = '{ch}'"
        f" AND ts < f + INTERVAL 1 DAY THEN 1 ELSE 0 END)"
        f" = 1 THEN {1 << i} ELSE 0 END)"
        for i, ch in enumerate(CHANNELS)
    ]
    u = ev.join(f0, "user_id").groupBy("user_id").agg(
        F.expr(" + ".join(bits)).alias("mask"),
        F.expr(
            f"max(CASE WHEN event_type = 'purchase'"
            f" AND value > {CONV_VALUE} THEN 1 ELSE 0 END)"
        ).alias("conv"),
    )
    v = {
        r.mask: r.v
        for r in u.groupBy("mask")
        .agg(
            F.expr(
                "CAST(sum(conv) * 1000000 div count(*) AS BIGINT)"
            ).alias("v")
        )
        .collect()
    }
    assert total_x6 == 6 * (v.get(7, 0) - v.get(0, 0))


def test_ucb1_scoreboard_consistent(spark, sf_dir):
    rows = _q("ab_ucb1_scores")(spark, sf_dir).collect()
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.bonus_ppm > 0
        assert r.ucb_ppm == r.mean_ppm + r.bonus_ppm
    ucbs = [r.ucb_ppm for r in sorted(rows, key=lambda r: r.rnk)]
    assert ucbs == sorted(ucbs, reverse=True)


def test_capture_recapture_bounds(spark, sf_dir):
    r = _q("apx_capture_recapture")(spark, sf_dir).collect()[0]
    assert r.m <= min(r.n1, r.n2)
    if r.m > 0:
        assert r.lincoln_est >= max(r.n1, r.n2)
    assert r.chapman_est >= 0


def test_dkw_band_sandwiches_ecdf(spark, sf_dir):
    rows = _q("apx_ecdf_dkw_band")(spark, sf_dir).collect()
    assert rows
    prev = 0
    for r in rows:
        assert r.lower_ppm <= r.ecdf_ppm <= r.upper_ppm
        assert r.ecdf_ppm >= prev
        prev = r.ecdf_ppm
    assert rows[-1].ecdf_ppm == 1_000_000


def test_erasure_cascade_self_consistent(spark, sf_dir):
    rows = {r.level: r for r in
            _q("dq_erasure_cascade_audit")(spark, sf_dir).collect()}
    assert rows["customer"].n_orphans_if_not_cascaded == rows[
        "orders"
    ].n_rows_to_erase
    assert rows["orders"].n_orphans_if_not_cascaded == rows[
        "lineitem"
    ].n_rows_to_erase
    assert rows["lineitem"].n_orphans_if_not_cascaded == 0


def test_matryoshka_recall_bounds(spark, sf_dir):
    rows = _q("sim_dim_truncation_recall")(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.n_overlap <= r.k
        assert r.recall_ppm == r.n_overlap * 1_000_000 // r.k


def test_business_day_wait_bounds(spark, sf_dir):
    rows = _q("cal_business_day_wait")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.avg_business_days_milli <= r.max_business_days * 1000
        assert r.total_business_days <= r.n_items * r.max_business_days
