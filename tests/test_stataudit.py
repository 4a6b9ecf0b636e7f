"""Stat-audit invariants: t-closeness must match a brute-force EMD,
the independence grid must conserve counts and reproduce the null
exactly, ACF sufficient statistics must reproduce numpy's Pearson
autocorrelation, and the degree-mixing outputs must agree with a
brute-force recomputation from the edge list."""

from __future__ import annotations

import numpy as np

from big_data_training_spark.operators.stataudit import (
    ACF_LAGS,
    T_BUCKETS,
    _edge_endpoint_degrees,
    dq_independence_cells,
    dq_t_closeness,
    ev_acf_sufficient,
    gr_degree_assortativity_stats,
    gr_degree_mixing_curve,
)
from big_data_training_spark.data import load_table


def test_t_closeness_matches_bruteforce(spark, sf_dir):
    rows = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "CAST(floor(value * 100) AS BIGINT) AS cents"
    ).collect()
    cents = [r.cents for r in rows]
    lo, hi, n = min(cents), max(cents), len(cents)
    width = hi - lo + 1

    def bucket(c: int) -> int:
        return min(T_BUCKETS - 1, (c - lo) * T_BUCKETS // width)

    glob = [0] * T_BUCKETS
    per: dict[str, list[int]] = {}
    for r in rows:
        b = bucket(r.cents)
        glob[b] += 1
        per.setdefault(r.event_type, [0] * T_BUCKETS)[b] += 1
    buckets_nonempty = [b for b in range(T_BUCKETS) if glob[b] > 0]
    got = {r.event_type: r for r in dq_t_closeness(spark, sf_dir).collect()}
    for et, g in per.items():
        n_g = sum(g)
        cum, total = 0, 0
        for b in buckets_nonempty:
            cum += g[b] * n - glob[b] * n_g
            total += abs(cum)
        expected = total * 1000 // ((len(buckets_nonempty) - 1) * n_g * n)
        assert got[et].n_rows == n_g
        assert got[et].t_permille == expected
        assert 0 <= got[et].t_permille <= 1000


def test_independence_grid_conserves_counts(spark, sf_dir):
    rows = dq_independence_cells(spark, sf_dir).collect()
    n = sum(r.observed for r in rows)
    assert n > 0
    # expected_micro must be the exact independence null, and the
    # total expected mass equals the corpus within flooring slack.
    row_tot: dict[str, int] = {}
    col_tot: dict[int, int] = {}
    for r in rows:
        row_tot[r.event_type] = row_tot.get(r.event_type, 0) + r.observed
        col_tot[r.dow] = col_tot.get(r.dow, 0) + r.observed
    for r in rows:
        rc, cc = row_tot[r.event_type], col_tot[r.dow]
        assert r.expected_micro == rc * cc * 1_000_000 // n
        expected_dev = (n * r.observed - rc * cc) * 1_000_000 // (rc * cc)
        # Spark div truncates toward zero; python // floors — they agree
        # except on inexact negative quotients (off by one unit).
        assert abs(r.deviation_ppm - expected_dev) <= 1
    exp_total = sum(r.expected_micro for r in rows)
    assert abs(exp_total - n * 1_000_000) <= len(rows) * 1_000_000


def test_acf_matches_numpy(spark, sf_dir):
    daily = {
        r.day_num: r.x
        for r in load_table(spark, sf_dir, "events")
        .selectExpr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
            " AS day_num"
        )
        .groupBy("day_num")
        .count()
        .withColumnRenamed("count", "x")
        .collect()
    }
    got = {r.lag: r for r in ev_acf_sufficient(spark, sf_dir).collect()}
    assert set(got) == set(ACF_LAGS)
    for lag in ACF_LAGS:
        pairs = [
            (daily[d], daily[d - lag]) for d in daily if d - lag in daily
        ]
        xs = np.array([p[0] for p in pairs], dtype=np.float64)
        ys = np.array([p[1] for p in pairs], dtype=np.float64)
        r = got[lag]
        assert r.n_pairs == len(pairs)
        assert r.s_x == int(xs.sum()) and r.s_y == int(ys.sum())
        num = r.n_pairs * r.s_xy - r.s_x * r.s_y
        den = np.sqrt(float(r.acf_den_x) * float(r.acf_den_y))
        if den > 0:
            np.testing.assert_allclose(
                num / den, np.corrcoef(xs, ys)[0, 1], atol=1e-12
            )


def test_degree_mixing_bruteforce(spark, sf_dir):
    ex = [(r.x, r.y) for r in _edge_endpoint_degrees(spark, sf_dir).collect()]
    stats = gr_degree_assortativity_stats(spark, sf_dir).collect()[0]
    assert stats.m2 == len(ex)
    assert stats.s_x == sum(x for x, _ in ex)
    assert stats.s_xy == sum(x * y for x, y in ex)
    assert stats.s_xx == sum(x * x for x, _ in ex)
    # symmetry of the doubled edge list: x and y marginals identical
    assert sum(y for _, y in ex) == stats.s_x
    curve = gr_degree_mixing_curve(spark, sf_dir).collect()
    per: dict[int, list[int]] = {}
    for x, y in ex:
        per.setdefault(x, []).append(y)
    assert len(curve) == len(per)
    for r in curve:
        ys = per[r.degree]
        assert r.n_endpoints == len(ys)
        assert r.mean_neighbor_degree_micro == sum(ys) * 1_000_000 // len(ys)
