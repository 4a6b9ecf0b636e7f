"""Trend estimators cross-checked against NumPy on the same daily
series, within the documented integer quantization."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.operators.regression import (
    ev_trend_ols,
    ev_trend_theil_sen,
)


def _daily_series(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    rows = (
        events.groupBy(
            "event_type",
            F.expr(
                "CAST(datediff(date_trunc('day', ts),"
                " TIMESTAMP '2024-01-01') AS BIGINT)"
            ).alias("x"),
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)"
            ).alias("y")
        )
        .collect()
    )
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r.event_type, []).append((r.x, r.y))
    return {k: sorted(v) for k, v in series.items()}


def test_ols_matches_numpy(spark, sf_dir):
    series = _daily_series(spark, sf_dir)
    got = {r.event_type: r for r in ev_trend_ols(spark, sf_dir).collect()}
    assert set(got) == set(series)
    for k, pts in series.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got[k].slope_microcents_per_day - slope * 1e6) <= 1.0, k
        assert abs(got[k].intercept_millicents - intercept * 1e3) <= 1.0, k


def test_theil_sen_matches_numpy_median(spark, sf_dir):
    series = _daily_series(spark, sf_dir)
    got = {
        r.event_type: r for r in ev_trend_theil_sen(spark, sf_dir).collect()
    }
    def trunc_div(a, b):
        # Spark div / DuckDB // truncate toward zero; Python // floors.
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    for k, pts in series.items():
        slopes = sorted(
            trunc_div((b[1] - a[1]) * 1_000_000, b[0] - a[0])
            for i, a in enumerate(pts)
            for b in pts[i + 1:]
        )
        assert got[k].n_pairs == len(slopes)
        # lower-middle median, as documented
        assert got[k].theil_sen_slope_micro == slopes[(len(slopes) - 1) // 2]


def test_theil_sen_robust_to_outlier_day(spark, sf_dir):
    """Doubling one day's revenue must move OLS more than Theil–Sen —
    the reason both exist."""
    series = _daily_series(spark, sf_dir)
    k, pts = sorted(series.items())[0]
    x = np.array([p[0] for p in pts], dtype=float)
    y = np.array([p[1] for p in pts], dtype=float)
    base_ols = np.polyfit(x, y, 1)[0]

    def ts_slope(yv):
        slopes = sorted(
            (yv[j] - yv[i]) / (x[j] - x[i])
            for i in range(len(x))
            for j in range(i + 1, len(x))
        )
        return slopes[(len(slopes) - 1) // 2]

    base_ts = ts_slope(y)
    y2 = y.copy()
    y2[-1] *= 10  # blow up the final day
    d_ols = abs(np.polyfit(x, y2, 1)[0] - base_ols)
    d_ts = abs(ts_slope(y2) - base_ts)
    assert d_ts < d_ols
