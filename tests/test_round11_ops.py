"""Independent-truth checks for the round-11 operator families —
invariants the DuckDB oracle cannot establish because both engines
share the SQL formulation (the oracle proves ENGINE parity; these
prove the FORMULATION against Python ground truth or algebra).
"""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table


def test_iso_week_matches_python_isocalendar(spark, sf_dir):
    """The Thursday-anchor construction must agree with Python's
    date.isocalendar() on every order date — including the year-
    boundary dates the construction exists for."""
    from big_data_training_spark.operators.windows_adv import _ISO_SPARK

    rows = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderdate").cast("date").alias("d"),
            F.expr(f"year({_ISO_SPARK['thu']})").alias("iso_year"),
            F.expr(
                f"(dayofyear({_ISO_SPARK['thu']}) - 1) div 7 + 1"
            ).alias("iso_week"),
        )
        .distinct()
        .collect()
    )
    assert rows
    for r in rows:
        want = r["d"].isocalendar()
        assert (r["iso_year"], r["iso_week"]) == (want[0], want[1]), r


def test_welch_ttest_matches_python(spark, sf_dir):
    """t statistic recomputed in pure Python from the raw milli values
    (Welch definition, float math) must agree with the query's rounded
    output to well inside rounding tolerance."""
    from big_data_training_spark.operators.stattests import (
        stat_welch_ttest,
    )

    ev = load_table(spark, sf_dir, "events")
    vals = {
        t: [
            int(math.floor(r["value"] * 1000))
            for r in ev.filter(F.col("event_type") == t)
            .select("value")
            .collect()
        ]
        for t in ("purchase", "click")
    }
    a, b = vals["purchase"], vals["click"]

    def mv(x):
        n = len(x)
        m = sum(x) / n
        v = sum((xi - m) ** 2 for xi in x) / (n - 1)
        return n, m, v

    na, ma, va = mv(a)
    nb, mb, vb = mv(b)
    t_want = (ma - mb) / math.sqrt(va / na + vb / nb)
    row = stat_welch_ttest(spark, sf_dir).collect()[0]
    assert abs(row["t_stat"] - round(t_want, 6)) < 1e-4
    assert (row["n_a"], row["n_b"]) == (na, nb)


def test_max_drawdown_matches_python(spark, sf_dir):
    """Running-max drawdown recomputed from the daily series in plain
    Python equals the query's argmax row."""
    from big_data_training_spark.operators.marketdata import (
        _daily,
        fin_max_drawdown,
    )

    daily = sorted(
        (r["day"], r["d_milli"]) for r in _daily(spark, sf_dir).collect()
    )
    equity = peak = 0
    best = (-1, None)  # (drawdown, day)
    for day, d in daily:
        equity += d
        peak = max(peak, equity)
        dd = peak - equity
        if dd > best[0]:
            best = (dd, day)
    row = fin_max_drawdown(spark, sf_dir).collect()[0]
    assert (row["drawdown_milli"], row["day"]) == best


def test_decision_stump_is_argmin_over_buckets(spark, sf_dir):
    """The stump's reported split must minimize weighted Gini over the
    full candidate set, recomputed in Python from the bucket cells."""
    from big_data_training_spark.operators.mlclosed import (
        _BUCKET_SPARK,
        _YBIN,
        ml_decision_stump,
    )

    ev = load_table(spark, sf_dir, "events")
    cells = sorted(
        (r["b"], r["n"], r["pos"])
        for r in ev.groupBy(F.expr(_BUCKET_SPARK).alias("b"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr(_YBIN)).cast("bigint").alias("pos"),
        )
        .collect()
    )
    tn = sum(n for _, n, _ in cells)
    tp = sum(p for _, _, p in cells)
    best = None
    cn = cp = 0
    for b, n, p in cells:
        cn += n
        cp += p
        if cn >= tn:
            continue
        rn, rp = tn - cn, tp - cp

        def gini(nn, pp):
            q = pp / nn
            return nn * (1 - q * q - (1 - q) * (1 - q))

        g = math.floor(1_000_000 * (gini(cn, cp) + gini(rn, rp)) / tn)
        if best is None or (g, b) < best:
            best = (g, b)
    row = ml_decision_stump(spark, sf_dir).collect()[0]
    assert (row["gini_micro"], row["best_bucket"]) == best


def test_gaussian_noise_is_calibrated_and_deterministic(spark, sf_dir):
    """Irwin-Hall noise: bounded by construction (|z| <= 6 sigma),
    identical across invocations (the reproducibility contract), and
    the released mean stays near the clipped truth."""
    from big_data_training_spark.extensions.privacy2 import (
        SIGMA_MILLI,
        dp_gaussian_clipped_mean,
    )

    r1 = dp_gaussian_clipped_mean(spark, sf_dir).collect()[0]
    r2 = dp_gaussian_clipped_mean(spark, sf_dir).collect()[0]
    assert r1 == r2
    assert abs(r1["noise_milli"]) <= 6 * SIGMA_MILLI
    released = r1["clipped_sum"] + r1["noise_milli"]
    assert abs(released - r1["clipped_sum"]) <= 6 * SIGMA_MILLI


def test_exponential_mechanism_picks_exactly_one(spark, sf_dir):
    from big_data_training_spark.extensions.privacy2 import (
        dp_exponential_mechanism,
    )

    rows = dp_exponential_mechanism(spark, sf_dir).collect()
    assert sum(r["chosen"] for r in rows) == 1
    assert all(r["weight"] == 2 ** r["utility"] for r in rows)


def test_variant_frequency_traces_are_time_ordered(spark, sf_dir):
    """A sampled case's variant string must equal its events' types
    under the (ts, event_id) total order — the collapse is the
    operator's whole contract."""
    from big_data_training_spark.operators.procvariants import _traces

    ev = load_table(spark, sf_dir, "events")
    case = (
        _traces(spark, sf_dir)
        .filter(F.col("n_steps") >= 3)
        .orderBy("user_id", "day")
        .select("user_id", "day", "variant")
        .first()
    )
    assert case is not None
    day_expr = F.expr("unix_micros(ts) div 86400000000")
    want = ">".join(
        r["event_type"]
        for r in ev.filter(
            (F.col("user_id") == case["user_id"])
            & (day_expr == case["day"])
        )
        .orderBy("ts", "event_id")
        .select("event_type")
        .collect()
    )
    assert case["variant"] == want


def test_systematic_sample_is_exact_interval(spark, sf_dir):
    """The 1-in-50 draw takes exactly ceil(N/50) units — the equal-
    interval property that distinguishes systematic from Bernoulli
    sampling."""
    from big_data_training_spark.extensions.sampledesign import (
        SYS_STEP,
        sm_systematic_sample,
    )

    row = sm_systematic_sample(spark, sf_dir).collect()[0]
    n_pop = load_table(spark, sf_dir, "events").count()
    assert row["n_sample"] == -(-n_pop // SYS_STEP)  # ceil division


def test_ohlc_stream_equals_batch(spark, sf_dir):
    """The merged streaming bar state must be row-identical to the
    batch candlestick reduction (the mergeability claim itself)."""
    from big_data_training_spark.operators.marketdata import fin_ohlc_bars
    from big_data_training_spark.streaming.ohlc_stream import st_ohlc_stream

    batch = {tuple(r) for r in fin_ohlc_bars(spark, sf_dir).collect()}
    stream = {tuple(r) for r in st_ohlc_stream(spark, sf_dir).collect()}
    assert stream == batch
