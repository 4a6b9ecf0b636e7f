"""Independent-truth checks for the round-12 changes — invariants the
DuckDB oracle cannot establish because both engines share the SQL
formulation (the oracle proves ENGINE parity; these prove the
FORMULATION or the operational contract).
"""

from __future__ import annotations

import warnings

import pytest

from big_data_training_spark.data import load_table


def test_bollinger_stream_equals_batch(spark, sf_dir):
    """The merged additive day-series state must be row-identical to
    the batch breakout query (the mergeability claim itself)."""
    from big_data_training_spark.operators.marketdata import (
        ts_bollinger_breakouts,
    )
    from big_data_training_spark.streaming.marketdata_stream import (
        st_bollinger_stream,
    )

    batch = {tuple(r) for r in ts_bollinger_breakouts(spark, sf_dir).collect()}
    stream = {tuple(r) for r in st_bollinger_stream(spark, sf_dir).collect()}
    assert stream == batch
    assert batch  # vacuous equality would certify nothing


def test_sharpe_stream_equals_batch(spark, sf_dir):
    from big_data_training_spark.operators.marketdata import (
        fin_rolling_sharpe,
    )
    from big_data_training_spark.streaming.marketdata_stream import (
        st_sharpe_stream,
    )

    batch = {tuple(r) for r in fin_rolling_sharpe(spark, sf_dir).collect()}
    stream = {tuple(r) for r in st_sharpe_stream(spark, sf_dir).collect()}
    assert stream == batch
    assert batch


def test_exact_audit_warns_when_unsampled_at_scale(spark, sf_dir, monkeypatch):
    """VERDICT r11 #6: the quadratic-ish exact audit must not run
    unsampled over a corpus-scale document set without a loud
    warning. Threshold is monkeypatched to 0 so the tiny fixture
    trips it; with the knob set (< 100) no warning fires."""
    from big_data_training_spark.extensions import dedup

    monkeypatch.setattr(dedup, "EXACT_AUDIT_MAX_UNSAMPLED_DOCS", 0)
    dedup._audit_doc_counts.clear()
    with pytest.warns(UserWarning, match="SPARK_GRAFT_EXACT_AUDIT_SAMPLE_PCT"):
        dedup._hashed_shingle_pairs(spark, sf_dir, sample_pct=100)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dedup._hashed_shingle_pairs(spark, sf_dir, sample_pct=10)


def test_sampled_audit_is_a_subset_of_the_unsampled_universe(spark, sf_dir):
    """The hash-sample contract must select a deterministic subset:
    every (doc_id, shingle-hash) pair of the sampled run appears in
    the unsampled run, and the sampled doc set matches the portable
    hash60 predicate exactly."""
    from big_data_training_spark.extensions import dedup
    from big_data_training_spark.functions.hashing import hash60
    from pyspark.sql import functions as F

    full = dedup._hashed_shingle_pairs(spark, sf_dir, sample_pct=None)
    sampled = dedup._hashed_shingle_pairs(spark, sf_dir, sample_pct=37)
    assert sampled.exceptAll(full).count() == 0
    want = {
        r[0]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.pmod(hash60(F.col("doc_id").cast("string")), F.lit(100)) < 37)
        .select("doc_id")
        .collect()
    }
    got = {r[0] for r in sampled.select("doc_id").distinct().collect()}
    # docs with fewer tokens than a shingle emit nothing — subset, and
    # every emitted doc must satisfy the predicate
    assert got <= want and got


def test_exponential_mechanism_weight_matches_reported_utility(spark, sf_dir):
    """ADVICE r11 #5: the released utility must satisfy
    weight == 2**utility on ANY corpus — including past the clamp."""
    from big_data_training_spark.extensions.privacy2 import (
        dp_exponential_mechanism,
    )

    rows = dp_exponential_mechanism(spark, sf_dir).collect()
    assert rows
    assert sum(r["chosen"] for r in rows) == 1
    for r in rows:
        assert r["utility"] <= 50
        assert r["weight"] == 2 ** r["utility"], r


def test_power_sample_size_target_rate_clamped(spark, sf_dir):
    """ADVICE r11 #4: the +2pp target rate is clamped at 1.0 — the
    released p2_ppm can never exceed 1000000 and n_per_arm is a
    positive finite integer."""
    from big_data_training_spark.operators.abdesign import (
        ab_power_sample_size,
    )

    row = ab_power_sample_size(spark, sf_dir).first()
    assert row["p2_ppm"] <= 1_000_000
    assert row["n_per_arm"] > 0


def test_j3_query_join_sides_have_no_exchange(spark, sf_dir):
    """The registered j3_bucketed_coloc_join's OWN join must plan with
    no Exchange under either scan (the generic pattern test covers
    ad-hoc tables; this pins the claim to the shipped query). The
    final single-row aggregate exchange is allowed — the JOIN sides
    are what bucketing de-shuffles."""
    import tempfile

    from big_data_training_spark.operators import bucketing as b

    base = tempfile.mkdtemp(prefix="bdts_j3_wh_")
    lt, ot = b._table_names(base)
    # the per-run suffix keeps concurrent warehouse sessions collision-free
    assert lt != "bdts_j3_lineitem" and ot != "bdts_j3_orders"
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = b._coloc_join(b._write_bucketed(spark, sf_dir, base), lt, ot)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin", 1)
        assert len(join_part) == 2, plan  # the join IS sort-merge
        # nothing below the join may re-shuffle on the join key
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        b._drop_bucketed(spark, lt, ot)
        import shutil

        shutil.rmtree(base, ignore_errors=True)


def test_registry_rotation_orders_oldest_certified_first(tmp_path):
    """The re-certification rotation contract: unchecked names lead,
    then certified names ordered by their LATEST green CORRECTNESS
    round ascending — so the driver's fixed slice always re-validates
    the stalest certifications plus anything new."""
    import json

    from big_data_training_spark import registry as reg

    import pathlib

    q = reg.all_queries()
    names = list(q)
    # Derive the expected markers INDEPENDENTLY of reg._round_markers():
    # latest GREEN row wins; a latest-red name is forced to the front (0).
    root = pathlib.Path(reg.__file__).resolve().parent.parent
    expected: dict[str, int] = {}
    latest_red: dict[str, bool] = {}
    for rnd in range(1, 99):
        path = root / f"CORRECTNESS_r{rnd:02d}.json"
        if not path.exists():
            continue
        for name, row in json.loads(path.read_text()).items():
            if row.get("err") == "no_oracle":
                green = row.get("spark_rows") is not None
            else:
                green = bool(row.get("rows_match")) and (
                    row.get("hash_match") is not False
                )
            if green:
                expected[name] = rnd
                latest_red[name] = False
            else:
                latest_red[name] = True
    for name, red in latest_red.items():
        if red:
            expected[name] = 0
    # every registered name is either certified or leads the list
    cert_positions = [i for i, n in enumerate(names) if n in reg._DRIVER_CERTIFIED]
    uncert_positions = [
        i for i, n in enumerate(names) if n not in reg._DRIVER_CERTIFIED
    ]
    assert not uncert_positions or max(uncert_positions) < min(cert_positions)
    cert_rounds = [expected.get(names[i], 0) for i in cert_positions]
    assert cert_rounds == sorted(cert_rounds)
    # a red row must NOT advance a marker: r03 recorded hash_match=False for
    # dd_simhash; its marker must come from a later green round, never 3
    assert expected.get("dd_simhash", 0) != 3
    # rows-only-by-design rows (err == 'no_oracle') ARE their green
    assert expected.get("p1_partition_balance", 0) >= 5
    # the registry agrees with the independent derivation
    rounds = reg._round_markers()
    assert {n: rounds.get(n, 0) for n in expected} == expected
    # markers really come from the recorded driver rows
    r11 = json.load(open(root / "CORRECTNESS_r11.json"))
    assert all(rounds[n] >= 11 for n in r11)
