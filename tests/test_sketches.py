"""Sketch-family invariants beyond oracle parity: bloom's no-false-
negative guarantee, KMV mergeability, and the WindowGroupLimit plan
shape that keeps top-k shuffles O(groups · k) at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.extensions.sketches import (
    KMV_K,
    sk_bloom_membership,
    sk_kmv_distinct_per_type,
    sk_kmv_merge_global,
)
from big_data_training_spark.extensions.textstats import tx_tfidf_top_terms


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_never_false_negative(spark, sf_dir):
    rows = sk_bloom_membership(spark, sf_dir).collect()
    for r in rows:
        assert not (r["is_member"] and not r["maybe_member"]), rows
    # every distinct probe key is classified exactly once
    from big_data_training_spark.data import load_table

    n_probe = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n"] for r in rows) == n_probe


def test_kmv_merge_equals_direct(spark, sf_dir):
    row = sk_kmv_merge_global(spark, sf_dir).collect()[0]
    assert row["est_merged"] == row["est_direct"]
    # unsaturated sketches are exact; saturated ones stay within a loose
    # KMV error envelope (k=16 -> ~25% relative standard error)
    if row["exact_distinct"] < KMV_K:
        assert row["est_merged"] == row["exact_distinct"]
    else:
        assert 0.25 * row["exact_distinct"] <= row["est_merged"] <= 4 * row[
            "exact_distinct"
        ]


def test_kmv_plans_window_group_limit(spark, sf_dir):
    """The per-group k-smallest must pre-filter map-side (WindowGroupLimit)
    so the rank shuffle carries at most k rows per group."""
    plan = physical_plan(sk_kmv_distinct_per_type(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_tfidf_topk_contract(spark, sf_dir):
    df = tx_tfidf_top_terms(spark, sf_dir)
    assert "WindowGroupLimit" in physical_plan(df)
    per_doc = df.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.min("score").alias("mn")
    )
    assert per_doc.filter(F.col("n") > 3).count() == 0
    # scores are positive (rational idf > 0) and tf/df sane
    bad = df.filter(
        (F.col("score") <= 0) | (F.col("df") <= 0) | (F.col("tf") <= 0)
    ).count()
    assert bad == 0


def test_hll_estimate_within_theoretical_error(spark, sf_dir):
    """HLL with m=256 has relative standard error 1.04/sqrt(256) = 6.5%
    (4-sigma bound here; the small-range branch is far tighter). Also:
    sketches must merge by elementwise register max — merging the
    per-type register tables must reproduce the union sketch exactly."""
    from big_data_training_spark.extensions.sketches import (
        sk_hll_estimate,
        sk_hll_registers,
    )

    for row in sk_hll_estimate(spark, sf_dir).collect():
        rel_err = abs(row.est_distinct - row.exact_distinct) / max(
            row.exact_distinct, 1
        )
        assert rel_err < 4 * 1.04 / 16, (row.event_type, rel_err)

    # union-merge property: max over per-type registers == registers of
    # the retyped union stream
    from big_data_training_spark.data import load_table

    merged = (
        sk_hll_registers(spark, sf_dir)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    ev = load_table(spark, sf_dir, "events")
    from big_data_training_spark.functions.hashing import hash60

    parts = ev.select(hash60(F.col("user_id").cast("string")).alias("h")).select(
        F.shiftright("h", 52).alias("bucket"),
        F.expr("h & %d" % ((1 << 52) - 1)).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin("w"))
    )
    direct = (
        parts.select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("register"))
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
