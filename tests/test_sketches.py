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
