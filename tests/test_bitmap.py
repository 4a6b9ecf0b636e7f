"""Bitmap-index exactness: popcounted word algebra must equal the
COUNT(DISTINCT) truth it replaces — the whole point of the index is
answering set questions without re-scanning the log, not approximating
them."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.operators.bitmap import (
    ev_bitmap_audience_algebra,
    ev_bitmap_retention,
)


def test_bitmap_retention_equals_exact_distinct_overlap(spark, sf_dir):
    got = {
        (r.event_type, r.day): (r.n_users, r.n_users_next, r.n_retained)
        for r in ev_bitmap_retention(spark, sf_dir).collect()
    }
    assert got, "expected retention rows"
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    ).distinct()
    nxt = days.select(
        "event_type",
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        "user_id",
    )
    exact = {
        (r.event_type, r.day): r.n
        for r in days.join(nxt, ["event_type", "day", "user_id"])
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for key, (n_users, n_next, n_retained) in got.items():
        assert n_retained == exact.get(key, 0), key
        assert 0 <= n_retained <= min(n_users, n_next)


def test_bitmap_algebra_inclusion_exclusion(spark, sf_dir):
    rows = {
        r.audience: r.n_users
        for r in ev_bitmap_audience_algebra(spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < "2024-01-04"
    )

    def audience(t):
        return {
            r.user_id
            for r in events.filter(F.col("event_type") == t)
            .select("user_id")
            .distinct()
            .collect()
        }

    p, c, e = audience("purchase"), audience("click"), audience("error")
    assert rows["purchase AND click"] == len(p & c)
    assert rows["purchase OR click"] == len(p | c)
    assert rows["purchase AND NOT error"] == len(p - e)
    assert rows["(purchase OR click) AND NOT error"] == len((p | c) - e)
    # Inclusion-exclusion holds on the reported numbers alone.
    assert (
        rows["purchase OR click"]
        == len(p) + len(c) - rows["purchase AND click"]
    )
