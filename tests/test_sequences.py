"""Identity checks for the sequence-analysis operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.operators.sequences import (
    ev_lifecycle_accounting,
    ev_streak_islands,
)


def test_streaks_account_for_every_user_day(spark, sf_dir):
    """Σ (len · n_streaks) must equal the distinct (user, day) count —
    islands partition the activity table exactly."""
    rows = ev_streak_islands(spark, sf_dir).collect()
    total = sum(r.streak_len * r.n_streaks for r in rows)
    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .count()
    )
    assert total == days


def test_growth_accounting_identity(spark, sf_dir):
    """new + retained + resurrected == weekly active users, every week."""
    rows = {r.wk: r for r in ev_lifecycle_accounting(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    actives = {
        r.wk: r.n
        for r in ev.select(
            "user_id",
            F.expr(
                "datediff(to_date(date_trunc('week', ts)), date'1970-01-01')"
                " div 7"
            ).alias("wk"),
        )
        .distinct()
        .groupBy("wk")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(rows) == set(actives)
    for wk, r in rows.items():
        assert r.n_new + r.n_retained + r.n_resurrected == actives[wk]
        assert r.n_churn_next <= actives[wk]
