"""The union-window as-of join's two claims: PIT correctness against a
brute-force range-join reference, and a join-free physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.operators.temporal_pit import (
    _FACT_TYPE,
    _STATUS_TYPES,
    j_pit_union_asof,
)


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pit_plan_has_no_join(spark, sf_dir):
    plan = physical_plan(j_pit_union_asof(spark, sf_dir))
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan, op
    # One scan, one keyed window — the tagging is a CASE projection,
    # so there is not even a Union: strictly one pass over the log.
    assert "Window" in plan


def test_pit_matches_bruteforce_range_join(spark, sf_dir):
    """Ground truth the slow way: for every purchase, the status event
    with the greatest (ts, event_id) at-or-before it."""
    events = load_table(spark, sf_dir, "events")
    facts = [
        (r.user_id, r.ts, r.event_id, int(r.value * 100 // 1))
        for r in events.filter(F.col("event_type") == _FACT_TYPE).collect()
    ]
    status = {}
    for r in events.filter(F.col("event_type").isin(list(_STATUS_TYPES))).collect():
        status.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    import math

    agg: dict[str, list] = {}
    for user, ts, eid, _cents in facts:
        best = None
        for sts, sid, stype in status.get(user, []):
            if (sts, 0, sid) <= (ts, 1, math.inf) and sts <= ts:
                if best is None or (sts, sid) > best[:2]:
                    best = (sts, sid, stype)
        key = best[2] if best else "never_set"
        a = agg.setdefault(key, [0, 0, set()])
        a[0] += 1
        a[2].add(user)
    got = {
        r.status_at_purchase: (r.n_purchases, r.n_users)
        for r in j_pit_union_asof(spark, sf_dir).collect()
    }
    want = {k: (v[0], len(v[2])) for k, v in agg.items()}
    assert got == want
