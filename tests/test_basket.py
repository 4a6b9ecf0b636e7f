"""Market-basket invariants: pair counts must agree with a brute-force
set intersection, rule math must be internally consistent (support /
confidence / lift identities), and the plan must stay bounded — the
marginals broadcast, the only shuffle keyed by basket."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.basket import (
    MIN_PAIR_SUPPORT,
    TOPK_SIMILAR,
    _baskets,
    mb_assoc_rules,
    mb_brand_pairs,
    mb_item_jaccard_topk,
)


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _brute_pairs(spark, sf_dir):
    """Per-basket item sets in the driver (sf0.001 only), exact pair
    counts by enumeration."""
    rows = _baskets(spark, sf_dir).collect()
    baskets: dict[int, set[str]] = {}
    for r in rows:
        baskets.setdefault(r.basket_id, set()).add(r.item)
    counts: dict[tuple[str, str], int] = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return baskets, counts


def test_pair_counts_match_bruteforce(spark, sf_dir):
    baskets, brute = _brute_pairs(spark, sf_dir)
    got = {
        (r.item_a, r.item_b): r.pair_count
        for r in mb_brand_pairs(spark, sf_dir).collect()
    }
    expected = {k: v for k, v in brute.items() if v >= MIN_PAIR_SUPPORT}
    assert got == expected
    n = len(baskets)
    for r in mb_brand_pairs(spark, sf_dir).collect():
        assert r.support_permille == r.pair_count * 1000 // n


def test_rule_identities(spark, sf_dir):
    """Every rule a=>b must have a mirror b=>a with the same pair count
    and the same lift (lift is symmetric); confidence differs by the
    marginal ratio."""
    rules = mb_assoc_rules(spark, sf_dir).collect()
    by_dir = {(r.antecedent, r.consequent): r for r in rules}
    marg = {
        r.item: r.c
        for r in _baskets(spark, sf_dir)
        .groupBy("item")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert rules, "no rules above support threshold"
    for (a, b), r in by_dir.items():
        mirror = by_dir[(b, a)]
        assert mirror.pair_count == r.pair_count
        assert mirror.lift_micro == r.lift_micro
        assert r.confidence_permille == r.pair_count * 1000 // marg[a]


def test_jaccard_topk_bounds(spark, sf_dir):
    rows = mb_item_jaccard_topk(spark, sf_dir).collect()
    per_item: dict[str, list] = {}
    for r in rows:
        per_item.setdefault(r.item, []).append(r)
    for item, rs in per_item.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOPK_SIMILAR
        sims = [r.jaccard_permille for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(0 <= s <= 1000 for s in sims)


def test_marginals_broadcast_not_shuffled(spark, sf_dir):
    """The item-marginal and basket-count joins must be broadcasts;
    the basket self-join may shuffle (keyed by basket) but never
    sort-merge on the tiny side."""
    plan = physical_plan(mb_assoc_rules(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row basket count
