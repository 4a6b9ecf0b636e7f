"""Borůvka MSF invariants: the distributed rounds must match a pure
union-find reimplementation EXACTLY (same total edge order, full
contraction per round) — this also proves the pointer-doubling depth
fully contracts every merge chain — and the accumulated forest must be
acyclic with monotone component counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.mst import (
    N_ROUNDS,
    gr_boruvka_msf_rounds,
)


def _weighted_edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_suppkey").alias("u"),
            (F.col("o_custkey") + 1_000_000).alias("v"),
        )
        .agg(
            F.expr("CAST(min(floor(l_extendedprice * 100)) AS BIGINT)")
            .alias("w")
        )
        .collect()
    )


def _boruvka_reference(edges, n_rounds):
    """Union-find Borůvka with the (w, u, v) total order and FULL
    contraction every round."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for e in edges:
        nodes.add(e.u)
        nodes.add(e.v)
    for n in nodes:
        parent[n] = n
    forest = set()
    out = []
    for _ in range(n_rounds):
        best: dict[int, tuple] = {}
        for e in edges:
            cu, cv = find(e.u), find(e.v)
            if cu == cv:
                continue
            key = (e.w, e.u, e.v)
            for c in (cu, cv):
                if c not in best or key < best[c]:
                    best[c] = key
        added_w = 0
        added = 0
        for key in set(best.values()):
            w, u, v = key
            if key not in forest:
                forest.add(key)
                added += 1
                added_w += w
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        comps = len({find(n) for n in nodes})
        out.append((comps, added, added_w))
    # the reference forest must itself be acyclic: edges == nodes - comps
    assert len(forest) == len(nodes) - out[-1][0]
    return out


def test_boruvka_matches_union_find(spark, sf_dir):
    edges = _weighted_edges(spark, sf_dir)
    expected = _boruvka_reference(edges, N_ROUNDS)
    got = gr_boruvka_msf_rounds(spark, sf_dir).collect()
    assert [r.round for r in got] == list(range(1, N_ROUNDS + 1))
    for row, (comps, added, added_w) in zip(got, expected):
        assert row.n_components == comps, f"round {row.round} components"
        assert row.edges_added == added, f"round {row.round} edges"
        assert row.weight_added_cents == added_w, f"round {row.round} weight"
    # component count must at least halve in round 1 and never increase
    n_nodes = len({e.u for e in edges} | {e.v for e in edges})
    assert got[0].n_components <= n_nodes // 2
    for a, b in zip(got, got[1:]):
        assert b.n_components <= a.n_components
