"""Distributed connected components over a pair graph.

The dedup pipeline's clustering step (group near-duplicate pairs into
components, keep one doc per component) needs transitive closure over
an edge set that, at 100 TB, no single executor can hold. Naive
min-label propagation needs one shuffle round per graph *diameter* —
fine for shallow near-dup clusters, pathological on chain-shaped
graphs. This module implements the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC '14), which converges in O(log² n) rounds regardless of
diameter, with every round expressed as plain DataFrame shuffles:

* **large-star**: every node connects its *larger* neighbors to the
  minimum of its neighborhood (including itself);
* **small-star**: every node connects its *smaller-or-equal* neighbors
  (and itself) to the minimum among them.

Edges are kept canonical ``(hi, lo)`` with ``hi > lo`` — both stars
only ever emit child→smaller-parent edges, so the invariant is free.
At the fixed point the edge set is a star forest: every node points
directly at its component's minimum id.

Per-round lineage is truncated with ``lineage.truncate_lineage`` —
without it the plan tree doubles per iteration and the driver, not the
cluster, becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_training_spark.lineage import truncate_lineage


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect each node's larger neighbors to its neighborhood min."""
    nbr = edges.select("hi", "lo").union(
        edges.select(F.col("lo").alias("hi"), F.col("hi").alias("lo"))
    ).select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    # m(u) = min(Γ(u) ∪ {u}); least(u, min(v)) in one partial-agg pass.
    mins = nbr.groupBy("u").agg(
        F.least(F.col("u"), F.min("v")).alias("m")
    )
    # emit (v, m) for every neighbor v > u; v > u ≥ m ⇒ canonical, no
    # self-loops possible. Duplicates are left for the small-star
    # terminal distinct — its min-agg is duplicate-insensitive, and
    # skipping the intermediate distinct saves a shuffle per round.
    return (
        nbr.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect each node and its smaller neighbors to their min."""
    # canonical (hi, lo) already means lo ∈ Γ<(hi): no symmetric pass.
    mins = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    rewired = (
        edges.join(mins, "hi")
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    )
    self_edge = mins.select(F.col("hi"), F.col("m").alias("lo"))
    return rewired.union(self_edge).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "doc_i",
    dst: str = "doc_j",
    max_rounds: int = 40,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id of its connected component.

    Returns ``(node, comp)``. Raises ``RuntimeError`` if the edge set
    has not reached a fixed point after ``max_rounds`` alternations —
    unconverged labels are silently-wrong labels, and 40 rounds covers
    any graph to ~2^40 nodes at the algorithm's O(log² n) bound.
    """
    edges = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("hi"),
            F.least(F.col(src), F.col(dst)).cast("long").alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .transform(truncate_lineage)
    )
    n_edges = edges.count()
    for _ in range(max_rounds):
        # truncate_lineage per round: bounds lineage AND makes the
        # convergence compare read materialized blocks, not recompute.
        new_edges = _small_star(_large_star(edges)).transform(truncate_lineage)
        n_new = new_edges.count()
        # Cheap check first: a count change is definitely not a fixed
        # point; only when counts agree is the exact set-compare run
        # (both sides are materialized distinct sets, so equal counts +
        # empty difference ⇔ equal sets).
        changed = n_new != n_edges or (
            new_edges.exceptAll(edges).limit(1).count() > 0
        )
        edges, n_edges = new_edges, n_new
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixed point after {max_rounds} rounds"
        )
    # Fixed point is a star forest: (hi → component min) plus the roots.
    # min() instead of distinct() as a belt-and-braces guard: a node can
    # only carry one parent at a true fixed point, and if it somehow
    # carried two the smaller is the component id.
    return (
        edges.select(F.col("hi").alias("node"), F.col("lo").alias("comp"))
        .union(edges.select(F.col("lo").alias("node"), F.col("lo").alias("comp")))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )
