"""Size-gated broadcast hints for aggregate-output lookup tables.

Catalyst never broadcasts the output of an aggregation on its own:
aggregate nodes carry no size estimate, so a node-sized degree table /
label vector / score vector built by ``groupBy`` always plans as a
shuffle join even when it is orders of magnitude smaller than the fact
side (measured in docs/SHUFFLE.md — hinting these cut the k-truss
support kernel 10.2s -> 3.0s and suite shuffle 657 -> 311 MB).

An *unconditional* ``F.broadcast`` is the opposite failure: past the
executor heap or Spark's 8 GB / 512M-row broadcast hard limits the job
dies at cluster scale. So every explicit hint goes through
:func:`broadcast_gate` — broadcast iff a known row-count bound is under
an env-tunable limit, shuffle otherwise. Callers derive the bound from
something cheap (a parquet metadata count of the dimension table the
keys come from, or an edge count the algorithm already computes per
round) — never a dedicated ``.count()`` job over a fact table.

The default limit models a node-sized lookup row at ~16 B broadcast
form: 4M rows ~= 64 MB per executor copy, the same budget as
extensions/truss.py's 8M-edge (~8 B/entry) gate.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_ROW_LIMIT = int(
    os.environ.get("SPARK_GRAFT_BROADCAST_ROW_LIMIT", str(4_000_000))
)


# (sf_dir, table) -> row count. Parquet count(*) is answered from row-
# group metadata (no column scan), but it is still a Spark job; caching
# amortizes it to once per table per session across the query catalog.
_COUNT_CACHE: dict[tuple[str, str], int] = {}


def table_count(spark, sf_dir: str, name: str) -> int:
    """Cached row count of a fixture table — the cheap bound callers
    hand to :func:`broadcast_gate` for dimension-derived lookups
    (filtered/projected/aggregated tables never exceed their source)."""
    key = (sf_dir, name)
    if key not in _COUNT_CACHE:
        from big_data_training_spark.data import load_table

        _COUNT_CACHE[key] = load_table(spark, sf_dir, name).count()
    return _COUNT_CACHE[key]


def broadcast_gate(
    n_rows: int | None, limit: int | None = None
) -> Callable[[DataFrame], DataFrame]:
    """Return ``F.broadcast`` iff ``n_rows`` is a known bound at or under
    ``limit`` (default :data:`BROADCAST_ROW_LIMIT`), else identity.

    Usage::

        bcast = broadcast_gate(n_nodes)
        big.join(bcast(node_sized_lookup), "node")

    ``n_rows=None`` (unknown size) always falls back to identity — the
    plan must stay valid when the caller cannot bound the table.
    """
    lim = BROADCAST_ROW_LIMIT if limit is None else limit
    if n_rows is not None and n_rows <= lim:
        return F.broadcast
    return lambda df: df
