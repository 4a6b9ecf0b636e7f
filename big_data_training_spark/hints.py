"""Size-gated broadcast hints for lookup tables and dimensions.

Catalyst never broadcasts the output of an aggregation on its own:
aggregate nodes carry no size estimate, so a node-sized degree table /
label vector / score vector built by ``groupBy`` always plans as a
shuffle join even when it is orders of magnitude smaller than the fact
side (measured in docs/SHUFFLE.md — hinting these cut the k-truss
support kernel 10.2s -> 3.0s and suite shuffle 657 -> 311 MB).

An *unconditional* ``F.broadcast`` is the opposite failure: past the
executor heap or Spark's 8 GB / 512M-row broadcast hard limits the job
dies at cluster scale. So every explicit hint goes through a gate:
broadcast iff a known SIZE bound is under an env-tunable byte budget,
shuffle otherwise.

Two gates for two table shapes:

* :func:`broadcast_gate` — for aggregate-output lookups the caller can
  bound by row count (degree tables, label vectors: one key + one
  numeric, ~16 B in broadcast form). Gates on ``rows x row_bytes``
  against :data:`BROADCAST_BYTE_LIMIT` (64 MB default: 4M rows at the
  16 B node-lookup width, same budget as extensions/truss.py's
  8M-edge / ~8 B-entry gate).
* :func:`dim_gate` — for SF-scaled *dimension tables* (customer /
  supplier / part). A HashedRelation row for a wide dimension is ~100+
  B (columns + UnsafeRow + map-entry overhead), so a bare 4M-row gate
  would admit a ~400 MB broadcast — 6x the budget. ``dim_gate``
  estimates bytes from the parquet footer (uncompressed column sizes,
  no Spark job, no data scan) plus a per-row overhead constant, and
  gates on that. Full-row width is used even though column pruning
  narrows the actual exchange — conservative in the safe direction.

Footer reads are cached per (path, size, mtime) so a fixture directory
regenerated in place (scale/fixture tests do this) never reuses a stale
count or width.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Legacy row-count knob: kept as the source of the default byte budget
# (4M rows x 16 B node-lookup width = 64 MB) so existing deployments
# that tuned it keep their effective budget.
BROADCAST_ROW_LIMIT = int(
    os.environ.get("SPARK_GRAFT_BROADCAST_ROW_LIMIT", str(4_000_000))
)

BROADCAST_BYTE_LIMIT = int(
    os.environ.get(
        "SPARK_GRAFT_BROADCAST_BYTE_LIMIT", str(BROADCAST_ROW_LIMIT * 16)
    )
)

# Per-row broadcast overhead beyond the column payload: UnsafeRow
# header/offsets plus the HashedRelation map entry. Deliberately on the
# high side — the gate should under-admit, never over-admit.
HASHED_RELATION_ROW_OVERHEAD = 48

# Node-sized aggregate lookup (one long key + one numeric) in broadcast
# form; the historical width the 4M-row budget modeled.
NODE_LOOKUP_ROW_BYTES = 16


def _parquet_paths(path: str) -> list[str]:
    """A fixture 'table' is either one ``.parquet`` file or a directory
    of part files (Spark-written fixtures in scale tests)."""
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


def _freshness(paths: list[str]) -> tuple:
    return tuple(
        (p, st.st_size, st.st_mtime_ns)
        for p in paths
        if (st := os.stat(p)) is not None
    )


# freshness-token -> (rows, {column -> uncompressed bytes}). Keyed on
# (path, size, mtime_ns) per file so in-place fixture rewrites miss.
_FOOTER_CACHE: dict[tuple, tuple[int, dict[str, int]]] = {}


def _footer_stats(path: str) -> tuple[int, dict[str, int]]:
    """(row count, per-column uncompressed byte size) from parquet
    footers only — pyarrow metadata read, no Spark job, no data scan."""
    paths = _parquet_paths(path)
    key = _freshness(paths)
    if key not in _FOOTER_CACHE:
        import pyarrow.parquet as pq

        rows = 0
        col_bytes: dict[str, int] = {}
        for p in paths:
            md = pq.ParquetFile(p).metadata
            rows += md.num_rows
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    # root field name: footer paths are dotted for
                    # nested columns; the root is what a reader prunes.
                    name = c.path_in_schema.split(".")[0]
                    col_bytes[name] = (
                        col_bytes.get(name, 0) + c.total_uncompressed_size
                    )
        _FOOTER_CACHE[key] = (rows, col_bytes)
    return _FOOTER_CACHE[key]


def table_count(spark, sf_dir: str, name: str) -> int:
    """Row count of a fixture table from its parquet footer — the cheap
    bound callers hand to :func:`broadcast_gate` for dimension-derived
    lookups (filtered/projected/aggregated tables never exceed their
    source). No Spark job; cached per file (path, size, mtime)."""
    del spark  # kept in the signature for call-site uniformity
    rows, _ = _footer_stats(os.path.join(sf_dir, f"{name}.parquet"))
    return rows


def table_bytes(
    spark, sf_dir: str, name: str, columns: Sequence[str] | None = None
) -> int:
    """Estimated in-memory broadcast size of a fixture table: footer
    uncompressed column bytes (optionally only ``columns``) plus
    :data:`HASHED_RELATION_ROW_OVERHEAD` per row."""
    del spark
    rows, col_bytes = _footer_stats(os.path.join(sf_dir, f"{name}.parquet"))
    if columns is None:
        cols = col_bytes
    else:
        unknown = [c for c in columns if c not in col_bytes]
        if unknown:
            # a typo'd column would silently contribute 0 bytes and
            # under-gate the broadcast — fail loudly instead
            raise ValueError(
                f"{name}: columns {unknown} not in parquet footer "
                f"(have {sorted(col_bytes)})"
            )
        cols = {c: col_bytes[c] for c in columns}
    return sum(cols.values()) + rows * HASHED_RELATION_ROW_OVERHEAD


def broadcast_gate(
    n_rows: int | None,
    limit: int | None = None,
    row_bytes: int = NODE_LOOKUP_ROW_BYTES,
) -> Callable[[DataFrame], DataFrame]:
    """Return ``F.broadcast`` iff ``n_rows`` is a known bound whose
    estimated broadcast size ``n_rows * row_bytes`` fits
    :data:`BROADCAST_BYTE_LIMIT`, else identity.

    ``limit`` (rows) overrides the byte math for callers whose own
    budget already models a width (extensions/truss.py's 8M-edge /
    ~8 B-entry gate). The default ``row_bytes`` models a node-sized
    aggregate lookup; wide SF-scaled dimensions must NOT use this
    default — use :func:`dim_gate`, which measures width from the
    parquet footer.

    Usage::

        bcast = broadcast_gate(n_nodes)
        big.join(bcast(node_sized_lookup), "node")

    ``n_rows=None`` (unknown size) always falls back to identity — the
    plan must stay valid when the caller cannot bound the table.
    """
    if n_rows is None:
        return lambda df: df
    ok = (
        n_rows <= limit
        if limit is not None
        else n_rows * row_bytes <= BROADCAST_BYTE_LIMIT
    )
    return F.broadcast if ok else (lambda df: df)


def dim_gate(
    spark, sf_dir: str, name: str, columns: Sequence[str] | None = None
) -> Callable[[DataFrame], DataFrame]:
    """Broadcast gate for an SF-scaled dimension table: broadcast iff
    the footer-estimated size (:func:`table_bytes`, optionally only the
    ``columns`` the join keeps) fits :data:`BROADCAST_BYTE_LIMIT`.

    Unlike a bare row-count gate this accounts for row WIDTH: a 4M-row
    customer table is ~400 MB in HashedRelation form and must shuffle,
    while 4M narrow lookup rows (~64 MB) may broadcast.
    """
    est = table_bytes(spark, sf_dir, name, columns)
    return F.broadcast if est <= BROADCAST_BYTE_LIMIT else (lambda df: df)
