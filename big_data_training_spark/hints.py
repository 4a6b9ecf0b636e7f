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
    # os.stat raises on a missing file (it never returns None) — let
    # that propagate; a vanished fixture is a caller bug.
    return tuple(
        (p, (st := os.stat(p)).st_size, st.st_mtime_ns) for p in paths
    )


# (table path, freshness-token) -> (rows, {column -> uncompressed
# bytes}, {dict-encoded binary columns}). Freshness is (path, size,
# mtime_ns) per part file so in-place fixture rewrites miss; the table
# path is in the key so two EMPTY directories (freshness ``()``) never
# alias one entry.
_FOOTER_CACHE: dict[tuple, tuple[int, dict[str, int], frozenset[str]]] = {}


def _footer_stats(path: str) -> tuple[int, dict[str, int], frozenset[str]]:
    """(row count, per-column uncompressed byte size, dictionary-encoded
    binary column names) from parquet footers only — pyarrow metadata
    read, no Spark job, no data scan."""
    paths = _parquet_paths(path)
    key = (path, _freshness(paths))
    if key not in _FOOTER_CACHE:
        import pyarrow.parquet as pq

        rows = 0
        col_bytes: dict[str, int] = {}
        dict_binary: set[str] = set()
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
                    # "uncompressed" footer size is POST-encoding: a
                    # dictionary-encoded string column's pages hold
                    # codes, not values, so decoded width can be far
                    # larger — flag it for table_bytes' decoded floor.
                    if c.physical_type in (
                        "BYTE_ARRAY",
                        "FIXED_LEN_BYTE_ARRAY",
                    ) and any("DICTIONARY" in e for e in c.encodings):
                        dict_binary.add(name)
        _FOOTER_CACHE[key] = (rows, col_bytes, frozenset(dict_binary))
    return _FOOTER_CACHE[key]


# (table path, freshness, column) -> measured decoded bytes/row from a
# one-row-group, one-column sample read (bounded: a single row group).
_DECODED_RATE_CACHE: dict[tuple, float] = {}


def _decoded_bytes_per_row(path: str, column: str) -> float:
    """Measured in-memory bytes/row for one column: pyarrow reads the
    FIRST row group of the FIRST part file only (bounded IO — one
    column chunk), and the Arrow buffer size per row extrapolates to
    the table. Used to floor dictionary-encoded string columns whose
    footer 'uncompressed' size undercounts decoded width."""
    paths = _parquet_paths(path)
    key = (path, _freshness(paths), column)
    if key not in _DECODED_RATE_CACHE:
        import pyarrow.parquet as pq

        # first part file with rows, not paths[0] blindly: an empty
        # leading part (zero row groups) would cache 0.0 and silently
        # no-op the decoded-width floor for the whole table
        rate = 0.0
        for p in paths:
            f = pq.ParquetFile(p)
            if f.metadata.num_row_groups == 0 or f.metadata.num_rows == 0:
                continue
            for rg in range(f.metadata.num_row_groups):
                if f.metadata.row_group(rg).num_rows > 0:
                    tbl = f.read_row_group(rg, columns=[column])
                    rate = tbl.nbytes / max(tbl.num_rows, 1)
                    break
            if rate > 0.0:
                break
        _DECODED_RATE_CACHE[key] = rate
    return _DECODED_RATE_CACHE[key]


def table_count(spark, sf_dir: str, name: str) -> int:
    """Row count of a fixture table from its parquet footer — the cheap
    bound callers hand to :func:`broadcast_gate` for dimension-derived
    lookups (filtered/projected/aggregated tables never exceed their
    source). No Spark job; cached per file (path, size, mtime)."""
    del spark  # kept in the signature for call-site uniformity
    rows, _, _ = _footer_stats(os.path.join(sf_dir, f"{name}.parquet"))
    return rows


def table_bytes(
    spark, sf_dir: str, name: str, columns: Sequence[str] | None = None
) -> int:
    """Estimated in-memory broadcast size of a fixture table: footer
    uncompressed column bytes (optionally only ``columns``) plus
    :data:`HASHED_RELATION_ROW_OVERHEAD` per row.

    Dictionary-encoded string/binary columns are floored at a MEASURED
    decoded bytes/row (one-row-group sample, :func:`_decoded_bytes_per_
    row`): the footer's "uncompressed" size for a dictionary column is
    the size of the code pages, so a highly repetitive wide string
    column can be far larger in HashedRelation form than the footer
    suggests — the exact over-admission this gate exists to prevent."""
    del spark
    path = os.path.join(sf_dir, f"{name}.parquet")
    rows, col_bytes, dict_binary = _footer_stats(path)
    if columns is None:
        cols = dict(col_bytes)
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
    for c in cols:
        if c in dict_binary:
            cols[c] = max(
                cols[c], int(rows * _decoded_bytes_per_row(path, c))
            )
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
