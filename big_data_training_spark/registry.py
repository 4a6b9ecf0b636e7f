"""Query registry: every implemented operator from SURVEY.md §2 registers a
named query (PySpark callable) and, where SQL-expressible, a DuckDB oracle.

The driver contract (``__spark_entry__.py``) is assembled from this
registry. Column names are aliased identically on both sides because the
comparison hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One verifiable operator-query.

    ``oracle`` is ANSI SQL executable by DuckDB against the fixture views;
    None marks a genuinely non-SQL-expressible op (driver falls back to a
    rows-only check). ``bench`` marks queries included in bench.py.
    """

    fn: QueryFn
    oracle: str | None
    doc: str = ""
    bench: bool = False


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, doc: str = "", bench: bool = False
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", bench=bench)
        return fn

    return deco


_OPERATOR_MODULES = (
    "operators.relational",
    "operators.events",
    "operators.joins",
    "operators.compaction",
    "operators.dlq",
    "operators.partitioning",
    "operators.analytics",
    "operators.temporal",
    "operators.multidim",
    "operators.sources",
    "operators.cdc",
    "operators.maintenance",
    "functions.udfs",
    "functions.text",
    "functions.json_codec",
    "functions.wire_codecs",
    "extensions.dedup",
    "extensions.curation",
    "extensions.graph",
    "extensions.similarity",
    "extensions.sketches",
    "extensions.multimodal",
    "extensions.textstats",
    "streaming.queries",
)

import_errors: dict[str, str] = {}


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return
    the full name → QuerySpec map.

    Imports are isolated per module: one broken module forfeits its own
    queries (recorded in ``import_errors``, asserted empty by the test
    suite) instead of zeroing the whole registry for the driver.
    """
    import importlib
    import traceback

    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(f"big_data_training_spark.{mod}")
        except Exception:
            import_errors[mod] = traceback.format_exc()

    return dict(_REGISTRY)
