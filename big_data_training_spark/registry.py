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


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return
    the full name → QuerySpec map."""
    # Imports are deferred so a failure in one extension module can be
    # diagnosed without hiding the whole registry.
    import big_data_training_spark.operators.relational  # noqa: F401
    import big_data_training_spark.operators.events  # noqa: F401
    import big_data_training_spark.operators.joins  # noqa: F401
    import big_data_training_spark.operators.compaction  # noqa: F401
    import big_data_training_spark.operators.dlq  # noqa: F401
    import big_data_training_spark.operators.partitioning  # noqa: F401
    import big_data_training_spark.operators.analytics  # noqa: F401
    import big_data_training_spark.operators.sources  # noqa: F401
    import big_data_training_spark.operators.cdc  # noqa: F401
    import big_data_training_spark.functions.udfs  # noqa: F401
    import big_data_training_spark.functions.text  # noqa: F401
    import big_data_training_spark.functions.json_codec  # noqa: F401
    import big_data_training_spark.extensions.dedup  # noqa: F401
    import big_data_training_spark.extensions.similarity  # noqa: F401
    import big_data_training_spark.extensions.multimodal  # noqa: F401
    import big_data_training_spark.extensions.textstats  # noqa: F401
    import big_data_training_spark.streaming.queries  # noqa: F401

    return dict(_REGISTRY)
