"""GROUPED_AGG pandas UDF: the custom-UDAF flavor of the U1 surface.

Separate module from functions/udfs.py purely for driver-slice
stability: udfs.py registers early (its queries sit inside the
pre-validated verification slice), so the round-5 addition registers
last, behind the never-certified backlog — the same convention every
round-4/5 module follows (see registry._OPERATOR_MODULES).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register


@F.pandas_udf(LongType())  # DataType object: a DDL string would need an
# active SparkContext to parse at import time (modules import session-free)
def _wavg_permille(qty: pd.Series, cents: pd.Series) -> int:
    """U1 GROUPED_AGG form: a custom aggregate whose partials arrive as
    Arrow column batches. Integer-exact: int64 products and sums, floor
    division at the end — so the SQL oracle reproduces it bit-for-bit
    (pandas float reductions would not)."""
    q = qty.astype("int64")
    c = cents.astype("int64")
    return int((1000 * int((q * c).sum())) // int(q.sum()))


@register(
    "u7_grouped_agg_wavg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST((1000 * sum(CAST(l_quantity AS BIGINT)
                            * CAST(floor(l_extendedprice * 100) AS BIGINT)))
                // sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS wavg_permille
    FROM lineitem GROUP BY 1, 2
    """,
    doc="U1 GROUPED_AGG pandas UDF: quantity-weighted mean price in"
    " exact permille-cents per (returnflag, linestatus)",
)
def u7_grouped_agg_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third pandas-UDF flavor (SCALAR=t5, GROUPED_MAP=u1/w3,
    GROUPED_AGG=here): Spark feeds each group's columns as Arrow
    batches and the UDF returns one scalar — the custom-UDAF shape for
    aggregates the built-ins lack. The weighted mean is computed in
    int64 cents so the result is engine-exact; at scale this is a
    single keyed shuffle with the UDF evaluated group-at-a-time (for
    algebraic aggregates prefer built-ins, which combine map-side —
    this surface is for genuinely custom math)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("long").alias("qty"),
            F.floor(F.col("l_extendedprice") * 100).alias("cents"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(_wavg_permille("qty", "cents").alias("wavg_permille"))
    )
