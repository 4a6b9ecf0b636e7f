"""The remaining Python-execution API flavors: iterator pandas UDF
(amortized per-partition setup) and mapInArrow (zero-pandas
RecordBatch processing).

functions/udfs.py covers SCALAR pandas UDFs, grouped-map, grouped-agg
and the UDTF; mapInPandas carries the shingling hot path. Two flavors
remain in the PySpark execution surface and both exist for a reason a
100 TB pipeline cares about:

* **SCALAR_ITER** (Iterator[Series] → Iterator[Series]): the UDF sees
  the whole partition as a stream of Arrow batches, so expensive setup
  (model deserialization, tokenizer load — here a stand-in linear
  model) runs ONCE per partition instead of once per batch. This is
  the canonical ML-scoring shape (T5's vectorized cousin; the
  reference's ML-scoring ProcessFunction, flink/README.md:29-62).
* **mapInArrow** (Iterator[RecordBatch] → Iterator[RecordBatch]):
  skips the pandas layer entirely — no copy into Series, no index, no
  NaN coercions; pyarrow.compute kernels run on the Arrow buffers
  Spark already shipped. The cheapest Python path that exists when
  pandas semantics are not needed.

Both queries are integer-exact (floor-scaled linear scores / cents)
so the DuckDB oracle hashes bit-for-bit; the Python path must agree
with pure SQL arithmetic, which is itself the test that the batch
boundary handling (empty batches, partition splits) is sound.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

# the "model": integer weights applied to (quantity, discount-permille)
_W_QTY, _W_DISC, _BIAS = 37, -11, 500


@register(
    "u9_scalar_iter_scoring",
    f"""
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum({_W_QTY} * CAST(l_quantity AS BIGINT)
                    + {_W_DISC} * CAST(round(l_discount * 1000) AS BIGINT)
                    + {_BIAS}) AS BIGINT) AS score_sum,
           CAST(max({_W_QTY} * CAST(l_quantity AS BIGINT)
                    + {_W_DISC} * CAST(round(l_discount * 1000) AS BIGINT)
                    + {_BIAS}) AS BIGINT) AS score_max
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
    doc="SCALAR_ITER pandas UDF: per-partition amortized model load,"
    " batched Arrow scoring — aggregate of the integer scores matches"
    " pure-SQL arithmetic",
)
def u9_scalar_iter_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The amortized-setup scoring shape: an iterator pandas UDF
    'loads the model' once when the partition's batch stream opens
    (here: materializing the weight vector; in production: ONNX/
    tokenizer deserialization measured in seconds) and then scores
    every Arrow batch vectorized. The aggregate of the scores is
    compared against the same linear form written in pure SQL — the
    proof that batching, batch boundaries and the iterator protocol
    add or drop nothing. Integer features (quantity, discount in
    permille) keep the comparison exact."""

    @F.pandas_udf(LongType())
    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        weights = {"qty": _W_QTY, "disc": _W_DISC, "bias": _BIAS}  # "load"
        for pdf in batches:
            yield (
                weights["qty"] * pdf["qty"].astype("int64")
                + weights["disc"] * pdf["disc"].astype("int64")
                + weights["bias"]
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
        F.expr("CAST(round(l_discount * 1000) AS BIGINT)").alias("disc"),
    )
    scored = li.withColumn(
        "s", score(F.struct("qty", "disc"))
    )
    return (
        scored.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("s").cast("bigint").alias("score_sum"),
            F.max("s").cast("bigint").alias("score_max"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "u10_map_in_arrow",
    """
    SELECT l_linestatus,
           count(*) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS BIGINT) AS net_scaled
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
    doc="mapInArrow: RecordBatch-native net-price computation with"
    " pyarrow.compute kernels (no pandas layer), aggregate matches"
    " pure-SQL arithmetic",
)
def u10_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zero-pandas Python path: mapInArrow hands the task its
    Arrow RecordBatches as-is and pyarrow.compute kernels produce the
    output batch — no Series construction, no index bookkeeping, no
    NaN coercion surprises. Used here for an integer net-price
    product whose aggregate must equal the pure-SQL form; used in
    production wherever Python is unavoidable but the work is
    columnar (codec shims, custom binary decoders — the multimodal
    parsers would be the next customers). Arrow-level rounding of the
    price/discount uses round-half-even? No — the values are scaled
    AND rounded JVM-side before the UDF, so the Python stage only
    multiplies integers and batch arithmetic cannot drift."""
    import pyarrow as pa

    def net(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for b in batches:
            if b.num_rows == 0:
                continue
            out = pc.multiply_checked(
                b.column(b.schema.get_field_index("cents")),
                pc.subtract_checked(
                    pa.scalar(100, pa.int64()),
                    b.column(b.schema.get_field_index("disc")),
                ),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index("l_linestatus")), out],
                ["l_linestatus", "net"],
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linestatus",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("disc"),
    )
    netted = li.mapInArrow(net, "l_linestatus string, net long")
    return (
        netted.groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("net").cast("bigint").alias("net_scaled"),
        )
        .orderBy("l_linestatus")
    )
