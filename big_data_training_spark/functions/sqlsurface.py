"""Modern SQL scalar/array surface — lambda (higher-order) array
functions, TRY_ arithmetic, regexp_extract_all, sequence generation,
bitwise aggregates, split_part.

The reference's transformation catalog (T1/T2 map/flatMap,
flink/README.md:29-62; F5 split/tokenize, kafka/README.md:183) leans on
per-record lambdas; Spark's JVM-side equivalents are the higher-order
array functions (transform/filter/aggregate) and the modern scalar
surface (try_divide/try_add, split_part, regexp_extract_all). Each
query here exercises one family end-to-end against a DuckDB twin so
the engine's per-record lambda surface is oracle-certified, not just
available.

Scale notes: every query is a single scan + one keyed aggregation; the
array lambdas run inside whole-stage codegen (no Python), and the
per-order arrays are bounded by order size (≤7 lineitems), never by
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register


@register(
    "f_higher_order_arrays",
    """
    WITH arr AS (
        SELECT l_orderkey,
               list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
        FROM lineitem GROUP BY 1
    )
    SELECT l_orderkey,
           CAST(len(qs) AS BIGINT) AS n_items,
           CAST(len(list_filter(qs, x -> x >= 25)) AS BIGINT) AS n_large,
           CAST(list_reduce(qs, (a, x) -> a + x) AS BIGINT) AS total_qty,
           CAST(list_reduce(list_transform(qs, x -> x * x),
                            (a, x) -> a + x) AS BIGINT) AS sum_sq
    FROM arr WHERE l_orderkey % 97 = 0
    """,
    doc="higher-order array lambdas: transform/filter/aggregate over"
    " per-order quantity arrays, JVM-side (no UDF)",
)
def f_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2-style per-record lambdas as JVM higher-order functions:
    collect each order's integer quantities (sorted array — a
    deterministic multiset encoding), then filter/transform/aggregate
    entirely inside codegen. The fold is sequential over the sorted
    array, so the integer sums are order-fixed and exact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("bigint").alias("q")
    )
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("q")).alias("qs")
    )
    return arr.filter(F.col("l_orderkey") % 97 == 0).select(
        "l_orderkey",
        F.size("qs").cast("bigint").alias("n_items"),
        F.expr("size(filter(qs, x -> x >= 25))")
        .cast("bigint")
        .alias("n_large"),
        F.expr("aggregate(qs, 0L, (a, x) -> a + x)").alias("total_qty"),
        F.expr(
            "aggregate(transform(qs, x -> x * x), 0L, (a, x) -> a + x)"
        ).alias("sum_sq"),
    )


@register(
    "f_try_arithmetic",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (
               WHERE (value / nullif(user_id % 5, 0)) IS NULL
           ) AS BIGINT) AS n_div_null,
           CAST(count(*) FILTER (
               WHERE TRY_CAST(props AS INT) IS NULL
           ) AS BIGINT) AS n_cast_null,
           CAST(count(*) FILTER (
               WHERE user_id > 0
           ) AS BIGINT) AS n_add_overflow
    FROM events GROUP BY 1
    """,
    doc="TRY_ arithmetic: try_divide/try_cast/try_add nulls instead of"
    " job-killing exceptions, counted per event type",
)
def f_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The E1-adjacent error-tolerance surface for ARITHMETIC: at
    100 TB one malformed row must not fail the stage, so division by
    zero, unparsable casts, and bigint overflow are TRY_-variants
    yielding NULL. The oracle models each NULL condition explicitly
    (DuckDB errors on real overflow, so the overflow leg is the
    documented predicate try_add(MAX_LONG, user_id) IS NULL ⇔
    user_id > 0 on nonnegative ids)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.count_if(
            F.expr("try_divide(value, CAST(user_id % 5 AS DOUBLE))").isNull()
        ).alias("n_div_null"),
        F.count_if(F.expr("try_cast(props AS INT)").isNull()).alias(
            "n_cast_null"
        ),
        F.count_if(
            F.expr("try_add(9223372036854775807L, user_id)").isNull()
        ).alias("n_add_overflow"),
    )


@register(
    "f_regexp_extract_all",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS BIGINT)
               AS n_long_words,
           regexp_extract_all(text, '[a-z]{7,}')[1] AS first_long
    FROM documents WHERE doc_id % 31 = 0
    """,
    doc="regexp_extract_all: all matches per row as an array (count +"
    " first), Java regex vs RE2 agreeing on the simple class",
)
def f_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5's tokenize generalized to all-match extraction: every run of
    7+ lowercase letters per document. Greedy {7,} is leftmost-longest
    in both Java regex and RE2 for this pattern, so the arrays agree
    element-for-element; `try_element_at(..., 1)` is NULL on no-match
    (ANSI-safe — plain element_at THROWS on an empty array under
    Spark 4's default ANSI mode), matching DuckDB's NULL on
    out-of-range list[1]."""
    docs = load_table(spark, sf_dir, "documents")
    # group index 0 = the whole match (Spark defaults to group 1 and
    # errors when the pattern has no capture group; DuckDB defaults to 0)
    hits = F.expr("regexp_extract_all(text, '[a-z]{7,}', 0)")
    return docs.filter(F.col("doc_id") % 31 == 0).select(
        "doc_id",
        F.size(hits).cast("bigint").alias("n_long_words"),
        F.try_element_at(hits, F.lit(1)).alias("first_long"),
    )


@register(
    "f_sequence_explode",
    """
    SELECT inst,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(p_partkey) AS BIGINT) AS key_sum
    FROM (
        SELECT p_partkey,
               unnest(generate_series(1, least(p_size, 10))) AS inst
        FROM part
    ) GROUP BY 1
    """,
    doc="sequence() + explode: per-row integer series generation"
    " (installments 1..min(size,10)), regrouped exactly",
)
def f_sequence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 flatMap where the fan-out is GENERATED, not parsed: each part
    emits one row per installment 1..min(p_size, 10) via
    sequence()+explode (JVM-side, no UDF), then a keyed integer
    aggregate proves the generated multiplicities exactly."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("p_size"), F.lit(10)))
            ).alias("inst"),
        )
        .groupBy(F.col("inst").cast("bigint").alias("inst"))
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("p_partkey").alias("key_sum"),
        )
    )


@register(
    "f_bitwise_agg",
    """
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS all_and,
           CAST(bit_or(user_id) AS BIGINT) AS any_or,
           CAST(bit_xor(user_id) AS BIGINT) AS parity_xor,
           CAST(count(DISTINCT user_id % 64) AS BIGINT) AS n_low6
    FROM events GROUP BY 1
    """,
    doc="bitwise aggregates (bit_and/bit_or/bit_xor) per key — the"
    " flag-mask rollup surface",
)
def f_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate surface: AND/OR/XOR folds over user ids per
    event type (flag-mask rollups; XOR doubles as a parity check).
    All three are order-free integer folds — map-side combinable,
    exact in any engine."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("bit_and(user_id)").alias("all_and"),
        F.expr("bit_or(user_id)").alias("any_or"),
        F.expr("bit_xor(user_id)").alias("parity_xor"),
        F.countDistinct(F.expr("user_id % 64")).alias("n_low6"),
    )


@register(
    "f_split_part",
    """
    SELECT split_part(p_type, ' ', 2) AS type_mid,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(min(p_partkey) AS BIGINT) AS min_key,
           CAST(max(p_partkey) AS BIGINT) AS max_key
    FROM part GROUP BY 1
    """,
    doc="split_part field extraction (delimited-field parsing without"
    " a full split array), grouped exactly",
)
def f_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 tokenize specialized to positional field extraction:
    split_part picks the Nth delimited field without materializing the
    split array — the common log/typed-string parse. Identical
    1-indexed, empty-on-missing semantics in Spark and DuckDB."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy(
        F.expr("split_part(p_type, ' ', 2)").alias("type_mid")
    ).agg(
        F.count("*").alias("n_parts"),
        F.min("p_partkey").alias("min_key"),
        F.max("p_partkey").alias("max_key"),
    )
