"""Multimodal training-batch planning on top of the real header
parsers: ViT-style patch grids from parsed image dimensions.

Builds on extensions/multimodal.py's byte-level PNG/JPEG parser (the
decode path), so the plan numbers come from the actual container
arithmetic, not from trusted metadata; the oracle recomputes the same
closed-form dimensions the synthesizer used — a parser regression
hash-mismatches here too. Registered in a late module so the driver's
pre-validated verification slice keeps its composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.extensions.multimodal import mm_image_header_parse
from big_data_training_spark.registry import register

PATCH = 16  # ViT-Base patch edge, pixels


@register(
    "mm_patch_plan",
    f"""
    WITH dims AS (
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
               (n_chars % 640) + 1 AS w,
               (doc_id % 480) + 1 AS h
        FROM documents
    ),
    per_img AS (
        SELECT fmt, w, h,
               (w + {PATCH} - 1) // {PATCH} AS px,
               (h + {PATCH} - 1) // {PATCH} AS py
        FROM dims
    )
    SELECT fmt,
           count(*) AS n_images,
           CAST(sum(px * py) AS BIGINT) AS total_patches,
           CAST(sum(px * py) // count(*) AS BIGINT) AS avg_patches_per_image,
           CAST(sum(px * {PATCH} * py * {PATCH} - w * h) AS BIGINT)
               AS pad_pixels,
           CAST(sum(px * {PATCH} * py * {PATCH} - w * h) * 1000
                // sum(px * {PATCH} * py * {PATCH}) AS BIGINT)
               AS pad_permille
    FROM per_img
    GROUP BY 1
    """,
    doc=f"ViT batch planning: {PATCH}px patch-grid sizes and padding"
    " waste per image format, from real header-parsed dimensions",
)
def mm_patch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long are the image 'token' sequences? Patch count per image
    (ceil-divided grid) is the multimodal analog of token counting —
    it sizes ViT sequence lengths and the padding wasted by snapping
    ragged dimensions up to the patch grid. Dimensions come from the
    byte-level header parse (mapInPandas over the synthesized
    containers), then pure integer column arithmetic; one aggregation
    per format. At 100 TB the parse is the scan and the plan is free."""
    dims = mm_image_header_parse(spark, sf_dir)
    per_img = dims.select(
        "fmt",
        F.col("width").cast("bigint").alias("w"),
        F.col("height").cast("bigint").alias("h"),
    ).select(
        "fmt",
        "w",
        "h",
        F.expr(f"(w + {PATCH} - 1) div {PATCH}").alias("px"),
        F.expr(f"(h + {PATCH} - 1) div {PATCH}").alias("py"),
    )
    padded = F.col("px") * PATCH * F.col("py") * PATCH
    return per_img.groupBy("fmt").agg(
        F.count("*").alias("n_images"),
        F.sum(F.col("px") * F.col("py")).cast("bigint").alias("total_patches"),
        F.expr("sum(px * py) div count(*)")
        .cast("bigint")
        .alias("avg_patches_per_image"),
        F.sum(padded - F.col("w") * F.col("h"))
        .cast("bigint")
        .alias("pad_pixels"),
        F.expr(
            f"sum(px * {PATCH} * py * {PATCH} - w * h) * 1000"
            f" div sum(px * {PATCH} * py * {PATCH})"
        )
        .cast("bigint")
        .alias("pad_permille"),
    )


SHARD_BYTES = 1 << 16  # 64 KiB shards at fixture scale (1 GiB in prod)
REC_OVERHEAD = 512  # tar-style per-record header bytes
PREFIX_BUCKET = 1000  # docs per prefix-sum bucket


@register(
    "mm_shard_manifest",
    f"""
    WITH sized AS (
        SELECT doc_id, source, n_chars + {REC_OVERHEAD} AS rec_bytes
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, rec_bytes,
               sum(rec_bytes) OVER (ORDER BY doc_id) - rec_bytes AS cum_before
        FROM sized
    )
    SELECT CAST(cum_before // {SHARD_BYTES} AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(rec_bytes) AS BIGINT) AS shard_bytes,
           count(DISTINCT source) AS n_sources,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM cum GROUP BY 1
    """,
    doc="WebDataset-style shard packing: ingest-ordered exclusive prefix"
    f" sum of record bytes cut into {SHARD_BYTES}-byte shards; per-shard"
    " doc count, bytes, source mix, id range",
)
def mm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest a sequential training loader reads: records packed
    into fixed-byte shards in ingest order (WebDataset/tar semantics —
    a record belongs to the shard its START byte falls in). The prefix
    sum is computed DISTRIBUTED, not with a single global window: bucket
    by doc_id div PREFIX_BUCKET, per-bucket subtotals (one small
    aggregate), a driver-scale running offset over buckets, then a
    per-bucket ordered window — so no stage ever sees more than a
    bucket in one partition, the two-pass prefix-sum every shard writer
    uses at 100 TB. The oracle states the same packing as one global
    running sum; their hash equality is the proof the decomposition is
    exact."""
    from big_data_training_spark.data import load_table as _lt
    from pyspark.sql import Window

    docs = _lt(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        (F.col("n_chars") + REC_OVERHEAD).alias("rec_bytes"),
        F.expr(f"doc_id div {PREFIX_BUCKET}").alias("bucket"),
    )
    boff = (
        sized.groupBy("bucket")
        .agg(F.sum("rec_bytes").alias("bsum"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("bsum").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    cum = (
        sized.withColumn(
            "local_before",
            F.coalesce(
                F.sum("rec_bytes").over(
                    Window.partitionBy("bucket")
                    .orderBy("doc_id")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .join(F.broadcast(boff), "bucket")
        .withColumn("cum_before", F.col("offset") + F.col("local_before"))
    )
    return cum.groupBy(
        F.expr(f"cum_before div {SHARD_BYTES}").cast("bigint").alias("shard_id")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("rec_bytes").cast("bigint").alias("shard_bytes"),
        F.countDistinct("source").alias("n_sources"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    )
