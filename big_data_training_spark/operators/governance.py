"""Data-governance and physical-layout audits: k-anonymity risk,
zone-map pruning effectiveness, and sequence-padding waste.

The reference's pipeline story (README.md:18-22, collect → store →
process) leaves two questions every 100 TB deployment must answer
about the "store" stage — *is the data safe to share* and *is the
layout worth scanning* — plus one the training-prep stage must answer
about sequence batching. All three are single-pass integer-exact
aggregate reports:

* **k-anonymity** — group rows by their quasi-identifier tuple and
  count equivalence classes smaller than k: the standard
  re-identification risk audit run before a corpus (or its metadata)
  is released. One shuffle on the QID, then a few-hundred-row class
  table is re-aggregated per k threshold.
* **Zone-map pruning audit** — simulate per-file min/max statistics
  (the parquet row-group / Iceberg manifest mechanism) under two
  physical layouts — ingest order vs date-clustered — and measure how
  many files a time-range predicate could skip in each. This is the
  quantitative case for clustering: on uncorrelated ingest order the
  zone maps prune ~nothing; binned by month they prune almost
  everything outside the window.
* **Padding waste** — bucket documents by token length and report the
  tokens lost to padding at a fixed sequence length vs padding to the
  bucket top (the length-bucketed batching trick), plus tokens lost to
  truncation: the report that motivates sequence packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

K_THRESHOLDS = (2, 5, 10, 20)
QID_CHAR_BUCKET = 64  # n_chars coarsened to 64-char buckets

ZONE_ORDERKEYS_PER_FILE = 256  # ingest-order files: ~1k rows each
ZONE_LO = "1998-06-01"
ZONE_HI = "1998-07-01"  # half-open [LO, HI)

SEQ_LEN = 2048
LEN_BUCKET = 64


@register(
    "dq_k_anonymity",
    f"""
    WITH cls AS (
        SELECT lang, source, n_chars // {QID_CHAR_BUCKET} AS b,
               count(*) AS n
        FROM documents GROUP BY 1, 2, 3
    )
    SELECT k,
           CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
               AS n_classes_below,
           CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk
    FROM cls, (VALUES {", ".join(f"({k})" for k in K_THRESHOLDS)}) AS ks(k)
    GROUP BY k
    """,
    doc="privacy: k-anonymity audit over (lang, source, length-bucket)"
    " quasi-identifiers at several k thresholds",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk report: every document's quasi-identifier
    is (lang, source, n_chars bucketed to 64); an equivalence class
    smaller than k means those rows are distinguishable among fewer
    than k peers. One shuffle builds the class-size table; the per-k
    report is a conditional re-aggregate of that (small) table — the
    threshold list multiplies class rows, never data rows, so the audit
    costs one corpus pass at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    cls = docs.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / QID_CHAR_BUCKET).alias("b"),
    ).agg(F.count("*").alias("n"))
    ks = F.explode(F.array(*[F.lit(k) for k in K_THRESHOLDS])).alias("k")
    return (
        cls.select("n", ks)
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("n") < F.col("k"), 1).otherwise(0)).alias(
                "n_classes_below"
            ),
            F.sum(
                F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(0)
            ).alias("n_rows_at_risk"),
        )
    )


_SQL_ZONE_PRED = (
    f"l_shipdate >= TIMESTAMP '{ZONE_LO} 00:00:00'"
    f" AND l_shipdate < TIMESTAMP '{ZONE_HI} 00:00:00'"
)


@register(
    "s9_zonemap_prune_audit",
    f"""
    WITH filed AS (
        SELECT l_shipdate,
               l_orderkey // {ZONE_ORDERKEYS_PER_FILE} AS f_ingest,
               year(l_shipdate) * 12 + month(l_shipdate) AS f_clustered
        FROM lineitem
    ), layouts AS (
        SELECT 'ingest_order' AS layout, f_ingest AS file_id, l_shipdate
        FROM filed
        UNION ALL
        SELECT 'date_clustered', f_clustered, l_shipdate FROM filed
    ), zones AS (
        SELECT layout, file_id,
               min(l_shipdate) AS lo, max(l_shipdate) AS hi,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN {_SQL_ZONE_PRED} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_match
        FROM layouts GROUP BY 1, 2
    )
    SELECT layout,
           count(*) AS n_files,
           CAST(sum(CASE WHEN hi >= TIMESTAMP '{ZONE_LO} 00:00:00'
                          AND lo < TIMESTAMP '{ZONE_HI} 00:00:00'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_files_kept,
           CAST(sum(n_rows) AS BIGINT) AS rows_total,
           CAST(sum(CASE WHEN hi >= TIMESTAMP '{ZONE_LO} 00:00:00'
                          AND lo < TIMESTAMP '{ZONE_HI} 00:00:00'
                         THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(sum(n_match) AS BIGINT) AS rows_matched
    FROM zones GROUP BY layout
    """,
    doc="physical layout: zone-map (file min/max) pruning effectiveness"
    " for a date predicate, ingest order vs date-clustered",
)
def s9_zonemap_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantifies what data clustering buys a 100 TB scan: files are
    simulated under two layouts (ingest order = orderkey ranges, which
    is uncorrelated with ship date in this data; date-clustered = one
    file per calendar month, what a `CLUSTER BY`/Z-order rewrite
    produces), per-file min/max zone maps are one aggregate, and a
    30-day predicate keeps a file only if [min,max] intersects the
    window. rows_scanned/rows_total is the fraction of the table a
    stats-aware reader (parquet row-group stats, Iceberg manifests)
    must touch — near 100% on the ingest layout, ~1 file's worth on the
    clustered one, with rows_matched identical in both rows because
    pruning never changes the answer."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = (
        (F.col("l_shipdate") >= F.lit(f"{ZONE_LO} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{ZONE_HI} 00:00:00").cast("timestamp"))
    )
    filed = li.select(
        "l_shipdate",
        F.floor(F.col("l_orderkey") / ZONE_ORDERKEYS_PER_FILE).alias("f_ingest"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("bigint")
        .alias("f_clustered"),
    )
    layouts = filed.select(
        F.lit("ingest_order").alias("layout"),
        F.col("f_ingest").alias("file_id"),
        "l_shipdate",
    ).unionByName(
        filed.select(
            F.lit("date_clustered").alias("layout"),
            F.col("f_clustered").alias("file_id"),
            "l_shipdate",
        )
    )
    zones = layouts.groupBy("layout", "file_id").agg(
        F.min("l_shipdate").alias("lo"),
        F.max("l_shipdate").alias("hi"),
        F.count("*").alias("n_rows"),
        F.sum(F.when(pred, 1).otherwise(0)).alias("n_match"),
    )
    kept = (
        F.col("hi") >= F.lit(f"{ZONE_LO} 00:00:00").cast("timestamp")
    ) & (F.col("lo") < F.lit(f"{ZONE_HI} 00:00:00").cast("timestamp"))
    return zones.groupBy("layout").agg(
        F.count("*").alias("n_files"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_files_kept"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(F.when(kept, F.col("n_rows")).otherwise(0)).alias("rows_scanned"),
        F.sum("n_match").alias("rows_matched"),
    )


@register(
    "tx_padding_waste",
    f"""
    WITH t AS (
        SELECT CAST(ceil(len(text) / 4.0) AS BIGINT) AS n_tok
        FROM documents
    )
    SELECT ((n_tok + {LEN_BUCKET - 1}) // {LEN_BUCKET}) * {LEN_BUCKET}
               AS bucket_top,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(((n_tok + {LEN_BUCKET - 1}) // {LEN_BUCKET})
                    * {LEN_BUCKET} - n_tok) AS BIGINT) AS pad_to_bucket,
           CAST(sum({SEQ_LEN} - least(n_tok, {SEQ_LEN})) AS BIGINT)
               AS pad_to_seqlen,
           CAST(sum(greatest(n_tok - {SEQ_LEN}, 0)) AS BIGINT)
               AS truncated_tokens
    FROM t GROUP BY 1
    """,
    doc="training prep: per-length-bucket padding waste at fixed seq-len"
    " vs length-bucketed batching, plus truncation loss",
)
def tx_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The report that motivates sequence packing: for each 64-token
    length bucket, how many tokens a fixed-2048 batcher wastes as
    padding (pad_to_seqlen), how much the length-bucketed alternative
    recovers (pad_to_bucket), and what a truncating batcher would
    discard. Token counts use the same chars/4 BPE-ish estimate as
    tx_token_pack so the two reports compose. Single aggregate pass,
    all-integer arithmetic — embarrassingly parallel at any corpus
    size."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_tok")
    )
    bucket_top = (
        F.floor((F.col("n_tok") + (LEN_BUCKET - 1)) / LEN_BUCKET) * LEN_BUCKET
    ).alias("bucket_top")
    return (
        t.groupBy(bucket_top)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(
                F.floor((F.col("n_tok") + (LEN_BUCKET - 1)) / LEN_BUCKET)
                * LEN_BUCKET
                - F.col("n_tok")
            ).alias("pad_to_bucket"),
            F.sum(
                F.lit(SEQ_LEN) - F.least(F.col("n_tok"), F.lit(SEQ_LEN))
            ).alias("pad_to_seqlen"),
            F.sum(
                F.greatest(F.col("n_tok") - SEQ_LEN, F.lit(0))
            ).alias("truncated_tokens"),
        )
    )


# --- The curation funnel --------------------------------------------
#
# Composes the pipeline's stages into the one report a data team
# publishes per corpus build: raw -> quality-filtered (Gopher rules) ->
# exact-deduped (bag-of-words fingerprint keepers) -> near-dup-deduped
# (one keeper per LSH component) -> decontaminated (8-gram collision
# with the eval split). Each stage is cumulative on the previous one's
# survivors. The oracle re-derives every stage in one SQL statement on
# top of the dedup module's recursive-CTE component labels.

from big_data_training_spark.extensions.dedup import _SQL_COMPONENTS_CTES
from big_data_training_spark.extensions.filters import (
    MAX_MEAN_CENTILEN,
    MAX_WORDS,
    MIN_ALPHA_PERMILLE,
    MIN_MEAN_CENTILEN,
    MIN_STOPWORDS,
    MIN_WORDS,
)
from big_data_training_spark.extensions.textstats import _SQL_STOP

_SQL_FUNNEL = (
    _SQL_COMPONENTS_CTES
    + f"""
    , corpus AS (
        SELECT doc_id FROM documents WHERE NOT (doc_id % 20 = 0)
    ), gm AS (
        SELECT doc_id,
               len(ws) AS n_words,
               CAST(list_sum(list_transform(ws, w -> length(w))) * 100
                    // len(ws) AS BIGINT) AS mc,
               CAST(len(list_filter(ws, w -> list_contains({_SQL_STOP}, w)))
                    AS BIGINT) AS nsw,
               CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
                    * 1000 // len(ws) AS BIGINT) AS ap
        FROM toks WHERE len(ws) > 0
    ), s2 AS (
        SELECT c.doc_id FROM corpus c JOIN gm ON gm.doc_id = c.doc_id
        WHERE gm.n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
          AND gm.mc BETWEEN {MIN_MEAN_CENTILEN} AND {MAX_MEAN_CENTILEN}
          AND gm.nsw >= {MIN_STOPWORDS}
          AND gm.ap >= {MIN_ALPHA_PERMILLE}
    ), fpt AS (
        SELECT t.doc_id,
               md5(array_to_string(list_sort(list_distinct(ws)), ' ')) AS fp
        FROM toks t JOIN s2 USING (doc_id)
    ), s3 AS (
        SELECT min(doc_id) AS doc_id FROM fpt GROUP BY fp
    ), c4 AS (
        SELECT l.comp, min(s.doc_id) AS k
        FROM s3 s JOIN labels l ON l.node = s.doc_id GROUP BY l.comp
    ), s4 AS (
        SELECT s.doc_id
        FROM s3 s LEFT JOIN labels l ON l.node = s.doc_id
                  LEFT JOIN c4 ON c4.comp = l.comp
        WHERE l.node IS NULL OR s.doc_id = c4.k
    ), dsh AS (
        SELECT doc_id,
               list_distinct([array_to_string(ws[i:i+7], ' ')
                              for i in generate_series(1, len(ws) - 8 + 1)])
                   AS sh8
        FROM toks WHERE len(ws) >= 8
    ), contaminated AS (
        SELECT DISTINCT t.doc_id
        FROM (SELECT doc_id, unnest(sh8) AS s FROM dsh
              WHERE NOT (doc_id % 20 = 0)) t
        JOIN (SELECT unnest(sh8) AS s FROM dsh WHERE doc_id % 20 = 0) e
          USING (s)
    ), s5 AS (
        SELECT doc_id FROM s4
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), raw AS (SELECT count(*) AS n FROM corpus)
    SELECT stage_idx, stage, n_docs,
           CAST(n_docs * 1000 // (SELECT n FROM raw) AS BIGINT)
               AS permille_of_raw
    FROM (
        SELECT 1 AS stage_idx, 'raw' AS stage,
               (SELECT n FROM raw) AS n_docs
        UNION ALL SELECT 2, 'quality_filtered', (SELECT count(*) FROM s2)
        UNION ALL SELECT 3, 'exact_deduped', (SELECT count(*) FROM s3)
        UNION ALL SELECT 4, 'neardup_deduped', (SELECT count(*) FROM s4)
        UNION ALL SELECT 5, 'decontaminated', (SELECT count(*) FROM s5)
    )
    """
)


@register(
    "dd_curation_funnel",
    _SQL_FUNNEL,
    doc="the corpus-build funnel: raw -> Gopher-filtered -> exact-deduped"
    " -> LSH-family-deduped -> decontaminated, cumulative survivor"
    " counts with permille of raw",
    bench=True,
)
def dd_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation report: every stage applies to the
    previous stage's survivors, composed from the operators that
    already exist — Gopher hard filters, bag-of-words fingerprint
    keepers, one-keeper-per-LSH-component, and 8-gram benchmark
    decontamination (eval split = doc_id % 20 = 0, excluded from the
    corpus up front). Cost shape: each stage is the same single pass /
    single shuffle its standalone operator runs; nothing here is more
    expensive than the most expensive constituent (the LSH clustering),
    so the funnel is what you'd actually schedule nightly at 100 TB
    rather than five separate jobs re-scanning the corpus."""
    from big_data_training_spark.extensions.dedup import (
        dd_cluster_components,
    )
    from big_data_training_spark.extensions.curation import (
        EVAL_PRED,
        dd_decontaminate_overlap,
    )
    from big_data_training_spark.extensions.filters import tx_gopher_rules

    docs = load_table(spark, sf_dir, "documents")

    # Single-pass formulation: instead of counting five stage frontiers
    # (whose union plan would replay the LSH clustering twice and the
    # Gopher scan four times — measured; eager/lazy checkpoints of the
    # frontiers came out SLOWER than the replays on 32 cores), tag every
    # corpus doc with cumulative survival flags via two keeper windows
    # and two left joins, then aggregate once. Every expensive input —
    # Gopher flags, LSH labels, decontamination flags — is evaluated
    # exactly once in one DAG.
    fp = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(F.expr("filter(split(text, '\\\\s+'), w -> w != '')"))
            ),
        )
    )
    gop = tx_gopher_rules(spark, sf_dir).select("doc_id", "keep")
    labels = dd_cluster_components(spark, sf_dir)
    flagged = dd_decontaminate_overlap(spark, sf_dir).select("doc_id").withColumn(
        "contaminated", F.lit(1)
    )
    base = (
        docs.filter(f"NOT ({EVAL_PRED})")
        .select("doc_id", fp.alias("fp"))
        .join(gop, "doc_id")
        .join(labels, "doc_id", "left")
        .join(flagged, "doc_id", "left")
    )
    w_fp = Window.partitionBy("fp")
    w_c = Window.partitionBy("component_id")
    in_s2 = F.col("keep")
    keeper_fp = F.min(F.when(in_s2, F.col("doc_id"))).over(w_fp)
    in_s3 = in_s2 & (F.col("doc_id") == keeper_fp)
    keeper_c = F.min(F.when(in_s3, F.col("doc_id"))).over(w_c)
    in_s4 = in_s3 & (
        F.col("component_id").isNull() | (F.col("doc_id") == keeper_c)
    )
    in_s5 = in_s4 & F.col("contaminated").isNull()
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    totals = base.select(
        F.lit(1).alias("g"),
        in_s2.alias("s2"),
        in_s3.alias("s3"),
        in_s4.alias("s4"),
        in_s5.alias("s5"),
    ).agg(
        F.count("*").alias("n1"),
        one(F.col("s2")).alias("n2"),
        one(F.col("s3")).alias("n3"),
        one(F.col("s4")).alias("n4"),
        one(F.col("s5")).alias("n5"),
    )
    stages = totals.select(
        F.expr(
            "stack(5, 1, 'raw', n1, 2, 'quality_filtered', n2,"
            " 3, 'exact_deduped', n3, 4, 'neardup_deduped', n4,"
            " 5, 'decontaminated', n5) AS (stage_idx, stage, n_docs)"
        ),
        F.col("n1").alias("raw_n"),
    )
    return stages.select(
        "stage_idx",
        "stage",
        "n_docs",
        F.floor(F.col("n_docs") * 1000 / F.col("raw_n")).alias(
            "permille_of_raw"
        ),
    )


# Benford expected first-digit mass in permille (log10(1+1/d), floored
# at the same precision on both sides — constants, not computed floats).
_BENFORD_PERMILLE = {1: 301, 2: 176, 3: 124, 4: 96, 5: 79, 6: 66, 7: 57, 8: 51, 9: 45}


@register(
    "dq_benford_audit",
    f"""
    WITH d AS (
        SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                   AS digit
        FROM orders WHERE o_totalprice >= 1
    ), c AS (
        SELECT CAST(digit AS BIGINT) AS digit, count(*) AS n FROM d GROUP BY 1
    ), t AS (SELECT sum(n) AS total FROM c)
    SELECT c.digit,
           c.n AS n,
           CAST(c.n * 1000 // t.total AS BIGINT) AS observed_permille,
           CAST(CASE c.digit {" ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PERMILLE.items())} END
                AS BIGINT) AS benford_permille,
           CAST(abs(c.n * 1000 // t.total
                    - CASE c.digit {" ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PERMILLE.items())} END)
                AS BIGINT) AS abs_dev_permille
    FROM c, t
    """,
    doc="data quality: Benford first-digit audit of order totals —"
    " observed vs expected permille, the classic fabricated-data screen",
)
def dq_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice against
    Benford's law: naturally occurring multi-scale amounts follow
    log10(1+1/d); flat or spiky deviations flag generated or tampered
    data. The digit comes from integer string extraction (no float log,
    so both engines agree bit-for-bit) and expected masses are permille
    constants. One scan, a 9-row aggregate, and a broadcast total —
    runs on any table at any scale for the cost of a count."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    )
    c = d.groupBy(F.col("digit").cast("bigint").alias("digit")).agg(
        F.count("*").alias("n")
    )
    t = c.agg(F.sum("n").alias("total"))
    expected = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PERMILLE.items() for x in kv]
    )[F.col("digit").cast("int")].cast("bigint")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.floor(F.col("n") * 1000 / F.col("total")).alias(
                "observed_permille"
            ),
            expected.alias("benford_permille"),
            F.abs(
                F.floor(F.col("n") * 1000 / F.col("total")) - expected
            ).alias("abs_dev_permille"),
        )
    )


@register(
    "ev_dau_wau_mau",
    """
    WITH p AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day FROM p),
    dau AS (SELECT day, count(*) AS dau FROM p GROUP BY 1),
    wau AS (
        SELECT d.day, count(DISTINCT p.user_id) AS wau
        FROM days d JOIN p
          ON p.day <= d.day AND p.day > d.day - INTERVAL 7 DAY
        GROUP BY 1
    ),
    mau AS (
        SELECT d.day, count(DISTINCT p.user_id) AS mau
        FROM days d JOIN p
          ON p.day <= d.day AND p.day > d.day - INTERVAL 30 DAY
        GROUP BY 1
    )
    SELECT dau.day AS day, dau.dau AS dau, wau.wau AS wau, mau.mau AS mau,
           CAST(dau.dau * 1000 // mau.mau AS BIGINT) AS stickiness_permille
    FROM dau JOIN wau ON wau.day = dau.day JOIN mau ON mau.day = dau.day
    """,
    bench=True,
    doc="engagement: DAU/WAU/MAU trailing exact-distinct actives per day"
    " plus DAU/MAU stickiness",
)
def ev_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engagement dashboard's backbone: per day, exact distinct
    actives over the trailing 1/7/30-day windows and the DAU/MAU
    stickiness ratio. The event log first collapses to distinct
    (day, user) presence — the only pass that touches raw volume — and
    the trailing windows then join presence against the (tiny) day
    spine, so the range join's left side is |days| rows and the right
    side is presence, not events. At larger windows the exact count's
    memory is bounded by presence rows per window; the sketch path
    (sk_hll_*) is the documented fallback when even presence is too
    wide."""
    events = load_table(spark, sf_dir, "events")
    p = events.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    days = p.select("day").distinct()
    dau = p.groupBy("day").agg(F.count("*").alias("dau"))

    def trailing(n_days: int, alias: str) -> DataFrame:
        return (
            days.alias("d")
            .join(
                p.alias("q"),
                (F.col("q.day") <= F.col("d.day"))
                & (
                    F.col("q.day")
                    > F.col("d.day") - F.expr(f"INTERVAL {n_days} DAY")
                ),
            )
            .groupBy(F.col("d.day").alias("day"))
            .agg(F.countDistinct("q.user_id").alias(alias))
        )

    wau = trailing(7, "wau")
    mau = trailing(30, "mau")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.floor(F.col("dau") * 1000 / F.col("mau")).alias(
                "stickiness_permille"
            ),
        )
    )


@register(
    "s8_parquet_footer_stats",
    # rows-only for the driver: the oracle harness registers table VIEWS,
    # not file paths, and the footer is a property of the physical file.
    # Footer parity vs DuckDB's parquet_metadata() is proven by
    # tests/test_governance.py::test_parquet_footer_stats_match_duckdb,
    # which controls the path.
    None,
    doc="storage audit: per-column parquet footer stats (row groups,"
    " values, nulls, compressed/uncompressed bytes, compression ratio);"
    " rows-only driver check, DuckDB footer parity proven in tests",
)
def s8_parquet_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The storage-engineering view of a table: per column, how many
    bytes it costs on disk and how well it compresses — read from the
    parquet FOOTER alone (pyarrow metadata walk, no data pages
    touched), which is exactly what an Iceberg/Delta manifest job does.
    The DuckDB oracle reads the same footer through its own
    parquet_metadata() — two independent parquet implementations
    agreeing on the physical layout. The footer walk is driver-side by
    design: footers are the catalog tier (KBs per file); at 100 TB the
    same walk fans out over the file listing, with the per-file work
    unchanged. The 1000x compression skew between columns is what
    drives encoding and sort-order decisions."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata
    rows = []
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        for j in range(rg.num_columns):
            c = rg.column(j)
            rows.append(
                (
                    c.path_in_schema,
                    c.num_values,
                    (
                        c.statistics.null_count
                        if c.statistics and c.statistics.null_count is not None
                        else 0
                    ),
                    c.total_compressed_size,
                    c.total_uncompressed_size,
                )
            )
    cells = spark.createDataFrame(
        rows,
        "column_name string, num_values long, null_count long,"
        " compressed long, uncompressed long",
    )
    return cells.groupBy("column_name").agg(
        F.count("*").alias("n_row_groups"),
        F.sum("num_values").alias("n_values"),
        F.sum("null_count").alias("n_nulls"),
        F.sum("compressed").alias("compressed_bytes"),
        F.sum("uncompressed").alias("uncompressed_bytes"),
        F.floor(
            F.sum("compressed") * 1000 / F.sum("uncompressed")
        ).alias("compression_permille"),
    )


@register(
    "ev_revenue_pareto",
    """
    WITH spend AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ), ranked AS (
        SELECT o_custkey, cents,
               ntile(10) OVER (ORDER BY cents DESC, o_custkey ASC) AS decile
        FROM spend
    ), d AS (
        SELECT decile, count(*) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM ranked GROUP BY 1
    ), t AS (SELECT sum(revenue_cents) AS total FROM d)
    SELECT decile, n_customers, revenue_cents,
           CAST(sum(revenue_cents) OVER (ORDER BY decile
                                         ROWS UNBOUNDED PRECEDING)
                * 1000 // (SELECT total FROM t) AS BIGINT)
               AS cum_share_permille
    FROM d
    """,
    doc="concentration analytics: Lorenz/Pareto curve of customer spend"
    " by decile with cumulative revenue share",
)
def ev_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'top 10% of customers drive X% of revenue' table: customers
    ranked by exact total spend (cents, so the order and every sum are
    integers), cut into deciles, with the running revenue share in
    permille — the Lorenz curve a revenue-concentration review reads.
    The only per-customer state is one aggregate row; the decile window
    runs over |customers| rows once and the final share window over 10
    rows. Ties break on custkey so the ntile cut is total-ordered and
    engine-identical."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    ranked = spend.withColumn(
        "decile",
        F.ntile(10)
        .over(Window.orderBy(F.desc("cents"), F.asc("o_custkey")))
        .cast("bigint"),  # DuckDB ntile emits BIGINT (dtype-strict rule)
    )
    d = ranked.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("revenue_cents"),
    )
    t = d.agg(F.sum("revenue_cents").alias("total"))
    cum = F.sum("revenue_cents").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n_customers",
            "revenue_cents",
            F.floor(cum * 1000 / F.col("total")).alias("cum_share_permille"),
        )
    )


@register(
    "tx_lid_confusion",
    f"""
    WITH t AS (
        SELECT lang,
               list_filter(string_split(text, ' '), w -> w <> '') AS ws
        FROM documents
    ), pred AS (
        SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS actual,
               CASE WHEN len(list_filter(ws, w -> list_contains(
                        {_SQL_STOP}, w)))::DOUBLE / len(ws) >= 0.05
                    THEN 'en' ELSE 'other' END AS predicted
        FROM t WHERE len(ws) > 0
    ), c AS (
        SELECT actual, predicted, count(*) AS n FROM pred GROUP BY 1, 2
    ), tot AS (SELECT sum(n) AS total FROM c)
    SELECT actual, predicted, n,
           CAST(n * 1000 // (SELECT total FROM tot) AS BIGINT)
               AS share_permille
    FROM c
    """,
    doc="LID evaluation: confusion matrix of the stopword-heuristic"
    " language ID against the labeled lang column",
)
def tx_lid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closes the loop on tx_lang_id: its en/other prediction scored
    against the corpus's lang labels as a confusion grid with permille
    shares — the evaluation every classifier-driven curation stage
    (LID, quality, toxicity) publishes before its threshold is trusted.
    Single scan, 4-row output. The stopword list is pinned to the same
    8 function words as the textstats heuristic so the two queries
    stay in lockstep."""
    from big_data_training_spark.extensions.textstats import EN_STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    ws = F.expr("filter(split(text, '\\\\s+'), w -> w != '')")
    en_score = F.size(
        F.filter(ws, lambda w: F.array_contains(stop_arr, w))
    ) / F.size(ws)
    pred = docs.filter(F.size(ws) > 0).select(
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("actual"),
        F.when(en_score >= 0.05, "en").otherwise("other").alias("predicted"),
    )
    c = pred.groupBy("actual", "predicted").agg(F.count("*").alias("n"))
    tot = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(tot)).select(
        "actual",
        "predicted",
        "n",
        F.floor(F.col("n") * 1000 / F.col("total")).alias("share_permille"),
    )


@register(
    "cal_hourly_coverage",
    """
    WITH b AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ), spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
        FROM b
    ), have AS (
        SELECT DISTINCT date_trunc('hour', ts) AS hour_start FROM events
    )
    SELECT date_trunc('day', s.hour_start) AS day,
           count(*) AS n_hours_expected,
           CAST(sum(CASE WHEN h.hour_start IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hours_with_events,
           CAST(sum(CASE WHEN h.hour_start IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hours_missing
    FROM spine s LEFT JOIN have h ON h.hour_start = s.hour_start
    GROUP BY 1
    """,
    doc="ingest monitoring: per-day hourly coverage — expected hour spine"
    " vs hours that actually produced events, missing-hour counts",
)
def cal_hourly_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downtime/gap detection for an ingest feed: build the full hour
    spine between the stream's first and last event (one 1-row
    aggregate exploded JVM-side — the spine is |hours| rows no matter
    the event volume), anti-compare against the hours that actually
    carried data, and report coverage per day. A day with
    n_hours_missing > 0 is a feed incident; the spine join's left side
    is tiny so the only data-sized pass is the distinct-hour collapse.
    Composes with cal_date_spine_gap_fill (the day-grain twin)."""
    events = load_table(spark, sf_dir, "events")
    b = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = b.select(
        F.explode(
            F.expr("sequence(lo, hi, interval 1 hour)")
        ).alias("hour_start")
    )
    have = events.select(
        F.date_trunc("hour", "ts").alias("hour_start")
    ).distinct()
    return (
        spine.join(
            have.withColumn("present", F.lit(1)), "hour_start", "left"
        )
        .groupBy(F.date_trunc("day", "hour_start").alias("day"))
        .agg(
            F.count("*").alias("n_hours_expected"),
            F.sum(
                F.when(F.col("present").isNotNull(), 1).otherwise(0)
            ).alias("n_hours_with_events"),
            F.sum(
                F.when(F.col("present").isNull(), 1).otherwise(0)
            ).alias("n_hours_missing"),
        )
    )


@register(
    "ev_ltv_cohorts",
    """
    WITH firsts AS (
        SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1
    ), joined AS (
        SELECT e.user_id,
               date_trunc('day', f.first_ts) AS cohort_day,
               datediff('day', date_trunc('day', f.first_ts),
                        date_trunc('day', e.ts)) AS days_since,
               CAST(round(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT cohort_day, CAST(days_since AS BIGINT) AS days_since,
           count(DISTINCT user_id) AS n_active_users,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM joined GROUP BY 1, 2
    """,
    doc="engagement: cohort lifetime value — revenue per (first-seen day,"
    " days since) cell, cents-exact",
)
def ev_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LTV triangle: users bucketed by first-seen day, revenue
    accumulated per days-since-first-seen offset — the money-weighted
    sibling of ev_retention_cohorts. Value sums are cents (round to
    integer before any aggregation, so every engine sums the same
    integers). One aggregate finds first-seen per user, one join keys
    events back to their cohort (both shuffles on user_id — AQE can
    reuse the partitioning), and the output is |cohorts| x |offsets|
    cells regardless of event volume."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = events.join(firsts, "user_id").select(
        "user_id",
        F.date_trunc("day", "first_ts").alias("cohort_day"),
        F.datediff(
            F.date_trunc("day", "ts"), F.date_trunc("day", "first_ts")
        )
        .cast("bigint")
        .alias("days_since"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return joined.groupBy("cohort_day", "days_since").agg(
        F.countDistinct("user_id").alias("n_active_users"),
        F.sum("cents").alias("revenue_cents"),
    )
