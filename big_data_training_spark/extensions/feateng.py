"""Feature-engineering operators for model-training pipelines:
out-of-fold target encoding, the hashing trick, a StringIndexer-style
vocabulary, and deterministic negative sampling.

These are the transform steps (reference pipeline "process:
clean/transform", README.md:18-22; T5 ML-scoring map,
flink/README.md:29-62) that turn curated rows into model inputs. All
four are built on the repo's portable 60-bit hash so the features are
reproducible across engines and across reruns — the property a
training pipeline needs for cache hits and eval comparability.

Scale notes:
* Target encoding is the classic high-cardinality-categorical encoder;
  the out-of-fold (OOF) form exists precisely to stop target leakage.
  The encoding table is |category| x |folds| rows — bounded — built by
  one map-side-combinable groupBy; applying it to rows is a broadcast
  join. Means are exact integer cents under floor division.
* Feature hashing maps an unbounded token space into a fixed 4096-dim
  space with zero vocabulary state — the only vectorizer that needs no
  broadcast at all. The collision report is the diagnostic that picks
  the dimension.
* The string indexer is the bounded-vocab alternative (Spark ML
  StringIndexer semantics: ids dense, frequency-descending,
  lexicographic tie-break) — one groupBy plus a window over the
  bounded vocab table.
* Negative sampling draws K pseudo-random brands per customer from the
  portable hash (reproducible, join-free generation via explode of a
  constant range), then anti-joins the positives — the contrastive-
  pair generator for recommender/embedding training. No step is wider
  than |customers| x K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60_expr, sql_hash60
from big_data_training_spark.registry import register

FOLDS = 5
HASH_DIM = 4096
VOCAB_TOP = 20
NEG_K = 3

_TOKS = "filter(split(text, ' '), w -> w <> '')"


@register(
    "fe_oof_target_encode",
    f"""
    WITH o AS (
        SELECT o_orderpriority AS cat,
               {sql_hash60("o_orderkey || '#fold'")} % {FOLDS} AS fold,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    pf AS (
        SELECT cat, fold, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM o GROUP BY 1, 2
    ),
    tot AS (
        SELECT cat, CAST(sum(n) AS BIGINT) AS tot_n,
               CAST(sum(sum_cents) AS BIGINT) AS tot_cents
        FROM pf GROUP BY 1
    )
    SELECT p.cat AS cat, CAST(p.fold AS BIGINT) AS fold,
           p.n AS n_in_fold,
           CAST(t.tot_n - p.n AS BIGINT) AS n_out_of_fold,
           CAST(CASE WHEN t.tot_n = p.n THEN NULL
                     ELSE (t.tot_cents - p.sum_cents) // (t.tot_n - p.n)
                END AS BIGINT) AS oof_mean_cents
    FROM pf p JOIN tot t ON t.cat = p.cat
    ORDER BY cat, fold
    """,
    doc=f"out-of-fold target encoding of order priority vs total price:"
    f" {FOLDS} hash-assigned folds, each fold's encoding computed from"
    f" the OTHER folds only (leakage-free), exact floor-cents integers"
    f" (floor before CAST: the price column is DOUBLE and the engines"
    f" disagree on CAST rounding)",
)
def fe_oof_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leakage-free categorical encoder: rows are hash-bucketed
    into folds; the encoding a fold sees is mean(target) over the
    complement. Encoding table is |cat| x |folds| rows (bounded), so
    at 100 TB it broadcasts back onto the fact table for free."""
    orders = load_table(spark, sf_dir, "orders")
    fold_hash = hash60_expr("o_orderkey || '#fold'")
    o = orders.selectExpr(
        "o_orderpriority AS cat",
        f"{fold_hash} % {FOLDS} AS fold",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
    )
    pf = o.groupBy("cat", "fold").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n"),
        F.expr("CAST(sum(cents) AS BIGINT)").alias("sum_cents"),
    )
    tot = pf.groupBy("cat").agg(
        F.expr("CAST(sum(n) AS BIGINT)").alias("tot_n"),
        F.expr("CAST(sum(sum_cents) AS BIGINT)").alias("tot_cents"),
    )
    return (
        pf.join(F.broadcast(tot), "cat")
        .selectExpr(
            "cat",
            "CAST(fold AS BIGINT) AS fold",
            "n AS n_in_fold",
            "CAST(tot_n - n AS BIGINT) AS n_out_of_fold",
            # a category whose rows all hash to one fold has no
            # out-of-fold data: NULL, not an ANSI divide-by-zero
            "CAST(CASE WHEN tot_n = n THEN NULL"
            " ELSE (tot_cents - sum_cents) div (tot_n - n) END AS BIGINT)"
            " AS oof_mean_cents",
        )
        .orderBy("cat", "fold")
    )


@register(
    "fe_feature_hashing",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), clean AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    hashed AS (
        SELECT doc_id, term,
               {sql_hash60("term")} % {HASH_DIM} AS bucket
        FROM clean
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS total_tf,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
           CAST(count(DISTINCT term) AS BIGINT) AS n_terms_colliding
    FROM hashed
    GROUP BY 1
    ORDER BY total_tf DESC, bucket
    LIMIT {VOCAB_TOP}
    """,
    doc=f"hashing-trick vectorizer audit: token -> portable-hash bucket"
    f" in a fixed {HASH_DIM}-dim space; per-bucket mass and collision"
    f" width for the {VOCAB_TOP} heaviest buckets",
)
def fe_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateless vectorizer: no vocabulary to build, broadcast or
    version — bucket = hash(term) mod D. The report shows each heavy
    bucket's total mass and how many distinct terms collided into it,
    which is the evidence for choosing D. One explode + one groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.selectExpr(
        "doc_id", f"explode({_TOKS}) AS term"
    ).selectExpr(
        "doc_id", "term", f"{hash60_expr('term')} % {HASH_DIM} AS bucket"
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("total_tf"),
            F.expr("CAST(count(DISTINCT doc_id) AS BIGINT)").alias(
                "doc_freq"
            ),
            F.expr("CAST(count(DISTINCT term) AS BIGINT)").alias(
                "n_terms_colliding"
            ),
        )
        .selectExpr("CAST(bucket AS BIGINT) AS bucket", "total_tf",
                    "doc_freq", "n_terms_colliding")
        .orderBy(F.desc("total_tf"), "bucket")
        .limit(VOCAB_TOP)
    )


@register(
    "fe_string_indexer",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), df AS (
        SELECT term, count(DISTINCT doc_id) AS doc_freq
        FROM toks WHERE term <> '' GROUP BY 1
    )
    SELECT term,
           CAST(doc_freq AS BIGINT) AS doc_freq,
           CAST(row_number() OVER (ORDER BY doc_freq DESC, term) - 1
                AS BIGINT) AS term_index
    FROM df
    ORDER BY term_index
    LIMIT {VOCAB_TOP}
    """,
    doc=f"StringIndexer-style vocabulary: dense ids assigned by"
    f" frequency-descending (ties lexicographic), first {VOCAB_TOP}"
    f" entries — the bounded-vocab categorical encoder",
)
def fe_string_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark ML StringIndexer semantics re-expressed as a query:
    term -> dense integer id ordered by document frequency. The window
    runs over the bounded vocabulary table only; the corpus scan is
    one explode + groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    df = (
        docs.selectExpr("doc_id", f"explode({_TOKS}) AS term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
    )
    w = Window.orderBy(F.desc("doc_freq"), "term")
    return (
        df.withColumn(
            "term_index", (F.row_number().over(w) - 1).cast("bigint")
        )
        .selectExpr(
            "term", "CAST(doc_freq AS BIGINT) AS doc_freq", "term_index"
        )
        .orderBy("term_index")
        .limit(VOCAB_TOP)
    )


@register(
    "fe_negative_sampling",
    f"""
    WITH brands AS (
        SELECT p_brand,
               row_number() OVER (ORDER BY p_brand) - 1 AS bidx,
               count(*) OVER () AS nb
        FROM (SELECT DISTINCT p_brand FROM part)
    ),
    pos AS (
        SELECT DISTINCT o.o_custkey AS custkey, p.p_brand AS p_brand
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
    ),
    draws AS (
        SELECT c.c_custkey AS custkey, k.k AS k,
               {sql_hash60("c.c_custkey || '#neg' || k.k")} AS h
        FROM customer c
        CROSS JOIN (SELECT unnest(range({NEG_K})) AS k) k
    ),
    cand AS (
        SELECT DISTINCT d.custkey AS custkey, b.p_brand AS p_brand
        FROM draws d JOIN brands b ON b.bidx = d.h % b.nb
    ),
    neg AS (
        SELECT c.custkey, c.p_brand
        FROM cand c
        WHERE NOT EXISTS (
            SELECT 1 FROM pos p
            WHERE p.custkey = c.custkey AND p.p_brand = c.p_brand
        )
    )
    SELECT b.p_brand AS p_brand,
           CAST(coalesce(pc.n, 0) AS BIGINT) AS n_pos_customers,
           CAST(coalesce(nc.n, 0) AS BIGINT) AS n_neg_sampled
    FROM brands b
    LEFT JOIN (SELECT p_brand, count(*) AS n FROM pos GROUP BY 1) pc
           ON pc.p_brand = b.p_brand
    LEFT JOIN (SELECT p_brand, count(*) AS n FROM neg GROUP BY 1) nc
           ON nc.p_brand = b.p_brand
    ORDER BY p_brand
    """,
    doc=f"deterministic negative sampling for contrastive training:"
    f" {NEG_K} hash-drawn candidate brands per customer, anti-joined"
    f" against observed purchases; per-brand positive/negative counts",
)
def fe_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(customer, brand) contrastive pairs: positives from the order
    history, negatives drawn reproducibly via the portable hash and
    cleaned by an anti-join. Generation is explode(sequence) — no RNG
    state, no skew; the brand codebook is a broadcast of a bounded
    dimension table. Per-brand tallies verify the sampler's balance."""
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("p_brand")
    brands = (
        part.select("p_brand")
        .distinct()
        .withColumn("bidx", F.row_number().over(w) - 1)
        .withColumn("nb", F.count("*").over(Window.partitionBy()))
    )
    pos = (
        orders.join(
            lineitem, lineitem.l_orderkey == orders.o_orderkey
        )
        .join(part, part.p_partkey == lineitem.l_partkey)
        .selectExpr("o_custkey AS custkey", "p_brand")
        .distinct()
    )
    neg_hash = hash60_expr("c_custkey || '#neg' || k")
    draws = customer.crossJoin(
        F.broadcast(
            spark.range(NEG_K).selectExpr("CAST(id AS BIGINT) AS k")
        )
    ).selectExpr("c_custkey AS custkey", "k", f"{neg_hash} AS h")
    cand = (
        draws.join(
            F.broadcast(brands), F.expr("bidx = h % nb")
        )
        .select("custkey", "p_brand")
        .distinct()
    )
    neg = cand.join(pos, ["custkey", "p_brand"], "left_anti")
    pc = pos.groupBy("p_brand").agg(F.count("*").alias("n"))
    nc = neg.groupBy("p_brand").agg(F.count("*").alias("n"))
    return (
        brands.select("p_brand")
        .join(pc.withColumnRenamed("n", "pn"), "p_brand", "left")
        .join(nc.withColumnRenamed("n", "nn"), "p_brand", "left")
        .selectExpr(
            "p_brand",
            "CAST(coalesce(pn, 0) AS BIGINT) AS n_pos_customers",
            "CAST(coalesce(nn, 0) AS BIGINT) AS n_neg_sampled",
        )
        .orderBy("p_brand")
    )
