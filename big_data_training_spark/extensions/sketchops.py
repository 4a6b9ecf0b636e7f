"""Sketch set-operations and embedding-column profiling.

Extends the mergeable-sketch family (extensions/sketches.py) with the
KMV set-intersection estimator — the sketch answer to "how much do two
event audiences overlap?" — self-audited against the exact answer, and
adds per-dimension embedding statistics (the feature-quality profile a
training pipeline publishes for an ``array<float>`` column).

Scale design
------------
KMV machinery is a ``TakeOrderedAndProject`` (per-partition top-K by
hash, merged at the driver-side limit) — never a global sort. The
exact audit is two distinct aggregates on user_id. Embedding stats
shuffle (pos, partial-sums) cells: 64×|partitions| rows, corpus-free.
All estimator arithmetic is integer (permille) so the DuckDB oracle
hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60, sql_hash60
from big_data_training_spark.functions.text import SQL_TOKENS
from big_data_training_spark.registry import register

KMV_K = 64


@register(
    "sk_kmv_jaccard",
    f"""
    WITH a AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ), b AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), tagged AS (
        SELECT {sql_hash60("CAST(user_id AS VARCHAR)")} AS h,
               max(in_a) AS in_a, max(in_b) AS in_b
        FROM (
            SELECT user_id, 1 AS in_a, 0 AS in_b FROM a
            UNION ALL
            SELECT user_id, 0, 1 FROM b
        ) GROUP BY 1
    ), union_k AS (
        SELECT * FROM tagged ORDER BY h LIMIT {KMV_K}
    ), est AS (
        SELECT count(*) AS k_used,
               CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared_in_k
        FROM union_k
    ), exact AS (
        SELECT CAST(count(*) AS BIGINT) AS n_union,
               CAST(sum(in_a * in_b) AS BIGINT) AS n_intersect
        FROM tagged
    )
    SELECT est.k_used, est.n_shared_in_k,
           CAST(est.n_shared_in_k * 1000 // est.k_used AS BIGINT)
               AS jaccard_est_permille,
           exact.n_intersect, exact.n_union,
           CAST(exact.n_intersect * 1000 // exact.n_union AS BIGINT)
               AS jaccard_exact_permille
    FROM est, exact
    """,
    doc="KMV sketch Jaccard between click/purchase audiences, with exact audit",
)
def sk_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-overlap estimate: tag each distinct user with audience
    membership flags, keep the K smallest portable hashes of the union
    (TakeOrderedAndProject — per-partition top-K, no global sort), and
    read the Jaccard off the shared fraction inside that bottom-K
    sample. The exact permille rides along so the estimate is
    self-auditing — on a 100 TB log only the tagged-distinct aggregate
    scales with data; the sketch itself is K rows."""
    ev = load_table(spark, sf_dir, "events")

    def audience(t: str, col: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .select("user_id")
            .distinct()
            .select("user_id", F.lit(1).alias(col))
        )

    a = audience("click", "in_a").withColumn("in_b", F.lit(0))
    b = audience("purchase", "in_b").withColumn("in_a", F.lit(0))
    tagged = (
        a.unionByName(b)
        .groupBy("user_id")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .select(
            hash60(F.col("user_id").cast("string")).alias("h"), "in_a", "in_b"
        )
    )
    union_k = tagged.orderBy("h").limit(KMV_K)
    est = union_k.agg(
        F.count("*").alias("k_used"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("int"))
        .cast("bigint")
        .alias("n_shared_in_k"),
    )
    exact = tagged.agg(
        F.count("*").cast("bigint").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_intersect"),
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "k_used",
            "n_shared_in_k",
            F.expr("n_shared_in_k * 1000 div k_used").cast("bigint").alias(
                "jaccard_est_permille"
            ),
            "n_intersect",
            "n_union",
            F.expr("n_intersect * 1000 div n_union").cast("bigint").alias(
                "jaccard_exact_permille"
            ),
        )
    )


EMB_DIM = 64


@register(
    "emb_dim_stats",
    f"""
    SELECT i - 1 AS pos,
           round(CAST(sum(CAST(embedding[i] AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 6) AS mean,
           round(CAST(min(embedding[i]) AS DOUBLE), 6) AS vmin,
           round(CAST(max(embedding[i]) AS DOUBLE), 6) AS vmax,
           count(*) AS n
    FROM embeddings, generate_series(1, {EMB_DIM}) AS g(i)
    GROUP BY 1
    """,
    doc="per-dimension embedding stats: decimal-exact mean, min/max, count",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-quality profile of the embedding column: per dimension,
    the decimal-exact mean plus min/max — the check that catches dead
    or exploding dimensions before they poison ANN indexes. posexplode
    + grouped partial aggregation: the shuffle carries (pos, partial)
    cells, 64 output rows regardless of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy(F.col("pos").cast("bigint").alias("pos"))
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count("*"),
                6,
            ).alias("mean"),
            F.round(F.min("v").cast("double"), 6).alias("vmin"),
            F.round(F.max("v").cast("double"), 6).alias("vmax"),
            F.count("*").alias("n"),
        )
    )


@register(
    "dd_cross_source_dupes",
    f"""
    SELECT md5(array_to_string(list_sort(list_distinct(
               {SQL_TOKENS.format(col='text')})), ' ')) AS fingerprint,
           count(*) AS n_docs,
           count(DISTINCT source) AS n_sources,
           min(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1 AND count(DISTINCT source) > 1
    """,
    doc="dedup: duplicate content that spans multiple sources (cross-shard leaks)",
)
def dd_cross_source_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate audit: bag-of-words fingerprint groups
    that appear in more than one source shard — the leak class
    (mirrors, syndicated pages) that per-source dedup passes miss
    entirely. One shuffle on the 16-byte fingerprint; output is only
    the offending groups."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(F.expr("filter(split(text, '\\\\s+'), w -> w != '')"))
            ),
        )
    )
    return (
        docs.groupBy(fp.alias("fingerprint"))
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter((F.col("n_docs") > 1) & (F.col("n_sources") > 1))
    )


@register(
    "tx_ngram_novelty",
    # _SQL_DECON_CTE twin inlined: 8-gram shingles per doc (distinct),
    # first-seen = min(doc_id) per shingle, novelty = owned fraction.
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(ws[i:i+7], ' ')
                              for i in generate_series(1, len(ws) - 7)]) AS shingles
        FROM toks WHERE len(ws) >= 8
    ), pairs AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), firsts AS (
        SELECT s, min(doc_id) AS first_doc FROM pairs GROUP BY s
    )
    SELECT p.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS novelty_permille
    FROM pairs p JOIN firsts f USING (s)
    GROUP BY 1
    """,
    doc="curation: per-doc n-gram novelty vs all earlier docs (curriculum signal)",
    bench=True,
)
def tx_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty scoring: the fraction of a document's 8-gram shingles it
    introduces to the corpus (first occurrence by doc_id order) — low
    scores mark recombined/boilerplate content even when no single
    near-duplicate exists; the signal curriculum samplers and dedup
    tie-breakers use. Reuses the Arrow-batched shingle pairs; one
    shuffle on the shingle for first-seen, one on doc_id for the score.
    At 100 TB both shuffles carry (hashable-key, small-payload) pairs —
    the same profile as exact dedup."""
    from big_data_training_spark.extensions.curation import _decon_shingled

    pairs = _decon_shingled(spark, sf_dir)
    firsts = pairs.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        pairs.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.expr(
                "CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000"
                " div count(*) AS BIGINT)"
            ).alias("novelty_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): 64-dim vectors → 4 subspaces × 16 dims, 8
# codes per subspace (seeded like the k-means family: decimal-exact means
# of vec_id % 8 groups). The compressed code is 4 small ints per vector —
# the memory layout ANN systems ship to serve billion-vector indexes —
# and ADC (asymmetric distance computation) scores a query against codes
# via a 32-entry lookup table instead of touching raw vectors.
# ---------------------------------------------------------------------------

PQ_SUBS = 4
PQ_SUB_DIM = 16
PQ_CODES = 8

_SQL_PQ_CB_CTE = f"""
    WITH cb AS (
        SELECT s, vec_id % {PQ_CODES} AS code, i,
               round(CAST(sum(CAST(embedding[s * {PQ_SUB_DIM} + i] AS DECIMAL(38,12)))
                          AS DOUBLE) / count(*), 6) AS c
        FROM embeddings,
             generate_series(0, {PQ_SUBS - 1}) AS ss(s),
             generate_series(1, {PQ_SUB_DIM}) AS g(i)
        GROUP BY 1, 2, 3
    ), cbv AS (
        SELECT s, code, list(c ORDER BY i) AS cv FROM cb GROUP BY 1, 2
    ), scored AS (
        SELECT e.vec_id, c.s, c.code,
               (SELECT sum((CAST(e.embedding[c.s * {PQ_SUB_DIM} + i] AS DOUBLE) - c.cv[i])
                           * (CAST(e.embedding[c.s * {PQ_SUB_DIM} + i] AS DOUBLE) - c.cv[i]))
                FROM generate_series(1, {PQ_SUB_DIM}) AS g(i)) AS d
        FROM embeddings e, cbv c
    ), assigned AS (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY round(d, 6), code) AS rk
        FROM scored
    )
"""


def _pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-row (subspace, code) → 16-dim centroid table."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = (
        emb.select(
            (F.col("vec_id") % PQ_CODES).alias("code"),
            F.posexplode("embedding").alias("pos", "v"),
        )
        .select(
            "code",
            F.expr(f"pos div {PQ_SUB_DIM}").alias("s"),
            (F.col("pos") % PQ_SUB_DIM).alias("i"),
            "v",
        )
        .groupBy("s", "code", "i")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count("*"),
                6,
            ).alias("c")
        )
    )
    return cells.groupBy("s", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))), lambda x: x["c"]
        ).alias("cv")
    )


_PQ_SUBDIST = (
    f"aggregate(zip_with(slice(cast(embedding AS array<double>), s * {PQ_SUB_DIM} + 1,"
    f" {PQ_SUB_DIM}), cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
)


def _pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cb = _pq_codebook(spark, sf_dir)
    scored = emb.crossJoin(F.broadcast(cb)).select(
        "vec_id",
        "s",
        "code",
        F.round(F.expr(_PQ_SUBDIST), 6).alias("d"),
    )
    return (
        scored.groupBy("vec_id", "s")
        .agg(F.min(F.struct("d", "code")).alias("m"))
        .select("vec_id", F.col("s").alias("subspace"), F.col("m.code").alias("code"))
    )


@register(
    "sim_pq_codes",
    _SQL_PQ_CB_CTE
    + """
    SELECT vec_id, s AS subspace, code FROM assigned WHERE rk = 1
    """,
    doc="product quantization: per-subspace code assignment (4 codes per vector)",
)
def sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode: each vector's 4 subvectors snapped to their nearest
    codebook centroid (rounded-distance, code-id tiebreak — identical
    determinism contract to the k-means family). The 32-row codebook is
    broadcast; the corpus is scanned once and never shuffled — at scale
    the output is the 4-byte-per-vector compressed index."""
    return _pq_codes(spark, sf_dir)


PQ_QUERY_VEC_ID = 0
PQ_TOP_K = 10


@register(
    "sim_pq_adc_topk",
    _SQL_PQ_CB_CTE
    + f"""
    , q AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = {PQ_QUERY_VEC_ID}
    ), dtable AS (
        SELECT c.s, c.code,
               CAST(floor((SELECT sum((CAST(q.qv[c.s * {PQ_SUB_DIM} + i] AS DOUBLE) - c.cv[i])
                                      * (CAST(q.qv[c.s * {PQ_SUB_DIM} + i] AS DOUBLE) - c.cv[i]))
                           FROM generate_series(1, {PQ_SUB_DIM}) AS g(i)) * 1000000)
                    AS BIGINT) AS dmic
        FROM cbv c, q
    )
    SELECT a.vec_id, CAST(sum(t.dmic) AS BIGINT) AS adc_dist_micro
    FROM assigned a JOIN dtable t ON a.s = t.s AND a.code = t.code
    WHERE a.rk = 1 AND a.vec_id <> {PQ_QUERY_VEC_ID}
    GROUP BY 1
    ORDER BY adc_dist_micro, vec_id LIMIT {PQ_TOP_K}
    """,
    doc="product quantization ADC top-k: query scored against codes via lookup table",
    bench=True,
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search: the query's 32-entry asymmetric distance table
    (micro-quantized so the 4-term per-vector sum is integer-exact in
    any engine) joined to the compressed codes, summed per vector,
    global top-k via TakeOrderedAndProject. At scale this is the serving
    path: the raw corpus is never read — only 4 small ints per vector
    plus a broadcast 32-row table."""
    emb = load_table(spark, sf_dir, "embeddings")
    codes = _pq_codes(spark, sf_dir)
    cb = _pq_codebook(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == PQ_QUERY_VEC_ID).select(
        F.col("embedding").alias("qemb")
    )
    dtable = cb.crossJoin(F.broadcast(q)).select(
        "s",
        "code",
        F.floor(
            F.expr(
                f"aggregate(zip_with(slice(cast(qemb AS array<double>),"
                f" s * {PQ_SUB_DIM} + 1, {PQ_SUB_DIM}), cv,"
                f" (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
                f" * 1000000"
            )
        )
        .cast("bigint")
        .alias("dmic"),
    )
    return (
        codes.filter(F.col("vec_id") != PQ_QUERY_VEC_ID)
        .join(
            F.broadcast(dtable),
            (codes["subspace"] == dtable["s"]) & (codes["code"] == dtable["code"]),
        )
        .groupBy("vec_id")
        .agg(F.sum("dmic").cast("bigint").alias("adc_dist_micro"))
        .orderBy("adc_dist_micro", "vec_id")
        .limit(PQ_TOP_K)
    )


@register(
    "sim_pq_recall_at_k",
    _SQL_PQ_CB_CTE
    + f"""
    , q AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = {PQ_QUERY_VEC_ID}
    ), dtable AS (
        SELECT c.s, c.code,
               CAST(floor((SELECT sum((CAST(q.qv[c.s * {PQ_SUB_DIM} + i] AS DOUBLE) - c.cv[i])
                                      * (CAST(q.qv[c.s * {PQ_SUB_DIM} + i] AS DOUBLE) - c.cv[i]))
                           FROM generate_series(1, {PQ_SUB_DIM}) AS g(i)) * 1000000)
                    AS BIGINT) AS dmic
        FROM cbv c, q
    ), pq_top AS (
        SELECT a.vec_id
        FROM assigned a JOIN dtable t ON a.s = t.s AND a.code = t.code
        WHERE a.rk = 1 AND a.vec_id <> {PQ_QUERY_VEC_ID}
        GROUP BY 1
        ORDER BY CAST(sum(t.dmic) AS BIGINT), vec_id LIMIT {PQ_TOP_K}
    ), truth AS (
        SELECT e.vec_id
        FROM embeddings e, q
        WHERE e.vec_id <> {PQ_QUERY_VEC_ID}
        ORDER BY (SELECT sum((CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
                             * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))
                  FROM generate_series(1, 64) AS g(i)), e.vec_id
        LIMIT {PQ_TOP_K}
    )
    SELECT CAST({PQ_TOP_K} AS BIGINT) AS k,
           CAST((SELECT count(*) FROM pq_top WHERE vec_id IN (SELECT vec_id FROM truth))
                AS BIGINT) AS n_hits,
           CAST((SELECT count(*) FROM pq_top WHERE vec_id IN (SELECT vec_id FROM truth))
                * 1000 // {PQ_TOP_K} AS BIGINT) AS recall_permille
    """,
    doc="product quantization recall@k against exact L2 ground truth",
)
def sim_pq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ accuracy audit: how many of the compressed-index top-k
    survive against the exact L2 top-k — the number that decides
    codebook size and subspace count before a PQ index ships. Both
    rankings are deterministic (micro-quantized ADC, vec_id tiebreaks);
    the intersection is a broadcast join of two k-row sets."""
    emb = load_table(spark, sf_dir, "embeddings")
    pq_top = sim_pq_adc_topk(spark, sf_dir).select("vec_id")
    q = emb.filter(F.col("vec_id") == PQ_QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    sqdist = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("qv").cast("array<double>"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    truth = (
        emb.filter(F.col("vec_id") != PQ_QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", sqdist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(PQ_TOP_K)
        .select("vec_id")
    )
    hits = pq_top.join(F.broadcast(truth), "vec_id").agg(
        F.count("*").cast("bigint").alias("n_hits")
    )
    return hits.select(
        F.lit(PQ_TOP_K).cast("bigint").alias("k"),
        "n_hits",
        F.expr(f"n_hits * 1000 div {PQ_TOP_K}").cast("bigint").alias(
            "recall_permille"
        ),
    )


@register(
    "st_pq_encode_stream",
    _SQL_PQ_CB_CTE
    + """
    SELECT s AS subspace, code, count(*) AS n_vectors
    FROM assigned WHERE rk = 1
    GROUP BY 1, 2
    """,
    doc="streaming PQ encode: ingest-time vector compression, per-code histogram",
)
def st_pq_encode_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time PQ encoding: embeddings arrive as a stream, each
    micro-batch is snapped to the broadcast static codebook (a
    stream-static join, stateless per row) and the running per-code
    population histogram is the streaming aggregate — the shape of an
    ANN indexer that compresses vectors the moment they land. The
    oracle is the batch assignment's histogram, identical because
    encoding is per-row deterministic."""
    from big_data_training_spark.streaming.replay import (
        read_stream_table,
        run_to_completion,
    )

    # one row per subspace carrying all 8 code vectors, so the argmin is
    # a per-row array fold (stateless) and the query has a SINGLE
    # stateful operator — two chained streaming aggregations would trip
    # Spark's global-watermark correctness check.
    cb_rows = (
        _pq_codebook(spark, sf_dir)
        .groupBy("s")
        .agg(F.collect_list(F.struct("code", "cv")).alias("codes"))
    )
    stream = read_stream_table(spark, sf_dir, "embeddings")
    best_code = F.expr(
        f"array_sort(transform(codes, c -> struct("
        f"round(aggregate(zip_with(slice(cast(embedding AS array<double>),"
        f" s * {PQ_SUB_DIM} + 1, {PQ_SUB_DIM}), c.cv,"
        f" (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x), 6) AS d,"
        f" c.code AS code)))[0].code"
    )
    hist = (
        stream.join(F.broadcast(cb_rows))
        .select(F.col("s").alias("subspace"), best_code.alias("code"))
        .groupBy("subspace", "code")
        .agg(F.count("*").alias("n_vectors"))
    )
    return run_to_completion(hist, "complete")


_SQL_SPLIT_CTE = """
    , splits AS (
        SELECT doc_id,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                          1, 15)) AS BIGINT) % 100 AS b
              FROM documents)
    ), fam_split AS (
        SELECT l.comp, s.split, count(*) AS cnt
        FROM labels l JOIN splits s ON s.doc_id = l.node
        GROUP BY 1, 2
    )
"""


from big_data_training_spark.extensions.dedup import (  # noqa: E402
    _SQL_COMPONENTS_CTES,
)

_SQL_LEAKAGE = (
    _SQL_COMPONENTS_CTES
    + _SQL_SPLIT_CTE
    + """
    SELECT a.split AS split_a, c.split AS split_b,
           count(*) AS n_families,
           CAST(sum(a.cnt * c.cnt) AS BIGINT) AS n_pairs
    FROM fam_split a JOIN fam_split c
      ON a.comp = c.comp AND a.split < c.split
    GROUP BY 1, 2
    """
)


@register(
    "dd_split_leakage_audit",
    _SQL_LEAKAGE,
    doc="train/test leakage through near-duplicate families",
    bench=True,
)
def dd_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination audit a training pipeline must run before shipping
    splits: a near-duplicate family (MinHash-LSH connected component)
    whose members land in *different* splits leaks evaluation data into
    training. Scale-safe formulation: never materialize cross-split doc
    PAIRS (a million-member dup family would explode quadratically) —
    aggregate per (family, split) counts first, then the 3x3 split
    grid per family gives pair counts as cnt_a * cnt_b. Output: for
    each unordered split pair, how many leaking families and how many
    leaked doc pairs."""
    from big_data_training_spark.extensions.dedup import dd_cluster_components

    labels = dd_cluster_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    splits = docs.select(
        "doc_id",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )
    fam_split = (
        labels.join(splits, labels["doc_id"] == splits["doc_id"])
        .groupBy(F.col("component_id").alias("comp"), "split")
        .agg(F.count("*").alias("cnt"))
    )
    a = fam_split.alias("a")
    c = fam_split.alias("c")
    return (
        a.join(
            c,
            (F.col("a.comp") == F.col("c.comp"))
            & (F.col("a.split") < F.col("c.split")),
        )
        .groupBy(
            F.col("a.split").alias("split_a"), F.col("c.split").alias("split_b")
        )
        .agg(
            F.count("*").alias("n_families"),
            F.sum(F.col("a.cnt") * F.col("c.cnt")).cast("bigint").alias("n_pairs"),
        )
    )


# KMV_K must be ALIASED: this module's own KMV_K (= 64, the jaccard
# audience sketch) is referenced at call time by sk_kmv_jaccard above —
# a bare import would rebind it to sketches.KMV_K (= 16) and silently
# desynchronize that query's Spark body from its already-built oracle
# string (caught by driver_sim --all-uncertified, round 5).
from big_data_training_spark.extensions.sketches import (  # noqa: E402
    KMV_K as KMV_EST_K,
    _kmv_est,
    _sql_kmv_est,
)


@register(
    "sk_kmv_setops",
    f"""
    WITH a AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ), b AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), tagged AS (
        SELECT {sql_hash60("CAST(user_id AS VARCHAR)")} AS h,
               max(in_a) AS in_a, max(in_b) AS in_b
        FROM (
            SELECT user_id, 1 AS in_a, 0 AS in_b FROM a
            UNION ALL
            SELECT user_id, 0, 1 FROM b
        ) GROUP BY 1
    ), union_k AS (
        SELECT * FROM tagged ORDER BY h LIMIT {KMV_EST_K}
    ), sk AS (
        SELECT count(*) AS k_used, max(h) AS kth,
               sum(in_a * in_b) AS sh_both,
               sum(in_a * (1 - in_b)) AS sh_only_a,
               sum((1 - in_a) * in_b) AS sh_only_b
        FROM union_k
    ), est AS (
        SELECT CAST({_sql_kmv_est('kth', 'k_used')} AS BIGINT) AS union_est,
               k_used, sh_both, sh_only_a, sh_only_b
        FROM sk
    ), exact AS (
        SELECT CAST(count(*) AS BIGINT) AS n_union,
               CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
               CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS n_only_a,
               CAST(sum((1 - in_a) * in_b) AS BIGINT) AS n_only_b
        FROM tagged
    )
    SELECT 'union' AS op, union_est AS est, n_union AS exact
    FROM est, exact
    UNION ALL
    SELECT 'intersect', CAST((sh_both * union_est) // k_used AS BIGINT),
           n_both FROM est, exact
    UNION ALL
    SELECT 'only_a', CAST((sh_only_a * union_est) // k_used AS BIGINT),
           n_only_a FROM est, exact
    UNION ALL
    SELECT 'only_b', CAST((sh_only_b * union_est) // k_used AS BIGINT),
           n_only_b FROM est, exact
    """,
    doc="KMV set algebra: union/intersection/difference cardinality"
    " estimates from ONE bottom-k sketch of the tagged union, each with"
    " its exact audit",
)
def sk_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full set-algebra readout of a single KMV sketch: the bottom-k
    of the tagged union is a uniform sample of the union, so any
    membership predicate's fraction inside it, times the KMV union
    estimate, estimates that subset's cardinality — union, intersection
    and both one-sided differences from one constant-size sketch, no
    re-scan per operation. The exact audit (one aggregate over the
    tagged-distinct table) rides along; at 100 TB you ship only the
    16-row sketch per audience and merge sketches by union+re-truncate."""
    ev = load_table(spark, sf_dir, "events")

    def audience(t: str, col: str, other: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .select("user_id")
            .distinct()
            .select("user_id", F.lit(1).alias(col), F.lit(0).alias(other))
        )

    a = audience("click", "in_a", "in_b").select("user_id", "in_a", "in_b")
    b = audience("purchase", "in_b", "in_a").select("user_id", "in_a", "in_b")
    tagged = (
        a.unionByName(b)
        .groupBy(hash60(F.col("user_id").cast("string")).alias("h"))
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    sk = (
        tagged.orderBy("h")
        .limit(KMV_EST_K)
        .agg(
            F.count("*").alias("k_used"),
            F.max("h").alias("kth"),
            F.sum(F.expr("in_a * in_b")).alias("sh_both"),
            F.sum(F.expr("in_a * (1 - in_b)")).alias("sh_only_a"),
            F.sum(F.expr("(1 - in_a) * in_b")).alias("sh_only_b"),
        )
    )
    est = sk.select(
        _kmv_est("kth", "k_used").cast("bigint").alias("union_est"),
        "k_used",
        "sh_both",
        "sh_only_a",
        "sh_only_b",
    )
    exact = tagged.agg(
        F.count("*").cast("bigint").alias("n_union"),
        F.sum(F.expr("in_a * in_b")).cast("bigint").alias("n_both"),
        F.sum(F.expr("in_a * (1 - in_b)")).cast("bigint").alias("n_only_a"),
        F.sum(F.expr("(1 - in_a) * in_b")).cast("bigint").alias("n_only_b"),
    )
    j = est.crossJoin(F.broadcast(exact))
    rows = [
        ("union", "union_est", "n_union"),
        ("intersect", "(sh_both * union_est) div k_used", "n_both"),
        ("only_a", "(sh_only_a * union_est) div k_used", "n_only_a"),
        ("only_b", "(sh_only_b * union_est) div k_used", "n_only_b"),
    ]
    outs = [
        j.select(
            F.lit(op).alias("op"),
            F.expr(e).cast("bigint").alias("est"),
            F.col(x).alias("exact"),
        )
        for op, e, x in rows
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
