"""Corpus curation for LLM training data: benchmark decontamination,
incremental dedup against an existing corpus index, and vocabulary-
coverage quality scoring.

These are the operations a 100 TB training-data pipeline runs *between*
crawling and training:

* **Decontamination** — remove training documents that share word
  n-grams with an evaluation benchmark (the published GPT-3/PaLM
  methodology: exact n-gram collision, not fuzzy match). Scale shape:
  the benchmark side is tiny (MBs) → build its shingle set once and
  **broadcast** it; the corpus is scanned linearly and never shuffles.
* **Incremental dedup** — yesterday's corpus already has MinHash
  signatures; today's batch must dedup against it without re-pairing
  the whole corpus. Scale shape: the corpus band index is precomputed
  (here: the signature map reused), the new batch is small → the join
  is new-batch × matching band buckets only, never corpus × corpus.
* **Vocabulary coverage** — fraction of a document's tokens found in
  the corpus's top-K vocabulary: a cheap quality prior (gibberish and
  non-prose score low). All-integer arithmetic until the final ratio,
  so the oracle matches exactly. The vocab table is tiny → broadcast.

Shingling/tokenization conventions are shared with extensions/dedup.py
so the oracles compose the same CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table, repartition_for_compute
from big_data_training_spark.extensions.dedup import (
    MINHASH_TAU,
    N_BANDS,
    N_HASHES,
    ROWS_PER_BAND,
    _LSH_PAIRS_SQL_BODY,
    _signatures,
    _SQL_SIG_CTE,
)
from big_data_training_spark.functions.hashing import hash60, sql_hash60
from big_data_training_spark.registry import register

# Stand-in split predicates (stable across scale factors): the
# "benchmark" is every 20th document; the "new batch" every 10th.
EVAL_PRED = "doc_id % 20 = 0"
NEW_PRED = "doc_id % 10 = 7"

# Decontamination uses longer n-grams than near-dup shingling: the
# published methodology is ~13-gram collision (3-grams collide on
# common phrases and would flag most of any corpus). 8 fits the
# fixture document lengths while keeping collisions meaningful.
DECON_K = 8

_DECON_SHINGLES = (
    "array_distinct(transform("
    "  sequence(1, greatest(size(ws) - {k} + 1, 0)),"
    "  i -> concat_ws(' ', slice(ws, i, {k}))))"
).format(k=DECON_K)

_SQL_DECON_CTE = f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(ws[i:i+{DECON_K - 1}], ' ')
                              for i in generate_series(1, len(ws) - {DECON_K} + 1)]) AS shingles
        FROM toks WHERE len(ws) >= {DECON_K}
    )
"""


_SHINGLE_PAIR_SCHEMA = "doc_id bigint, s string"


def _shingle_pair_batches(batches):
    """Arrow-batched K-token shingling: (doc_id, shingle) pairs, distinct
    per doc (downstream joins rely on at-most-once per (doc, shingle))."""
    import pandas as pd

    for pdf in batches:
        out_d: list[int] = []
        out_s: list[str] = []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            ws = t.split() if t else []  # NULL text → no shingles, not a crash
            n = len(ws) - DECON_K + 1
            if n > 0:
                seen = set()
                for i in range(n):
                    s = " ".join(ws[i : i + DECON_K])
                    if s not in seen:
                        seen.add(s)
                        out_d.append(d)
                        out_s.append(s)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype="int64"),
                "s": pd.Series(out_s, dtype="object"),
            }
        )


def _decon_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, shingle) pairs for the whole corpus.

    Shingling runs in Arrow-batched ``mapInPandas`` rather than the
    equivalent higher-order-function chain (``transform`` + ``slice`` +
    ``concat_ws`` + ``array_distinct``): HOF lambdas evaluate
    interpreted (no whole-stage codegen), measured ~8x slower at sf0.1
    (4.4s → 0.5s). The scan stays shuffle-free and embarrassingly
    parallel either way — the batched Python pass is a per-split linear
    cost, which is the right trade for a 100 TB corpus scan."""
    docs = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "text").mapInPandas(
        _shingle_pair_batches, _SHINGLE_PAIR_SCHEMA
    )


@register(
    "dd_decontaminate_overlap",
    _SQL_DECON_CTE
    + f"""
    SELECT t.doc_id AS doc_id,
           count(DISTINCT s) AS n_hit_shingles,
           count(DISTINCT e.doc_id) AS n_eval_docs
    FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
          WHERE NOT ({EVAL_PRED})) AS t
    JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh
          WHERE {EVAL_PRED}) AS e USING (s)
    GROUP BY 1
    """,
    doc="decontamination: training docs sharing n-grams with the eval set",
    bench=True,
)
def dd_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram collision against the benchmark shingle set. The
    eval side is broadcast — a real benchmark is MBs against a 100 TB
    corpus, so the corpus scan stays shuffle-free and the flagged set
    is the only small output."""
    sh = _decon_shingled(spark, sf_dir)
    train = sh.filter(f"NOT ({EVAL_PRED})")
    eval_sh = sh.filter(EVAL_PRED).select(
        F.col("doc_id").alias("eval_doc_id"), "s"
    )
    return (
        train.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_hit_shingles"),
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
        )
    )


@register(
    "dd_decontaminate_hashed",
    _SQL_DECON_CTE
    + f"""
    SELECT t.doc_id AS doc_id,
           count(DISTINCT h) AS n_hit_shingles,
           count(DISTINCT e.doc_id) AS n_eval_docs
    FROM (SELECT doc_id, {sql_hash60('s')} AS h
          FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
                WHERE NOT ({EVAL_PRED}))) AS t
    JOIN (SELECT doc_id, {sql_hash60('s')} AS h
          FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
                WHERE {EVAL_PRED})) AS e USING (h)
    GROUP BY 1
    """,
    doc="decontamination joining on 60-bit shingle hashes, not raw strings",
    bench=True,
)
def dd_decontaminate_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-keyed decontamination: identical flags to
    ``dd_decontaminate_overlap`` but the broadcast benchmark index
    carries 8-byte hashes instead of ~50-char shingle strings — the form
    you'd actually ship to 1000 executors when the eval suite is
    hundreds of MBs. A 60-bit space makes a false collision across even
    a billion distinct shingles vanishingly rare (~4e-4), and a
    collision only ever *adds* a flag — decontamination stays safe."""
    sh = _decon_shingled(spark, sf_dir)
    train = sh.filter(f"NOT ({EVAL_PRED})").select(
        "doc_id", hash60(F.col("s")).alias("h")
    )
    eval_sh = sh.filter(EVAL_PRED).select(
        F.col("doc_id").alias("eval_doc_id"), hash60(F.col("s")).alias("h")
    )
    return (
        train.join(F.broadcast(eval_sh), "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_hit_shingles"),
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
        )
    )


@register(
    "dd_decontaminated_stats",
    _SQL_DECON_CTE
    + f"""
    , flagged AS (
        SELECT DISTINCT t.doc_id
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
              WHERE NOT ({EVAL_PRED})) AS t
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh
              WHERE {EVAL_PRED}) AS e USING (s)
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents d
    WHERE NOT ({EVAL_PRED}) AND doc_id NOT IN (SELECT doc_id FROM flagged)
    GROUP BY lang
    """,
    doc="decontamination end-to-end: drop flagged docs, surviving-corpus stats",
)
def dd_decontaminated_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal step: anti-join the contamination flags back onto the
    corpus and report what survives, per language — the go/no-go view a
    data pipeline publishes after each decontamination pass."""
    docs = load_table(spark, sf_dir, "documents").filter(f"NOT ({EVAL_PRED})")
    flagged = dd_decontaminate_overlap(spark, sf_dir).select("doc_id")
    return (
        docs.join(F.broadcast(flagged), "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "dd_incremental_lsh_probe",
    _SQL_SIG_CTE
    + f"""
    , bands AS (
        SELECT doc_id, b,
               md5(array_to_string(sig[b * {ROWS_PER_BAND} + 1 : (b + 1) * {ROWS_PER_BAND}], ',')) AS band_key,
               sig
        FROM sig, generate_series(0, {N_BANDS - 1}) AS t(b)
    ), cand AS (
        SELECT DISTINCT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id,
               n.sig AS sig_n, c.sig AS sig_c
        FROM (SELECT * FROM bands WHERE {NEW_PRED}) AS n
        JOIN (SELECT * FROM bands WHERE NOT ({NEW_PRED})) AS c
          ON n.b = c.b AND n.band_key = c.band_key
    ), scored AS (
        SELECT new_doc_id, corpus_doc_id,
               (SELECT count(*) FROM generate_series(1, {N_HASHES}) AS g(i)
                WHERE sig_n[i] = sig_c[i])::DOUBLE / {N_HASHES} AS est_jaccard
        FROM cand
    )
    SELECT new_doc_id, corpus_doc_id, round(est_jaccard, 4) AS est_jaccard
    FROM scored WHERE est_jaccard >= {MINHASH_TAU}
    """,
    doc="incremental dedup: probe a new batch against the corpus LSH index",
)
def dd_incremental_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup: band the new batch's signatures and equi-join
    them against the standing corpus band index. No corpus self-join
    ever happens — cost is new-batch size × bucket hit rate. At 100 TB
    the corpus index is a persisted table bucketed by (b, band_key);
    the probe is then an exchange-free bucket join."""
    sig = _signatures(spark, sf_dir)
    band_expr = F.explode(
        F.expr(
            f"transform(sequence(0, {N_BANDS - 1}),"
            f" b -> struct(b as b, md5(concat_ws(',', transform("
            f"   slice(sig, b * {ROWS_PER_BAND} + 1, {ROWS_PER_BAND}),"
            f"   x -> cast(x as string)))) as band_key))"
        )
    ).alias("bk")
    bands = sig.select("doc_id", "sig", band_expr).select(
        "doc_id", "sig", F.col("bk.b").alias("b"), F.col("bk.band_key").alias("band_key")
    )
    new = bands.filter(NEW_PRED).alias("n")
    corpus = bands.filter(f"NOT ({NEW_PRED})").alias("c")
    est = (
        F.size(
            F.filter(F.zip_with("n.sig", "c.sig", lambda x, y: x == y), lambda v: v)
        )
        / F.lit(N_HASHES)
    )
    return (
        F.broadcast(new)
        .join(
            corpus,
            (F.col("n.b") == F.col("c.b"))
            & (F.col("n.band_key") == F.col("c.band_key")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc_id"),
            F.col("c.doc_id").alias("corpus_doc_id"),
            est.alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= MINHASH_TAU)
        .groupBy("new_doc_id", "corpus_doc_id")
        .agg(F.round(F.max("est_jaccard"), 4).alias("est_jaccard"))
    )


VOCAB_TOP_K = 100


@register(
    "tx_vocab_coverage",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
        FROM documents
    ), vocab AS (
        SELECT w FROM (
            SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rk
            FROM toks GROUP BY w
        ) WHERE rk <= {VOCAB_TOP_K}
    )
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
           round(sum(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS coverage
    FROM toks t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY doc_id
    """,
    doc="quality prior: per-doc coverage of the corpus top-100 vocabulary",
)
def tx_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass vocabulary coverage: (1) aggregate the global top-K
    vocabulary (tiny, ties broken deterministically by word); (2)
    broadcast it back over the token stream. Integer counts throughout;
    the only double is the final rounded ratio, so Spark and the oracle
    agree bit-for-bit. At 100 TB pass 1 is a partial-agg word count
    (A1) and pass 2 a broadcast hash join — no corpus shuffle."""
    docs = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), w -> w != '')")).alias("w"),
    )
    counts = toks.groupBy("w").agg(F.count("*").alias("n"))
    # global top-K via orderBy().limit(): TakeOrderedAndProject — each
    # partition keeps its local top-K before the driver merge, never a
    # single-task row_number window over the whole vocabulary.
    vocab = counts.orderBy(F.desc("n"), F.asc("w")).limit(VOCAB_TOP_K).select("w")
    hit = F.when(F.col("v_w").isNotNull(), 1).otherwise(0)
    return (
        toks.join(
            F.broadcast(vocab.withColumnRenamed("w", "v_w")),
            toks["w"] == F.col("v_w"),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(hit).alias("n_in_vocab"),
            F.round(F.sum(hit) / F.count("*"), 4).alias("coverage"),
        )
    )


TITLE_LEN = 24
FUZZY_ED = 1

# Deletion variants of the title: the string itself plus every string
# obtained by deleting one character. FastSS blocking theorem: if
# ed(s, t) <= 1 then their variant sets intersect (equal strings share
# s; a substitution shares the both-sides deletion; an insertion's
# extra char deleted yields the other string). Collisions can
# overgenerate, so candidates are re-checked with exact levenshtein.
_DELETION_VARIANTS = (
    "array_distinct(concat(array(title), transform("
    "  sequence(1, length(title)),"
    "  i -> concat(substring(title, 1, i - 1), substring(title, i + 1)))))"
)


@register(
    "dd_fuzzy_title_pairs",
    f"""
    WITH titles AS (
        SELECT doc_id, substring(text, 1, {TITLE_LEN}) AS title FROM documents
    )
    SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
           levenshtein(a.title, b.title) AS ed
    FROM titles a JOIN titles b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.title, b.title) <= {FUZZY_ED}
    """,
    doc="fuzzy near-dup join: edit-distance<=1 titles via deletion blocking",
)
def dd_fuzzy_title_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-level near-dup: pairs of documents whose leading
    {TITLE_LEN} chars are within edit distance 1, found WITHOUT the
    quadratic all-pairs scan the oracle runs. Each title explodes into
    ~{TITLE_LEN} deletion variants; an equi-join on the variant is the
    candidate generator (sound for ed<=1 per FastSS), and the exact
    levenshtein filter keeps only true matches. At 100 TB the variant
    join is the same inverted-index shape as the shingle joins:
    shuffle keyed on variant, bucket sizes bounded by title entropy."""
    docs = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    titles = docs.select(
        "doc_id", F.substring("text", 1, TITLE_LEN).alias("title")
    )
    variants = titles.select(
        "doc_id", "title", F.explode(F.expr(_DELETION_VARIANTS)).alias("v")
    )
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_i"),
            F.col("b.doc_id").alias("doc_j"),
            F.col("a.title").alias("title_i"),
            F.col("b.title").alias("title_j"),
        )
        .dropDuplicates(["doc_i", "doc_j"])
    )
    ed = F.levenshtein("title_i", "title_j")
    return cand.filter(ed <= FUZZY_ED).select(
        "doc_i", "doc_j", ed.cast("bigint").alias("ed")
    )


@register(
    "dd_keep_best_representative",
    (_SQL_SIG_CTE + _LSH_PAIRS_SQL_BODY).replace(
        "WITH toks", "WITH RECURSIVE toks"
    )
    + f"""
    , pairs AS (
        SELECT doc_i, doc_j FROM scored WHERE est_jaccard >= {MINHASH_TAU}
    ), e AS (
        SELECT doc_i AS src, doc_j AS dst FROM pairs
        UNION
        SELECT doc_j AS src, doc_i AS dst FROM pairs
    ), closure(node, comp) AS (
        SELECT DISTINCT src, src FROM e
        UNION
        SELECT e.dst, c.comp FROM closure c JOIN e ON e.src = c.node
    ), labels AS (
        SELECT node AS doc_id, min(comp) AS component_id
        FROM closure GROUP BY node
    ), ranked AS (
        SELECT l.component_id, d.doc_id, d.n_chars,
               row_number() OVER (PARTITION BY l.component_id
                                  ORDER BY d.n_chars DESC, d.doc_id) AS rk
        FROM labels l JOIN documents d ON d.doc_id = l.doc_id
    )
    SELECT component_id, doc_id AS keeper_doc_id, n_chars AS keeper_chars,
           (SELECT count(*) FROM labels x
            WHERE x.component_id = ranked.component_id) AS n_docs
    FROM ranked WHERE rk = 1
    """,
    doc="dedup keep-best: longest representative per near-dup cluster",
    bench=True,
)
def dd_keep_best_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step a real pipeline runs after clustering: keep ONE doc per
    near-dup component — the longest (ties → lowest id), not an
    arbitrary min-id — because near-dups are usually truncations or
    boilerplate-wrapped variants of the same content. Composes the LSH
    pair miner → large-star/small-star components → a per-component
    window. Docs in no pair are their own implicit cluster and pass
    through untouched upstream; only clustered docs appear here."""
    from pyspark.sql import Window

    from big_data_training_spark.extensions.dedup import dd_cluster_components

    labels = dd_cluster_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    sized = labels.join(docs, "doc_id")
    counted = sized.groupBy("component_id").agg(F.count("*").alias("n_docs"))
    return (
        sized.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .join(F.broadcast(counted), "component_id")
        .select(
            "component_id",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("n_chars").alias("keeper_chars"),
            "n_docs",
        )
    )


# --- Bloom-filter decontamination -------------------------------------
#
# The hashed variant above broadcasts one 8-byte hash per benchmark
# shingle; for a very large eval suite that broadcast is still
# O(shingles). A bloom filter caps the shipped state at a fixed size
# (here 16384 words x 63 usable bits = ~126 KB) at the cost of a
# bounded, one-sided false-positive rate — a false positive only ever
# ADDS a flag, so decontamination stays safe (no false negatives, the
# bloom guarantee). Geometry: ~22.5k eval shingles at sf0.1 against
# ~1.03M bits with 3 probes -> ~2.5e-4 per-shingle FP, under ~2% per
# document. 63 bits per word keeps every shift below the bigint sign
# bit so shift/mask semantics are engine-identical (same convention as
# extensions/sketches.py).
DECON_BLOOM_WORDS = 16384
DECON_BLOOM_BITS = DECON_BLOOM_WORDS * 63
DECON_BLOOM_PROBES = 3


def _sql_decon_bloom_pos(i: int, key_expr: str) -> str:
    salted = f"'dbf{i}:' || {key_expr}"
    return f"{sql_hash60(salted)} % {DECON_BLOOM_BITS}"


_SQL_DECON_BLOOM = (
    _SQL_DECON_CTE
    + f"""
    , eval_sh AS (
        SELECT DISTINCT s FROM (SELECT unnest(shingles) AS s FROM sh
                                WHERE {EVAL_PRED})
    ), build_pos AS (
        {" UNION ALL ".join(f"SELECT {_sql_decon_bloom_pos(i, 's')} AS pos FROM eval_sh" for i in range(DECON_BLOOM_PROBES))}
    ), words AS (
        SELECT pos // 63 AS word,
               bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS w
        FROM build_pos GROUP BY 1
    ), corpus_sh AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
        WHERE NOT ({EVAL_PRED})
    ), probe_pos AS (
        {" UNION ALL ".join(f"SELECT doc_id, s, {_sql_decon_bloom_pos(i, 's')} AS pos FROM corpus_sh" for i in range(DECON_BLOOM_PROBES))}
    ), shingle_hits AS (
        SELECT doc_id, s,
               min(CASE WHEN ((coalesce(w.w, 0) >> CAST(p.pos % 63 AS INT)) & 1) = 1
                        THEN 1 ELSE 0 END) AS maybe
        FROM probe_pos p LEFT JOIN words w ON w.word = p.pos // 63
        GROUP BY doc_id, s
    ), doc_flags AS (
        SELECT h.doc_id,
               max(h.maybe) AS bloom_flag,
               max(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END) AS exact_flag
        FROM shingle_hits h LEFT JOIN eval_sh e ON e.s = h.s
        GROUP BY h.doc_id
    )
    SELECT d.source AS source,
           count(*) AS n_docs,
           CAST(sum(coalesce(f.bloom_flag, 0)) AS BIGINT) AS n_flagged_bloom,
           CAST(sum(coalesce(f.exact_flag, 0)) AS BIGINT) AS n_flagged_exact,
           CAST(sum(coalesce(f.bloom_flag, 0) - coalesce(f.exact_flag, 0))
                AS BIGINT) AS n_false_pos
    FROM documents d LEFT JOIN doc_flags f ON f.doc_id = d.doc_id
    WHERE NOT (d.{EVAL_PRED})
    GROUP BY 1
    """
)


@register(
    "dd_decontaminate_bloom",
    _SQL_DECON_BLOOM,
    doc="decontamination via a fixed-size bloom filter of benchmark shingles:"
    " constant broadcast state, one-sided error, per-source FP audit",
    bench=True,
)
def dd_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination where the benchmark index is a ~126 KB bloom
    filter instead of a per-shingle hash set: build is one bit_or
    aggregate over the eval shingles' probe positions, the corpus scan
    probes each shingle against the broadcast word table (16384 rows,
    an equi-join — never key-to-key against the eval set), and a doc is
    flagged if any shingle has all probe bits set. The exact string
    semi-join runs alongside purely as the audit truth: the report
    proves no false negatives (bloom >= exact per source) and counts
    the bounded false positives the fixed-size state buys. At 100 TB
    the broadcast is constant-size no matter how large the eval suite
    grows — the difference between shipping kilobytes and shipping the
    whole benchmark index to 1000 executors."""
    sh = _decon_shingled(spark, sf_dir)
    eval_sh = sh.filter(EVAL_PRED).select("s").distinct()
    build_pos = eval_sh.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        hash60(F.concat(F.lit(f"dbf{i}:"), F.col("s"))),
                        F.lit(DECON_BLOOM_BITS),
                    )
                    for i in range(DECON_BLOOM_PROBES)
                ]
            )
        ).alias("pos")
    )
    words = build_pos.groupBy(
        (F.col("pos") / 63).cast("bigint").alias("word")
    ).agg(F.bit_or(F.expr("shiftleft(1L, cast(pos % 63 as int))")).alias("w"))

    corpus_sh = sh.filter(f"NOT ({EVAL_PRED})")
    probe_pos = corpus_sh.select(
        "doc_id",
        "s",
        F.explode(
            F.array(
                *[
                    F.pmod(
                        hash60(F.concat(F.lit(f"dbf{i}:"), F.col("s"))),
                        F.lit(DECON_BLOOM_BITS),
                    )
                    for i in range(DECON_BLOOM_PROBES)
                ]
            )
        ).alias("pos"),
    )
    shingle_hits = (
        probe_pos.join(
            F.broadcast(words),
            (F.col("pos") / 63).cast("bigint") == F.col("word"),
            "left",
        )
        .select(
            "doc_id",
            "s",
            F.when(
                F.expr("(shiftright(coalesce(w, 0L), cast(pos % 63 as int)) & 1) = 1"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("hit"),
        )
        .groupBy("doc_id", "s")
        .agg(F.min("hit").alias("maybe"))
    )
    doc_flags = (
        shingle_hits.join(
            F.broadcast(eval_sh.withColumn("in_eval", F.lit(1))), "s", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.max("maybe").alias("bloom_flag"),
            F.max(F.coalesce("in_eval", F.lit(0))).alias("exact_flag"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").filter(f"NOT ({EVAL_PRED})")
    return (
        docs.join(doc_flags, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("bloom_flag", F.lit(0))).alias("n_flagged_bloom"),
            F.sum(F.coalesce("exact_flag", F.lit(0))).alias("n_flagged_exact"),
            F.sum(
                F.coalesce("bloom_flag", F.lit(0))
                - F.coalesce("exact_flag", F.lit(0))
            ).alias("n_false_pos"),
        )
    )


@register(
    "dd_contaminated_eval_report",
    _SQL_DECON_CTE
    + f"""
    SELECT e.doc_id AS eval_doc_id,
           count(DISTINCT t.doc_id) AS n_corpus_docs,
           count(DISTINCT e.s) AS n_leaked_shingles
    FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
          WHERE {EVAL_PRED}) AS e
    JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh
          WHERE NOT ({EVAL_PRED})) AS t USING (s)
    GROUP BY 1
    """,
    doc="decontamination observability: which eval docs leak into the"
    " corpus, by corpus-doc count and distinct leaked shingles",
)
def dd_contaminated_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse view of dd_decontaminate_overlap: per BENCHMARK doc,
    how many training documents share an n-gram with it and how many of
    its shingles leaked. This is the report an eval-integrity review
    reads — a benchmark item leaked into thousands of corpus docs is
    compromised even after decontamination removes them, because the
    removal only fixes THIS corpus, not the model zoo trained before.
    Same broadcast-eval join shape as the decontaminate queries: the
    corpus scans once, the grouped output is eval-sized (tiny)."""
    sh = _decon_shingled(spark, sf_dir)
    train = sh.filter(f"NOT ({EVAL_PRED})").select(
        F.col("doc_id").alias("corpus_doc_id"), "s"
    )
    eval_sh = sh.filter(EVAL_PRED).select(
        F.col("doc_id").alias("eval_doc_id"), "s"
    )
    return (
        train.join(F.broadcast(eval_sh), "s")
        .groupBy("eval_doc_id")
        .agg(
            F.countDistinct("corpus_doc_id").alias("n_corpus_docs"),
            F.countDistinct("s").alias("n_leaked_shingles"),
        )
    )
