"""Corpus-level statistics for training-data planning: an exact Gram
matrix over quantized embeddings (the PCA/whitening input), a Zipf
rank-frequency curve, and an n-gram coverage curve (how much of the
corpus the top-N bigrams explain).

All three are integer-exact by construction — quantize-then-multiply
for the Gram matrix, counts and count-products for the curves — so the
DuckDB oracles compare hash-exact. Scale design: the Gram matrix is the
canonical map-side-combine job (one d x d int64 accumulator per Arrow
batch, merged by a d^2-row shuffle — corpus size never crosses the
network); the curves are one word/bigram count plus a driver-size
window over the top slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark.data import load_table, repartition_for_compute
from big_data_training_spark.functions.text import SQL_TOKENS, tokens
from big_data_training_spark.lineage import truncate_lineage
from big_data_training_spark.registry import register

EMB_DIM = 64
QUANT_SCALE = 1000  # fixed-point: round(x * 1000) as int — exact both engines


def _gram_batches(batches):
    """Per-batch d x d int64 Gram accumulation: Q^T Q for the batch's
    quantized matrix, emitted as upper-triangle (i, j, dot) rows.
    Values |q| <= ~500, batches <= 10k rows: per-batch dots < 2.5e9 —
    headroom of ~4e9x under int64."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if not len(pdf):  # empty partition → no partial to emit
            continue
        mat = np.vstack(pdf["embedding"].to_numpy())
        q = np.rint(mat.astype("float64") * QUANT_SCALE).astype("int64")
        g = q.T @ q
        iu = np.triu_indices(g.shape[0])
        yield pd.DataFrame(
            {
                "i": pd.Series(iu[0] + 1, dtype="int64"),
                "j": pd.Series(iu[1] + 1, dtype="int64"),
                "dot": pd.Series(g[iu], dtype="int64"),
            }
        )


# Shared CTE body: the quantized Gram matrix (upper triangle) — reused
# by the power-iteration oracle below so the two can never drift.
_SQL_GRAM = f"""
    q AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS BIGINT)
                for x in embedding] AS qv
        FROM embeddings
    ),
    e AS (
        SELECT vec_id,
               CAST(generate_subscripts(qv, 1) AS BIGINT) AS i,
               unnest(qv) AS v
        FROM q
    ),
    gram AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS dot
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
    )
"""


@register(
    "emb_gram_exact",
    "WITH " + _SQL_GRAM + "SELECT i, j, dot FROM gram",
    doc="exact int64 Gram matrix (upper triangle) over fixed-point"
    " quantized embeddings — the PCA/whitening input",
    bench=True,
)
def emb_gram_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The covariance-side input to PCA / whitening / OPQ rotation
    training, computed exactly: embeddings are quantized to fixed-point
    ints (round(x*1000) — identical in both engines), then G = Q^T Q.
    Spark plan: one mapInPandas pass emits a d x d partial Gram per
    Arrow batch (numpy int64 matmul), and the only shuffle carries
    d^2-bounded rows (2080 upper-triangle cells here) regardless of
    corpus size — at 100 TB this is the textbook map-side-combine job.
    """
    emb = repartition_for_compute(load_table(spark, sf_dir, "embeddings"))
    partials = emb.select("embedding").mapInPandas(
        _gram_batches, "i bigint, j bigint, dot bigint"
    )
    return partials.groupBy("i", "j").agg(F.sum("dot").alias("dot"))


ZIPF_RANKS = tuple(2**p for p in range(11))  # 1, 2, 4, ..., 1024


@register(
    "lm_zipf_curve",
    f"""
    WITH wc AS (
        SELECT w AS word, count(*) AS freq
        FROM (SELECT unnest({SQL_TOKENS.format(col='text')}) AS w FROM documents)
        GROUP BY 1
    ),
    ranked AS (
        SELECT word, freq,
               row_number() OVER (ORDER BY freq DESC, word ASC) AS rank
        FROM wc
    )
    SELECT CAST(rank AS BIGINT) AS rank, word, freq,
           CAST(rank * freq AS BIGINT) AS rank_x_freq
    FROM ranked
    WHERE rank IN ({", ".join(str(r) for r in ZIPF_RANKS)})
    """,
    doc="Zipf rank-frequency checkpoints at power-of-two ranks:"
    " rank*freq flatness is the Zipfian-shape diagnostic",
)
def lm_zipf_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's law says rank*frequency is roughly constant; corpora that
    violate it (boilerplate floods, synthetic spam) show a bent curve.
    Sampling the curve at power-of-two ranks keeps the report integer-
    exact (no log regression, no float drift) while still exposing the
    shape. One count shuffle, then a distributed top-k
    (TakeOrderedAndProject — per-partition heads merged on the driver,
    no global sort) bounds the ranking window to max(ZIPF_RANKS) rows,
    so the single-partition row_number is over a constant-size slice at
    any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    top = wc.orderBy(F.desc("freq"), F.asc("word")).limit(max(ZIPF_RANKS))
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("word"))),
    )
    return ranked.filter(F.col("rank").isin(list(ZIPF_RANKS))).select(
        F.col("rank").cast("bigint").alias("rank"),
        "word",
        "freq",
        (F.col("rank") * F.col("freq")).cast("bigint").alias("rank_x_freq"),
    )


COVERAGE_NS = tuple(4**p for p in range(1, 7))  # 4, 16, ..., 4096


@register(
    "lm_bigram_coverage_curve",
    f"""
    WITH toks AS (
        SELECT {SQL_TOKENS.format(col='text')} AS ws FROM documents
    ),
    bg AS (
        SELECT b.w1 || ' ' || b.w2 AS bigram, count(*) AS freq
        FROM (
            SELECT unnest([struct_pack(w1 := ws[i], w2 := ws[i + 1])
                           for i in generate_series(1, len(ws) - 1)]) AS b
            FROM toks WHERE len(ws) >= 2
        )
        GROUP BY 1
    ),
    ranked AS (
        SELECT freq, row_number() OVER (ORDER BY freq DESC, bigram ASC) AS rank,
               sum(freq) OVER (ORDER BY freq DESC, bigram ASC
                               ROWS UNBOUNDED PRECEDING) AS cum_freq
        FROM bg
    ),
    total AS (SELECT sum(freq) AS t FROM bg)
    SELECT CAST(r.rank AS BIGINT) AS top_n,
           CAST(r.cum_freq AS BIGINT) AS covered_bigrams,
           CAST(r.cum_freq * 1000 // total.t AS BIGINT) AS coverage_permille
    FROM ranked r, total
    WHERE r.rank IN ({", ".join(str(n) for n in COVERAGE_NS)})
    """,
    doc="cumulative corpus share of the top-N bigrams at N=4^1..4^6 —"
    " the vocabulary-size / compression planning curve",
)
def lm_bigram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the corpus do the most frequent N bigrams cover?
    The curve drives tokenizer-vocabulary and cache sizing: a corpus
    where 4k bigrams cover 90% compresses very differently from a flat
    one. Exact integers: cumulative counts and permille floor-division.
    One bigram-count shuffle; a distributed top-k bounds the running-
    sum window to max(COVERAGE_NS) rows (the total comes from a
    separate full aggregate), so nothing corpus- or vocabulary-sized
    ever sorts globally."""
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(tokens("text").alias("ws")).filter(F.size("ws") >= 2)
    bg = (
        ws.select(
            F.explode(
                F.zip_with(
                    F.slice("ws", 1, F.size("ws") - 1),
                    F.slice("ws", 2, F.size("ws") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").alias("freq"))
    )
    top = bg.orderBy(F.desc("freq"), F.asc("bigram")).limit(max(COVERAGE_NS))
    w = Window.orderBy(F.desc("freq"), F.asc("bigram"))
    ranked = top.select(
        F.row_number().over(w).alias("rank"),
        F.sum("freq").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_freq"
        ),
    )
    total = bg.agg(F.sum("freq").alias("t"))
    return (
        ranked.filter(F.col("rank").isin(list(COVERAGE_NS)))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rank").cast("bigint").alias("top_n"),
            F.col("cum_freq").alias("covered_bigrams"),
            F.expr("cum_freq * 1000 div t").alias("coverage_permille"),
        )
    )


POWER_ROUNDS = 3
POWER_NORM = 1000  # per-round max-abs renormalization to +/-1000 fixed point


def _power_oracle() -> str:
    """Unrolled integer power iteration over the symmetrized Gram:
    u_r = G v_{r-1}, then v_r = trunc(u_r * 1000 / max|u_r|). On
    INTEGER operands DuckDB's // truncates toward zero (-7 // 2 = -3),
    exactly like Spark's div, so negative components stay
    bit-identical across engines."""
    ctes = [
        """sym AS MATERIALIZED (
            SELECT i, j, dot FROM gram
            UNION ALL
            SELECT j AS i, i AS j, dot FROM gram WHERE i < j
        )""",
        f"""v0 AS (
            SELECT DISTINCT i AS j, CAST({POWER_NORM} AS BIGINT) AS v
            FROM sym
        )""",
    ]
    for r in range(1, POWER_ROUNDS + 1):
        ctes.append(
            f"""u{r} AS MATERIALIZED (
            SELECT s.i AS j, CAST(sum(s.dot * v.v) AS BIGINT) AS u
            FROM sym s JOIN v{r - 1} v ON s.j = v.j
            GROUP BY 1
        )"""
        )
        ctes.append(
            f"""v{r} AS MATERIALIZED (
            SELECT j,
                   CAST((u * {POWER_NORM})
                        // (SELECT max(abs(u)) FROM u{r}) AS BIGINT) AS v
            FROM u{r}
        )"""
        )
    return (
        "WITH "
        + _SQL_GRAM
        + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT j AS dim, v AS component_permille FROM v{POWER_ROUNDS}"
    )


@register(
    "emb_power_iteration",
    _power_oracle(),
    doc="dominant eigenvector of the embedding Gram matrix via 3 rounds"
    " of integer-exact power iteration (distributed matvec)",
    bench=True,
)
def emb_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top principal direction of the embedding cloud — the first
    step of PCA whitening / OPQ rotation training — as distributed
    linear algebra: the Gram matrix lives as (i, j, dot) rows and each
    power-iteration round is one matvec = join on the column index +
    sum by row index. Fixed-point renormalization (floor(u*1000 /
    max|u|)) keeps every intermediate an int64 (bounded by
    d * max|G| * 1000 ~ 3e16), so three rounds are bit-identical to the
    oracle's unrolled CTEs. At d=4096 the Gram is a 16M-row table and
    the matvec a bounded-size shuffle — corpus size only enters through
    the (already-aggregated) Gram."""
    gram = emb_gram_exact(spark, sf_dir)
    sym = (
        gram.unionByName(
            gram.filter(F.col("i") < F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "dot"
            )
        )
        .transform(truncate_lineage)
    )
    v = sym.select(F.col("i").alias("j")).distinct().withColumn(
        "v", F.lit(POWER_NORM).cast("bigint")
    )
    for _ in range(POWER_ROUNDS):
        # v is d rows at ANY corpus size (the iterate of a d×d Gram
        # matvec) — the canonical broadcast; without the hint Catalyst
        # shuffles the Gram table on j every round (aggregate outputs
        # carry no size estimate)
        u = (
            sym.join(F.broadcast(v), "j")
            .groupBy(F.col("i").alias("jj"))
            .agg(F.sum(F.col("dot") * F.col("v")).alias("u"))
            .select(F.col("jj").alias("j"), "u")
        )
        s = u.agg(F.max(F.abs(F.col("u"))).alias("s"))
        # truncating integer division == DuckDB's // on BIGINT operands
        v = (
            u.crossJoin(F.broadcast(s))
            .select(
                "j",
                F.expr(f"(u * {POWER_NORM}) div s").cast("bigint").alias("v"),
            )
        )
    return v.select(F.col("j").alias("dim"), F.col("v").alias("component_permille"))


@register(
    "lm_effective_token_budget",
    f"""
    WITH tok AS (
        SELECT doc_id, source, md5(text) AS ch,
               coalesce(len({SQL_TOKENS.format(col='text')}), 0) AS n_tok
        FROM documents
    ),
    keep AS (SELECT min(doc_id) AS keeper FROM tok GROUP BY ch)
    SELECT t.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN k.keeper IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keepers,
           CAST(sum(n_tok) AS BIGINT) AS raw_tokens,
           CAST(sum(CASE WHEN k.keeper IS NOT NULL THEN n_tok ELSE 0 END)
                AS BIGINT) AS effective_tokens,
           CAST((sum(n_tok)
                 - sum(CASE WHEN k.keeper IS NOT NULL THEN n_tok ELSE 0 END))
                * 1000 // greatest(sum(n_tok), 1) AS BIGINT)
               AS savings_permille
    FROM tok t
    LEFT JOIN keep k ON k.keeper = t.doc_id
    GROUP BY 1
    """,
    doc="dedup-adjusted token budget per source: raw vs effective"
    " (keeper-only) tokens and the dedup savings share",
)
def lm_effective_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a token budget is really worth after exact dedup: per
    source, raw token count vs the count over content-hash keepers
    (min doc_id per hash, credited to the keeper's source) and the
    permille saved. The planning number behind 'we have X tokens':
    duplicated boilerplate inflates X without adding signal. One
    hash-keyed aggregation plus a keeper semi-join — the same shuffle
    shape as dd_exact_dedup."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("ch"),
        F.coalesce(F.size(tokens("text")), F.lit(0)).alias("n_tok"),
    )
    keep = tok.groupBy("ch").agg(F.min("doc_id").alias("keeper"))
    joined = tok.join(
        keep.select(F.col("keeper").alias("doc_id")).withColumn(
            "is_keeper", F.lit(1)
        ),
        "doc_id",
        "left",
    )
    kept_tok = F.sum(
        F.when(F.col("is_keeper").isNotNull(), F.col("n_tok")).otherwise(0)
    )
    raw_tok = F.sum("n_tok")
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("is_keeper").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_keepers"),
        raw_tok.cast("bigint").alias("raw_tokens"),
        kept_tok.cast("bigint").alias("effective_tokens"),
        F.expr(
            "(sum(n_tok) - sum(CASE WHEN is_keeper IS NOT NULL THEN n_tok"
            " ELSE 0 END)) * 1000 div greatest(sum(n_tok), 1)"
        )
        .cast("bigint")
        .alias("savings_permille"),
    )
