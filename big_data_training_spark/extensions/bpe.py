"""Byte-pair-encoding tokenizer training — the real iterative loop.

``lm_bpe_merge_candidates`` (extensions/lmstats.py) scores the FIRST
round's merge candidates; this module runs the actual training
recurrence the reference's data-pipeline story needs end-to-end
(kafka/README.md's per-record transform stage feeding an LLM corpus):

    count adjacent pairs -> pick best merge -> re-apply -> re-count

for ``N_MERGES`` rounds, then encodes the corpus with the learned
merges and reports per-source compression.

Cross-engine exactness trick: a word's token sequence is encoded as
bracket-wrapped units — ``"the" -> "(t)(h)(e)"``. Applying the merge
``(h)(e) -> (he)`` is then plain ``replace()`` (substring, all
occurrences, left-to-right non-overlapping scan) in BOTH dialects,
and that scan IS greedy BPE merge application:

* a pattern match cannot start inside a longer token — ``(`` appears
  only at unit starts (the corpus is restricted to ``[a-z]+`` words,
  so no literal parens exist inside tokens);
* consecutive occurrences share no characters — the pattern starts at
  ``(`` and ends at ``)`` with no separator between units — so
  ``(a)(a)(a)(a)`` correctly becomes ``(aa)(aa)`` in one pass (the
  space-separated encoding every naive port uses gets this WRONG: the
  shared delimiter is consumed by the previous match).

Scale design (100 TB): the training recurrence runs on the DISTINCT
word-frequency table, not the corpus — bounded by vocabulary size
(~10^7 at web scale), shuffled once per round on a short pair key with
map-side partial aggregation. The argmax is a 1-row broadcast
(TakeOrderedAndProject, then broadcast cross join), so no round ever
re-scans the corpus; the corpus is touched exactly twice (word
histogram, final encode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

N_MERGES = 4
_UNIT_RE = r"\([a-z]+\)"  # one bracket-wrapped token unit
_WORD_RE = "[a-z]+"


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, wf) over alphabetic lowercase words + the bracket seq."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(_WORD_RE), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("wf"))
        .withColumn("seq", F.regexp_replace("word", "(.)", "($1)"))
    )


def _best_merge(seqs: DataFrame) -> DataFrame:
    """1-row DataFrame (pair, merged, wc): the highest-weight adjacent
    pair, ties broken lexicographically. The pair key is the
    concatenation of two bracket units; the merged unit just drops the
    inner ``)(``."""
    units = F.regexp_extract_all("seq", F.lit(_UNIT_RE), F.lit(0))
    pairs = (
        seqs.select("wf", units.alias("us"))
        .filter(F.size("us") >= 2)
        .select(
            "wf",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(us) - 1),"
                    " i -> concat(element_at(us, i), element_at(us, i + 1)))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("wf").alias("wc"))
    )
    return (
        pairs.orderBy(F.desc("wc"), F.asc("pair"))
        .limit(1)
        .select("pair", F.expr("replace(pair, ')(', '')").alias("merged"), "wc")
    )


def _train(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Run N_MERGES rounds; return (merge log, final seqs)."""
    seqs = _word_freqs(spark, sf_dir)
    log_rows = None
    for r in range(1, N_MERGES + 1):
        best = _best_merge(seqs)
        row = best.select(
            F.lit(r).cast("int").alias("round"), "pair", "merged", "wc"
        )
        log_rows = row if log_rows is None else log_rows.unionAll(row)
        # Apply the merge corpus-wide: broadcast the 1-row argmax.
        seqs = seqs.join(F.broadcast(best)).select(
            "word", "wf", F.expr("replace(seq, pair, merged)").alias("seq")
        )
    return log_rows, seqs


def _sql_rounds() -> str:
    """Unrolled MATERIALIZED training rounds (DuckDB re-expands CTEs
    referenced twice unless materialized — measured 2^R blowup on the
    PageRank oracles, extensions/graphalgo.py)."""
    ctes = f"""
    WITH words AS MATERIALIZED (
        SELECT w AS word, count(*) AS wf
        FROM (SELECT unnest(regexp_extract_all(lower(text), '{_WORD_RE}')) AS w
              FROM documents)
        GROUP BY 1
    ),
    s0 AS MATERIALIZED (
        SELECT word, wf, regexp_replace(word, '(.)', '(\\1)', 'g') AS seq
        FROM words
    )"""
    for r in range(1, N_MERGES + 1):
        ctes += f""",
    p{r} AS (
        SELECT us[i] || us[i + 1] AS pair, sum(wf) AS wc
        FROM (SELECT wf, us, unnest(range(1, len(us))) AS i
              FROM (SELECT wf, regexp_extract_all(seq, '{_UNIT_RE}') AS us
                    FROM s{r - 1})
              WHERE len(us) >= 2)
        GROUP BY 1
    ),
    b{r} AS MATERIALIZED (
        SELECT {r} AS round, pair, replace(pair, ')(', '') AS merged,
               CAST(wc AS BIGINT) AS wc
        FROM p{r} ORDER BY wc DESC, pair LIMIT 1
    ),
    s{r} AS MATERIALIZED (
        SELECT word, wf,
               replace(seq, (SELECT pair FROM b{r}),
                       (SELECT merged FROM b{r})) AS seq
        FROM s{r - 1}
    )"""
    return ctes


_SQL_TRAIN = (
    _sql_rounds()
    + "\n    "
    + " UNION ALL ".join(
        f"SELECT round, pair, merged, wc FROM b{r}"
        for r in range(1, N_MERGES + 1)
    )
    + "\n    ORDER BY round"
)


@register(
    "lm_bpe_train_rounds",
    _SQL_TRAIN,
    doc=f"iterative BPE training: {N_MERGES} merge rounds (re-count after"
    " each merge) over the corpus word histogram",
)
def lm_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge log: one row per training round with the chosen pair,
    the merged unit it creates, and its corpus-weighted count at the
    time it was picked (counts CHANGE between rounds — that is the
    difference from one-shot candidate scoring)."""
    log_rows, _ = _train(spark, sf_dir)
    return log_rows.orderBy("round")


_SQL_ENCODE = (
    _sql_rounds()
    + f""",
    wsrc AS (
        SELECT source, w AS word, count(*) AS c
        FROM (SELECT source,
                     unnest(regexp_extract_all(lower(text), '{_WORD_RE}')) AS w
              FROM documents)
        GROUP BY 1, 2
    )
    SELECT wsrc.source,
           CAST(sum(wsrc.c * length(s.word)) AS BIGINT) AS chars_total,
           CAST(sum(wsrc.c * (length(s.seq) -
                length(replace(s.seq, '(', '')))) AS BIGINT) AS tokens_total,
           CAST((1000 * sum(wsrc.c * (length(s.seq) -
                 length(replace(s.seq, '(', ''))))) //
                sum(wsrc.c * length(s.word)) AS BIGINT) AS tokens_per_kilochar
    FROM wsrc JOIN s{N_MERGES} s USING (word)
    GROUP BY 1
    ORDER BY 1
"""
)


@register(
    "lm_bpe_encode_tokens",
    _SQL_ENCODE,
    doc="encode the corpus with the learned BPE merges: per-source char"
    " and token totals + tokens-per-kilochar compression",
    bench=True,
)
def lm_bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer statistics after applying the learned
    merges: the token count is the number of ``(`` unit-openers left in
    each word's sequence, weighted by per-source word counts — the
    budget number a token-packing stage (tx_token_pack) consumes.
    The vocabulary join is broadcast-able at scale (distinct words ≪
    corpus) and the corpus-side aggregation is a single keyed pass."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    wsrc = (
        docs.select(
            "source",
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(_WORD_RE), F.lit(0))
            ).alias("word"),
        )
        .groupBy("source", "word")
        .agg(F.count("*").alias("c"))
    )
    _, seqs = _train(spark, sf_dir)
    ntok = F.length("seq") - F.length(F.expr("replace(seq, '(', '')"))
    return (
        wsrc.join(F.broadcast(seqs.select("word", "seq")), "word")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * F.length("word")).cast("long").alias("chars_total"),
            F.sum(F.col("c") * ntok).cast("long").alias("tokens_total"),
            F.expr(
                "CAST((1000 * sum(c * (length(seq) - length(replace(seq, '(', '')))))"
                " div sum(c * length(word)) AS BIGINT)"
            ).alias("tokens_per_kilochar"),
        )
        .orderBy("source")
    )
