"""Language-model data statistics: BPE-style merge mining and an
n-gram continuation table.

Two corpus passes a tokenizer/LM training pipeline runs before any
model sees the data (the "process: clean/transform/analyze" stage of
the reference's pipeline, README.md:18-22, over the documents corpus):

* **BPE merge candidates** — the first induction step of byte-pair
  encoding: count every adjacent within-word symbol pair corpus-wide
  and rank. One JVM-only scan (split → per-word 2-char windows →
  count), top-K via TakeOrderedAndProject; at 100 TB this is a single
  map-side-combined aggregation on a small key space (|alphabet|²).
* **Bigram continuation table** — for the highest-frequency tokens,
  the most likely next tokens with conditional counts: the classic
  count-based LM table (and a quality signal: corpora whose
  continuation mass is too concentrated are templated/boilerplate).
  Two aggregations + one broadcast-sized join (top tokens are a
  constant-size set); the per-token top-k is a window over groups
  already reduced to counts, never over raw token instances.

All arithmetic is integer (counts, ranks) with total-order tie-breaks,
so the DuckDB oracles hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.text import SQL_TOKENS, tokens
from big_data_training_spark.registry import register

TOP_MERGES = 20
TOP_HEADS = 10
TOP_CONTINUATIONS = 3


@register(
    "lm_bpe_merge_candidates",
    f"""
    WITH words AS (
        SELECT unnest({SQL_TOKENS.format(col='text')}) AS w FROM documents
    ), pairs AS (
        SELECT unnest([substring(w, i, 2)
                       for i in generate_series(1, length(w) - 1)]) AS pair
        FROM words WHERE length(w) >= 2
    )
    SELECT pair, count(*) AS n FROM pairs
    GROUP BY pair ORDER BY n DESC, pair ASC LIMIT {TOP_MERGES}
    """,
    doc="LM: BPE merge mining — top adjacent symbol pairs corpus-wide",
)
def lm_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE induction round: every word occurrence contributes
    its adjacent character pairs (a 2-char sliding window — pair
    frequency weighted by word frequency, exactly the statistic the
    merge rule greedily maximizes). The plan is one whole-stage-codegen
    scan into a partial-aggregated count on an |alphabet|²-bounded key
    space, then TakeOrderedAndProject — no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens("text")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(TOP_MERGES)
    )


@register(
    "lm_bigram_continuations",
    f"""
    WITH toks AS (
        SELECT {SQL_TOKENS.format(col='text')} AS ws FROM documents
    ), pairs AS (
        SELECT unnest([struct_pack(w1 := ws[i], w2 := ws[i + 1])
                       for i in generate_series(1, len(ws) - 1)]) AS b
        FROM toks WHERE len(ws) >= 2
    ), bigrams AS (
        SELECT b.w1 AS w1, b.w2 AS w2 FROM pairs
    ), heads AS (
        SELECT w1, count(*) AS head_n FROM bigrams
        GROUP BY w1 ORDER BY head_n DESC, w1 ASC LIMIT {TOP_HEADS}
    ), conts AS (
        SELECT b.w1, b.w2, count(*) AS n
        FROM bigrams b JOIN heads h ON h.w1 = b.w1
        GROUP BY b.w1, b.w2
    ), ranked AS (
        SELECT w1, w2, n,
               row_number() OVER (PARTITION BY w1 ORDER BY n DESC, w2 ASC)
                   AS rank
        FROM conts
    )
    SELECT w1, w2, n, rank FROM ranked WHERE rank <= {TOP_CONTINUATIONS}
    """,
    doc="LM: conditional bigram continuation table for top head tokens",
)
def lm_bigram_continuations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based next-token table: for the {TOP_HEADS} most frequent
    bigram heads, the top continuations with conditional counts. Heads
    are a constant-size set (broadcast join prunes the bigram stream
    before the per-head aggregation); the ranking window runs over
    (head, continuation) *counts*, already reduced — never over raw
    bigram instances. row_number is cast to bigint to match DuckDB's
    window output type (the r4 dtype-strict rule)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens("text").alias("ws")).filter(F.size("ws") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> struct(element_at(ws, i) AS w1,"
                "             element_at(ws, i + 1) AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    heads = (
        bigrams.groupBy("w1")
        .agg(F.count("*").alias("head_n"))
        .orderBy(F.desc("head_n"), F.asc("w1"))
        .limit(TOP_HEADS)
        .select("w1")
    )
    conts = (
        bigrams.join(F.broadcast(heads), "w1")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("w1").orderBy(F.desc("n"), F.asc("w2"))
    return (
        conts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_CONTINUATIONS)
        .select("w1", "w2", "n", "rank")
    )


@register(
    "lm_unigram_doc_score",
    f"""
    WITH occ AS (
        SELECT doc_id, unnest({SQL_TOKENS.format(col='text')}) AS w
        FROM documents
    ), uni AS (
        SELECT w, count(*) AS cnt FROM occ GROUP BY w
    ), total AS (
        SELECT count(*) AS n FROM occ
    )
    SELECT o.doc_id, count(*) AS n_tokens,
           CAST(sum(u.cnt) * 1000 // (count(*) * max(t.n)) AS BIGINT)
               AS score_permille
    FROM occ o JOIN uni u ON u.w = o.w CROSS JOIN total t
    GROUP BY o.doc_id
    """,
    doc="LM: per-doc mean unigram corpus-frequency (permille, integer-exact)",
)
def lm_unigram_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality proxy without floats: score each document by
    the mean corpus frequency of its tokens, in permille with floor
    division, so the statistic is bit-identical in any engine (a true
    log-prob perplexity would hinge on ln() ULPs). Low scores flag
    rare-token-heavy docs (OCR noise, codey spam); high scores flag
    stopword soup. Two aggregations + one shuffle join keyed on the
    token — the key space is the vocabulary, not the corpus, and the
    grand-total join is a broadcast of one row."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    uni = occ.groupBy("w").agg(F.count("*").alias("cnt"))
    total = occ.agg(F.count("*").alias("n"))
    return (
        occ.join(uni, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.expr("sum(cnt) * 1000 div (count(*) * max(n))")
            ).cast("bigint").alias("score_permille"),
        )
    )


@register(
    "lm_bpe_second_round",
    f"""
    WITH words AS (
        SELECT unnest({SQL_TOKENS.format(col='text')}) AS w FROM documents
    ), w2 AS (
        SELECT w FROM words WHERE length(w) >= 2
    ), p1 AS (
        SELECT unnest([substring(w, i, 2)
                       for i in generate_series(1, length(w) - 1)]) AS pair
        FROM w2
    ), ab AS (
        SELECT substring(pair, 1, 1) AS a, substring(pair, 2, 1) AS b
        FROM (SELECT pair FROM p1 GROUP BY pair
              ORDER BY count(*) DESC, pair ASC LIMIT 1)
    ), folded AS (
        SELECT list_reduce(
                   [w[i] for i in generate_series(1, length(w))],
                   (acc, x) -> CASE
                       WHEN (acc = ab.a OR ends_with(acc, '|' || ab.a))
                            AND x = ab.b
                       THEN acc || x ELSE acc || '|' || x END) AS s
        FROM w2 CROSS JOIN ab
    ), syms AS (
        SELECT string_split(s, '|') AS ss FROM folded
    ), p2 AS (
        SELECT unnest([ss[i] || '+' || ss[i + 1]
                       for i in generate_series(1, len(ss) - 1)]) AS pair
        FROM syms WHERE len(ss) >= 2
    )
    SELECT pair, count(*) AS n FROM p2
    GROUP BY pair ORDER BY n DESC, pair ASC LIMIT {TOP_MERGES}
    """,
    doc="LM: second BPE induction round — apply top merge, recount pairs",
    bench=True,
)
def lm_bpe_second_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE loop made visible: take round 1's winning merge (a, b),
    apply it greedily left-to-right to every word (a string fold over
    the character sequence — symbols joined by '|', merge = append
    without separator), and recount adjacent *symbol* pairs. The merge
    rule is a broadcast 1-row table; the fold is a JVM higher-order
    aggregate, so round 2 costs the same single scan + small-key-space
    aggregation as round 1 — the shape a full BPE trainer iterates K
    times with the merge table growing by one row per round. Pair keys
    use a '+' separator so ('ab','c') never collides with ('a','bc')."""
    docs = load_table(spark, sf_dir, "documents")
    w2 = docs.select(F.explode(tokens("text")).alias("w")).filter(
        F.length("w") >= 2
    )
    p1 = w2.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    ab = (
        p1.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
        .select(
            F.expr("substring(pair, 1, 1)").alias("a"),
            F.expr("substring(pair, 2, 1)").alias("b"),
        )
    )
    folded = w2.crossJoin(F.broadcast(ab)).select(
        F.expr(BPE_FOLD_EXPR).alias("s")
    )
    syms = folded.select(F.expr("split(s, '\\\\|')").alias("ss"))
    p2 = syms.filter(F.size("ss") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ss) - 1),"
                " i -> concat(element_at(ss, i), '+', element_at(ss, i + 1)))"
            )
        ).alias("pair")
    )
    return (
        p2.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(TOP_MERGES)
    )


# Greedy leftmost application of merge (a, b) to word `w` as a string
# fold: symbols joined by '|', a merge appends without the separator.
# Shared with the property test that cross-checks the SQL fold against
# a reference Python implementation on arbitrary words.
BPE_FOLD_EXPR = (
    "aggregate(transform(sequence(1, length(w)), i -> substring(w, i, 1)),"
    " cast('' as string),"
    " (acc, x) -> CASE WHEN acc = '' THEN x"
    "   WHEN (acc = a OR endswith(acc, concat('|', a))) AND x = b"
    "   THEN concat(acc, x)"
    "   ELSE concat(acc, '|', x) END)"
)


KN_DISCOUNT_PERMILLE = 750  # the standard 0.75 absolute discount


@register(
    "lm_kneser_ney_bigrams",
    f"""
    WITH toks AS (
        SELECT {SQL_TOKENS.format(col='text')} AS ws FROM documents
    ), pairs AS (
        SELECT unnest([struct_pack(w1 := ws[i], w2 := ws[i + 1])
                       for i in generate_series(1, len(ws) - 1)]) AS b
        FROM toks WHERE len(ws) >= 2
    ), bigrams AS (
        SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS n
        FROM pairs GROUP BY 1, 2
    ), heads AS (
        SELECT w1, sum(n) AS head_n FROM bigrams
        GROUP BY w1 ORDER BY sum(n) DESC, w1 ASC LIMIT {TOP_HEADS}
    ), fert AS (
        SELECT w1, count(*) AS n_types FROM bigrams GROUP BY w1
    ), cont AS (
        SELECT w2, count(*) AS n_left FROM bigrams GROUP BY w2
    ), total AS (
        SELECT count(*) AS n_bigram_types FROM bigrams
    ), scored AS (
        SELECT b.w1, b.w2, b.n,
               CAST(greatest(b.n * 1000 - {KN_DISCOUNT_PERMILLE}, 0)
                    // h.head_n AS BIGINT)
                   + CAST(({KN_DISCOUNT_PERMILLE} * f.n_types // h.head_n)
                          * (c.n_left * 1000 // t.n_bigram_types)
                          // 1000 AS BIGINT) AS pkn_permille
        FROM bigrams b
        JOIN heads h USING (w1)
        JOIN fert f USING (w1)
        JOIN cont c ON c.w2 = b.w2
        CROSS JOIN total t
    ), ranked AS (
        SELECT w1, w2, n, pkn_permille,
               row_number() OVER (PARTITION BY w1
                                  ORDER BY n DESC, w2 ASC) AS rank
        FROM scored
    )
    SELECT w1, w2, n, pkn_permille, rank
    FROM ranked WHERE rank <= {TOP_CONTINUATIONS}
    """,
    doc="LM: Kneser-Ney discounted bigram table (integer permille, exact)",
    bench=True,
)
def lm_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney in permille integer arithmetic:
    p_kn(w2|w1) = max(c - D, 0)/c(w1) + lambda(w1) * p_cont(w2), with
    D = 0.75, lambda = D * |{{w2: c(w1,w2)>0}}| / c(w1) and the
    continuation probability counting distinct LEFT contexts — the
    smoothing every count-based LM tutorial lands on, quantized with
    floor division at each stage so the table is bit-identical in any
    engine. Plan: one bigram aggregation (vocab²-bounded keys), three
    small derived tables joined back — the head set is a broadcast
    constant, fertility/continuation tables are vocabulary-sized, and
    the grand-total join is one broadcast row; the ranking window runs
    over already-reduced counts."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens("text").alias("ws")).filter(F.size("ws") >= 2)
    bigrams = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(element_at(ws, i) AS w1,"
                    "             element_at(ws, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
    )
    heads = (
        bigrams.groupBy("w1")
        .agg(F.sum("n").alias("head_n"))
        .orderBy(F.desc("head_n"), F.asc("w1"))
        .limit(TOP_HEADS)
    )
    fert = bigrams.groupBy("w1").agg(F.count("*").alias("n_types"))
    cont = bigrams.groupBy("w2").agg(F.count("*").alias("n_left"))
    total = bigrams.agg(F.count("*").alias("n_bigram_types"))
    scored = (
        bigrams.join(F.broadcast(heads), "w1")
        .join(F.broadcast(fert), "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n",
            (
                F.expr(
                    f"greatest(n * 1000 - {KN_DISCOUNT_PERMILLE}, 0) div head_n"
                ).cast("bigint")
                + F.expr(
                    f"(({KN_DISCOUNT_PERMILLE} * n_types div head_n)"
                    f" * (n_left * 1000 div n_bigram_types)) div 1000"
                ).cast("bigint")
            ).alias("pkn_permille"),
        )
    )
    w = Window.partitionBy("w1").orderBy(F.desc("n"), F.asc("w2"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_CONTINUATIONS)
        .select("w1", "w2", "n", "pkn_permille", "rank")
    )


TOKEN_BUDGET = 500_000  # fixture-scaled total training-token budget
EPOCH_CAP_CENTI = 400  # >4 epochs of repetition ~ diminishing returns


@register(
    "lm_token_budget_plan",
    f"""
    WITH tok AS (
        SELECT source, CAST(sum(len({SQL_TOKENS.format(col='text')})) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ), alloc AS (
        SELECT source, n_tokens,
               CAST({TOKEN_BUDGET} // (SELECT count(*) FROM tok) AS BIGINT)
                   AS tokens_requested
        FROM tok
    )
    SELECT source, n_tokens, tokens_requested,
           CAST(tokens_requested * 100 // n_tokens AS BIGINT) AS epochs_centi,
           tokens_requested * 100 // n_tokens > {EPOCH_CAP_CENTI}
               AS over_epoch_cap
    FROM alloc
    """,
    doc="LM: data-constrained budget plan — epochs of repetition per source",
)
def lm_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-constrained-scaling audit (Muennighoff et al. 2023):
    given a training-token budget split uniformly across sources, how
    many epochs of each source does the budget imply, and which sources
    exceed the ~4-epoch repetition cap beyond which repeated data stops
    helping. One token-count aggregation (map-side combined) plus a
    broadcast scalar; epochs are centi-integer so the report is
    bit-exact. At 100 TB this runs on scan statistics, not data — the
    per-source token count is the only corpus-wide pass."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens")
    )
    nsrc = tok.agg(F.count("*").alias("n_sources"))
    alloc = tok.crossJoin(F.broadcast(nsrc)).select(
        "source",
        "n_tokens",
        F.expr(f"{TOKEN_BUDGET} div n_sources").cast("bigint").alias(
            "tokens_requested"
        ),
    )
    return alloc.select(
        "source",
        "n_tokens",
        "tokens_requested",
        F.expr("tokens_requested * 100 div n_tokens").cast("bigint").alias(
            "epochs_centi"
        ),
        (F.expr("tokens_requested * 100 div n_tokens") > EPOCH_CAP_CENTI).alias(
            "over_epoch_cap"
        ),
    )


PRUNE_THRESHOLDS = (2, 5, 10, 20)


@register(
    "lm_vocab_pruning_plan",
    f"""
    WITH uni AS (
        SELECT w, count(*) AS cnt
        FROM (SELECT unnest({SQL_TOKENS.format(col='text')}) AS w
              FROM documents) AS t
        GROUP BY w
    ), total AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_occ FROM uni
    )
    SELECT t.thr AS min_count,
           CAST((SELECT count(*) FROM uni WHERE cnt >= t.thr) AS BIGINT)
               AS vocab_size,
           CAST((SELECT coalesce(sum(cnt), 0) FROM uni WHERE cnt < t.thr)
                AS BIGINT) AS oov_occurrences,
           CAST((SELECT coalesce(sum(cnt), 0) FROM uni WHERE cnt < t.thr)
                * 1000 // (SELECT n_occ FROM total) AS BIGINT)
               AS oov_permille
    FROM (VALUES {', '.join(f'({t})' for t in PRUNE_THRESHOLDS)}) AS t(thr)
    """,
    doc="LM: vocabulary pruning curve — vocab size vs OOV mass per threshold",
)
def lm_vocab_pruning_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-design table: for each min-frequency cutoff, the
    surviving vocabulary size and the token mass that becomes OOV —
    the curve that picks a vocab size before BPE training spends
    anything. One unigram aggregation (vocabulary-keyed, map-side
    combined); the per-threshold rows are scalar aggregates over that
    vocabulary table, which at 100 TB is millions of rows, not the
    corpus. All counts integer, OOV share in permille floor-division."""
    docs = load_table(spark, sf_dir, "documents")
    uni = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .cache()
    )
    total = uni.agg(F.sum("cnt").cast("bigint").alias("n_occ"))
    rows = []
    for t in PRUNE_THRESHOLDS:
        stats = uni.agg(
            F.sum(F.when(F.col("cnt") >= t, 1).otherwise(0))
            .cast("bigint")
            .alias("vocab_size"),
            F.coalesce(
                F.sum(F.when(F.col("cnt") < t, F.col("cnt"))), F.lit(0)
            )
            .cast("bigint")
            .alias("oov_occurrences"),
        )
        rows.append(
            stats.crossJoin(F.broadcast(total)).select(
                F.lit(t).cast("int").alias("min_count"),
                "vocab_size",
                "oov_occurrences",
                F.expr("oov_occurrences * 1000 div n_occ")
                .cast("bigint")
                .alias("oov_permille"),
            )
        )
    from functools import reduce

    return reduce(DataFrame.unionAll, rows)


@register(
    "lm_fertility_by_lang",
    r"""
    WITH per_doc AS (
        SELECT lang,
               len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
               len(regexp_extract_all(text,
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe
        FROM documents
    )
    SELECT lang,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(n_bpe) * 100 // sum(n_words) AS BIGINT)
               AS fertility_centi
    FROM per_doc WHERE n_words > 0
    GROUP BY lang
    """,
    doc="LM: tokenizer fertility per language (BPE-ish tokens per word, centi)",
)
def lm_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility — subword tokens emitted per whitespace word — per
    language: THE tokenizer-equity metric for multilingual corpora
    (languages the tokenizer segments poorly pay more compute per word
    and fit less text per context window). Uses the same regex
    segmentation as tx_token_count_bpe so the two reports compose; one
    map-side-combined aggregation keyed on |langs| values, centi-integer
    ratio so the table is bit-exact."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(tokens("text"))
    n_bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
        )
    )
    per_doc = docs.select(
        "lang", n_words.alias("n_words"), n_bpe.alias("n_bpe")
    ).filter(F.col("n_words") > 0)
    return per_doc.groupBy("lang").agg(
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
        F.expr("sum(n_bpe) * 100 div sum(n_words)")
        .cast("bigint")
        .alias("fertility_centi"),
    )


# Salted-hash split predicate shared with tx_split_assign
# (extensions/textstats.py): bucket < 80 of 100 is 'train', the rest is
# held out. Reusing the exact expression keeps the split consistent
# across every query that mentions it.
_SQL_TRAIN_BUCKET = (
    "CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))"
    " AS BIGINT) % 100"
)


@register(
    "lm_bigram_oov_rate",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, {SQL_TOKENS.format(col='text')} AS ws,
               ({_SQL_TRAIN_BUCKET}) < 80 AS is_train
        FROM documents
    ), bigrams AS (
        SELECT lang, is_train,
               unnest([ws[i] || ' ' || ws[i + 1]
                       for i in generate_series(1, len(ws) - 1)]) AS bg
        FROM toks WHERE len(ws) >= 2
    ), train_types AS (
        SELECT DISTINCT bg FROM bigrams WHERE is_train
    ), held AS (
        SELECT h.lang, h.bg, t.bg IS NULL AS unseen
        FROM bigrams h LEFT JOIN train_types t ON t.bg = h.bg
        WHERE NOT h.is_train
    )
    SELECT lang,
           count(*) AS n_bigrams,
           CAST(sum(CASE WHEN unseen THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unseen,
           CAST(sum(CASE WHEN unseen THEN 1 ELSE 0 END) * 1000 // count(*)
                AS BIGINT) AS oov_permille
    FROM held GROUP BY lang
    """,
    doc="LM: held-out bigram OOV rate vs the train split's bigram types,"
    " per language — the generalization-gap data audit",
)
def lm_bigram_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the held-out split's bigram stream was never seen in
    training data: the corpus-side generalization audit (a held-out OOV
    rate near zero means the split leaks or the corpus is templated;
    near one means the train split undercovers the language). Uses the
    same salted-hash 80/20 split as tx_split_assign so the report
    composes with the split assignment. The train bigram-type set is
    corpus-sized, so membership is an honest shuffle join on the bigram
    key (hash-partitioned both sides, map-side distinct on the build
    side) — never a broadcast; per-language rates are integer permille."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
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
    toks = docs.select(
        "lang",
        tokens("text").alias("ws"),
        (bucket < 80).alias("is_train"),
    ).filter(F.size("ws") >= 2)
    bigrams = toks.select(
        "lang",
        "is_train",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            )
        ).alias("bg"),
    )
    train_types = bigrams.filter("is_train").select("bg").distinct()
    held = bigrams.filter(~F.col("is_train")).join(
        train_types.withColumn("seen", F.lit(1)), "bg", "left"
    )
    return held.groupBy("lang").agg(
        F.count("*").alias("n_bigrams"),
        F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0)).alias("n_unseen"),
        F.floor(
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            * 1000
            / F.count("*")
        ).alias("oov_permille"),
    )
