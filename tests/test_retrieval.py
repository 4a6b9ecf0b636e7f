"""Lexical retrieval invariants: the BM25 scorer must rank documents
that actually match, with the serving-shaped plan (scan + broadcast
stats + top-k heap), and the fixed-point log2 must track the real log
at its stated 1/16-bit resolution."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.retrieval import (
    BM25_TERMS,
    BM25_TOP,
    ix_bm25_topk,
    ix_postings_stats,
    log2_fp16_steps,
)


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_hits_contain_query_terms(spark, sf_dir):
    rows = ix_bm25_topk(spark, sf_dir).collect()
    assert len(rows) == BM25_TOP
    scores = [r.bm25_scaled for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    ids = [r.doc_id for r in rows]
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))
        .collect()
    }
    for i in ids:
        toks = set(texts[i].split())
        assert toks & set(BM25_TERMS), f"doc {i} matches no query term"


def test_bm25_serving_plan(spark, sf_dir):
    plan = physical_plan(ix_bm25_topk(spark, sf_dir))
    # Top-k heap, not a global sort; corpus side never shuffles — the
    # only join is the broadcast of the 1-row stats aggregate.
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_log2_fp16_tracks_real_log(spark):
    """The square-and-renormalize fixed-point log2 must be within one
    1/16-bit unit of 16*log2(num/den) across ratio magnitudes from
    1+epsilon to 2^30."""
    cases = [
        (1002, 787),     # the Lucene-idf shape at df ~ 0.78*N
        (1002, 51),      # rare term
        (3, 2),
        (1048577, 1048576),   # ratio barely above 1
        (2**30, 1),      # a billion-doc corpus's rarest term
        (999999937, 7),
        (17, 16),
        (2, 1),
    ]
    rows = ", ".join(
        f"(CAST({n} AS BIGINT), CAST({d} AS BIGINT))" for n, d in cases
    )
    df = spark.sql(f"SELECT * FROM VALUES {rows} AS t(num, den)")
    for name, expr in log2_fp16_steps("num", "den", "fp16", " div "):
        df = df.selectExpr("*", f"{expr} AS {name}")
    got = {(r.num, r.den): r.fp16 for r in df.collect()}
    for n, d in cases:
        real = 16 * math.log2(n / d)
        assert abs(got[(n, d)] - real) <= 1.0, (n, d, got[(n, d)], real)


def test_postings_stats_internally_consistent(spark, sf_dir):
    rows = ix_postings_stats(spark, sf_dir).collect()
    assert rows
    dfs = [r.doc_freq for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        assert r.max_tf * r.doc_freq >= r.total_tf >= r.doc_freq
        assert r.mean_tf_floor == r.total_tf // r.doc_freq
