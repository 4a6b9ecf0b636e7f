"""Rocchio expansion invariants: expansion terms must come from the
actual BM25 feedback docs, never echo the query, and carry weights
that are exactly tf_sum x idf16 with idf monotone in df."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.queryexp import (
    EXPANSION_TOP,
    MIN_CAND_DF,
    ix_rocchio_expansion,
)
from big_data_training_spark.extensions.retrieval import (
    BM25_TERMS,
    ix_bm25_topk,
)


def test_rocchio_terms_sound(spark, sf_dir):
    rows = ix_rocchio_expansion(spark, sf_dir).collect()
    assert 0 < len(rows) <= EXPANSION_TOP
    fb_ids = [r.doc_id for r in ix_bm25_topk(spark, sf_dir).collect()]
    fb_vocab = set()
    for r in (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(fb_ids))
        .collect()
    ):
        fb_vocab.update(w for w in r.text.split() if w)
    weights = [r.rocchio_scaled for r in rows]
    assert weights == sorted(weights, reverse=True)
    by_df = {}
    for r in rows:
        assert r.term not in BM25_TERMS
        assert r.term in fb_vocab, f"{r.term} not in feedback docs"
        assert r.doc_freq >= MIN_CAND_DF
        assert r.rocchio_scaled == r.tf_sum * r.idf16
        by_df[r.doc_freq] = r.idf16
    # rarer terms must never score a lower idf than commoner ones
    items = sorted(by_df.items())
    for (d1, i1), (d2, i2) in zip(items, items[1:]):
        assert i1 >= i2, f"idf not monotone: df {d1}->{d2}, idf {i1}->{i2}"
