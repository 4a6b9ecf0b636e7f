"""Semantic invariants for the governance/layout/packing audits and the
bloom decontamination operator — properties the value-hash oracle can't
express (inequalities, plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_training_spark.extensions.curation import dd_decontaminate_bloom
from big_data_training_spark.operators.governance import (
    SEQ_LEN,
    dq_k_anonymity,
    s9_zonemap_prune_audit,
    tx_padding_waste,
)


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    rows = dd_decontaminate_bloom(spark, sf_dir).collect()
    assert rows, "expected per-source rows"
    for r in rows:
        # The bloom guarantee: every exact hit is also a bloom hit.
        assert r.n_flagged_bloom >= r.n_flagged_exact
        assert r.n_false_pos == r.n_flagged_bloom - r.n_flagged_exact
        assert 0 <= r.n_flagged_bloom <= r.n_docs


def test_bloom_words_table_is_broadcast(spark, sf_dir):
    plan = physical_plan(dd_decontaminate_bloom(spark, sf_dir))
    # The 16384-row word table joins as a broadcast, never a shuffle.
    assert "BroadcastHashJoin" in plan


def test_k_anonymity_monotone_in_k(spark, sf_dir):
    rows = {r.k: r for r in dq_k_anonymity(spark, sf_dir).collect()}
    assert sorted(rows) == [2, 5, 10, 20]
    for lo, hi in zip([2, 5, 10], [5, 10, 20]):
        # Raising k can only put more classes/rows at risk.
        assert rows[hi].n_classes_below >= rows[lo].n_classes_below
        assert rows[hi].n_rows_at_risk >= rows[lo].n_rows_at_risk


def test_zonemap_pruning_preserves_answer_and_helps(spark, sf_dir):
    rows = {r.layout: r for r in s9_zonemap_prune_audit(spark, sf_dir).collect()}
    ing, clu = rows["ingest_order"], rows["date_clustered"]
    # Pruning never changes the query answer...
    assert ing.rows_matched == clu.rows_matched
    assert ing.rows_total == clu.rows_total
    # ...and the date-clustered layout scans no more than ingest order
    # (strictly less whenever the ingest layout is date-uncorrelated).
    assert clu.rows_scanned <= ing.rows_scanned
    assert clu.n_files_kept <= clu.n_files
    # A kept file set always covers the matching rows.
    assert clu.rows_scanned >= clu.rows_matched
    assert ing.rows_scanned >= ing.rows_matched


def test_padding_waste_identities(spark, sf_dir):
    for r in tx_padding_waste(spark, sf_dir).collect():
        # Bucket-padding identity: tokens + pad fill the bucket exactly.
        assert r.total_tokens + r.pad_to_bucket == r.n_docs * r.bucket_top
        if r.bucket_top <= SEQ_LEN:
            # Below the fixed seq-len, bucketed batching never pads more.
            assert r.pad_to_bucket <= r.pad_to_seqlen
            assert r.truncated_tokens == 0
