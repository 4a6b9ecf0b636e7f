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
    # Both small sides broadcast: the eval-shingle set AND the 16384-row
    # word table.  A single BroadcastHashJoin would mean the word table
    # regressed to a shuffle join, so count occurrences and forbid any
    # sort-merge join outright.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


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


def test_session_cooccurrence_bounds(spark, sf_dir):
    from big_data_training_spark.operators.behavior import ev_session_cooccurrence

    rows = ev_session_cooccurrence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b  # canonical pair order, no mirrors
        # confidence against the rarer type is at most 1 (permille 1000)
        assert 0 <= r.affinity_permille <= 1000
        assert r.n_sessions >= 1


def test_soft_dedup_effective_size_bounds(spark, sf_dir):
    from big_data_training_spark.extensions.dedup import dd_soft_dedup_weights

    rows = dd_soft_dedup_weights(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # weights are in (0, 1]: effective size never exceeds raw size
        assert 0 < r.effective_permille_sum <= 1000 * r.n_docs
        assert 0 <= r.n_downweighted <= r.n_docs
        if r.n_downweighted == 0:
            assert r.effective_permille_sum == 1000 * r.n_docs


def test_semdedup_rate_bounds(spark, sf_dir):
    from big_data_training_spark.extensions.similarity import (
        KMEANS_K,
        dd_semdedup_prune_rate,
    )

    rows = dd_semdedup_prune_rate(spark, sf_dir).collect()
    assert 0 < len(rows) <= KMEANS_K
    for r in rows:
        assert 0 <= r.n_prunable <= r.n_vectors
        assert 0 <= r.prune_permille <= 1000


def test_centroid_drift_nonnegative_and_bounded_clusters(spark, sf_dir):
    from big_data_training_spark.extensions.similarity import (
        KMEANS_K,
        sim_kmeans_centroid_drift,
    )

    rows = sim_kmeans_centroid_drift(spark, sf_dir).collect()
    assert 0 < len(rows) <= KMEANS_K
    assert all(r.drift_e12 >= 0 and r.n > 0 for r in rows)


def test_incremental_components_equal_full_recompute(spark, sf_dir):
    from big_data_training_spark.extensions.dedup import (
        dd_cluster_components,
        dd_components_incremental,
    )

    full = {(r.doc_id, r.component_id) for r in dd_cluster_components(spark, sf_dir).collect()}
    incr = {(r.doc_id, r.component_id) for r in dd_components_incremental(spark, sf_dir).collect()}
    assert incr == full


def test_parquet_footer_stats_match_duckdb(spark, sf_dir):
    """Two independent parquet implementations must read the same footer:
    pyarrow (engine side) vs DuckDB's parquet_metadata()."""
    import duckdb

    from big_data_training_spark.operators.governance import (
        s8_parquet_footer_stats,
    )

    got = {
        r.column_name: (
            r.n_row_groups,
            r.n_values,
            r.n_nulls,
            r.compressed_bytes,
            r.uncompressed_bytes,
            r.compression_permille,
        )
        for r in s8_parquet_footer_stats(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    want = {
        row[0]: tuple(int(x) for x in row[1:])
        for row in con.execute(
            "SELECT path_in_schema, count(*), sum(num_values),"
            " sum(stats_null_count), sum(total_compressed_size),"
            " sum(total_uncompressed_size),"
            " sum(total_compressed_size) * 1000 // sum(total_uncompressed_size)"
            f" FROM parquet_metadata('{sf_dir}/lineitem.parquet') GROUP BY 1"
        ).fetchall()
    }
    assert got == want
