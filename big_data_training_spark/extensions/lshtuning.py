"""LSH parameter tuning: the bands×rows sweep every MinHash deployment
runs before fixing its index layout.

For each (bands, rows) split of the 16-hash signature, the candidate
set is the bucket-join collisions; precision is the fraction of
candidates whose signature-estimated Jaccard clears the dedup
threshold, recall is against the full est-Jaccard-over-threshold pair
set. The truth set needs no all-pairs scan: a pair with est Jaccard
>= 0.5 agrees on >= 8 of 16 hashes, so it MUST collide under the
(16 bands x 1 row) config — that config's candidates are a provable
superset of the truth, and every config's metrics reduce to blocked
equi-joins. At 100 TB the sweep runs on a sample shard; the index
build then uses the chosen config corpus-wide.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.extensions.dedup import (
    MINHASH_TAU,
    N_HASHES,
    _SQL_SIG_CTE,
    _signatures,
)
from big_data_training_spark.registry import register

# (bands, rows) with bands * rows == N_HASHES; (16, 1) first — the
# permissive config whose candidates superset every est>=tau pair.
SWEEP_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8))
assert all(b * r == N_HASHES for b, r in SWEEP_CONFIGS)


def _sql_config_cte(tag: str, bands: int, rows: int) -> str:
    return f"""
    , cand_{tag} AS (
        SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j,
               (SELECT count(*) FROM generate_series(1, {N_HASHES}) AS g(i)
                WHERE a.sig[i] = b.sig[i])::DOUBLE / {N_HASHES} AS est
        FROM (SELECT doc_id, sig, b,
                     md5(array_to_string(sig[b * {rows} + 1 : (b + 1) * {rows}], ','))
                         AS band_key
              FROM sig, generate_series(0, {bands - 1}) AS t(b)) a
        JOIN (SELECT doc_id, sig, b,
                     md5(array_to_string(sig[b * {rows} + 1 : (b + 1) * {rows}], ','))
                         AS band_key
              FROM sig, generate_series(0, {bands - 1}) AS t(b)) b
          ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )"""


def _sweep_oracle() -> str:
    ctes = "".join(
        _sql_config_cte(f"{b}x{r}", b, r) for b, r in SWEEP_CONFIGS
    )
    b0, r0 = SWEEP_CONFIGS[0]
    truth = f"""
    , truth AS (
        SELECT doc_i, doc_j FROM cand_{b0}x{r0} WHERE est >= {MINHASH_TAU}
    )"""
    rows = " UNION ALL ".join(
        f"""
        SELECT {b} AS n_bands, {r} AS rows_per_band,
               (SELECT count(*) FROM cand_{b}x{r}) AS n_candidates,
               (SELECT count(*) FROM cand_{b}x{r} WHERE est >= {MINHASH_TAU})
                   AS n_est_dups,
               CAST((SELECT count(*) FROM cand_{b}x{r} WHERE est >= {MINHASH_TAU})
                    * 1000 // greatest((SELECT count(*) FROM cand_{b}x{r}), 1)
                    AS BIGINT) AS precision_permille,
               CAST((SELECT count(*) FROM cand_{b}x{r} WHERE est >= {MINHASH_TAU})
                    * 1000 // greatest((SELECT count(*) FROM truth), 1)
                    AS BIGINT) AS recall_permille
        """
        for b, r in SWEEP_CONFIGS
    )
    return _SQL_SIG_CTE + ctes + truth + rows


@register(
    "dd_lsh_band_sweep",
    _sweep_oracle(),
    doc="LSH tuning sweep: precision/recall of each bands-x-rows config",
)
def dd_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (bands, rows) config: candidate volume, confirmed
    near-dups (est Jaccard >= tau), precision and recall in permille.
    This is the curve that picks the index layout — more bands = higher
    recall but more candidate pairs to rescore. All configs band the
    SAME cached signatures; every join is a bucket equi-join, and the
    truth set comes from the provably-superset (16x1) candidates, so no
    all-pairs product exists anywhere."""
    sig = _signatures(spark, sf_dir).cache()

    def candidates(bands: int, rows: int) -> DataFrame:
        banded = sig.select(
            "doc_id",
            "sig",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}),"
                    f" b -> struct(b as b, md5(concat_ws(',', transform("
                    f"   slice(sig, b * {rows} + 1, {rows}),"
                    f"   x -> cast(x as string)))) as band_key))"
                )
            ).alias("bk"),
        ).select(
            "doc_id",
            "sig",
            F.col("bk.b").alias("b"),
            F.col("bk.band_key").alias("band_key"),
        )
        a, bb = banded.alias("a"), banded.alias("b")
        est = (
            F.size(
                F.filter(
                    F.zip_with("a.sig", "b.sig", lambda x, y: x == y), lambda v: v
                )
            )
            / F.lit(N_HASHES)
        )
        return (
            a.join(
                bb,
                (F.col("a.b") == F.col("b.b"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_i"),
                F.col("b.doc_id").alias("doc_j"),
                est.alias("est"),
            )
            .groupBy("doc_i", "doc_j")
            .agg(F.max("est").alias("est"))
        )

    cands = {(b, r): candidates(b, r) for b, r in SWEEP_CONFIGS}
    b0, r0 = SWEEP_CONFIGS[0]
    # The permissive config feeds both the truth count and its own row;
    # checkpoint so the 16-band self-join runs once, not twice.
    cands[(b0, r0)] = cands[(b0, r0)].localCheckpoint(eager=False)
    truth_n = (
        cands[(b0, r0)]
        .filter(F.col("est") >= MINHASH_TAU)
        .agg(F.count("*").alias("n_truth"))
    )
    per_config = []
    for b, r in SWEEP_CONFIGS:
        cand = cands[(b, r)]
        stats = cand.agg(
            F.count("*").alias("n_candidates"),
            F.sum(F.when(F.col("est") >= MINHASH_TAU, 1).otherwise(0))
            .cast("bigint")
            .alias("n_est_dups"),
        )
        per_config.append(
            stats.crossJoin(F.broadcast(truth_n)).select(
                F.lit(b).cast("int").alias("n_bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                "n_candidates",
                "n_est_dups",
                F.expr("n_est_dups * 1000 div greatest(n_candidates, 1)")
                .cast("bigint")
                .alias("precision_permille"),
                F.expr("n_est_dups * 1000 div greatest(n_truth, 1)")
                .cast("bigint")
                .alias("recall_permille"),
            )
        )
    return reduce(DataFrame.unionAll, per_config)
