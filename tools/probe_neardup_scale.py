"""One-off scale probe: growth of the two remaining multi-second rows
the round-11 verdict flagged for probing (#7) —
dd_semantic_neardup_kmeans and st_decontaminate_stream — at 1x/2x/4x
synthetic corpus scale.

dd_semantic_neardup_kmeans pairs candidates only WITHIN a k-means cell,
so its join work is sum(cell_size^2). With the query's fixed
KMEANS_K=8 that term grows ~quadratically in corpus size — measured
here on purpose, because the documented 100 TB path is k PROPORTIONAL
to N (bounded cell sizes -> linear pair work, exactly the IVF nlist
scaling rule sim_nprobe_recall_sweep already certifies). The probe
therefore also measures a k-scaled variant (cells of ~constant size via
finer blocking) to show the linear regime the production setting runs
in.

st_decontaminate_stream is a stream-static broadcast join: per-batch
cost is shingling (linear in arriving tokens) + a broadcast-hash probe
against the eval shingle set. Cost should grow ~linearly with the
document count at fixed eval-set size.

Synthetic fixtures mirror the sf0.1 shapes (2000x64 float embeddings,
5000 docs x ~54 tokens) and are written to a /tmp scratch dir as
{embeddings,documents}.parquet so the probes run the REGISTERED query
functions unchanged against each scale. Results go to docs/SCALING.md.

Usage: python tools/probe_neardup_scale.py [multipliers...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from big_data_training_spark import get_session

MULTS = [int(a) for a in sys.argv[1:]] or [1, 2, 4]

BASE_VECS = 2_000
BASE_DOCS = 5_000
EMB_DIM = 64
DOC_TOKENS = 54
VOCAB = 4_000  # zipf-ish shared vocab => real shingle collisions


def _as_single_file(tmp_dir: str, dest: str) -> None:
    """The fixtures are single parquet FILES (the streaming replay
    symlinks them into a monitored topic dir); relocate the one part
    file a coalesce(1) write produced."""
    part = next(
        f for f in os.listdir(tmp_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    shutil.move(os.path.join(tmp_dir, part), dest)
    shutil.rmtree(tmp_dir, ignore_errors=True)


def build_fixture(spark, mult: int) -> str:
    out = tempfile.mkdtemp(prefix=f"bdts_probe_neardup_{mult}x_")
    n_vecs = BASE_VECS * mult
    # clustered embeddings: 8 latent centers + per-vector jitter, so the
    # k-means cells have the same kind of structure the fixture has
    spark.range(n_vecs).selectExpr(
        "id AS vec_id",
        f"""transform(sequence(1, {EMB_DIM}), i -> CAST(
              sin(CAST(id % 8 AS DOUBLE) * i)
              + (CAST(conv(substr(md5(concat(CAST(id AS STRING), '_', CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT) % 1000) / 5000.0
            AS FLOAT)) AS embedding""",
        "CAST(id % 8 AS INT) AS label",
    ).coalesce(1).write.mode("overwrite").parquet(out + "_emb_tmp")
    _as_single_file(out + "_emb_tmp", os.path.join(out, "embeddings.parquet"))
    n_docs = BASE_DOCS * mult
    # documents: hash-derived token stream over a shared vocab; every
    # 40th doc repeats the previous doc's token stream so eval/train
    # 8-gram contamination exists at every scale
    spark.range(n_docs).selectExpr(
        "id AS doc_id",
        f"""array_join(transform(sequence(1, {DOC_TOKENS}), i ->
              concat('w', CAST(
                CAST(conv(substr(md5(concat(CAST(CASE WHEN id % 40 = 1 THEN id - 1 ELSE id END AS STRING), ':', CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT) % {VOCAB}
              AS STRING))), ' ') AS text""",
        "'en' AS lang",
        "'probe' AS source",
        "CAST(0 AS BIGINT) AS n_chars",
    ).coalesce(1).write.mode("overwrite").parquet(out + "_doc_tmp")
    _as_single_file(out + "_doc_tmp", os.path.join(out, "documents.parquet"))
    return out


def k_scaled_pairs_sec(spark, sf_dir: str, mult: int) -> tuple[float, int]:
    """The production-scaling variant: block on k-means cell FURTHER
    subdivided so expected cell size stays ~constant as N grows (the
    k proportional-to-N rule). Same cosine arithmetic as the query."""
    from big_data_training_spark.extensions.similarity import (
        _PAIR_COS,
        NEARDUP_TAU,
        _kmeans_assignment,
        _with_norm,
    )
    from big_data_training_spark.data import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = _kmeans_assignment(spark, sf_dir).select("vec_id", "cluster")
    # subdivide each cell by a hash so cells hold ~250 vectors at any N
    sub = F.expr(f"pmod(CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT), {mult})")
    keyed = _with_norm(
        assigned.withColumn("cluster", F.concat_ws("_", "cluster", sub))
        .join(emb.select("vec_id", "embedding"), "vec_id")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.expr(_PAIR_COS).alias("cos"))
        .filter(F.col("cos") >= NEARDUP_TAU)
    )
    t0 = time.time()
    n = pairs.count()
    return time.time() - t0, n


def main() -> None:
    from big_data_training_spark.extensions.similarity import (
        dd_semantic_neardup_kmeans,
    )
    from big_data_training_spark.streaming.queries import (
        st_decontaminate_stream,
    )

    spark = get_session("probe-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {m: build_fixture(spark, m) for m in MULTS}
    # warmup: codegen/JIT on the smallest fixture
    dd_semantic_neardup_kmeans(spark, dirs[MULTS[0]]).count()
    st_decontaminate_stream(spark, dirs[MULTS[0]]).count()
    try:
        for m in MULTS:
            t0 = time.time()
            n1 = dd_semantic_neardup_kmeans(spark, dirs[m]).count()
            t1 = time.time() - t0
            t2, n2 = k_scaled_pairs_sec(spark, dirs[m], m)
            t0 = time.time()
            n3 = st_decontaminate_stream(spark, dirs[m]).count()
            t3 = time.time() - t0
            print(
                f"mult={m} vecs={BASE_VECS * m} docs={BASE_DOCS * m} "
                f"neardup_fixed_k_sec={t1:.2f} ({n1} pairs) "
                f"neardup_k_scaled_sec={t2:.2f} ({n2} pairs) "
                f"decon_stream_sec={t3:.2f} ({n3} rows)"
            )
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
