"""Measured scale artifact: bitmap-index audience answering vs
COUNT(DISTINCT) over the raw log, as the number of QUESTIONS grows.

A single retention question does not favor the index at fixture scale
(measured: ~0.4s bitmap vs ~0.2s distinct at sf0.1 — the log is small
enough to re-collapse per question). The bitmap's economics is
amortization: build the word table ONCE, then every boolean audience
question (AND/OR/AND-NOT between any (type, day) audiences) is a join
of U/32-row integer tables, while the distinct approach re-scans and
re-shuffles the raw log per question. This probe times a Q-question
workload both ways at 10x blown-up volume and records the crossover.

Run:  python tools/probe_bitmap_scale.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F

from big_data_training_spark import get_session
from big_data_training_spark.data import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BLOWUP = 10
TYPES = ("click", "purchase", "error", "view", "signup")


def blow_up(events: DataFrame, k: int) -> DataFrame:
    parts = [
        events.select(
            (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
            "ts",
            "event_type",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_words(ev: DataFrame) -> DataFrame:
    return ev.groupBy(
        "event_type", F.expr("user_id div 32").alias("word_idx")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT),"
            " CAST(user_id % 32 AS INT)))"
        ).alias("w")
    )


def questions():
    """(type_a, type_b) audience-intersection questions."""
    qs = []
    for i, a in enumerate(TYPES):
        for b in TYPES[i + 1:]:
            qs.append((a, b))
    return qs  # 10 questions


def bitmap_answer(words: DataFrame, a: str, b: str) -> int:
    wa = words.filter(F.col("event_type") == a).select("word_idx", "w")
    wb = words.filter(F.col("event_type") == b).select(
        "word_idx", F.col("w").alias("wb")
    )
    return (
        wa.join(wb, "word_idx")
        .agg(F.expr("CAST(sum(bit_count(w & wb)) AS BIGINT)").alias("n"))
        .collect()[0]["n"]
    )


def distinct_answer(ev: DataFrame, a: str, b: str) -> int:
    ua = ev.filter(F.col("event_type") == a).select("user_id").distinct()
    ub = ev.filter(F.col("event_type") == b).select("user_id").distinct()
    return ua.join(ub, "user_id").count()


def main() -> None:
    spark = get_session("probe_bitmap")
    base = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    )
    ev = blow_up(base, BLOWUP).localCheckpoint()
    qs = questions()

    # Index path: one build (timed) + Q cheap joins over the cached words
    t0 = time.time()
    words = build_words(ev).localCheckpoint()  # materialize the index
    build_s = time.time() - t0
    t0 = time.time()
    ans_bitmap = [bitmap_answer(words, a, b) for a, b in qs]
    per_q_bitmap = (time.time() - t0) / len(qs)

    # Raw path: Q distinct-count queries over the log
    t0 = time.time()
    ans_distinct = [distinct_answer(ev, a, b) for a, b in qs]
    per_q_distinct = (time.time() - t0) / len(qs)

    assert ans_bitmap == ans_distinct, "bitmap answers must be exact"
    total_b = build_s + per_q_bitmap * len(qs)
    total_d = per_q_distinct * len(qs)
    print(
        f"k={BLOWUP} questions={len(qs)}\n"
        f"bitmap:   build {build_s:5.2f}s + {per_q_bitmap:5.3f}s/q"
        f" = {total_b:5.2f}s total\n"
        f"distinct: {per_q_distinct:5.3f}s/q = {total_d:5.2f}s total\n"
        f"crossover at Q ~= "
        f"{build_s / max(per_q_distinct - per_q_bitmap, 1e-9):5.1f}"
        f" questions",
        flush=True,
    )


if __name__ == "__main__":
    main()
