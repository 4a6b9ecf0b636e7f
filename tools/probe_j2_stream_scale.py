"""Growth probe for st_j2_stream_stream (VERDICT r12 #5): stream-stream
join state vs event rate.

Stream-stream join state is the classic 100 TB streaming failure mode:
each side buffers rows until the watermark passes their last possible
match time, so state = rate × (watermark lag + join window), NOT stream
length. This probe measures exactly that: synthetic signup/purchase
events at 1×/2×/4× RATE over a FIXED 30-day span, replayed in 8
time-ordered segments (maxFilesPerTrigger=1) so the watermark advances
between micro-batches and eviction actually runs. For each scale it
records wall time, emitted matches, PEAK state rows, and the watermark
bound (rows inside any [watermark+window] span): peak state must track
the per-trigger arrival volume + watermark window — growing ~linearly
with rate — while staying far below total rows once segments pass.

The join mirrors streaming/queries.py st_j2_stream_stream exactly
(same 1h watermarks, same 30-minute window, same append mode); the
probe adds only the segmented replay and progress capture.

Usage: python tools/probe_j2_stream_scale.py [multipliers...]
Results go to docs/SCALING.md (streaming-replay section).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from big_data_training_spark import get_session

MULTS = [int(a) for a in sys.argv[1:]] or [1, 2, 4]

BASE_EVENTS = 40_000
N_USERS = 2_000
SPAN_DAYS = 30
N_SEGMENTS = 8


def _write_segments(base_dir: str, mult: int) -> str:
    """Deterministic signup/purchase stream at ``mult``× the base rate,
    time-ordered, split into N_SEGMENTS files with ascending mtimes so
    the file source replays them as successive micro-batches."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = BASE_EVENTS * mult
    rng = np.random.default_rng(42)
    ts_s = np.sort(rng.uniform(0, SPAN_DAYS * 86400, n))
    out = {
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (1704067200_000_000 + (ts_s * 1e6).astype(np.int64)).astype(
            "datetime64[us]"
        ),
        "user_id": rng.integers(0, N_USERS, n, dtype=np.int64),
        "event_type": np.where(
            rng.random(n) < 0.5, "signup", "purchase"
        ).astype(object),
    }
    topic = os.path.join(base_dir, f"events_x{mult}")
    os.makedirs(topic, exist_ok=True)
    per = n // N_SEGMENTS
    for i in range(N_SEGMENTS):
        lo, hi = i * per, (n if i == N_SEGMENTS - 1 else (i + 1) * per)
        tbl = pa.table({k: v[lo:hi] for k, v in out.items()})
        path = os.path.join(topic, f"seg{i:02d}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return topic


def _run_join(spark, topic: str) -> dict:
    schema = spark.read.parquet(topic).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(topic)
    )
    s = (
        stream.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            "user_id",
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = s.join(
        p,
        F.expr(
            "user_id = p_user AND p_ts > s_ts"
            " AND p_ts <= s_ts + INTERVAL 30 MINUTES"
        ),
    ).select("signup_id", "purchase_id", "user_id")
    qname = f"probe_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="bdts_probe_ckpt_")
    # recentProgress retains only the last numRecentProgressUpdates entries
    # (default 100) — fine at 8 segments, but a raised N_SEGMENTS/multiplier
    # would silently truncate the peak (advisory r13). Raise the retention
    # and assert below that no trigger was dropped.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    t0 = time.time()
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        wall = time.time() - t0
        progress = [json.loads(pr.json) for pr in q.recentProgress]
    finally:
        q.stop()
    # One progress entry per micro-batch: N_SEGMENTS data triggers plus at
    # most a few no-data watermark-commit triggers. If this trips, the
    # retention above was exceeded and peak_state_rows is untrustworthy.
    assert N_SEGMENTS <= len(progress) < 9999, (
        f"expected >= {N_SEGMENTS} retained progress entries, got "
        f"{len(progress)} — peak-state reading would be truncated"
    )
    n_out = spark.table(qname).count()
    spark.catalog.dropTempView(qname)
    shutil.rmtree(ckpt, ignore_errors=True)
    state_rows = [
        op.get("numRowsTotal", 0)
        for pr in progress
        for op in pr.get("stateOperators", [])
    ]
    return {
        "wall_sec": round(wall, 2),
        "n_matches": n_out,
        "peak_state_rows": max(state_rows) if state_rows else 0,
        "final_state_rows": state_rows[-1] if state_rows else 0,
        "n_triggers": len(progress),
    }


def main() -> None:
    spark = get_session("probe_j2")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="bdts_j2_probe_")
    try:
        for m in MULTS:
            topic = _write_segments(base, m)
            n_total = BASE_EVENTS * m
            # watermark bound: rows whose event time is within
            # (watermark 1h + window 30min) of the max time seen in any
            # single 1/N_SEGMENTS slice — the most state any trigger can
            # legitimately hold (both sides buffered)
            bound = int(n_total / SPAN_DAYS / 24 * 1.5) * 2
            r = _run_join(spark, topic)
            print(
                json.dumps(
                    {
                        "mult": m,
                        "n_events": n_total,
                        "watermark_state_bound_rows": bound
                        + n_total // N_SEGMENTS,
                        **r,
                    }
                )
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
