"""Growth probe for st_p95_value_stream: streaming-quantile state must
track the VALUE DOMAIN, not the stream length.

Two sweeps over synthetic events fixtures (events.parquet shaped like
the testdata schema, so the REGISTERED query runs unchanged):

1. events 1x/2x/4x at a FIXED ~2,000-cent value domain — histogram
   state (distinct (event_type, cents) rows) must stay ~constant while
   wall time grows sub-linearly (scan-bound);
2. value-domain width 1x/2x/4x at FIXED event count — state must grow
   ~linearly with the domain, wall ~flat.

That pair is the boundedness claim in streaming/sketch_stream.py: at
100 TB the state store holds O(|domain| x |keys|) counters forever,
regardless of how many events have streamed through. Results go to
docs/SCALING.md.

Usage: python tools/probe_p95_stream_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from big_data_training_spark import get_session

BASE_EVENTS = 100_000
BASE_DOMAIN_CENTS = 2_000
N_TYPES = 5


def _write_events(base_dir: str, tag: str, n: int, domain_cents: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    tbl = pa.table(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": (
                1704067200_000_000
                + rng.integers(0, 30 * 86400_000_000, n)
            ).astype("datetime64[us]"),
            "user_id": rng.integers(0, 1000, n, dtype=np.int64),
            "event_type": np.array(
                [f"type{i % N_TYPES}" for i in rng.integers(0, N_TYPES, n)],
                dtype=object,
            ),
            # value domain controls the histogram state cardinality
            "value": rng.integers(0, domain_cents, n).astype(np.float64)
            / 100.0,
            "props": np.full(n, "{}", dtype=object),
        }
    )
    d = os.path.join(base_dir, tag)
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return d


def main() -> None:
    from big_data_training_spark.streaming.sketch_stream import (
        COARSE_SHIFT,
        st_p95_coarse_stream,
        st_p95_value_stream,
    )

    spark = get_session("probe_p95")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="bdts_p95_probe_")
    try:
        # warm
        warm = _write_events(base, "warm", 10_000, BASE_DOMAIN_CENTS)
        st_p95_value_stream(spark, warm).count()

        for sweep, mults in (("events", (1, 2, 4)), ("domain", (1, 2, 4))):
            for m in mults:
                n = BASE_EVENTS * (m if sweep == "events" else 1)
                dom = BASE_DOMAIN_CENTS * (m if sweep == "domain" else 1)
                d = _write_events(base, f"{sweep}_x{m}", n, dom)
                t0 = time.time()
                out = st_p95_value_stream(spark, d)
                n_out = out.count()
                wall = time.time() - t0
                # state size = merged histogram rows (type, cents)
                from big_data_training_spark.data import load_table
                from pyspark.sql import functions as F

                state = (
                    load_table(spark, d, "events")
                    .selectExpr(
                        "event_type",
                        "CAST(floor(value * 100) AS BIGINT) AS cents",
                    )
                    .distinct()
                    .count()
                )
                # round 14: the coarse (unbounded-domain) twin in the SAME
                # sweep — its state must be bounded by the bucket count
                # (domain div 2^COARSE_SHIFT) while the fine twin's grows
                # linearly with the domain; both must return the same p95.
                t1 = time.time()
                coarse_out = {
                    (r["event_type"], r["p95_cents"])
                    for r in st_p95_coarse_stream(spark, d).collect()
                }
                coarse_wall = time.time() - t1
                fine_out = {
                    (r["event_type"], r["p95_cents"])
                    for r in out.collect()
                }
                coarse_state = (
                    load_table(spark, d, "events")
                    .selectExpr(
                        "event_type",
                        "CAST(floor(value * 100) AS BIGINT)"
                        f" div {1 << COARSE_SHIFT} AS b",
                    )
                    .distinct()
                    .count()
                )
                print(
                    json.dumps(
                        {
                            "sweep": sweep,
                            "mult": m,
                            "n_events": n,
                            "domain_cents": dom,
                            "state_rows": state,
                            "coarse_state_rows": coarse_state,
                            "wall_sec": round(wall, 2),
                            "coarse_wall_sec": round(coarse_wall, 2),
                            "coarse_equals_fine": coarse_out == fine_out,
                            "result_rows": n_out,
                        }
                    )
                )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
