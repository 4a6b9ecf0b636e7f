"""Bench harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized (count + lightweight collect of the
aggregate output) so the whole plan executes. A warmup run of the
flagship primes the JVM/codegen caches before timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_training_spark import get_session
from big_data_training_spark.registry import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_session("bench")
    specs = all_queries()
    bench_names = sorted(n for n, s in specs.items() if s.bench)

    # Warmup: compile every bench plan once against the smallest fixture
    # (codegen/JIT/Arrow init amortize in steady state; data stays cold
    # for the timed sf runs below).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name in bench_names:
        try:
            specs[name].fn(spark, warm_dir).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in bench_names:
        t0 = time.time()
        df = specs[name].fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
