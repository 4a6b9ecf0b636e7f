"""Coverage sweep: time EVERY registered query once at the bench SF
(VERDICT r10 #4 — the 3-iter headline set covers ~100 queries; the
rest were correctness-swept but never timed, so a sleeper could hide).

One iteration per query (this is a tripwire, not a benchmark: the
headline set stays the authority for regressions), full results to
docs/BENCH_SWEEP_r{N}_{ts}.json, and a stderr flag line for every
NON-headline query slower than SLEEPER_SEC — those are candidates for
bench=True promotion or a perf pass next round.

Usage: python tools/bench_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from big_data_training_spark import get_session
from big_data_training_spark.registry import all_queries

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
SLEEPER_SEC = 3.0


def main() -> None:
    spark = get_session("bench-sweep")
    specs = all_queries()

    # one warmup pass at the smallest fixture compiles every plan
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name, spec in specs.items():
        try:
            spec.fn(spark, warm_dir).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        try:
            spec.fn(spark, SF_DIR).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # keep sweeping; record the failure
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]

    headline = {n for n, s in specs.items() if s.bench}
    sleepers = {
        n: t
        for n, t in timings.items()
        if t > SLEEPER_SEC and n not in headline
    }
    for n, t in sorted(sleepers.items(), key=lambda kv: -kv[1]):
        print(f"# SLEEPER {n}: {t}s (not in headline set)", file=sys.stderr)

    rnd_env = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd_env and rnd_env.isdigit():
        rnd = int(rnd_env)
    else:
        rounds = [
            int(m.group(1))
            for f in os.listdir(REPO)
            if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f))
        ]
        rnd = (max(rounds) + 1) if rounds else 0
    record = {
        "metric": "coverage_sweep_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_queries": len(timings),
        "sf_dir": SF_DIR,
        "iters": 1,
        "load1": round(os.getloadavg()[0], 2),
        "median_sec": round(statistics.median(timings.values()), 3)
        if timings
        else None,
        "sleepers_over_3s_not_headline": sleepers,
        "errors": errors,
        "queries": timings,
    }
    path = os.path.join(
        REPO, "docs", f"BENCH_SWEEP_r{rnd:02d}_{int(time.time())}.json"
    )
    with open(path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                k: record[k]
                for k in (
                    "metric",
                    "value",
                    "n_queries",
                    "median_sec",
                    "sleepers_over_3s_not_headline",
                    "errors",
                )
            },
            separators=(",", ":"),
        )
    )
    print(f"# full record: {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
