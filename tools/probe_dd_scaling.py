"""8v32-core and AQE-coalescing probes for the dd anti-scaling family
(VERDICT r14 #2): dd_curation_funnel / dd_lsh_recall_report /
dd_components_incremental ran FASTER on 8 cores than 32 in the driver's
scaling block — 32-slot task/shuffle overhead exceeding the work at
sf0.1 (guide §2.2).

Each probe is a fresh subprocess (own JVM) timing the named queries
(ITERS medians, warm run first) under a variant:

  base32   local[32], session defaults (what bench.py measures)
  base8    local[8], session defaults (the driver's low-core leg)
  advis32  local[32] + spark.sql.adaptive.coalescePartitions.
           parallelismFirst=false (coalesce to advisoryPartitionSize
           instead of to parallelism — the documented production
           recommendation; partition count then derives from DATA size)

Probe order interleaves variants so ambient drift cancels:
advis32 base32 base8 base8 base32 advis32.

Usage: python tools/probe_dd_scaling.py q1,q2[,...] [sf_dir] [iters]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import json, statistics, sys, time
sf_dir, names, iters, label = (
    sys.argv[1], sys.argv[2].split(","), int(sys.argv[3]), sys.argv[4]
)
sys.path.insert(0, %(repo)r)
from big_data_training_spark import get_session
from big_data_training_spark.registry import all_queries

spark = get_session("dd_scaling_" + label)
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()

def cal():
    runs = []
    for _ in range(3):
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "sum(id * 3 + id %% 7) AS s"
        ).collect()
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 3)

out = {"label": label, "cal_start": cal(), "queries": {}}
for name in names:
    fn = specs[name].fn
    fn(spark, sf_dir).count()
    runs = []
    for _ in range(iters):
        t0 = time.time()
        fn(spark, sf_dir).count()
        runs.append(time.time() - t0)
    out["queries"][name] = round(statistics.median(runs), 3)
out["cal_end"] = cal()
print("PROBE " + json.dumps(out))
""" % {"repo": REPO}

VARIANTS = {
    "base32": {"SPARK_GRAFT_CPUS": "32"},
    "base8": {"SPARK_GRAFT_CPUS": "8"},
    "advis32": {
        "SPARK_GRAFT_CPUS": "32",
        "SPARK_GRAFT_EXTRA_CONF": (
            "spark.sql.adaptive.coalescePartitions.parallelismFirst=false"
        ),
    },
}


def _probe(variant: str, sf_dir: str, names: str, iters: int) -> dict:
    env = dict(os.environ)
    env.update(VARIANTS[variant])
    res = subprocess.run(
        [sys.executable, "-c", _PROBE, sf_dir, names, str(iters), variant],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    for line in res.stdout.replace("\r", "\n").splitlines():
        if line.startswith("PROBE "):
            d = json.loads(line[len("PROBE ") :])
            print(line, flush=True)
            return d
    sys.exit(f"probe {variant}: no PROBE line\nstderr: {res.stderr[-2000:]}")


def main() -> None:
    names = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    order = ["advis32", "base32", "base8", "base8", "base32", "advis32"]
    results: dict[str, list[dict]] = {v: [] for v in VARIANTS}
    for v in order:
        results[v].append(_probe(v, sf_dir, names, iters))
    print("\n| query | base32 | base8 | advis32 | 8/32 | advis/base |")
    for q in names.split(","):
        med = {
            v: statistics.median(r["queries"][q] for r in rs)
            for v, rs in results.items()
        }
        print(
            f"| {q} | {med['base32']:.3f} | {med['base8']:.3f} |"
            f" {med['advis32']:.3f} | {med['base8'] / med['base32']:.2f} |"
            f" {med['advis32'] / med['base32']:.2f} |"
        )


if __name__ == "__main__":
    main()
