"""Interleaved checkout A/B — the measurement discipline for perf
claims (docs/SCALING.md round-8 and round-13 notes): a query's cross-
round drift may only be claimed as a code regression/win after probes
of BOTH checkouts alternate within ONE sitting, so ambient container
drift cancels instead of masquerading as the code delta.

Each probe is a fresh subprocess (own JVM) that warms the named
queries once, times ITERS runs each (median reported), and brackets
the run with the SAME CPU calibration kernel bench.py uses — so every
probe carries its own container-speed yardstick. Probe order is
NEW OLD OLD NEW NEW OLD: the mirrored middle pair (OLD,NEW / NEW,OLD)
cancels a linear ambient trend; the outer probes (first NEW, last OLD)
are NOT trend-balanced against each other, so under a strong monotone
drift compare the inner four first and use cal_start/cal_end to decide
whether the outers are trustworthy.

Usage:
    python tools/ab_interleaved.py OLD_CHECKOUT q1,q2[,...] \
        [sf_dir] [iters]

OLD_CHECKOUT is a git worktree of the comparison commit (create with
`git worktree add /tmp/rNNrepo <sha>`); the current repo is always the
B side. Output: one ABRESULT json line per probe plus a verdict table
of per-query medians-of-medians.

Round-13 provenance: this formalizes the /tmp harness that acquitted
the r11→r12 drift (dd_prefix_filter_join: r11 bits 7.1/7.1/11.7 s vs
current 6.1/7.5/6.6 s on the same container — the recorded 3.81 s was
unreproducible with r11's own code, so the move was environmental).
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
repo, sf_dir, names, iters = (
    sys.argv[1], sys.argv[2], sys.argv[3].split(","), int(sys.argv[4])
)
sys.path.insert(0, repo)
from big_data_training_spark import get_session
from big_data_training_spark.registry import all_queries

spark = get_session("ab_probe")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()

def cal():
    runs = []
    for _ in range(3):
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "sum(id * 3 + id % 7) AS s"
        ).collect()
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 3)

out = {"repo": repo, "cal_start": cal(), "queries": {}}
for name in names:
    fn = specs[name].fn
    fn(spark, sf_dir).count()  # warm
    runs = []
    for _ in range(iters):
        t0 = time.time()
        fn(spark, sf_dir).count()
        runs.append(time.time() - t0)
    out["queries"][name] = {
        "median": round(statistics.median(runs), 3),
        "min": round(min(runs), 3),
        "max": round(max(runs), 3),
    }
out["cal_end"] = cal()
print("ABRESULT " + json.dumps(out))
"""


def _probe(repo: str, sf_dir: str, names: str, iters: int) -> dict:
    # cwd + PYTHONPATH must BOTH point at the probed checkout: the
    # driver-side sys.path.insert covers the driver only, while PySpark
    # workers unpickle module-level functions BY REFERENCE and re-import
    # the package via the worker's PYTHONPATH/cwd — without this, a probe
    # of a worker-body change runs the OTHER side's worker code (crash at
    # best, silently timing the wrong code at worst).
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    res = subprocess.run(
        [sys.executable, "-c", _PROBE, repo, sf_dir, names, str(iters)],
        capture_output=True,
        text=True,
        cwd=repo,
        env=env,
    )
    for line in res.stdout.replace("\r", "\n").splitlines():
        if line.startswith("ABRESULT "):
            d = json.loads(line[len("ABRESULT ") :])
            print(line)
            return d
    sys.exit(
        f"probe in {repo} produced no ABRESULT line\n"
        f"stderr tail: {res.stderr[-2000:]}"
    )


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_repo = os.path.abspath(sys.argv[1])
    names = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    if not os.path.isdir(os.path.join(old_repo, "big_data_training_spark")):
        sys.exit(f"{old_repo} is not a checkout of this repo")

    sides = {"OLD": old_repo, "NEW": REPO}
    results: dict[str, list[dict]] = {"OLD": [], "NEW": []}
    for side in ("NEW", "OLD", "OLD", "NEW", "NEW", "OLD"):
        results[side].append(_probe(sides[side], sf_dir, names, iters))

    print("\nverdict (median of per-probe medians; claim only net moves):")
    print("| query | OLD medians | NEW medians | NEW/OLD |")
    for q in names.split(","):
        om = [r["queries"][q]["median"] for r in results["OLD"]]
        nm = [r["queries"][q]["median"] for r in results["NEW"]]
        ratio = statistics.median(nm) / max(statistics.median(om), 1e-9)
        print(
            f"| {q} | {om} | {nm} | {ratio:.2f}x |"
        )
    cals = {
        s: [r["cal_start"] for r in rs] + [r["cal_end"] for r in rs]
        for s, rs in results.items()
    }
    print(f"cal spread OLD {sorted(cals['OLD'])} NEW {sorted(cals['NEW'])}")


if __name__ == "__main__":
    main()
