"""Bench harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized (count forces the whole plan). Every
query is timed over ``$SPARK_GRAFT_BENCH_ITERS`` iterations (default 3)
and the reported number is the per-query MEDIAN — single-shot timing of
sub-second queries produced phantom 2-3x "regressions" in round 3 that
disappeared on re-measurement (VERDICT r3 #5). Min/max spread per query
goes to stderr and the JSON's "spread" field so round-over-round
comparisons can tell noise from signal. A warmup pass at the smallest
fixture primes JVM/codegen/Arrow before any timing.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_training_spark import get_session
from big_data_training_spark.registry import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))

# Reference calibration-kernel runtime on an unloaded container: every
# clean r10/r11 record measured 0.217-0.273 s (median ≈ 0.25), while the
# load-contaminated BENCH_r11.json measured 1.026 s and its raw totals
# read as a phantom 2.9x regression. All cal-adjusted numbers below scale
# by (CAL_NORM_SEC / measured cal) so a loaded container cannot fake a
# regression — compare `value_cal_adjusted` across rounds, not `value`.
CAL_NORM_SEC = 0.25
# A run whose cal exceeds this is flagged: its RAW numbers are ambient
# load, not code, and should not be read per-query without adjustment.
CAL_FLAG_RATIO = 1.5
# Second calibration axis (VERDICT r12 #3): the CPU-bound kernel above
# under-detects scheduler contention (r12 forensic record 1786877797)
# and over-corrects queries that are less CPU-bound than it is
# (1786879193). This one is SHUFFLE-bound — a fixed groupBy whose
# map-side combine barely compresses, so most of its time is exchange
# write/read + task scheduling, the component streaming and join-heavy
# queries actually feel. Norm measured on the same unloaded container
# as CAL_NORM_SEC. The two ratios disagreeing (> CAL_AXES_DISAGREE_X
# apart) means ambient load is contention-shaped, not cycle-shaped —
# read NEITHER adjusted total as a code signal for shuffle-heavy rows.
# Norm pinned from 4 steady-state runs on an idle container with the
# cpu cal at its 0.25 norm: 0.72/0.79/0.80/0.84. NOTE the kernel does
# NOT scale linearly with row count (fixed 3-stage x 32-task
# scheduling floor) — the norm must be measured, never derived.
CAL_SHUFFLE_NORM_SEC = 0.79
CAL_AXES_DISAGREE_X = 1.5


def _cpu_mhz() -> float | None:
    try:
        with open("/proc/cpuinfo") as f:
            mhz = [
                float(line.split(":")[1])
                for line in f
                if line.startswith("cpu MHz")
            ]
        return round(statistics.median(mhz), 0) if mhz else None
    except (OSError, ValueError, IndexError):
        return None


def _calibration_sec(spark) -> float:
    """Median runtime of a FIXED data-independent kernel (codegen'd
    integer fold over range(1e9), all 32 cores) — a same-session yard-
    stick for container speed. Round-over-round bench ratios divide out
    this number before being read as code regressions: r6→r7 drifted a
    uniform 1.4x on untouched code and was unattributable without it."""
    runs = []
    for _ in range(3):
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "sum(id * 3 + id % 7) AS s"
        ).collect()
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 3)


def _calibration_shuffle_sec(spark) -> float:
    """Median runtime of a FIXED shuffle-bound kernel: 8M rows hashed
    into 1M groups — ~8 rows per key per map partition, so the map-side
    combine compresses little and the exchange carries most of the
    input. Times the shuffle write/fetch/deserialize path plus task
    scheduling across all 32 slots — the axis the CPU kernel misses."""
    runs = []
    for _ in range(3):
        t0 = time.time()
        (
            spark.range(8_000_000)
            .selectExpr("id % 1000000 AS k", "id AS v")
            .groupBy("k")
            .sum("v")
            .selectExpr("count(*) AS n", "sum(`sum(v)`) AS s")
            .collect()
        )
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 3)


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

    # Environment stanza: measured BEFORE the timed runs so a loaded /
    # down-clocked container is visible in the record itself.
    env = {
        "load1": round(os.getloadavg()[0], 2),
        "cpu_mhz": _cpu_mhz(),
        "cal_sec": _calibration_sec(spark),
        "cal_shuffle_sec": _calibration_shuffle_sec(spark),
    }
    print(f"# env: {env}", file=sys.stderr)

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in bench_names:
        runs = []
        n = 0
        for _ in range(ITERS):
            t0 = time.time()
            n = specs[name].fn(spark, SF_DIR).count()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]
        print(
            f"# {name}: median {timings[name]}s "
            f"[min {spread[name][0]} max {spread[name][1]}] ({n} rows)",
            file=sys.stderr,
        )

    # Re-measure the calibration kernel AFTER the timed runs: ambient
    # load that arrived mid-run shows up as cal_sec_end >> cal_sec, and
    # the adjustment uses the mean of the two so a load ramp is split
    # rather than ignored.
    env["cal_sec_end"] = _calibration_sec(spark)
    env["cal_shuffle_sec_end"] = _calibration_shuffle_sec(spark)
    cal_mid = (env["cal_sec"] + env["cal_sec_end"]) / 2
    cal_scale = CAL_NORM_SEC / cal_mid if cal_mid > 0 else 1.0
    env["cal_flagged"] = cal_mid > CAL_FLAG_RATIO * CAL_NORM_SEC
    # Two-axis disagreement check: the CPU ratio and the shuffle ratio
    # should move together under pure frequency/cycle contention; a
    # shuffle ratio far above the CPU ratio means scheduler/IO
    # contention the CPU-normed adjustment cannot correct for.
    shuf_mid = (env["cal_shuffle_sec"] + env["cal_shuffle_sec_end"]) / 2
    cpu_ratio = cal_mid / CAL_NORM_SEC if CAL_NORM_SEC else 1.0
    shuf_ratio = shuf_mid / CAL_SHUFFLE_NORM_SEC if CAL_SHUFFLE_NORM_SEC else 1.0
    env["cal_cpu_ratio"] = round(cpu_ratio, 3)
    env["cal_shuffle_ratio"] = round(shuf_ratio, 3)
    env["cal_axes_disagree"] = (
        max(cpu_ratio, shuf_ratio) / max(1e-9, min(cpu_ratio, shuf_ratio))
        > CAL_AXES_DISAGREE_X
    )
    if env["cal_axes_disagree"]:
        print(
            f"# WARNING: calibration axes disagree (cpu {cpu_ratio:.2f}x"
            f" vs shuffle {shuf_ratio:.2f}x norm) — contention-shaped "
            "load; cal-adjusted totals are unreliable for shuffle-heavy "
            "and streaming rows this run",
            file=sys.stderr,
        )
    if env["cal_flagged"]:
        print(
            f"# WARNING: calibration {cal_mid:.3f}s > "
            f"{CAL_FLAG_RATIO}x norm {CAL_NORM_SEC}s — container is "
            "loaded; read value_cal_adjusted, not value",
            file=sys.stderr,
        )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Full detail (incl. min/max spread) goes to stderr for the repo's own
    # records; the driver only keeps the LAST ~2000 chars of stdout, so the
    # final stdout line must stay under that or the round's bench is lost
    # (this happened in round 5: BENCH_r05.json has parsed:null).
    print(json.dumps({"spread": spread, "iters": ITERS}), file=sys.stderr)

    payload = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "value_cal_adjusted": round(sum(timings.values()) * cal_scale, 3),
        "cal_norm_sec": CAL_NORM_SEC,
        "unit": "sec",
        "queries": timings,
        "iters": ITERS,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "env": env,
    }
    queries_cal_adjusted = {
        n: round(t * cal_scale, 3) for n, t in timings.items()
    }
    # Persist the FULL payload (every query + spread) in-repo BEFORE the
    # stdout trim below: the driver keeps only ~2000 chars of stdout, so
    # BENCH_r08 lost per-query history for the 52 fastest queries (incl.
    # the whole round-1 baseline set) and bench-vs-baseline had to be
    # re-measured from scratch. The round label comes from
    # $SPARK_GRAFT_ROUND when set; the max(CORRECTNESS_r*)+1 heuristic is
    # only a fallback — it mislabels any run that happens AFTER the
    # current round's CORRECTNESS file lands (the round-9 refresh wrote
    # _r10.json that way). A unix-timestamp suffix makes every record
    # unique so builder and driver runs can never collide either way.
    try:
        import re as _re

        repo = os.path.dirname(os.path.abspath(__file__))
        rnd_env = os.environ.get("SPARK_GRAFT_ROUND")
        if rnd_env and rnd_env.isdigit():
            rnd = int(rnd_env)
        else:
            rounds = [
                int(m.group(1))
                for f in os.listdir(repo)
                if (m := _re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f))
            ]
            rnd = (max(rounds) + 1) if rounds else 0
        full = dict(
            payload, spread=spread, queries_cal_adjusted=queries_cal_adjusted
        )
        with open(
            os.path.join(
                repo, "docs", f"BENCH_FULL_r{rnd:02d}_{int(time.time())}.json"
            ),
            "w",
        ) as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
    except OSError as exc:  # never let bookkeeping kill the bench line
        print(f"# BENCH_FULL write failed: {exc}", file=sys.stderr)
    line = json.dumps(payload, separators=(",", ":"))
    # Keep the most expensive queries (the perf signal), drop the rest
    # from the line — never from the measurement. Loop until the line
    # actually fits the driver's ~2000-char stdout tail (one halving was
    # not guaranteed to as the bench set grows).
    n_keep = len(timings)
    while len(line) > 1800 and n_keep > 1:
        n_keep = max(1, n_keep // 2)
        keep = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:n_keep])
        payload["queries"] = {k: keep[k] for k in sorted(keep)}
        payload["queries_omitted"] = len(timings) - len(keep)
        line = json.dumps(payload, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
