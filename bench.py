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
# Third calibration axis (VERDICT r13 #1): the driver's r13 record read
# at-norm on BOTH axes above while its streaming rows ran 1.6-2.2x
# inflated (st_j2_outer 11.13 s vs 5.66 s same-day at-norm) — ambient
# load was micro-batch-scheduling-shaped, which neither a codegen fold
# nor one 3-stage batch shuffle feels. This kernel replays N_TRIGGERS
# no-op foreachBatch micro-batches (maxFilesPerTrigger=1 over N single-
# row files), so its time is almost pure per-trigger scheduling latency:
# stream planning + offset tracking + checkpoint commit + one 1-task job
# per trigger — the component every st_*/w6 replay row pays tens of
# times over. Norm pinned by MEASUREMENT (never derived): steady-state
# runs on this container with cpu-cal at 0.20-0.26 and shuffle-cal at
# 0.66-0.78 measured 1.705/1.732/1.779/1.829/1.857/1.888/1.914/1.962 —
# median ≈ 1.85. (Under the load the background oracle gate generates,
# the same kernel read 1.80-2.47 while cpu-cal stayed 0.21-0.32 — the
# separation this axis exists to expose.) Streaming/trigger-bound rows
# (st_*, w6_*) should be read against cal_trigger_ratio, not the CPU
# ratio.
CAL_TRIGGER_NORM_SEC = 1.85
N_TRIGGERS = 8


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


_TRIGGER_FIXTURE: str | None = None


def _trigger_fixture() -> str:
    """Write N_TRIGGERS single-row parquet files ONCE per process, with
    ascending mtimes so the file source replays them as N successive
    micro-batches. Data content is irrelevant — the kernel prices the
    trigger machinery, not the rows."""
    global _TRIGGER_FIXTURE
    if _TRIGGER_FIXTURE is None:
        import pyarrow as pa
        import pyarrow.parquet as pq
        import tempfile

        d = tempfile.mkdtemp(prefix="bdts_cal_trigger_")
        for i in range(N_TRIGGERS):
            path = os.path.join(d, f"t{i:02d}.parquet")
            pq.write_table(pa.table({"id": [i]}), path)
            os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
        _TRIGGER_FIXTURE = d
    return _TRIGGER_FIXTURE


def _calibration_trigger_sec(spark, n_runs: int = 3) -> float:
    """Median wall time of a FIXED trigger-bound streaming kernel:
    N_TRIGGERS single-row files replayed one-per-trigger through a
    foreachBatch that only counts its 1-row batch. Per run that is query
    start-up plus N_TRIGGERS x (micro-batch plan + schedule + 1-task job
    + checkpoint commit) — the pure per-trigger latency path that
    inflates under contention-shaped ambient load while the CPU and
    shuffle kernels stay at norm (driver r13 record 1786914806).

    ``n_runs=1`` is the cheap MID-RUN sampling form: the r13 record's
    inflation was invisible to BOTH bracket axes because the ambient
    load was transient — present while the streaming rows timed, gone
    by the closing bracket. Start/end brackets alone cannot see that,
    whatever the kernel; interleaved single-run samples can."""
    import shutil
    import tempfile
    import uuid

    topic = _trigger_fixture()
    schema = spark.read.parquet(topic).schema
    runs = []
    for _ in range(n_runs):
        ckpt = tempfile.mkdtemp(prefix="bdts_cal_trigger_ckpt_")
        t0 = time.time()
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(topic)
            .writeStream.foreachBatch(lambda df, _bid: df.count())
            .queryName(f"cal_trigger_{uuid.uuid4().hex[:8]}")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        runs.append(time.time() - t0)
        shutil.rmtree(ckpt, ignore_errors=True)
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
        "cal_trigger_sec": _calibration_trigger_sec(spark),
    }
    print(f"# env: {env}", file=sys.stderr)

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    # Mid-run trigger-cal samples (VERDICT r13 #1): one cheap kernel run
    # every TRIG_SAMPLE_EVERY queries. The r13 driver record's streaming
    # rows ran 1.6-2.2x inflated while BOTH bracket axes read at-norm —
    # the load was transient, present mid-run and gone by the closing
    # bracket. Interleaved samples put the yardstick INSIDE the window
    # the queries actually timed in.
    TRIG_SAMPLE_EVERY = 20
    trig_samples: list[float] = []
    trig_sample_at: list[str] = []
    for i, name in enumerate(bench_names):
        if i % TRIG_SAMPLE_EVERY == 0 and i > 0:
            trig_samples.append(_calibration_trigger_sec(spark, n_runs=1))
            # the query about to run when the sample was taken — lets a
            # reader localize WHICH rows sat inside a flagged burst
            trig_sample_at.append(name)
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
    env["cal_trigger_sec_end"] = _calibration_trigger_sec(spark)
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
    # Trigger ratio from brackets AND mid-run samples: the MEDIAN over
    # all observations normalizes st_*/w6 rows; the MAX flags transient
    # contention that the brackets alone would have missed (the r13
    # failure mode). Samples are single runs (noisier than the 3-run
    # bracket medians) — the median absorbs that; only a sustained
    # excursion moves it.
    env["cal_trigger_samples"] = [round(s, 3) for s in trig_samples]
    env["cal_trigger_sample_at"] = trig_sample_at
    trig_obs = [
        env["cal_trigger_sec"],
        env["cal_trigger_sec_end"],
        *trig_samples,
    ]
    trig_mid = statistics.median(trig_obs)
    trig_ratio = (
        trig_mid / CAL_TRIGGER_NORM_SEC if CAL_TRIGGER_NORM_SEC else 1.0
    )
    env["cal_trigger_max_ratio"] = round(
        max(trig_obs) / CAL_TRIGGER_NORM_SEC, 3
    )
    if env["cal_trigger_max_ratio"] > CAL_AXES_DISAGREE_X:
        print(
            f"# WARNING: a mid-run trigger-cal sample hit "
            f"{env['cal_trigger_max_ratio']}x norm — transient "
            "contention while queries timed; st_*/w6 rows near that "
            "sample are inflated even if bracket axes read at-norm",
            file=sys.stderr,
        )
    env["cal_cpu_ratio"] = round(cpu_ratio, 3)
    env["cal_shuffle_ratio"] = round(shuf_ratio, 3)
    env["cal_trigger_ratio"] = round(trig_ratio, 3)
    ratios = (cpu_ratio, shuf_ratio, trig_ratio)
    env["cal_axes_disagree"] = (
        max(ratios) / max(1e-9, min(ratios)) > CAL_AXES_DISAGREE_X
    )
    if env["cal_axes_disagree"]:
        print(
            f"# WARNING: calibration axes disagree (cpu {cpu_ratio:.2f}x"
            f" vs shuffle {shuf_ratio:.2f}x vs trigger {trig_ratio:.2f}x"
            " norm) — contention-shaped load; cal-adjusted totals are "
            "unreliable this run: read shuffle-heavy rows against the "
            "shuffle axis and st_*/w6 rows against the trigger axis",
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
    # Per-row adjustment uses each row's OWN axis (round 14): st_*/w6
    # rows divide by the trigger ratio, everything else by the CPU
    # ratio — a record taken under trigger-shaped contention no longer
    # writes inflated "adjusted" streaming rows into its own history.
    trig_scale = 1.0 / trig_ratio if trig_ratio > 0 else 1.0
    queries_cal_adjusted = {
        n: round(
            t
            * (
                trig_scale
                if n.startswith("st_") or n.startswith("w6")
                else cal_scale
            ),
            3,
        )
        for n, t in timings.items()
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
