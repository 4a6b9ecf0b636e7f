"""Count Spark JOBS (and wall time) per query — the metric VERDICT r14
#3 targets for the iterative gr_* family, whose 8v32 scaling ratios ≈ 1
say the floor is per-round job/scheduler latency, not plan waste.

Each named query runs inside its own job group; the group's job count
comes from the status tracker. Usage:

    python tools/probe_gr_jobs.py gr_kcore_ladder gr_boruvka_msf_rounds \
        [--sf /root/testdata/sf0.1] [--iters 2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_training_spark import get_session
from big_data_training_spark.registry import all_queries


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.1"
    iters = 2
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf = sys.argv[i + 1]
        if a == "--iters":
            iters = int(sys.argv[i + 1])
    spark = get_session("probe_gr_jobs")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    tracker = spark.sparkContext.statusTracker()
    for name in args:
        fn = specs[name].fn
        fn(spark, sf).count()  # warm
        for it in range(iters):
            gid = f"probe_{name}_{it}"
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", gid)
            t0 = time.time()
            fn(spark, sf).count()
            dt = time.time() - t0
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
            jobs = tracker.getJobIdsForGroup(gid)
            n_stages = 0
            n_tasks = 0
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            print(
                f"JOBS {name} iter={it} wall={dt:.3f}s jobs={len(jobs)} "
                f"stages={n_stages} tasks={n_tasks}",
                flush=True,
            )


if __name__ == "__main__":
    main()
