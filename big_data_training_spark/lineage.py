"""Lineage truncation for iterative DataFrame algorithms.

Iterative plans (k-core peeling, star-contraction components, Boruvka
MST, k-truss, power iteration, BFS frontiers) MUST cut the logical
lineage between rounds: round R's tree otherwise embeds several copies
of round R-1's, and plan analysis / cache-plan matching goes
exponential (a 4-round loop with plain ``.persist()`` was measured to
hang the planner for >300s — see extensions/truss.py).

Spark offers two truncation tools with different failure semantics:

- ``localCheckpoint`` — blocks live on executors. Fast (no external
  write) but a lost executor loses its blocks and FAILS the job, since
  the lineage needed to recompute them was just discarded. Fine on
  ``local[*]`` (a single JVM cannot half-die) and for short-lived
  jobs; wrong for long multi-hour runs on preemptible fleets.
- ``checkpoint`` — blocks are written to the checkpoint dir (HDFS/
  object store on a cluster). ~15% slower at sf0.1 (the write), but a
  lost executor replays from storage and the job survives.

This mirrors how GraphX's Pregel handles the same problem: periodic
checkpointing activates only when the user configures a checkpoint
dir. Deployments choose per run:

    SPARK_GRAFT_RELIABLE_CHECKPOINT=1   # use reliable df.checkpoint()
    SPARK_GRAFT_CHECKPOINT_DIR=hdfs://…/ckpt   # optional explicit dir

Unset (the default, and what bench.py / the driver measure), iterative
queries use ``localCheckpoint`` — the right trade on a single node.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV_FLAG = "SPARK_GRAFT_RELIABLE_CHECKPOINT"
_ENV_DIR = "SPARK_GRAFT_CHECKPOINT_DIR"

# Driver-local tempdirs created as a local-master fallback; removed at
# interpreter exit so repeated registry sweeps don't accumulate
# checkpoint blocks on disk (each iterative query checkpoints every
# round). Cluster dirs (explicit _ENV_DIR) are deployment-owned storage
# and are never deleted here — enable
# ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` at session
# creation for GC-driven cleanup there (a static conf; it must be set
# before the JVM context exists, so this module cannot retrofit it).
_TEMP_CKPT_DIRS: list[str] = []


def _cleanup_temp_ckpt_dirs() -> None:
    import shutil

    for d in _TEMP_CKPT_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def reliable_enabled() -> bool:
    return os.environ.get(_ENV_FLAG, "") == "1"


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s logical lineage between iterative rounds.

    Returns a DataFrame whose plan is a leaf (RDD scan), so the next
    round's plan does not embed this round's. Reliable vs executor-
    local block storage is a deployment decision — see module doc.
    """
    if reliable_enabled():
        spark = df.sparkSession
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            ckpt = os.environ.get(_ENV_DIR)
            if not ckpt:
                # A driver-local tempdir is only recoverable storage when
                # the executors ARE the driver JVM. On a real cluster a
                # non-shared path silently defeats the fault tolerance
                # this mode exists for, so refuse instead of degrading.
                if not sc.master.startswith("local"):
                    raise RuntimeError(
                        f"{_ENV_FLAG}=1 on master {sc.master!r} requires "
                        f"{_ENV_DIR} to point at shared storage "
                        "(HDFS/object store); a driver-local tempdir "
                        "would make checkpoint blocks unrecoverable."
                    )
                import atexit
                import tempfile

                ckpt = tempfile.mkdtemp(prefix="spark-graft-ckpt-")
                if not _TEMP_CKPT_DIRS:
                    atexit.register(_cleanup_temp_ckpt_dirs)
                _TEMP_CKPT_DIRS.append(ckpt)
            sc.setCheckpointDir(ckpt)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
