"""Snapshot `explain("formatted")` for named queries into plans/<tag>/.

Optimization-round evidence tool: `python tools/snap_plan.py r14 before
q1_pricing_summary dd_prefix_filter_join ...` writes
plans/r14/<query>_before.txt (or `after`) so plan-shape claims in
OPTIMIZATION_*.md are checkable without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_training_spark import get_session
from big_data_training_spark.registry import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, phase, *names = sys.argv[1:]
    assert phase in ("before", "after"), phase
    spark = get_session("snap_plan")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{phase}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({phase}) — explain(formatted) at {SF_DIR}\n")
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
