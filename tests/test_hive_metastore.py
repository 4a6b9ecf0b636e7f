"""S9 warehouse storage against a REAL Hive metastore (README.md:20
names Hive as the reference's warehouse layer).

The pyspark distribution ships the hive-metastore jars, so
``enableHiveSupport()`` gives a genuine HiveExternalCatalog backed by an
embedded Derby metastore — persistent across SparkSessions, unlike the
in-memory session catalog the rest of the suite uses. Catalog
implementation is a *static* conf, so each session here runs in its own
subprocess; persistence is proven by writing in one JVM and reading the
table back in a second, fresh one.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

_COMMON = """
import sys
from pyspark.sql import SparkSession

warehouse = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("hive_metastore_test")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .enableHiveSupport()
    .getOrCreate()
)
assert spark.conf.get("spark.sql.catalogImplementation") == "hive", (
    spark.conf.get("spark.sql.catalogImplementation")
)
"""

_WRITE = _COMMON + """
spark.sql("CREATE DATABASE IF NOT EXISTS bdts_hive")
df = spark.createDataFrame(
    [(1, "alpha"), (2, "beta"), (3, "gamma")], "id bigint, name string"
)
df.write.mode("overwrite").saveAsTable("bdts_hive.s9_hive_table")
print("WROTE", spark.table("bdts_hive.s9_hive_table").count())
spark.stop()
"""

_READ = _COMMON + """
dbs = [d.name for d in spark.catalog.listDatabases()]
assert "bdts_hive" in dbs, dbs
rows = sorted(
    (r.id, r.name) for r in spark.table("bdts_hive.s9_hive_table").collect()
)
assert rows == [(1, "alpha"), (2, "beta"), (3, "gamma")], rows
print("READBACK_OK", len(rows))
spark.stop()
"""


def _run(script: str, cwd: str, warehouse: str) -> str:
    env = dict(os.environ)
    # Derby writes metastore_db under the working directory: pointing both
    # JVMs at the same cwd IS the shared metastore.
    out = subprocess.run(
        [sys.executable, "-c", script, warehouse],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, f"stdout={out.stdout}\nstderr={out.stderr[-3000:]}"
    return out.stdout


def test_s9_hive_metastore_persists_across_sessions():
    with tempfile.TemporaryDirectory(prefix="bdts_hive_") as d:
        wh = os.path.join(d, "warehouse")
        out1 = _run(_WRITE, d, wh)
        assert "WROTE 3" in out1
        # second, fresh JVM: the table must come back through the Derby
        # metastore, not any in-memory state
        out2 = _run(_READ, d, wh)
        assert "READBACK_OK 3" in out2
