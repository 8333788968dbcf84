"""Spill verification: memory-constrained runs must succeed, not OOM.

Mirrors the reference's spilled-query suites
(presto-tests/.../TestDistributedSpilledQueries.java,
TestSpilledAggregations.java): the same queries, a fraction of the
memory.  Spark's operators (UnsafeExternalSorter, hash aggregate
fallback, shuffle spill) must absorb the pressure — at 100 TB every
executor lives in this regime.

Runs in a subprocess because driver memory is a static conf.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.driver.memory", "600m")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")

# full sort of 600k rows + wide aggregation + big-key join, all in 600 MB
n1 = li.orderBy("l_extendedprice", "l_orderkey").count()
agg = (
    li.groupBy("l_orderkey")
    .agg(F.sum("l_quantity").alias("q"), F.collect_list("l_linenumber").alias("lines"))
    .count()
)
j = li.alias("a").join(
    li.alias("b"), ["l_orderkey", "l_linenumber"]
).count()
assert n1 > 500_000, n1
assert agg > 0 and j >= n1, (agg, j)  # (key not unique in synthetic data -> fan-out)
print("SPILL_OK", n1, agg, j)
"""


def test_constrained_memory_run_succeeds():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SPILL_OK" in proc.stdout
