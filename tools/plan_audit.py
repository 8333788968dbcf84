#!/usr/bin/env python3
"""Physical-plan audit across the whole query catalog.

Prints one row per query: Exchange / SortMergeJoin / BroadcastHashJoin /
CartesianProduct / Python-eval / BroadcastNestedLoopJoin node counts from
the formatted plan (counts are doubled by the formatted mode's detail
section — compare relatively).  Review rules:

  - CartesianProduct anywhere but join_cross = bug (dead at 100 TB);
  - EvalPython outside text/multimodal modules = hot-path regression;
  - SortMergeJoin is legitimate only for large-large joins that cannot
    broadcast (full outer, LSH bucket self-join);
  - BroadcastNestedLoopJoin is legitimate only with a 1-row/broadcast
    side (scalar-subquery joins, explicit cross).

tests/test_plans.py enforces the hard rules; this tool is for eyeballing
the full surface after adding operators.

Usage: SPARK_GRAFT_CPUS=16 python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prestodb_presto_spark.queries import load_all
from prestodb_presto_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit", shuffle_partitions=16)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    rows = []
    for name, spec in sorted(load_all().items()):
        try:
            plan = spec.spark_fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
            rows.append(
                (
                    name,
                    plan.count("Exchange"),
                    plan.count("SortMergeJoin"),
                    plan.count("BroadcastHashJoin"),
                    plan.count("CartesianProduct"),
                    plan.count("EvalPython"),
                    plan.count("BroadcastNestedLoopJoin"),
                )
            )
        except Exception as exc:  # noqa: BLE001 - audit must report, not die
            rows.append((name, -1, -1, -1, -1, -1, str(exc)[:60]))
    print(f"{'query':30s} exch smj bhj cart py bnlj")
    for r in sorted(rows, key=lambda r: -(r[1] if isinstance(r[1], int) else 0)):
        print(f"{r[0]:30s} {r[1]:4} {r[2]:3} {r[3]:3} {r[4]:4} {r[5]:2} {r[6]}")


if __name__ == "__main__":
    main()
