#!/usr/bin/env python3
"""Dump .explain("formatted") for chosen queries to plans/<dir>/<q>_<tag>.txt.

Usage: PYTHONPATH=<repo> python tools/dump_plans.py <out_dir> <tag> q1,q2,...
"""

from __future__ import annotations

import os
import sys

from prestodb_presto_spark.queries import load_all
from prestodb_presto_spark.session import get_spark


def main() -> None:
    out_dir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans", shuffle_partitions=32)
    specs = load_all()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = specs[name].spark_fn(spark, "/root/testdata/sf0.1")
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
