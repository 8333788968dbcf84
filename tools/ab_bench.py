#!/usr/bin/env python3
"""A/B experiment harness for optimization rounds.

Times a chosen subset of catalog queries (min of N noop-sink runs, warm
JVM, sf0.1) under conf overrides passed as KEY=VALUE args, so a candidate
session conf or query rewrite can be measured in isolation before it
lands in session.py / the query module.

Usage:
    python tools/ab_bench.py q1,q2,... [N] [spark.conf.key=value ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prestodb_presto_spark.queries import load_all
from prestodb_presto_spark.session import get_spark


def main() -> None:
    names = sys.argv[1].split(",")
    n = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 5
    overrides = dict(a.split("=", 1) for a in sys.argv[3:] if "=" in a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-bench", extra_conf=overrides)
    specs = load_all()
    # warm-up at sf0.001 (codegen/JIT), matching bench.py methodology
    for name in names:
        specs[name].spark_fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    total = 0.0
    for name in names:
        fn = specs[name].spark_fn
        runs = []
        for _ in range(n):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        runs.sort()
        total += runs[0]
        print(f"{name}: min {runs[0]:.3f}s median {runs[len(runs)//2]:.3f}s  all={['%.3f' % r for r in runs]}")
    print(f"TOTAL(min): {total:.3f}s  overrides={overrides}")


if __name__ == "__main__":
    main()
