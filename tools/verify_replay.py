#!/usr/bin/env python3
"""Replay verifier — the presto-verifier analog (SURVEY §5 layer 6,
presto-verifier/.../Validator.java:67): run every catalog query under two
deliberately different physical configurations and require identical
results.

Config A: the engine defaults (AQE on, broadcast joins enabled).
Config B: AQE off, broadcast disabled (threshold -1), 5 shuffle
partitions — every join degrades to sort-merge, aggregation merge order
changes completely.  Any query whose result depends on the physical
plan (map iteration, partial-agg float order, limit-without-order) fails
here before it flakes in production.

Usage: SPARK_GRAFT_CPUS=16 python tools/verify_replay.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prestodb_presto_spark.queries import load_all
from prestodb_presto_spark.session import get_spark

# queries whose CONTRACT is nondeterministic membership (sampling, LSH
# bucketing with rand-free but plan-dependent candidate order is still
# deterministic; only true random membership is excused)
# sample_bernoulli became plan-independent in round 2 (deterministic md5
# bucket filter); only assign_unique_id's CONTRACT stays nondeterministic
EXCUSED = {"assign_unique_id"}


def snapshot(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return sorted(tuple(str(v) for v in r) for r in rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(load_all())
    specs = load_all()

    spark = get_spark("replay")
    results_a = {}
    for name in names:
        if name in EXCUSED:
            continue
        try:
            results_a[name] = snapshot(specs[name].spark_fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: config-A error {str(exc)[:140]}")
    spark.stop()

    spark_b = get_spark(
        "replay-b",
        shuffle_partitions=5,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    failures = 0
    for name, a in results_a.items():
        try:
            b = snapshot(specs[name].spark_fn(spark_b, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: config-B error {str(exc)[:140]}")
            failures += 1
            continue
        if a != b:
            diff = next((x, y) for x, y in zip(a, b) if x != y) if len(a) == len(b) else (len(a), len(b))
            print(f"FAIL {name}: plan-dependent result, e.g. {diff}")
            failures += 1
        else:
            print(f"PASS {name}")
    print(f"\n== {len(results_a) - failures} stable, {failures} plan-dependent, {len(EXCUSED)} excused")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
