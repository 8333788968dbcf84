#!/usr/bin/env python3
"""Per-query execution profile: plan-build time vs run time, job/stage/task
counts and per-stage wall+task-time via a SparkListener-ish poll of the
status tracker's REST-free API.

Usage: python tools/profile_query.py <query> [n_runs] [conf=val ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prestodb_presto_spark.queries import load_all
from prestodb_presto_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 3
    overrides = dict(a.split("=", 1) for a in sys.argv[3:] if "=" in a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile", extra_conf=overrides)
    sc = spark.sparkContext
    spec = load_all()[name]
    # warm
    spec.spark_fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    jsc = sc._jsc.sc()
    for i in range(n):
        t0 = time.time()
        df = spec.spark_fn(spark, sf_dir)
        t1 = time.time()
        before_jobs = jsc.statusTracker().getJobIdsForGroup(None)
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(f"run {i}: build={t1-t0:.3f}s exec={t2-t1:.3f}s total={t2-t0:.3f}s")
    # stage summary from the last run via status tracker
    tracker = jsc.statusTracker()
    job_ids = sorted(tracker.getJobIdsForGroup(None))
    after = [j for j in job_ids if j not in set(before_jobs)]
    total_task_time = 0
    print(f"jobs in last run: {len(after)}")
    for j in after:
        info = tracker.getJobInfo(j)
        if info.isEmpty():
            continue
        info = info.get()
        sids = list(info.stageIds())
        for s in sids:
            si = tracker.getStageInfo(s)
            if si.isEmpty():
                continue
            si = si.get()
            if si.numTasks() == 0:
                continue
            print(f"  job {j} stage {s}: tasks={si.numTasks()} name={si.name()[:80]}")


if __name__ == "__main__":
    main()
