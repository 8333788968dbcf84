"""Physical planning helpers: scale-tier configuration presets.

The reference hard-codes its physical strategy per cluster via config
(task concurrency, hash-partition count, memory pools —
presto-main/.../execution/TaskManagerConfig.java etc.); Spark-first the
same knobs are SparkConf, and the right values are a function of data
volume and cluster size.  This package computes them.
"""

from prestodb_presto_spark.plans.tuning import cluster_conf, shuffle_partitions_for

__all__ = ["cluster_conf", "shuffle_partitions_for"]
