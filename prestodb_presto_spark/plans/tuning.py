"""Scale-tier Spark configuration: the 100 TB posture, computed.

Sizing rules (the ones every query in this repo is written against):

- **Shuffle partition count**: target 128-256 MB of shuffle input per
  partition.  Too few → spills + stragglers; too many → scheduler
  overhead + tiny files.  AQE coalescing trims the excess at runtime,
  so round UP.
- **Scan split size**: `files.maxPartitionBytes` 128 MB keeps a scan
  task's working set inside a 4-8 GB executor heap even with wide rows.
- **Broadcast threshold**: 64 MB locally; on a large cluster a 256 MB
  build side is still far cheaper than shuffling a 100 TB probe side —
  scale it with executor memory, and let AQE convert to broadcast when
  runtime stats shrink below it.
- **Skew**: AQE skew-join splitting on; structural skew uses
  operators/skew.py salting.

Local test runs and a 1000-executor cluster use the SAME semantic
confs — only the parallelism numbers differ, which is exactly what
this module computes.
"""

from __future__ import annotations

_MB = 1024 * 1024


def shuffle_partitions_for(
    shuffle_bytes: int,
    target_partition_bytes: int = 192 * _MB,
    min_partitions: int = 32,
    max_partitions: int = 200_000,
) -> int:
    """Partition count for an expected shuffle volume.

    100 TB of shuffle at 192 MB/partition → ~546k capped to 200k (the
    practical scheduler ceiling); 1 GB locally → 32.
    """
    n = max(min_partitions, -(-shuffle_bytes // target_partition_bytes))
    return min(n, max_partitions)


def cluster_conf(
    total_data_bytes: int,
    executors: int = 1,
    cores_per_executor: int = 4,
    executor_mem_gb: int = 8,
) -> dict[str, str]:
    """Conf preset for a data volume + cluster shape.

    >>> cluster_conf(100 * 1024**4, executors=1000, cores_per_executor=4,
    ...              executor_mem_gb=16)  # the 100 TB tier
    """
    # assume shuffles carry ~1/4 of scanned volume after pushdown/pruning
    shuffle_est = total_data_bytes // 4
    parts = shuffle_partitions_for(shuffle_est)
    # keep at least 2 waves of tasks per core so stragglers overlap
    parts = max(parts, executors * cores_per_executor * 2)
    broadcast_mb = min(max(64, executor_mem_gb * 1024 // 32), 512)
    return {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(192 * _MB),
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": f"{broadcast_mb}MB",
        "spark.sql.files.maxPartitionBytes": str(128 * _MB),
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.session.timeZone": "UTC",
    }
