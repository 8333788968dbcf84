"""Scale-tier configuration math."""

from prestodb_presto_spark.plans import cluster_conf, shuffle_partitions_for

TB = 1024**4
GB = 1024**3


def test_shuffle_partitions_scaling():
    assert shuffle_partitions_for(1 * GB) == 32              # local floor
    assert shuffle_partitions_for(1 * TB) == 5462            # ~192MB each
    assert shuffle_partitions_for(100 * TB) == 200_000       # ceiling


def test_cluster_conf_tiers():
    local = cluster_conf(60 * 1024**2, executors=1, cores_per_executor=32, executor_mem_gb=8)
    assert local["spark.sql.shuffle.partitions"] == "64"     # 2 waves of 32
    big = cluster_conf(100 * TB, executors=1000, cores_per_executor=4, executor_mem_gb=16)
    assert int(big["spark.sql.shuffle.partitions"]) == 136534  # 25TB shuffle / 192MB
    assert big["spark.sql.autoBroadcastJoinThreshold"] == "512MB"
    # semantic confs identical across tiers
    for k in ("spark.sql.adaptive.enabled", "spark.sql.session.timeZone"):
        assert local[k] == big[k]
