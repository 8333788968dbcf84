from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from prestodb_presto_spark.session import get_spark

    s = get_spark("pytest", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def oracle():
    from prestodb_presto_spark.testing import duckdb_oracle

    return duckdb_oracle(SF_TINY)


@pytest.fixture(scope="session")
def engine(spark):
    from prestodb_presto_spark.engine import Engine

    return Engine(spark, SF_TINY)
