"""The differential gate as pytest: every catalog query vs its DuckDB
oracle at sf0.001 (the driver runs the same at sf0.01).

Mirrors the reference's H2-differential suite
(presto-tests/.../AbstractTestQueries.java + H2QueryRunner.java:88).
"""

from __future__ import annotations

import pytest

from prestodb_presto_spark.queries import load_all
from prestodb_presto_spark.testing import compare
from tests.conftest import SF_TINY

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, oracle):
    spec = SPECS[name]
    df = spec.spark_fn(spark, SF_TINY)
    if spec.oracle is None:
        # rows-only contract: must execute and return a stable schema
        assert df.collect() is not None
        return
    err = compare(df, oracle, spec.oracle)
    assert err is None, f"{name}: {err}"
