"""Materialization-strategy knob (operators/materialize) — round-12
task 2: localCheckpoint blocks are unreplicated executor storage, so
every shared-result boundary must be switchable to a cluster-durable
strategy without touching the operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prestodb_presto_spark.operators.materialize import CONF_KEY, materialize

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _set_mode(spark, mode):
    if mode is None:
        from prestodb_presto_spark.operators.materialize import release_materialized

        release_materialized()  # persist-mode frames must not outlive a test
        spark.conf.unset(CONF_KEY)
    else:
        spark.conf.set(CONF_KEY, mode)


def test_modes_agree_on_lsh_pipeline(spark, docs, tmp_path):
    """The knob changes WHERE the shared result lives, never WHAT it is:
    the full LSH dedup pipeline returns identical pairs under local,
    persist, and reliable."""
    from prestodb_presto_spark.text.minhash import verified_near_dup_pairs

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    results = {}
    try:
        for mode in ("local", "persist", "reliable"):
            _set_mode(spark, mode)
            results[mode] = sorted(
                (r.id_a, r.id_b)
                for r in verified_near_dup_pairs(docs.limit(300)).collect()
            )
    finally:
        _set_mode(spark, None)
    assert results["local"] == results["persist"] == results["reliable"]
    assert len(results["local"]) > 0  # fixture contains seeded near-dups


def test_persist_mode_recomputable_lineage(spark):
    """persist(MEMORY_AND_DISK) must keep lineage alive (that is the
    point: lost blocks recompute), unlike localCheckpoint which
    truncates to opaque RDD blocks."""
    _set_mode(spark, "persist")
    try:
        df = spark.range(100).withColumn("x", F.col("id") * 2)
        out = materialize(df, eager=True)
        assert out.count() == 100
        # lineage intact: the analyzed plan still contains the Range source
        assert "Range" in out._jdf.queryExecution().analyzed().toString()
        # release_materialized (via _set_mode(None) below) unpersists it
    finally:
        _set_mode(spark, None)


def test_truncate_required_upgrades_persist(spark, tmp_path):
    """Iterative sites need lineage truncation each round; under
    persist that silently grows the plan, so truncate_required=True
    upgrades to a reliable checkpoint."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
    _set_mode(spark, "persist")
    try:
        df = spark.range(10).withColumn("x", F.col("id") + 1)
        out = materialize(df, truncate_required=True)
        assert out.count() == 10
        # lineage truncated: the Range source is gone from the plan
        assert "Range" not in out._jdf.queryExecution().analyzed().toString()
    finally:
        _set_mode(spark, None)


def test_connected_components_under_persist(spark, tmp_path):
    """components.py flags truncate_required, so the iterative fixpoint
    stays plan-bounded under every mode."""
    from prestodb_presto_spark.operators.components import connected_components

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt3"))
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "src long, dst long",
    )
    _set_mode(spark, "persist")
    try:
        comp = {
            r.node: r.component for r in connected_components(edges).collect()
        }
    finally:
        _set_mode(spark, None)
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == 20


def test_bad_mode_and_missing_checkpoint_dir_fail_loud(spark):
    _set_mode(spark, "spinning-rust")
    try:
        with pytest.raises(ValueError, match="must be one of"):
            materialize(spark.range(1))
    finally:
        _set_mode(spark, None)
    # reliable without a checkpoint dir: loud, actionable error
    jsc = spark.sparkContext._jsc.sc()
    if jsc.getCheckpointDir().isEmpty():
        _set_mode(spark, "reliable")
        try:
            with pytest.raises(ValueError, match="setCheckpointDir"):
                materialize(spark.range(1))
        finally:
            _set_mode(spark, None)


def test_release_materialized_drops_persisted(spark):
    """persist-mode frames are tracked and released: after
    release_materialized() the session holds no more cached RDDs than
    before (the round-12 full-suite cross-test leak)."""
    from prestodb_presto_spark.operators.materialize import release_materialized

    release_materialized()
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    _set_mode(spark, "persist")
    try:
        for _ in range(3):
            materialize(spark.range(50).selectExpr("id * 2 AS x")).count()
        released = release_materialized()
        assert released >= 3
        assert jsc.getPersistentRDDs().size() <= base
    finally:
        _set_mode(spark, None)


def test_release_is_session_scoped(spark):
    """r13 (VERDICT #5 / ADVICE): the persist registry is keyed per
    session — releasing one session's frames must not unpersist (or trip
    over) another session's."""
    from prestodb_presto_spark.operators.materialize import release_materialized

    release_materialized()
    other = spark.newSession()
    spark.conf.set(CONF_KEY, "persist")
    other.conf.set(CONF_KEY, "persist")
    try:
        mine = materialize(spark.range(40).selectExpr("id * 3 AS x"))
        theirs = materialize(other.range(40).selectExpr("id * 5 AS y"))
        assert mine.count() == 40 and theirs.count() == 40
        assert release_materialized(spark) == 1
        # the other session's frame is still cached and usable
        assert theirs.storageLevel.useMemory or theirs.storageLevel.useDisk
        assert theirs.count() == 40
        assert release_materialized(other) == 1
        assert release_materialized() == 0  # nothing tracked anywhere now
    finally:
        spark.conf.unset(CONF_KEY)
        other.conf.unset(CONF_KEY)
        release_materialized()


def test_release_is_scope_scoped(spark):
    """r14 (ADVICE): frames are tracked per owner scope — releasing one
    pipeline's scope must not unpersist a concurrent pipeline's frames in
    the SAME session (the streaming-epoch release case)."""
    from prestodb_presto_spark.operators.materialize import (
        materialization_scope,
        release_materialized,
    )

    release_materialized()
    _set_mode(spark, "persist")
    try:
        with materialization_scope("pipeline-a"):
            a = materialize(spark.range(30).selectExpr("id * 2 AS x"))
        with materialization_scope("pipeline-b"):
            b = materialize(spark.range(30).selectExpr("id * 7 AS y"))
        unscoped = materialize(spark.range(30).selectExpr("id AS z"))
        assert a.count() == b.count() == unscoped.count() == 30
        # releasing scope a touches exactly scope a
        assert release_materialized(spark, scope="pipeline-a") == 1
        assert b.storageLevel.useMemory or b.storageLevel.useDisk
        assert unscoped.storageLevel.useMemory or unscoped.storageLevel.useDisk
        # releasing the session without a scope drains the rest
        assert release_materialized(spark) == 2
    finally:
        _set_mode(spark, None)


def test_q15_and_engine_close_leave_no_cache_residue(spark):
    """r13 VERDICT #4/#8: tpch_q15's shared CTE must not leave a
    CacheManager entry after the query runs, and Engine.close() releases
    every persist-mode frame of its session."""
    from prestodb_presto_spark.engine import Engine
    from prestodb_presto_spark.operators.materialize import release_materialized
    from prestodb_presto_spark.queries import load_all

    release_materialized()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    cache_mgr.clearCache()
    load_all()["tpch_q15"].spark_fn(spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    assert cache_mgr.isEmpty()  # the r13 .cache() form left an entry here

    _set_mode(spark, "persist")
    try:
        eng = Engine(spark)
        materialize(spark.range(25).selectExpr("id AS v")).count()
        assert not cache_mgr.isEmpty()
        eng.close()
        assert cache_mgr.isEmpty()
    finally:
        _set_mode(spark, None)
