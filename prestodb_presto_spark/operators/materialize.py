"""Session-configurable materialization boundaries.

Several operators need a point where a DataFrame's result is computed
ONCE and reused by more than one downstream job (the LSH hot-bucket
guard, the shared shingle arrays, iterative connected-components
rounds).  ``localCheckpoint`` is the fastest way to get one, but its
blocks are UNREPLICATED executor storage: on a real cluster, losing the
executor that holds a block kills every job still reading it — at the
100 TB design point that is a durability bug, not a perf detail.

This module centralizes the choice behind one session conf::

    spark.prestodb_presto_spark.materialization = local | persist | reliable

- ``local`` (default): ``localCheckpoint`` — fastest, lineage
  truncated, blocks die with their executor.  Right for single-node
  and for short-lived intra-query boundaries.
- ``persist``: ``persist(MEMORY_AND_DISK)`` — blocks are
  recomputable from lineage on executor loss (Spark re-derives the
  lost partitions), at the cost of keeping the lineage alive.  Right
  default for long multi-job pipelines on a shared cluster.
- ``reliable``: ``RDD checkpoint`` to ``spark.checkpoint.dir``
  (HDFS/S3 in production) — survives executor AND driver loss.
  Right for state that outlives a job (streaming dedup epochs).

Sites that REQUIRE lineage truncation (iterative algorithms whose plan
would otherwise grow every round, e.g. operators/components.py) pass
``truncate_required=True``: there ``persist`` is upgraded to
``reliable`` because persist alone leaves the growing plan in place.
"""

from __future__ import annotations

import contextvars
from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame

CONF_KEY = "spark.prestodb_presto_spark.materialization"
_MODES = ("local", "persist", "reliable")

# persist-mode bookkeeping: persisted frames have no downstream owner to
# unpersist them, so they are tracked here and released explicitly (the
# same pattern as queries/packing.release_packing_cache; DataFrame.persist
# registers the plan in the session CacheManager, which holds a strong
# reference — ContextCleaner can NOT reclaim it, so explicit release is
# the only path).  r13 (ADVICE): keyed per session so frames of a
# stopped/replaced SparkSession don't accumulate forever and releasing
# one session's frames cannot touch another's.  r14 (ADVICE): keyed per
# (session, scope) so a pipeline that releases per epoch (streaming
# dedup) cannot unpersist frames a CONCURRENT pipeline of the same
# session is still reading — owners pass their own scope token.
_PERSISTED: dict[tuple[int, str | None], list[DataFrame]] = {}

# ambient owner scope: operators deep inside a pipeline (the LSH hot-
# bucket guard, shared shingle arrays) call materialize() without a
# scope of their own — a pipeline wraps its whole body in
# ``materialization_scope(token)`` so every nested materialize is tagged
# with the pipeline's token and released together, and only together.
_SCOPE: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "materialization_scope", default=None
)


@contextmanager
def materialization_scope(token: str):
    """Tag every ``materialize()`` in the body with ``token`` (owner
    scope for release_materialized)."""
    reset = _SCOPE.set(token)
    try:
        yield token
    finally:
        _SCOPE.reset(reset)


def release_materialized(session=None, scope: str | None = None) -> int:
    """Unpersist frames persisted by ``materialize`` under the ``persist``
    strategy; returns how many were released.  Call at the end of a
    pipeline run (or per streaming epoch) when the session stays alive.
    With ``scope`` releases only that owner's frames; with
    ``session=None`` releases every tracked session's frames."""
    n = 0
    if session is None:
        keys = list(_PERSISTED)
    elif scope is not None:
        keys = [(id(session), scope)]
    else:
        keys = [k for k in _PERSISTED if k[0] == id(session)]
    for key in keys:
        for df in _PERSISTED.pop(key, []):
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass
    return n


def materialization_mode(df: DataFrame) -> str:
    mode = df.sparkSession.conf.get(CONF_KEY, "local")
    if mode not in _MODES:
        raise ValueError(f"{CONF_KEY} must be one of {_MODES}, got {mode!r}")
    return mode


def materialize(
    df: DataFrame,
    eager: bool = True,
    truncate_required: bool = False,
    scope: str | None = None,
) -> DataFrame:
    """Return a DataFrame whose result is computed once and shared by
    all downstream jobs, using the session's configured strategy.
    ``scope`` names the owning pipeline so its frames can be released
    without touching a concurrent pipeline's (release_materialized)."""
    mode = materialization_mode(df)
    if mode == "persist" and truncate_required:
        mode = "reliable"
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if scope is None:
            scope = _SCOPE.get()
        _PERSISTED.setdefault((id(df.sparkSession), scope), []).append(out)
        if eager:
            out.count()
        return out
    # reliable: needs spark.checkpoint.dir; fall back loudly if unset
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        raise ValueError(
            "materialization=reliable requires sparkContext.setCheckpointDir "
            "(an HDFS/S3 path on a real cluster)"
        )
    return df.checkpoint(eager=eager)
