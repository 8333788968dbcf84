"""Window function names (ranking + value) — registry-owned bindings.

The reference registers these as window functions
(presto-main/.../metadata/FunctionRegistry.java:470-490 — RowNumber,
Rank, DenseRank, PercentRank, CumeDist, NTile, Lag, Lead, FirstValue,
LastValue, NthValue under operator/window/).  Spark ships natives with
identical names and semantics, so the bindings are 1:1; they evaluate
over a ``Window`` spec exactly like the reference's OVER clause
(semantics gated by queries/windows_q.py's window_* catalog entries).
Registered here so ``coverage()`` audits them against the reference's
SHOW FUNCTIONS dumps (product-test check*FunctionsRegistered suites).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from prestodb_presto_spark.functions import register


@register("row_number")
def _row_number() -> Column:
    return F.row_number()


@register("rank")
def _rank() -> Column:
    return F.rank()


@register("dense_rank")
def _dense_rank() -> Column:
    return F.dense_rank()


@register("percent_rank")
def _percent_rank() -> Column:
    return F.percent_rank()


@register("cume_dist")
def _cume_dist() -> Column:
    return F.cume_dist()


@register("ntile")
def _ntile(n: int) -> Column:
    return F.ntile(n)


@register("lag")
def _lag(col, offset: int = 1, default=None) -> Column:
    return F.lag(col, offset, default)


@register("lead")
def _lead(col, offset: int = 1, default=None) -> Column:
    return F.lead(col, offset, default)


@register("first_value")
def _first_value(col) -> Column:
    return F.first(col)


@register("last_value")
def _last_value(col) -> Column:
    return F.last(col)


@register("nth_value")
def _nth_value(col, n: int) -> Column:
    return F.nth_value(col, n)
