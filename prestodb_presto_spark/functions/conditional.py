"""Conditional / comparison functions — reference TryFunction.java,
TryCastFunction.java, FailureFunction.java, scalar/Greatest.java, Least.java."""

from __future__ import annotations

from pyspark.sql import functions as F

from prestodb_presto_spark.functions import register
from prestodb_presto_spark.functions._util import c, lit_or_col


@register("if_")
def if_(cond, then, otherwise=None):
    w = F.when(c(cond) if not isinstance(cond, bool) else F.lit(cond), lit_or_col(then))
    return w.otherwise(lit_or_col(otherwise)) if otherwise is not None else w


@register("coalesce")
def coalesce(*cols):
    return F.coalesce(*[c(x) for x in cols])


@register("nullif")
def nullif(a, b):
    return F.nullif(c(a), lit_or_col(b))


def _null_poisoned(fn, cols):
    """Presto greatest/least return NULL when ANY argument is NULL
    (GreatestFunction.java); Spark's versions skip NULLs."""
    cs = [c(x) for x in cols]
    if len(cs) == 1:
        return cs[0]
    any_null = cs[0].isNull()
    for col in cs[1:]:
        any_null = any_null | col.isNull()
    return F.when(~any_null, fn(*cs))


@register("greatest")
def greatest(*cols):
    return _null_poisoned(F.greatest, cols)


@register("least")
def least(*cols):
    return _null_poisoned(F.least, cols)


@register("try_cast")
def try_cast(x, to_type: str):
    return c(x).try_cast(to_type)


@register("try_divide")
def try_divide(a, b):
    """try(x/y) — NULL instead of error (TryFunction.java semantics)."""
    return F.try_divide(c(a), lit_or_col(b))


@register("typeof")
def typeof(x):
    """Presto type-name spellings (TypeOfFunction.java): integer/
    varchar/unknown, parenthesized container types."""
    t = F.translate(F.typeof(c(x)), "<>", "()")
    t = F.regexp_replace(t, r"\bint\b", "integer")
    t = F.regexp_replace(t, r"\bstring\b", "varchar")
    return F.regexp_replace(t, r"\bvoid\b", "unknown")


@register("is_distinct_from")
def is_distinct_from(a, b):
    return ~c(a).eqNullSafe(lit_or_col(b))


@register("is_not_distinct_from")
def is_not_distinct_from(a, b):
    return c(a).eqNullSafe(lit_or_col(b))


@register("fail")
def fail(msg: str):
    return F.raise_error(F.lit(msg))


@register("current_user")
def current_user():
    return F.current_user()


# Presto TRY(expr) catches evaluation errors -> NULL (TryFunction.java).
# Spark ANSI mode has no generic try(): the engine exposes the per-op
# try_* family, which covers every error source TRY handles (arithmetic
# overflow/division, cast, out-of-bounds access, parse).
@register("try_add")
def try_add(a, b):
    return F.try_add(c(a), lit_or_col(b))


@register("try_subtract")
def try_subtract(a, b):
    return F.try_subtract(c(a), lit_or_col(b))


@register("try_multiply")
def try_multiply(a, b):
    return F.try_multiply(c(a), lit_or_col(b))


@register("try_element_at")
def try_element_at(col, key):
    return F.try_element_at(c(col), lit_or_col(key))


@register("try_to_number")
def try_to_number(col, fmt):
    return F.try_to_number(c(col), F.lit(fmt))


@register("try_to_timestamp")
def try_to_timestamp(col, fmt=None):
    if fmt is None:
        return F.try_to_timestamp(c(col))
    return F.try_to_timestamp(c(col), F.lit(fmt))
