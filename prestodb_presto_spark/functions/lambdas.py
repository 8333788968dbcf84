"""Higher-order (lambda) functions — reference ArrayTransformFunction.java,
ArrayFilterFunction.java, ArrayReduceFunction.java, ZipFunction.java,
ZipWithFunction.java, ApplyFunction.java; lambda codegen sql/gen/lambda/.

Spark's native HOFs are the direct equivalents (SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prestodb_presto_spark.functions import register
from prestodb_presto_spark.functions._util import c


@register("transform")
def transform(x, fn):
    return F.transform(c(x), fn)


@register("filter")
def filter_(x, fn):
    return F.filter(c(x), fn)


@register("reduce")
def reduce_(x, init, merge, finish=None):
    """Presto reduce(array, init, merge_lambda, final_lambda) = aggregate."""
    if finish is None:
        return F.aggregate(c(x), init, merge)
    return F.aggregate(c(x), init, merge, finish)


@register("zip")
def zip_(*arrays):
    return F.arrays_zip(*[c(a) for a in arrays])


@register("zip_with")
def zip_with(a, b, fn):
    return F.zip_with(c(a), c(b), fn)


@register("any_match")
def any_match(x, fn):
    return F.exists(c(x), fn)


@register("all_match")
def all_match(x, fn):
    return F.forall(c(x), fn)


@register("none_match")
def none_match(x, fn):
    return ~F.exists(c(x), fn)
