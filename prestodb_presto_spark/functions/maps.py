"""Map functions — reference operator/scalar/Map*.java (~20 files)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prestodb_presto_spark.functions import register
from prestodb_presto_spark.functions._util import c, lit_or_col


@register("map")
def map_(keys=None, values=None):
    """map() empty constructor or map(array<K>, array<V>) (MapConstructor)."""
    if keys is None:
        return F.map_from_arrays(F.array(), F.array())
    return F.map_from_arrays(c(keys), c(values))


@register("map_from_entries")
def map_from_entries(x):
    return F.map_from_entries(c(x))


@register("map_entries")
def map_entries(x):
    return F.map_entries(c(x))


@register("map_keys")
def map_keys(x):
    return F.map_keys(c(x))


@register("map_values")
def map_values(x):
    return F.map_values(c(x))


@register("map_concat")
def map_concat(*ms):
    return F.map_concat(*[c(m) for m in ms])


@register("map_filter")
def map_filter(m, fn):
    return F.map_filter(c(m), fn)


@register("transform_keys")
def transform_keys(m, fn):
    return F.transform_keys(c(m), fn)


@register("transform_values")
def transform_values(m, fn):
    return F.transform_values(c(m), fn)


@register("map_zip_with")
def map_zip_with(a, b, fn):
    return F.map_zip_with(c(a), c(b), fn)


@register("element_at_map")
def element_at_map(m, k):
    return F.try_element_at(c(m), lit_or_col(k))


@register("multimap_from_entries")
def multimap_from_entries(x):
    """entries → map<K, array<V>> (MultimapFromEntriesFunction.java)."""
    entries = c(x)
    keys = F.array_distinct(F.transform(entries, lambda e: e["key"]))
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.transform(
                F.filter(entries, lambda e: e["key"] == k), lambda e: e["value"]
            ),
        ),
    )
