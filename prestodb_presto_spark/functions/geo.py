"""Geospatial functions — a point/envelope subset of the presto-geospatial
plugin, as native Spark expressions.

Reference: presto-geospatial/.../GeoFunctions.java:92 registers 56
@ScalarFunction ST_* functions over an ESRI geometry type
(plugin/geospatial/GeometryType.java).  Full geometry needs a library
(Apache Sedona — not in this container), so the engine implements the
point + axis-aligned-envelope subset that covers distance/containment
analytics, on a plain STRUCT<x: DOUBLE, y: DOUBLE> representation:

  st_point, st_x, st_y, st_geometry_from_text (POINT WKT), st_as_text,
  st_distance (euclidean), great_circle_distance (haversine, matches
  the reference's GeoFunctions.stSphericalDistance role),
  st_contains_envelope (envelope ⊇ point), st_envelope_intersects.

Anything beyond (polygons, ST_Buffer, bing tiles) is documented as a
Sedona integration point, not silently wrong.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from prestodb_presto_spark.functions import register
from prestodb_presto_spark.functions._util import c, lit_or_col


@register("st_point")
def st_point(x, y) -> Column:
    """ST_Point(x, y) -> struct(x, y) (GeoFunctions.stPoint)."""
    return F.struct(lit_or_col(x).cast("double").alias("x"), lit_or_col(y).cast("double").alias("y"))


@register("st_x")
def st_x(p) -> Column:
    return c(p).getField("x")


@register("st_y")
def st_y(p) -> Column:
    return c(p).getField("y")


@register("st_geometry_from_text")
def st_geometry_from_text(wkt) -> Column:
    """Parse 'POINT (x y)' WKT (GeoFunctions.stGeometryFromText — point
    subset; other geometry kinds need Sedona)."""
    col = c(wkt)
    xy = F.regexp_extract(col, r"POINT\s*\(\s*(-?[\d.]+)\s+(-?[\d.]+)\s*\)", 1), F.regexp_extract(
        col, r"POINT\s*\(\s*(-?[\d.]+)\s+(-?[\d.]+)\s*\)", 2
    )
    return F.struct(xy[0].cast("double").alias("x"), xy[1].cast("double").alias("y"))


@register("st_as_text")
def st_as_text(p) -> Column:
    pt = c(p)
    return F.concat(
        F.lit("POINT ("),
        pt.getField("x").cast("string"),
        F.lit(" "),
        pt.getField("y").cast("string"),
        F.lit(")"),
    )


@register("st_distance")
def st_distance(a, b) -> Column:
    """Euclidean distance between points (GeoFunctions.stDistance)."""
    pa, pb = c(a), c(b)
    dx = pa.getField("x") - pb.getField("x")
    dy = pa.getField("y") - pb.getField("y")
    return F.sqrt(dx * dx + dy * dy)


@register("great_circle_distance")
def great_circle_distance(lat1, lon1, lat2, lon2) -> Column:
    """Haversine distance in km (GeoFunctions.greatCircleDistance)."""
    rlat1, rlon1 = F.radians(c(lat1)), F.radians(c(lon1))
    rlat2, rlon2 = F.radians(c(lat2)), F.radians(c(lon2))
    dlat, dlon = rlat2 - rlat1, rlon2 - rlon1
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2 * 6371.01) * F.asin(F.sqrt(h))


@register("st_contains_envelope")
def st_contains_envelope(xmin, ymin, xmax, ymax, p) -> Column:
    """Envelope ⊇ point (the broadcastable side of a spatial join —
    reference SpatialJoinOperator.java:38 builds an R-tree; Spark-first
    a small envelope set broadcasts and this predicate filters)."""
    pt = c(p)
    return (
        (pt.getField("x") >= lit_or_col(xmin))
        & (pt.getField("x") <= lit_or_col(xmax))
        & (pt.getField("y") >= lit_or_col(ymin))
        & (pt.getField("y") <= lit_or_col(ymax))
    )


@register("st_envelope_intersects")
def st_envelope_intersects(a_xmin, a_ymin, a_xmax, a_ymax, b_xmin, b_ymin, b_xmax, b_ymax) -> Column:
    return (
        (lit_or_col(a_xmin) <= lit_or_col(b_xmax))
        & (lit_or_col(a_xmax) >= lit_or_col(b_xmin))
        & (lit_or_col(a_ymin) <= lit_or_col(b_ymax))
        & (lit_or_col(a_ymax) >= lit_or_col(b_ymin))
    )
