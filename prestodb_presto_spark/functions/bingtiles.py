"""Bing tile functions — reference presto-geospatial/.../BingTileFunctions.java.

A Bing tile is STRUCT<x: INT, y: INT, zoom: INT>; the quadkey is the
base-4 interleave of the x/y bit paths.  Everything here is closed-form
Web-Mercator math — floor/ln/sin/atan/exp plus bit games over
sequence(), all whole-stage-codegen'd expressions (the reference's
BingTileUtils does the identical arithmetic in Java).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from prestodb_presto_spark.functions import register
from prestodb_presto_spark.functions._util import c, lit_or_col

MAX_ZOOM = 23
_LAT_MIN, _LAT_MAX = -85.05112878, 85.05112878


def _tile(x: Column, y: Column, zoom: Column) -> Column:
    return F.struct(
        x.cast("int").alias("x"), y.cast("int").alias("y"), zoom.cast("int").alias("zoom")
    )


@register("bing_tile")
def bing_tile(x_or_quadkey, y=None, zoom=None) -> Column:
    """bing_tile(x, y, zoom) or bing_tile(quadKey)."""
    if y is None:
        # quadkey string -> tile: digit d at position i contributes bit
        # (d&1) to x and (d>>1) to y at descending significance
        qk = c(x_or_quadkey)
        z = F.length(qk)
        digits = F.transform(F.sequence(F.lit(1), z), lambda i: qk.substr(i, F.lit(1)).cast("int"))
        xx = F.aggregate(digits, F.lit(0), lambda acc, d: acc * 2 + d % 2)
        yy = F.aggregate(digits, F.lit(0), lambda acc, d: acc * 2 + F.floor(d / 2).cast("int"))
        return _tile(xx, yy, z)
    return _tile(lit_or_col(x_or_quadkey), lit_or_col(y), lit_or_col(zoom))


@register("bing_tile_at")
def bing_tile_at(lat, lon, zoom) -> Column:
    """Tile containing (lat, lon) at zoom (BingTileFunctions.bingTileAt):
    Web-Mercator x = (lon+180)/360·2^z, y from the Gudermannian."""
    la = F.greatest(F.least(c(lat).cast("double"), F.lit(_LAT_MAX)), F.lit(_LAT_MIN))
    lo = c(lon).cast("double")
    z = lit_or_col(zoom).cast("int")
    n = F.pow(F.lit(2.0), z)
    sin_lat = F.sin(F.radians(la))
    xf = (lo + 180.0) / 360.0 * n
    yf = (0.5 - F.ln((1 + sin_lat) / (1 - sin_lat)) / (4 * math.pi)) * n
    clampi = lambda v: F.greatest(  # noqa: E731
        F.lit(0), F.least(F.floor(v).cast("int"), (n - 1).cast("int"))
    )
    return _tile(clampi(xf), clampi(yf), z)


@register("bing_tile_coordinates")
def bing_tile_coordinates(tile) -> Column:
    t = c(tile)
    return F.struct(t.getField("x").alias("x"), t.getField("y").alias("y"))


@register("bing_tile_zoom_level")
def bing_tile_zoom_level(tile) -> Column:
    return c(tile).getField("zoom")


@register("bing_tile_quadkey")
def bing_tile_quadkey(tile) -> Column:
    """Tile -> base-4 quadkey string (BingTileFunctions.toQuadKey)."""
    t = c(tile)
    x, y, z = t.getField("x"), t.getField("y"), t.getField("zoom")
    digits = F.transform(
        F.sequence(z - 1, F.lit(0), F.lit(-1)),
        lambda i: (
            F.floor(x / F.pow(F.lit(2.0), i)).cast("int") % 2
            + 2 * (F.floor(y / F.pow(F.lit(2.0), i)).cast("int") % 2)
        ).cast("string"),
    )
    return F.when(z == 0, F.lit("")).otherwise(F.array_join(digits, ""))


def _tile_lon(x: Column, z: Column) -> Column:
    return x.cast("double") / F.pow(F.lit(2.0), z) * 360.0 - 180.0


def _tile_lat(y: Column, z: Column) -> Column:
    n = math.pi - 2.0 * math.pi * y.cast("double") / F.pow(F.lit(2.0), z)
    return F.degrees(F.atan((F.exp(n) - F.exp(-n)) / 2.0))


@register("bing_tile_polygon")
def bing_tile_polygon(tile) -> Column:
    """Tile envelope as a closed GEOM polygon (lon/lat corners)."""
    from prestodb_presto_spark.functions.geo import _geom, _pt

    t = c(tile)
    x, y, z = t.getField("x"), t.getField("y"), t.getField("zoom")
    w, e = _tile_lon(x, z), _tile_lon(x + 1, z)
    n, s = _tile_lat(y, z), _tile_lat(y + 1, z)
    ring = F.array(_pt(w, s), _pt(e, s), _pt(e, n), _pt(w, n), _pt(w, s))
    return _geom("polygon", ring)


@register("bing_tiles_around")
def bing_tiles_around(lat, lon, zoom) -> Column:
    """The up-to-9 tiles around a point (the tile and its neighbors,
    edge-clamped) — BingTileFunctions.bingTilesAround."""
    center = bing_tile_at(lat, lon, zoom)
    z = center.getField("zoom")
    n = F.pow(F.lit(2.0), z).cast("int")
    offsets = F.flatten(
        F.transform(
            F.sequence(F.lit(-1), F.lit(1)),
            lambda dx: F.transform(
                F.sequence(F.lit(-1), F.lit(1)),
                lambda dy: F.struct(dx.alias("dx"), dy.alias("dy")),
            ),
        )
    )
    tiles = F.transform(
        offsets,
        lambda o: F.struct(
            (center.getField("x") + o.getField("dx")).alias("x"),
            (center.getField("y") + o.getField("dy")).alias("y"),
            z.alias("zoom"),
        ),
    )
    in_range = F.filter(
        tiles,
        lambda t: (t.getField("x") >= 0)
        & (t.getField("x") < n)
        & (t.getField("y") >= 0)
        & (t.getField("y") < n),
    )
    return in_range


@register("geometry_to_bing_tiles")
def geometry_to_bing_tiles(g, zoom) -> Column:
    """All tiles at ``zoom`` covering the geometry's envelope
    (BingTileFunctions.java:204 geometryToBingTiles).  The tile range
    comes from the envelope's NW/SE corners through the same
    Web-Mercator math as bing_tile_at; the row expands to the x×y cross
    product with sequence()+flatten — same grid decomposition as the
    scale-path spatial join (operators/spatial.py).  Deviation
    (documented): tiles covering the ENVELOPE, not re-filtered against
    a non-rectangular geometry's exact boundary."""
    from prestodb_presto_spark.functions.geo import st_xmax, st_xmin, st_ymax, st_ymin

    gg = c(g)
    z = lit_or_col(zoom).cast("int")
    # geometry x = longitude, y = latitude
    nw = bing_tile_at(st_ymax(gg), st_xmin(gg), z)
    se = bing_tile_at(st_ymin(gg), st_xmax(gg), z)
    x0, x1 = nw.getField("x"), se.getField("x")
    y0, y1 = nw.getField("y"), se.getField("y")
    return F.flatten(
        F.transform(
            F.sequence(x0, x1),
            lambda tx: F.transform(F.sequence(y0, y1), lambda ty: _tile(tx, ty, z)),
        )
    )
