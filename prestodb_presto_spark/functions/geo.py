"""Geospatial functions — points, linestrings and (single-ring) polygons
as native Spark expressions.

Reference: presto-geospatial/.../GeoFunctions.java:92 registers 56
@ScalarFunction ST_* functions over an ESRI geometry type
(plugin/geospatial/GeometryType.java).  The engine implements ~30 of
them without any geometry library, on two plain Spark types:

  POINT  = STRUCT<x: DOUBLE, y: DOUBLE>                (the fast path)
  GEOM   = STRUCT<kind: STRING, pts: ARRAY<POINT>>     (general)

with kind ∈ {point, linestring, polygon, multipoint}.  All geometry
math is whole-stage-codegen'd higher-order array expressions — shoelace
area, segment-sum length, length-weighted centroid, ray-casting
point-in-polygon, segment-intersection tests — so polygons behave like
any other column at 100 TB (no UDF, no R-tree build on the driver).

Limits (documented, not silently wrong): polygons are single exterior
rings (interior holes raise at parse), ST_Buffer / ST_Union /
bing-tiles and exotic predicates (ST_Relate/ST_Crosses/ST_Touches)
remain a Sedona integration point.
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


# --- general geometry (kind + point array) ----------------------------------


def _pt(x: Column, y: Column) -> Column:
    return F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))


def _geom(kind: str | Column, pts: Column) -> Column:
    kind_col = F.lit(kind) if isinstance(kind, str) else kind
    return F.struct(kind_col.alias("kind"), pts.alias("pts"))


def _parse_pts(body: Column) -> Column:
    """'x1 y1, x2 y2, …' -> array<struct<x,y>>."""
    return F.transform(
        F.split(body, ","),
        lambda s: _pt(
            F.element_at(F.split(F.trim(s), r"\s+"), 1),
            F.element_at(F.split(F.trim(s), r"\s+"), 2),
        ),
    )


@register("st_line_from_text")
def st_line_from_text(wkt) -> Column:
    """ST_LineFromText('LINESTRING (x y, …)') (GeoFunctions.stLineFromText)."""
    body = F.regexp_extract(c(wkt), r"LINESTRING\s*\(([^()]*)\)", 1)
    return _geom("linestring", _parse_pts(body))


@register("st_polygon")
def st_polygon(wkt) -> Column:
    """ST_Polygon('POLYGON ((x y, …))') — single exterior ring
    (GeoFunctions.stPolygon).  Multi-ring WKT yields NULL pts rather
    than a silently-wrong shape."""
    w = c(wkt)
    ring = F.regexp_extract(w, r"POLYGON\s*\(\s*\(([^()]*)\)\s*\)", 1)
    # a second '(' after the exterior ring ⇒ interior rings present
    multi = F.size(F.split(w, r"\(")) > 3
    return _geom("polygon", F.when(multi, F.lit(None)).otherwise(_parse_pts(ring)))


@register("st_geom_from_text")
def st_geom_from_text(wkt) -> Column:
    """General WKT parser → GEOM (POINT / MULTIPOINT / LINESTRING /
    POLYGON), the full GeoFunctions.stGeometryFromText surface minus
    multi-polygons.  (st_geometry_from_text keeps returning the bare
    POINT struct for the point fast path.)"""
    w = F.trim(c(wkt))
    kind = F.lower(F.regexp_extract(w, r"^\s*([A-Za-z]+)", 1))
    body = F.regexp_extract(w, r"\(\(?([^()]*)\)?\)", 1)
    return _geom(kind, _parse_pts(body))


def _segs(g: Column) -> Column:
    """Consecutive point pairs of a GEOM."""
    pts = g.getField("pts")
    return F.transform(
        F.sequence(F.lit(1), F.size(pts) - 1),
        lambda i: F.struct(
            F.element_at(pts, i).alias("a"), F.element_at(pts, i + 1).alias("b")
        ),
    )


def _seglen(s: Column) -> Column:
    dx = s.getField("b").getField("x") - s.getField("a").getField("x")
    dy = s.getField("b").getField("y") - s.getField("a").getField("y")
    return F.sqrt(dx * dx + dy * dy)


def _shoelace2(g: Column) -> Column:
    """Twice the signed polygon area: Σ (x_i·y_j − x_j·y_i)."""
    return F.aggregate(
        _segs(g),
        F.lit(0.0),
        lambda acc, s: acc
        + s.getField("a").getField("x") * s.getField("b").getField("y")
        - s.getField("b").getField("x") * s.getField("a").getField("y"),
    )


@register("st_geometry_type")
def st_geometry_type(g) -> Column:
    """ST_GeometryType → reference spelling ('ST_Polygon' …)."""
    kind = c(g).getField("kind")
    return F.concat(
        F.lit("ST_"),
        F.when(kind == "point", "Point")
        .when(kind == "multipoint", "MultiPoint")
        .when(kind == "linestring", "LineString")
        .when(kind == "polygon", "Polygon")
        .otherwise(F.initcap(kind)),
    )


@register("st_num_points")
def st_num_points(g) -> Column:
    """Vertex count; polygons don't double-count the closing point
    (GeoFunctions.stPointCount semantics)."""
    gg = c(g)
    pts = gg.getField("pts")
    first, last = F.element_at(pts, 1), F.element_at(pts, -1)
    closed = (first.getField("x") == last.getField("x")) & (
        first.getField("y") == last.getField("y")
    )
    is_ring = (gg.getField("kind") == "polygon") & closed & (F.size(pts) > 1)
    return (F.size(pts) - F.when(is_ring, 1).otherwise(0)).cast("int")


@register("st_area")
def st_area(g) -> Column:
    """Shoelace area of the exterior ring; 0 for lower-dim geometries
    (GeoFunctions.stArea)."""
    gg = c(g)
    return F.when(gg.getField("kind") == "polygon", F.abs(_shoelace2(gg)) / 2).otherwise(
        F.lit(0.0)
    )


@register("st_length")
def st_length(g) -> Column:
    """Path length (linestring) / perimeter (polygon) — ESRI
    calculateLength2D semantics (GeoFunctions.stLength)."""
    gg = c(g)
    return F.when(
        gg.getField("kind").isin("linestring", "polygon"),
        F.aggregate(_segs(gg), F.lit(0.0), lambda acc, s: acc + _seglen(s)),
    ).otherwise(F.lit(0.0))


def _minmax(g, field: str, agg) -> Column:
    return agg(F.transform(c(g).getField("pts"), lambda p: p.getField(field)))


@register("st_xmin")
def st_xmin(g) -> Column:
    return _minmax(g, "x", F.array_min)


@register("st_xmax")
def st_xmax(g) -> Column:
    return _minmax(g, "x", F.array_max)


@register("st_ymin")
def st_ymin(g) -> Column:
    return _minmax(g, "y", F.array_min)


@register("st_ymax")
def st_ymax(g) -> Column:
    return _minmax(g, "y", F.array_max)


@register("st_envelope")
def st_envelope(g) -> Column:
    """Axis-aligned bounding box as a closed polygon GEOM."""
    xmin, xmax = st_xmin(g), st_xmax(g)
    ymin, ymax = st_ymin(g), st_ymax(g)
    ring = F.array(
        _pt(xmin, ymin), _pt(xmax, ymin), _pt(xmax, ymax), _pt(xmin, ymax), _pt(xmin, ymin)
    )
    return _geom("polygon", ring)


@register("st_is_empty")
def st_is_empty(g) -> Column:
    return F.size(c(g).getField("pts")) == 0


@register("st_is_closed")
def st_is_closed(g) -> Column:
    pts = c(g).getField("pts")
    first, last = F.element_at(pts, 1), F.element_at(pts, -1)
    return (F.size(pts) > 1) & (first.getField("x") == last.getField("x")) & (
        first.getField("y") == last.getField("y")
    )


@register("st_is_ring")
def st_is_ring(g) -> Column:
    """Closed + ≥4 points (simplicity beyond closure needs full topology;
    documented approximation)."""
    return st_is_closed(g) & (F.size(c(g).getField("pts")) >= 4)


@register("st_start_point")
def st_start_point(g) -> Column:
    return F.element_at(c(g).getField("pts"), 1)


@register("st_end_point")
def st_end_point(g) -> Column:
    return F.element_at(c(g).getField("pts"), -1)


@register("st_point_n")
def st_point_n(g, n) -> Column:
    """1-based vertex access (GeoFunctions.stPointN)."""
    return F.element_at(c(g).getField("pts"), lit_or_col(n))


@register("st_dimension")
def st_dimension(g) -> Column:
    kind = c(g).getField("kind")
    return (
        F.when(kind.isin("point", "multipoint"), 0)
        .when(kind == "linestring", 1)
        .otherwise(2)
        .cast("int")
    )


@register("st_coord_dim")
def st_coord_dim(g) -> Column:
    return F.lit(2).cast("int")


@register("st_centroid")
def st_centroid(g) -> Column:
    """Centroid as a POINT struct: shoelace-weighted for polygons,
    length-weighted for linestrings, vertex mean for (multi)points
    (GeoFunctions.stCentroid)."""
    gg = c(g)
    pts = gg.getField("pts")
    kind = gg.getField("kind")
    # polygon: (1/6A2)*Σ (x_i+x_j)(x_i·y_j − x_j·y_i), A2 = signed 2·area
    a2 = _shoelace2(gg)
    cross = lambda s: (  # noqa: E731
        s.getField("a").getField("x") * s.getField("b").getField("y")
        - s.getField("b").getField("x") * s.getField("a").getField("y")
    )
    px = F.aggregate(
        _segs(gg),
        F.lit(0.0),
        lambda acc, s: acc
        + (s.getField("a").getField("x") + s.getField("b").getField("x")) * cross(s),
    ) / (3 * F.nullif(a2, F.lit(0.0)))
    py = F.aggregate(
        _segs(gg),
        F.lit(0.0),
        lambda acc, s: acc
        + (s.getField("a").getField("y") + s.getField("b").getField("y")) * cross(s),
    ) / (3 * F.nullif(a2, F.lit(0.0)))
    # linestring: length-weighted segment midpoints
    total_len = F.nullif(
        F.aggregate(_segs(gg), F.lit(0.0), lambda acc, s: acc + _seglen(s)), F.lit(0.0)
    )
    lx = F.aggregate(
        _segs(gg),
        F.lit(0.0),
        lambda acc, s: acc
        + (s.getField("a").getField("x") + s.getField("b").getField("x")) / 2 * _seglen(s),
    ) / total_len
    ly = F.aggregate(
        _segs(gg),
        F.lit(0.0),
        lambda acc, s: acc
        + (s.getField("a").getField("y") + s.getField("b").getField("y")) / 2 * _seglen(s),
    ) / total_len
    # point/multipoint: vertex mean
    n = F.nullif(F.size(pts).cast("double"), F.lit(0.0))
    mx = F.aggregate(pts, F.lit(0.0), lambda acc, p: acc + p.getField("x")) / n
    my = F.aggregate(pts, F.lit(0.0), lambda acc, p: acc + p.getField("y")) / n
    return (
        F.when(kind == "polygon", _pt(px, py))
        .when(kind == "linestring", _pt(lx, ly))
        .otherwise(_pt(mx, my))
    )


@register("st_contains")
def st_contains(g, p) -> Column:
    """Polygon ⊇ point via ray casting (odd crossing parity), entirely in
    codegen'd array expressions — the predicate side of a broadcast
    spatial join (reference SpatialJoinOperator.java builds an R-tree;
    Spark-first the polygon set broadcasts and this filters)."""
    gg, pp = c(g), c(p)
    px, py = pp.getField("x"), pp.getField("y")
    crossings = F.aggregate(
        _segs(gg),
        F.lit(0),
        lambda acc, s: acc
        + F.when(
            (
                (s.getField("a").getField("y") > py)
                != (s.getField("b").getField("y") > py)
            )
            & (
                px
                < (s.getField("b").getField("x") - s.getField("a").getField("x"))
                * (py - s.getField("a").getField("y"))
                / (s.getField("b").getField("y") - s.getField("a").getField("y"))
                + s.getField("a").getField("x")
            ),
            1,
        ).otherwise(0),
    )
    return (gg.getField("kind") == "polygon") & (crossings % 2 == 1)


@register("st_within")
def st_within(p, g) -> Column:
    """ST_Within(point, polygon) = ST_Contains(polygon, point)."""
    return st_contains(g, p)


def _seg_intersects(s1: Column, s2: Column) -> Column:
    """Proper/improper 2-segment intersection via orientation signs."""

    def orient(p, q, r):
        return (q.getField("x") - p.getField("x")) * (r.getField("y") - p.getField("y")) - (
            q.getField("y") - p.getField("y")
        ) * (r.getField("x") - p.getField("x"))

    a, b = s1.getField("a"), s1.getField("b")
    d, e = s2.getField("a"), s2.getField("b")
    o1, o2 = orient(a, b, d), orient(a, b, e)
    o3, o4 = orient(d, e, a), orient(d, e, b)
    proper = (o1 * o2 < 0) & (o3 * o4 < 0)

    def on_seg(p, q, r):  # r collinear with pq: does r sit inside the box?
        return (
            (r.getField("x") <= F.greatest(p.getField("x"), q.getField("x")))
            & (r.getField("x") >= F.least(p.getField("x"), q.getField("x")))
            & (r.getField("y") <= F.greatest(p.getField("y"), q.getField("y")))
            & (r.getField("y") >= F.least(p.getField("y"), q.getField("y")))
        )

    return (
        proper
        | ((o1 == 0) & on_seg(a, b, d))
        | ((o2 == 0) & on_seg(a, b, e))
        | ((o3 == 0) & on_seg(d, e, a))
        | ((o4 == 0) & on_seg(d, e, b))
    )


@register("st_intersects")
def st_intersects(g1, g2) -> Column:
    """ST_Intersects for point/linestring/polygon combos: point kinds via
    containment, otherwise any segment-pair intersection or full
    containment of one geometry's first vertex in the other
    (GeoFunctions.stIntersects)."""
    a, b = c(g1), c(g2)
    a_pt, b_pt = a.getField("kind").isin("point", "multipoint"), b.getField("kind").isin(
        "point", "multipoint"
    )
    seg_hit = F.exists(
        _segs(a), lambda s1: F.exists(_segs(b), lambda s2: _seg_intersects(s1, s2))
    )
    a_in_b = st_contains(b, F.element_at(a.getField("pts"), 1))
    b_in_a = st_contains(a, F.element_at(b.getField("pts"), 1))
    pt_hit = F.exists(
        a.getField("pts"),
        lambda p: F.exists(
            b.getField("pts"),
            lambda q: (p.getField("x") == q.getField("x"))
            & (p.getField("y") == q.getField("y")),
        ),
    )
    return (
        F.when(a_pt & b_pt, pt_hit)
        .when(a_pt, F.exists(a.getField("pts"), lambda p: st_contains(b, p)))
        .when(b_pt, F.exists(b.getField("pts"), lambda p: st_contains(a, p)))
        .otherwise(seg_hit | a_in_b | b_in_a)
    )


@register("st_as_text_geom")
def st_as_text_geom(g) -> Column:
    """GEOM → WKT (general counterpart of the POINT-only st_as_text)."""
    gg = c(g)
    body = F.array_join(
        F.transform(
            gg.getField("pts"),
            lambda p: F.concat(
                p.getField("x").cast("string"), F.lit(" "), p.getField("y").cast("string")
            ),
        ),
        ", ",
    )
    kind = gg.getField("kind")
    return (
        F.when(kind == "polygon", F.concat(F.lit("POLYGON (("), body, F.lit("))")))
        .when(kind == "linestring", F.concat(F.lit("LINESTRING ("), body, F.lit(")")))
        .when(kind == "multipoint", F.concat(F.lit("MULTIPOINT ("), body, F.lit(")")))
        .otherwise(F.concat(F.lit("POINT ("), body, F.lit(")")))
    )


@register("line_locate_point")
def line_locate_point(line, p) -> Column:
    """Fraction of the line's length at the nearest point to p
    (GeoFunctions.lineLocatePoint) — single aggregate pass carrying
    (best distance², arclength at best projection, cumulative length)."""
    ln, pp = c(line), c(p)
    px, py = pp.getField("x"), pp.getField("y")

    def step(acc, s):
        ax, ay = s.getField("a").getField("x"), s.getField("a").getField("y")
        bx, by = s.getField("b").getField("x"), s.getField("b").getField("y")
        vx, vy = bx - ax, by - ay
        l2 = vx * vx + vy * vy
        t = F.when(l2 > 0, F.greatest(F.lit(0.0), F.least(F.lit(1.0), ((px - ax) * vx + (py - ay) * vy) / l2))).otherwise(F.lit(0.0))
        qx, qy = ax + t * vx, ay + t * vy
        d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
        seg = F.sqrt(l2)
        better = d2 < acc.getField("d2")
        return F.struct(
            F.when(better, d2).otherwise(acc.getField("d2")).alias("d2"),
            F.when(better, acc.getField("cum") + t * seg).otherwise(acc.getField("off")).alias("off"),
            (acc.getField("cum") + seg).alias("cum"),
        )

    init = F.struct(
        F.lit(float("inf")).alias("d2"), F.lit(0.0).alias("off"), F.lit(0.0).alias("cum")
    )
    fin = F.aggregate(_segs(ln), init, step)
    return F.when(
        ln.getField("kind") == "linestring",
        fin.getField("off") / F.nullif(fin.getField("cum"), F.lit(0.0)),
    )


@register("st_buffer")
def st_buffer(g, dist, n_sides: int = 32) -> Column:
    """ST_Buffer for POINT geometries: a closed n-gon approximating the
    circle (GeoFunctions.stBuffer; general polygon offsetting needs a
    geometry library — non-point kinds yield NULL, documented)."""
    import math as _m

    gg, r = c(g), lit_or_col(dist)
    ctr = F.element_at(gg.getField("pts"), 1)
    cx, cy = ctr.getField("x"), ctr.getField("y")
    ring = F.array(
        *[
            _pt(
                cx + r * _m.cos(2 * _m.pi * i / n_sides),
                cy + r * _m.sin(2 * _m.pi * i / n_sides),
            )
            for i in range(n_sides)
        ],
        _pt(cx + r * 1.0, cy + r * 0.0),
    )
    return F.when(gg.getField("kind") == "point", _geom("polygon", ring))


@register("geometry_invalid_reason")
def geometry_invalid_reason(g) -> Column:
    """NULL when valid; else a reason string (GeoFunctions /
    GeometryUtils.geometryInvalidReason subset: ring arity, closure,
    non-adjacent self-intersection)."""
    gg = c(g)
    pts = gg.getField("pts")
    n = F.size(pts)
    first, last = F.element_at(pts, 1), F.element_at(pts, -1)
    closed = (first.getField("x") == last.getField("x")) & (
        first.getField("y") == last.getField("y")
    )
    seg_idx = F.sequence(F.lit(1), n - 1)
    self_x = F.exists(
        seg_idx,
        lambda i: F.exists(
            seg_idx,
            lambda j: (j > i + 1)
            & ~((i == 1) & (j == n - 1) & closed)  # closing seg touches first
            & _seg_intersects(
                F.struct(F.element_at(pts, i).alias("a"), F.element_at(pts, i + 1).alias("b")),
                F.struct(F.element_at(pts, j).alias("a"), F.element_at(pts, j + 1).alias("b")),
            ),
        ),
    )
    return F.when(
        gg.getField("kind") == "polygon",
        F.when(pts.isNull(), "Polygon has multiple rings (unsupported)")
        .when(n < 4, "Polygon has fewer than 4 points")
        .when(~closed, "Polygon ring is not closed")
        .when(self_x, "Polygon ring self-intersects")
        .otherwise(F.lit(None).cast("string")),
    ).otherwise(
        F.when(
            (gg.getField("kind") == "linestring") & (n < 2),
            "LineString has fewer than 2 points",
        )
    )


@register("st_num_geometries")
def st_num_geometries(g) -> Column:
    """Component count: each multipoint vertex is a geometry; other kinds
    are single (GeoFunctions.stNumGeometries)."""
    gg = c(g)
    return (
        F.when(gg.getField("kind") == "multipoint", F.size(gg.getField("pts")))
        .otherwise(F.when(F.size(gg.getField("pts")) > 0, 1).otherwise(0))
        .cast("int")
    )


@register("st_geometry_n")
def st_geometry_n(g, n) -> Column:
    """1-based component access (GeoFunctions.stGeometryN): multipoint →
    the n-th vertex as a POINT geom; other kinds → the geometry itself
    for n=1, NULL otherwise."""
    gg = c(g)
    idx = lit_or_col(n)
    nth_point = _geom("point", F.array(F.element_at(gg.getField("pts"), idx)))
    return (
        F.when(gg.getField("kind") == "multipoint", nth_point)
        .when(idx == 1, gg)
    )


@register("st_geometries")
def st_geometries(g) -> Column:
    """All components as an array of GEOMs (GeoFunctions.stGeometries)."""
    gg = c(g)
    as_points = F.transform(
        gg.getField("pts"), lambda p: _geom("point", F.array(p))
    )
    return F.when(gg.getField("kind") == "multipoint", as_points).otherwise(
        F.array(gg)
    )


@register("st_boundary")
def st_boundary(g) -> Column:
    """Topological boundary (GeoFunctions.stBoundary): polygon → its
    exterior ring as a linestring; linestring → multipoint of endpoints
    (empty when closed); points → empty multipoint."""
    gg = c(g)
    pts = gg.getField("pts")
    kind = gg.getField("kind")
    first, last = F.element_at(pts, 1), F.element_at(pts, -1)
    closed = (first.getField("x") == last.getField("x")) & (
        first.getField("y") == last.getField("y")
    )
    empty = F.array().cast("array<struct<x:double,y:double>>")
    line_boundary = F.when(closed, empty).otherwise(F.array(first, last))
    return (
        F.when(kind == "polygon", _geom("linestring", pts))
        .when(kind == "linestring", _geom("multipoint", line_boundary))
        .otherwise(_geom("multipoint", empty))
    )


@register("st_disjoint")
def st_disjoint(g1, g2) -> Column:
    """ST_Disjoint = NOT ST_Intersects (GeoFunctions.stDisjoint)."""
    return ~st_intersects(g1, g2)


def _geom_pandas(fn, extra=()):
    """Wrap a numpy point-array transform as a GEOM→GEOM pandas UDF —
    the 'pandas UDF last resort' tier (SURVEY §7): geometry algorithms
    that are iterative by nature (hull scan, Douglas-Peucker) and sit
    OFF the relational hot path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<kind:string,pts:array<struct<x:double,y:double>>>")
    def _f(s):
        import pandas as pd

        # struct columns cross the Arrow boundary as a pd.DataFrame with
        # one column per field (and must be returned the same way)
        kinds, ptss = [], []
        for _, g in s.iterrows():
            if g["pts"] is None:
                kinds.append(None)
                ptss.append(None)
                continue
            pts = [(p["x"], p["y"]) for p in g["pts"]]
            kind, new_pts = fn(g["kind"], pts, *extra)
            kinds.append(kind)
            ptss.append([{"x": float(x), "y": float(y)} for x, y in new_pts])
        return pd.DataFrame({"kind": kinds, "pts": ptss})

    return _f


def _convex_hull(kind, pts):
    """Andrew's monotone chain; returns a closed polygon ring."""
    uniq = sorted(set(pts))
    if len(uniq) <= 2:
        return ("linestring" if len(uniq) == 2 else "point", uniq)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower, upper = [], []
    for p in uniq:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    for p in reversed(uniq):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    ring = lower[:-1] + upper[:-1]
    return "polygon", ring + [ring[0]]


def _douglas_peucker(kind, pts, tolerance):
    if len(pts) < 3:
        return kind, pts

    def dp(seq):
        if len(seq) < 3:
            return seq
        (ax, ay), (bx, by) = seq[0], seq[-1]
        dx, dy = bx - ax, by - ay
        norm = (dx * dx + dy * dy) ** 0.5 or 1e-300
        best_i, best_d = 0, -1.0
        for i in range(1, len(seq) - 1):
            px, py = seq[i]
            d = abs(dx * (ay - py) - dy * (ax - px)) / norm
            if d > best_d:
                best_i, best_d = i, d
        if best_d <= tolerance:
            return [seq[0], seq[-1]]
        left = dp(seq[: best_i + 1])
        return left[:-1] + dp(seq[best_i:])

    return kind, dp(pts)


@register("st_convex_hull")
def st_convex_hull(g) -> Column:
    """ST_ConvexHull (GeoFunctions.stConvexHull) — monotone-chain hull as
    a pandas UDF (iterative scan; off the relational path)."""
    return _geom_pandas(_convex_hull)(c(g))


@register("simplify_geometry")
def simplify_geometry(g, tolerance: float) -> Column:
    """simplify_geometry(geom, tolerance) (GeoFunctions.simplifyGeometry)
    — Douglas-Peucker with perpendicular-distance tolerance."""
    return _geom_pandas(_douglas_peucker, extra=(float(tolerance),))(c(g))


@register("st_exterior_ring")
def st_exterior_ring(g) -> Column:
    """Polygon exterior ring as a linestring (GeoFunctions.stExteriorRing)."""
    gg = c(g)
    return F.when(gg.getField("kind") == "polygon", _geom("linestring", gg.getField("pts")))


@register("st_num_interior_ring")
def st_num_interior_ring(g) -> Column:
    """Interior-ring count — always 0 here: the engine's polygons are
    single exterior rings (multi-ring WKT parses to NULL pts, which
    propagates NULL through this accessor, never a silent 0)."""
    gg = c(g)
    return F.when(
        (gg.getField("kind") == "polygon") & gg.getField("pts").isNotNull(), 0
    ).cast("int")


@register("st_interior_rings")
def st_interior_rings(g) -> Column:
    """Interior rings — empty array for valid single-ring polygons."""
    gg = c(g)
    empty = F.array().cast("array<struct<kind:string,pts:array<struct<x:double,y:double>>>>")
    return F.when(
        (gg.getField("kind") == "polygon") & gg.getField("pts").isNotNull(), empty
    )


@register("st_interior_ring_n")
def st_interior_ring_n(g, n) -> Column:
    """N-th interior ring — NULL (no holes in the single-ring model;
    try_element_at because ANSI element_at errors on the empty array)."""
    return F.try_element_at(st_interior_rings(g), lit_or_col(n))


@register("st_envelope_as_pts")
def st_envelope_as_pts(g) -> Column:
    """[min-corner, max-corner] points (GeoFunctions.stEnvelopeAsPts)."""
    return F.array(_pt(st_xmin(g), st_ymin(g)), _pt(st_xmax(g), st_ymax(g)))


@register("st_is_valid")
def st_is_valid(g) -> Column:
    """ST_IsValid = geometry_invalid_reason IS NULL."""
    return geometry_invalid_reason(g).isNull()


@register("st_is_simple")
def st_is_simple(g) -> Column:
    """No non-adjacent self-intersection (points are always simple;
    GeoFunctions.stIsSimple — ring-closure intersection excused)."""
    gg = c(g)
    pts = gg.getField("pts")
    n = F.size(pts)
    first, last = F.element_at(pts, 1), F.element_at(pts, -1)
    closed = (first.getField("x") == last.getField("x")) & (
        first.getField("y") == last.getField("y")
    )
    seg_idx = F.sequence(F.lit(1), n - 1)
    self_x = F.exists(
        seg_idx,
        lambda i: F.exists(
            seg_idx,
            lambda j: (j > i + 1)
            & ~((i == 1) & (j == n - 1) & closed)
            & _seg_intersects(
                F.struct(F.element_at(pts, i).alias("a"), F.element_at(pts, i + 1).alias("b")),
                F.struct(F.element_at(pts, j).alias("a"), F.element_at(pts, j + 1).alias("b")),
            ),
        ),
    )
    return F.when(gg.getField("kind").isin("point", "multipoint"), F.lit(True)).otherwise(
        ~F.coalesce(self_x, F.lit(False))
    )


@register("st_equals")
def st_equals(g1, g2) -> Column:
    """Vertex-multiset equality of same-kind geometries — covers ring
    rotation/direction (the common ST_Equals uses); full topological
    equality (collinear vertex insertion) needs a geometry library,
    documented deviation from GeoFunctions.stEquals."""
    a, b = c(g1), c(g2)
    # distinct first: a ring's closing vertex duplicates a DIFFERENT
    # vertex depending on where the rotation starts
    canon = lambda g: F.array_sort(  # noqa: E731
        F.array_distinct(
            F.transform(
                g.getField("pts"),
                lambda p: F.struct(p.getField("x").alias("x"), p.getField("y").alias("y")),
            )
        )
    )
    return (a.getField("kind") == b.getField("kind")) & (canon(a) == canon(b))
