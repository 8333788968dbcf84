"""Partitioned spatial join — the scale path when the polygon side is
too large to broadcast.

Reference: SpatialJoinOperator + PartitionedSpatialJoin
(presto-main/.../operator/SpatialJoinOperator.java:38,
sql/planner/optimizations/ExtractSpatialJoins.java): Presto builds an
R-tree per partition.  The Spark-first equivalent is grid bucketing —
an equi-join Catalyst can shuffle-partition like any other join:

  1. each polygon emits one row per grid cell its ENVELOPE covers
     (map-side explode of a small sequence × sequence grid);
  2. each point lands in exactly ONE cell (floor division);
  3. equi-join on (cell_x, cell_y) co-locates candidates;
  4. exact ray-cast st_contains filters.

Because a point has exactly one cell, every (polygon, point) pair can
match in at most one cell — no post-join dedup.  Cell size trades the
polygon fan-out (envelope_area / cell²) against candidate density per
cell; at 100 TB pick it near the median polygon envelope size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prestodb_presto_spark.functions.geo import st_contains, st_xmax, st_xmin, st_ymax, st_ymin


def _cell(v: Column, cell_size: float) -> Column:
    return F.floor(v / F.lit(float(cell_size))).cast("long")


def grid_spatial_join(
    polygons: DataFrame,
    points: DataFrame,
    geom_col: str,
    point_col: str,
    cell_size: float,
) -> DataFrame:
    """Inner join of points inside polygons via grid cells.

    Returns all columns of both inputs for each (polygon, point)
    containment pair.  Both sides shuffle only on integer cell keys —
    no geometry broadcast, no cartesian.
    """
    g = F.col(geom_col)
    polys = polygons.withColumn(
        "__cells",
        F.flatten(
            F.transform(
                F.sequence(_cell(st_xmin(g), cell_size), _cell(st_xmax(g), cell_size)),
                lambda cx: F.transform(
                    F.sequence(_cell(st_ymin(g), cell_size), _cell(st_ymax(g), cell_size)),
                    lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
                ),
            )
        ),
    ).select("*", F.explode("__cells").alias("__cell")).drop("__cells")
    p = F.col(point_col)
    pts = points.withColumn(
        "__cell",
        F.struct(
            _cell(p.getField("x"), cell_size).alias("cx"),
            _cell(p.getField("y"), cell_size).alias("cy"),
        ),
    )
    joined = polys.join(pts, "__cell").drop("__cell")
    return joined.filter(st_contains(F.col(geom_col), F.col(point_col)))
