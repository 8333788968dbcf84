"""Randomized invariants for the geometry boolean set operations.

The Greiner–Hormann clipping tier (functions/geo_setops.py) must obey
inclusion–exclusion: for any polygons A, B

    area(A ∪ B) + area(A ∩ B) = area(A) + area(B)
    area(A \\ B)               = area(A) − area(A ∩ B)
    area(A △ B)               = area(A ∪ B) − area(A ∩ B)

and the predicates must agree with the constructions
(ST_Intersects(A,B) ⇔ area/points of A ∩ B non-empty for overlapping
interiors).  120 seeded random convex-polygon pairs, one Spark job —
far more shape diversity than the fixture tests, no per-example
round-trips (reference: GeoFunctions.java stUnion:521,
stIntersection:807, stDifference:771, stSymmetricDifference:842).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from prestodb_presto_spark.functions import presto as P


def _random_convex_wkt(rng: random.Random) -> str:
    """Convex polygon: points on an ellipse at sorted random angles."""
    cx, cy = rng.uniform(-3, 3), rng.uniform(-3, 3)
    rx, ry = rng.uniform(0.5, 4), rng.uniform(0.5, 4)
    angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(rng.randint(3, 9)))
    pts = [(cx + rx * math.cos(a), cy + ry * math.sin(a)) for a in angles]
    pts.append(pts[0])
    body = ", ".join(f"{x:.4f} {y:.4f}" for x, y in pts)
    return f"POLYGON (({body}))"


def test_setop_area_inclusion_exclusion(spark):
    rng = random.Random(20260813)
    rows = [(i, _random_convex_wkt(rng), _random_convex_wkt(rng)) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, wa string, wb string")
    # three projections: parse, clip (pandas-UDF tier), measure — UDF
    # columns cannot nest inside higher-order-function lambdas, and
    # CollapseProject cannot cross the ArrowEvalPython node
    geoms = df.select(
        "id",
        P.st_geom_from_text(F.col("wa")).alias("a"),
        P.st_geom_from_text(F.col("wb")).alias("b"),
    )
    clipped = geoms.select(
        "id", "a", "b",
        P.st_union("a", "b").alias("u"),
        P.st_intersection("a", "b").alias("i"),
        P.st_difference("a", "b").alias("d"),
        P.st_sym_difference("a", "b").alias("s"),
    )
    out = clipped.select(
        "id",
        P.st_area("a").alias("area_a"),
        P.st_area("b").alias("area_b"),
        P.st_area("u").alias("area_u"),
        P.st_area("i").alias("area_i"),
        P.st_area("d").alias("area_d"),
        P.st_area("s").alias("area_s"),
        P.st_intersects("a", "b").alias("touches"),
    ).collect()
    assert len(out) == 120
    overlapping = 0
    for r in out:
        tol = 1e-6 * max(1.0, r.area_a + r.area_b)
        assert abs((r.area_u + r.area_i) - (r.area_a + r.area_b)) < tol, r
        assert abs(r.area_d - (r.area_a - r.area_i)) < tol, r
        assert abs(r.area_s - (r.area_u - r.area_i)) < tol, r
        assert r.area_i >= -tol and r.area_u <= r.area_a + r.area_b + tol
        if r.area_i > tol:
            overlapping += 1
            assert r.touches, r
    # the seed must actually exercise the overlap branch
    assert overlapping >= 8
