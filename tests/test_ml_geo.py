"""presto-ml and presto-geospatial parity modules.

Reference: MLFunctions.java:41-71 (learn_classifier/classify/
learn_regressor/regress) and GeoFunctions.java:92 (ST_* subset).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from prestodb_presto_spark import ml
from prestodb_presto_spark.functions import presto as P


def test_learn_classify(spark):
    """Separable labels must classify back at ~100% accuracy."""
    df = (
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .withColumn("label", F.when(F.col("c_acctbal") > 0, "pos").otherwise("neg"))
        .withColumn("feats", ml.features("c_acctbal"))
    )
    model = ml.learn_classifier(df, "label", "feats")
    scored = ml.classify(model, df, "feats", "predicted")
    acc = scored.agg(
        F.avg((F.col("predicted") == F.col("label")).cast("double")).alias("acc")
    ).collect()[0].acc
    assert acc > 0.99


def test_learn_regress(spark):
    """y = 3x + 1 must be recovered by the linear regressor."""
    df = spark.range(200).select(
        (F.col("id").cast("double")).alias("x"),
        (F.col("id") * 3.0 + 1.0).alias("y"),
    ).withColumn("feats", ml.features("x"))
    model = ml.learn_regressor(df, "y", "feats")
    pred = ml.regress(model, df, "feats", "yhat")
    err = pred.agg(F.max(F.abs(F.col("yhat") - F.col("y"))).alias("e")).collect()[0].e
    assert err < 1e-6


def test_geo_functions(spark):
    row = (
        spark.range(1)
        .select(
            P.st_x(P.st_point(F.lit(3.0), F.lit(4.0))).alias("x"),
            P.st_distance(
                P.st_point(F.lit(0.0), F.lit(0.0)), P.st_point(F.lit(3.0), F.lit(4.0))
            ).alias("dist"),
            P.st_x(P.st_geometry_from_text(F.lit("POINT (2.5 -7.25)"))).alias("wx"),
            P.st_y(P.st_geometry_from_text(F.lit("POINT (2.5 -7.25)"))).alias("wy"),
            P.st_as_text(P.st_point(F.lit(1.0), F.lit(2.0))).alias("wkt"),
            P.st_contains_envelope(
                F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0),
                P.st_point(F.lit(5.0), F.lit(5.0)),
            ).alias("inside"),
            P.st_contains_envelope(
                F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0),
                P.st_point(F.lit(15.0), F.lit(5.0)),
            ).alias("outside"),
            P.great_circle_distance(
                F.lit(36.12), F.lit(-86.67), F.lit(33.94), F.lit(-118.40)
            ).alias("gc_km"),
        )
        .collect()[0]
    )
    assert row.x == 3.0
    assert row.dist == pytest.approx(5.0)
    assert (row.wx, row.wy) == (2.5, -7.25)
    assert row.wkt == "POINT (1.0 2.0)"
    assert row.inside is True and row.outside is False
    assert row.gc_km == pytest.approx(2886.45, rel=1e-3)  # BNA->LAX, classic haversine check


def test_geo_spatial_join_shape(spark):
    """Point-in-envelope join: envelopes broadcast, predicate filters —
    the Spark-first replacement for SpatialJoinOperator's R-tree."""
    pts = spark.range(100).select(
        P.st_point((F.col("id") % 10).cast("double"), (F.col("id") / 10).cast("double")).alias("p")
    )
    boxes = spark.createDataFrame(
        [(0.0, 0.0, 4.0, 4.0, "sw"), (5.0, 5.0, 9.0, 9.0, "ne")],
        "xmin double, ymin double, xmax double, ymax double, name string",
    )
    joined = pts.join(
        F.broadcast(boxes),
        P.st_contains_envelope(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), F.col("p")
        ),
    )
    counts = {r.name: r.cnt for r in joined.groupBy("name").agg(F.count("*").alias("cnt")).collect()}
    # sw: x=id%10<=4 & y=id/10<=4 -> ids 0-4,10-14,20-24,30-34,40 = 21
    # ne: x,y in [5,9] -> ids 55-59,65-69,75-79,85-89 = 20 (y>9 for 95+)
    assert counts["sw"] == 21 and counts["ne"] == 20
