"""Round-8 wave-7 behavior tests: geohash against the canonical
published example, decode∘encode cell-center bounds, and ray-cast /
ellipse membership ground truths."""

from __future__ import annotations

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import ch_expr
from clickhouse_objects_analysis_spark.queries.r8_wave7 import _POLY


def test_geohash_encode_canonical_example(spark):
    # The classic published example: (lat 57.64911, lon 10.40744)
    # encodes to u4pruydqqvj at precision 11.
    df = spark.createDataFrame([(10.40744, 57.64911)], "lon double, lat double")
    r = df.select(
        ch_expr("geohashEncode", F.col("lon"), F.col("lat"), 11).alias("g")
    ).collect()
    assert r[0]["g"] == "u4pruydqqvj"


def test_geohash_decode_centers_within_cell(spark):
    pts = [(-179.9, -89.9), (0.0, 0.0), (10.40744, 57.64911), (179.9, 89.9)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    dec = ch_expr(
        "geohashDecode", ch_expr("geohashEncode", F.col("lon"), F.col("lat"), 6), 6
    )
    rows = df.select(
        "lon", "lat",
        dec.getField("longitude").alias("dlon"),
        dec.getField("latitude").alias("dlat"),
    ).collect()
    for r in rows:  # cell half-widths at p=6: 360/2^15/2, 180/2^15/2
        assert abs(r["dlon"] - r["lon"]) <= 360.0 / (1 << 15) / 2 + 1e-9
        assert abs(r["dlat"] - r["lat"]) <= 180.0 / (1 << 15) / 2 + 1e-9


def test_point_in_polygon_ground_truth(spark):
    # centroid of the test pentagon is inside; far corners are not
    cx = sum(p[0] for p in _POLY) / len(_POLY)
    cy = sum(p[1] for p in _POLY) / len(_POLY)
    pts = [(cx, cy, True), (179.0, 89.0, False), (-179.0, 89.0, False),
           (0.0, -40.0, True)]
    df = spark.createDataFrame(
        [(x, y) for x, y, _ in pts], "x double, y double"
    )
    got = [
        r["i"]
        for r in df.select(
            ch_expr("pointInPolygon", F.col("x"), F.col("y"), _POLY).alias("i")
        ).collect()
    ]
    assert got == [want for _, _, want in pts]


def test_point_in_ellipses_ground_truth(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (59.0, 0.0), (0.0, 31.0), (120.0, 45.0), (120.0, 61.0)],
        "x double, y double",
    )
    got = [
        r["i"]
        for r in df.select(
            ch_expr(
                "pointInEllipses", F.col("x"), F.col("y"),
                0.0, 0.0, 60.0, 30.0, 120.0, 45.0, 25.0, 15.0
            ).alias("i")
        ).collect()
    ]
    assert got == [True, True, False, True, False]


def test_great_circle_angle_quadrant(spark):
    df = spark.createDataFrame([(1,)], "i int")
    r = df.select(
        ch_expr(
            "greatCircleAngle", F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(90.0)
        ).alias("a"),
        ch_expr(
            "greatCircleAngle", F.lit(0.0), F.lit(0.0), F.lit(180.0), F.lit(0.0)
        ).alias("b"),
    ).collect()[0]
    assert abs(r["a"] - 90.0) < 1e-9
    assert abs(r["b"] - 180.0) < 1e-9
