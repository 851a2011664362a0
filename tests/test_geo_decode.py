"""Catalyst-path coverage for geohashEncode/geohashDecode.

geo_function_surface now runs its geohash work through the Arrow kernel
(queries/r8_wave7._gh6_kernel), so this test is what keeps the unrolled
Catalyst expression path (functions/ch.py _geohash_encode/_geohash_decode)
exercised — and asserts the two implementations are BIT-IDENTICAL on the
same inputs, including domain edges (±180 lon, ±90 lat) where the
`least(...)` clamp binds.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import ch_expr
from clickhouse_objects_analysis_spark.queries.r8_wave7 import _gh6_kernel_factory

_CASES = [
    (-180.0, -90.0),
    (180.0, 90.0),  # clamp binds: 2^n quantization hits the top cell
    (0.0, 0.0),
    (-0.0001, 0.0001),
    (13.361389, 38.115556),  # classic geohash reference point (sqc8b)
    (-122.4194, 37.7749),
    (151.2093, -33.8688),
    (179.9999, -89.9999),
]


def _expected(lon: float, lat: float, p: int = 6):
    """Independent pure-Python reference (standard geohash bisection)."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, out = [], []
    nlon = (5 * p + 1) // 2
    nlat = 5 * p // 2
    xl = min(int((lon + 180.0) / 360.0 * (1 << nlon)), (1 << nlon) - 1)
    xt = min(int((lat + 90.0) / 180.0 * (1 << nlat)), (1 << nlat) - 1)
    for i in range(5 * p):
        if i % 2 == 0:
            bits.append((xl >> (nlon - 1 - i // 2)) & 1)
        else:
            bits.append((xt >> (nlat - 1 - (i - 1) // 2)) & 1)
    for k in range(p):
        v = 0
        for b in range(5):
            v = (v << 1) | bits[5 * k + b]
        out.append(alpha[v])
    center_lon = (xl + 0.5) / (1 << nlon) * 360.0 - 180.0
    center_lat = (xt + 0.5) / (1 << nlat) * 180.0 - 90.0
    # silence unused range vars kept for clarity
    del lo_lon, hi_lon, lo_lat, hi_lat
    return "".join(out), center_lon, center_lat


def test_catalyst_geohash_roundtrip_matches_kernel_and_reference(spark):
    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(_CASES)],
        "i int, lon double, lat double",
    )
    gh = ch_expr("geohashEncode", F.col("lon"), F.col("lat"), 6)
    dec = ch_expr("geohashDecode", gh, 6)
    kern = _gh6_kernel_factory()(F.col("lon"), F.col("lat"))
    rows = (
        df.select(
            "i",
            "lon",
            "lat",
            gh.alias("gh_expr"),
            dec.getField("longitude").alias("dlon_expr"),
            dec.getField("latitude").alias("dlat_expr"),
            kern.getField("gh6").alias("gh_kern"),
            kern.getField("dec_lon_u").alias("dlon_u_kern"),
            kern.getField("dec_lat_u").alias("dlat_u_kern"),
        )
        .orderBy("i")
        .collect()
    )
    import math

    for r, (lon, lat) in zip(rows, _CASES):
        exp_gh, exp_clon, exp_clat = _expected(lon, lat)
        assert r.gh_expr == exp_gh, (lon, lat)
        assert r.gh_kern == exp_gh, (lon, lat)
        assert r.dlon_expr == exp_clon
        assert r.dlat_expr == exp_clat
        # the kernel renders the same scaled-floor ints the query hashes
        assert r.dlon_u_kern == math.floor(exp_clon * 10000 + 0.5)
        assert r.dlat_u_kern == math.floor(exp_clat * 10000 + 0.5)


def test_known_geohash_value(spark):
    """Palermo from the original geohash paper: sqc8b at precision 5 —
    precision-6 must extend it, not change the prefix."""
    df = spark.createDataFrame([(13.361389, 38.115556)], "lon double, lat double")
    got = df.select(
        ch_expr("geohashEncode", F.col("lon"), F.col("lat"), 6).alias("g")
    ).first()["g"]
    assert got.startswith("sqc8b")
