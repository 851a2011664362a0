"""Round-8 query wave 7: the geo scalar family promoted out of
UNSUPPORTED — geohashEncode/geohashDecode (bisection-bit interleave as
pure Catalyst shift arithmetic), pointInPolygon (literal-unrolled ray
casting), pointInEllipses, greatCircleAngle — exercised end-to-end on
deterministic synthetic coordinates with a DuckDB twin GENERATED from
the same bit/edge loops, so every shift position and every edge slope
is cross-checked value-for-value.

Reference parity note: no geo surface in the reference repo; this
completes the ClickHouse geo function family (SURVEY §2.B function
rows) minus the two documented exclusions (geoDistance ellipsoid
variant, geohashesInBox array enumeration).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import _GEO32, ch_expr
from .registry import query, tables

#: Fixed test polygon (lon, lat) — irregular, non-convex pentagon.
_POLY = [(-100.0, -50.0), (-20.0, -80.0), (80.0, -20.0), (40.0, 60.0),
         (-60.0, 40.0)]

#: Two axis-aligned test ellipses (x0, y0, a, b).
_ELLIPSES = (0.0, 0.0, 60.0, 30.0, 120.0, 45.0, 25.0, 15.0)

_P = 6  # geohash precision under test (15 lon bits + 15 lat bits)
_NLON = (5 * _P + 1) // 2
_NLAT = 5 * _P // 2


def _sql_geohash6(xl: str, xt: str) -> str:
    """DuckDB twin of functions/ch.py _geohash_encode for p=6, emitted
    from the same bit loop: char k = alphabet[Σ interleaved bits]."""
    chars = []
    for k in range(_P):
        terms = []
        for b in range(5):
            i = 5 * k + b
            if i % 2 == 0:
                src, pos = xl, _NLON - 1 - i // 2
            else:
                src, pos = xt, _NLAT - 1 - (i - 1) // 2
            terms.append(f"(({src} >> {pos}) & 1) * {1 << (4 - b)}")
        chars.append(
            f"substring('{_GEO32}', CAST({' + '.join(terms)} AS INT) + 1, 1)"
        )
    return " || ".join(chars)


def _sql_point_in_polygon(x: str, y: str) -> str:
    """DuckDB twin of _point_in_polygon: same edges, same skip rule,
    and the SAME Python-computed slope literal (repr) so the doubles
    compared on each side are bit-identical."""
    terms = []
    n = len(_POLY)
    for i in range(n):
        xi, yi = _POLY[i]
        xj, yj = _POLY[(i + 1) % n]
        if yi == yj:
            continue
        slope = (xj - xi) / (yj - yi)
        terms.append(
            f"CASE WHEN (({yi!r} > {y}) != ({yj!r} > {y})) AND "
            f"{x} < ({y} - {yi!r}) * {slope!r} + {xi!r} "
            f"THEN 1 ELSE 0 END"
        )
    return f"(({' + '.join(terms)}) % 2)"


def _sql_point_in_ellipses(x: str, y: str) -> str:
    parts = []
    for g in range(0, len(_ELLIPSES), 4):
        x0, y0, a, b = _ELLIPSES[g : g + 4]
        parts.append(
            f"(power(({x} - {x0!r}) / {a!r}, 2) + "
            f"power(({y} - {y0!r}) / {b!r}, 2)) <= 1.0"
        )
    return f"CASE WHEN {' OR '.join(parts)} THEN 1 ELSE 0 END"


@query(
    "geo_function_surface",
    oracle=f"""
    WITH src AS (
        SELECT event_id,
               (event_id * 7919 % 36000) / 100.0 - 180 AS lon,
               (event_id * 104729 % 18000) / 100.0 - 90 AS lat,
               (user_id * 7919 % 36000) / 100.0 - 180 AS lon2,
               (user_id * 104729 % 18000) / 100.0 - 90 AS lat2
        FROM events WHERE event_id % 17 = 5
    ),
    q AS (
        SELECT *,
               least(CAST(floor((lon + 180) / 360 * {1 << _NLON})
                          AS BIGINT), {(1 << _NLON) - 1}) AS xl,
               least(CAST(floor((lat + 90) / 180 * {1 << _NLAT})
                          AS BIGINT), {(1 << _NLAT) - 1}) AS xt
        FROM src
    )
    SELECT event_id::BIGINT AS eid,
           {_sql_geohash6('xl', 'xt')} AS gh6,
           CAST(floor(((xl + 0.5) / {1 << _NLON} * 360 - 180) * 10000
                      + 0.5) AS BIGINT) AS dec_lon_u,
           CAST(floor(((xt + 0.5) / {1 << _NLAT} * 180 - 90) * 10000
                      + 0.5) AS BIGINT) AS dec_lat_u,
           CAST({_sql_point_in_polygon('lon', 'lat')} AS BIGINT)
               AS in_poly,
           CAST({_sql_point_in_ellipses('lon', 'lat')} AS BIGINT)
               AS in_ell,
           CAST(floor(degrees(2 * asin(sqrt(
                    power(sin(radians(lat2 - lat) / 2), 2)
                    + cos(radians(lat)) * cos(radians(lat2))
                    * power(sin(radians(lon2 - lon) / 2), 2)
                ))) * 10000 + 0.5) AS BIGINT) AS angle_u
    FROM q ORDER BY eid
    """,
)
def geo_function_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The geo family over deterministic synthetic coordinates (prime
    multipliers spread events across the full lon/lat domain): geohash
    precision-6 encode, encode→decode cell centers (the oracle replays
    the quantization arithmetic, so a corrupted decode path diverges),
    ray-cast membership in a literal non-convex pentagon, any-of-two
    ellipse membership, and the haversine central angle (scaled-floor
    rendered — trig libm last-ulp differences between engines must not
    reach the value hash). Everything is literal-unrolled codegen
    arithmetic: map-side only, zero shuffles before the final sort.
    100 TB: a pure map stage — partition-local, no state."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 17 == 5)
    lon = (F.col("event_id") * 7919 % 36000) / 100.0 - 180.0
    lat = (F.col("event_id") * 104729 % 18000) / 100.0 - 90.0
    lon2 = (F.col("user_id") * 7919 % 36000) / 100.0 - 180.0
    lat2 = (F.col("user_id") * 104729 % 18000) / 100.0 - 90.0
    gh6 = ch_expr("geohashEncode", lon, lat, _P)
    dec = ch_expr("geohashDecode", gh6, _P)
    angle = ch_expr("greatCircleAngle", lon, lat, lon2, lat2)
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        gh6.alias("gh6"),
        F.floor(dec.getField("longitude") * 10000 + 0.5)
        .cast("long")
        .alias("dec_lon_u"),
        F.floor(dec.getField("latitude") * 10000 + 0.5)
        .cast("long")
        .alias("dec_lat_u"),
        ch_expr("pointInPolygon", lon, lat, _POLY)
        .cast("long")
        .alias("in_poly"),
        ch_expr("pointInEllipses", lon, lat, *_ELLIPSES)
        .cast("long")
        .alias("in_ell"),
        F.floor(angle * 10000 + 0.5).cast("long").alias("angle_u"),
    ).orderBy("eid")
