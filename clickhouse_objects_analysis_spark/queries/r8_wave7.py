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

import pandas as pd
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
    the quantization arithmetic, so a corrupted encode/decode diverges),
    ray-cast membership in a literal non-convex pentagon, any-of-two
    ellipse membership, and the haversine central angle (scaled-floor
    rendered — trig libm last-ulp differences between engines must not
    reach the value hash). Geohash work runs in one Arrow kernel
    (_gh6_kernel — kills the r8 plan-compile constant); polygon /
    ellipse / angle stay small literal-unrolled codegen trees.
    100 TB: a pure map stage — partition-local, no state."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 17 == 5)
    lon = (F.col("event_id") * 7919 % 36000) / 100.0 - 180.0
    lat = (F.col("event_id") * 104729 % 18000) / 100.0 - 90.0
    lon2 = (F.col("user_id") * 7919 % 36000) / 100.0 - 180.0
    lat2 = (F.col("user_id") * 104729 % 18000) / 100.0 - 90.0
    gh = _gh6_kernel_factory()(lon, lat)
    angle = ch_expr("greatCircleAngle", lon, lat, lon2, lat2)
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        gh.getField("gh6").alias("gh6"),
        gh.getField("dec_lon_u").alias("dec_lon_u"),
        gh.getField("dec_lat_u").alias("dec_lat_u"),
        ch_expr("pointInPolygon", lon, lat, _POLY)
        .cast("long")
        .alias("in_poly"),
        ch_expr("pointInEllipses", lon, lat, *_ELLIPSES)
        .cast("long")
        .alias("in_ell"),
        F.floor(angle * 10000 + 0.5).cast("long").alias("angle_u"),
    ).orderBy("eid")


def _gh6_kernel_factory():
    """Arrow-batched geohash-6 encode + decode-to-cell-center kernel —
    the SAME quantize / bit-interleave / center arithmetic as
    functions/ch.py _geohash_encode/_geohash_decode, but as ONE numpy
    pass instead of a literal-unrolled Catalyst forest. The unrolled
    decode(encode(...)) composition carried a ~7 s driver-side plan
    analysis+codegen constant (r8 verdict #3 — decode re-references the
    ~300-node encode tree per extracted bit); this is the
    lsh_buckets_udf fix (operators/similarity.py:310). All ops are
    integer shifts and IEEE-754 double +-*/ in the same order as the
    expr path, so outputs are bit-identical; the Catalyst expr path
    stays covered by tests/test_geo_decode.py. Factory shape (like
    lsh_buckets_udf) because pandas_udf creation needs a live session."""

    @F.pandas_udf("struct<gh6:string, dec_lon_u:bigint, dec_lat_u:bigint>")
    def _gh6_kernel(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        import numpy as np

        lonv = lon.to_numpy(dtype="float64")
        latv = lat.to_numpy(dtype="float64")
        xl = np.minimum(
            np.floor((lonv + 180.0) / 360.0 * (1 << _NLON)).astype("int64"),
            (1 << _NLON) - 1,
        )
        xt = np.minimum(
            np.floor((latv + 90.0) / 180.0 * (1 << _NLAT)).astype("int64"),
            (1 << _NLAT) - 1,
        )
        alpha = np.array(list(_GEO32))
        out = None
        for k in range(_P):
            idx = np.zeros(len(xl), dtype="int64")
            for b in range(5):
                i = 5 * k + b
                if i % 2 == 0:
                    bit = (xl >> (_NLON - 1 - i // 2)) & 1
                else:
                    bit = (xt >> (_NLAT - 1 - (i - 1) // 2)) & 1
                idx += bit << (4 - b)
            ck = alpha[idx]
            out = ck if out is None else np.char.add(out, ck)
        dec_lon = (xl + 0.5) / float(1 << _NLON) * 360.0 - 180.0
        dec_lat = (xt + 0.5) / float(1 << _NLAT) * 180.0 - 90.0
        return pd.DataFrame(
            {
                "gh6": out,
                "dec_lon_u": np.floor(dec_lon * 10000 + 0.5).astype(
                    "int64"
                ),
                "dec_lat_u": np.floor(dec_lat * 10000 + 0.5).astype(
                    "int64"
                ),
            }
        )

    return _gh6_kernel
