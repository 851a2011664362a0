"""Round-13 wave 1: the final mechanically-promotable unsupported-tail
band (r12 verdict #1) — 24 names promoted, plus the sipHash64 upgrade
from NBC-xxhash64 to the true Guava-validated SipHash-2-4 kernel.

``ch_r13_function_surface`` covers: no-ops identity / materialize /
ignore / concatAssumeInjective; the hash-kernel band murmurHash2_32 /
murmurHash2_64 / gccMurmurHash / murmurHash3_64 / murmurHash3_128 /
metroHash64 / farmFingerprint64 / wyHash64 / xxh3 / sipHash64;
geoDistance; sumKahan; sumWithOverflow; timeZoneOf / timeZoneOffset;
toTypeName; rand / rand32 / rand64 / randCanonical / generateUUIDv4.

Oracle strategy (the r11/r12 pattern):
- hash kernels → pinned vectors. Provenance per kernel: murmurHash3_*
  / farmFingerprint64 / sipHash64 pinned against Spark's bundled GUAVA
  reference implementations (independently validated,
  tests/test_r13_hash_kernels.py); wyHash64 matches the CH docs
  example wyHash64('ClickHouse'); murmurHash2_* transcribed from
  Appleby's public-domain spec; metroHash64/xxh3 are spec-transcribed
  and self-pinned (NON_BIT_COMPATIBLE documents the residual variant
  risk).
- geoDistance → pinned from the Andoyer-Lambert expression, rounded
  to 0.1 m (CH's float32 polynomial is NBC-documented).
- aggregates (sumKahan exact-fsum, sumWithOverflow mod-2^64 wrap) →
  DuckDB computes the same quantity live (HUGEINT wrap arithmetic).
- nondeterministic generators → boolean contract checks (range,
  UUIDv4 shape, per-call independence) that DuckDB answers TRUE.

Reference parity: every promoted name parses as a plain identifier in
the reference grammar (generated_ch_parser/ClickHouseParser.py:15571,
ColumnExprFunctionContext).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .r11_wave1 import _rot_sql
from .registry import query, tables

#: o_orderpriority → pinned kernel outputs (two's-complement BIGINT
#: rendering for the UInt64 kernels — the CRC64 convention).
#: columns: murmurHash2_32, murmurHash2_64, gccMurmurHash,
#: murmurHash3_64, murmurHash3_128 (hex), metroHash64,
#: farmFingerprint64, wyHash64, xxh3, sipHash64
_S = lambda v: v - (1 << 64) if v >= 1 << 63 else v  # noqa: E731
_PRI_HASHES: dict[str, tuple] = {
    "1-URGENT": (
        2866652185, _S(16690406000095950780), _S(13513200421010636738),
        _S(50174312779863319), "B17C54801CBE09A8A6A9430A59FFBBA8",
        _S(9085770967019194177), _S(12687569955911350966),
        _S(1863703016567473937), _S(6974033431943394111),
        _S(14881304025545970900),
    ),
    "2-HIGH": (
        3820018160, _S(9564360158206726540), _S(14951421474462733735),
        _S(12845164880877398108), "63AE0342C1CEF6603F86064CA6FFB5D2",
        _S(4311392231742674384), _S(1510206931830867796),
        _S(18003119471267776973), _S(13199556761272252295),
        _S(5962628801089331572),
    ),
    "3-MEDIUM": (
        535713185, _S(5403922537970934214), _S(3313252506318603771),
        _S(9886954443487536026), "1DF96F8137B9D2B9879AE45B993DE730",
        _S(2701001138612842624), _S(18221757559392240174),
        _S(6479733319240568704), _S(15794546983002625282),
        _S(12119877226987029173),
    ),
    "4-NOT SPECIFIED": (
        3505365662, _S(11883276417215085728), _S(12491414551909905003),
        _S(17247286620116977236), "51CAF612B3C4555D054C9D197E6F0FB2",
        _S(17031801311476687814), _S(337671425332023790),
        _S(9837061185891120749), _S(9806584963656635607),
        _S(4236648070722726687),
    ),
    "5-LOW": (
        3190964046, _S(18076928620255874294), _S(4698289477624547315),
        _S(16056201697168376869), "D24ABC0F94A54375F78E02C6CBB390AB",
        _S(4752159038202481452), _S(15958886283526079404),
        _S(8999251636253405763), _S(3201324245181176382),
        _S(4530576920128411957),
    ),
}

#: (lon1, lat1, lon2, lat2) → Andoyer-Lambert meters rounded to 0.1
#: (Chicago→Paris, Moscow→Tokyo, Sydney→Rio, coincident, London→Paris)
_GEO_VEC: list[tuple[float, float, float, float, float]] = [
    (-87.6298, 41.8781, 2.3522, 48.8566, 6668913.8),
    (37.6173, 55.7558, 139.6917, 35.6895, 7496795.9),
    (151.2093, -33.8688, -43.1729, -22.9068, 13540072.7),
    (0.1278, 51.5074, 0.1278, 51.5074, 0.0),
    (-0.1276, 51.5072, 2.3522, 48.8566, 343898.7),
]


def _hash_case_sql(idx: int) -> str:
    arms = "\n".join(
        f"WHEN '{p}' THEN {v[idx]!r}" if isinstance(v[idx], str)
        else f"WHEN '{p}' THEN CAST({v[idx]} AS BIGINT)"
        for p, v in _PRI_HASHES.items()
    )
    return f"CASE pri\n{arms}\nEND"


_UUID4_RE = (
    "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-"
    "[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
)

#: 2^58 multiplier drives the 60-key sum past 2^64 so the wrap branch
#: of sumWithOverflow is actually exercised
_WRAP_MUL = 1 << 58


@query(
    "ch_r13_function_surface",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               o_totalprice AS tp, o_orderdate AS d
        FROM orders WHERE o_orderkey < 60
    ),
    agg AS (
        SELECT ROUND(SUM(tp), 2) AS skahan,
               CAST(((SUM(CAST(k AS HUGEINT) * {_WRAP_MUL})
                      + 9223372036854775808)
                     % 18446744073709551616)
                    - 9223372036854775808 AS BIGINT) AS swrap
        FROM src
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(k AS BIGINT) AS id_k,
           pri AS mat_pri,
           CAST(0 AS INT) AS ig,
           pri || '_' || CAST(k AS VARCHAR) AS cc,
           {_hash_case_sql(0)} AS m232,
           {_hash_case_sql(1)} AS m264,
           {_hash_case_sql(2)} AS gcc,
           {_hash_case_sql(3)} AS m364,
           {_hash_case_sql(4)} AS m3128,
           {_hash_case_sql(5)} AS metro,
           {_hash_case_sql(6)} AS farm,
           {_hash_case_sql(7)} AS wy,
           {_hash_case_sql(8)} AS x3,
           {_hash_case_sql(9)} AS sip,
           {_rot_sql('k % 5', [str(v[4]) for v in _GEO_VEC])}
               AS geo_txt,
           'UTC' AS tzof,
           CAST(0 AS BIGINT) AS tzoff,
           'Int64' AS tn_k,
           'String' AS tn_pri,
           'Float64' AS tn_tp,
           'Date32' AS tn_d,
           'Array(Float64)' AS tn_arr,
           'Map(String, Int32)' AS tn_map,
           agg.skahan AS skahan,
           agg.swrap AS swrap,
           TRUE AS rand_ok,
           TRUE AS r32_ok,
           TRUE AS r64_ok,
           TRUE AS rc_ok,
           TRUE AS uuid_ok
    FROM src, agg ORDER BY k
    """,
)
def ch_r13_function_surface_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r13 unsupported-tail promotions, each exercised end-to-end
    (see module docstring for the per-family oracle provenance).

    Scale shape: per-row scalar kernels over one pushed-down filtered
    scan; the two aggregate promotions ride a 1-row broadcast
    cross-join (no shuffle of the fact side); the hash kernels batch
    per-partition through Arrow."""
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 60)
    k = F.col("o_orderkey").cast("long")
    pri = F.col("o_orderpriority")
    geo_d = ch_expr(
        "geoDistance",
        _rot_elem(k, [v[0] for v in _GEO_VEC]),
        _rot_elem(k, [v[1] for v in _GEO_VEC]),
        _rot_elem(k, [v[2] for v in _GEO_VEC]),
        _rot_elem(k, [v[3] for v in _GEO_VEC]),
    )
    # pandas grouped-agg UDFs can't share an agg() with built-in
    # aggregates — two 1-row frames, both broadcast
    agg_k = o.agg(
        F.round(ch_expr("sumKahan", F.col("o_totalprice")), 2).alias(
            "skahan"
        )
    )
    agg_w = o.agg(
        ch_expr(
            "sumWithOverflow",
            F.col("o_orderkey").cast("decimal(38,0)")
            * F.lit(_WRAP_MUL),
        ).alias("swrap")
    )
    r64_a = ch_expr("rand64")
    r64_b = ch_expr("rand64")
    return (
        o.crossJoin(F.broadcast(agg_k))
        .crossJoin(F.broadcast(agg_w))
        .select(
            k.alias("k"),
            ch_expr("identity", k).alias("id_k"),
            ch_expr("materialize", pri).alias("mat_pri"),
            ch_expr("ignore", k, pri).alias("ig"),
            ch_expr(
                "concatAssumeInjective",
                pri, F.lit("_"), k.cast("string"),
            ).alias("cc"),
            ch_expr("murmurHash2_32", pri).alias("m232"),
            ch_expr("murmurHash2_64", pri).alias("m264"),
            ch_expr("gccMurmurHash", pri).alias("gcc"),
            ch_expr("murmurHash3_64", pri).alias("m364"),
            F.hex(ch_expr("murmurHash3_128", pri)).alias("m3128"),
            ch_expr("metroHash64", pri).alias("metro"),
            ch_expr("farmFingerprint64", pri).alias("farm"),
            ch_expr("wyHash64", pri).alias("wy"),
            ch_expr("xxh3", pri).alias("x3"),
            ch_expr("sipHash64", pri).alias("sip"),
            # compare as the rounded decimal's string to sidestep
            # DOUBLE-vs-VARCHAR schema hashing; 0.1 m quantization
            # (decimal cast avoids double→string scientific notation)
            F.round(geo_d, 1)
            .cast("decimal(18,1)")
            .cast("string")
            .alias("geo_txt"),
            ch_expr("timeZoneOf", F.current_timestamp()).alias("tzof"),
            ch_expr("timeZoneOffset", F.current_timestamp()).alias(
                "tzoff"
            ),
            ch_expr("toTypeName", k).alias("tn_k"),
            ch_expr("toTypeName", pri).alias("tn_pri"),
            ch_expr("toTypeName", F.col("o_totalprice")).alias("tn_tp"),
            ch_expr(
                "toTypeName", F.col("o_orderdate").cast("date")
            ).alias("tn_d"),
            ch_expr("toTypeName", F.array(F.lit(1.5))).alias("tn_arr"),
            ch_expr(
                "toTypeName", F.create_map(F.lit("a"), F.lit(1))
            ).alias("tn_map"),
            F.col("skahan"),
            F.col("swrap"),
            ch_expr("rand").between(0, (1 << 32) - 1).alias("rand_ok"),
            ch_expr("rand32")
            .between(0, (1 << 32) - 1)
            .alias("r32_ok"),
            (r64_a.isNotNull() & (r64_a != r64_b)).alias("r64_ok"),
            (
                (ch_expr("randCanonical") >= 0)
                & (ch_expr("randCanonical") < 1)
            ).alias("rc_ok"),
            ch_expr("generateUUIDv4")
            .rlike(_UUID4_RE)
            .alias("uuid_ok"),
        )
        .orderBy("k")
    )


def _rot_elem(k, vals: list[float]):
    return F.element_at(
        F.array(*[F.lit(float(v)) for v in vals]),
        (k % len(vals) + 1).cast("int"),
    )
