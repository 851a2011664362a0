"""Round-7 wave 10: translation-table breadth — IPv4/MAC/UUID
conversions, the 64-bit bit surface (rotate/test/positions/Hamming),
array shift/partial-sort/reduce, vector norms (general-p included),
SQL/JSON entry points, and the URL hierarchy generators.

Every expectation below is hand-computed (or round-trip) — the oracled
end-to-end slice is `ch_r7_function_surface_2` in queries/r7_wave2.py;
these unit tests pin the per-name semantics including the edges the
oracle row mix can't reach (empty arrays, bit 63, malformed IPv4).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import (
    NON_BIT_COMPATIBLE,
    ch_expr,
)

UUID = "61f0c404-5cb3-11e7-907b-a6006ad3dba0"


def test_w10_ipv4_mac_uuid(spark):
    r = (
        spark.range(1)
        .select(
            ch_expr("IPv4StringToNum", F.lit("192.168.1.10")).alias("n"),
            ch_expr("IPv4NumToString", F.lit(3232235786)).alias("s"),
            ch_expr("IPv4StringToNumOrNull", F.lit("999.1.1.1")).alias(
                "bad"
            ),
            ch_expr("IPv4NumToStringClassC", F.lit(3232235786)).alias("c"),
            ch_expr("IPv4ToIPv6", F.lit(3232235786)).alias("v6"),
            ch_expr("IPv4CIDRToRange", F.lit(3232235786), 24).alias("r"),
            ch_expr(
                "isIPAddressInRange", F.lit("192.168.1.10"),
                "192.168.0.0/16",
            ).alias("inr"),
            ch_expr(
                "isIPAddressInRange", F.lit("192.169.1.10"),
                "192.168.0.0/16",
            ).alias("outr"),
            ch_expr("toIPv4", F.lit("10.0.0.1")).alias("tip"),
            ch_expr("MACNumToString", F.lit(0x0123456789AB)).alias("mac"),
            ch_expr("MACStringToNum", F.lit("01:23:45:67:89:ab")).alias(
                "macn"
            ),
            ch_expr("MACStringToOUI", F.lit("01:23:45:67:89:ab")).alias(
                "oui"
            ),
            ch_expr(
                "UUIDNumToString", ch_expr("UUIDStringToNum", F.lit(UUID))
            ).alias("uu"),
        )
        .collect()[0]
    )
    assert r.n == 3232235786
    assert r.s == "192.168.1.10"
    assert r.bad is None
    assert r.c == "192.168.1.xxx"
    assert r.v6 == "::ffff:192.168.1.10"
    assert (r.r.lo, r.r.hi) == ("192.168.1.0", "192.168.1.255")
    assert r.inr is True and r.outr is False
    assert r.tip == 167772161
    assert r.mac == "01:23:45:67:89:ab"
    assert r.macn == 0x0123456789AB and r.oui == 0x012345
    assert r.uu == UUID  # round-trip through the 16-byte binary view


def test_w10_bit_surface(spark):
    r = (
        spark.range(1)
        .select(
            # 0b1011 ^ 0b0010 = 0b1001 -> 2 set bits
            ch_expr(
                "bitHammingDistance", F.lit(0b1011), F.lit(0b0010)
            ).alias("ham"),
            # rotates are 64-bit even for int inputs (long cast inside)
            ch_expr("bitRotateLeft", F.lit(1), 63).alias("rotl"),
            ch_expr("bitRotateRight", F.lit(1), 1).alias("rotr"),
            ch_expr("bitRotateLeft", F.lit(1), 0).alias("rot0"),
            ch_expr("bitTestAll", F.lit(0b1010), 1, 3).alias("bta"),
            ch_expr("bitTestAll", F.lit(0b1010), 1, 2).alias("btaF"),
            ch_expr("bitTestAny", F.lit(0b1010), 1, 2).alias("btany"),
            ch_expr("bitTestAny", F.lit(0b1010), 0, 2).alias("btanyF"),
            # sign bit = position 63 (masked, not shifted)
            ch_expr(
                "bitPositionsToArray", F.lit(-9223372036854775808)
            ).alias("bpos"),
            ch_expr("bitPositionsToArray", F.lit(0b1010)).alias("bpos2"),
        )
        .collect()[0]
    )
    assert r.ham == 2
    assert r.rotl == -(1 << 63) and r.rotr == -(1 << 63) and r.rot0 == 1
    assert r.bta is True and r.btaF is False
    assert r.btany is True and r.btanyF is False
    assert r.bpos == [63] and r.bpos2 == [1, 3]


def test_w10_array_surface(spark):
    r = (
        spark.range(1)
        .select(
            ch_expr(
                "arrayCumSumNonNegative",
                F.array(F.lit(1.0), F.lit(-3.0), F.lit(2.0)),
            ).alias("cns"),
            ch_expr(
                "arrayLastIndex",
                lambda x: x > 1,
                F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(0)),
            ).alias("ali"),
            ch_expr("arrayLastIndex", lambda x: x > 9, F.array(F.lit(1)))
            .alias("ali0"),
            ch_expr(
                "arrayLastIndex", lambda x: x > 9,
                F.array().cast("array<int>"),
            ).alias("aliE"),
            ch_expr(
                "arrayShiftLeft", F.array(F.lit(1), F.lit(2), F.lit(3)), 2
            ).alias("asl"),
            ch_expr(
                "arrayShiftRight",
                F.array(F.lit(1), F.lit(2), F.lit(3)),
                1,
                F.lit(9),
            ).alias("asr"),
            ch_expr(
                "arrayPartialSort", 2, F.array(F.lit(3), F.lit(1), F.lit(2))
            ).alias("aps"),
            ch_expr(
                "arrayReduce", "sum", F.array(F.lit(1.5), F.lit(2.5))
            ).alias("asum"),
            ch_expr(
                "arrayReduce", "uniqExact",
                F.array(F.lit(1), F.lit(1), F.lit(2)),
            ).alias("auniq"),
            ch_expr(
                "arrayReduce", "avg", F.array(F.lit(1.0), F.lit(3.0))
            ).alias("aavg"),
            F.size(
                ch_expr(
                    "arrayRandomSample", F.sequence(F.lit(1), F.lit(10)), 3
                )
            ).alias("ars"),
            F.array_sort(
                ch_expr("arrayShuffle", F.sequence(F.lit(1), F.lit(5)))
            ).alias("ash"),
        )
        .collect()[0]
    )
    assert r.cns == [1.0, 0.0, 2.0]  # clamped at 0 after the -3 step
    assert r.ali == 3 and r.ali0 == 0 and r.aliE == 0
    assert r.asl == [3, 0, 0]
    assert r.asr == [9, 1, 2]
    assert r.aps == [1, 2, 3]
    assert abs(r.asum - 4.0) < 1e-12 and r.auniq == 2
    assert abs(r.aavg - 2.0) < 1e-12
    assert r.ars == 3  # sampled size; content is nondeterministic
    assert r.ash == [1, 2, 3, 4, 5]  # permutation of the input


def test_w10_array_reduce_rejects_unknown():
    import pytest

    with pytest.raises(KeyError):
        ch_expr("arrayReduce", "medianExact", F.array(F.lit(1)))


def test_w10_norms_json_url(spark):
    url = "https://example.com/browse/CONV-6788"
    r = (
        spark.range(1)
        .select(
            ch_expr("L2SquaredNorm", F.array(F.lit(3.0), F.lit(4.0)))
            .alias("l2s"),
            ch_expr("LpNorm", F.array(F.lit(3.0), F.lit(4.0)), 2).alias(
                "lp2"
            ),
            ch_expr(
                "LpDistance",
                F.array(F.lit(1.0), F.lit(1.0)),
                F.array(F.lit(4.0), F.lit(5.0)),
                2,
            ).alias("lpd"),
            ch_expr("L1Normalize", F.array(F.lit(1.0), F.lit(3.0))).alias(
                "l1n"
            ),
            ch_expr("L2Normalize", F.array(F.lit(3.0), F.lit(4.0))).alias(
                "l2n"
            ),
            ch_expr("alphaTokens", F.lit("abc1def  ghi")).alias("at"),
            ch_expr("JSON_VALUE", F.lit('{"a": {"b": 5}}'), "$.a.b").alias(
                "jv"
            ),
            ch_expr("JSON_QUERY", F.lit('{"a": [1, 2]}'), "$.a").alias(
                "jq"
            ),
            ch_expr("JSON_EXISTS", F.lit('{"a": 1}'), "$.b").alias("je"),
            ch_expr("JSONExtractUInt", F.lit('{"a": -5}'), "a").alias(
                "juNeg"
            ),
            ch_expr("JSONExtractUInt", F.lit('{"a": 7}'), "a").alias("ju"),
            ch_expr("simpleJSONHas", F.lit('{"a": 7}'), "a").alias("sjh"),
            ch_expr("URLHierarchy", F.lit(url)).alias("uh"),
            ch_expr("URLHierarchy", F.lit("https://example.com")).alias(
                "uh0"
            ),
            ch_expr("URLPathHierarchy", F.lit(url)).alias("uph"),
            ch_expr("accurateCast", F.lit("12"), "long").alias("ac"),
            ch_expr("accurateCastOrNull", F.lit("12x"), "long").alias(
                "acn"
            ),
        )
        .collect()[0]
    )
    assert abs(r.l2s - 25.0) < 1e-12
    assert abs(r.lp2 - 5.0) < 1e-12 and abs(r.lpd - 5.0) < 1e-12
    assert r.l1n == [0.25, 0.75] and r.l2n == [0.6, 0.8]
    assert r.at == ["abc", "def", "ghi"]
    assert r.jv == "5" and r.jq == "[1,2]" and r.je is False
    assert r.juNeg is None and r.ju == 7 and r.sjh is True
    assert r.uh == [
        "https://example.com/",
        "https://example.com/browse/",
        "https://example.com/browse/CONV-6788",
    ]
    assert r.uh0 == ["https://example.com/"]
    assert r.uph == ["/browse/", "/browse/CONV-6788"]
    assert r.ac == 12 and r.acn is None


def test_w10_urlhash_marked_non_bit_compatible():
    assert "URLHash" in NON_BIT_COMPATIBLE


def test_w10b_bitmap_family(spark):
    """Bitmap set algebra over the sorted-distinct array<long> carrier:
    hand-computed expectations incl. the CH empty-bitmap min/max
    sentinels (UINT32_MAX / 0)."""
    A = F.array(*[F.lit(x).cast("long") for x in (5, 1, 3, 1)])
    B = F.array(*[F.lit(x).cast("long") for x in (3, 4, 5)])
    E = F.array().cast("array<long>")
    a, b = ch_expr("bitmapBuild", A), ch_expr("bitmapBuild", B)
    r = (
        spark.range(1)
        .select(
            a.alias("a"),
            ch_expr("bitmapCardinality", a).alias("card"),
            ch_expr("bitmapAnd", a, b).alias("and_"),
            ch_expr("bitmapOr", a, b).alias("or_"),
            ch_expr("bitmapXor", a, b).alias("xor_"),
            ch_expr("bitmapAndnot", a, b).alias("andnot"),
            ch_expr("bitmapXorCardinality", a, b).alias("xc"),
            ch_expr("bitmapContains", a, F.lit(3).cast("long")).alias(
                "ct"
            ),
            ch_expr("bitmapHasAny", a, b).alias("ha"),
            ch_expr("bitmapHasAll", a, b).alias("hall"),
            ch_expr("bitmapMin", E).alias("mnE"),
            ch_expr("bitmapMax", E).alias("mxE"),
            ch_expr(
                "bitmapSubsetInRange", a, F.lit(2), F.lit(5)
            ).alias("sir"),
            ch_expr("bitmapSubsetLimit", a, F.lit(2), 2).alias("sl"),
            ch_expr("subBitmap", a, F.lit(1), 2).alias("sb"),
            ch_expr(
                "bitmapTransform",
                a,
                F.array(F.lit(3).cast("long")),
                F.array(F.lit(9).cast("long")),
            ).alias("tr"),
        )
        .collect()[0]
    )
    assert r.a == [1, 3, 5] and r.card == 3
    assert r.and_ == [3, 5] and r.or_ == [1, 3, 4, 5]
    assert r.xor_ == [1, 4] and r.andnot == [1] and r.xc == 2
    assert r.ct is True and r.ha is True and r.hall is False
    assert r.mnE == 4294967295 and r.mxE == 0
    assert r.sir == [3] and r.sl == [3, 5] and r.sb == [3, 5]
    assert r.tr == [1, 5, 9]


def test_w10b_group_bitmap_aggregates(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (1, [2, 3, 4]), (1, [2, 5, 3])],
        "g int, b array<bigint>",
    )
    r = (
        df.groupBy("g")
        .agg(
            ch_expr("groupBitmapOr", F.col("b")).alias("o"),
            ch_expr("groupBitmapAnd", F.col("b")).alias("a"),
            ch_expr("groupBitmapXor", F.col("b")).alias("x"),
        )
        .collect()[0]
    )
    assert r.o == 5  # |{1..5}|
    assert r.a == 2  # |{2,3}|
    # fold: {1,2,3}^{2,3,4}={1,4}; {1,4}^{2,5,3}={1,2,3,4,5}
    assert r.x == 5
