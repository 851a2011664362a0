"""Round-6 wave-8 translation-table additions evaluated against
hand-computed expectations (math, date, array, map arithmetic, JSON,
URL, transform)."""

from __future__ import annotations

import datetime as dt
import math

import pyspark.sql.functions as F
import pytest

from clickhouse_objects_analysis_spark.functions.ch import (
    CH_FUNCTIONS,
    NON_BIT_COMPATIBLE,
    ch_expr,
)


def test_table_size_and_bit_compat_markers():
    assert len(CH_FUNCTIONS) >= 330
    assert "murmurHash3_32" in NON_BIT_COMPATIBLE
    # every marked name must actually be in the table
    assert NON_BIT_COMPATIBLE <= set(CH_FUNCTIONS)


def test_w8_math_builders(spark):
    r = (
        spark.range(1)
        .select(
            ch_expr("sinh", F.lit(1.0)).alias("sh"),
            ch_expr("asinh", F.lit(1.0)).alias("ash"),
            ch_expr("asinh", F.lit(-1e8)).alias("ashn"),
            ch_expr("acosh", F.lit(2.0)).alias("ach"),
            ch_expr("atanh", F.lit(0.5)).alias("ath"),
            ch_expr("hypot", F.lit(3.0), F.lit(4.0)).alias("hy"),
            ch_expr("log1p", F.lit(0.0)).alias("l1p"),
            ch_expr("expm1", F.lit(0.0)).alias("em1"),
            ch_expr("intExp2", F.lit(10)).alias("e2"),
            ch_expr("truncate", F.lit(-2.789), 2).alias("tr"),
            ch_expr("truncate", F.lit(2.789)).alias("tr0"),
            ch_expr(
                "greatCircleDistance",
                F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(90.0),
            ).alias("gcd"),
        )
        .head()
    )
    assert abs(r.sh - math.sinh(1.0)) < 1e-12
    assert abs(r.ash - math.asinh(1.0)) < 1e-12
    # catastrophic-cancellation regression: naive log(c+sqrt(c²+1))
    # returns -Inf here; the odd-symmetric form stays finite
    assert abs(r.ashn - math.asinh(-1e8)) < 1e-9
    assert abs(r.ach - math.acosh(2.0)) < 1e-12
    assert abs(r.ath - math.atanh(0.5)) < 1e-12
    assert r.hy == 5.0 and r.l1p == 0.0 and r.em1 == 0.0 and r.e2 == 1024
    assert r.tr == -2.78 and r.tr0 == 2.0
    # pole-to-equator quarter great circle on CH's radius
    assert abs(r.gcd - math.pi / 2 * 6372797.560856) < 1.0


def test_w8_date_builders(spark):
    ts = F.lit("2026-08-14 10:47:31").cast("timestamp")
    r = (
        spark.range(1)
        .select(
            ch_expr("addYears", F.lit("2024-02-29").cast("date"), 1).alias("ay"),
            ch_expr("subtractYears", F.lit("2026-08-14").cast("date"), 2).alias("sy"),
            ch_expr("subtractHours", ts, F.lit(11)).alias("sh"),
            ch_expr("subtractMinutes", ts, F.lit(48)).alias("smin"),
            ch_expr("subtractSeconds", ts, F.lit(32)).alias("ssec"),
            ch_expr("toLastDayOfMonth", ts).alias("ld"),
            ch_expr("toStartOfSecond", ts).alias("ss"),
            ch_expr("parseDateTimeBestEffort", F.lit("2026-08-14 10:47:31")).alias("p1"),
            ch_expr("parseDateTimeBestEffort", F.lit("2026-08-14")).alias("p2"),
            ch_expr("parseDateTimeBestEffort", F.lit("14/08/2026 10:47:31")).alias("p3"),
            ch_expr("parseDateTimeBestEffort", F.lit("not a date")).alias("p4"),
            ch_expr("parseDateTimeBestEffort", F.lit("14/08/2026")).alias("p5"),
        )
        .head()
    )
    assert r.ay == dt.date(2025, 2, 28)  # leap-day clamp, CH-compatible
    assert r.sy == dt.date(2024, 8, 14)
    assert r.sh == dt.datetime(2026, 8, 13, 23, 47, 31)
    assert r.smin == dt.datetime(2026, 8, 14, 9, 59, 31)
    assert r.ssec == dt.datetime(2026, 8, 14, 10, 46, 59)
    assert r.ld == dt.date(2026, 8, 31)
    assert r.ss == dt.datetime(2026, 8, 14, 10, 47, 31)
    assert r.p1 == dt.datetime(2026, 8, 14, 10, 47, 31)
    assert r.p2 == dt.datetime(2026, 8, 14, 0, 0, 0)
    assert r.p3 == dt.datetime(2026, 8, 14, 10, 47, 31)
    assert r.p4 is None
    # date-only slash form uses the same DD/MM convention as the
    # datetime slash form (CH best-effort reads slash dates as DD/MM)
    assert r.p5 == dt.datetime(2026, 8, 14, 0, 0, 0)


def test_w8_string_array_builders(spark):
    arr = F.array(F.lit(3.0), F.lit(1.0), F.lit(2.0))
    r = (
        spark.range(1)
        .select(
            ch_expr("substringIndex", F.lit("a.b.c"), ".", 2).alias("si"),
            ch_expr("translate", F.lit("abca"), "ab", "xy").alias("tl"),
            ch_expr("space", F.lit(3)).alias("sp"),
            ch_expr("arrayCumSum", arr).alias("cs"),
            ch_expr("arrayReverseSort", arr).alias("rs"),
            ch_expr(
                "arrayRotateLeft", F.array(F.lit(1), F.lit(2), F.lit(3)), F.lit(1)
            ).alias("rl"),
            ch_expr(
                "arrayRotateRight", F.array(F.lit(1), F.lit(2), F.lit(3)), F.lit(1)
            ).alias("rr"),
            ch_expr(
                "arrayDotProduct",
                F.array(F.lit(1.0), F.lit(2.0)),
                F.array(F.lit(3.0), F.lit(4.0)),
            ).alias("dp"),
            ch_expr(
                "arrayJaccardIndex",
                F.array(F.lit(1), F.lit(2), F.lit(3)),
                F.array(F.lit(2), F.lit(3), F.lit(4)),
            ).alias("ji"),
            ch_expr("arrayWithConstant", F.lit(3), F.lit("x")).alias("wc"),
            ch_expr(
                "countEqual", F.array(F.lit(1), F.lit(2), F.lit(1)), F.lit(1)
            ).alias("ce"),
            ch_expr(
                "arrayEnumerateDense",
                F.array(F.lit("a"), F.lit("b"), F.lit("a"), F.lit("c")),
            ).alias("ed"),
        )
        .head()
    )
    # translate maps every 'a' -> 'x' (ClickHouse agrees): abca -> xycx
    assert r.si == "a.b" and r.tl == "xycx" and r.sp == "   "
    assert r.cs == [3.0, 4.0, 6.0]
    assert r.rs == [3.0, 2.0, 1.0]
    assert r.rl == [2, 3, 1] and r.rr == [3, 1, 2]
    assert r.dp == 11.0
    assert abs(r.ji - 0.5) < 1e-12
    assert r.wc == ["x", "x", "x"] and r.ce == 2
    assert r.ed == [1, 2, 1, 3]


def test_w8_map_json_url_builders(spark):
    m1 = F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2))
    m2 = F.create_map(F.lit("b"), F.lit(10), F.lit("c"), F.lit(3))
    url = F.lit("https://example.org/p/q?k=v&x=1#frag")
    r = (
        spark.range(1)
        .select(
            ch_expr("mapAdd", m1, m2).alias("madd"),
            ch_expr("mapSubtract", m1, m2).alias("msub"),
            ch_expr("mapUpdate", m1, m2).alias("mupd"),
            ch_expr("JSONExtractKeys", F.lit('{"a":1,"b":2}')).alias("jk"),
            ch_expr("simpleJSONExtractInt", F.lit('{"a":42}'), "a").alias("ji"),
            ch_expr("simpleJSONExtractFloat", F.lit('{"a":1.5}'), "a").alias("jf"),
            ch_expr("simpleJSONExtractBool", F.lit('{"a":true}'), "a").alias("jb"),
            ch_expr("fragment", url).alias("fr"),
            ch_expr("cutFragment", url).alias("cf"),
            ch_expr("cutQueryString", url).alias("cq"),
            ch_expr("cutQueryStringAndFragment", url).alias("cqf"),
            ch_expr("extractURLParameter", url, F.lit("x")).alias("xp"),
            ch_expr(
                "transform",
                F.lit("b"),
                F.array(F.lit("a"), F.lit("b")),
                F.array(F.lit(1), F.lit(2)),
                F.lit(-1),
            ).alias("tf"),
            ch_expr(
                "transform",
                F.lit("zz"),
                F.array(F.lit("a"), F.lit("b")),
                F.array(F.lit(1), F.lit(2)),
                F.lit(-1),
            ).alias("tfd"),
            ch_expr("isZeroOrNull", F.lit(0)).alias("z0"),
            ch_expr("isZeroOrNull", F.lit(5)).alias("z5"),
            ch_expr("isZeroOrNull", F.lit(None).cast("int")).alias("zn"),
            ch_expr("throwIf", F.lit(False), "boom").alias("ti"),
            ch_expr("murmurHash3_32", F.lit("abc")).alias("mh"),
        )
        .head()
    )
    assert r.madd == {"a": 1, "b": 12, "c": 3}
    assert r.msub == {"a": 1, "b": -8, "c": -3}
    assert r.mupd == {"a": 1, "b": 10, "c": 3}
    assert r.jk == ["a", "b"]
    assert r.ji == 42 and r.jf == 1.5 and r.jb is True
    assert r.fr == "frag"
    assert r.cf == "https://example.org/p/q?k=v&x=1"
    # cutQueryString preserves the fragment (CH semantics); only
    # cutQueryStringAndFragment drops both
    assert r.cq == "https://example.org/p/q#frag"
    assert r.cqf == "https://example.org/p/q"
    assert r.xp == "1"
    assert r.tf == 2 and r.tfd == -1
    assert r.z0 is True and r.z5 is False and r.zn is True
    assert r.ti == 0
    assert isinstance(r.mh, int)


def test_w8_throwif_raises(spark):
    with pytest.raises(Exception, match="boom"):
        spark.range(1).select(
            ch_expr("throwIf", F.lit(True), "boom").alias("x")
        ).head()
