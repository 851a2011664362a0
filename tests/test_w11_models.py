"""Round-7 wave 11: MySQL-%-dialect datetime formats (the dialect CH
actually speaks — the old formatDateTime passthrough took Java
patterns), fixed-depth Euclid gcd/lcm, factorial, OrZero arithmetic,
byteSwap, sequence/token search, URL parameter utilities, map LIKE
predicates, and dateName. All expectations hand-computed; the oracled
end-to-end slice is `ch_r7_function_surface_3`."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clickhouse_objects_analysis_spark.functions.ch import (
    _mysql_datetime_format,
    ch_expr,
)


def test_w11_mysql_format_translation():
    assert _mysql_datetime_format("%Y-%m-%d %H:%i:%s") == (
        "yyyy-MM-dd HH:mm:ss"
    )
    assert _mysql_datetime_format("%d/%b/%Y at %T") == (
        "dd/MMM/yyyy' at 'HH:mm:ss"
    )
    assert _mysql_datetime_format("100%%") == "100%"
    with pytest.raises(KeyError):
        _mysql_datetime_format("%Q")


def test_w11_datetime_and_math(spark):
    ts = F.lit("2026-08-14 16:45:31").cast("timestamp")
    r = (
        spark.range(1)
        .select(
            ch_expr("formatDateTime", ts, "%Y-%m-%d %H:%i:%s").alias(
                "fdt"
            ),
            ch_expr("formatDateTime", ts, "%W %d %M %y").alias("fdt2"),
            ch_expr(
                "parseDateTime",
                F.lit("14/08/2026 16:45:31"),
                "%d/%m/%Y %H:%i:%s",
            ).cast("string").alias("pdt"),
            ch_expr("parseDateTimeOrNull", F.lit("xx"), "%Y").alias(
                "pdtn"
            ),
            ch_expr("dateName", "weekday", ts).alias("dn"),
            ch_expr("dateName", "month", ts).alias("dnm"),
            ch_expr("gcd", F.lit(252), F.lit(105)).alias("g"),
            ch_expr("gcd", F.lit(0), F.lit(7)).alias("g0"),
            ch_expr("lcm", F.lit(4), F.lit(6)).alias("l"),
            ch_expr("lcm", F.lit(0), F.lit(6)).alias("l0"),
            ch_expr("factorial", F.lit(20)).alias("fact"),
            ch_expr("intDivOrZero", F.lit(7), F.lit(0)).alias("idz"),
            ch_expr("moduloOrZero", F.lit(7), F.lit(0)).alias("mz"),
            ch_expr("max2", F.lit(3), F.lit(5)).alias("mx"),
            ch_expr("min2", F.lit(3), F.lit(5)).alias("mn"),
            ch_expr("byteSwap", F.lit(1)).alias("bs"),
            ch_expr(
                "byteSwap", ch_expr("byteSwap", F.lit(123456789))
            ).alias("bs2"),
            ch_expr("quantileGK", F.lit(5.0)).alias("qgk"),
        )
        .collect()[0]
    )
    assert r.fdt == "2026-08-14 16:45:31"
    assert r.fdt2 == "Friday 14 August 26"
    assert r.pdt == "2026-08-14 16:45:31" and r.pdtn is None
    assert r.dn == "Friday" and r.dnm == "August"
    assert r.g == 21 and r.g0 == 7  # worst-case fold depth covers 64-bit
    assert r.l == 12 and r.l0 == 0
    assert r.fact == 2432902008176640000  # 20! — the CH overflow edge
    assert r.idz == 0 and r.mz == 0
    assert r.mx == 5 and r.mn == 3
    assert r.bs == 1 << 56 and r.bs2 == 123456789  # involution
    assert abs(r.qgk - 5.0) < 1e-9


def test_w11_search_url_map(spark):
    r = (
        spark.range(1)
        .select(
            ch_expr("hasSubsequence", F.lit("hello world"), "hwd").alias(
                "hs"
            ),
            ch_expr("hasSubsequence", F.lit("hello world"), "dwh").alias(
                "hsF"
            ),
            ch_expr(
                "hasSubstr",
                F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4)),
                F.array(F.lit(2), F.lit(3)),
            ).alias("hsub"),
            ch_expr(
                "hasSubstr",
                F.array(F.lit(1), F.lit(2), F.lit(3)),
                F.array(F.lit(3), F.lit(2)),
            ).alias("hsubF"),
            ch_expr(
                "hasToken", F.lit("a quick_brown fox"), "quick_brown"
            ).alias("ht"),
            ch_expr("hasToken", F.lit("aquickb"), "quick").alias("htF"),
            ch_expr(
                "extractURLParameterNames",
                F.lit("http://e.com/p?a=1&bb=2#f"),
            ).alias("names"),
            ch_expr(
                "extractURLParameters", F.lit("http://e.com/p?a=1&bb=2")
            ).alias("params"),
            ch_expr(
                "cutURLParameter",
                F.lit("http://e.com/p?a=1&bb=2&c=3#f"),
                "bb",
            ).alias("cut1"),
            ch_expr(
                "cutURLParameter", F.lit("http://e.com/p?bb=2"), "bb"
            ).alias("cut2"),
            ch_expr("port", F.lit("https://e.com:8443/p")).alias("port"),
            ch_expr("port", F.lit("https://e.com/p")).alias("port0"),
            ch_expr("netloc", F.lit("https://u:p@e.com:8443/p?q")).alias(
                "nl"
            ),
            ch_expr(
                "mapContainsKeyLike",
                F.create_map(
                    F.lit("abc"), F.lit(1), F.lit("xy"), F.lit(2)
                ),
                "a%",
            ).alias("mckl"),
            ch_expr(
                "mapExtractKeyLike",
                F.create_map(
                    F.lit("abc"), F.lit(1), F.lit("xy"), F.lit(2)
                ),
                "_y",
            ).alias("mekl"),
            ch_expr(
                "mapExists",
                lambda k, v: v > 1,
                F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)),
            ).alias("me"),
            ch_expr(
                "mapAll",
                lambda k, v: v > 0,
                F.create_map(F.lit("a"), F.lit(1)),
            ).alias("ma"),
        )
        .collect()[0]
    )
    assert r.hs is True and r.hsF is False
    assert r.hsub is True and r.hsubF is False
    assert r.ht is True and r.htF is False
    assert r.names == ["a", "bb"] and r.params == ["a=1", "bb=2"]
    assert r.cut1 == "http://e.com/p?a=1&c=3#f"
    assert r.cut2 == "http://e.com/p"
    assert r.port == 8443 and r.port0 == 0
    assert r.nl == "u:p@e.com:8443"
    assert r.mckl is True and dict(r.mekl) == {"xy": 2}
    assert r.me is True and r.ma is True


def test_w11_tokens_ngrams_groups(spark):
    r = (
        spark.range(1)
        .select(
            ch_expr("tokens", F.lit("a_b 12,cd!")).alias("t"),
            ch_expr("ngrams", F.lit("abcd"), 3).alias("n"),
            # the short-string guard: sequence(1,0) would DESCEND
            ch_expr("ngrams", F.lit("ab"), 3).alias("n0"),
            ch_expr(
                "extractAllGroupsVertical",
                F.lit("k1=v1, k2=v2"),
                r"(\w+)=(\w+)",
            ).alias("gv"),
        )
        .collect()[0]
    )
    assert r.t == ["a", "b", "12", "cd"]  # '_' separates, per CH docs
    assert r.n == ["abc", "bcd"] and r.n0 == []
    assert r.gv == [["k1", "v1"], ["k2", "v2"]]


def test_w11_jaccard_quote_buckets(spark):
    r = (
        spark.range(1)
        .select(
            ch_expr(
                "stringJaccardIndex", F.lit("abc"), F.lit("bcd")
            ).alias("j"),
            ch_expr("stringJaccardIndex", F.lit(""), F.lit("")).alias(
                "j0"
            ),
            ch_expr("regexpQuoteMeta", F.lit("a.b*c")).alias("q"),
            ch_expr("roundDuration", F.lit(250)).alias("rd"),
            ch_expr("roundDuration", F.lit(0)).alias("rd0"),
            ch_expr("roundAge", F.lit(42)).alias("ra"),
            ch_expr("roundAge", F.lit(12)).alias("ra2"),
            ch_expr("translateUTF8", F.lit("abc"), "ab", "xy").alias(
                "tr"
            ),
        )
        .collect()[0]
    )
    assert abs(r.j - 0.5) < 1e-12  # {b,c} over {a,b,c,d}
    assert r.j0 == 0.0
    assert r.q == r"a\.b\*c"
    assert r.rd == 240 and r.rd0 == 0  # legacy Metrica buckets
    assert r.ra == 35 and r.ra2 == 17
    assert r.tr == "xyc"


def test_w11_morton_roundtrip(spark):
    def spread(x):
        r = 0
        for i in range(32):
            r |= ((x >> i) & 1) << (2 * i)
        return r

    r = (
        spark.range(1)
        .select(
            ch_expr("mortonEncode", F.lit(5), F.lit(3)).alias("m"),
            ch_expr(
                "mortonDecode",
                ch_expr("mortonEncode", F.lit(123456), F.lit(987654)),
            ).alias("d"),
            ch_expr(
                "mortonDecode",
                ch_expr(
                    "mortonEncode",
                    F.lit(0xFFFFFFFF),
                    F.lit(0xFFFFFFFF),
                ),
            ).alias("dmax"),  # y's top bit lands on bit 63 (sign)
            ch_expr("mortonEncode", F.lit(0), F.lit(1)).alias("m01"),
        )
        .collect()[0]
    )
    assert r.m == (spread(5) | (spread(3) << 1))
    assert (r.d.x, r.d.y) == (123456, 987654)
    assert (r.dmax.x, r.dmax.y) == (0xFFFFFFFF, 0xFFFFFFFF)
    assert r.m01 == 2  # y occupies the odd bit positions


def test_w11_string_distance_kernels(spark):
    """Hand-checked classics + the two conventions that make the
    kernels DuckDB-bit-exact: integer-halved Jaro transpositions and
    the 0.7 Jaro-Winkler boost threshold. Full (not OSA) Damerau:
    DL('CA','ABC') = 2."""
    r = (
        spark.range(1)
        .select(
            ch_expr(
                "jaroSimilarity", F.lit("MARTHA"), F.lit("MARHTA")
            ).alias("j"),
            ch_expr(
                "jaroWinklerSimilarity", F.lit("MARTHA"), F.lit("MARHTA")
            ).alias("jw"),
            ch_expr(
                "jaroWinklerSimilarity", F.lit("abcdxx"), F.lit("xaybzc")
            ).alias("jw_low"),
            ch_expr("jaroSimilarity", F.lit("abcdxx"), F.lit("xaybzc"))
            .alias("j_low"),
            ch_expr(
                "damerauLevenshteinDistance", F.lit("CA"), F.lit("ABC")
            ).alias("dl_full"),
            ch_expr(
                "damerauLevenshteinDistance", F.lit("ab"), F.lit("ba")
            ).alias("dl_swap"),
            ch_expr("jaroSimilarity", F.lit(""), F.lit("")).alias("j00"),
            ch_expr("jaroSimilarity", F.lit("x"), F.lit("")).alias("j10"),
        )
        .collect()[0]
    )
    assert abs(r.j - 0.9444444444444445) < 1e-15
    assert abs(r.jw - 0.9611111111111111) < 1e-15
    assert r.jw_low == r.j_low  # below 0.7: no prefix boost
    assert r.dl_full == 2 and r.dl_swap == 1
    # standard convention (delta vs DuckDB's 0.0 for both-empty is
    # documented; oracled queries keep empties out)
    assert r.j00 == 1.0 and r.j10 == 0.0


def test_w11_multisearch_variants(spark):
    needles = F.array(F.lit("xy"), F.lit("lo"), F.lit("el"))
    r = (
        spark.range(1)
        .select(
            ch_expr(
                "multiSearchAllPositions", F.lit("hello"), needles
            ).alias("ap"),
            ch_expr("multiSearchAny", F.lit("hello"), needles).alias(
                "any"
            ),
            ch_expr("multiSearchFirstIndex", F.lit("hello"), needles)
            .alias("fi"),
            ch_expr(
                "multiSearchFirstPosition", F.lit("hello"), needles
            ).alias("fp"),
            ch_expr("multiSearchFirstIndex", F.lit("zzz"), needles)
            .alias("fi0"),
            ch_expr(
                "extractAllGroupsHorizontal",
                F.lit("k1=v1, k2=v2"),
                r"(\w+)=(\w+)",
            ).alias("gh"),
        )
        .collect()[0]
    )
    assert r.ap == [0, 4, 2]  # 1-based, 0 = absent
    assert r.any is True
    assert r.fi == 2  # first matching needle in needle order
    assert r.fp == 2  # leftmost occurrence across needles
    assert r.fi0 == 0
    assert r.gh == [["k1", "k2"], ["v1", "v2"]]  # per-group arrays


def test_w11_iso_uuid_relative(spark):
    r = (
        spark.range(1)
        .select(
            # 2027-01-01 is a Friday in ISO week 53 of 2026;
            # 2024-12-30 is the Monday of ISO 2025 week 1
            ch_expr("toISOYear", F.lit("2027-01-01").cast("date")).alias(
                "iy1"
            ),
            ch_expr("toISOYear", F.lit("2024-12-30").cast("date")).alias(
                "iy2"
            ),
            ch_expr(
                "toStartOfISOYear", F.lit("2026-08-14").cast("date")
            ).cast("string").alias("sy"),
            ch_expr(
                "toUUID", F.lit("61F0C404-5CB3-11E7-907B-A6006AD3DBA0")
            ).alias("u"),
            ch_expr("toUUIDOrNull", F.lit("nope")).alias("un"),
            ch_expr("toUUIDOrZero", F.lit("nope")).alias("uz"),
            ch_expr("tryBase64Decode", F.lit("aGk=")).alias("b"),
            ch_expr(
                "toRelativeMonthNum", F.lit("1970-02-01").cast("date")
            ).alias("rm"),
            ch_expr(
                "toRelativeDayNum", F.lit("1970-01-03").cast("date")
            ).alias("rd"),
            # Monday boundary: Jan 5 1970 begins relative week 1
            ch_expr(
                "toRelativeWeekNum",
                F.lit("1970-01-05").cast("timestamp"),
            ).alias("rw"),
            ch_expr(
                "toRelativeWeekNum",
                F.lit("1970-01-04").cast("timestamp"),
            ).alias("rw0"),
            ch_expr(
                "toRelativeSecondNum",
                F.lit("1970-01-01 00:01:40").cast("timestamp"),
            ).alias("rs"),
        )
        .collect()[0]
    )
    assert r.iy1 == 2026 and r.iy2 == 2025
    assert r.sy == "2025-12-29"  # ISO 2026 starts Monday Dec 29 2025
    assert r.u == "61f0c404-5cb3-11e7-907b-a6006ad3dba0"
    assert r.un is None
    assert r.uz == "00000000-0000-0000-0000-000000000000"
    assert r.b == "hi"
    assert r.rm == 1970 * 12 + 1 and r.rd == 2
    assert (r.rw, r.rw0) == (1, 0)
    assert r.rs == 100


def test_w11_review_fixes(spark):
    """Code-review regressions: exact 64-bit lcm/intDiv (the double
    round-trip corrupted values above 2^53), negative array shifts
    dispatch to the opposite direction, reserved Java punctuation is
    quoted in datetime formats, regexpQuoteMeta matches CH's set
    ('{' and ':' escaped, '}' not), and the normalize rewrite still
    produces the same values."""
    big = (1 << 62) - 1
    r = (
        spark.range(1)
        .select(
            ch_expr("lcm", F.lit(big), F.lit(2)).alias("lcm_big"),
            ch_expr("intDiv", F.lit(big), F.lit(1)).alias("idiv_big"),
            ch_expr(
                "intDivOrZero", F.lit(big), F.lit(1)
            ).alias("idz_big"),
            ch_expr(
                "arrayShiftLeft",
                F.array(F.lit(1), F.lit(2), F.lit(3)),
                -1,
                F.lit(9),
            ).alias("neg_shift"),
            ch_expr(
                "formatDateTime",
                F.lit("2026-08-14 10:00:00").cast("timestamp"),
                "%Y[%m]#%d",
            ).alias("fmt_brackets"),
            ch_expr("regexpQuoteMeta", F.lit("a:b}c{d")).alias("qm"),
            ch_expr("L2Normalize", F.array(F.lit(3.0), F.lit(4.0))).alias(
                "l2n"
            ),
        )
        .collect()[0]
    )
    assert r.lcm_big == 2 * big  # 9223372036854775806, exact
    assert r.idiv_big == big and r.idz_big == big
    assert r.neg_shift == [9, 1, 2]  # left by -1 == right by 1
    assert r.fmt_brackets == "2026[08]#14"
    assert r.qm == "a\\:b}c\\{d"
    assert r.l2n == [0.6, 0.8]
