"""Round-7 wave 9: translation-table audit fill-ins + the audit itself.

The audit (tools/ch_function_audit.py over functions/ch_catalog.py) is
the machine-readable answer to "which documented ClickHouse functions
does the rebuild cover, and why not the rest" — the test pins its two
invariants: zero unclassified names (every catalog addition must be
consciously classified) and catalog ⊇ translation table (the audit
cannot silently miss a mapped name).
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import ch_expr


def test_w9_audit_invariants():
    from tools.ch_function_audit import audit

    result = audit()
    s = result["summary"]
    assert s["unclassified"] == 0, [
        n for n, r in result["functions"].items()
        if r["status"] == "UNCLASSIFIED"
    ]
    assert s["table_not_in_catalog"] == []
    # every unsupported entry carries a non-empty reason
    assert all(
        r.get("reason")
        for r in result["functions"].values()
        if r["status"] == "unsupported"
    )


def test_w9_coverage_file_is_current():
    """CH_FUNCTION_COVERAGE.json at the repo root must match a fresh
    audit — regenerating is one command, a stale file misleads."""
    import json
    import os

    from tools.ch_function_audit import ROOT, audit

    with open(os.path.join(ROOT, "CH_FUNCTION_COVERAGE.json")) as fh:
        committed = json.load(fh)
    assert committed == json.loads(json.dumps(audit())), (
        "run: python tools/ch_function_audit.py"
    )


def test_w9_date_and_numeric_builders(spark):
    d = F.lit("2026-08-14").cast("date")
    arr = F.array(F.lit(0.0), F.lit(10.0), F.lit(50.0))
    r = (
        spark.range(1)
        .select(
            ch_expr("addWeeks", d, F.lit(2)).alias("aw"),
            ch_expr("subtractWeeks", d, F.lit(2)).alias("sw"),
            ch_expr("trunc", F.lit(-2.789), 1).alias("tr"),
            ch_expr("intExp10", F.lit(3)).alias("e10"),
            ch_expr("roundToExp2", F.lit(100)).alias("r2"),
            ch_expr("roundToExp2", F.lit(0.5)).alias("r2z"),
            ch_expr("roundDown", F.lit(33.0), arr).alias("rd"),
            ch_expr("roundDown", F.lit(-5.0), arr).alias("rdlo"),
            ch_expr("leftPadUTF8", F.lit("ab"), 4, F.lit("*")).alias("lp"),
            ch_expr("toDecimal64", F.lit("12.345"), 2).alias("dec"),
            ch_expr(
                "toUnixTimestamp64Milli",
                F.lit("2024-01-01 00:00:01.5").cast("timestamp"),
            ).alias("ms"),
            ch_expr("fromUnixTimestamp64Milli", F.lit(1500)).alias("fms"),
            ch_expr("isNotDistinctFrom", F.lit(None).cast("int"),
                    F.lit(None).cast("int")).alias("nd"),
            ch_expr("formatReadableDecimalSize", F.lit(1536)).alias("ds"),
            ch_expr("formatReadableQuantity", F.lit(1234567)).alias("q"),
            ch_expr("formatReadableQuantity", F.lit(42)).alias("q0"),
        )
        .head()
    )
    assert r.aw == dt.date(2026, 8, 28)
    assert r.sw == dt.date(2026, 7, 31)
    assert abs(r.tr - (-2.7)) < 1e-12
    assert r.e10 == 1000
    assert r.r2 == 64 and r.r2z == 0
    assert r.rd == 10.0
    assert r.rdlo == 0.0  # below every bucket → first element
    assert r.lp == "**ab"
    assert str(r.dec) == "12.35"
    assert r.ms == 1704067201500
    assert str(r.fms).startswith("1970-01-01 00:00:01.5")
    assert r.nd is True
    assert r.ds == "1.54 KB"
    assert r.q == "1.23 million" and r.q0 == "42.00"


def test_w9b_scalar_builders(spark):
    url = F.lit("https://www.example.org/a/b?k=v&x=1#frag")
    r = (
        spark.range(1)
        .select(
            ch_expr("positiveModulo", F.lit(-7), F.lit(3)).alias("pm"),
            ch_expr("makeDate", F.lit(2026), F.lit(8), F.lit(14)).alias("md"),
            ch_expr(
                "makeDateTime", F.lit(2026), F.lit(8), F.lit(14),
                F.lit(10), F.lit(30), F.lit(0),
            ).alias("mdt"),
            ch_expr(
                "monthsBetween",
                F.lit("2026-08-14").cast("date"),
                F.lit("2026-05-14").cast("date"),
            ).alias("mb"),
            ch_expr(
                "width_bucket", F.lit(5.5), F.lit(0.0), F.lit(10.0), F.lit(5)
            ).alias("wb"),
            ch_expr("JSONArrayLength", F.lit("[1,2,3]")).alias("jal"),
            ch_expr(
                "arrayUnion",
                F.array(F.lit(1), F.lit(2)),
                F.array(F.lit(2), F.lit(3)),
            ).alias("au"),
            ch_expr("clamp", F.lit(15), F.lit(0), F.lit(10)).alias("cl"),
            ch_expr("domainWithoutWWW", url).alias("dw"),
            ch_expr("cutWWW", url).alias("cw"),
            ch_expr("pathFull", url).alias("pf"),
            ch_expr("queryStringAndFragment", url).alias("qf"),
            ch_expr("isIPv4String", F.lit("192.168.0.1")).alias("ip4"),
            ch_expr("isIPv4String", F.lit("999.1.1.1")).alias("ip4bad"),
            ch_expr("isIPv6String", F.lit("2001:db8::1")).alias("ip6"),
            ch_expr("firstLine", F.lit("a\nb\nc")).alias("fl"),
            ch_expr(
                "appendTrailingCharIfAbsent", F.lit("dir"), "/"
            ).alias("ap"),
            ch_expr(
                "appendTrailingCharIfAbsent", F.lit("dir/"), "/"
            ).alias("ap2"),
            ch_expr("toBool", F.lit(1)).alias("tb"),
            ch_expr(
                "dateSub", "DAY", F.lit(3),
                F.lit("2026-08-14 00:00:00").cast("timestamp"),
            ).alias("dsub"),
            ch_expr(
                "date_trunc", "month",
                F.lit("2026-08-14 10:30:00").cast("timestamp"),
            ).alias("dt"),
            ch_expr(
                "toYYYYMMDDhhmmss",
                F.lit("2026-08-14 10:30:05").cast("timestamp"),
            ).alias("ymd"),
            ch_expr(
                "toLastDayOfWeek", F.lit("2026-08-14").cast("date")
            ).alias("ldw"),
            ch_expr(
                "toLastDayOfWeek", F.lit("2026-08-16").cast("date")
            ).alias("ldws"),
            ch_expr("SHA1", F.lit("abc")).alias("s1"),
            ch_expr("SHA512", F.lit("abc")).alias("s512"),
            ch_expr(
                "accurateCastOrDefault", F.lit("12x"), "int", F.lit(-1)
            ).alias("acd"),
        )
        .head()
    )
    assert r.pm == 2
    assert r.md == dt.date(2026, 8, 14)
    assert r.mdt == dt.datetime(2026, 8, 14, 10, 30, 0)
    assert r.mb == 3.0
    assert r.wb == 3
    assert r.jal == 3
    assert r.au == [1, 2, 3]
    assert r.cl == 10
    assert r.dw == "example.org"
    assert r.cw == "https://example.org/a/b?k=v&x=1#frag"
    assert r.pf == "/a/b?k=v&x=1"
    assert r.qf == "k=v&x=1#frag"
    assert r.ip4 is True and r.ip4bad is False and r.ip6 is True
    assert r.fl == "a"
    assert r.ap == "dir/" and r.ap2 == "dir/"
    assert r.tb is True
    assert r.dsub == dt.datetime(2026, 8, 11, 0, 0, 0)
    assert r.dt == dt.datetime(2026, 8, 1, 0, 0, 0)
    assert r.ymd == 20260814103005
    # 2026-08-14 is a Friday; week ends Sunday 2026-08-16 (idempotent)
    assert r.ldw == dt.date(2026, 8, 16)
    assert r.ldws == dt.date(2026, 8, 16)
    assert r.s1 == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert len(r.s512) == 128
    assert r.acd == -1
