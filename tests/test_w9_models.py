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
