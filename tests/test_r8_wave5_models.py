"""Round-8 wave-5 behavior tests: base58 encode against the reference
algorithm and decode∘encode round-trip, plus the feature-hash packing
invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import ch_expr

_A = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _ref_b58(s: str) -> str:
    v = int.from_bytes(s.encode(), "big")
    out = ""
    while v:
        out = _A[v % 58] + out
        v //= 58
    return out


def test_base58_encode_matches_reference(spark):
    probes = ["a", "ab", "click", "purchase", "Zz9", "12345678", "", "~"]
    df = spark.createDataFrame([(p,) for p in probes], "s string")
    rows = df.select(
        "s", ch_expr("base58Encode", F.col("s")).alias("e")
    ).collect()
    got = {r["s"]: r["e"] for r in rows}
    for p in probes:
        assert got[p] == _ref_b58(p), (p, got[p], _ref_b58(p))


def test_base58_round_trip(spark):
    probes = ["a", "ab", "abc", "click", "purchase", "XyZ42", "12345678"]
    df = spark.createDataFrame([(p,) for p in probes], "s string")
    rows = df.select(
        "s",
        ch_expr(
            "base58Decode", ch_expr("base58Encode", F.col("s"))
        ).alias("rt"),
    ).collect()
    assert all(r["rt"] == r["s"] for r in rows), rows


def test_base58_length_bound_nulls(spark):
    df = spark.createDataFrame([("123456789",)], "s string")  # 9 bytes
    r = df.select(ch_expr("base58Encode", F.col("s")).alias("e")).collect()
    assert r[0]["e"] is None  # documented shim bound, not silent garbage


def test_days_since_year_zero_doc_anchor(spark):
    # anchor via the MySQL TO_DAYS convention the CH function mirrors:
    # TO_DAYS('2023-09-08') = 739136 (366-day year zero + 738770
    # proleptic-Gregorian days from 0001-01-01)
    df = spark.createDataFrame([("2023-09-08",)], "d string")
    r = df.select(
        ch_expr("toDaysSinceYearZero", F.col("d").cast("date")).alias("n"),
        ch_expr(
            "fromDaysSinceYearZero",
            ch_expr("toDaysSinceYearZero", F.col("d").cast("date")),
        )
        .cast("string")
        .alias("rt"),
    ).collect()[0]
    assert r["n"] == 739136
    assert r["rt"] == "2023-09-08"
