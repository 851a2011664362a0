"""r13 band-3 promotions: block-local semantics (neighbor /
runningConcurrency / runningDifference-SWF over a deterministic
single-batch frame), reinterpret byte reuse, normalizeQuery rendering,
isConstant's ColumnNode fold walk, defaultValueOfTypeName typing, the
file() sandbox escape guard, and fingerprint NBC membership."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from clickhouse_objects_analysis_spark.functions.ch import (
    NON_BIT_COMPATIBLE,
    _normalize_query_text,
    ch_expr,
    set_macros,
)


def _block_frame(spark):
    return (
        spark.createDataFrame(
            [(float(i), float(i + 3)) for i in (1, 2, 5, 9, 10)],
            ["b", "e"],
        )
        .repartition(1)
        .sortWithinPartitions("b")
    )


def test_block_local_functions(spark):
    rows = (
        _block_frame(spark)
        .select(
            "b",
            ch_expr("neighbor", F.col("b"), 1, -1.0).alias("nb"),
            ch_expr("neighbor", F.col("b"), -1).alias("prev"),
            ch_expr(
                "runningDifferenceStartingWithFirstValue", F.col("b")
            ).alias("rd"),
            ch_expr("runningConcurrency", F.col("b"), F.col("e")).alias(
                "rc"
            ),
        )
        .collect()
    )
    assert [r["nb"] for r in rows] == [2.0, 5.0, 9.0, 10.0, -1.0]
    assert [r["prev"] for r in rows] == [None, 1.0, 2.0, 5.0, 9.0]
    # first row = its own value (runningDifference would give 0)
    assert [r["rd"] for r in rows] == [1.0, 1.0, 3.0, 4.0, 1.0]
    # intervals [1,4) [2,5) [5,8) [9,12) [10,13): concurrency at each
    # begin = intervals already open (incl. self)
    assert [r["rc"] for r in rows] == [1, 2, 1, 1, 2]


def test_reinterpret_byte_reuse(spark):
    row = (
        spark.range(1)
        .select(
            ch_expr("reinterpret", F.lit(1069547520), "Float32").alias("f"),
            ch_expr("reinterpret", F.lit("abc"), "UInt32").alias("u"),
            ch_expr("reinterpret", F.lit(0x41), "String").alias("s"),
        )
        .first()
    )
    assert row["f"] == 1.5  # 0x3FC00000 = 1.5f
    assert row["u"] == 0x636261  # 'abc' little-endian
    assert row["s"] == "A"
    with pytest.raises(ValueError):
        ch_expr("reinterpret", F.lit(1), "Array(Int64)")


def test_normalize_query_rendering():
    assert (
        _normalize_query_text("SELECT 'x', 42, id FROM t WHERE a IN (1, 2, 3)")
        == "SELECT ?.., id FROM t WHERE a IN (?..)"
    )
    assert _normalize_query_text("SELECT col1\n  FROM t WHERE x = 5") == (
        "SELECT col1 FROM t WHERE x = ?"
    )
    # numbers inside identifiers survive
    assert "col1" in _normalize_query_text("SELECT col1 FROM t1")


def test_is_constant_fold_walk(spark):
    row = (
        spark.range(1)
        .select(
            ch_expr("isConstant", F.lit(5)).alias("lit"),
            ch_expr("isConstant", F.lit(2) + F.lit(3)).alias("expr"),
            ch_expr("isConstant", F.col("id")).alias("col"),
            ch_expr("isConstant", F.rand()).alias("rand"),
            ch_expr("isConstant", F.col("id") + 1).alias("mixed"),
        )
        .first()
    )
    assert (row["lit"], row["expr"], row["col"], row["rand"], row["mixed"]) \
        == (1, 1, 0, 0, 0)


def test_default_value_of_type_name(spark):
    row = (
        spark.range(1)
        .select(
            ch_expr("defaultValueOfTypeName", "Int32").alias("i"),
            ch_expr("defaultValueOfTypeName", "Float64").alias("f"),
            ch_expr("defaultValueOfTypeName", "String").alias("s"),
            ch_expr("defaultValueOfTypeName", "Date").alias("d"),
            ch_expr("defaultValueOfTypeName", "Nullable(Int64)").alias("n"),
            ch_expr("defaultValueOfTypeName", "Array(Int64)").alias("a"),
        )
        .first()
    )
    assert row["i"] == 0 and row["f"] == 0.0 and row["s"] == ""
    assert str(row["d"]) == "1970-01-01"
    assert row["n"] is None and row["a"] == []


def test_file_sandbox_escape_refused(spark):
    with pytest.raises(ValueError):
        ch_expr("file", "../../../etc/passwd")
    with pytest.raises(ValueError):
        ch_expr("file", "/etc/passwd")


def test_macro_and_setting_errors(spark):
    set_macros({"a": "1"})
    assert ch_expr("getMacro", "a") is not None
    with pytest.raises(KeyError):
        ch_expr("getMacro", "missing_macro")
    with pytest.raises(KeyError):
        ch_expr("getSetting", "no.such.setting.key")


def test_band3_nbc_membership():
    for name in (
        "normalizeQuery", "normalizedQueryHash", "ngramMinHash",
        "wordShingleMinHash", "ngramSimHash", "wordShingleSimHash",
        "quantileTDigestWeighted", "quantileBFloat16",
    ):
        assert name in NON_BIT_COMPATIBLE, name


def test_quantile_bfloat16_truncates(spark):
    # 1.001 truncates to 1.0 in bfloat16 (8-bit mantissa); the median
    # over {1.001, 1.001, 1.001} must be the truncated value
    df = spark.createDataFrame([(1.001,)] * 3, ["x"])
    got = df.groupBy().agg(
        ch_expr("quantileBFloat16", F.col("x"), 0.5).alias("q")
    ).first()["q"]
    assert got == 1.0


def test_replicate_and_visible_width(spark):
    row = (
        spark.range(1)
        .select(
            ch_expr("replicate", F.lit(7), F.array(F.lit(1), F.lit(2), F.lit(3))).alias("r"),
            ch_expr("visibleWidth", F.lit(None).cast("int")).alias("vn"),
            ch_expr("visibleWidth", F.lit("hello")).alias("vs"),
            ch_expr("visibleWidth", F.lit(12345)).alias("vi"),
        )
        .first()
    )
    assert row["r"] == [7, 7, 7]
    assert (row["vn"], row["vs"], row["vi"]) == (4, 5, 5)


def test_band4_surfaces(spark):
    row = (
        spark.range(1)
        .select(
            ch_expr(
                "arrayReduceInRanges", "max",
                F.array(F.struct(F.lit(1).alias("start"),
                                 F.lit(3).alias("length"))),
                F.array(F.lit(5.0), F.lit(9.0), F.lit(2.0), F.lit(99.0)),
            ).alias("arr"),
            ch_expr(
                "formatQuerySingleLine",
                F.lit("SELECT  a ,\n  b /* c */ FROM t"),
            ).alias("fq"),
            ch_expr(
                "structureToProtobufSchema", "id UInt64, name String"
            ).alias("proto"),
            ch_expr("detectProgrammingLanguage",
                    F.lit("fn main() { let mut x = 1; }")).alias("dpl"),
            ch_expr("multiFuzzyMatchAny", F.lit("hello wrold"), 2,
                    ["world"]).alias("mf2"),
            ch_expr("multiFuzzyMatchAny", F.lit("hello wrold"), 1,
                    ["world"]).alias("mf1"),
        )
        .first()
    )
    assert row["arr"] == [9.0]
    assert row["fq"] == "SELECT a , b FROM t"
    assert "uint64 id = 1;" in row["proto"]
    assert row["dpl"] == "Rust"
    assert (row["mf2"], row["mf1"]) == (1, 0)  # transposition = 2 edits


def test_band4_errors_and_nbc(spark):
    with pytest.raises(ValueError):
        ch_expr("structureToCapnProtoSchema", "x UnsupportedType")
    for name in ("formatQuery", "detectTonality", "multiFuzzyMatchAny",
                 "buildId", "detectLanguageMixed"):
        assert name in NON_BIT_COMPATIBLE, name
