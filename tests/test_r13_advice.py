"""r13 advice fixes (r12 VERDICT ADVICE.md): simpleJSONExtractRaw's
first-occurrence any-depth raw scan, JSONType's simdjson out-of-range
integer→Double tagging, exact-integer timestamp flooring (pre-1970),
and _driver_union_find's source-typed output schema."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import (
    _simple_json_raw_scan,
    ch_expr,
)
from clickhouse_objects_analysis_spark.operators.dedup import (
    connected_components_auto,
)


def test_simple_json_raw_scan_semantics():
    # first occurrence wins, at ANY nesting depth — NOT path navigation
    doc = '{"outer":{"k":{"a":1}},"k":"top"}'
    assert _simple_json_raw_scan(doc, "k") == '{"a":1}'
    # raw slice preserved verbatim (whitespace kept, no re-serialize)
    doc2 = '{"k": [1,  2 , 3]}'
    assert _simple_json_raw_scan(doc2, "k") == "[1,  2 , 3]"
    # string values keep their quotes; scalars read to the separator
    assert _simple_json_raw_scan('{"k":"v","x":1}', "k") == '"v"'
    assert _simple_json_raw_scan('{"x":{"k":-2.5},"y":0}', "k") == "-2.5"
    # escaped quote inside the string value
    assert _simple_json_raw_scan(r'{"k":"a\"b"}', "k") == r'"a\"b"'
    # quoted occurrence of the name INSIDE a value is skipped (no colon)
    assert _simple_json_raw_scan('{"s":"see \\"k\\" here","k":7}', "k") == "7"
    # missing key → the simpleJSON empty-result convention
    assert _simple_json_raw_scan('{"a":1}', "k") == ""


def test_simple_json_extract_raw_column(spark):
    out = (
        spark.createDataFrame(
            [('{"outer":{"k":{"King": 1}},"k":"top"}',), (None,)], ["j"]
        )
        .select(ch_expr("simpleJSONExtractRaw", F.col("j"), "k").alias("r"))
        .collect()
    )
    assert out[0]["r"] == '{"King": 1}'
    assert out[1]["r"] is None


def test_json_type_out_of_range_ints(spark):
    big = str(1 << 64)            # 2^64 → Double (simdjson fallback)
    neg = str(-(1 << 63) - 1)     # < -2^63 → Double
    u64 = str((1 << 64) - 1)      # [2^63, 2^64) → UInt64
    doc = f'{{"a":{big},"b":{neg},"c":{u64},"d":-9223372036854775808}}'
    row = (
        spark.createDataFrame([(doc,)], ["j"])
        .select(
            *[
                ch_expr("JSONType", F.col("j"), k).alias(k)
                for k in ("a", "b", "c", "d")
            ]
        )
        .first()
    )
    assert (row["a"], row["b"], row["c"], row["d"]) == (
        "Double", "Double", "UInt64", "Int64",
    )


def test_parse_datetime64_pre1970_floors_down(spark):
    # truncation toward zero would round pre-1970 fractional seconds UP
    row = (
        spark.range(1)
        .select(
            ch_expr(
                "parseDateTime64BestEffort",
                F.lit("1969-12-31 23:59:59.789"),
                0,
            ).alias("t")
        )
        .first()
    )
    assert row["t"] == datetime.datetime(1969, 12, 31, 23, 59, 59)


def test_driver_union_find_preserves_string_ids(spark):
    e = spark.createDataFrame(
        [("docA", "docB"), ("docB", "docC"), ("x", "y")], ["src", "dst"]
    )
    out = connected_components_auto(e)
    assert dict(out.dtypes) == {"node": "string", "component": "string"}
    comp = {r["node"]: r["component"] for r in out.collect()}
    assert comp["docA"] == comp["docB"] == comp["docC"] == "docA"
    assert comp["x"] == comp["y"] == "x"
