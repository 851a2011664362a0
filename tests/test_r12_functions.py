"""r12 unsupported-tail promotions (functions/ch.py): CRC32IEEE/CRC64,
the IPv6 conversion family, typed/raw JSON extraction (incl. the typed
generic JSONExtract with the CH-type→Spark-schema mapping), bitSlice,
byteSize, convertCharset, currentDatabase/currentUser. Kernel-level
ground truth: bit-level reference CRCs computed inline, the published
ClickHouse docs examples (cutIPv6, bitSlice), and the stdlib ipaddress
module for RFC 4291/5952 address math."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import (
    _ch_type_to_spark,
    _json_coerce,
    _json_nav,
    _JSON_MISSING,
    ch_expr,
)


def _crc_ref(data: bytes, poly: int, width: int) -> int:
    """Bit-by-bit reflected CRC, init 0, no final xor — the independent
    reference the table kernels are checked against."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
    return crc & ((1 << width) - 1)


def test_crc_kernels_end_to_end(spark):
    rows = (
        spark.createDataFrame(
            [("",), ("a",), ("hello",), ("1-URGENT",), ("é",)], ["s"]
        )
        .select(
            "s",
            ch_expr("CRC32IEEE", F.col("s")).alias("c32"),
            ch_expr("CRC64", F.col("s")).alias("c64"),
        )
        .collect()
    )
    for r in rows:
        b = r["s"].encode("utf-8")
        assert r["c32"] == _crc_ref(b, 0xEDB88320, 32), r["s"]
        want64 = _crc_ref(b, 0xC96C5795D7870F42, 64)
        if want64 >= 1 << 63:
            want64 -= 1 << 64
        assert r["c64"] == want64, r["s"]


def test_ipv6_family_end_to_end(spark):
    df = spark.createDataFrame(
        [
            ("2001:0DB8:AC10:FE01:FEED:BABE:CAFE:F00D",),
            ("::1",),
            ("192.168.0.2",),  # dotted-quad input → IPv4-mapped
            ("not-an-ip",),
        ],
        ["s"],
    )
    bin_col = ch_expr("IPv6StringToNum", F.col("s"))
    cidr = ch_expr("IPv6CIDRToRange", bin_col, 32)
    rows = df.select(
        "s",
        ch_expr("IPv6NumToString", bin_col).alias("canon"),
        ch_expr("cutIPv6", bin_col, 2, 2).alias("cut"),
        cidr.getField("lo").alias("lo"),
        cidr.getField("hi").alias("hi"),
    ).collect()
    by = {r["s"]: r for r in rows}
    # canonical RFC 5952 render
    r = by["2001:0DB8:AC10:FE01:FEED:BABE:CAFE:F00D"]
    assert r["canon"] == "2001:db8:ac10:fe01:feed:babe:cafe:f00d"
    # the published docs example: cutting 2 bytes → …cafe:0
    assert r["cut"] == "2001:db8:ac10:fe01:feed:babe:cafe:0"
    assert (r["lo"], r["hi"]) == (
        "2001:db8::",
        "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff",
    )
    # CH's IPv4-mapped dotted-quad render (ipaddress alone would give
    # ::ffff:c0a8:2)
    assert by["192.168.0.2"]["canon"] == "::ffff:192.168.0.2"
    # mapped addresses cut with the IPv4 byte count
    assert by["192.168.0.2"]["cut"] == "::ffff:192.168.0.0"
    assert by["::1"]["canon"] == "::1"
    # invalid input → NULL (CH throws; repo policy)
    assert by["not-an-ip"]["canon"] is None


def test_json_nav_and_coerce_pure():
    doc = '{"a":5,"arr":[1,2,3],"s":"x","obj":{"k":7},"n":null}'
    assert _json_nav(doc, ("a",)) == 5
    assert _json_nav(doc, ("arr", 2)) == 2  # 1-based (CH)
    assert _json_nav(doc, ("arr", -1)) == 3  # negative from the end
    assert _json_nav(doc, ("obj", "k")) == 7
    assert _json_nav(doc, ("missing",)) is _JSON_MISSING
    assert _json_nav(doc, ("arr", 9)) is _JSON_MISSING
    assert _json_nav(doc, ("n",)) is None
    assert _json_nav("{bad", ("a",)) is _JSON_MISSING
    # typed coercion: mismatches → None (pinned deviation: CH would
    # fabricate the type default)
    assert _json_coerce(5, "Int64") == 5
    assert _json_coerce(True, "Int64") == 1
    assert _json_coerce(2.0, "Int64") == 2
    assert _json_coerce(2.5, "Int64") is None
    assert _json_coerce("x", "Int64") is None
    assert _json_coerce([1, 2], "Array(Int64)") == [1, 2]
    assert _json_coerce({"a": 1}, "Map(String, Int64)") == {"a": 1}
    assert _json_coerce("2024-05-01", "Date").isoformat() == "2024-05-01"
    assert _json_coerce(1.5, "Float64") == 1.5
    assert _json_coerce(True, "Bool") is True


def test_ch_type_to_spark_mapping():
    assert _ch_type_to_spark("Int64") == "long"
    assert _ch_type_to_spark("Array(String)") == "array<string>"
    assert _ch_type_to_spark("Nullable(Float32)") == "float"
    assert (
        _ch_type_to_spark("Map(String, Array(Int32))")
        == "map<string,array<int>>"
    )
    with pytest.raises(ValueError, match="unsupported ClickHouse type"):
        _ch_type_to_spark("AggregateFunction(sum, Int64)")


def test_json_extraction_end_to_end(spark):
    doc = '{"a":42,"arr":[10,20,30],"s":"hi","obj":{"x":1,"y":2}}'
    df = spark.createDataFrame([(doc,)], ["j"])
    j = F.col("j")
    r = df.select(
        ch_expr("JSONExtractRaw", j, "arr").alias("raw"),
        ch_expr("JSONExtractRaw", j, "s").alias("raw_s"),
        ch_expr("JSONType", j, "a").alias("jt"),
        ch_expr("JSONExtract", j, "a", "Int64").alias("typed"),
        ch_expr("JSONExtract", j, "arr", "Array(Int64)").alias("tarr"),
        ch_expr("JSONExtract", j, "arr", 2, "Int64").alias("elem2"),
        ch_expr("JSONExtract", j, "obj", "Map(String, Int64)").alias(
            "m"
        ),
        ch_expr("JSONExtractKeysAndValues", j, "obj", "Int64").alias(
            "kv"
        ),
        ch_expr("JSONExtractArrayRaw", j, "arr").alias("arr_raw"),
        ch_expr("JSONExtractKeysAndValuesRaw", j, "obj").alias("kvr"),
    ).first()
    assert r["raw"] == "[10,20,30]"
    assert r["raw_s"] == '"hi"'  # raw keeps the quotes (CH parity)
    assert r["jt"] == "Int64"
    assert r["typed"] == 42
    assert r["tarr"] == [10, 20, 30]
    assert r["elem2"] == 20
    assert r["m"] == {"x": 1, "y": 2}
    assert [(e["key"], e["value"]) for e in r["kv"]] == [
        ("x", 1),
        ("y", 2),
    ]
    assert r["arr_raw"] == ["10", "20", "30"]
    assert [(e["key"], e["value"]) for e in r["kvr"]] == [
        ("x", "1"),
        ("y", "2"),
    ]


def test_json_extract_requires_type_literal():
    # a trailing string that is not a CH type is diagnosed by name
    with pytest.raises(ValueError, match="unsupported ClickHouse type"):
        ch_expr("JSONExtract", F.lit("{}"), "a")
    # and a trailing non-string (int index) fails the literal check
    with pytest.raises(TypeError, match="trailing ClickHouse type"):
        ch_expr("JSONExtract", F.lit("{}"), "a", 2)


def test_bit_slice_end_to_end(spark):
    df = spark.createDataFrame([("Hello",)], ["s"])
    s = F.col("s")
    r = df.select(
        ch_expr("bitSlice", s, 1, 8).cast("string").alias("b1"),
        F.hex(ch_expr("bitSlice", s, 2, 4)).alias("b2"),
        F.hex(ch_expr("bitSlice", s, -16)).alias("btail"),
        F.hex(ch_expr("bitSlice", s, 1, 0)).alias("bempty"),
        F.hex(ch_expr("bitSlice", s, 999, 8)).alias("bpast"),
    ).first()
    assert r["b1"] == "H"  # docs example: first 8 bits
    # bits 2..5 of 'H' (01001000) = 1001, left-aligned → 0x90
    assert r["b2"] == "90"
    assert r["btail"] == "6C6F"  # last 16 bits = 'lo'
    assert r["bempty"] == ""
    assert r["bpast"] == ""


def test_byte_size_end_to_end(spark):
    df = spark.range(1).select(
        F.lit(7).cast("long").alias("l"),
        F.lit("abc").alias("s"),
        F.lit(1.5).alias("d"),
        F.lit(3).cast("int").alias("i"),
    )
    r = df.select(
        ch_expr("byteSize", F.col("l")).alias("bl"),
        ch_expr("byteSize", F.col("s")).alias("bs"),
        ch_expr("byteSize", F.col("l"), F.col("s"), F.col("d"),
                F.col("i")).alias("bm"),
    ).first()
    assert r["bl"] == 8
    assert r["bs"] == 3 + 9
    assert r["bm"] == 8 + 12 + 8 + 4


def test_convert_charset_end_to_end(spark):
    df = spark.createDataFrame([("café",)], ["s"])
    s = F.col("s")
    r = df.select(
        # UTF-8 → ISO-8859-1 bytes: é becomes one byte 0xE9
        F.hex(
            ch_expr("convertCharset", s, "UTF-8", "ISO-8859-1")
        ).alias("lat"),
        # and back: latin1 bytes → UTF-8 string
        ch_expr(
            "convertCharset",
            F.encode(s, "ISO-8859-1"),
            "ISO-8859-1",
            "UTF-8",
        ).alias("round"),
    ).first()
    assert r["lat"] == "636166E9"
    assert r["round"] == "café"


def test_session_introspection(spark):
    r = spark.range(1).select(
        ch_expr("currentDatabase").alias("db"),
        ch_expr("currentUser").alias("u"),
    ).first()
    assert r["db"] == spark.catalog.currentDatabase()
    assert isinstance(r["u"], str) and r["u"]


def test_band2_promotions_end_to_end(spark):
    import datetime as _dt

    df = spark.createDataFrame([("abc",), ("",), ("a",)], ["s"])
    rows = {
        r["s"]: r
        for r in df.select(
            "s", ch_expr("xxHash32", F.col("s")).alias("x")
        ).collect()
    }
    # published xxHash32 seed-0 reference vectors
    assert rows["abc"]["x"] == 0x32D153FF
    assert rows[""]["x"] == 0x02CC5D05
    assert rows["a"]["x"] == 0x550D7456
    r = spark.range(1).select(
        ch_expr(
            "IPv6NumToString", ch_expr("toIPv6", F.lit("192.168.0.2"))
        ).alias("ip"),
        ch_expr("now64", 3).alias("n3"),
        F.current_timestamp().alias("now"),
        ch_expr(
            "parseDateTime64BestEffort",
            F.lit("2024-05-01 12:34:56.789"),
        ).alias("p64"),
    ).first()
    assert r["ip"] == "::ffff:192.168.0.2"
    assert r["n3"] <= r["now"]
    assert r["n3"].microsecond % 1000 == 0
    assert r["p64"] == _dt.datetime(2024, 5, 1, 12, 34, 56, 789000)
