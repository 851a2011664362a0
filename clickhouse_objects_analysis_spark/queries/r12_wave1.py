"""Round-12 wave 1: the mechanically-promotable unsupported-tail
promotions (r11 verdict #1) plus the typed generic ``JSONExtract``
(r11 verdict #4), each exercised end-to-end against a DuckDB oracle.

``ch_r12_function_surface`` covers the 22 promoted names:
currentDatabase / currentUser, CRC32IEEE / CRC64, IPv6NumToString /
IPv6StringToNum / cutIPv6 / IPv6CIDRToRange / toIPv6, JSONExtract
(typed generic incl. Array/Nullable/Map), JSONExtractRaw /
simpleJSONExtractRaw / JSONType / JSONExtractKeysAndValues /
JSONExtractKeysAndValuesRaw / JSONExtractArrayRaw, bitSlice, byteSize,
convertCharset, xxHash32 (bit-exact seed-0 kernel — the one xxHash
family member whose stored values migrate unchanged), now64,
parseDateTime64BestEffort.

Oracle strategy (the r11 pattern): dynamic values both engines can
derive independently (the JSON document is built from row data and
parsed by each engine's own JSON machinery; DuckDB's json_extract
normalizes to the same compact re-serialization the Spark kernel
emits), and pinned vectors where DuckDB lacks the primitive (CRC,
IPv6 rendering, bit-level slices) — pinned from independent bit-level
reference implementations, not from the Spark code under test.

Reference parity: every promoted name parses as a plain identifier in
the reference grammar (generated_ch_parser/ClickHouseParser.py:15571,
ColumnExprFunctionContext) — real view DDL hits these names long
before the reasoned-out introspection tail.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .r11_wave1 import _rot_col, _rot_sql
from .registry import query, tables

# ---------------------------------------------------------------------------
# pinned vectors — computed with independent bit-level reference
# implementations (reflected-CRC long division; RFC 4291/5952 address
# math via the stdlib ipaddress module + CH's IPv4-mapped dotted render)
# ---------------------------------------------------------------------------

#: o_orderpriority value → (CRC32IEEE, CRC64 two's-complement,
#: hex(bitSlice(pri, 2, 16)), hex(bitSlice(pri, -16)), xxHash32)
_PRI_VEC: dict[str, tuple[int, int, str, str, int]] = {
    "1-URGENT": (
        2348013209, 295165509561074160, "625A", "4E54", 4140778360,
    ),
    "2-HIGH": (
        2520226798, 6036581880652551785, "645A", "4748", 1784200445,
    ),
    "3-MEDIUM": (
        576794448, -5203524834609031503, "665A", "554D", 1398937500,
    ),
    "4-NOT SPECIFIED": (
        1468911083, 5219423196788828439, "685A", "4544", 4027025540,
    ),
    "5-LOW": (
        3237454636, -6137416158806914713, "6A5A", "4F57", 39917018,
    ),
}

#: rotation input → (canonical render, cutIPv6(·,2,2),
#: IPv6CIDRToRange(·,32).lo, .hi)
_IPV6_VEC: list[tuple[str, str, str, str, str]] = [
    (
        "2001:0DB8:AC10:FE01:FEED:BABE:CAFE:F00D",
        "2001:db8:ac10:fe01:feed:babe:cafe:f00d",
        "2001:db8:ac10:fe01:feed:babe:cafe:0",
        "2001:db8::",
        "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff",
    ),
    ("::1", "::1", "::", "::", "::ffff:ffff:ffff:ffff:ffff:ffff"),
    (
        "::ffff:192.168.0.2",
        "::ffff:192.168.0.2",
        "::ffff:192.168.0.0",
        "::",
        "::ffff:ffff:ffff:ffff:ffff:ffff",
    ),
    (
        "fe80::1:9",
        "fe80::1:9",
        "fe80::1:0",
        "fe80::",
        "fe80:0:ffff:ffff:ffff:ffff:ffff:ffff",
    ),
    (
        "2001:db8::8a2e:370:7334",
        "2001:db8::8a2e:370:7334",
        "2001:db8::8a2e:370:0",
        "2001:db8::",
        "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff",
    ),
]


def _pri_case_sql(idx: int, as_type: str = "BIGINT") -> str:
    arms = "\n".join(
        f"WHEN '{p}' THEN {v[idx]!r}" if isinstance(v[idx], str)
        else f"WHEN '{p}' THEN CAST({v[idx]} AS {as_type})"
        for p, v in _PRI_VEC.items()
    )
    return f"CASE pri\n{arms}\nEND"


_JT_CASE = """CASE json_type(j, '$.{path}')
    WHEN 'UBIGINT' THEN 'Int64' WHEN 'BIGINT' THEN 'Int64'
    WHEN 'DOUBLE' THEN 'Double' WHEN 'VARCHAR' THEN 'String'
    WHEN 'BOOLEAN' THEN 'Bool' WHEN 'OBJECT' THEN 'Object'
    WHEN 'ARRAY' THEN 'Array' WHEN 'NULL' THEN 'Null' END"""

_J_SQL = (
    "'{\"a\":' || CAST(k AS VARCHAR) || ',\"arr\":[1,2,' || "
    "CAST(k % 7 AS VARCHAR) || '],\"s\":\"v' || CAST(k % 3 AS VARCHAR) "
    "|| '\",\"neg\":-' || CAST(k + 1 AS VARCHAR) || "
    "',\"f\":1.5,\"obj\":{\"x\":' || CAST(k % 5 AS VARCHAR) || "
    "',\"y\":' || CAST(k % 9 AS VARCHAR) || '}}'"
)


@query(
    "ch_r12_function_surface",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri
        FROM orders WHERE o_orderkey < 60
    ),
    docs AS (
        SELECT k, pri, {_J_SQL} AS j FROM src
    )
    SELECT CAST(k AS BIGINT) AS k,
           'default' AS db,
           TRUE AS usr_ok,
           {_pri_case_sql(0)} AS crc_ieee,
           {_pri_case_sql(1)} AS crc64,
           {_rot_sql('k % 5', [v[1] for v in _IPV6_VEC])} AS ip_canon,
           {_rot_sql('k % 5', [v[2] for v in _IPV6_VEC])} AS ip_cut,
           {_rot_sql('k % 5', [v[3] for v in _IPV6_VEC])} AS cidr_lo,
           {_rot_sql('k % 5', [v[4] for v in _IPV6_VEC])} AS cidr_hi,
           CAST(json_extract(j, '$.arr') AS VARCHAR) AS raw_arr,
           CAST(json_extract(j, '$.obj') AS VARCHAR) AS raw_obj,
           CAST(json_extract(j, '$.s') AS VARCHAR) AS raw_s,
           {_JT_CASE.format(path='a')} AS jt_a,
           {_JT_CASE.format(path='f')} AS jt_f,
           {_JT_CASE.format(path='arr')} AS jt_arr,
           CAST(json_extract(j, '$.a') AS BIGINT) AS typed_a,
           CAST(json_extract(j, '$.neg') AS BIGINT) AS typed_neg,
           json_extract_string(j, '$.s') AS typed_s,
           CAST(json_extract(j, '$.f') AS DOUBLE) AS typed_f,
           TRY_CAST(json_extract_string(j, '$.s') AS BIGINT) AS typed_null,
           CAST(list_sum(CAST(json_extract(j, '$.arr') AS BIGINT[]))
                AS BIGINT) AS arr_sum,
           CAST(k % 7 AS BIGINT) AS arr_elem3,
           CAST(1 AS BIGINT) AS arr_neg3,
           CAST(json_array_length(j, '$.arr') AS BIGINT) AS arr_raw_n,
           'x,y' AS kv_keys,
           CAST(k % 5 + k % 9 AS BIGINT) AS kv_sum,
           CAST(k % 5 AS VARCHAR) || ',' || CAST(k % 9 AS VARCHAR)
               AS kvr_vals,
           CAST(k % 5 AS BIGINT) AS map_x,
           {_pri_case_sql(2)} AS bs_mid,
           {_pri_case_sql(3)} AS bs_tail,
           hex(encode(substring(pri, 1, 3))) AS bs_head,
           CAST(8 AS BIGINT) AS bsz_k,
           CAST(length(pri) + 9 AS BIGINT) AS bsz_pri,
           CAST(length(pri) + 29 AS BIGINT) AS bsz_mix,
           pri || 'é' AS cc_round,
           hex(encode(pri)) || 'E9' AS cc_hex,
           {_pri_case_sql(4)} AS xxh32,
           {_rot_sql('k % 5', [v[1] for v in _IPV6_VEC])} AS ip_to,
           TRUE AS now64_ok,
           TIMESTAMP '2024-05-01 12:34:56.789' AS parse64
    FROM docs ORDER BY k
    """,
)
def ch_r12_function_surface_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r12 unsupported-tail promotions, each exercised end-to-end
    (see module docstring for the oracle strategy per family).

    Scale shape: per-row scalar kernels over one pushed-down filtered
    scan — no joins, no shuffles beyond the final ORDER BY; the Arrow
    kernels (CRC64, IPv6, JSON navigation) batch per-partition."""
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 60)
    k = F.col("o_orderkey").cast("long")
    pri = F.col("o_orderpriority")
    j = F.concat(
        F.lit('{"a":'), k.cast("string"),
        F.lit(',"arr":[1,2,'), (k % 7).cast("string"),
        F.lit('],"s":"v'), (k % 3).cast("string"),
        F.lit('","neg":-'), (k + 1).cast("string"),
        F.lit(',"f":1.5,"obj":{"x":'), (k % 5).cast("string"),
        F.lit(',"y":'), (k % 9).cast("string"), F.lit("}}"),
    )
    ip_bin = ch_expr(
        "IPv6StringToNum", _rot_col(k, [v[0] for v in _IPV6_VEC])
    )
    cidr = ch_expr("IPv6CIDRToRange", ip_bin, 32)
    kv = ch_expr("JSONExtractKeysAndValues", j, "obj", "Int64")
    kvr = ch_expr("JSONExtractKeysAndValuesRaw", j, "obj")
    return o.select(
        k.alias("k"),
        ch_expr("currentDatabase").alias("db"),
        (F.length(ch_expr("currentUser")) > 0).alias("usr_ok"),
        ch_expr("CRC32IEEE", pri).alias("crc_ieee"),
        ch_expr("CRC64", pri).alias("crc64"),
        ch_expr("IPv6NumToString", ip_bin).alias("ip_canon"),
        ch_expr("cutIPv6", ip_bin, 2, 2).alias("ip_cut"),
        cidr.getField("lo").alias("cidr_lo"),
        cidr.getField("hi").alias("cidr_hi"),
        ch_expr("JSONExtractRaw", j, "arr").alias("raw_arr"),
        ch_expr("simpleJSONExtractRaw", j, "obj").alias("raw_obj"),
        ch_expr("JSONExtractRaw", j, "s").alias("raw_s"),
        ch_expr("JSONType", j, "a").alias("jt_a"),
        ch_expr("JSONType", j, "f").alias("jt_f"),
        ch_expr("JSONType", j, "arr").alias("jt_arr"),
        ch_expr("JSONExtract", j, "a", "Int64").alias("typed_a"),
        ch_expr("JSONExtract", j, "neg", "Int64").alias("typed_neg"),
        ch_expr("JSONExtract", j, "s", "String").alias("typed_s"),
        ch_expr("JSONExtract", j, "f", "Float64").alias("typed_f"),
        ch_expr("JSONExtract", j, "s", "Nullable(Int64)").alias(
            "typed_null"
        ),
        F.aggregate(
            ch_expr("JSONExtract", j, "arr", "Array(Int64)"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("arr_sum"),
        ch_expr("JSONExtract", j, "arr", 3, "Int64").alias("arr_elem3"),
        ch_expr("JSONExtract", j, "arr", -3, "Int64").alias("arr_neg3"),
        F.size(ch_expr("JSONExtractArrayRaw", j, "arr"))
        .cast("long")
        .alias("arr_raw_n"),
        F.concat_ws(
            ",", F.transform(kv, lambda e: e.getField("key"))
        ).alias("kv_keys"),
        F.aggregate(
            F.transform(kv, lambda e: e.getField("value")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("kv_sum"),
        F.concat_ws(
            ",", F.transform(kvr, lambda e: e.getField("value"))
        ).alias("kvr_vals"),
        F.element_at(
            ch_expr("JSONExtract", j, "obj", "Map(String, Int64)"),
            "x",
        ).alias("map_x"),
        F.hex(ch_expr("bitSlice", pri, 2, 16)).alias("bs_mid"),
        F.hex(ch_expr("bitSlice", pri, -16)).alias("bs_tail"),
        F.hex(ch_expr("bitSlice", pri, 1, 24)).alias("bs_head"),
        ch_expr("byteSize", k).alias("bsz_k"),
        ch_expr("byteSize", pri).alias("bsz_pri"),
        ch_expr(
            "byteSize", k, pri, F.lit(1.5), k.cast("int")
        ).alias("bsz_mix"),
        ch_expr(
            "convertCharset",
            F.encode(F.concat(pri, F.lit("é")), "ISO-8859-1"),
            "ISO-8859-1",
            "UTF-8",
        ).alias("cc_round"),
        F.hex(
            ch_expr(
                "convertCharset",
                F.concat(pri, F.lit("é")),
                "UTF-8",
                "ISO-8859-1",
            )
        ).alias("cc_hex"),
        ch_expr("xxHash32", pri).alias("xxh32"),
        ch_expr(
            "IPv6NumToString",
            ch_expr("toIPv6", _rot_col(k, [v[0] for v in _IPV6_VEC])),
        ).alias("ip_to"),
        (
            (F.unix_micros(ch_expr("now64", 3)) % 1000 == 0)
            & (ch_expr("now64", 3) <= F.current_timestamp())
        ).alias("now64_ok"),
        ch_expr(
            "parseDateTime64BestEffort",
            F.lit("2024-05-01 12:34:56.789"),
        ).alias("parse64"),
    ).orderBy("k")
