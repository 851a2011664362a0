"""Round-8 query wave 1: the translation-table names promoted out of
UNSUPPORTED this round (functions/ch.py round-8 section; grammar anchor
ClickHouseParser.py:15571 treats every function as a generic call),
exercised end-to-end over real rows against DuckDB construction twins.

Headliners: bit-exact ClickHouse intHash32/intHash64 inside Catalyst
(exact wrapping uint64 arithmetic in DECIMAL(38,0) — see the _u64_*
helpers in functions/ch.py; the DuckDB twin runs the same pipeline in
HUGEINT), MySQL-mode-0 week numbering, Modified-Julian-Day calendar
conversion, timeSlots densification, map re-ordering views, and the
tuple vector-arithmetic family over the rebuild's array vectors.

Cross-engine float discipline: everything hashed by the driver is
either integer-valued, a timestamp, or a double produced by one fixed
IEEE expression tree evaluated identically on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .registry import q6, query, tables

# The intHash chains, as DuckDB CTEs over HUGEINT (2^64 = 1 << 64;
# xor/shift operate on non-negative hugeints so >> is logical).
# HUGEINT is SIGNED 128-bit, so a full x·C product of two 64-bit values
# can overflow it — the multiplies split C into 32-bit halves exactly
# like the Spark-side _u64_mulmod (x·C_lo < 2^96 stays in range).
# Both chains start with the ClickHouse SQL-layer salt xor
# (FunctionsHashing.h: 0x4CF2D2BAAE6DA887 for intHash64,
# 0x75D9543DE018BF45 for intHash32), and the intHash32 mix's first
# xor-shift is the ROTATE variant key ^ ((key >> 31) | (key << 33))
# — rendered as addition, the two shift fields are bit-disjoint.
_TWO64 = "18446744073709551616"
# 0xff51afd7ed558ccd = hi 4283543511 · 2^32 + lo 3981806797
# 0xc4ceb9fe1a85ec53 = hi 3301882366 · 2^32 + lo  444984403
_H64_SALT = "5544725790478674055"  # 0x4CF2D2BAAE6DA887
_H32_SALT = "8491911197113237317"  # 0x75D9543DE018BF45
_H64_CTE = f"""
    h640 AS (SELECT event_id,
             xor(event_id::HUGEINT, {_H64_SALT}::HUGEINT) AS x FROM e),
    h641 AS (SELECT event_id, xor(x, x >> 33) AS x FROM h640),
    h642 AS (SELECT event_id,
             ((x * 3981806797::HUGEINT) % {_TWO64}::HUGEINT
              + ((x * 4283543511::HUGEINT) % 4294967296::HUGEINT)
                * 4294967296::HUGEINT) % {_TWO64}::HUGEINT AS x
             FROM h641),
    h643 AS (SELECT event_id, xor(x, x >> 33) AS x FROM h642),
    h644 AS (SELECT event_id,
             ((x * 444984403::HUGEINT) % {_TWO64}::HUGEINT
              + ((x * 3301882366::HUGEINT) % 4294967296::HUGEINT)
                * 4294967296::HUGEINT) % {_TWO64}::HUGEINT AS x
             FROM h643),
    h645 AS (SELECT event_id, xor(x, x >> 33) AS x FROM h644),
    h64 AS (SELECT event_id,
            CAST(CASE WHEN x >= 9223372036854775808::HUGEINT
                 THEN x - {_TWO64}::HUGEINT ELSE x END AS BIGINT) AS ih64
            FROM h645)
"""
_H32_CTE = f"""
    h320 AS (SELECT event_id,
             xor(user_id::HUGEINT, {_H32_SALT}::HUGEINT) AS x FROM e),
    h321 AS (SELECT event_id,
             (({_TWO64}::HUGEINT - 1 - x) + (x * 262144::HUGEINT))
                 % {_TWO64}::HUGEINT AS x FROM h320),
    h322 AS (SELECT event_id,
             xor(x, (x >> 31)
                    + (x * 8589934592::HUGEINT) % {_TWO64}::HUGEINT)
                 AS x FROM h321),
    h323 AS (SELECT event_id, (x * 21::HUGEINT) % {_TWO64}::HUGEINT AS x
             FROM h322),
    h324 AS (SELECT event_id, xor(x, x >> 11) AS x FROM h323),
    h325 AS (SELECT event_id,
             (x + (x * 64::HUGEINT) % {_TWO64}::HUGEINT)
                 % {_TWO64}::HUGEINT AS x FROM h324),
    h326 AS (SELECT event_id, xor(x, x >> 22) AS x FROM h325),
    h32 AS (SELECT event_id,
            CAST(x % 4294967296::HUGEINT AS BIGINT) AS ih32 FROM h326)
"""


@query(
    "ch_r8_function_surface",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, ts, value, event_type
        FROM events WHERE event_id % 20 = 1
    ),
    {_H64_CTE},
    {_H32_CTE},
    wk AS (
        SELECT event_id,
               CASE WHEN doy - 1 < off THEN 0
                    ELSE CAST(FLOOR((doy - 1 - off) / 7) AS INT) + 1
               END AS w0,
               yy, pdoy, poff
        FROM (
            SELECT event_id,
                   dayofyear(ts::DATE) AS doy,
                   (7 - dayofweek(make_date(year(ts::DATE), 1, 1))) % 7
                       AS off,
                   year(ts::DATE) AS yy,
                   dayofyear(make_date(year(ts::DATE) - 1, 12, 31))
                       AS pdoy,
                   (7 - dayofweek(make_date(year(ts::DATE) - 1, 1, 1)))
                       % 7 AS poff
            FROM e)
    ),
    base AS (
        SELECT e.*, h64.ih64, h32.ih32, wk.w0,
               CASE WHEN wk.w0 = 0
                    THEN (wk.yy - 1) * 100
                         + CASE WHEN wk.pdoy - 1 < wk.poff THEN 0
                                ELSE CAST(FLOOR((wk.pdoy - 1 - wk.poff)
                                                / 7) AS INT) + 1 END
                    ELSE wk.yy * 100 + wk.w0 END AS yw0
        FROM e JOIN h64 USING (event_id) JOIN h32 USING (event_id)
               JOIN wk USING (event_id)
    )
    SELECT event_id::BIGINT AS eid,
           CAST(ts::DATE - DATE '1858-11-17' AS BIGINT) AS mjd,
           strftime(DATE '1858-11-17'
                    + CAST(58000 + event_id % 3000 AS INT),
                    '%Y-%m-%d') AS fmjd,
           w0, yw0,
           CAST(weekofyear(ts::DATE) AS INT) AS w3,
           TIMESTAMP '1970-01-02'
               + (date_trunc('second', ts) - date_trunc('day', ts)) AS tt,
           try_strptime(concat(1 + event_id % 12, '/',
                               1 + event_id % 28, '/',
                               2001 + event_id % 20, ' ',
                               event_id % 24, ':', event_id % 60, ':',
                               event_id % 60),
                        '%-m/%-d/%Y %-H:%M:%S') AS pus,
           array_to_string(
               list_transform(
                   generate_series(epoch_us(ts) // 1000000 // 1800,
                                   (epoch_us(ts) // 1000000
                                    + 600 + (event_id % 50) * 90)
                                   // 1800),
                   k -> strftime(epoch_ms(k * 1800 * 1000),
                                 '%Y-%m-%d %H:%M:%S')), ',') AS slots,
           ih64, ih32,
           (regexp_matches(event_type, '^(err|cl)')
            OR regexp_matches(event_type, 'chase$')) AS mma,
           CASE WHEN regexp_matches(event_type, '^(err|cl)') THEN 1
                WHEN regexp_matches(event_type, 'chase$') THEN 2
                ELSE 0 END AS mmai,
           replace(rpad(event_type, 12, chr(0)), chr(0), '.') AS tfs,
           nfc_normalize(concat('cafe', chr(769), '-', event_type))
               AS nfc,
           concat(event_id % 5, ':', CAST(event_id % 97 AS BIGINT), ',',
                  10 + event_id % 7, ':',
                  CAST(user_id % 89 AS BIGINT), ',',
                  20, ':', CAST(event_id % 83 AS BIGINT)) AS msort,
           concat(20, ':', CAST(event_id % 83 AS BIGINT), ',',
                  10 + event_id % 7, ':',
                  CAST(user_id % 89 AS BIGINT), ',',
                  event_id % 5, ':', CAST(event_id % 97 AS BIGINT))
               AS mrsort,
           array_to_string(
               list_transform(
                   generate_series(1 + event_id % 3, 4 + event_id % 3),
                   k -> concat(k, '=',
                               CASE WHEN k = 1 + event_id % 3
                                    THEN CAST(event_id % 41 AS BIGINT)
                                    WHEN k = 4 + event_id % 3
                                    THEN CAST(user_id % 43 AS BIGINT)
                                    ELSE 0 END)), ',') AS mpop
    FROM base ORDER BY eid
    """,
)
def ch_r8_function_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 promoted names end-to-end: toModifiedJulianDay /
    fromModifiedJulianDay, toWeek/toYearWeek (MySQL mode 0, the CH
    default), toTime, parseDateTimeBestEffortUS over a column-built US
    date string, timeSlots (rendered as a joined string), BIT-EXACT
    intHash64/intHash32 (the DuckDB twin replays the same wrapping
    uint64 pipeline in HUGEINT), multiMatchAny/-Index, toFixedString
    (NUL padding rendered as '.'), normalizeUTF8NFC over a constructed
    NFD string (combining acute U+0301 -> precomposed), and the three
    map views mapSort / mapReverseSort / mapPopulateSeries rendered as
    entry strings. The oracle CONSTRUCTS every expected value from the
    same columns, so the check is a true two-sided derivation."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 20 == 1)
    eid = F.col("event_id")
    d = F.col("ts").cast("date")
    us_str = F.concat(
        (1 + eid % 12).cast("string"), F.lit("/"),
        (1 + eid % 28).cast("string"), F.lit("/"),
        (2001 + eid % 20).cast("string"), F.lit(" "),
        (eid % 24).cast("string"), F.lit(":"),
        (eid % 60).cast("string"), F.lit(":"),
        (eid % 60).cast("string"),
    )
    # distinct-by-construction keys: k1 in 0-4, k2 in 10-16, k3 = 20;
    # built deliberately out of order so mapSort has work to do
    k1, k2, k3 = eid % 5, 10 + eid % 7, F.lit(20)
    v1 = (eid % 97).cast("long")
    v2 = (F.col("user_id") % 89).cast("long")
    v3 = (eid % 83).cast("long")
    scrambled = F.map_from_arrays(F.array(k2, k3, k1), F.array(v2, v3, v1))
    pop_src = F.map_from_arrays(
        F.array((1 + eid % 3).cast("int"), (4 + eid % 3).cast("int")),
        F.array((eid % 41).cast("long"), (F.col("user_id") % 43).cast("long")),
    )

    def _entries(m) -> F.Column:
        return F.array_join(
            F.transform(
                F.map_entries(m),
                lambda kv: F.concat(
                    kv["key"].cast("string"), F.lit(":"),
                    kv["value"].cast("string"),
                ),
            ),
            ",",
        )

    pats = ["^(err|cl)", "chase$"]
    return ev.select(
        eid.cast("long").alias("eid"),
        ch_expr("toModifiedJulianDay", d).cast("long").alias("mjd"),
        ch_expr("fromModifiedJulianDay", F.lit(58000) + eid % 3000)
        .cast("string")
        .alias("fmjd"),
        ch_expr("toWeek", d).alias("w0"),
        ch_expr("toYearWeek", d).alias("yw0"),
        ch_expr("toWeek", d, 3).cast("int").alias("w3"),
        ch_expr("toTime", F.col("ts")).alias("tt"),
        ch_expr("parseDateTimeBestEffortUS", us_str).alias("pus"),
        F.array_join(
            F.transform(
                ch_expr(
                    "timeSlots", F.col("ts"), F.lit(600) + (eid % 50) * 90
                ),
                lambda t: t.cast("string"),
            ),
            ",",
        ).alias("slots"),
        ch_expr("intHash64", eid).alias("ih64"),
        ch_expr("intHash32", F.col("user_id")).alias("ih32"),
        ch_expr("multiMatchAny", F.col("event_type"), pats).alias("mma"),
        ch_expr("multiMatchAnyIndex", F.col("event_type"), pats).alias(
            "mmai"
        ),
        F.translate(
            ch_expr("toFixedString", F.col("event_type"), 12), "\x00", "."
        ).alias("tfs"),
        ch_expr(
            "normalizeUTF8NFC",
            F.concat(F.lit("café-"), F.col("event_type")),
        ).alias("nfc"),
        _entries(ch_expr("mapSort", scrambled)).alias("msort"),
        _entries(ch_expr("mapReverseSort", scrambled)).alias("mrsort"),
        F.array_join(
            F.transform(
                F.map_entries(ch_expr("mapPopulateSeries", pop_src)),
                lambda kv: F.concat(
                    kv["key"].cast("string"), F.lit("="),
                    kv["value"].cast("string"),
                ),
            ),
            ",",
        ).alias("mpop"),
    ).orderBy("eid")


@query(
    "ch_r8_function_surface_2",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS q,
               CAST(l_partkey AS BIGINT) % 50 AS p,
               CAST(l_suppkey AS BIGINT) % 40 + 1 AS s,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem WHERE (l_orderkey * 10 + l_linenumber) % 149 = 1
    ),
    v AS (
        SELECT *,
               [q, CAST(l_linenumber AS BIGINT), p] AS a,
               [s, q, 7::BIGINT] AS b,
               CASE (l_orderkey % 5)
                    WHEN 0 THEN 2.0 WHEN 1 THEN 2.5 WHEN 2 THEN 4.0
                    WHEN 3 THEN 5.0 ELSE 8.0 END AS dv
        FROM li
    )
    SELECT l_orderkey::BIGINT AS okey, l_linenumber::INT AS lno,
           array_to_string(list_transform(generate_series(1, 3),
               i -> CAST(a[i] + b[i] AS BIGINT)), ',') AS tplus,
           array_to_string(list_transform(generate_series(1, 3),
               i -> CAST(a[i] - b[i] AS BIGINT)), ',') AS tminus,
           array_to_string(list_transform(generate_series(1, 3),
               i -> CAST(a[i] * b[i] AS BIGINT)), ',') AS tmul,
           array_to_string(list_transform(generate_series(1, 3),
               i -> CAST(FLOOR(10000.0 * a[i] / b[i]) AS BIGINT)), ',')
               AS tdiv4,
           array_to_string(list_transform(generate_series(1, 3),
               i -> CAST(-a[i] AS BIGINT)), ',') AS tneg,
           array_to_string(list_transform(generate_series(1, 3),
               i -> CAST(a[i] * 3 AS BIGINT)), ',') AS tmuln,
           array_to_string(
               [CAST(a[1] AS BIGINT), CAST(a[2] AS BIGINT),
                CAST(a[3] AS BIGINT), CAST(b[1] AS BIGINT),
                CAST(b[2] AS BIGINT), CAST(b[3] AS BIGINT)], ',')
               AS tcat,
           CAST((CASE WHEN a[1] != b[1] THEN 1 ELSE 0 END)
                + (CASE WHEN a[2] != b[2] THEN 1 ELSE 0 END)
                + (CASE WHEN a[3] != b[3] THEN 1 ELSE 0 END) AS BIGINT)
               AS thd,
           CAST((cents * 1000) // CAST(dv * 10 AS BIGINT)
                AS DOUBLE) / 10000 AS dd,
           CAST(q * CAST(dv * 100 AS BIGINT) AS DOUBLE) / 100 AS md
    FROM v ORDER BY okey, lno
    """,
)
def ch_r8_function_surface_2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuple vector arithmetic (tuplePlus/Minus/Multiply/Divide/Negate/
    MultiplyByNumber/Concat/HammingDistance over the rebuild's array
    vectors) plus explicit-scale decimal arithmetic (divideDecimal /
    multiplyDecimal, truncation toward zero).

    Exactness: vector elements are small integers, so every rendered
    entry is integral; tupleDivide renders as floor(1e4·x/y) (one fixed
    double expression both engines evaluate identically); the decimal
    divisors {2, 2.5, 4, 5, 8} make every quotient terminate within
    scale 4, so truncation never sits on a rounding boundary — the
    DuckDB twin reproduces the quotients with pure BIGINT floor-divides.
    """
    li = tables(spark, sf_dir)["lineitem"].filter(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")) % 149 == 1
    )
    q = F.col("l_quantity").cast("long")
    a = F.array(q, F.col("l_linenumber").cast("long"),
                F.col("l_partkey").cast("long") % 50)
    b = F.array(F.col("l_suppkey").cast("long") % 40 + 1, q,
                F.lit(7).cast("long"))
    dv = (
        F.when(F.col("l_orderkey") % 5 == 0, 2.0)
        .when(F.col("l_orderkey") % 5 == 1, 2.5)
        .when(F.col("l_orderkey") % 5 == 2, 4.0)
        .when(F.col("l_orderkey") % 5 == 3, 5.0)
        .otherwise(8.0)
    )
    cents_dec = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("decimal(18,0)")
        / 100
    ).cast("decimal(18,2)")

    def _j(arr) -> F.Column:
        return F.array_join(
            F.transform(arr, lambda x: x.cast("long").cast("string")), ","
        )

    return li.select(
        F.col("l_orderkey").cast("long").alias("okey"),
        F.col("l_linenumber").cast("int").alias("lno"),
        _j(ch_expr("tuplePlus", a, b)).alias("tplus"),
        _j(ch_expr("tupleMinus", a, b)).alias("tminus"),
        _j(ch_expr("tupleMultiply", a, b)).alias("tmul"),
        F.array_join(
            F.transform(
                ch_expr("tupleDivide", a.cast("array<double>"),
                        b.cast("array<double>")),
                lambda x: F.floor(x * 10000).cast("long").cast("string"),
            ),
            ",",
        ).alias("tdiv4"),
        _j(ch_expr("tupleNegate", a)).alias("tneg"),
        _j(ch_expr("tupleMultiplyByNumber", a, F.lit(3))).alias("tmuln"),
        _j(ch_expr("tupleConcat", a, b)).alias("tcat"),
        ch_expr("tupleHammingDistance", a, b).alias("thd"),
        ch_expr("divideDecimal", cents_dec, dv.cast("decimal(10,2)"), 4)
        .cast("double")
        .alias("dd"),
        ch_expr("multiplyDecimal", q.cast("decimal(10,0)"),
                dv.cast("decimal(10,2)"), 4)
        .cast("double")
        .alias("md"),
    ).orderBy("okey", "lno")


@query(
    "ab_ztest_power_suite",
    oracle="""
    WITH v AS (
        SELECT CAST(user_id % 2 AS INT) AS variant,
               CASE WHEN value > 10 THEN 1 ELSE 0 END AS success
        FROM events
    ),
    agg AS (
        SELECT
            CAST(SUM(CASE WHEN variant = 0 THEN success END) AS BIGINT)
                AS sx,
            CAST(SUM(CASE WHEN variant = 1 THEN success END) AS BIGINT)
                AS sy,
            CAST(COUNT(CASE WHEN variant = 0 THEN 1 END) AS BIGINT)
                AS tx,
            CAST(COUNT(CASE WHEN variant = 1 THEN 1 END) AS BIGINT)
                AS ty
        FROM v
    ),
    m AS (
        SELECT sx, sy, tx, ty,
               CAST(sx AS DOUBLE) / tx AS p1,
               CAST(sy AS DOUBLE) / ty AS p2,
               CAST(sx + sy AS DOUBLE) / (tx + ty) AS pp
        FROM agg
    )
    SELECT sx, sy, tx, ty,
           FLOOR(((p1 - p2) / SQRT(pp * (1 - pp)
                 * (1.0 / tx + 1.0 / ty))) * 1000000 + 0.5) / 1000000
               AS z_stat,
           FLOOR(((p1 - p2) - 1.9599639845400545
                 * SQRT(p1 * (1 - p1) / tx + p2 * (1 - p2) / ty))
                 * 1000000 + 0.5) / 1000000 AS ci_low,
           FLOOR(((p1 - p2) + 1.9599639845400545
                 * SQRT(p1 * (1 - p1) / tx + p2 * (1 - p2) / ty))
                 * 1000000 + 0.5) / 1000000 AS ci_high,
           FLOOR((POW(1.9599639845400545
                     * SQRT(2 * ((p1 + 0.02 + p1) / 2)
                            * (1 - (p1 + 0.02 + p1) / 2))
                     + 0.8416212335729143
                     * SQRT(p1 * (1 - p1) + (p1 + 0.02)
                            * (1 - (p1 + 0.02))), 2)
                 / (0.02 * 0.02)) * 1000000 + 0.5) / 1000000 AS n_conv,
           FLOOR((2 * POW(1.9599639845400545 + 0.8416212335729143, 2)
                 * (20.0 * 20.0) / ((0.05 * 100.0) * (0.05 * 100.0)))
                 * 1000000 + 0.5) / 1000000 AS n_cont
    FROM m
    """,
)
def ab_ztest_power_suite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proportionsZTest (pooled z + unpooled Wald CI; p-value
    deliberately omitted — neither engine exposes erf, and a polynomial
    approximation would be false cross-engine precision) and the
    closed-form minSampleSizeConversion / minSampleSizeContinuous
    power shims, evaluated over a real two-variant split of the events
    table. One aggregation shuffle carrying four exact BIGINTs; the z /
    CI / sample-size trees are fixed-shape doubles over those integers,
    identical on both engines, rounded to 6 places."""
    ev = tables(spark, sf_dir)["events"]
    agg = ev.select(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.when(F.col("value") > 10, 1).otherwise(0).alias("success"),
    ).agg(
        F.sum(F.when(F.col("variant") == 0, F.col("success")))
        .cast("long")
        .alias("sx"),
        F.sum(F.when(F.col("variant") == 1, F.col("success")))
        .cast("long")
        .alias("sy"),
        F.count(F.when(F.col("variant") == 0, F.lit(1)))
        .cast("long")
        .alias("tx"),
        F.count(F.when(F.col("variant") == 1, F.lit(1)))
        .cast("long")
        .alias("ty"),
    )
    zt = ch_expr(
        "proportionsZTest",
        F.col("sx"), F.col("sy"), F.col("tx"), F.col("ty"),
    )
    p1 = F.col("sx").cast("double") / F.col("tx")
    return agg.select(
        "sx", "sy", "tx", "ty",
        q6(zt["z_stat"]).alias("z_stat"),
        q6(zt["ci_low"]).alias("ci_low"),
        q6(zt["ci_high"]).alias("ci_high"),
        q6(
            ch_expr("minSampleSizeConversion", p1, F.lit(0.02))
        ).alias("n_conv"),
        q6(
            ch_expr(
                "minSampleSizeContinuous",
                F.lit(100.0), F.lit(20.0), F.lit(0.05),
            )
        ).alias("n_cont"),
    )
