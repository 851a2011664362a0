"""Round-7 session-2 surface queries: the wave-10/10b/11/11b
translation-table names exercised end-to-end over real rows against
DuckDB construction twins — ch_r7_function_surface_2 (IPv4/MAC/UUID,
bit surface, array shifts, SQL/JSON, URL hierarchies, norms),
bitmap_segment_ops (the bitmap family's audience algebra),
ch_r7_function_surface_3 (MySQL-dialect datetime, Euclid-fold gcd/lcm,
URL parameters), morton_zorder_locality (Z-order locality property),
string_distance_suite (Jaro/Jaro-Winkler/Damerau kernels), and
ch_r7_function_surface_4 (ISO-year, relative-num anchors, UUID casts).

Convention (same as ch_r7_function_surface): the oracle CONSTRUCTS the
expected value from the same base columns with plain arithmetic/string
SQL — never by re-implementing the function — so the check is a
two-sided derivation. Array-producing names are rendered through
array_join before leaving the query (driver-canonicalizer rule:
no top-level array/map/struct output columns).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .registry import query, tables


@query(
    "ch_r7_function_surface_2",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, value, event_type, props,
               (user_id % 200) * 16777216 + (event_id % 256) * 65536
                   + 3 * 256 + 4 AS ipn,
               md5(CAST(event_id AS VARCHAR)) AS h
        FROM events WHERE event_id % 20 = 3
    )
    SELECT event_id::BIGINT AS eid,
           (user_id % 256) * 16777216 + (event_id % 256) * 65536
               + 1 * 256 + 2 AS ip_num,
           concat(user_id % 200, '.', event_id % 256, '.3.4') AS ip_str,
           concat(user_id % 200, '.', event_id % 256, '.3.xxx') AS classc,
           concat(user_id % 200, '.', event_id % 256, '.0.0') AS cidr_lo,
           concat(user_id % 200, '.', event_id % 256, '.15.255') AS cidr_hi,
           concat_ws(':', printf('%02x', event_id % 256),
                     printf('%02x', event_id % 256),
                     printf('%02x', event_id % 256),
                     printf('%02x', event_id % 256),
                     printf('%02x', event_id % 256),
                     printf('%02x', event_id % 256)) AS mac_str,
           CAST((event_id % 256) * 1099511627776
                + (event_id % 256) * 4294967296
                + (event_id % 256) * 16777216 + (event_id % 256) * 65536
                + (event_id % 256) * 256 + (event_id % 256)
                AS BIGINT) AS mac_num,
           concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-',
                  substr(h, 13, 4), '-', substr(h, 17, 4), '-',
                  substr(h, 21, 12)) AS uuid_rt,
           CAST(bit_count(xor(CAST(event_id AS BIGINT),
                              CAST(user_id AS BIGINT))) AS BIGINT) AS ham,
           (CAST(event_id AS BIGINT) << 7)
               | (CAST(event_id AS BIGINT) >> 57) AS rotl,
           array_to_string(
               list_filter(generate_series(0, 63),
                           i -> ((event_id >> i) & 1) = 1), ',') AS bpos,
           concat(user_id % 5, ',7,0') AS asl,
           concat(event_type, '|', event_type) AS toks,
           CASE WHEN CAST(props->>'k' AS BIGINT) >= 0
                THEN CAST(props->>'k' AS BIGINT) END AS ju,
           (props->>'k') IS NOT NULL AS je,
           (props->>'zz') IS NOT NULL AS jm,
           props->>'k' AS jv,
           concat('https://ex.org/|https://ex.org/a', user_id % 4,
                  '/|https://ex.org/a', user_id % 4, '/b',
                  event_id % 6) AS uh,
           concat('/a', user_id % 4, '/|/a', user_id % 4, '/b',
                  event_id % 6) AS uph,
           ROUND(value * value + (value + 1) * (value + 1), 6) AS l2s,
           ROUND(POW(POW(ABS(value), 3) + POW(ABS(value + 1), 3),
                     1.0 / 3), 6) AS lp3,
           ROUND(ABS(value) + ABS(value), 6) AS lpd1
    FROM e ORDER BY eid
    """,
)
def ch_r7_function_surface_2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wave-10 names end-to-end: every array output rendered via
    array_join, the CIDR struct flattened to lo/hi columns, MAC and
    UUID names checked as num→string→num round trips so the oracle
    needs only the seed integers. 100 TB: map-only scalar surface,
    whole-stage codegen, no Python."""
    # filter first (5% of rows), THEN widen: the per-row expression tree
    # here (md5 + two hierarchy transforms + ~20 scalar columns) is what
    # dominates, and the single-row-group testdata would run it in one
    # task (measured 3.2 s -> ~0.6 s at sf0.1; see session.widen_scan)
    from ..session import widen_scan

    ev = widen_scan(
        tables(spark, sf_dir)["events"].filter(F.col("event_id") % 20 == 3)
    )
    octet = (F.col("event_id") % 256).cast("long")
    ip_str_col = F.concat(
        (F.col("user_id") % 256).cast("string"), F.lit("."),
        (F.col("event_id") % 256).cast("string"), F.lit(".1.2"),
    )
    ipn = (
        (F.col("user_id") % 200) * 16777216
        + (F.col("event_id") % 256) * 65536
        + 3 * 256 + 4
    ).cast("long")
    mac48 = (
        octet * F.lit(1099511627776)  # << 40
        + octet * F.lit(4294967296)  # << 32
        + octet * 16777216 + octet * 65536 + octet * 256 + octet
    )
    h = F.md5(F.col("event_id").cast("string"))
    uuid_str = F.concat(
        F.substring(h, 1, 8), F.lit("-"), F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"), F.substring(h, 17, 4),
        F.lit("-"), F.substring(h, 21, 12),
    )
    url = F.concat(
        F.lit("https://ex.org/a"), (F.col("user_id") % 4).cast("string"),
        F.lit("/b"), (F.col("event_id") % 6).cast("string"),
    )
    vec = F.array(F.col("value"), F.col("value") + 1)
    cidr = ch_expr("IPv4CIDRToRange", ipn, 20)
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        ch_expr("IPv4StringToNum", ip_str_col).alias("ip_num"),
        ch_expr("IPv4NumToString", ipn).alias("ip_str"),
        ch_expr("IPv4NumToStringClassC", ipn).alias("classc"),
        cidr.getField("lo").alias("cidr_lo"),
        cidr.getField("hi").alias("cidr_hi"),
        ch_expr("MACNumToString", mac48).alias("mac_str"),
        ch_expr(
            "MACStringToNum", ch_expr("MACNumToString", mac48)
        ).alias("mac_num"),
        ch_expr(
            "UUIDNumToString", ch_expr("UUIDStringToNum", uuid_str)
        ).alias("uuid_rt"),
        ch_expr(
            "bitHammingDistance",
            F.col("event_id").cast("long"),
            F.col("user_id").cast("long"),
        ).cast("long").alias("ham"),
        ch_expr("bitRotateLeft", F.col("event_id").cast("long"), 7).alias(
            "rotl"
        ),
        F.array_join(
            ch_expr(
                "bitPositionsToArray", F.col("event_id").cast("long")
            ),
            ",",
        ).alias("bpos"),
        F.array_join(
            ch_expr(
                "arrayShiftLeft",
                F.array(
                    (F.col("event_id") % 5).cast("long"),
                    (F.col("user_id") % 5).cast("long"),
                    F.lit(7).cast("long"),
                ),
                1,
            ).cast("array<string>"),
            ",",
        ).alias("asl"),
        F.array_join(
            ch_expr(
                "alphaTokens",
                F.concat(
                    F.col("event_type"), F.lit("1"), F.col("event_type")
                ),
            ),
            "|",
        ).alias("toks"),
        ch_expr("JSONExtractUInt", F.col("props"), "k").alias("ju"),
        ch_expr("JSON_EXISTS", F.col("props"), "$.k").alias("je"),
        ch_expr("JSON_EXISTS", F.col("props"), "$.zz").alias("jm"),
        ch_expr("JSON_VALUE", F.col("props"), "$.k").alias("jv"),
        F.array_join(ch_expr("URLHierarchy", url), "|").alias("uh"),
        F.array_join(ch_expr("URLPathHierarchy", url), "|").alias("uph"),
        F.round(ch_expr("L2SquaredNorm", vec), 6).alias("l2s"),
        F.round(ch_expr("LpNorm", vec, 3), 6).alias("lp3"),
        F.round(
            ch_expr(
                "LpDistance",
                F.array(F.col("value"), F.lit(0.0)),
                F.array(F.lit(0.0), F.col("value")),
                1,
            ),
            6,
        ).alias("lpd1"),
    ).orderBy("eid")


@query(
    "bitmap_segment_ops",
    oracle="""
    WITH e AS (
        SELECT user_id % 8 AS seg, event_type,
               CAST(user_id AS BIGINT) AS uid
        FROM events WHERE event_type IN ('click', 'view')
    ),
    b AS (
        SELECT seg,
               -- COALESCE: a segment with zero clicks yields NULL from
               -- the FILTERed list() while Spark's collect_set gives [],
               -- which would NULL-poison every downstream cardinality
               COALESCE(list_sort(list(DISTINCT uid)
                        FILTER (WHERE event_type = 'click')),
                        CAST([] AS BIGINT[])) AS clicks,
               COALESCE(list_sort(list(DISTINCT uid)
                        FILTER (WHERE event_type = 'view')),
                        CAST([] AS BIGINT[])) AS views
        FROM e GROUP BY seg
    )
    SELECT seg,
           CAST(len(clicks) AS BIGINT) AS click_card,
           CAST(len(list_intersect(clicks, views)) AS BIGINT) AS and_card,
           CAST(len(list_distinct(list_concat(clicks, views))) AS BIGINT)
               AS or_card,
           CAST(len(list_filter(clicks,
                                x -> NOT list_contains(views, x)))
                + len(list_filter(views,
                                  x -> NOT list_contains(clicks, x)))
                AS BIGINT) AS xor_card,
           CAST(len(list_filter(clicks,
                                x -> NOT list_contains(views, x)))
                AS BIGINT) AS andnot_card,
           CAST(COALESCE(clicks[1], 4294967295) AS BIGINT) AS min_click,
           CAST(COALESCE(clicks[-1], 0) AS BIGINT) AS max_click,
           CAST(len(list_filter(clicks, x -> x >= 100 AND x < 900))
                AS BIGINT) AS mid_range_card,
           list_contains(clicks, CAST(seg AS BIGINT)) AS has_own_seg
    FROM b ORDER BY seg
    """,
)
def bitmap_segment_ops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse bitmap family (functions/ch.py wave 10b) doing its
    canonical job — user-segment set algebra: per segment, the clicker
    and viewer user-id bitmaps, then AND/OR/XOR/ANDNOT cardinalities,
    min/max, a value-range subset and a membership probe. The DuckDB
    twin drives the same algebra through list primitives, so the
    sorted-array bitmap carrier is checked end-to-end. Complementary
    to ch_aggregates_w6's bitmap_set_cardinalities, which expresses the
    same audience algebra RELATIONALLY (membership flags + conditional
    counts, the plan roaring bitmaps accelerate) — this query drives
    the scalar function surface itself.

    100 TB: bitmaps stay per-(segment, type) — collect_set after a
    map-side distinct, exactly the per-group-small discipline CH
    bitmaps assume; every downstream op is JVM array algebra, zero
    Python."""
    ev = (
        tables(spark, sf_dir)["events"]
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            (F.col("user_id") % 8).alias("seg"),
            "event_type",
            F.col("user_id").cast("long").alias("uid"),
        )
    )
    b = ev.groupBy("seg").agg(
        ch_expr(
            "bitmapBuild",
            F.collect_set(
                F.when(F.col("event_type") == "click", F.col("uid"))
            ),
        ).alias("clicks"),
        ch_expr(
            "bitmapBuild",
            F.collect_set(
                F.when(F.col("event_type") == "view", F.col("uid"))
            ),
        ).alias("views"),
    )
    c, v = F.col("clicks"), F.col("views")
    return b.select(
        "seg",
        ch_expr("bitmapCardinality", c).alias("click_card"),
        ch_expr("bitmapAndCardinality", c, v).alias("and_card"),
        ch_expr("bitmapOrCardinality", c, v).alias("or_card"),
        ch_expr("bitmapXorCardinality", c, v).alias("xor_card"),
        ch_expr("bitmapAndnotCardinality", c, v).alias("andnot_card"),
        ch_expr("bitmapMin", c).alias("min_click"),
        ch_expr("bitmapMax", c).alias("max_click"),
        ch_expr(
            "bitmapCardinality",
            ch_expr("bitmapSubsetInRange", c, F.lit(100), F.lit(900)),
        ).alias("mid_range_card"),
        ch_expr("bitmapContains", c, F.col("seg").cast("long")).alias(
            "has_own_seg"
        ),
    ).orderBy("seg")


@query(
    "ch_r7_function_surface_3",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, ts, event_type,
               concat('https://h', user_id % 5, '.org:', 8000 + user_id % 9,
                      '/p?a=', event_id % 4, '&bb=', user_id % 4,
                      '&c=', event_id % 3, '#z') AS url
        FROM events WHERE event_id % 20 = 7
    )
    SELECT event_id::BIGINT AS eid,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS fdt,
           strftime(ts, '%A %d %B %y') AS fdt_name,
           strptime(concat(lpad(CAST(1 + event_id % 28 AS VARCHAR), 2, '0'),
                           '/', lpad(CAST(1 + event_id % 12 AS VARCHAR), 2,
                                     '0'), '/2026'),
                    '%d/%m/%Y')::VARCHAR AS pdt,
           CAST(gcd(1 + event_id % 1000, 1 + user_id % 100) AS BIGINT)
               AS g,
           CAST(lcm(1 + event_id % 12, 1 + user_id % 8) AS BIGINT) AS l,
           CAST(factorial(CAST(event_id % 11 AS INT)) AS BIGINT) AS fact,
           CAST(CASE WHEN user_id % 7 = 0 THEN 0
                     ELSE (event_id - ((event_id % (user_id % 7)) + (user_id % 7)) % (user_id % 7))
                          / (user_id % 7) END AS BIGINT) AS idz,
           contains(event_type, 'ie') OR regexp_matches(event_type, 'i.*e')
               AS hs,
           concat('a,bb,c') AS pnames,
           concat('https://h', user_id % 5, '.org:', 8000 + user_id % 9,
                  '/p?a=', event_id % 4, '&c=', event_id % 3, '#z')
               AS cuturl,
           CAST(8000 + user_id % 9 AS BIGINT) AS prt,
           concat('h', user_id % 5, '.org:', 8000 + user_id % 9) AS nl
    FROM e ORDER BY eid
    """,
)
def ch_r7_function_surface_3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wave-11 names end-to-end: formatDateTime/parseDateTime in the
    MySQL %-dialect vs DuckDB strftime/strptime (two independent
    %-dialect implementations agreeing through real timestamps), the
    fixed-depth Euclid gcd / lcm / factorial vs DuckDB's builtins,
    intDivOrZero's zero guard, hasSubsequence as a regex derivation,
    and the URL parameter utilities against oracle-constructed strings.
    100 TB: map-only scalar surface."""
    from ..session import widen_scan

    ev = widen_scan(
        tables(spark, sf_dir)["events"].filter(F.col("event_id") % 20 == 7)
    )
    url = F.concat(
        F.lit("https://h"), (F.col("user_id") % 5).cast("string"),
        F.lit(".org:"), (8000 + F.col("user_id") % 9).cast("string"),
        F.lit("/p?a="), (F.col("event_id") % 4).cast("string"),
        F.lit("&bb="), (F.col("user_id") % 4).cast("string"),
        F.lit("&c="), (F.col("event_id") % 3).cast("string"), F.lit("#z"),
    )
    date_text = F.concat(
        F.lpad((1 + F.col("event_id") % 28).cast("string"), 2, "0"),
        F.lit("/"),
        F.lpad((1 + F.col("event_id") % 12).cast("string"), 2, "0"),
        F.lit("/2026"),
    )
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        ch_expr("formatDateTime", F.col("ts"), "%Y-%m-%d %H:%i:%s").alias(
            "fdt"
        ),
        ch_expr("formatDateTime", F.col("ts"), "%W %d %M %y").alias(
            "fdt_name"
        ),
        ch_expr("parseDateTime", date_text, "%d/%m/%Y")
        .cast("string")
        .alias("pdt"),
        ch_expr(
            "gcd", 1 + F.col("event_id") % 1000, 1 + F.col("user_id") % 100
        ).alias("g"),
        ch_expr(
            "lcm", 1 + F.col("event_id") % 12, 1 + F.col("user_id") % 8
        ).alias("l"),
        ch_expr("factorial", F.col("event_id") % 11).alias("fact"),
        ch_expr(
            "intDivOrZero", F.col("event_id"), F.col("user_id") % 7
        ).alias("idz"),
        ch_expr("hasSubsequence", F.col("event_type"), "ie").alias("hs"),
        F.array_join(
            ch_expr("extractURLParameterNames", url), ","
        ).alias("pnames"),
        ch_expr("cutURLParameter", url, "bb").alias("cuturl"),
        ch_expr("port", url).alias("prt"),
        ch_expr("netloc", url).alias("nl"),
    ).orderBy("eid")


@query(
    "morton_zorder_locality",
    oracle="""
    WITH b AS (
        SELECT user_id % 256 AS x, event_id % 256 AS y
        FROM events
    ),
    m AS (
        SELECT x, y,
               ( ((x >> 0) & 1) * 1     + ((x >> 1) & 1) * 4
               + ((x >> 2) & 1) * 16    + ((x >> 3) & 1) * 64
               + ((x >> 4) & 1) * 256   + ((x >> 5) & 1) * 1024
               + ((x >> 6) & 1) * 4096  + ((x >> 7) & 1) * 16384
               + (((y >> 0) & 1) * 1    + ((y >> 1) & 1) * 4
               +  ((y >> 2) & 1) * 16   + ((y >> 3) & 1) * 64
               +  ((y >> 4) & 1) * 256  + ((y >> 5) & 1) * 1024
               +  ((y >> 6) & 1) * 4096 + ((y >> 7) & 1) * 16384) * 2
               ) AS code
        FROM b
    )
    SELECT CAST(code >> 8 AS BIGINT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(x) - MIN(x) AS BIGINT) AS x_span,
           CAST(MAX(y) - MIN(y) AS BIGINT) AS y_span
    FROM m GROUP BY cell ORDER BY cell
    """,
)
def morton_zorder_locality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout demonstration over mortonEncode: events mapped to
    an (x=user bucket, y=id bucket) 256×256 grid, Morton-coded, grouped
    by the 8-bit code prefix. Each prefix cell covers a CONTIGUOUS
    16×16 rectangle (x_span, y_span ≤ 15 by construction) — the
    locality property that makes Z-order file clustering prune
    multi-dimensional range predicates: a sorted-by-code layout puts
    both dimensions' neighborhoods in the same files. The DuckDB twin
    derives the interleave arithmetically (Σ bit·4^i), so the
    magic-number spread is cross-checked bit-for-bit over all rows.
    100 TB: map-only expression + one 256-group aggregate."""
    ev = tables(spark, sf_dir)["events"]
    code = ch_expr(
        "mortonEncode", F.col("user_id") % 256, F.col("event_id") % 256
    )
    return (
        ev.select(
            (F.col("user_id") % 256).alias("x"),
            (F.col("event_id") % 256).alias("y"),
            F.shiftrightunsigned(code, 8).alias("cell"),
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.max("x") - F.min("x")).cast("long").alias("x_span"),
            (F.max("y") - F.min("y")).cast("long").alias("y_span"),
        )
        .orderBy("cell")
    )


@query(
    "string_distance_suite",
    oracle="""
    WITH p AS (
        SELECT event_id,
               event_type AS a,
               concat(reverse(event_type),
                      CAST(event_id % 7 AS VARCHAR)) AS b
        FROM events WHERE event_id % 25 = 11
    )
    SELECT event_id::BIGINT AS eid,
           levenshtein(a, b) AS lev,
           CAST(damerau_levenshtein(a, b) AS BIGINT) AS dl,
           jaro_similarity(a, b) AS j,
           jaro_winkler_similarity(a, b) AS jw
    FROM p ORDER BY eid
    """,
)
def string_distance_suite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-distance family end-to-end against DuckDB's native
    implementations: builtin levenshtein plus the three Arrow-batched
    kernels (operators/text.py) — full Damerau-Levenshtein
    (Lowrance-Wagner, transposition-aware), Jaro with the
    integer-halved transposition convention, Jaro-Winkler with the 0.7
    boost threshold. The doubles are emitted UNROUNDED: the kernels are
    bit-exact against DuckDB (5000-pair fuzz), so rounding would only
    hide a real divergence. 100 TB: map-only Arrow batches, the
    sanctioned Python-boundary shape for per-pair DP loops."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 25 == 11)
    a = F.col("event_type")
    b = F.concat(
        F.reverse(F.col("event_type")), (F.col("event_id") % 7).cast("string")
    )
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        F.levenshtein(a, b).alias("lev"),
        ch_expr("damerauLevenshteinDistance", a, b).alias("dl"),
        ch_expr("jaroSimilarity", a, b).alias("j"),
        ch_expr("jaroWinklerSimilarity", a, b).alias("jw"),
    ).orderBy("eid")


@query(
    "ch_r7_function_surface_4",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, ts,
               (ts::DATE + CAST(event_id % 400 AS INT)) AS d,
               md5(CAST(user_id AS VARCHAR)) AS h
        FROM events WHERE event_id % 20 = 13
    )
    SELECT event_id::BIGINT AS eid,
           CAST(isoyear(d) AS INT) AS iso_y,
           strftime(date_trunc('week',
                    make_date(CAST(isoyear(d) AS INT), 1, 4)),
                    '%Y-%m-%d') AS iso_start,
           concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-',
                  substr(h, 13, 4), '-', substr(h, 17, 4), '-',
                  substr(h, 21, 12)) AS uu,
           concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-',
                  substr(h, 13, 4), '-', substr(h, 17, 4), '-',
                  substr(h, 21, 12)) AS u_null,
           CAST(year(d) * 12 + month(d) - 1 AS INT) AS rel_m,
           CAST(year(d) * 4 + quarter(d) - 1 AS INT) AS rel_q,
           CAST(datediff('day', DATE '1970-01-01', d) AS BIGINT) AS rel_d,
           CAST(floor((epoch(ts) + 259200) / 604800) AS BIGINT) AS rel_w,
           CAST(floor(epoch(ts) / 3600) AS BIGINT) AS rel_h,
           decode(from_base64(to_base64(CAST(concat('p', event_id % 9)
                                             AS BLOB)))) AS b64rt
    FROM e ORDER BY eid
    """,
)
def ch_r7_function_surface_4_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wave-11b names end-to-end: toISOYear vs DuckDB's native
    isoyear() (two independent ISO-8601 implementations), the
    ISO-year-start Monday derivation, the toRelative*Num ordinal
    anchors (month/quarter/day/hour arithmetic twins; the week anchor's
    +3-day Monday alignment checked over real timestamps), the UUID
    validated-lowering family over md5-built strings, and a
    base64 round trip through tryBase64Decode. 100 TB: map-only."""
    from ..session import widen_scan

    ev = widen_scan(
        tables(spark, sf_dir)["events"].filter(F.col("event_id") % 20 == 13)
    )
    d = F.date_add(F.col("ts").cast("date"), (F.col("event_id") % 400).cast("int"))
    h = F.md5(F.col("user_id").cast("string"))
    uuid_str = F.concat(
        F.substring(h, 1, 8), F.lit("-"), F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"), F.substring(h, 17, 4),
        F.lit("-"), F.substring(h, 21, 12),
    )
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        ch_expr("toISOYear", d).alias("iso_y"),
        ch_expr("toStartOfISOYear", d).cast("string").alias("iso_start"),
        ch_expr("toUUID", uuid_str).alias("uu"),
        ch_expr("toUUIDOrNull", uuid_str).alias("u_null"),
        ch_expr("toRelativeMonthNum", d).alias("rel_m"),
        ch_expr("toRelativeQuarterNum", d).alias("rel_q"),
        ch_expr("toRelativeDayNum", d).alias("rel_d"),
        ch_expr("toRelativeWeekNum", F.col("ts")).cast("long").alias(
            "rel_w"
        ),
        ch_expr("toRelativeHourNum", F.col("ts")).cast("long").alias(
            "rel_h"
        ),
        ch_expr(
            "tryBase64Decode",
            F.base64(
                F.concat(
                    F.lit("p"), (F.col("event_id") % 9).cast("string")
                ).cast("binary")
            ),
        ).alias("b64rt"),
    ).orderBy("eid")


@query(
    "ch_r7_function_surface_5",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               (CAST(event_id AS BIGINT) * 7919) % 40000000 AS s1,
               CAST(event_id AS BIGINT) % 120 AS s2
        FROM events WHERE event_id % 20 = 7
    ),
    u AS (
        SELECT *,
               s1 // 31536000 AS y1,
               (s1 % 31536000) // 2635200 AS mo1,
               ((s1 % 31536000) % 2635200) // 86400 AS d1,
               (((s1 % 31536000) % 2635200) % 86400) // 3600 AS h1,
               ((((s1 % 31536000) % 2635200) % 86400) % 3600) // 60 AS mi1,
               ((((s1 % 31536000) % 2635200) % 86400) % 3600) % 60 AS se1,
               s2 // 60 AS mi2, s2 % 60 AS se2
        FROM e
    ),
    p AS (
        SELECT *,
               list_filter([
                 CASE WHEN y1 > 0 THEN y1 || ' year'
                      || (CASE WHEN y1 = 1 THEN '' ELSE 's' END) END,
                 CASE WHEN mo1 > 0 THEN mo1 || ' month'
                      || (CASE WHEN mo1 = 1 THEN '' ELSE 's' END) END,
                 CASE WHEN d1 > 0 THEN d1 || ' day'
                      || (CASE WHEN d1 = 1 THEN '' ELSE 's' END) END,
                 CASE WHEN h1 > 0 THEN h1 || ' hour'
                      || (CASE WHEN h1 = 1 THEN '' ELSE 's' END) END,
                 CASE WHEN mi1 > 0 THEN mi1 || ' minute'
                      || (CASE WHEN mi1 = 1 THEN '' ELSE 's' END) END,
                 CASE WHEN se1 > 0 THEN se1 || ' second'
                      || (CASE WHEN se1 = 1 THEN '' ELSE 's' END) END
               ], x -> x IS NOT NULL) AS parts1,
               list_filter([
                 CASE WHEN mi2 > 0 THEN mi2 || ' minute'
                      || (CASE WHEN mi2 = 1 THEN '' ELSE 's' END) END,
                 CASE WHEN se2 > 0 THEN se2 || ' second'
                      || (CASE WHEN se2 = 1 THEN '' ELSE 's' END) END
               ], x -> x IS NOT NULL) AS parts2
        FROM u
    )
    SELECT event_id::BIGINT AS eid,
           regexp_replace(event_type, 'e', '*') AS r_one,
           regexp_replace(event_type, '[aeiou]', '#') AS rr_one,
           regexp_replace(event_type, '([aeiou])(.)', '\\2\\1') AS rr_swap,
           replace(replace(replace(replace(replace(
               '<' || event_type || '="a&b">',
               '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
               '"', '&quot;'), '''', '&apos;') AS xml,
           reverse(event_type) AS rev,
           CASE WHEN len(parts1) = 0 THEN '0 seconds'
                WHEN len(parts1) = 1 THEN parts1[1]
                ELSE array_to_string(
                         list_slice(parts1, 1, len(parts1) - 1), ', ')
                     || ' and ' || parts1[len(parts1)] END AS frtd,
           CASE WHEN len(parts2) = 0 THEN '0 seconds'
                WHEN len(parts2) = 1 THEN parts2[1]
                ELSE array_to_string(
                         list_slice(parts2, 1, len(parts2) - 1), ', ')
                     || ' and ' || parts2[len(parts2)] END AS frtd_small,
           chr(65 + CAST(event_id % 26 AS INT)) AS ub1,
           chr(65 + CAST(user_id % 26 AS INT))
               || chr(97 + CAST(event_id % 26 AS INT)) AS ub2
    FROM p ORDER BY eid
    """,
)
def ch_r7_function_surface_5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wave-12 names end-to-end (the audit's last "unclaimed" scalar
    harvest): replaceOne / replaceRegexpOne checked against DuckDB's
    native first-occurrence regexp_replace (two independent
    implementations, backreference swap included), encodeXMLComponent
    against an explicit entity replace chain, reverseUTF8, unbin
    round-tripped bin(code) -> chr(code) both one-chunk (7-bit, pad
    path) and two-chunk (16-bit), and formatReadableTimeDelta derived
    stepwise (year/365d, month/30.5d, chained remainders) on both
    sides — large deltas exercise the plural 'and' joins, event_id mod
    120 the singular/zero edge ('0 seconds'). 100 TB: map-only scalar
    surface, whole-stage codegen, no Python."""
    from ..session import widen_scan

    ev = widen_scan(
        tables(spark, sf_dir)["events"].filter(F.col("event_id") % 20 == 7)
    )
    et = F.col("event_type")
    s1 = (F.col("event_id").cast("long") * 7919) % 40000000
    s2 = F.col("event_id").cast("long") % 120
    c1 = (F.lit(65) + F.col("user_id") % 26).cast("long")
    c2 = (F.lit(97) + F.col("event_id") % 26).cast("long")
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        ch_expr("replaceOne", et, "e", "*").alias("r_one"),
        ch_expr("replaceRegexpOne", et, "[aeiou]", "#").alias("rr_one"),
        ch_expr("replaceRegexpOne", et, "([aeiou])(.)", "$2$1").alias(
            "rr_swap"
        ),
        ch_expr(
            "encodeXMLComponent",
            F.concat(F.lit("<"), et, F.lit('="a&b">')),
        ).alias("xml"),
        ch_expr("reverseUTF8", et).alias("rev"),
        ch_expr("formatReadableTimeDelta", s1).alias("frtd"),
        ch_expr("formatReadableTimeDelta", s2).alias("frtd_small"),
        ch_expr(
            "unbin", F.bin((F.lit(65) + F.col("event_id") % 26).cast("long"))
        ).alias("ub1"),
        ch_expr("unbin", F.bin(c1 * 256 + c2)).alias("ub2"),
    ).orderBy("eid")
