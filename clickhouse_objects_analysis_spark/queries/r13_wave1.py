"""Round-13 wave 1: the final mechanically-promotable unsupported-tail
band (r12 verdict #1) — 24 names promoted, plus the sipHash64 upgrade
from NBC-xxhash64 to the true Guava-validated SipHash-2-4 kernel.

``ch_r13_function_surface`` covers: no-ops identity / materialize /
ignore / concatAssumeInjective; the hash-kernel band murmurHash2_32 /
murmurHash2_64 / gccMurmurHash / murmurHash3_64 / murmurHash3_128 /
metroHash64 / farmFingerprint64 / wyHash64 / xxh3 / sipHash64;
geoDistance; sumKahan; sumWithOverflow; timeZoneOf / timeZoneOffset;
toTypeName; rand / rand32 / rand64 / randCanonical / generateUUIDv4.

Oracle strategy (the r11/r12 pattern):
- hash kernels → pinned vectors. Provenance per kernel: murmurHash3_*
  / farmFingerprint64 / sipHash64 pinned against Spark's bundled GUAVA
  reference implementations (independently validated,
  tests/test_r13_hash_kernels.py); wyHash64 matches the CH docs
  example wyHash64('ClickHouse'); murmurHash2_* transcribed from
  Appleby's public-domain spec; metroHash64/xxh3 are spec-transcribed
  and self-pinned (NON_BIT_COMPATIBLE documents the residual variant
  risk).
- geoDistance → pinned from the Andoyer-Lambert expression, rounded
  to 0.1 m (CH's float32 polynomial is NBC-documented).
- aggregates (sumKahan exact-fsum, sumWithOverflow mod-2^64 wrap) →
  DuckDB computes the same quantity live (HUGEINT wrap arithmetic).
- nondeterministic generators → boolean contract checks (range,
  UUIDv4 shape, per-call independence) that DuckDB answers TRUE.

Reference parity: every promoted name parses as a plain identifier in
the reference grammar (generated_ch_parser/ClickHouseParser.py:15571,
ColumnExprFunctionContext).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .r11_wave1 import _rot_sql
from .registry import query, tables

#: o_orderpriority → pinned kernel outputs (two's-complement BIGINT
#: rendering for the UInt64 kernels — the CRC64 convention).
#: columns: murmurHash2_32, murmurHash2_64, gccMurmurHash,
#: murmurHash3_64, murmurHash3_128 (hex), metroHash64,
#: farmFingerprint64, wyHash64, xxh3, sipHash64
_S = lambda v: v - (1 << 64) if v >= 1 << 63 else v  # noqa: E731
_PRI_HASHES: dict[str, tuple] = {
    "1-URGENT": (
        2866652185, _S(16690406000095950780), _S(13513200421010636738),
        _S(50174312779863319), "B17C54801CBE09A8A6A9430A59FFBBA8",
        _S(9085770967019194177), _S(12687569955911350966),
        _S(1863703016567473937), _S(6974033431943394111),
        _S(14881304025545970900),
    ),
    "2-HIGH": (
        3820018160, _S(9564360158206726540), _S(14951421474462733735),
        _S(12845164880877398108), "63AE0342C1CEF6603F86064CA6FFB5D2",
        _S(4311392231742674384), _S(1510206931830867796),
        _S(18003119471267776973), _S(13199556761272252295),
        _S(5962628801089331572),
    ),
    "3-MEDIUM": (
        535713185, _S(5403922537970934214), _S(3313252506318603771),
        _S(9886954443487536026), "1DF96F8137B9D2B9879AE45B993DE730",
        _S(2701001138612842624), _S(18221757559392240174),
        _S(6479733319240568704), _S(15794546983002625282),
        _S(12119877226987029173),
    ),
    "4-NOT SPECIFIED": (
        3505365662, _S(11883276417215085728), _S(12491414551909905003),
        _S(17247286620116977236), "51CAF612B3C4555D054C9D197E6F0FB2",
        _S(17031801311476687814), _S(337671425332023790),
        _S(9837061185891120749), _S(9806584963656635607),
        _S(4236648070722726687),
    ),
    "5-LOW": (
        3190964046, _S(18076928620255874294), _S(4698289477624547315),
        _S(16056201697168376869), "D24ABC0F94A54375F78E02C6CBB390AB",
        _S(4752159038202481452), _S(15958886283526079404),
        _S(8999251636253405763), _S(3201324245181176382),
        _S(4530576920128411957),
    ),
}

#: (lon1, lat1, lon2, lat2) → Andoyer-Lambert meters rounded to 0.1
#: (Chicago→Paris, Moscow→Tokyo, Sydney→Rio, coincident, London→Paris)
_GEO_VEC: list[tuple[float, float, float, float, float]] = [
    (-87.6298, 41.8781, 2.3522, 48.8566, 6668913.8),
    (37.6173, 55.7558, 139.6917, 35.6895, 7496795.9),
    (151.2093, -33.8688, -43.1729, -22.9068, 13540072.7),
    (0.1278, 51.5074, 0.1278, 51.5074, 0.0),
    (-0.1276, 51.5072, 2.3522, 48.8566, 343898.7),
]


def _hash_case_sql(idx: int) -> str:
    arms = "\n".join(
        f"WHEN '{p}' THEN {v[idx]!r}" if isinstance(v[idx], str)
        else f"WHEN '{p}' THEN CAST({v[idx]} AS BIGINT)"
        for p, v in _PRI_HASHES.items()
    )
    return f"CASE pri\n{arms}\nEND"


_UUID4_RE = (
    "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-"
    "[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
)

#: 2^58 multiplier drives the 60-key sum past 2^64 so the wrap branch
#: of sumWithOverflow is actually exercised
_WRAP_MUL = 1 << 58


@query(
    "ch_r13_function_surface",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               o_totalprice AS tp, o_orderdate AS d
        FROM orders WHERE o_orderkey < 60
    ),
    agg AS (
        SELECT ROUND(SUM(tp), 2) AS skahan,
               CAST(((SUM(CAST(k AS HUGEINT) * {_WRAP_MUL})
                      + 9223372036854775808)
                     % 18446744073709551616)
                    - 9223372036854775808 AS BIGINT) AS swrap
        FROM src
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(k AS BIGINT) AS id_k,
           pri AS mat_pri,
           CAST(0 AS INT) AS ig,
           pri || '_' || CAST(k AS VARCHAR) AS cc,
           {_hash_case_sql(0)} AS m232,
           {_hash_case_sql(1)} AS m264,
           {_hash_case_sql(2)} AS gcc,
           {_hash_case_sql(3)} AS m364,
           {_hash_case_sql(4)} AS m3128,
           {_hash_case_sql(5)} AS metro,
           {_hash_case_sql(6)} AS farm,
           {_hash_case_sql(7)} AS wy,
           {_hash_case_sql(8)} AS x3,
           {_hash_case_sql(9)} AS sip,
           {_rot_sql('k % 5', [str(v[4]) for v in _GEO_VEC])}
               AS geo_txt,
           'UTC' AS tzof,
           CAST(0 AS BIGINT) AS tzoff,
           'Int64' AS tn_k,
           'String' AS tn_pri,
           'Float64' AS tn_tp,
           'Date32' AS tn_d,
           'Array(Float64)' AS tn_arr,
           'Map(String, Int32)' AS tn_map,
           agg.skahan AS skahan,
           agg.swrap AS swrap,
           TRUE AS rand_ok,
           TRUE AS r32_ok,
           TRUE AS r64_ok,
           TRUE AS rc_ok,
           TRUE AS uuid_ok
    FROM src, agg ORDER BY k
    """,
)
def ch_r13_function_surface_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r13 unsupported-tail promotions, each exercised end-to-end
    (see module docstring for the per-family oracle provenance).

    Scale shape: per-row scalar kernels over one pushed-down filtered
    scan; the two aggregate promotions ride a 1-row broadcast
    cross-join (no shuffle of the fact side); the hash kernels batch
    per-partition through Arrow."""
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 60)
    k = F.col("o_orderkey").cast("long")
    pri = F.col("o_orderpriority")
    geo_d = ch_expr(
        "geoDistance",
        _rot_elem(k, [v[0] for v in _GEO_VEC]),
        _rot_elem(k, [v[1] for v in _GEO_VEC]),
        _rot_elem(k, [v[2] for v in _GEO_VEC]),
        _rot_elem(k, [v[3] for v in _GEO_VEC]),
    )
    # pandas grouped-agg UDFs can't share an agg() with built-in
    # aggregates — two 1-row frames, both broadcast
    agg_k = o.agg(
        F.round(ch_expr("sumKahan", F.col("o_totalprice")), 2).alias(
            "skahan"
        )
    )
    agg_w = o.agg(
        ch_expr(
            "sumWithOverflow",
            F.col("o_orderkey").cast("decimal(38,0)")
            * F.lit(_WRAP_MUL),
        ).alias("swrap")
    )
    r64_a = ch_expr("rand64")
    r64_b = ch_expr("rand64")
    return (
        o.crossJoin(F.broadcast(agg_k))
        .crossJoin(F.broadcast(agg_w))
        .select(
            k.alias("k"),
            ch_expr("identity", k).alias("id_k"),
            ch_expr("materialize", pri).alias("mat_pri"),
            ch_expr("ignore", k, pri).alias("ig"),
            ch_expr(
                "concatAssumeInjective",
                pri, F.lit("_"), k.cast("string"),
            ).alias("cc"),
            ch_expr("murmurHash2_32", pri).alias("m232"),
            ch_expr("murmurHash2_64", pri).alias("m264"),
            ch_expr("gccMurmurHash", pri).alias("gcc"),
            ch_expr("murmurHash3_64", pri).alias("m364"),
            F.hex(ch_expr("murmurHash3_128", pri)).alias("m3128"),
            ch_expr("metroHash64", pri).alias("metro"),
            ch_expr("farmFingerprint64", pri).alias("farm"),
            ch_expr("wyHash64", pri).alias("wy"),
            ch_expr("xxh3", pri).alias("x3"),
            ch_expr("sipHash64", pri).alias("sip"),
            # compare as the rounded decimal's string to sidestep
            # DOUBLE-vs-VARCHAR schema hashing; 0.1 m quantization
            # (decimal cast avoids double→string scientific notation)
            F.round(geo_d, 1)
            .cast("decimal(18,1)")
            .cast("string")
            .alias("geo_txt"),
            ch_expr("timeZoneOf", F.current_timestamp()).alias("tzof"),
            ch_expr("timeZoneOffset", F.current_timestamp()).alias(
                "tzoff"
            ),
            ch_expr("toTypeName", k).alias("tn_k"),
            ch_expr("toTypeName", pri).alias("tn_pri"),
            ch_expr("toTypeName", F.col("o_totalprice")).alias("tn_tp"),
            ch_expr(
                "toTypeName", F.col("o_orderdate").cast("date")
            ).alias("tn_d"),
            ch_expr("toTypeName", F.array(F.lit(1.5))).alias("tn_arr"),
            ch_expr(
                "toTypeName", F.create_map(F.lit("a"), F.lit(1))
            ).alias("tn_map"),
            F.col("skahan"),
            F.col("swrap"),
            ch_expr("rand").between(0, (1 << 32) - 1).alias("rand_ok"),
            ch_expr("rand32")
            .between(0, (1 << 32) - 1)
            .alias("r32_ok"),
            (r64_a.isNotNull() & (r64_a != r64_b)).alias("r64_ok"),
            (
                (ch_expr("randCanonical") >= 0)
                & (ch_expr("randCanonical") < 1)
            ).alias("rc_ok"),
            ch_expr("generateUUIDv4")
            .rlike(_UUID4_RE)
            .alias("uuid_ok"),
        )
        .orderBy("k")
    )


def _rot_elem(k, vals: list[float]):
    return F.element_at(
        F.array(*[F.lit(float(v)) for v in vals]),
        (k % len(vals) + 1).cast("int"),
    )


#: o_orderpriority → pinned cipher/digest outputs for the fixed
#: key/iv below. Provenance: the AES core is validated against the
#: FIPS-197 and NIST SP 800-38A known-answer vectors in
#: tests/test_r13_functions_2.py (the cipher runs JVM-side via Spark's
#: aes_encrypt); these per-priority vectors pin the CH output-layout
#: adaptation (PKCS#7, CBC/GCM iv-prefix strip, MySQL key fold). MD4
#: pinned from the RFC 1320 kernel (RFC test suite asserted in tests).
#: columns: aes-128-ecb, aes-128-cbc(iv), aes-128-gcm(iv12) = ct||tag,
#: aes_encrypt_mysql(folded 26-byte key), MD4
_PRI_CIPHER: dict[str, tuple[str, str, str, str, str]] = {
    "1-URGENT": (
        "CA6E45ADACA586461B9E1086DE40316D",
        "6BF0FA1AE4B3E7C0FC2B8DFC97241C0D",
        "A241F29C215EB9003BC59D8E9B16C97C9E5FA0C2968C5C8D",
        "D8DF3E6C83C3FA93DFBFD91E192AEC01",
        "7AFA44EBF6714544C5FE6D0A86056D4B",
    ),
    "2-HIGH": (
        "682D2028B00B42A09E89F42AA55C3550",
        "E672CA2F88BF6B0ADA5C87A26E334E2A",
        "A141EF8721531A6BB0634276C19A71D6DBAC747D4C24",
        "9F15A16FEEEF1E113BA3936DE50E3D62",
        "6357853FA98A1BE70BD096AABE16F50E",
    ),
    "3-MEDIUM": (
        "1092ADDC7A642CEB06C1C6605D50CE88",
        "7B76819AC5943A11F1D555022F0E54A6",
        "A041EA8B2252A219995E435CE894C10D223420F0913F3375",
        "3B9B04F24A467965971A640D8F244F3D",
        "28514BAFF70488BFB2FE3B56BD5F9738",
    ),
    "4-NOT SPECIFIED": (
        "DAD7F78679C89EC701002A3101644B5E",
        "96BB4F6C06017D4799E431C7FDAB27CA",
        "A741E981323BA4040E9128CC7FE634DC5130DF5F910F0DE1B5B36C132A08B3",
        "DCEC5561BB97400B910BB075277D70F6",
        "4BF13E02FCAAA1E45F1B7E6B71CF46A4",
    ),
    "5-LOW": (
        "BCEF73D3239685C4CBE88956208D4E99",
        "AED59ABEB4B10277BC3C06065F610AC5",
        "A641EB8131567217812301FCFC632CBA7BB07712A7",
        "6B273EA2704BA75A9B31396F9F22DD3E",
        "481CBAE420459E066018A70F360AB61C",
    ),
}

_KEY16 = bytes(range(16))
_IV16 = bytes(range(16))


def _cipher_case_sql(idx: int) -> str:
    arms = "\n".join(
        f"WHEN '{p}' THEN '{v[idx]}'" for p, v in _PRI_CIPHER.items()
    )
    return f"CASE pri\n{arms}\nEND"


@query(
    "ch_r13_function_surface_2",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri, o_orderdate AS d
        FROM orders WHERE o_orderkey < 60
    )
    SELECT CAST(k AS BIGINT) AS k,
           strftime(d, '%Y/%m/%d') AS joda_fmt,
           strftime(to_timestamp(k * 86400), '%Y-%m-%d %H:%M:%S')
               AS joda_from_unix,
           TIMESTAMP '2024-05-01 12:34:56' AS joda_parse,
           {_cipher_case_sql(0)} AS aes_ecb,
           {_cipher_case_sql(1)} AS aes_cbc,
           {_cipher_case_sql(2)} AS aes_gcm,
           {_cipher_case_sql(3)} AS aes_mysql,
           {_cipher_case_sql(4)} AS md4_hex,
           pri AS rt_ecb,
           pri AS rt_cbc,
           pri AS rt_gcm,
           pri AS rt_mysql,
           TRUE AS tryd_null,
           '"' || replace(pri, '"', '""') || '",' || CAST(k AS VARCHAR)
               || ',\\N' || chr(10) AS frow_csv,
           pri || chr(9) || CAST(k AS VARCHAR) AS frow_tsv,
           TRUE AS rn_ok, TRUE AS ru_ok, TRUE AS rln_ok, TRUE AS rb_ok,
           TRUE AS rs_ok, TRUE AS rpa_ok, TRUE AS fuzz_ok,
           TRUE AS host_ok, TRUE AS fqdn_ok, TRUE AS ver_ok,
           TRUE AS up_ok, TRUE AS suid_ok, TRUE AS qid_ok,
           TRUE AS tid_ok, TRUE AS bsz_ok, TRUE AS bno_ok,
           TRUE AS rnb_ok, TRUE AS rnab_ok,
           'en' AS lang, 'UTF-8' AS cs_utf8, 'WINDOWS-1252' AS cs_1252
    FROM src ORDER BY k
    """,
)
def ch_r13_function_surface_2_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r13 band-2 promotions (32 names): Joda-syntax datetime trio
    (Spark's native pattern dialect), the AES encrypt/decrypt family
    (JVM cipher, CH output layout — see _PRI_CIPHER provenance),
    random distributions (contract checks), MD4, formatRow CSV/TSV,
    the block/server introspection set, and the model-free
    detectLanguage/detectCharset heuristics (NON_BIT_COMPATIBLE).

    Scale shape: per-row scalar kernels over one pushed-down filtered
    scan; the AES calls are whole-stage-codegen JVM expressions, the
    distribution/byte generators are vectorized numpy Arrow batches."""
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 60)
    k = F.col("o_orderkey").cast("long")
    pri = F.col("o_orderpriority")
    d = F.col("o_orderdate").cast("date")
    uuid_re = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{3,4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    rt = lambda mode, iv=None: ch_expr(  # noqa: E731
        "decrypt", mode,
        ch_expr("encrypt", mode, pri, F.lit(_KEY16), *(
            [F.lit(iv)] if iv is not None else []
        )),
        F.lit(_KEY16), *([F.lit(iv)] if iv is not None else []),
    ).cast("string")
    rn = ch_expr("randNormal", 10.0, 2.0)
    rb = ch_expr("randBinomial", 10, 0.5)
    return o.select(
        k.alias("k"),
        ch_expr("formatDateTimeInJodaSyntax", d, "yyyy/MM/dd").alias(
            "joda_fmt"
        ),
        ch_expr(
            "fromUnixTimestampInJodaSyntax",
            k * 86400, "yyyy-MM-dd HH:mm:ss",
        ).alias("joda_from_unix"),
        ch_expr(
            "parseDateTimeInJodaSyntax",
            F.lit("2024-05-01 12:34:56"), "yyyy-MM-dd HH:mm:ss",
        ).alias("joda_parse"),
        F.hex(ch_expr("encrypt", "aes-128-ecb", pri, F.lit(_KEY16))).alias(
            "aes_ecb"
        ),
        F.hex(
            ch_expr("encrypt", "aes-128-cbc", pri, F.lit(_KEY16), F.lit(_IV16))
        ).alias("aes_cbc"),
        F.hex(
            ch_expr(
                "encrypt", "aes-128-gcm", pri, F.lit(_KEY16),
                F.lit(_IV16[:12]),
            )
        ).alias("aes_gcm"),
        F.hex(
            ch_expr(
                "aes_encrypt_mysql", "aes-128-ecb", pri,
                "longer_than_16_bytes_key!!",
            )
        ).alias("aes_mysql"),
        F.hex(ch_expr("MD4", pri)).alias("md4_hex"),
        rt("aes-128-ecb").alias("rt_ecb"),
        rt("aes-128-cbc", _IV16).alias("rt_cbc"),
        rt("aes-128-gcm", _IV16[:12]).alias("rt_gcm"),
        ch_expr(
            "aes_decrypt_mysql", "aes-128-ecb",
            ch_expr(
                "aes_encrypt_mysql", "aes-128-ecb", pri,
                "longer_than_16_bytes_key!!",
            ),
            "longer_than_16_bytes_key!!",
        ).cast("string").alias("rt_mysql"),
        ch_expr(
            "tryDecrypt", "aes-128-gcm", F.lit(b"too-short"),
            F.lit(_KEY16), F.lit(_IV16[:12]),
        ).isNull().alias("tryd_null"),
        ch_expr("formatRow", "CSV", pri, k, F.lit(None).cast("int")).alias(
            "frow_csv"
        ),
        ch_expr("formatRowNoNewline", "TSV", pri, k).alias("frow_tsv"),
        rn.between(10.0 - 16.0, 10.0 + 16.0).alias("rn_ok"),
        ch_expr("randUniform", 5.0, 6.0)
        .between(5.0, 6.0)
        .alias("ru_ok"),
        (ch_expr("randLogNormal", 0.0, 1.0) > 0).alias("rln_ok"),
        rb.between(0, 10).alias("rb_ok"),
        (F.length(ch_expr("randomString", 8)) == 8).alias("rs_ok"),
        ch_expr("randomPrintableASCII", 12)
        .rlike("^[ -~]{12}$")
        .alias("rpa_ok"),
        (
            F.length(ch_expr("fuzzBits", pri, 0.1))
            == F.octet_length(pri)
        ).alias("fuzz_ok"),
        (F.length(ch_expr("hostName")) > 0).alias("host_ok"),
        (F.length(ch_expr("FQDN")) > 0).alias("fqdn_ok"),
        (F.length(ch_expr("version")) > 0).alias("ver_ok"),
        (ch_expr("uptime") >= 0).alias("up_ok"),
        ch_expr("serverUUID").rlike(uuid_re).alias("suid_ok"),
        ch_expr("queryID").rlike(uuid_re).alias("qid_ok"),
        (ch_expr("tid") > 0).alias("tid_ok"),
        (ch_expr("blockSize") >= 1).alias("bsz_ok"),
        (ch_expr("blockNumber") >= 0).alias("bno_ok"),
        (
            (ch_expr("rowNumberInBlock") >= 0)
            & (ch_expr("rowNumberInBlock") < ch_expr("blockSize"))
        ).alias("rnb_ok"),
        (ch_expr("rowNumberInAllBlocks") >= 0).alias("rnab_ok"),
        ch_expr(
            "detectLanguage",
            F.lit("the quick brown fox and the lazy dog were friends"),
        ).alias("lang"),
        ch_expr("detectCharset", F.lit("plain ascii text")).alias(
            "cs_utf8"
        ),
        ch_expr("detectCharset", F.lit(b"caf\xe9 latin-1")).alias(
            "cs_1252"
        ),
    ).orderBy("k")
