"""Round-11 query wave 1: surface coverage for the two-limb exact
divideDecimal / multiplyDecimal rewrite (r10 verdict #6) — inputs at and
far beyond the old |value| < 10^12 envelope, where the previous
scaled-integer machinery overflowed decimal(38) and returned NULL while
ClickHouse's Decimal256 internals compute the exact result.

Oracle style: both engines derive the truncated quotients/products
independently as SCALED INTEGERS (result·10^scale) rendered as strings —
DuckDB on HUGEINT (int128) arithmetic, Spark through the hi/lo
decimal(38,0) limb path (functions/ch.py::_decimal_div/_decimal_mul) —
so a value-hash match certifies digit-exact agreement with no float
anywhere.

Magnitude check (why this exercises the two-limb path): a_val ≈ 10^17,
so its scaled integer x_a = a_val·10^12 ≈ 10^29 and the multiply's
internal product P = x_a·x_b ≈ 10^41 exceeds a single decimal(38) limb —
the HI half is non-zero. The old code's |a·b| < 10^14 bound is exceeded
by every row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .registry import q6, query, tables


@query(
    "ch_r11_function_surface",
    oracle="""
    WITH src AS (
        SELECT l_orderkey * 10 + l_linenumber AS k,
               CAST(ROUND(l_extendedprice * 100) AS HUGEINT) AS x,
               CAST(ROUND((l_discount + 1.01) * 100) AS HUGEINT) AS z
        FROM lineitem WHERE l_orderkey < 300
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(x * 100000000000000000 // 73 AS VARCHAR) AS div_pos_s6,
           CAST(-(x * 100000000000000000 // 73) AS VARCHAR) AS div_neg_s6,
           CAST(x * z * 1000000000 AS VARCHAR) AS mul_big_s1,
           CAST((x * 1000000000000 + 57) * z // 1000 AS VARCHAR)
               AS mul_frac_s1
    FROM src ORDER BY k
    """,
)
def ch_r11_function_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """divideDecimal / multiplyDecimal beyond the old envelope, exact:

    a_val = cents·10^10 ≈ A·10^12 (A = l_extendedprice), i.e. values of
    ~10^17 ≥ the 10^12 directive bar. Four probes per row, each emitted
    as result·10^scale (integral) so the DuckDB twin can re-derive it in
    pure int128 arithmetic:

    - div_pos_s6 / div_neg_s6: divideDecimal(±a_val, 7.3, 6) — the
      unrolled long-division path; toward-zero on the negative side
      (= negated positive quotient, both engines).
    - mul_big_s1: multiplyDecimal(a_val, z/100, 1) — internal product
      ≈ 10^41, HI limb non-zero; result ≈ 10^19 exceeds int64, hence
      the string render.
    - mul_frac_s1: multiplyDecimal(a_val + 0.57, z/100, 1) — the 0.57
      cent-fraction makes the true product carry 4 fractional digits,
      so the scale-1 truncation genuinely discards digits (floor at
      work, not a no-op).

    Scale shape: pure per-row scalar expressions over a pushed-down
    filtered scan; zero shuffles (ORDER BY is the harness canonicalizer).

    Reference parity: ClickHouse divideDecimal/multiplyDecimal
    (docs/sql-reference/functions/arithmetic-functions) truncate toward
    zero at the requested scale on Decimal256 intermediates; the hi/lo
    limb emulation reproduces that digit-exactly inside decimal(38,12)
    inputs."""
    li = tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") < 300)
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("decimal(20,0)")
    a_val = (cents * F.lit(10**10).cast("decimal(11,0)")).cast(
        "decimal(38,0)"
    )
    a_frac = a_val.cast("decimal(38,2)") + F.lit("0.57").cast("decimal(4,2)")
    d_val = (
        F.round((F.col("l_discount") + 1.01) * 100, 0).cast("decimal(5,0)")
        / F.lit(100).cast("decimal(3,0)")
    ).cast("decimal(10,2)")
    seven3 = F.lit("7.3").cast("decimal(3,1)")

    def scaled(c, s: int):
        return (
            (c.cast("decimal(38,6)") * F.lit(10**s).cast("decimal(7,0)"))
            .cast("decimal(38,0)")
            .cast("string")
        )

    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("k"),
        scaled(ch_expr("divideDecimal", a_val, seven3, 6), 6).alias(
            "div_pos_s6"
        ),
        scaled(ch_expr("divideDecimal", -a_val, seven3, 6), 6).alias(
            "div_neg_s6"
        ),
        scaled(ch_expr("multiplyDecimal", a_val, d_val, 1), 1).alias(
            "mul_big_s1"
        ),
        scaled(ch_expr("multiplyDecimal", a_frac, d_val, 1), 1).alias(
            "mul_frac_s1"
        ),
    ).orderBy("k")


# ---------------------------------------------------------------------------
# ch_r11_function_surface_2 — the r11 unsupported-tail promotions
# ---------------------------------------------------------------------------

#: (unicode word, RFC 3492 punycode) — pinned from the published
#: algorithm (Python stdlib codec = the reference implementation).
_PUNY = [
    ("München", "Mnchen-3ya"),
    ("bücher", "bcher-kva"),
    ("straße", "strae-oqa"),
    ("héllo", "hllo-bpa"),
]

#: (unicode domain, IDNA/RFC 3490 ascii form, decode round-trip) — note
#: straße.de → strasse.de (transitional ß mapping, the ClickHouse
#: behavior), which is LOSSY: decoding the ascii form yields strasse.de,
#: not the original, so the decode expectation is its own column.
_IDNA = [
    ("bücher.example", "xn--bcher-kva.example", "bücher.example"),
    ("straße.de", "strasse.de", "strasse.de"),
    ("münchen.de", "xn--mnchen-3ya.de", "münchen.de"),
]

#: (hex bytes, is-valid-utf8, errors='replace' decode)
_UTF8 = [
    ("414243", 1, "ABC"),
    ("41FF42", 0, "A�B"),
    ("C3A9", 1, "é"),
    ("E282", 0, "�"),
    ("F09F988A", 1, "😊"),
    ("8041", 0, "�A"),
]


def _rot_sql(expr: str, vals: list[str]) -> str:
    arms = "\n".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(vals)
    )
    return f"CASE {expr}\n{arms}\nEND"


def _rot_col(k, vals: list[str]):
    return F.element_at(
        F.array(*[F.lit(v) for v in vals]),
        (k % len(vals) + 1).cast("int"),
    )


@query(
    "ch_r11_function_surface_2",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey AS k, o_orderdate AS d,
               o_orderpriority AS pri,
               substring(o_orderpriority, 3) || '-X' AS clerk
        FROM orders WHERE o_orderkey < 60
    ),
    g1 AS (
        SELECT k, substring(pri, i, 4) AS g, COUNT(*) AS c1
        FROM src, range(1, 21) t(i)
        WHERE i <= length(pri) - 3 GROUP BY 1, 2
    ),
    g2 AS (
        SELECT k, substring(clerk, i, 4) AS g, COUNT(*) AS c2
        FROM src, range(1, 21) t(i)
        WHERE i <= length(clerk) - 3 GROUP BY 1, 2
    ),
    j AS (
        SELECT COALESCE(g1.k, g2.k) AS k,
               COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
        FROM g1 FULL JOIN g2 ON g1.k = g2.k AND g1.g = g2.g
    ),
    ng AS (
        SELECT k,
               FLOOR(CAST(SUM(ABS(c1 - c2)) AS DOUBLE)
                     / (SUM(c1) + SUM(c2)) * 1000000 + 0.5) / 1000000
                   AS ngd,
               FLOOR(CAST(SUM(LEAST(c1, c2)) AS DOUBLE)
                     / SUM(c2) * 1000000 + 0.5) / 1000000 AS ngs
        FROM j GROUP BY k
    )
    SELECT CAST(src.k AS BIGINT) AS k,
           CAST(d AS TIMESTAMP) + INTERVAL 2 HOUR AS added,
           split_part(pri || chr(0) || 'tail', chr(0), 1) AS cutz,
           'UTC' AS tz, 'UTC' AS srvtz,
           pri AS lowcard,
           {_rot_sql('src.k % 4', [e for _, e in _PUNY])} AS puny_enc,
           {_rot_sql('src.k % 4', [w for w, _ in _PUNY])} AS puny_dec,
           {_rot_sql('src.k % 3', [e for _, e, _ in _IDNA])} AS idna_enc,
           {_rot_sql('src.k % 3', [d for _, _, d in _IDNA])} AS idna_dec,
           CAST({_rot_sql('src.k % 6', [str(v) for _, v, _ in _UTF8])}
               AS BIGINT) AS utf8_ok,
           {_rot_sql('src.k % 6', [r for _, _, r in _UTF8])} AS utf8_fix,
           ng.ngd AS ngram_dist, ng.ngs AS ngram_search
    FROM src JOIN ng ON src.k = ng.k ORDER BY k
    """,
)
def ch_r11_function_surface_2_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r11 promotions out of the reasoned-unsupported tail, each
    exercised end-to-end: addInterval (generic timestamp + INTERVAL),
    toStringCutToZero (cut at the first NUL), timeZone/serverTimeZone
    (the pinned-UTC session zone via current_timezone()),
    toLowCardinality (query-level identity), punycodeEncode/Decode and
    idnaEncode/Decode (RFC 3492/3490 via the stdlib reference codec,
    pinned vectors), isValidUTF8/toValidUTF8 (byte-level over BINARY,
    U+FFFD replacement), and ngramDistance/ngramSearch (4-byte-gram
    multiset measures — the DuckDB twin re-derives them from scratch
    with a gram-histogram FULL JOIN, so the two engines compute the
    measure independently).

    Scale shape: per-row scalar kernels over a pushed-down filtered
    scan; the only joins are the oracle-mirroring gram histograms on a
    ~20-row frame."""
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 60)
    k = F.col("o_orderkey")
    pri = F.col("o_orderpriority")
    # second gram string: the priority's tail + '-X' (shares grams with
    # pri, so distance/search are non-degenerate); the synthetic orders
    # table carries no clerk column
    clerk = F.concat(F.substring(pri, 3, 100), F.lit("-X"))
    puny_in = _rot_col(k, [w for w, _ in _PUNY])
    puny_back = _rot_col(k, [e for _, e in _PUNY])
    idna_in = _rot_col(k, [w for w, _, _ in _IDNA])
    idna_back = _rot_col(k, [e for _, e, _ in _IDNA])
    hexes = _rot_col(k, [h for h, _, _ in _UTF8])
    return o.select(
        k.cast("long").alias("k"),
        ch_expr(
            "addInterval",
            F.col("o_orderdate").cast("timestamp"),
            F.expr("INTERVAL 2 HOURS"),
        ).alias("added"),
        ch_expr(
            "toStringCutToZero",
            F.concat(pri, F.lit("\x00"), F.lit("tail")),
        ).alias("cutz"),
        ch_expr("timeZone").alias("tz"),
        ch_expr("serverTimeZone").alias("srvtz"),
        ch_expr("toLowCardinality", pri).alias("lowcard"),
        ch_expr("punycodeEncode", puny_in).alias("puny_enc"),
        ch_expr("punycodeDecode", puny_back).alias("puny_dec"),
        ch_expr("idnaEncode", idna_in).alias("idna_enc"),
        ch_expr("idnaDecode", idna_back).alias("idna_dec"),
        ch_expr("isValidUTF8", F.unhex(hexes)).alias("utf8_ok"),
        ch_expr("toValidUTF8", F.unhex(hexes)).alias("utf8_fix"),
        q6(ch_expr("ngramDistance", pri, clerk)).alias("ngram_dist"),
        q6(ch_expr("ngramSearch", pri, clerk)).alias("ngram_search"),
    ).orderBy("k")
