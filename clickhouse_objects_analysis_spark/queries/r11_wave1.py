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
from .registry import query, tables


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
