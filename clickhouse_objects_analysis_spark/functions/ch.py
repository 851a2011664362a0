"""ClickHouse scalar/aggregate function-name translation table (SURVEY §2.B
"Generic function call", grammar anchor ClickHouseParser.py:15571; §7 names
this table a core deliverable).

Each entry maps a ClickHouse function name to a builder over pyspark
Columns. Shims encode the semantic deltas, not just renames:
- array subscripts are 1-indexed on both sides (element_at) — but
  ClickHouse `indexOf` returns 0 for missing (array_position agrees);
- ClickHouse integer division `intDiv` truncates toward zero;
- `position` is 1-based, 0 when absent (instr agrees);
- date functions return ClickHouse's UInt shapes — we return Spark-native
  types and document the delta instead of widening.

Usage: ``ch_expr("replaceAll", col, F.lit("a"), F.lit("b"))`` or grab the
Spark builder via ``translate_name``.
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column

from ..operators.text import damerau_levenshtein as _text_damerau
from ..operators.text import jaro_similarity as _text_jaro
from ..operators.text import jaro_winkler_similarity as _text_jaro_winkler

Builder = Callable[..., Column]

#: Mappings whose OUTPUT VALUES are not bit-compatible with ClickHouse —
#: same contract (deterministic 64-bit hash / cardinality sketch /
#: quantile sketch), different algorithm, so persisted values won't match
#: a ClickHouse instance byte-for-byte. Callers migrating stored hashes
#: must re-hash; sketches must not be merged across engines.
NON_BIT_COMPATIBLE: frozenset[str] = frozenset(
    {
        "cityHash64",  # → xxhash64 (different 64-bit hash family)
        # (sipHash64 left this set in r13: true SipHash-2-4 kernel,
        # Guava-validated bit-exact — functions/hash_kernels.py)
        "xxHash64",  # same algorithm, different seed (Spark 42, CH 0)
        "farmHash64",  # → xxhash64
        "uniq",  # → Spark HLL++ (different sketch + bias tables)
        "uniqHLL12",  # → Spark HLL++
        "uniqCombined",  # → Spark HLL++
        "uniqCombined64",  # → Spark HLL++
        "quantileTDigest",  # → Spark percentile_approx (KLL-style sketch)
        "murmurHash3_32",  # same algorithm, different seed (Spark 42, CH 0)
        "URLHash",  # → xxhash64 of the trail-stripped URL
        # → Porter 1980 ("porter1"); ClickHouse stems with Snowball
        # English ("porter2"), which differs on a minority of forms
        # (e.g. ties → CH 'tie' vs porter1 'ti', dying → 'die' vs 'dy').
        # Same contract (deterministic English suffix stripper), not the
        # same stemmed vocabulary — re-stem when migrating.
        "stem",
        # r12: raw-JSON extraction re-serializes the subtree compactly
        # (json.dumps separators=(',',':')) — CH returns the raw slice
        # of the original document, so outputs differ only when the
        # input carries whitespace between tokens. Identical on compact
        # documents; DuckDB's json_extract normalizes the same way.
        # (simpleJSONExtractRaw is NOT in this set: r13 gave it the
        # true first-occurrence raw-slice scan, bit-compatible modulo
        # whitespace tolerance between the key quote and the colon.)
        "JSONExtractRaw",
        "JSONExtractKeysAndValuesRaw",
        "JSONExtractArrayRaw",
    }
)


def _literal_sep(sep) -> str:
    """concat_ws needs a Python-string separator; reject Column args the
    same way _regex_quote does."""
    if isinstance(sep, Column):
        raise TypeError("concatWithSeparator separator must be a literal")
    return str(sep)


def _floor_interval(c: Column, secs: int) -> Column:
    """Floor a timestamp to an arbitrary ``secs`` bucket (the generalized
    date_trunc backing toStartOfInterval/FiveMinutes/…/timeSlot)."""
    return F.timestamp_seconds(
        F.unix_seconds(c) - F.pmod(F.unix_seconds(c), F.lit(secs))
    )


def _regex_quote(sep) -> str:
    """Java Pattern.quote: wrap in \\Q..\\E, splicing any embedded \\E."""
    if isinstance(sep, Column):
        raise TypeError("splitByChar/splitByString separator must be a literal")
    return "\\Q" + str(sep).replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _if(cond: Column, a: Column, b: Column) -> Column:
    return F.when(cond, a).otherwise(b)


# --- exact unsigned-64-bit arithmetic inside Catalyst (round 8) ---
# Spark 4 runs ANSI mode, so BIGINT ops THROW on overflow instead of
# wrapping; the ClickHouse integer-hash family (intHash32/intHash64) is
# defined over wrapping uint64 ops.  DECIMAL(38,0) holds 2^64·2^32 with
# room to spare, so every mod-2^64 step stays exact JVM-side (no UDF):
# multiply against a 64-bit constant splits the constant into 32-bit
# halves (operand·half < 2^96 < 10^38), shifts are decimal multiplies,
# and xor hops through signed BIGINT where Spark's bitwiseXOR lives.

_D38 = "decimal(38,0)"


def _u64_two64() -> Column:
    return F.lit("18446744073709551616").cast(_D38)


def _u64_from_long(c: Column) -> Column:
    """Signed BIGINT reinterpreted as uint64 in DECIMAL(38,0).

    Branch-free on purpose: Column expressions have no common
    subexpression sharing, so a WHEN that mentions its argument three
    times cubes the tree size at every pipeline step — pmod mentions it
    once (pmod(-5, 2^64) already lands in [0, 2^64))."""
    return F.pmod(c.cast(_D38), _u64_two64())


def _u64_to_long(d: Column) -> Column:
    """uint64-in-decimal back to the signed BIGINT bit pattern
    (branch-free: ((d + 2^63) mod 2^64) - 2^63)."""
    half = F.lit("9223372036854775808").cast(_D38)
    return (F.pmod(d + half, _u64_two64()) - half).cast("long")


def _u64_mulmod(d: Column, const: int) -> Column:
    """(d * const) mod 2^64 with const split into 32-bit halves."""
    hi, lo = const >> 32, const & 0xFFFFFFFF
    two32 = F.lit(4294967296).cast(_D38)
    t_lo = F.pmod(d * F.lit(lo).cast(_D38), _u64_two64())
    t_hi = F.pmod(d * F.lit(hi).cast(_D38), two32) * two32
    return F.pmod(t_lo + t_hi, _u64_two64())


def _u64_xorshr(d: Column, n: int) -> Column:
    """d XOR (d >>> n): xor runs on the signed-BIGINT bit pattern."""
    s = _u64_to_long(d)
    return _u64_from_long(s.bitwiseXOR(F.shiftrightunsigned(s, n)))


def _u64_shl(d: Column, n: int) -> Column:
    return F.pmod(d * F.lit(1 << n).cast(_D38), _u64_two64())


# The SQL-layer salts ClickHouse applies before the mix primitives
# (FunctionsHashing.h IntHash64Impl / IntHash32Impl): the SQL functions
# are NOT the bare Hash.h primitives — intHash64(x) =
# fmix64(x ^ 0x4CF2D2BAAE6DA887), intHash32(x) =
# wang_mix(x ^ 0x75D9543DE018BF45) where the mix's first xor-shift is a
# 64-bit ROTATE: key ^ ((key >> 31) | (key << 33)).
_INT_HASH64_SALT = 0x4CF2D2BAAE6DA887  # fits signed i64 (top nibble 4)
_INT_HASH32_SALT = 0x75D9543DE018BF45  # fits signed i64 (top nibble 7)


def _int_hash64(c: Column) -> Column:
    """ClickHouse SQL intHash64 — fmix64 over the salted input
    (FunctionsHashing.h IntHash64Impl: Hash.h intHash64 applied to
    x ^ 0x4CF2D2BAAE6DA887), bit-exact including the salt."""
    s = c.cast("long").bitwiseXOR(F.lit(_INT_HASH64_SALT))
    d = _u64_from_long(s)
    d = _u64_xorshr(d, 33)
    d = _u64_mulmod(d, 0xFF51AFD7ED558CCD)
    d = _u64_xorshr(d, 33)
    d = _u64_mulmod(d, 0xC4CEB9FE1A85EC53)
    d = _u64_xorshr(d, 33)
    return _u64_to_long(d)


def _u64_rotxor(d: Column, n: int) -> Column:
    """d XOR rotate_right(d, n) — i.e. d ^ ((d >>> n) | (d << 64-n)),
    on the signed-BIGINT bit pattern (shift-left wraps mod 2^64 in the
    JVM, which is exactly the uint64 semantics needed)."""
    s = _u64_to_long(d)
    rot = F.shiftrightunsigned(s, n).bitwiseOR(F.shiftleft(s, 64 - n))
    return _u64_from_long(s.bitwiseXOR(rot))


def _int_hash32(c: Column) -> Column:
    """ClickHouse SQL intHash32 — Thomas Wang's 64→32-bit mix over the
    salted input (FunctionsHashing.h IntHash32Impl: salt
    0x75D9543DE018BF45, and the mix's first xor-shift step is the
    ROTATE variant key ^ ((key >> 31) | (key << 33)), Hash.h
    intHash32<salt>). Returns the uint32 value as BIGINT."""
    s = c.cast("long").bitwiseXOR(F.lit(_INT_HASH32_SALT))
    d = _u64_from_long(s)
    d = F.pmod(_u64_two64() - 1 - d + _u64_shl(d, 18), _u64_two64())
    d = _u64_rotxor(d, 31)
    d = _u64_mulmod(d, 21)
    d = _u64_xorshr(d, 11)
    d = F.pmod(d + _u64_shl(d, 6), _u64_two64())
    d = _u64_xorshr(d, 22)
    return F.pmod(d, F.lit(4294967296).cast(_D38)).cast("long")


def _week_mode0(c: Column) -> Column:
    """MySQL/ClickHouse week mode 0: weeks start Sunday, week 1 is the
    first week WITH a Sunday this year, earlier days are week 0."""
    d = c.cast("date")
    jan1 = F.make_date(F.year(d), F.lit(1), F.lit(1))
    off = (7 - (F.dayofweek(jan1) - 1)) % 7  # days until first Sunday
    doy0 = F.dayofyear(d) - 1
    return F.when(doy0 < off, F.lit(0)).otherwise(
        F.floor((doy0 - off) / 7).cast("int") + 1
    )


def _yearweek_mode0(c: Column) -> Column:
    """yyyy*100+ww with mode-0 week-0 days rolled into the previous
    year's last week (the MySQL YEARWEEK convention CH follows)."""
    d = c.cast("date")
    prev_end = F.make_date(F.year(d) - 1, F.lit(12), F.lit(31))
    return F.when(
        _week_mode0(d) == 0,
        (F.year(d) - 1) * 100 + _week_mode0(prev_end),
    ).otherwise(F.year(d) * 100 + _week_mode0(d))


# Normal quantiles for the closed-form power/sample-size shims: Spark
# and DuckDB both lack an inverse normal CDF, so the supported
# power/alpha grid carries the constants explicitly (scipy-checked).
_Z_ALPHA_2 = {0.05: 1.9599639845400545, 0.01: 2.5758293035489004}
_Z_POWER = {
    0.8: 0.8416212335729143,
    0.9: 1.2815515655446004,
    0.95: 1.6448536269514722,
}

#: Bitcoin base58 alphabet (no 0/O/I/l).
_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _dec_div(v: Column, d: int) -> Column:
    """Exact floor(v / d) for a non-negative integral DECIMAL(38,0) v:
    subtract the exact pmod remainder first, so the decimal division is
    of an exact multiple and can never be bent by scale rounding (a
    plain decimal divide rounds HALF_UP at the result scale, which
    would corrupt floor() whenever the true fraction is ≥ .9999995).
    The literal goes through a string so divisors beyond long range
    (10^24 in _decimal_mul) parse exactly.

    TYPE BOUND (r11 review finding): Spark types decimal(38,0) division
    as decimal(38,6) — only 32 INTEGER digits — so the quotient must be
    < 10^32 or the division itself overflows (a throw under the
    session's ANSI default, not a NULL). Callers whose quotient can
    reach 10^32 must go through _dec_div_pow10 / _dec_div_col_wide."""
    dd = F.lit(str(d)).cast(_D38)
    return (v - F.pmod(v, dd)) / dd


def _dec_div_pow10(v: Column, s: int) -> Column:
    """Exact floor(v / 10^s) in DECIMAL(38,0) for ANY non-negative
    integral decimal(38,0) v — safe where _dec_div is not: for s ≤ 6
    the quotient can exceed the decimal(38,6) division type's 10^32
    integer capacity, so it is computed via a 10^6 hop (q6 = v div
    10^6 < 10^32 always, then q6·10^(6-s) + (v mod 10^6) div 10^s,
    every term bounded and exact)."""
    if s == 0:
        return v
    if s >= 7:
        return _dec_div(v, 10**s).cast(_D38)
    q6 = _dec_div(v, 10**6).cast(_D38)
    rem6 = F.pmod(v, F.lit(10**6).cast(_D38))
    return (
        q6 * F.lit(10 ** (6 - s)).cast("decimal(7,0)")
        + _dec_div(rem6, 10**s).cast(_D38)
    ).cast(_D38)


def _dec_div_col(n: Column, d: Column) -> Column:
    """_dec_div with a COLUMN divisor: exact floor(n / d) for
    non-negative integral DECIMAL(38,0) n and positive integral
    DECIMAL(38,0) d (same remainder-subtraction trick). Same 10^32
    QUOTIENT bound as _dec_div — use _dec_div_col_wide when n/d can
    reach it."""
    return ((n - F.pmod(n, d)) / d).cast(_D38)


def _dec_div_col_wide(n: Column, d: Column) -> Column:
    """Exact floor(n / d) for quotients up to the full 10^38, divisor
    d < 10^31: schoolbook division in base 10^6 — q_hi = (n div 10^6)
    div d (quotient < 10^32, inside the type bound), then the remainder
    r = (n div 10^6 mod d)·10^6 + (n mod 10^6) < d·10^6 < 10^37 yields
    the low 6 digits with a plain _dec_div_col (quotient < 10^6)."""
    nh = _dec_div_pow10(n, 6)
    nl = F.pmod(n, F.lit(10**6).cast(_D38))
    qh = _dec_div_col(nh, d)
    r = (
        F.pmod(nh, d) * F.lit(10**6).cast("decimal(7,0)") + nl
    ).cast(_D38)
    return (
        qh * F.lit(10**6).cast("decimal(7,0)") + _dec_div_col(r, d)
    ).cast(_D38)


#: Fixed input quantization for divideDecimal/multiplyDecimal: inputs
#: are taken exact to 12 fractional digits at decimal(38,12), so
#: |value| < 10^26 (Decimal128-grade range; overflow yields NULL,
#: matching Spark decimal overflow under ANSI-off). r10 verdict #6
#: lifted the old decimal(24,12) envelope (|value| < 10^12): wide
#: intermediates now run on two decimal(38,0) limbs — the same hi/lo
#: trick as the tukey_hsd s2 sums — emulating the Decimal256 math
#: ClickHouse uses internally.
_DEC_IN = "decimal(38,12)"
_DEC_IN_POW = 10**12

#: Two-limb base: limbs < 10^19, so any limb product < 10^38 stays
#: exact in DECIMAL(38,0).
_LIMB = 10**19


def _dec_scaled_int(c: Column) -> Column:
    """|c| as an exact scaled integer (value·10^12) in DECIMAL(38,0),
    for |value| < 10^26 (NULL beyond). Assembled as
    floor(|v|)·10^12 + frac(|v|)·10^12 — the direct decimal(38,12)
    multiply would exceed precision 38 and round; both pieces here are
    exact (floor < 10^26, frac·10^12 integral < 10^12) and their
    recombination stays under 10^38."""
    v = F.abs(c.try_cast(_DEC_IN))
    ip = F.floor(v).cast(_D38)
    fr = (F.pmod(v, F.lit(1).cast(_DEC_IN)) * F.lit(_DEC_IN_POW).cast(
        "decimal(13,0)"
    )).cast(_D38)
    return ip * F.lit(_DEC_IN_POW).cast("decimal(13,0)") + fr


#: Value-level limb split point: |v| < 10^26 splits at 10^7 so that
#: hi = v div 10^7 < 10^19 and lo = (v mod 10^7)·10^12 < 10^19 — each
#: limb of v·10^12 lands under 10^19 WITHOUT ever materializing the
#: full 38-digit scaled integer (fewer per-row decimal ops; these
#: expressions sit under CaseWhen branches where Spark's subexpression
#: elimination cannot hoist, so every op counts per row).
_S7 = 10**7


def _dec_limbs(c: Column) -> tuple[Column, Column]:
    """(hi, lo) DECIMAL(38,0) limbs of |c|·10^12 at base 10^19:
    |c|·10^12 = hi·10^19 + lo, 0 ≤ lo < 10^19, hi < 10^19."""
    v = F.abs(c.try_cast(_DEC_IN))
    s7 = F.lit(_S7).cast("decimal(8,0)")
    v_lo = F.pmod(v, s7)
    hi = ((v - v_lo) / s7).cast(_D38)
    lo = (v_lo * F.lit(_DEC_IN_POW).cast("decimal(13,0)")).cast(_D38)
    return hi, lo


def _dec_render(sign: Column, q: Column, scale: int) -> Column:
    """Render a non-negative integral DECIMAL(38,0) q (the result value
    scaled by 10^scale) as DECIMAL(38,scale) EXACTLY.

    For scale ≤ 6 the value is q · 10^-scale as ONE decimal multiply:
    a decimal(s,s) reciprocal literal preserves the result scale
    exactly (product type (38,s), value q/10^s with s terminating
    digits — verified exact at the 10^38−1 boundary), referencing q
    once. A q/10^scale DIVISION would instead be typed decimal(38,6)
    and overflow its 32-integer-digit capacity for q ≥ 10^(32+scale)
    (the r11 review finding). Beyond 6 a division's quotient would be
    rounded at the adjusted scale (verified: a 29-digit integer / 10^10
    comes back rounded at 6), so the digits are assembled through
    strings instead; fp is shared so q is referenced twice, not three
    times."""
    if scale == 0:
        return (sign * q).cast("decimal(38,0)")
    if scale <= 6:
        recip = F.lit("0." + "0" * (scale - 1) + "1").cast(
            f"decimal({scale},{scale})"
        )
        res = (q * recip).cast(f"decimal(38,{scale})")
        return (sign.cast("decimal(1,0)") * res).cast(f"decimal(38,{scale})")
    fp_raw = F.pmod(q, F.lit(10**scale).cast(_D38))
    ip = ((q - fp_raw) / F.lit(10**scale).cast(_D38)).cast(_D38).cast(
        "string"
    )
    fp = F.lpad(fp_raw.cast(_D38).cast("string"), scale, "0")
    txt = F.concat(
        F.when(sign < 0, F.lit("-")).otherwise(F.lit("")),
        ip,
        F.lit("."),
        fp,
    )
    return txt.cast(f"decimal(38,{scale})")


def _decimal_div(a: Column, b: Column, scale: int) -> Column:
    """ClickHouse divideDecimal(a, b, scale): a / b truncated TOWARD
    ZERO at exactly `scale` fractional digits, exact over the widened
    envelope |a| < 10^26 (full decimal(38,12) width), |b| < 10^13
    (result must fit 38 digits; NULL beyond, like Spark decimal
    overflow).

    floor(|a|·10^(12+scale) / (|b|·10^12)) is computed WITHOUT ever
    materializing the (up to 10^(38+scale)) numerator: integer-divide
    first (q0 = xa div xb, r = xa mod xb — both < 10^38), then emit the
    fractional digits by long division in chunks of up to 13 digits
    (the divisor envelope |b| < 10^13 ⇒ xb < 10^25 keeps r·10^13 inside
    DECIMAL(38,0)) — the Decimal256-grade intermediate of r10 verdict
    #6, without ever holding it in one value. Each chunk is an exact
    floor, so no engine rounding can reach the result. Expression-tree
    discipline: remainder chains stay linear (r' = pmod(r·10^c, xb)),
    because these trees evaluate per row with no subexpression
    hoisting."""
    if scale > 37:
        # decimal(38,scale) cannot hold any integer digits past 37 —
        # ClickHouse's Decimal256 result scales beyond that are outside
        # the engine's 38-digit result envelope; fail at plan build
        # like stem() does for unsupported languages.
        raise ValueError(
            "divideDecimal: result scale beyond 37 exceeds the "
            "decimal(38,scale) result envelope"
        )
    ia = _dec_scaled_int(a)
    # decimal(25,12) enforces the divisor envelope |b| < 10^13 for free
    # (cast overflow → NULL, like every other out-of-envelope input)
    ib = _dec_scaled_int(b.try_cast("decimal(25,12)"))
    # q0 can reach ia/1 = 10^38, past the plain division type's 10^32
    # integer capacity — the wide base-10^6 school division is exact
    # for the whole range (review finding: divideDecimal(9e24, 1e-10)
    # used to THROW instead of returning its in-envelope result)
    q = _dec_div_col_wide(ia, ib)
    if scale > 0:
        # integral-part guard: q0 < 10^(38-scale) keeps every later
        # q*10^chunk inside DECIMAL(38,0) (ANSI mode throws on decimal
        # overflow, so out-of-envelope results must become NULL here,
        # not mid-chunk)
        q = F.when(q < F.lit(str(10 ** (38 - scale))).cast(_D38), q)
    r = F.pmod(ia, ib)
    rem = scale
    while rem > 0:
        c = min(rem, 13)
        shift = F.lit(10**c).cast("decimal(14,0)")
        rc = (r * shift).cast(_D38)
        q = (q * shift).cast(_D38) + _dec_div_col(rc, ib)
        r = F.pmod(rc, ib)
        rem -= c
    sign = F.when(
        (a < 0) != (b < 0), F.lit(-1).cast(_D38)
    ).otherwise(F.lit(1).cast(_D38))
    return _dec_render(sign, q, scale)


def _decimal_mul(a: Column, b: Column, scale: int) -> Column:
    """ClickHouse multiplyDecimal(a, b, scale): a · b truncated TOWARD
    ZERO at exactly `scale` fractional digits, exact over the full
    decimal(38,12) input envelope (|a|, |b| < 10^26; result must fit
    38 digits; NULL beyond).

    The scaled-integer product P = |a·b|·10^24 can reach 10^76, so it
    is carried on TWO decimal(38,0) limbs (r10 verdict #6 — the
    tukey_hsd hi/lo trick systematized): split each factor at 10^19
    (built value-side by _dec_limbs, never materializing the 38-digit
    scaled integers), form the four cross products (each < 10^38,
    exact, since 10^19·10^19 = 10^38 — and the cross terms carry weight
    10^19 while m_hh carries exactly 10^38), split the three sub-10^38
    terms that straddle the 10^38 boundary, and recombine as
    P = HI·10^38 + LO. The final truncation divides by 10^(24-scale) —
    a power of ten, so it is a pure digit shift split exactly across
    the two halves."""
    if scale > 37:
        raise ValueError(
            "multiplyDecimal: result scale beyond 37 exceeds the "
            "decimal(38,scale) result envelope"
        )
    ha, la = _dec_limbs(a)
    hb, lb = _dec_limbs(b)
    limb = F.lit(str(_LIMB)).cast("decimal(20,0)")
    m_hh = (ha * hb).cast(_D38)
    m_hl = (ha * lb).cast(_D38)
    m_lh = (la * hb).cast(_D38)
    m_ll = (la * lb).cast(_D38)
    # split each straddling term t = t_h·10^19 + t_l
    l_hl = F.pmod(m_hl, limb)
    h_hl = ((m_hl - l_hl) / limb).cast(_D38)
    l_lh = F.pmod(m_lh, limb)
    h_lh = ((m_lh - l_lh) / limb).cast(_D38)
    l_ll = F.pmod(m_ll, limb)
    h_ll = ((m_ll - l_ll) / limb).cast(_D38)
    # weight-10^19 column: the two cross low-halves plus m_ll's carry
    lowsum = (l_hl + l_lh + h_ll).cast(_D38)  # < 3·10^19
    lrem = F.pmod(lowsum, limb)
    lcar = ((lowsum - lrem) / limb).cast(_D38)  # 0..2
    lo = (lrem * limb + l_ll).cast(_D38)
    hi = (m_hh + h_hl + h_lh + lcar).cast(_D38)
    if scale == 24:
        # no shift at all: representable iff the high half is empty
        q = F.when(hi == F.lit(0).cast(_D38), lo)
    elif scale < 24:
        j = 24 - scale
        # q = HI·10^(38-j) + LO div 10^j, defined iff HI < 10^j
        # (otherwise the result exceeds 38 digits -> NULL)
        q = F.when(
            hi < F.lit(str(10**j)).cast(_D38),
            (hi * F.lit(str(10 ** (38 - j))).cast(_D38)).cast(_D38)
            + _dec_div_pow10(lo, j),
        )
    else:
        # upscale: only representable when the high half is empty AND
        # the shifted low half still fits 38 digits (guarded up front —
        # ANSI mode would throw on the overflow instead of NULLing)
        up = scale - 24
        q = F.when(
            (hi == F.lit(0).cast(_D38))
            & (lo < F.lit(str(10 ** max(38 - up, 0))).cast(_D38)),
            (lo * F.lit(str(10**up)).cast(_D38)).cast(_D38),
        )
    sign = F.when(
        (a < 0) != (b < 0), F.lit(-1).cast(_D38)
    ).otherwise(F.lit(1).cast(_D38))
    return _dec_render(sign, q, scale)


def _base58_encode(c: Column) -> Column:
    """Big-endian base58 of an ASCII string ≤ 8 bytes, fully JVM-side.

    r14 (guide §1.2 "per-task work"): the value rides TWO LONG LIMBS
    (v = hi·2^32 + lo, bit-packed from the NUL-lpadded input with plain
    shifts — no fold loop) instead of a DECIMAL(38,0); digits come from
    11 successive divisions by 58 carried across the limbs inside ONE
    F.aggregate (t = (hi%58)·2^32 + lo ≤ 58·2^32 < 2^53, so every
    intermediate is exact in long/double). The old form paid 11
    interpreted _dec_div cascades (pmod + subtract + BigDecimal divide)
    per row — A/B'd ~2× slower end-to-end on base58_roundtrip. A digit
    prepends exactly when the remaining value is nonzero, which is the
    same monotone "include iff v ≥ 58^k" rule as before (mid-number
    zero digits always render). CH fidelity bounds unchanged:
    non-ASCII input → NULL (F.ascii would fold multibyte codepoints
    into a wrong base-256 value that still round-trips to a DIFFERENT
    string — worse than failing); leading zero BYTES emit one '1' digit
    each, like every base58 codec (value folding alone drops them);
    >8 bytes → NULL."""
    alpha = F.array(*[F.lit(ch) for ch in _B58])
    p = F.lpad(c, 8, "\x00")  # leading NULs fold to 0: value unchanged

    def byte(i: int) -> Column:
        return F.ascii(F.substring(p, i, 1))

    hi0 = byte(1) * 16777216 + byte(2) * 65536 + byte(3) * 256 + byte(4)
    lo0 = byte(5) * 16777216 + byte(6) * 65536 + byte(7) * 256 + byte(8)
    two32 = F.lit(4294967296)

    def div58(x: Column) -> Column:  # exact: every x here is < 2^53
        return F.floor(x / 58).cast("long")

    digits = F.aggregate(
        F.sequence(F.lit(1), F.lit(11)),
        F.struct(
            hi0.cast("long").alias("hi"),
            lo0.cast("long").alias("lo"),
            F.lit("").alias("s"),
        ),
        lambda acc, _j: F.struct(
            div58(acc["hi"]).alias("hi"),
            div58((acc["hi"] % 58) * two32 + acc["lo"]).alias("lo"),
            F.when(
                (acc["hi"] > 0) | (acc["lo"] > 0),
                F.concat(
                    F.element_at(
                        alpha,
                        (((acc["hi"] % 58) * two32 + acc["lo"]) % 58)
                        .cast("int")
                        + 1,
                    ),
                    acc["s"],
                ),
            )
            .otherwise(acc["s"])
            .alias("s"),
        ),
        lambda acc: acc["s"],
    )
    ones = F.repeat(
        F.lit("1"),
        F.length(F.regexp_extract(c, "^\x00*", 0)).cast("int"),
    )
    return (
        F.when(F.length(c) == 0, F.lit(""))
        .when(~c.rlike("^[\x00-\x7f]*$"), F.lit(None).cast("string"))
        .when(F.length(c) <= 8, F.concat(ones, digits))
    )


def _base58_decode(c: Column) -> Column:
    """Inverse of _base58_encode for values < 2^64 (≤ 11 base58 digits):
    fold digit indexes into the decimal value, then emit 8 fixed byte
    positions via char(). Leading '1' digits decode to one NUL byte
    each (the encode-side leading-zero-byte convention)."""
    alpha = F.lit(_B58)
    stripped = F.regexp_replace(c, "^1*", "")
    v = F.aggregate(
        F.sequence(F.lit(1), F.length(c)),
        F.lit(0).cast(_D38),
        lambda acc, i: acc * 58
        + (F.instr(alpha, F.substring(c, i, 1)) - 1),
    )
    parts = [
        F.when(
            v >= F.lit(256**j).cast(_D38),
            F.char(F.pmod(_dec_div(v, 256**j), 256).cast("int")),
        ).otherwise(F.lit(""))
        for j in range(7, -1, -1)
    ]
    nuls = F.repeat(
        F.char(F.lit(0)), (F.length(c) - F.length(stripped)).cast("int")
    )
    return F.when(F.length(c) == 0, F.lit("")).when(
        F.length(c) <= 11, F.concat(nuls, F.concat(*parts))
    )


#: Geohash base32 alphabet (no a/i/l/o).
_GEO32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_encode(lon: Column, lat: Column, precision: int = 12) -> Column:
    """Standard geohash: longitude/latitude bisection bits interleaved
    MSB-first (lon leads), 5 bits per base32 char. The bisection stream
    for a coordinate IS the binary expansion of
    floor((coord - lo) / (hi - lo) · 2^nbits), so the whole encode is
    two float-to-int quantizations plus literal-shift bit plumbing —
    pure whole-stage-codegen, no UDF, and exactly replayable in any
    engine with integer shifts (the DuckDB twin in queries/r8_wave7.py
    is generated from the same loop)."""
    p = int(precision)
    nlon = (5 * p + 1) // 2
    nlat = 5 * p // 2
    alpha = F.array(*[F.lit(ch) for ch in _GEO32])
    xl = F.least(
        F.floor((lon + 180.0) / 360.0 * (1 << nlon)).cast("long"),
        F.lit((1 << nlon) - 1),
    )
    xt = F.least(
        F.floor((lat + 90.0) / 180.0 * (1 << nlat)).cast("long"),
        F.lit((1 << nlat) - 1),
    )
    # Per-bit linear chains on BOTH sides (see the decode note): a
    # Morton-spread shortcut looks smaller standalone, but its
    # input-doubling steps multiply out catastrophically when the
    # common decode(encode(...)) composition nests the trees — the
    # linear form keeps the composed plan O(p²) nodes.
    chars = []
    for k in range(p):
        val: Column = F.lit(0).cast("long")
        for b in range(5):
            i = 5 * k + b  # global bit index, MSB-first, lon first
            if i % 2 == 0:
                src, pos = xl, nlon - 1 - i // 2
            else:
                src, pos = xt, nlat - 1 - (i - 1) // 2
            bit = F.shiftrightunsigned(src, pos).bitwiseAND(F.lit(1))
            val = val + bit * (1 << (4 - b))
        chars.append(F.element_at(alpha, val.cast("int") + 1))
    return F.concat(*chars)


def _geohash_decode(s: Column, precision: int = 12) -> Column:
    """Inverse of _geohash_encode for a fixed-length geohash (the
    unrolled-shift shim bound: the char count must be given, CH infers
    it from the string). Returns the CELL-CENTER (longitude, latitude)
    struct, matching ClickHouse's convention."""
    p = int(precision)
    nlon = (5 * p + 1) // 2
    nlat = 5 * p // 2
    # Deliberately the LINEAR per-bit chain, not the Morton compact:
    # _morton_compact references its input twice per step (2⁴× tree
    # duplication), and decode's common call shape is
    # decode(encode(...)) in ONE projection — Catalyst has no
    # common-subexpression sharing across Column trees, so a
    # self-squaring compact over a nested encode expression explodes
    # the plan to millions of nodes (observed as a driver OOM in
    # analysis). Each per-bit term references the input once: tree
    # growth stays linear in 5p no matter what feeds it.
    xl: Column = F.lit(0).cast("long")
    xt: Column = F.lit(0).cast("long")
    for k in range(p):
        v = (F.instr(F.lit(_GEO32), F.substring(s, k + 1, 1)) - 1).cast(
            "long"
        )
        for b in range(5):
            i = 5 * k + b
            bit = F.shiftrightunsigned(v, 4 - b).bitwiseAND(F.lit(1))
            if i % 2 == 0:
                xl = xl + bit * (1 << (nlon - 1 - i // 2))
            else:
                xt = xt + bit * (1 << (nlat - 1 - (i - 1) // 2))
    lon = (xl.cast("double") + 0.5) / float(1 << nlon) * 360.0 - 180.0
    lat = (xt.cast("double") + 0.5) / float(1 << nlat) * 180.0 - 90.0
    return F.struct(lon.alias("longitude"), lat.alias("latitude"))


def _geohash_cell(xl: Column, xt: Column, p: int) -> Column:
    """Geohash string of one quantized cell (xl, xt) at precision p —
    the per-char fold of _geohash_encode, parameterized on the cell
    integers (small leaf expressions, e.g. sequence-lambda variables,
    so the per-bit unrolling cannot compound)."""
    nlon = (5 * p + 1) // 2
    nlat = 5 * p // 2
    alpha = F.array(*[F.lit(ch) for ch in _GEO32])
    chars = []
    for k in range(p):
        val: Column = F.lit(0).cast("long")
        for b in range(5):
            i = 5 * k + b
            if i % 2 == 0:
                src, pos = xl, nlon - 1 - i // 2
            else:
                src, pos = xt, nlat - 1 - (i - 1) // 2
            bit = F.shiftrightunsigned(src, pos).bitwiseAND(F.lit(1))
            val = val + bit * (1 << (4 - b))
        chars.append(F.element_at(alpha, val.cast("int") + 1))
    return F.concat(*chars)


#: ClickHouse geohashesInBox throws once the enumerated grid passes
#: 10M cells; same cap here (a near-world box at precision 6+ would
#: otherwise materialize a multi-GB array per row).
MAX_GEOHASH_CELLS = 10_000_000


def _geohashes_in_box(
    lon_min: Column,
    lat_min: Column,
    lon_max: Column,
    lat_max: Column,
    precision: int = 4,
) -> Column:
    """ClickHouse geohashesInBox: every precision-p geohash cell whose
    area intersects the [lon_min, lon_max] × [lat_min, lat_max] box, as
    a SORTED array of geohash strings (CH returns an unspecified
    enumeration order; sorting makes the result deterministic and
    hashable — documented shim behavior). Empty box (min > max) yields
    an empty array. Coordinates are clamped to the valid lon/lat range
    on BOTH ends (r9 advice: the lower clamp was missing, so
    below-range inputs produced negative cell indices and
    shiftrightunsigned emitted garbage strings), and a grid bigger than
    MAX_GEOHASH_CELLS raises — same stance as ClickHouse's 10M-item
    exception. Pure Catalyst: two quantizations per axis, one
    sequence() per axis, a nested transform + flatten."""
    p = int(precision)
    nlon = (5 * p + 1) // 2
    nlat = 5 * p // 2

    def q(c: Column, lo: float, span: float, nbits: int) -> Column:
        return F.greatest(
            F.least(
                F.floor((c - F.lit(lo)) / span * (1 << nbits)).cast("long"),
                F.lit((1 << nbits) - 1),
            ),
            F.lit(0),
        )

    xl0 = q(lon_min, -180.0, 360.0, nlon)
    xl1 = q(lon_max, -180.0, 360.0, nlon)
    xt0 = q(lat_min, -90.0, 180.0, nlat)
    xt1 = q(lat_max, -90.0, 180.0, nlat)
    grid = F.flatten(
        F.transform(
            F.sequence(xl0, xl1),
            lambda xl: F.transform(
                F.sequence(xt0, xt1),
                lambda xt: _geohash_cell(xl, xt, p),
            ),
        )
    )
    n_cells = (xl1 - xl0 + 1) * (xt1 - xt0 + 1)
    empty = F.array().cast("array<string>")
    return (
        F.when((lon_min > lon_max) | (lat_min > lat_max), empty)
        .when(
            n_cells > MAX_GEOHASH_CELLS,
            # assert_true returns NullType, which coerces to the array
            # branch type — the Catalyst idiom for CH's throw-on-huge-grid
            F.assert_true(
                F.lit(False),
                F.lit(
                    "geohashesInBox: grid exceeds "
                    f"{MAX_GEOHASH_CELLS} cells (ClickHouse parity cap)"
                ),
            ),
        )
        .otherwise(F.array_sort(grid))
    )


def _point_in_polygon(x: Column, y: Column, polygon) -> Column:
    """Ray casting against a LITERAL polygon (list of (x, y) float
    pairs): one crossing indicator per edge, unrolled — the polygon is
    a query constant in every CH call site, so the loop belongs in plan
    construction, not in a per-row interpreter. Odd crossing count =
    inside. Boundary behavior matches the classic algorithm (half-open
    edges), not an exact-rational tie-break."""
    crossings: Column = F.lit(0)
    n = len(polygon)
    for i in range(n):
        xi, yi = float(polygon[i][0]), float(polygon[i][1])
        xj, yj = (
            float(polygon[(i + 1) % n][0]),
            float(polygon[(i + 1) % n][1]),
        )
        if yi == yj:  # horizontal edge can never straddle y
            continue
        straddles = (F.lit(yi) > y) != (F.lit(yj) > y)
        x_at_y = (y - F.lit(yi)) * ((xj - xi) / (yj - yi)) + F.lit(xi)
        crossings = crossings + F.when(
            straddles & (x < x_at_y), 1
        ).otherwise(0)
    return F.pmod(crossings, F.lit(2)) == 1


def _point_in_ellipses(x: Column, y: Column, *params) -> Column:
    """pointInEllipses(x, y, x0, y0, a, b, ...): true iff the point is
    inside ANY of the literal axis-aligned ellipses (CH semantics)."""
    if len(params) % 4:
        raise ValueError("pointInEllipses needs (x0, y0, a, b) groups")
    hit: Column = F.lit(False)
    for g in range(0, len(params), 4):
        x0, y0, a, b = (float(v) for v in params[g : g + 4])
        d = ((x - F.lit(x0)) / a) ** 2 + ((y - F.lit(y0)) / b) ** 2
        hit = hit | (d <= 1.0)
    return hit


#: The effective-TLD middle labels the non-Custom CH variants special-
#: case (clickhouse.com.tr → 'clickhouse'): a tiny fixed set, NOT the
#: full public-suffix list (that is the *Custom family, out of scope).
_FSS_SET = ("com", "net", "org", "co")


def _host_of(c: Column) -> Column:
    """Host of a URL *or* a bare scheme-less host/domain — ClickHouse's
    domain()/firstSignificantSubdomain family accepts both, while
    parse_url(HOST) yields NULL without a scheme. Fallback: strip an
    optional scheme and userinfo, then accept ONLY a run of valid host
    characters (RFC 3986 reg-name set: alnum . _ ~ % -, or a bracketed
    IPv6 literal) that ends at a /:?# delimiter or end-of-string —
    garbage input (spaces, commas, prose) yields empty → NULL, matching
    ClickHouse's domain() = '' on invalid hosts (r9 advice: the old
    [^/:?#]+ capture echoed arbitrary text back as a 'host')."""
    bare = F.regexp_extract(
        c,
        r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[A-Za-z0-9._~%!$&'()*+,;=:-]*@)?"
        r"(\[[0-9A-Fa-f:.]+\]|[A-Za-z0-9._~%-]+)(?=[/:?#]|$)",
        1,
    )
    # try_parse_url: Spark 4 parse_url THROWS on invalid URLs (e.g.
    # userinfo without a scheme) instead of returning NULL.
    return F.coalesce(
        F.try_parse_url(c, F.lit("HOST")), F.nullif(bare, F.lit(""))
    )


def _fss_parts(c: Column):
    host = _host_of(c)
    labels = F.split(host, r"\.")
    nl = F.size(labels)
    second_last = F.element_at(labels, (nl - 1).cast("int"))
    idx = F.when(
        (nl >= 3) & second_last.isin(*_FSS_SET), nl - 2
    ).otherwise(nl - 1)
    return host, labels, nl, idx.cast("int")


def _first_significant_subdomain(c: Column) -> Column:
    """firstSignificantSubdomain: the label left of the effective TLD —
    third-from-last when the second-from-last is in _FSS_SET (com.tr,
    co.uk, ...), else second-from-last. Single-label hosts pass
    through unchanged (documented shim behavior)."""
    host, labels, nl, idx = _fss_parts(c)
    return F.when(nl >= 2, F.element_at(labels, idx)).otherwise(host)


def _cut_to_first_significant_subdomain(c: Column) -> Column:
    """cutToFirstSignificantSubdomain: the domain from the first
    significant subdomain to the end (news.clickhouse.com.tr →
    clickhouse.com.tr)."""
    host, labels, nl, idx = _fss_parts(c)
    return F.when(
        nl >= 2, F.array_join(F.slice(labels, idx, nl - idx + 1), ".")
    ).otherwise(host)


def _great_circle_angle(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Central angle in DEGREES between two (lon, lat) points — the
    same haversine as greatCircleDistance without the radius factor."""
    h = F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2) + F.cos(
        F.radians(lat1)
    ) * F.cos(F.radians(lat2)) * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
    return F.degrees(F.lit(2.0) * F.asin(F.sqrt(h)))


_NORM_UDFS: dict = {}


def _normalize_utf8(form: str):
    """Unicode normalization (NFC/NFD/NFKC/NFKD) via unicodedata in an
    Arrow-batched pandas UDF — the normalization tables are part of the
    Unicode standard and ship in the Python stdlib, so no ICU library is
    needed (the JVM side exposes no normalizer). Built lazily so
    importing this module never needs a SparkSession."""

    def build(c: Column) -> Column:
        if form not in _NORM_UDFS:
            import unicodedata

            # lambda form: the module-wide `from __future__ import
            # annotations` stringifies type hints, which pandas_udf's
            # signature inference rejects — pass the return type
            # explicitly.
            _NORM_UDFS[form] = F.pandas_udf(
                lambda s, _f=form: s.map(
                    lambda v: None
                    if v is None
                    else unicodedata.normalize(_f, v)
                ),
                "string",
            )
        return _NORM_UDFS[form](c)

    return build


_nfc = _normalize_utf8("NFC")

_STEM_UDF = None


def _stem(lang, c: Column) -> Column:
    """ClickHouse ``stem(language, word)`` — English only, backed by the
    from-scratch Porter implementation in functions/porter.py (the
    published 1980 algorithm; exact on the canonical test vectors).
    NON_BIT_COMPATIBLE: ClickHouse stems with Snowball English
    (porter2), which revises a minority of porter1's rules — stemmed
    vocabularies differ on forms like 'ties'/'dying'. Non-'en'
    languages raise at plan-build time rather than returning unstemmed
    text as if it were stemmed."""
    if not isinstance(lang, str):
        raise ValueError(
            "stem(): language must be a Python string literal "
            "('en' is the supported stemmer)"
        )
    if lang != "en":
        raise ValueError(
            f"stem(): only 'en' (Porter) is implemented, got {lang!r}"
        )
    global _STEM_UDF
    if _STEM_UDF is None:
        from .porter import porter_stem

        _STEM_UDF = F.pandas_udf(
            lambda s: s.map(
                lambda v: None if v is None else porter_stem(v)
            ),
            "string",
        )
    return _STEM_UDF(c)


_TEXT_UDFS: dict = {}


def _text_kernel(name: str, fn, ret: str = "string"):
    """Lazy Arrow-batched one-argument kernel (the _normalize_utf8
    pattern): `fn` maps one non-null Python value to the result, None
    passes through. Built on first use so importing this module never
    needs a SparkSession."""

    def build(c: Column) -> Column:
        if name not in _TEXT_UDFS:
            _TEXT_UDFS[name] = F.pandas_udf(
                lambda s, _f=fn: s.map(
                    lambda v: None if v is None else _f(v)
                ),
                ret,
            )
        return _TEXT_UDFS[name](c)

    return build


def _py_punycode_encode(v: str):
    """RFC 3492 punycode via the Python stdlib codec (the same public
    algorithm ClickHouse links); encode failures -> NULL (CH throws —
    the non-throwing NULL is this engine's documented error channel)."""
    try:
        return v.encode("punycode").decode("ascii")
    except Exception:
        return None


def _py_punycode_decode(v: str):
    try:
        return v.encode("ascii").decode("punycode")
    except Exception:
        return None


def _py_idna_encode(v: str):
    """IDNA (RFC 3490 + punycode) full-domain encode, per-label via the
    stdlib codec — transitional mapping, so straße.de -> strasse.de
    like ClickHouse's idnaEncode."""
    try:
        if v == "":
            return ""
        return v.encode("idna").decode("ascii")
    except Exception:
        return None


def _py_idna_decode(v: str):
    try:
        if v == "":
            return ""
        return v.encode("ascii").decode("idna")
    except Exception:
        return None


def _py_is_valid_utf8(v):
    """isValidUTF8 over BINARY columns (Spark `string` values are valid
    by construction, so the interesting inputs are bytes)."""
    if isinstance(v, str):
        return 1
    try:
        bytes(v).decode("utf-8", "strict")
        return 1
    except Exception:
        return 0


def _py_to_valid_utf8(v):
    """toValidUTF8: invalid byte sequences replaced with U+FFFD, the
    ClickHouse contract and exactly Python's errors='replace'."""
    if isinstance(v, str):
        return v
    return bytes(v).decode("utf-8", "replace")


def _byte_4grams(s: str):
    from collections import Counter

    b = s.encode("utf-8")
    return Counter(b[i : i + 4] for i in range(max(len(b) - 3, 0)))


def _py_ngram_distance(h: str, n: str) -> float:
    """ClickHouse ngramDistance: symmetric difference of the 4-byte-gram
    MULTISETS of the two strings, normalized by the sum of their sizes
    (0 = identical gram profile, 1 = disjoint); both-empty -> 0."""
    ch, cn = _byte_4grams(h), _byte_4grams(n)
    tot = sum(ch.values()) + sum(cn.values())
    if tot == 0:
        return 0.0
    sym = sum(abs(ch[g] - cn[g]) for g in ch.keys() | cn.keys())
    return sym / tot


def _py_ngram_search(h: str, n: str) -> float:
    """ClickHouse ngramSearch: the share of the NEEDLE's 4-byte grams
    present in the haystack (multiset intersection / |needle grams|) —
    the asymmetric 'how much of needle appears' measure; empty needle
    gram set -> 0."""
    ch, cn = _byte_4grams(h), _byte_4grams(n)
    nn = sum(cn.values())
    if nn == 0:
        return 0.0
    inter = sum(min(ch[g], c) for g, c in cn.items())
    return inter / nn


def _two_arg_kernel(name: str, fn, ret: str = "double"):
    def build(a: Column, b: Column) -> Column:
        if name not in _TEXT_UDFS:
            _TEXT_UDFS[name] = F.pandas_udf(
                lambda s1, s2, _f=fn: s1.combine(
                    s2,
                    lambda x, y: None
                    if x is None or y is None
                    else _f(x, y),
                ),
                ret,
            )
        return _TEXT_UDFS[name](a, b)

    return build


def _multi_if(*args: Column) -> Column:
    # multiIf(c1, v1, c2, v2, ..., default)
    *pairs, default = args
    out = None
    for cond, val in zip(pairs[::2], pairs[1::2]):
        out = F.when(cond, val) if out is None else out.when(cond, val)
    return default if out is None else out.otherwise(default)


def _format_readable_size(c: Column) -> Column:
    """ClickHouse ``formatReadableSize``: '123.00 B', '1.21 KiB', … with
    binary (1024) units and two decimals."""
    b = c.cast("double")
    out = None
    for unit, scale in [
        ("B", 1.0),
        ("KiB", 1024.0),
        ("MiB", 1024.0**2),
        ("GiB", 1024.0**3),
        ("TiB", 1024.0**4),
    ]:
        cond = b < scale * 1024 if unit != "TiB" else F.lit(True)
        rendered = F.format_string(f"%.2f {unit}", b / F.lit(scale))
        out = F.when(cond, rendered) if out is None else out.when(
            cond, rendered
        )
    return out


def _format_readable_1000(c: Column, units: list[str], fmt: str) -> Column:
    """Decimal-unit (1000-based) readable rendering shared by
    formatReadableDecimalSize ('1.02 KB') and formatReadableQuantity
    ('1.02 thousand'); two decimals like the CH originals."""
    b = c.cast("double")
    out = None
    last = len(units) - 1
    for i, unit in enumerate(units):
        scale = 1000.0**i
        cond = b < scale * 1000 if i != last else F.lit(True)
        rendered = F.format_string(fmt, b / F.lit(scale), F.lit(unit))
        out = F.when(cond, rendered) if out is None else out.when(
            cond, rendered
        )
    return out


#: formatReadableTimeDelta unit ladder — CH's documented sizes: a year
#: is 365 days, a month 30.5 days (ref docs; the remainders are chained
#: stepwise, NOT independent mods, because 2635200 does not divide
#: 31536000).
_FRTD_UNITS = (
    ("year", 31536000),
    ("month", 2635200),
    ("day", 86400),
    ("hour", 3600),
    ("minute", 60),
    ("second", 1),
)


def _format_readable_time_delta(c: Column) -> Column:
    """ClickHouse ``formatReadableTimeDelta``: '2 hours, 2 minutes and
    2 seconds' — nonzero units joined with ', ' and a final ' and ',
    singular forms at 1, '0 seconds' for zero. Non-negative inputs
    below 2^53 seconds (the double-exact integer range; a time delta)."""
    # Each unit count is a pmod chain off the raw input, NOT
    # ``rem = rem - n*size`` — that recurrence references the previous
    # remainder twice per level, inflating the Catalyst tree 2^k-fold
    # (measured: 5.8 s for 5000 rows at sf0.1 before, sub-second
    # after). The pmod chain matches the oracle's stepwise `%` text.
    rem = c.cast("long")
    parts = []
    for unit, size in _FRTD_UNITS:
        n = (
            F.floor(rem / F.lit(size)).cast("long")
            if size > 1
            else rem
        )
        parts.append(
            F.when(
                n > 0,
                F.concat(
                    n.cast("string"),
                    F.lit(" " + unit),
                    F.when(n == 1, F.lit("")).otherwise(F.lit("s")),
                ),
            )
        )
        if size > 1:
            rem = F.pmod(rem, F.lit(size))
    arr = F.filter(F.array(*parts), lambda x: x.isNotNull())
    sz = F.size(arr)
    return (
        F.when(sz == 0, F.lit("0 seconds"))
        .when(sz == 1, F.element_at(arr, 1))
        .otherwise(
            F.concat(
                F.array_join(F.slice(arr, 1, sz - 1), ", "),
                F.lit(" and "),
                F.element_at(arr, -1),
            )
        )
    )


_BAR_EIGHTHS = " ▏▎▍▌▋▊▉"


def _bar(x: Column, mn, mx, width) -> Column:
    """ClickHouse ``bar(x, min, max, width)``: a width-character bar of
    full blocks plus one eighth-block partial, clamped to [min, max].
    Eighth count is computed in exact integer arithmetic after one
    double scale, so renderings are engine-stable."""
    frac = (x.cast("double") - F.lit(mn)) / F.lit(float(mx - mn))
    clamped = F.greatest(F.lit(0.0), F.least(F.lit(1.0), frac))
    eighths = F.floor(clamped * F.lit(int(width) * 8) + F.lit(0.5)).cast(
        "int"
    )
    full = F.floor(eighths / 8).cast("int")
    rem = F.pmod(eighths, F.lit(8))
    partial = F.when(rem == 0, F.lit("")).otherwise(
        F.substring(F.lit(_BAR_EIGHTHS), rem + 1, 1)
    )
    return F.concat(F.repeat(F.lit("█"), full), partial)


def _fold_sum(arr: Column) -> Column:
    """Double-typed left fold Σ over an array column."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _l1_norm(c: Column) -> Column:
    return _fold_sum(F.transform(c, lambda x: F.abs(x.cast("double"))))


def _l2_norm(c: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(c, lambda x: x * x)))


def _ipv4_string_to_num(c: Column) -> Column:
    """Dotted-quad → integer; BIGINT holds the full uint32 range exactly
    (the catalog's earlier 'would overflow-differ' concern only applies
    to 32-bit signed targets)."""
    return F.aggregate(
        F.transform(F.split(c, r"\."), lambda x: x.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc * 256 + x,
    )


_IPV4_RE = (
    r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
)

#: One-hot bit masks for long columns, index i = bit i; bit 63 is the
#: sign-bit mask (Python 1<<63 would overflow a signed-long literal).
_BIT_MASKS = [1 << i for i in range(63)] + [-(1 << 63)]


def _bit_masks_col() -> Column:
    return F.array(*[F.lit(m) for m in _BIT_MASKS])


def _rot_n(n) -> int:
    if isinstance(n, Column):
        raise TypeError("bitRotate amount must be a literal int")
    return int(n) % 64


def _array_reduce(agg_name, arr: Column) -> Column:
    """ClickHouse ``arrayReduce('agg', arr)``: runtime-named aggregate
    over an array. The name must be a Python literal; the common
    aggregate set is dispatched to typed HOF folds (sum/avg run in
    double like CH's Float64 result for non-integer accumulators)."""
    name = _literal_sep(agg_name)
    dispatch: dict[str, Callable[[Column], Column]] = {
        "sum": _fold_sum,
        "min": F.array_min,
        "max": F.array_max,
        "count": lambda c: F.size(c).cast("long"),
        "avg": lambda c: _fold_sum(c) / F.size(c),
        "any": lambda c: F.element_at(c, 1),
        "anyLast": lambda c: F.element_at(c, -1),
        "groupArray": lambda c: c,
        "uniqExact": lambda c: F.size(F.array_distinct(c)).cast("long"),
    }
    if name not in dispatch:
        raise KeyError(
            f"arrayReduce: unsupported aggregate {name!r}; "
            f"supported: {sorted(dispatch)}"
        )
    return dispatch[name](arr)


def _url_hierarchy(c: Column) -> Column:
    """ClickHouse ``URLHierarchy``: growing URL prefixes cut at path
    boundaries — ['https://h/', 'https://h/a/', 'https://h/a/b'] for
    https://h/a/b (intermediate entries keep the trailing slash, the
    full path does not; query-string steps are not emitted — documented
    simplification of the CH cut-at-?-too behavior)."""
    base = F.regexp_extract(c, r"^([a-z][a-z0-9+.\-]*://[^/?#]*)", 1)
    path = F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit(""))
    parts = F.filter(
        F.split(F.regexp_replace(path, "^/", ""), "/"),
        lambda x: x != "",
    )
    n = F.size(parts)
    prefixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            base,
            F.lit("/"),
            F.array_join(F.slice(parts, 1, i), "/"),
            F.when(i < n, F.lit("/")).otherwise(F.lit("")),
        ),
    )
    root = F.array(F.concat(base, F.lit("/")))
    return (
        F.when(base == "", F.array().cast("array<string>"))
        .when(n == 0, root)
        .otherwise(F.concat(root, prefixes))
    )


def _url_path_hierarchy(c: Column) -> Column:
    """Path-only twin of ``URLHierarchy``: ['/a/', '/a/b'] for
    https://h/a/b — no protocol/host, empty array for an empty path."""
    path = F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit(""))
    parts = F.filter(
        F.split(F.regexp_replace(path, "^/", ""), "/"),
        lambda x: x != "",
    )
    n = F.size(parts)
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(
                F.lit("/"),
                F.array_join(F.slice(parts, 1, i), "/"),
                F.when(i < n, F.lit("/")).otherwise(F.lit("")),
            ),
        )
    )


#: ClickHouse/MySQL formatDateTime specifier → Java SimpleDateFormat
#: pattern (the subset CH documents and Spark can express; %w skipped —
#: Java has no Sunday=0 day number).
_MYSQL_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "h": "hh", "I": "hh", "i": "mm", "s": "ss",
    "S": "ss", "M": "MMMM", "b": "MMM", "j": "DDD", "a": "EEE",
    "W": "EEEE", "p": "a", "T": "HH:mm:ss", "D": "MM/dd/yy",
    "F": "yyyy-MM-dd", "n": "\n", "t": "\t", "%": "%",
}


def _mysql_datetime_format(fmt) -> str:
    """Translate a ClickHouse/MySQL %-specifier format string to the
    Java pattern Spark's date_format/to_timestamp speak. Literal runs
    are single-quoted (Java treats bare letters as pattern atoms);
    unknown specifiers raise rather than silently formatting wrong."""
    fmt = _literal_sep(fmt)
    out: list[str] = []
    lit: list[str] = []

    def flush():
        if lit:
            text = "".join(lit).replace("'", "''")
            # quote runs containing letters OR Java's reserved pattern
            # punctuation ([ ] # { } are optional-section/reserved
            # markers in DateTimeFormatter and throw unquoted)
            out.append(f"'{text}'" if any(
                ch.isalpha() or ch in "[]#{}" for ch in text
            ) else text)
            lit.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            spec = fmt[i + 1]
            if spec not in _MYSQL_FMT:
                raise KeyError(
                    f"formatDateTime: unsupported specifier %{spec}"
                )
            flush()
            out.append(_MYSQL_FMT[spec])
            i += 2
        else:
            lit.append(c)
            i += 1
    flush()
    return "".join(out)


def _gcd(a: Column, b: Column) -> Column:
    """Exact 64-bit gcd as a FIXED-DEPTH Euclid fold: the worst case for
    64-bit inputs is 91 steps (consecutive Fibonacci numbers), so 92
    data-independent iterations of (a,b) → (b, a mod b) always reach
    (g, 0). No loop, no UDF — one codegen'd aggregate over a constant
    sequence."""
    pair = F.aggregate(
        F.sequence(F.lit(1), F.lit(92)),
        F.struct(
            F.abs(a.cast("long")).alias("x"), F.abs(b.cast("long")).alias("y")
        ),
        lambda acc, _: F.when(
            acc["y"] == 0, acc
        ).otherwise(
            F.struct(
                acc["y"].alias("x"), F.pmod(acc["x"], acc["y"]).alias("y")
            )
        ),
    )
    return pair["x"]


def _like_to_rlike(pat) -> str:
    """SQL LIKE pattern → anchored Java regex (% → .*, _ → ., the rest
    quoted)."""
    pat = _literal_sep(pat)
    out = []
    for ch in pat:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


#: Magic-number bit-spread masks (Morton/Z-order): value & mask after
#: each doubling shift; all literals fit a signed long.
_MORTON_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _morton_spread(c: Column) -> Column:
    """uint32 → its bits at the even positions of a 64-bit word (the
    classic five-step magic-number spread; literal shifts only)."""
    v = c.cast("long").bitwiseAND(0xFFFFFFFF)
    for shift, mask in _MORTON_MASKS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def _morton_compact(c: Column) -> Column:
    """Inverse of _morton_spread: gather the even bits back to a
    uint32 (unsigned right shifts — bit 63 may be set)."""
    v = c.cast("long").bitwiseAND(F.lit(0x5555555555555555))
    v = v.bitwiseOR(F.shiftrightunsigned(v, 1)).bitwiseAND(
        F.lit(0x3333333333333333)
    )
    v = v.bitwiseOR(F.shiftrightunsigned(v, 2)).bitwiseAND(
        F.lit(0x0F0F0F0F0F0F0F0F)
    )
    v = v.bitwiseOR(F.shiftrightunsigned(v, 4)).bitwiseAND(
        F.lit(0x00FF00FF00FF00FF)
    )
    v = v.bitwiseOR(F.shiftrightunsigned(v, 8)).bitwiseAND(
        F.lit(0x0000FFFF0000FFFF)
    )
    v = v.bitwiseOR(F.shiftrightunsigned(v, 16)).bitwiseAND(
        F.lit(0xFFFFFFFF)
    )
    return v


#: Lanczos g=7 coefficients (public-domain constants; the standard
#: 9-term approximation, ~1e-13 relative accuracy for x > 0).
_LANCZOS_G7 = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)


def _lgamma(c: Column) -> Column:
    """log Γ(x) for x > 0 via the Lanczos(g=7) series — pure Column
    arithmetic, agrees with DuckDB's native lgamma to ~1e-12 (two
    independent implementations; the oracle uses the native one)."""
    import math

    z = c.cast("double") - F.lit(1.0)
    a = F.lit(_LANCZOS_G7[0])
    for i in range(1, 9):
        a = a + F.lit(_LANCZOS_G7[i]) / (z + F.lit(float(i)))
    t = z + F.lit(7.5)
    return (
        F.lit(0.5 * math.log(2 * math.pi))
        + (z + F.lit(0.5)) * F.log(t)
        - t
        + F.log(a)
    )


def _erf(c: Column) -> Column:
    """erf via Abramowitz–Stegun 7.1.26 (max abs error 1.5e-7; CH
    computes the exact function — documented approximation, and the
    DuckDB oracle replays the identical formula)."""
    x = F.abs(c.cast("double"))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * t * t
        + F.lit(1.421413741) * t * t * t
        - F.lit(1.453152027) * t * t * t * t
        + F.lit(1.061405429) * t * t * t * t * t
    )
    return F.signum(c) * (F.lit(1.0) - poly * F.exp(-x * x))


def _java_hash_u32(c: Column) -> Column:
    """Java String.hashCode() polynomial with 32-bit wraparound, as an
    UNSIGNED value in [0, 2^32) — fold over character codes with an
    explicit pmod (Spark longs don't wrap; ASCII/UTF-16 code points up
    to 0xFFFF supported via ascii()). Empty string hashes to 0; the
    sequence guard matters because sequence(1, 0) DESCENDS."""
    fold = F.aggregate(
        F.sequence(F.lit(1), F.length(c)),
        F.lit(0).cast("long"),
        lambda acc, i: F.pmod(
            acc * F.lit(31) + F.ascii(F.substr(c, i, F.lit(1))),
            F.lit(4294967296),
        ),
    )
    return F.when(F.length(c) == 0, F.lit(0).cast("long")).otherwise(fold)


def _java_hash(c: Column) -> Column:
    u = _java_hash_u32(c)
    return F.when(
        u >= F.lit(2147483648), u - F.lit(4294967296)
    ).otherwise(u).cast("long")


#: Literal array of the 63 non-negative int64 powers of two (bit-test
#: table — SQL shiftleft takes a foldable shift, so the per-bit lambda
#: form can't build these on the fly).
def _pow2_array() -> Column:
    return F.array(*[F.lit(1 << i).cast("long") for i in range(63)])


def _bitmask_terms(c: Column) -> Column:
    """Power-of-two decomposition of an int64, lowest bit first. A
    negative input has the sign bit set; CH emits it as its
    two's-complement value (Int64 min) so the terms still sum to the
    input — append it after the 62 positive bit tests."""
    v = c.cast("long")
    lo = F.filter(_pow2_array(), lambda p: v.bitwiseAND(p) != 0)
    return F.when(
        v < 0,
        F.concat(lo, F.array(F.lit(-9223372036854775808).cast("long"))),
    ).otherwise(lo)


def _byte_hamming(a: Column, b: Column) -> Column:
    """ClickHouse byteHammingDistance: differing positions over the
    common prefix + the length difference (ASCII-safe; Spark strings
    are UTF-16 so multi-byte code points count per char, documented)."""
    la, lb = F.length(a), F.length(b)
    m = F.least(la, lb)
    diffs = F.size(
        F.filter(
            F.sequence(F.lit(1), m),
            lambda i: F.substr(a, i, F.lit(1)) != F.substr(b, i, F.lit(1)),
        )
    )
    return (
        F.when(m == 0, F.lit(0)).otherwise(diffs)
        + F.abs(la - lb)
    ).cast("long")


CH_FUNCTIONS: dict[str, Builder] = {
    # --- string ---
    "lower": F.lower,
    "upper": F.upper,
    "lowerUTF8": F.lower,
    "upperUTF8": F.upper,
    "length": F.length,
    "lengthUTF8": F.char_length,
    "concat": F.concat,
    "substring": F.substring,
    "trimBoth": F.trim,
    "trimLeft": F.ltrim,
    "trimRight": F.rtrim,
    "replaceAll": lambda c, a, b: F.replace(c, a, b),
    "replaceRegexpAll": F.regexp_replace,
    "position": F.instr,
    "positionCaseInsensitive": lambda c, s: F.instr(F.lower(c), F.lower(s)),
    # F.split's pattern is a Java regex — quote the separator (\Q..\E) so
    # splitByChar('.', s) / '|' split on the literal, not on every char.
    "splitByChar": lambda sep, c: F.split(c, _regex_quote(sep)),
    "splitByString": lambda sep, c: F.split(c, _regex_quote(sep)),
    "startsWith": lambda c, p: F.startswith(c, p),
    "endsWith": lambda c, p: F.endswith(c, p),
    "match": lambda c, p: c.rlike(p),
    "extract": lambda c, p: F.regexp_extract(c, p, 1),
    "leftPad": F.lpad,
    "rightPad": F.rpad,
    "reverse": F.reverse,
    "repeat": F.repeat,
    "format": F.format_string,
    "empty": lambda c: F.length(c) == 0,
    "notEmpty": lambda c: F.length(c) > 0,
    "locate": lambda s, c: F.instr(c, s),  # CH locate(needle, haystack)
    "levenshteinDistance": F.levenshtein,
    "editDistance": F.levenshtein,
    "soundex": F.soundex,
    "initcapUTF8": F.initcap,
    "base64Encode": F.base64,
    "base64Decode": lambda c: F.unbase64(c).cast("string"),
    "hex": F.hex,
    "unhex": F.unhex,
    "arrayStringConcat": lambda c, sep=" ": F.array_join(c, sep),
    # --- math ---
    "abs": F.abs,
    "round": F.round,
    "floor": F.floor,
    "ceil": F.ceil,
    "ceiling": F.ceil,
    "sqrt": F.sqrt,
    "cbrt": F.cbrt,
    "exp": F.exp,
    "log": F.log,
    "ln": F.log,
    "log2": F.log2,
    "log10": F.log10,
    "pow": F.pow,
    "power": F.pow,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "atan2": F.atan2,
    "exp2": lambda c: F.pow(F.lit(2.0), c),
    "exp10": lambda c: F.pow(F.lit(10.0), c),
    "degrees": F.degrees,
    "radians": F.radians,
    "sign": F.signum,
    "bitCount": F.bit_count,
    "bitTest": lambda c, pos: F.bit_get(c, pos),
    # (a - a%b)/b truncates toward zero (Spark % follows the dividend's
    # sign); cast keeps the CH integral return type instead of DOUBLE.
    # exact integer division: (a - a%b) is divisible by b, and the
    # decimal(38,0) division keeps it exact where a long/long double
    # division would round above 2^53
    "intDiv": lambda a, b: (
        (a - a % b).cast("decimal(38,0)") / b.cast("decimal(38,0)")
    ).cast("long"),
    "modulo": lambda a, b: a % b,
    "plus": lambda a, b: a + b,
    "minus": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "negate": lambda a: -a,
    "greatest": F.greatest,
    "least": F.least,
    # --- conditional / null ---
    "if": _if,
    "multiIf": _multi_if,
    "ifNull": F.coalesce,
    "coalesce": F.coalesce,
    "nullIf": F.nullif,
    "isNull": lambda c: c.isNull(),
    "isNotNull": lambda c: c.isNotNull(),
    "assumeNotNull": lambda c: c,  # nullability hint only
    # --- date / time ---
    "now": F.current_timestamp,
    "today": F.current_date,
    "toDate": lambda c: c.cast("date"),
    "toDateTime": lambda c: c.cast("timestamp"),
    "toStartOfDay": lambda c: F.date_trunc("day", c),
    "toStartOfHour": lambda c: F.date_trunc("hour", c),
    "toStartOfMinute": lambda c: F.date_trunc("minute", c),
    "toStartOfMonth": lambda c: F.date_trunc("month", c).cast("date"),
    "toStartOfQuarter": lambda c: F.date_trunc("quarter", c).cast("date"),
    "toStartOfYear": lambda c: F.date_trunc("year", c).cast("date"),
    "toYYYYMM": lambda c: F.date_format(c, "yyyyMM").cast("int"),
    "toYYYYMMDD": lambda c: F.date_format(c, "yyyyMMdd").cast("int"),
    "toYear": F.year,
    "toMonth": F.month,
    "toQuarter": F.quarter,
    "toISOWeek": F.weekofyear,
    "monthName": lambda c: F.date_format(c, "MMMM"),
    # floor a timestamp to an arbitrary interval of `secs` seconds —
    # the generalized date_trunc (CH: toStartOfInterval(t, INTERVAL n
    # unit); pass the interval as seconds)
    "toStartOfInterval": lambda c, secs: _floor_interval(c, secs),
    "age": lambda unit, a, b: F.timestamp_diff(unit, a, b),
    # --- display helpers (ClickHouse rendering functions) ---
    "formatReadableSize": lambda c: _format_readable_size(c),
    "bar": lambda x, mn, mx, width=80: _bar(x, mn, mx, width),
    "toDayOfMonth": F.dayofmonth,
    "toDayOfWeek": lambda c: F.weekday(c) + 1,  # ClickHouse: Mon=1..Sun=7
    "toHour": F.hour,
    "toMinute": F.minute,
    "toSecond": F.second,
    "toUnixTimestamp": F.unix_timestamp,
    "fromUnixTimestamp": F.from_unixtime,
    "dateDiff": lambda unit, a, b: F.timestamp_diff(unit, a, b),
    "timestampDiff": lambda unit, a, b: F.timestamp_diff(unit, a, b),
    # proleptic-Gregorian day count from 0000-01-01 (year zero has 366
    # days, hence the +366 over Spark's 0001-01-01 epoch)
    "toDaysSinceYearZero": lambda c: F.datediff(
        c, F.lit("0001-01-01").cast("date")
    )
    + 366,
    "fromDaysSinceYearZero": lambda n: F.date_add(
        F.lit("0001-01-01").cast("date"), n - 366
    ),
    "dateAdd": lambda unit, n, c: F.timestamp_add(unit, n, c),
    "addDays": lambda c, n: F.date_add(c, n),
    "subtractDays": lambda c, n: F.date_sub(c, n),
    # --- arrays (ClickHouse is 1-indexed; element_at matches) ---
    "arrayElement": F.element_at,
    "has": F.array_contains,
    "indexOf": F.array_position,
    "arrayConcat": F.concat,
    "arrayMap": lambda f, c: F.transform(c, f),
    "arrayFilter": lambda f, c: F.filter(c, f),
    "arrayExists": lambda f, c: F.exists(c, f),
    "arrayAll": lambda f, c: F.forall(c, f),
    "arraySum": lambda c: F.aggregate(
        c, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    ),
    "arrayJoin": F.explode,
    "arrayDistinct": F.array_distinct,
    "arraySort": F.array_sort,
    "arrayMin": F.array_min,
    "arrayMax": F.array_max,
    "arrayAvg": lambda c: F.aggregate(
        c, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    ) / F.size(c),
    "arrayProduct": lambda c: F.aggregate(
        c, F.lit(1.0), lambda acc, x: acc * x.cast("double")
    ),
    "arrayFlatten": F.flatten,
    "arrayReverse": F.reverse,
    "arrayCompact": lambda c: F.filter(
        c,
        # null-safe keep-condition: a plain != is NULL for null elements
        # (dropping them entirely; CH keeps one), and guarding i == 0 in
        # a when() also avoids ANSI element_at(c, 0) errors
        lambda x, i: F.when(i == 0, F.lit(True)).otherwise(
            ~x.eqNullSafe(F.element_at(c, i))
        ),
    ),  # collapse CONSECUTIVE duplicates (element_at(c, i) is 1-indexed
    #     = the previous element of 0-indexed position i)
    "arrayIntersect": F.array_intersect,
    "arrayZip": F.arrays_zip,
    "arrayFold": lambda f, c, acc0: F.aggregate(c, acc0, f),
    "arrayEnumerate": lambda c: F.sequence(F.lit(1), F.size(c)),
    # occurrence index of each element among its equals (1-based), the
    # CH dedup-within-array helper; O(len^2) per array via prefix count
    "arrayEnumerateUniq": lambda c: F.transform(
        c,
        lambda x, i: F.size(
            F.filter(F.slice(c, 1, i + 1), lambda y: y == x)
        ),
    ),
    "arrayResize": lambda c, n, fill=None: F.slice(
        F.concat(
            c,
            F.array_repeat(
                F.lit(fill) if not isinstance(fill, Column) else fill, n
            ),
        ),
        1,
        n,
    ),
    "arrayPushBack": lambda c, x: F.concat(c, F.array(x)),
    "arrayPushFront": lambda c, x: F.concat(F.array(x), c),
    "arrayPopBack": lambda c: F.slice(
        c, 1, F.greatest(F.size(c) - 1, F.lit(0))
    ),
    "arrayPopFront": lambda c: F.slice(
        c, 2, F.greatest(F.size(c) - 1, F.lit(0))
    ),
    "hasAny": lambda a, b: F.arrays_overlap(a, b),
    "hasAll": lambda a, b: F.size(F.array_except(b, a)) == 0,
    "arrayFirst": lambda f, c: F.element_at(F.filter(c, f), 1),
    "arrayLast": lambda f, c: F.element_at(F.filter(c, f), -1),
    "arrayFirstIndex": lambda f, c: F.coalesce(
        F.array_position(
            F.transform(c, f), F.lit(True)
        ),
        F.lit(0),
    ).cast("long"),
    "arrayCount": lambda f, c: F.size(F.filter(c, f)).cast("long"),
    "mapContains": F.map_contains_key,
    "mapFromArrays": F.map_from_arrays,
    "arrayDifference": lambda c: F.transform(
        c,
        lambda x, i: F.when(i == 0, F.lit(0).cast("double")).otherwise(
            x.cast("double") - F.element_at(c, i).cast("double")
        ),
    ),  # [a,b,c] -> [0, b-a, c-b], ClickHouse semantics
    "arraySlice": F.slice,
    "arrayUniq": lambda c: F.size(F.array_distinct(c)),
    "range": lambda n: F.sequence(F.lit(0), n - 1),
    "emptyArrayString": lambda: F.array().cast("array<string>"),
    # --- map / tuple ---
    "tuple": F.struct,
    "tupleElement": lambda c, i: c.getField(f"col{i}"),
    "map": F.create_map,
    "mapKeys": F.map_keys,
    "mapValues": F.map_values,
    # --- JSON / URL / IP ---
    "JSONExtractString": lambda c, k: F.get_json_object(c, f"$.{k}"),
    "JSONExtractInt": lambda c, k: F.get_json_object(c, f"$.{k}").cast("long"),
    "JSONExtractFloat": lambda c, k: F.get_json_object(c, f"$.{k}").cast("double"),
    "JSONHas": lambda c, k: F.get_json_object(c, f"$.{k}").isNotNull(),
    "visitParamExtractString": lambda c, k: F.get_json_object(c, f"$.{k}"),
    "simpleJSONExtractString": lambda c, k: F.get_json_object(c, f"$.{k}"),
    "JSONExtractBool": lambda c, k: F.get_json_object(c, f"$.{k}").cast(
        "boolean"
    ),
    "JSONLength": lambda c: F.coalesce(
        F.json_array_length(c),
        F.size(F.json_object_keys(c)).cast("int"),
    ),
    "protocol": lambda c: F.parse_url(c, F.lit("PROTOCOL")),
    "domain": lambda c: _host_of(c),  # scheme-less hosts accepted (CH)
    "path": lambda c: F.parse_url(c, F.lit("PATH")),
    "queryString": lambda c: F.parse_url(c, F.lit("QUERY")),
    "IPv4NumToString": lambda c: F.concat_ws(
        ".",
        F.shiftright(c, 24).bitwiseAND(255).cast("string"),
        F.shiftright(c, 16).bitwiseAND(255).cast("string"),
        F.shiftright(c, 8).bitwiseAND(255).cast("string"),
        c.bitwiseAND(255).cast("string"),
    ),
    # --- hashing ---
    "MD5": F.md5,
    "SHA256": lambda c: F.sha2(c, 256),
    "cityHash64": F.xxhash64,  # engine-specific 64-bit hash ≈ xxhash64
    "sipHash64": F.xxhash64,
    "halfMD5": lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
    # --- aggregates (names; used inside groupBy().agg) ---
    "count": F.count,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "any": F.first,
    "anyLast": F.last,
    "argMax": F.max_by,
    "argMin": F.min_by,
    "uniq": F.approx_count_distinct,
    "uniqHLL12": F.approx_count_distinct,
    "uniqExact": F.count_distinct,
    "groupArray": F.collect_list,
    "groupUniqArray": F.collect_set,
    "median": lambda c: F.percentile(c, 0.5),
    "quantile": lambda c, q=0.5: F.percentile(c, q),
    "quantileTDigest": lambda c, q=0.5: F.percentile_approx(c, q),
    "stddevPop": F.stddev_pop,
    "stddevSamp": F.stddev_samp,
    "varPop": F.var_pop,
    "varSamp": F.var_samp,
    "corr": F.corr,
    "covarPop": F.covar_pop,
    "covarSamp": F.covar_samp,
    "sumIf": lambda c, cond: F.sum(F.when(cond, c)),
    "countIf": lambda cond: F.sum(F.when(cond, 1).otherwise(0)),
    "avgIf": lambda c, cond: F.avg(F.when(cond, c)),
    "minIf": lambda c, cond: F.min(F.when(cond, c)),
    "maxIf": lambda c, cond: F.max(F.when(cond, c)),
    "avgWeighted": lambda c, w: F.sum(c * w) / F.sum(w),
    "uniqUpTo": lambda c, n=3: F.least(
        F.count_distinct(c), F.lit(int(n) + 1)
    ),
    # statistical family: the hash-gated registry twins use exact
    # integer moments (queries/ch_aggregates_w6.py); these one-liners
    # are the quick float-path equivalents for interactive use
    "skewPop": F.skewness,
    # ClickHouse kurtPop is NON-excess m4/sigma^4; Spark's kurtosis is
    # excess (m4/m2^2 - 3) — the exact twin skew_kurt_agg computes
    # m4/m2^2, so the float path must add the 3 back
    "kurtPop": lambda c: F.kurtosis(c) + F.lit(3.0),
    # rankCorr (Spearman) has NO single-expression form — it needs a
    # rank transform first; deliberately absent from this table. Use
    # operators/dist_rank.histogram_r2 + Pearson over the rank columns
    # (the rank_corr_spearman query is the worked example).
    "quantileExactWeighted": lambda c, w, q=0.5: F.percentile(c, q, w),
    "quantilesExactWeighted": lambda c, w, *qs: F.percentile(
        c, F.array(*[F.lit(q) for q in (qs or (0.5,))]), w
    ),
    # --- window names (same names, used with .over) ---
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
    "lagInFrame": F.lag,
    "leadInFrame": F.lead,
    "first_value": F.first,
    "last_value": F.last,
    # --- round-6 breadth: strings ---
    "ascii": F.ascii,
    "bin": F.bin,
    "left": F.left,
    "right": F.right,
    "substringUTF8": F.substring,
    "positionUTF8": F.instr,
    "countMatches": lambda c, p: F.regexp_count(c, p).cast("long"),
    # literal-substring occurrence count via length arithmetic (stays in
    # codegen; no regex engine involved)
    "countSubstrings": lambda c, s: (
        (F.length(c) - F.length(F.replace(c, s, F.lit(""))))
        / F.length(s)
    ).cast("long"),
    # CH extractAll returns every match of the whole pattern (the capture
    # group when one exists; group 0 idx here — pass patterns without
    # groups or wrap the group yourself)
    "extractAll": lambda c, p: F.regexp_extract_all(c, p, 0),
    "splitByRegexp": lambda p, c: F.split(c, p),
    "splitByWhitespace": lambda c: F.split(F.trim(c), r"\s+"),
    "concatWithSeparator": lambda sep, *cs: F.concat_ws(
        _literal_sep(sep), *cs
    ),
    # --- round-6 breadth: math / bit ---
    "bitAnd": lambda a, b: a.bitwiseAND(b),
    "bitOr": lambda a, b: a.bitwiseOR(b),
    "bitXor": lambda a, b: a.bitwiseXOR(b),
    "bitNot": lambda a: F.bitwise_not(a),
    "bitShiftLeft": F.shiftleft,
    "bitShiftRight": F.shiftright,
    "roundBankers": F.bround,
    "isNaN": F.isnan,
    "isInfinite": lambda c: F.abs(c) == F.lit(float("inf")),
    "isFinite": lambda c: ~(F.isnan(c) | (F.abs(c) == F.lit(float("inf")))),
    "ifNotFinite": lambda x, alt: F.when(
        F.isnan(x) | (F.abs(x) == F.lit(float("inf"))), alt
    ).otherwise(x),
    "e": lambda: F.lit(2.718281828459045),
    "pi": lambda: F.lit(3.141592653589793),
    # --- round-6 breadth: date / time ---
    # CH toStartOfWeek default mode 0 = week starts Sunday
    # (dayofweek: Sun=1); toMonday = ISO week start (weekday: Mon=0)
    "toStartOfWeek": lambda c: F.date_sub(
        c.cast("date"), F.dayofweek(c) - 1
    ),
    "toMonday": lambda c: F.date_sub(c.cast("date"), F.weekday(c)),
    "toStartOfFiveMinutes": lambda c: _floor_interval(c, 300),
    "toStartOfTenMinutes": lambda c: _floor_interval(c, 600),
    "toStartOfFifteenMinutes": lambda c: _floor_interval(c, 900),
    "timeSlot": lambda c: _floor_interval(c, 1800),
    "toDayOfYear": F.dayofyear,
    "addMonths": F.add_months,
    "subtractMonths": lambda c, n: F.add_months(c, -n),
    "addHours": lambda c, n: F.timestamp_add("HOUR", n, c),
    "addMinutes": lambda c, n: F.timestamp_add("MINUTE", n, c),
    "addSeconds": lambda c, n: F.timestamp_add("SECOND", n, c),
    "toRelativeHourNum": lambda c: (F.unix_seconds(c) / 3600).cast("long"),
    # --- round-6 breadth: map ---
    # CH lambdas take (k, v); Spark's map_filter matches. mapApply's CH
    # lambda returns a (k, v) tuple — here the entry struct.
    "mapApply": lambda f, m: F.map_from_entries(
        F.transform(F.map_entries(m), f)
    ),
    "mapFilter": lambda f, m: F.map_filter(m, f),
    "mapConcat": F.map_concat,
    # --- round-6 breadth: type conversions ---
    "toInt32": lambda c: c.cast("int"),
    "toInt64": lambda c: c.cast("long"),
    "toUInt32": lambda c: c.cast("long"),  # Spark has no unsigned ints
    "toUInt64": lambda c: c.cast("long"),
    "toFloat32": lambda c: c.cast("float"),
    "toFloat64": lambda c: c.cast("double"),
    "toString": lambda c: c.cast("string"),
    "toInt64OrNull": lambda c: c.try_cast("long"),
    "toFloat64OrNull": lambda c: c.try_cast("double"),
    # --- round-6 breadth: URL ---
    # CH's encodeURLComponent is PERCENT-style (space -> %20, '+' is a
    # literal that must encode to %2B and survive decode); Spark's
    # url_encode/url_decode are Java URLEncoder/URLDecoder, i.e. the
    # FORM variant (space <-> '+'). Percent names post/pre-process the
    # '+' handling; the CH *Form* names map to the Java behavior 1:1.
    "encodeURLComponent": lambda c: F.regexp_replace(
        F.url_encode(c), r"\+", "%20"
    ),
    "decodeURLComponent": lambda c: F.url_decode(
        F.regexp_replace(c, r"\+", "%2B")
    ),
    "encodeURLFormComponent": F.url_encode,
    "decodeURLFormComponent": F.url_decode,
    "topLevelDomain": lambda c: F.element_at(
        F.split(_host_of(c), r"\."), -1
    ),
    # --- round-6 breadth: hashing / aggregates ---
    "crc32": F.crc32,  # zlib CRC-32 on both engines: bit-compatible
    "xxHash64": F.xxhash64,  # seed differs (Spark 42, CH 0): values differ
    "farmHash64": F.xxhash64,
    "uniqCombined": F.approx_count_distinct,
    "uniqCombined64": F.approx_count_distinct,
    # --- round-6 wave 8: math ---
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
    # odd-symmetric form: log(c + sqrt(c²+1)) cancels catastrophically
    # for large-negative c (sqrt(c²+1) == |c| in double → log(0) = -Inf)
    "asinh": lambda c: F.signum(c) * F.log(F.abs(c) + F.sqrt(c * c + 1)),
    "acosh": lambda c: F.log(c + F.sqrt(c * c - 1)),
    "atanh": lambda c: F.log((1 + c) / (1 - c)) / 2,
    "hypot": F.hypot,
    "log1p": F.log1p,
    "expm1": F.expm1,
    "intExp2": lambda c: F.pow(F.lit(2), c).cast("long"),
    # numeric truncate-toward-zero with precision (Spark's trunc is
    # date-only); value integral after floor so the pattern is the same
    # engine-portable one gd_linear_regression uses
    "truncate": lambda c, n=0: (
        F.signum(c) * F.floor(F.abs(c) * F.pow(F.lit(10), F.lit(int(n))))
    ) / F.pow(F.lit(10), F.lit(int(n))),
    # CH default radius 6372797.560856 m (mean Earth radius)
    "greatCircleDistance": lambda lon1, lat1, lon2, lat2: F.lit(2.0)
    * F.lit(6372797.560856)
    * F.asin(
        F.sqrt(
            F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
            + F.cos(F.radians(lat1))
            * F.cos(F.radians(lat2))
            * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
        )
    ),
    # --- round-6 wave 8: date / time ---
    "addYears": lambda c, n: F.add_months(c, n * 12),
    "subtractYears": lambda c, n: F.add_months(c, -n * 12),
    "subtractHours": lambda c, n: F.timestamp_add("HOUR", -n, c),
    "subtractMinutes": lambda c, n: F.timestamp_add("MINUTE", -n, c),
    "subtractSeconds": lambda c, n: F.timestamp_add("SECOND", -n, c),
    "toLastDayOfMonth": F.last_day,
    "toStartOfSecond": lambda c: F.date_trunc("second", c),
    "yesterday": lambda: F.date_sub(F.current_date(), 1),
    "toTimeZone": lambda c, tz: F.convert_timezone(
        F.lit("UTC"), tz if isinstance(tz, Column) else F.lit(tz), c
    ),
    # best-effort parse: try ISO datetime, then date, then slash forms.
    # CH best-effort reads slash dates as DD/MM — keep the same
    # convention for the date-only form as for the datetime form.
    "parseDateTimeBestEffort": lambda c: F.coalesce(
        F.try_to_timestamp(c),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy")),
    ),
    # --- round-6 wave 8: string ---
    # delimiter/count must be Python literals (substring_index's JVM
    # signature takes them as constants, same restriction as
    # concatWithSeparator's separator)
    "substringIndex": lambda c, d, n: F.substring_index(
        c, _literal_sep(d), int(n)
    ),
    "translate": F.translate,
    "space": lambda n: F.repeat(F.lit(" "), n),
    # --- round-6 wave 8: array ---
    "arrayCumSum": lambda c: F.slice(
        F.aggregate(
            c,
            F.array().cast("array<double>"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0)) + x
                ),
            ),
        ),
        1,
        F.size(c),
    ),
    "arrayReverseSort": lambda c: F.sort_array(c, asc=False),
    "arrayRotateLeft": lambda c, n: F.when(F.size(c) == 0, c).otherwise(
        F.concat(
            F.slice(c, F.pmod(n, F.size(c)) + 1, F.size(c)),
            F.slice(c, 1, F.pmod(n, F.size(c))),
        )
    ),
    "arrayRotateRight": lambda c, n: F.when(F.size(c) == 0, c).otherwise(
        F.concat(
            F.slice(c, F.size(c) - F.pmod(n, F.size(c)) + 1, F.size(c)),
            F.slice(c, 1, F.size(c) - F.pmod(n, F.size(c))),
        )
    ),
    "arrayDotProduct": lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ),
    # set semantics (CH treats inputs as sets for the Jaccard index)
    "arrayJaccardIndex": lambda a, b: F.size(F.array_intersect(a, b))
    / F.size(F.array_union(a, b)).cast("double"),
    # CH argument order is (value, n); Spark's array_repeat matches
    "arrayWithConstant": lambda n, x: F.array_repeat(x, n),
    "countEqual": lambda c, x: F.size(
        F.filter(c, lambda e: e.eqNullSafe(x))
    ).cast("long"),
    # dense first-appearance numbering: array_distinct preserves
    # first-occurrence order, so position-in-distinct IS the dense id
    "arrayEnumerateDense": lambda c: F.transform(
        c, lambda x: F.array_position(F.array_distinct(c), x)
    ),
    # --- round-6 wave 8: map arithmetic ---
    # built over explicit key-union transforms instead of map_concat:
    # Spark's duplicate-key policy (mapKeyDedupPolicy) defaults to
    # EXCEPTION, so merged maps must never materialize duplicate keys
    "mapAdd": lambda m1, m2: F.map_from_arrays(
        F.array_union(F.map_keys(m1), F.map_keys(m2)),
        F.transform(
            F.array_union(F.map_keys(m1), F.map_keys(m2)),
            lambda k: F.coalesce(F.element_at(m1, k), F.lit(0))
            + F.coalesce(F.element_at(m2, k), F.lit(0)),
        ),
    ),
    "mapSubtract": lambda m1, m2: F.map_from_arrays(
        F.array_union(F.map_keys(m1), F.map_keys(m2)),
        F.transform(
            F.array_union(F.map_keys(m1), F.map_keys(m2)),
            lambda k: F.coalesce(F.element_at(m1, k), F.lit(0))
            - F.coalesce(F.element_at(m2, k), F.lit(0)),
        ),
    ),
    "mapUpdate": lambda m1, m2: F.map_from_arrays(
        F.array_union(F.map_keys(m1), F.map_keys(m2)),
        F.transform(
            F.array_union(F.map_keys(m1), F.map_keys(m2)),
            lambda k: F.coalesce(F.element_at(m2, k), F.element_at(m1, k)),
        ),
    ),
    # --- round-6 wave 8: JSON (simpleJSON = CH's visitParam family) ---
    "JSONExtractKeys": F.json_object_keys,
    # field name must be a Python literal (get_json_object's path is a
    # constant in the JVM signature)
    "simpleJSONExtractInt": lambda c, f: F.get_json_object(
        c, "$." + _literal_sep(f)
    ).try_cast("long"),
    "simpleJSONExtractFloat": lambda c, f: F.get_json_object(
        c, "$." + _literal_sep(f)
    ).try_cast("double"),
    "simpleJSONExtractBool": lambda c, f: F.get_json_object(
        c, "$." + _literal_sep(f)
    )
    == F.lit("true"),
    # --- round-6 wave 8: URL ---
    "fragment": lambda c: F.coalesce(F.parse_url(c, F.lit("REF")), F.lit("")),
    "cutFragment": lambda c: F.regexp_replace(c, "#.*$", ""),
    # strips the query string but PRESERVES the fragment
    # ('http://e.com/p?q=1#f' → 'http://e.com/p#f'), unlike
    # cutQueryStringAndFragment which drops both
    "cutQueryString": lambda c: F.regexp_replace(c, r"\?[^#]*", ""),
    "cutQueryStringAndFragment": lambda c: F.regexp_replace(
        c, r"[?#].*$", ""
    ),
    "extractURLParameter": lambda c, name: F.coalesce(
        F.parse_url(c, F.lit("QUERY"), name), F.lit("")
    ),
    # --- round-6 wave 8: conditional / misc ---
    # CH transform(x, from, to, default): value-mapping via a literal map
    "transform": lambda x, frm, to, default: F.coalesce(
        F.element_at(F.map_from_arrays(frm, to), x), default
    ),
    "throwIf": lambda cond, msg="throwIf": F.when(
        cond, F.raise_error(F.lit(msg) if not isinstance(msg, Column) else msg)
    ).otherwise(F.lit(0)),
    "isZeroOrNull": lambda c: F.coalesce(c == 0, F.lit(True)),
    "toNullable": lambda c: c,
    "murmurHash3_32": F.hash,  # same algorithm family, Spark seed 42
    # --- round-7 wave 9 (translation-table audit fill-ins) ---
    "addWeeks": lambda c, n: F.date_add(c, n * 7),
    "subtractWeeks": lambda c, n: F.date_sub(c, n * 7),
    "trunc": lambda c, n=0: CH_FUNCTIONS["truncate"](c, n),
    "intExp10": lambda c: F.pow(F.lit(10), c).cast("long"),
    # CH roundToExp2: 0 for x < 1, else the largest power of two <= x
    "roundToExp2": lambda c: F.when(c < 1, F.lit(0)).otherwise(
        F.pow(F.lit(2), F.floor(F.log2(c))).cast("long")
    ),
    # CH roundDown(x, arr): largest array element <= x, else arr[1]
    "roundDown": lambda c, arr: F.coalesce(
        F.array_max(F.filter(arr, lambda e: e <= c)), F.element_at(arr, 1)
    ),
    "leftPadUTF8": F.lpad,  # Spark strings are UTF-16: already safe
    "rightPadUTF8": F.rpad,
    "toDecimal64": lambda c, s: c.cast(f"decimal(18,{int(s)})"),
    "toUnixTimestamp64Milli": F.unix_millis,
    "fromUnixTimestamp64Milli": F.timestamp_millis,
    "isNotDistinctFrom": lambda a, b: a.eqNullSafe(b),
    # decimal-unit (1000) twin of formatReadableSize
    "formatReadableDecimalSize": lambda c: _format_readable_1000(
        c, ["B", "KB", "MB", "GB", "TB"], "%.2f %s"
    ),
    "formatReadableQuantity": lambda c: _format_readable_1000(
        c, ["", " thousand", " million", " billion", " trillion"],
        "%.2f%s",
    ),
    # --- round-7 wave 9b (audit "unclaimed trivial" harvest) ---
    "positiveModulo": F.pmod,
    "makeDate": F.make_date,
    "makeDateTime": lambda y, mo, d, h, mi, s: F.make_timestamp(
        y, mo, d, h, mi, s
    ),
    "monthsBetween": F.months_between,
    "width_bucket": F.width_bucket,
    "JSONArrayLength": F.json_array_length,
    "toJSONString": F.to_json,
    "arrayUnion": lambda a, b: F.array_union(a, b),
    "clamp": lambda x, lo, hi: F.greatest(F.least(x, hi), lo),
    "domainWithoutWWW": lambda c: F.regexp_replace(
        F.coalesce(F.parse_url(c, F.lit("HOST")), F.lit("")),
        r"^www\.", ""
    ),
    "cutWWW": lambda c: F.regexp_replace(c, r"//www\.", "//"),
    "pathFull": lambda c: F.concat(
        F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit("")),
        F.coalesce(
            F.concat(F.lit("?"), F.parse_url(c, F.lit("QUERY"))), F.lit("")
        ),
    ),
    "queryStringAndFragment": lambda c: F.concat(
        F.coalesce(F.parse_url(c, F.lit("QUERY")), F.lit("")),
        F.coalesce(
            F.concat(F.lit("#"), F.parse_url(c, F.lit("REF"))), F.lit("")
        ),
    ),
    "isIPv4String": lambda c: c.rlike(
        r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
        r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
    ),
    "isIPv6String": lambda c: c.rlike(r"^[0-9A-Fa-f:]+$")
    & (F.length(c) - F.length(F.replace(c, F.lit(":"), F.lit(""))) >= 2),
    "firstLine": lambda c: F.element_at(F.split(c, r"\r?\n", 2), 1),
    "appendTrailingCharIfAbsent": lambda c, ch: F.when(
        c.endswith(ch), c
    ).otherwise(F.concat(c, ch if isinstance(ch, Column) else F.lit(ch))),
    "toBool": lambda c: c.cast("boolean"),
    "dateSub": lambda unit, n, c: F.timestamp_add(unit, -n, c),
    "timestampAdd": lambda unit, n, c: F.timestamp_add(unit, n, c),
    "timestampSub": lambda unit, n, c: F.timestamp_add(unit, -n, c),
    # unit must be a Python literal (date_trunc's JVM signature)
    "date_trunc": lambda unit, c: F.date_trunc(_literal_sep(unit), c),
    "toYYYYMMDDhhmmss": lambda c: F.date_format(
        c, "yyyyMMddHHmmss"
    ).cast("long"),
    # CH default mode: week ends Sunday; idempotent on a Sunday input
    "toLastDayOfWeek": lambda c: F.next_day(F.date_sub(c, 1), "Sun"),
    "SHA1": F.sha1,
    "SHA224": lambda c: F.sha2(c, 224),
    "SHA512": lambda c: F.sha2(c, 512),
    "accurateCastOrDefault": lambda c, t, d: F.coalesce(c.try_cast(t), d),
    # --- round-7 wave 10: vector norms / distances (scalar forms of the
    # operators/similarity.py folds; general-p included) ---
    "L2SquaredNorm": lambda c: _fold_sum(F.transform(c, lambda x: x * x)),
    "LpNorm": lambda c, p: F.pow(
        _fold_sum(
            F.transform(c, lambda x: F.pow(F.abs(x.cast("double")), float(p)))
        ),
        1.0 / float(p),
    ),
    "LpDistance": lambda a, b, p: CH_FUNCTIONS["LpNorm"](
        F.zip_with(a, b, lambda x, y: x - y), p
    ),
    # the norm rides in via zip_with against array_repeat so it is
    # evaluated ONCE per row — a plain transform lambda would re-fold
    # the O(n) norm for every element (O(n²) per 1024-dim embedding)
    "L1Normalize": lambda c: F.zip_with(
        c,
        F.array_repeat(_l1_norm(c), F.size(c)),
        lambda x, nrm: x.cast("double") / nrm,
    ),
    "L2Normalize": lambda c: F.zip_with(
        c,
        F.array_repeat(_l2_norm(c), F.size(c)),
        lambda x, nrm: x.cast("double") / nrm,
    ),
    # --- round-7 wave 10: IPv4 / MAC / UUID conversions ---
    "IPv4StringToNum": _ipv4_string_to_num,
    "IPv4StringToNumOrNull": lambda c: F.when(
        c.rlike(_IPV4_RE), _ipv4_string_to_num(c)
    ),
    "IPv4NumToStringClassC": lambda c: F.concat_ws(
        ".",
        F.shiftright(c, 24).bitwiseAND(255).cast("string"),
        F.shiftright(c, 16).bitwiseAND(255).cast("string"),
        F.shiftright(c, 8).bitwiseAND(255).cast("string"),
        F.lit("xxx"),
    ),
    # CH returns the IPv6 binary; rendered here as the canonical
    # IPv4-mapped text form ('::ffff:a.b.c.d') — the string Spark-side
    # IPv6 story supports (no 128-bit binary type)
    "IPv4ToIPv6": lambda c: F.concat(
        F.lit("::ffff:"), CH_FUNCTIONS["IPv4NumToString"](c)
    ),
    # (lo, hi) of the prefix-masked block, dotted-quad rendered; exact
    # long-int mask math, no float
    "IPv4CIDRToRange": lambda c, p: F.struct(
        CH_FUNCTIONS["IPv4NumToString"](
            c.bitwiseAND(F.lit(-(1 << (32 - int(p))) & 0xFFFFFFFF))
        ).alias("lo"),
        CH_FUNCTIONS["IPv4NumToString"](
            c.bitwiseOR(F.lit((1 << (32 - int(p))) - 1))
        ).alias("hi"),
    ),
    "isIPAddressInRange": lambda c, cidr: (
        lambda ip, pfx: (
            _ipv4_string_to_num(c).bitwiseAND(
                F.lit(-(1 << (32 - pfx)) & 0xFFFFFFFF)
            )
            == _ipv4_string_to_num(F.lit(ip)).bitwiseAND(
                F.lit(-(1 << (32 - pfx)) & 0xFFFFFFFF)
            )
        )
    )(*(lambda s: (s[0], int(s[1])))(_literal_sep(cidr).split("/"))),
    "MACNumToString": lambda c: F.lower(
        F.concat_ws(
            ":",
            *[
                F.lpad(
                    F.hex(F.shiftright(c, b).bitwiseAND(255)), 2, "0"
                )
                for b in (40, 32, 24, 16, 8, 0)
            ],
        )
    ),
    "MACStringToNum": lambda c: F.conv(
        F.replace(c, F.lit(":"), F.lit("")), 16, 10
    ).cast("long"),
    "MACStringToOUI": lambda c: F.conv(
        F.substring(F.replace(c, F.lit(":"), F.lit("")), 1, 6), 16, 10
    ).cast("long"),
    "UUIDStringToNum": lambda c: F.unhex(
        F.replace(c, F.lit("-"), F.lit(""))
    ),
    "UUIDNumToString": lambda c: F.lower(
        F.concat_ws(
            "-",
            F.substring(F.hex(c), 1, 8),
            F.substring(F.hex(c), 9, 4),
            F.substring(F.hex(c), 13, 4),
            F.substring(F.hex(c), 17, 4),
            F.substring(F.hex(c), 21, 12),
        )
    ),
    # --- round-7 wave 10: bit surface ---
    "bitHammingDistance": lambda a, b: F.bit_count(a.bitwiseXOR(b)),
    # 64-bit rotates (CH rotates at the input's width; we standardize on
    # UInt64 — the long cast matters: shifts on int columns wrap at 32)
    "bitRotateLeft": lambda c, n: F.shiftleft(
        c.cast("long"), _rot_n(n)
    ).bitwiseOR(F.shiftrightunsigned(c.cast("long"), (64 - _rot_n(n)) % 64)),
    "bitRotateRight": lambda c, n: F.shiftrightunsigned(
        c.cast("long"), _rot_n(n)
    ).bitwiseOR(F.shiftleft(c.cast("long"), (64 - _rot_n(n)) % 64)),
    "bitTestAll": lambda c, *pos: F.lit(True)
    if not pos
    else F.aggregate(
        F.array(*[F.lit(int(p)) for p in pos]),
        F.lit(True),
        lambda acc, i: acc
        & (
            c.bitwiseAND(F.element_at(_bit_masks_col(), i + 1))
            != 0
        ),
    ),
    "bitTestAny": lambda c, *pos: F.lit(False)
    if not pos
    else F.aggregate(
        F.array(*[F.lit(int(p)) for p in pos]),
        F.lit(False),
        lambda acc, i: acc
        | (
            c.bitwiseAND(F.element_at(_bit_masks_col(), i + 1))
            != 0
        ),
    ),
    # set-bit positions ascending; bit 63 tested via the sign-bit mask
    # (shift amounts can't be Columns in Spark, masks can)
    "bitPositionsToArray": lambda c: F.filter(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: c.bitwiseAND(F.element_at(_bit_masks_col(), i + 1)) != 0,
    ),
    # --- round-7 wave 10: arrays ---
    "arrayCumSumNonNegative": lambda c: F.slice(
        F.aggregate(
            c,
            F.array().cast("array<double>"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.greatest(
                        F.lit(0.0),
                        F.coalesce(
                            F.try_element_at(acc, F.lit(-1)), F.lit(0.0)
                        )
                        + x,
                    )
                ),
            ),
        ),
        1,
        F.size(c),
    ),
    "arrayLastIndex": lambda f, c: F.coalesce(
        F.try_element_at(
            F.filter(
                F.sequence(F.lit(1), F.greatest(F.size(c), F.lit(1))),
                lambda i: (i <= F.size(c)) & f(F.element_at(c, i)),
            ),
            F.lit(-1),
        ),
        F.lit(0),
    ).cast("long"),
    # CH contract: first `limit` cells sorted ascending, tail order
    # unspecified — a full sort satisfies it (documented: we return the
    # fully sorted array, a legal instance of the unspecified tail)
    "arrayPartialSort": lambda limit, c: F.sort_array(c),
    # CH defines a NEGATIVE shift as shifting the other direction —
    # dispatch on the literal's sign (a raw negative n would feed
    # slice() a 0 start, which throws at runtime)
    "arrayShiftLeft": lambda c, n, fill=None: (
        CH_FUNCTIONS["arrayShiftRight"](c, -int(n), fill)
        if int(n) < 0
        else F.concat(
            F.slice(
                c,
                F.least(F.lit(int(n)) + 1, F.size(c) + 1),
                F.greatest(F.size(c) - int(n), F.lit(0)),
            ),
            F.array_repeat(
                F.lit(0) if fill is None else fill,
                F.least(F.lit(int(n)), F.size(c)),
            ),
        )
    ),
    "arrayShiftRight": lambda c, n, fill=None: (
        CH_FUNCTIONS["arrayShiftLeft"](c, -int(n), fill)
        if int(n) < 0
        else F.concat(
            F.array_repeat(
                F.lit(0) if fill is None else fill,
                F.least(F.lit(int(n)), F.size(c)),
            ),
            F.slice(c, 1, F.greatest(F.size(c) - int(n), F.lit(0))),
        )
    ),
    "arrayReduce": _array_reduce,
    # nondeterministic on both engines — never route through an oracle
    "arrayShuffle": F.shuffle,
    "arrayRandomSample": lambda c, k: F.slice(F.shuffle(c), 1, int(k)),
    # --- round-7 wave 10: strings / tokens ---
    "alphaTokens": lambda c: F.filter(
        F.split(c, "[^A-Za-z]+"), lambda x: x != ""
    ),
    # --- round-7 wave 10: JSON (SQL/JSON entry points + UInt widths;
    # same missing→NULL convention as the existing Extract family,
    # documented delta vs CH's 0-default) ---
    "JSON_VALUE": lambda c, p: F.get_json_object(c, _literal_sep(p)),
    "JSON_QUERY": lambda c, p: F.get_json_object(c, _literal_sep(p)),
    "JSON_EXISTS": lambda c, p: F.get_json_object(
        c, _literal_sep(p)
    ).isNotNull(),
    # unsigned: negative parses are NOT a UInt → NULL (missing→NULL
    # convention as above)
    "JSONExtractUInt": lambda c, k: (
        lambda v: F.when(v >= 0, v)
    )(F.get_json_object(c, f"$.{k}").try_cast("long")),
    "simpleJSONExtractUInt": lambda c, k: CH_FUNCTIONS["JSONExtractUInt"](
        c, k
    ),
    "simpleJSONHas": lambda c, k: F.get_json_object(
        c, f"$.{k}"
    ).isNotNull(),
    # --- round-7 wave 10: URL hierarchy + misc ---
    "URLHierarchy": _url_hierarchy,
    "URLPathHierarchy": _url_path_hierarchy,
    # trailing '/' or '#' stripped then hashed; xxhash64 stands in for
    # CH's internal hash (NON_BIT_COMPATIBLE)
    "URLHash": lambda c: F.xxhash64(F.regexp_replace(c, "[/#]$", "")),
    "UTCTimestamp": lambda: F.current_timestamp(),
    "accurateCast": lambda c, t: c.cast(_literal_sep(t)),
    "accurateCastOrNull": lambda c, t: c.try_cast(_literal_sep(t)),
    "toIPv4": _ipv4_string_to_num,
    # --- round-7 wave 10b: bitmap family over the sorted-distinct
    # array<long> view. CH's RoaringBitmap is a compressed SET of
    # uint32s; every documented operation is set algebra, so a sorted
    # deduplicated array is a faithful (if uncompressed) carrier —
    # the 100 TB note is that Spark shuffles these as plain arrays, so
    # bitmap columns should stay per-group small (segments, day sets),
    # which is also how CH uses them (retention/segment math).
    "bitmapBuild": lambda c: F.array_sort(F.array_distinct(c)),
    "bitmapToArray": lambda c: c,
    "bitmapCardinality": lambda c: F.size(c).cast("long"),
    "bitmapAnd": lambda a, b: F.array_sort(F.array_intersect(a, b)),
    "bitmapOr": lambda a, b: F.array_sort(F.array_union(a, b)),
    "bitmapXor": lambda a, b: F.array_sort(
        F.array_union(F.array_except(a, b), F.array_except(b, a))
    ),
    "bitmapAndnot": lambda a, b: F.array_sort(F.array_except(a, b)),
    "bitmapAndCardinality": lambda a, b: F.size(
        F.array_intersect(a, b)
    ).cast("long"),
    "bitmapOrCardinality": lambda a, b: F.size(F.array_union(a, b)).cast(
        "long"
    ),
    "bitmapXorCardinality": lambda a, b: (
        F.size(F.array_except(a, b)) + F.size(F.array_except(b, a))
    ).cast("long"),
    "bitmapAndnotCardinality": lambda a, b: F.size(
        F.array_except(a, b)
    ).cast("long"),
    "bitmapContains": lambda b, x: F.array_contains(b, x),
    "bitmapHasAny": lambda a, b: F.arrays_overlap(a, b),
    "bitmapHasAll": lambda a, b: F.size(F.array_except(b, a)) == 0,
    # CH returns UINT32_MAX / 0 on the empty bitmap
    "bitmapMin": lambda b: F.coalesce(
        F.array_min(b).cast("long"), F.lit(4294967295)
    ),
    "bitmapMax": lambda b: F.coalesce(
        F.array_max(b).cast("long"), F.lit(0).cast("long")
    ),
    # [start, end) value-range subset, like the CH docs' contract
    "bitmapSubsetInRange": lambda b, s, e: F.filter(
        b, lambda x: (x >= s) & (x < e)
    ),
    # values >= start, capped at `limit` smallest (input is sorted)
    "bitmapSubsetLimit": lambda b, s, limit: F.slice(
        F.filter(b, lambda x: x >= s), 1, limit
    ),
    # offset/limit page of the sorted value sequence (0-based offset)
    "subBitmap": lambda b, off, limit: F.slice(b, off + 1, limit),
    "bitmapTransform": lambda b, frm, to: F.array_sort(
        F.array_distinct(
            F.transform(
                b,
                lambda x: F.coalesce(
                    F.element_at(F.map_from_arrays(frm, to), x), x
                ),
            )
        )
    ),
    # aggregate forms: groupBitmap returns the CARDINALITY (CH contract);
    # the And/Or/Xor variants fold bitmap columns set-algebraically.
    # collect_list is bounded by group count × bitmap width — the same
    # per-group-small discipline as the scalar ops above.
    "groupBitmap": lambda c: F.count_distinct(c),
    "groupBitmapOr": lambda c: F.size(
        F.array_distinct(F.flatten(F.collect_list(c)))
    ).cast("long"),
    "groupBitmapAnd": lambda c: (
        lambda lst: F.size(
            F.aggregate(
                lst,
                F.element_at(lst, 1),
                lambda acc, x: F.array_intersect(acc, x),
            )
        ).cast("long")
    )(F.collect_list(c)),
    "groupBitmapXor": lambda c: (
        lambda lst: F.size(
            F.aggregate(
                lst,
                F.array().cast("array<long>"),
                lambda acc, x: F.array_union(
                    F.array_except(acc, x), F.array_except(x, acc)
                ),
            )
        ).cast("long")
    )(F.collect_list(c)),
    # --- round-7 wave 11: datetime formats in the MySQL %-dialect CH
    # actually speaks (the earlier formatDateTime passthrough took Java
    # patterns — a silent dialect mismatch, now translated) ---
    "formatDateTime": lambda c, fmt: F.date_format(
        c, _mysql_datetime_format(fmt)
    ),
    "parseDateTime": lambda c, fmt: F.to_timestamp(
        c, _mysql_datetime_format(fmt)
    ),
    "parseDateTimeOrNull": lambda c, fmt: F.try_to_timestamp(
        c, F.lit(_mysql_datetime_format(fmt))
    ),
    # --- round-7 wave 11: integer math ---
    "gcd": _gcd,
    # |a|/g via exact decimal division (g divides |a|; a double
    # long/long division rounds above 2^53), then one long multiply
    "lcm": lambda a, b: F.when(
        (a == 0) | (b == 0), F.lit(0).cast("long")
    ).otherwise(
        (
            F.abs(a.cast("long")).cast("decimal(38,0)")
            / _gcd(a, b).cast("decimal(38,0)")
        ).cast("long")
        * F.abs(b.cast("long"))
    ),
    # exact up to 20! like CH (both engines overflow past int64 there).
    # The c < 1 guard matters twice over: 0! = 1, and Spark's
    # sequence(1, 0) silently DESCENDS ([1, 0] — step defaults to -1
    # when start > stop), which would multiply in a zero.
    "factorial": lambda c: F.when(
        c < 1, F.lit(1).cast("long")
    ).otherwise(
        F.aggregate(
            F.sequence(F.lit(1).cast("long"), c.cast("long")),
            F.lit(1).cast("long"),
            lambda acc, x: acc * x,
        )
    ),
    # zero-guarded twin of intDiv (same exact-decimal division; pmod is
    # CH's floored-remainder division convention)
    "intDivOrZero": lambda a, b: F.when(b == 0, F.lit(0)).otherwise(
        (a - F.pmod(a, b)).cast("decimal(38,0)") / b.cast("decimal(38,0)")
    ).cast("long"),
    "moduloOrZero": lambda a, b: F.when(b == 0, F.lit(0)).otherwise(
        a % b
    ),
    "max2": lambda a, b: F.greatest(a, b),
    "min2": lambda a, b: F.least(a, b),
    # 64-bit byte reverse: eight masked byte moves, all literal shifts
    "byteSwap": lambda c: sum(
        (
            F.shiftleft(
                F.shiftrightunsigned(c.cast("long"), 8 * i).bitwiseAND(255),
                8 * (7 - i),
            )
            for i in range(1, 8)
        ),
        F.shiftleft(c.cast("long").bitwiseAND(255), 56),
    ),
    # --- round-7 wave 11: strings / search ---
    # subsequence (gappy) containment; needle must be a literal
    "hasSubsequence": lambda c, needle: c.rlike(
        ".*".join(re.escape(ch) for ch in _literal_sep(needle))
    ),
    # contiguous array subsequence: some window of a equals b
    "hasSubstr": lambda a, b: F.when(F.size(b) == 0, F.lit(True)).otherwise(
        F.exists(
            F.sequence(
                F.lit(1), F.greatest(F.size(a) - F.size(b) + 1, F.lit(1))
            ),
            lambda i: (F.size(a) >= F.size(b))
            & (F.slice(a, i, F.size(b)) == b),
        )
    ),
    "hasToken": lambda c, tok: c.rlike(
        r"(^|[^A-Za-z0-9_])"
        + re.escape(_literal_sep(tok))
        + r"($|[^A-Za-z0-9_])"
    ),
    # --- round-7 wave 11: URL parameter utilities ---
    "extractURLParameterNames": lambda c: F.transform(
        F.filter(
            F.split(F.coalesce(F.parse_url(c, F.lit("QUERY")), F.lit("")), "&"),
            lambda kv: kv != "",
        ),
        lambda kv: F.element_at(F.split(kv, "=", 2), 1),
    ),
    "extractURLParameters": lambda c: F.filter(
        F.split(F.coalesce(F.parse_url(c, F.lit("QUERY")), F.lit("")), "&"),
        lambda kv: kv != "",
    ),
    "cutURLParameter": lambda c, name: F.regexp_replace(
        F.regexp_replace(
            c, rf"(?<=[?&]){re.escape(_literal_sep(name))}=[^&#]*&", ""
        ),
        rf"[?&]{re.escape(_literal_sep(name))}=[^&#]*",
        "",
    ),
    # regexp_extract yields '' when no port → try_cast NULL → default
    "port": lambda c, default=0: F.coalesce(
        F.regexp_extract(
            c, r"^[a-z][a-z0-9+.\-]*://[^/?#]*?:(\d+)", 1
        ).try_cast("long"),
        F.lit(int(default)).cast("long"),
    ),
    "netloc": lambda c: F.regexp_extract(
        c, r"^[a-z][a-z0-9+.\-]*://([^/?#]*)", 1
    ),
    # --- round-7 wave 11: map predicates over LIKE patterns ---
    "mapContainsKeyLike": lambda m, pat: F.size(
        F.filter(
            F.map_keys(m), lambda k: k.rlike(_like_to_rlike(pat))
        )
    )
    > 0,
    "mapExtractKeyLike": lambda m, pat: F.map_filter(
        m, lambda k, _v: k.rlike(_like_to_rlike(pat))
    ),
    "mapExists": lambda f, m: F.size(F.map_filter(m, f)) > 0,
    "mapAll": lambda f, m: F.size(F.map_filter(m, f)) == F.size(m),
    # --- round-7 wave 11: misc ---
    "emptyArrayUInt64": lambda: F.array().cast("array<long>"),
    # char-set Jaccard of two strings (the scalar sibling of
    # arrayJaccardIndex / the operator-level ngram pipelines)
    "stringJaccardIndex": lambda a, b: (
        lambda ca, cb: F.when(
            (F.length(a) == 0) & (F.length(b) == 0), F.lit(0.0)
        ).otherwise(
            F.size(F.array_intersect(ca, cb))
            / F.size(F.array_union(ca, cb)).cast("double")
        )
    )(
        F.filter(F.split(a, ""), lambda x: x != ""),
        F.filter(F.split(b, ""), lambda x: x != ""),
    ),
    # CH's documented escape set: \0 \ | ( ) ^ $ . [ ] ? * + { : -
    # (note: '{' yes, '}' no, ':' yes)
    "regexpQuoteMeta": lambda c: F.regexp_replace(
        c, r"([\\.$^*+?()\[\]{|:\-])", r"\\$1"
    ),
    # CH roundDuration: legacy fixed bucket set {0,1,10,30,60,120,180,
    # 240,300,600,1200,1800,3600,7200,18000,36000}
    "roundDuration": lambda c: F.coalesce(
        F.array_max(
            F.filter(
                F.array(
                    *[
                        F.lit(v)
                        for v in (0, 1, 10, 30, 60, 120, 180, 240, 300,
                                  600, 1200, 1800, 3600, 7200, 18000,
                                  36000)
                    ]
                ),
                lambda e: e <= c,
            )
        ),
        F.lit(0),
    ),
    # CH roundAge: {0,18,25,35,45,55} with <1 -> 0, 1..17 -> 17
    "roundAge": lambda c: F.when(c < 1, F.lit(0))
    .when(c < 18, F.lit(17))
    .otherwise(
        F.array_max(
            F.filter(
                F.array(*[F.lit(v) for v in (18, 25, 35, 45, 55)]),
                lambda e: e <= c,
            )
        )
    ),
    "translateUTF8": F.translate,  # Spark strings are UTF-16 already
    # Arrow-batched string-distance kernels (operators/text.py): the
    # per-pair DP/matching loops Catalyst can't express; bit-exact
    # against DuckDB's implementations on a 5000-pair fuzz
    "jaroSimilarity": lambda a, b: _text_jaro(a, b),
    "jaroWinklerSimilarity": lambda a, b: _text_jaro_winkler(a, b),
    "damerauLevenshteinDistance": lambda a, b: _text_damerau(a, b),
    # multi-needle position variants (multiSearchAny itself is the
    # registry's keyword-tagging query): 1-based positions, 0 = absent,
    # index/first-position over the needle array order
    "multiSearchAllPositions": lambda c, needles: F.transform(
        needles, lambda n: F.instr(c, n).cast("long")
    ),
    "multiSearchAny": lambda c, needles: F.exists(
        needles, lambda n: F.instr(c, n) > 0
    ),
    "multiSearchFirstIndex": lambda c, needles: F.coalesce(
        F.array_position(
            F.transform(needles, lambda n: F.instr(c, n) > 0), F.lit(True)
        ),
        F.lit(0),
    ).cast("long"),
    "multiSearchFirstPosition": lambda c, needles: F.coalesce(
        F.array_min(
            F.filter(
                F.transform(needles, lambda n: F.instr(c, n)),
                lambda p: p > 0,
            )
        ),
        F.lit(0),
    ).cast("long"),
    # ISO 8601 year = the year of the Thursday of c's ISO week
    # (weekday() is Monday=0, so Thursday = c + (3 - weekday))
    "toISOYear": lambda c: F.year(F.date_add(c, 3 - F.weekday(c))),
    # first Monday of the ISO year = Jan 4 rolled back to its Monday
    "toStartOfISOYear": lambda c: (
        lambda j4: F.date_sub(j4, F.weekday(j4))
    )(
        F.make_date(
            F.year(F.date_add(c, 3 - F.weekday(c))), F.lit(1), F.lit(4)
        )
    ),
    # UUIDs are strings in the rebuild (UUIDStringToNum is the binary
    # view); toUUID family = validated lowering
    "toUUID": lambda c: F.lower(c),
    "toUUIDOrNull": lambda c: F.when(
        c.rlike(
            "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
            "-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
        ),
        F.lower(c),
    ),
    "toUUIDOrZero": lambda c: F.coalesce(
        CH_FUNCTIONS["toUUIDOrNull"](c),
        F.lit("00000000-0000-0000-0000-000000000000"),
    ),
    "tryBase64Decode": lambda c: F.unbase64(c).cast("string"),
    # CH toRelative*Num family: ordinals "from a fixed point in the
    # past" — the documented anchors (epoch seconds; year*12+month;
    # weeks Monday-aligned: 1970-01-01 was a Thursday, so shifting by
    # +3 days puts the 604800 s boundaries exactly on Monday 00:00)
    "toRelativeYearNum": F.year,
    "toRelativeQuarterNum": lambda c: F.year(c) * 4 + F.quarter(c) - 1,
    "toRelativeMonthNum": lambda c: F.year(c) * 12 + F.month(c) - 1,
    "toRelativeWeekNum": lambda c: F.floor(
        (F.unix_timestamp(c) + 259200) / 604800
    ),
    "toRelativeDayNum": lambda c: F.datediff(
        c.cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long"),
    "toRelativeMinuteNum": lambda c: F.floor(F.unix_timestamp(c) / 60),
    "toRelativeSecondNum": lambda c: F.unix_timestamp(c),
    # transpose of extractAllGroupsVertical: one array per capture
    # group, each holding that group across all matches
    "extractAllGroupsHorizontal": lambda c, pat: (
        lambda p, ng: F.array(
            *[
                F.regexp_extract_all(c, F.lit(p), g + 1)
                for g in range(ng)
            ]
        )
    )(
        _literal_sep(pat),
        len(re.findall(r"(?<!\\)\((?!\?)", _literal_sep(pat))),
    ),
    # Z-order curve (the layout CH's mortonEncode serves and Spark's
    # ZORDER OPTIMIZE uses internally): 2-D interleave of two uint32s
    "mortonEncode": lambda x, y: _morton_spread(x).bitwiseOR(
        F.shiftleft(_morton_spread(y), 1)
    ),
    "mortonDecode": lambda code: F.struct(
        _morton_compact(code).alias("x"),
        _morton_compact(
            F.shiftrightunsigned(code.cast("long"), 1)
        ).alias("y"),
    ),
    # scalar twins of the operator-level text.py tokenizers (the dedup
    # stack keeps its own shingle pipeline; these are the CH names).
    # CH's default tokenizer splits on non-alphanumeric ASCII —
    # underscore IS a separator there, unlike \\w.
    "tokens": lambda c: F.filter(
        F.split(c, "[^A-Za-z0-9]+"), lambda x: x != ""
    ),
    # character n-grams, CH ngrams(s, n); n must be a literal. The
    # short-string guard is load-bearing: sequence(1, 0) DESCENDS in
    # Spark (default step -1), which would emit two bogus grams.
    "ngrams": lambda c, n: F.when(
        F.length(c) < int(n), F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(c) - int(n) + 1),
            lambda i: F.substring(c, i, int(n)),
        )
    ),
    # all regex matches, each as its capture-group array; the group
    # count is read from the LITERAL pattern (unescaped, non-(?:) open
    # parens), so the shape is static like Spark wants
    "extractAllGroupsVertical": lambda c, pat: (
        lambda p, ng: F.transform(
            F.regexp_extract_all(c, F.lit(p), 0),
            lambda mtext: F.array(
                *[
                    F.regexp_extract(mtext, p, g + 1)
                    for g in range(ng)
                ]
            ),
        )
    )(
        _literal_sep(pat),
        len(re.findall(r"(?<!\\)\((?!\?)", _literal_sep(pat))),
    ),
    "quantileGK": lambda c, q=0.5: F.percentile_approx(c, q),
    # --- round-7 wave 12 (final audit "unclaimed" harvest) ---
    # Spark strings are UTF-16 codepoints already; reverse is safe
    "reverseUTF8": F.reverse,
    # first-occurrence literal replace: instr + overlay (Spark's
    # replace/regexp_replace are replace-ALL). Empty needles are
    # undefined (CH inserts nothing; instr('x','')=1 would insert).
    "replaceOne": lambda s, needle, repl: (
        lambda nd, rp: F.when(F.instr(s, nd) == 0, s).otherwise(
            F.overlay(s, rp, F.instr(s, nd), F.length(nd))
        )
    )(
        needle if isinstance(needle, Column) else F.lit(needle),
        repl if isinstance(repl, Column) else F.lit(repl),
    ),
    # first-occurrence regex replace: locate the first match
    # (regexp_instr/extract), then regexp_replace ONLY the matched text
    # under full anchoring '^(?:pat)$' — the anchored re-match consumes
    # the whole matched text exactly once (no zero-width re-match after
    # it, which burned the earlier replace-the-prefix form on patterns
    # that match empty, fuzz case 'ccacbb' ~ 'c*'), and capture-group
    # numbering survives the non-capturing wrapper so backreferences
    # ($1) keep working. Known limit: lookarounds that peek outside the
    # matched text see the cut (document, don't pretend);
    # pattern/replacement are literals (regexp_extract's JVM signature).
    "replaceRegexpOne": lambda s, pat, repl: (
        lambda p, r: (
            lambda pos, mtext: F.when(pos == 0, s).otherwise(
                F.concat(
                    F.substring(s, 1, pos - 1),
                    F.regexp_replace(mtext, "^(?:" + p + ")$", r),
                    F.substring(
                        s, pos + F.length(mtext), F.length(s)
                    ),
                )
            )
        )(
            F.regexp_instr(s, F.lit(p)),
            F.regexp_extract(s, p, 0),
        )
    )(_literal_sep(pat), _literal_sep(repl)),
    # the five XML named entities, '&' first so entities don't
    # double-escape
    "encodeXMLComponent": lambda c: F.replace(
        F.replace(
            F.replace(
                F.replace(
                    F.replace(c, F.lit("&"), F.lit("&amp;")),
                    F.lit("<"),
                    F.lit("&lt;"),
                ),
                F.lit(">"),
                F.lit("&gt;"),
            ),
            F.lit('"'),
            F.lit("&quot;"),
        ),
        F.lit("'"),
        F.lit("&apos;"),
    ),
    "formatReadableTimeDelta": _format_readable_time_delta,
    # --- wave 13: bit decompose, special functions, JVM compat hashes,
    # byte distance, XML named-entity decode ---
    "bitmaskToArray": _bitmask_terms,
    "bitmaskToList": lambda c: F.array_join(
        F.transform(_bitmask_terms(c), lambda p: p.cast("string")),
        ",",
    ),
    "lgamma": _lgamma,
    # Γ(x) for x > 0; precision degrades with magnitude as exp(lgamma),
    # fine for the |Γ| < 1e6 range the surface query exercises
    "tgamma": lambda c: F.exp(_lgamma(c)),
    "erf": _erf,
    "erfc": lambda c: F.lit(1.0) - _erf(c),
    "javaHash": _java_hash,
    # hiveHash = javaHash with the sign bit cleared (CH docs): the
    # unsigned 32-bit value mod 2^31
    "hiveHash": lambda c: F.pmod(_java_hash_u32(c), F.lit(2147483648)),
    "byteHammingDistance": _byte_hamming,
    # inverse of encodeXMLComponent for the five NAMED entities; numeric
    # character references (&#NNN; / &#xHH;) are NOT decoded — Spark SQL
    # has no replace-with-callback, and the named five cover the
    # encode-side round trip ('&amp;' last so '&amp;lt;' decodes to
    # '&lt;', matching CH's single-pass scan)
    "decodeXMLComponent": lambda c: F.replace(
        F.replace(
            F.replace(
                F.replace(
                    F.replace(c, F.lit("&lt;"), F.lit("<")),
                    F.lit("&gt;"),
                    F.lit(">"),
                ),
                F.lit("&quot;"),
                F.lit('"'),
            ),
            F.lit("&apos;"),
            F.lit("'"),
        ),
        F.lit("&amp;"),
        F.lit("&"),
    ),
    # Simplified deterministic twin of CH's HTML text extractor
    # (reference grammar reaches it as a plain function name): drop
    # script/style subtrees, comments, then tags; collapse whitespace.
    # CH's C++ parser additionally handles CDATA and entity edge cases;
    # the regex chain is documented as the portable subset and is
    # identical in Java regex and RE2 — the whitespace collapse uses an
    # EXPLICIT class because the engines' \s disagree on \x0B (Java
    # includes it, RE2 does not) — so the DuckDB oracle reproduces it
    # byte-for-byte (registry: html_text_extraction).
    "extractTextFromHTML": lambda c: F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            c, r"(?is)<script[^>]*>.*?</script>", " "
                        ),
                        r"(?is)<style[^>]*>.*?</style>",
                        " ",
                    ),
                    r"(?s)<!--.*?-->",
                    " ",
                ),
                r"<[^>]*>",
                " ",
            ),
            r"[ \t\n\f\r]+",
            " ",
        )
    ),
    # bit-text -> characters: left-pad the FIRST group to a byte like
    # CH, then fold 8-bit chunks through conv(,2,10) -> char. The
    # empty-input guard is load-bearing (sequence(0,-1) DESCENDS).
    "unbin": lambda c: F.when(
        F.length(c) == 0, F.lit("")
    ).otherwise(
        (
            lambda padded: F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(0), (F.length(padded) / 8).cast("int") - 1
                    ),
                    lambda i: F.char(
                        F.conv(
                            F.substring(padded, i * 8 + 1, 8), 2, 10
                        ).cast("int")
                    ),
                ),
                "",
            )
        )(
            # pad the first group to a byte; substring-with-Column-len
            # because lpad's Python signature wants an int literal
            F.concat(
                F.substring(
                    F.lit("0000000"),
                    1,
                    (8 - F.pmod(F.length(c), F.lit(8))) % 8,
                ),
                c,
            )
        )
    ),
    "dateName": lambda part, c: {
        "year": lambda x: F.year(x).cast("string"),
        "quarter": lambda x: F.quarter(x).cast("string"),
        "month": lambda x: F.date_format(x, "MMMM"),
        "week": lambda x: F.weekofyear(x).cast("string"),
        "dayofyear": lambda x: F.dayofyear(x).cast("string"),
        "day": lambda x: F.dayofmonth(x).cast("string"),
        "weekday": lambda x: F.date_format(x, "EEEE"),
        "hour": lambda x: F.hour(x).cast("string"),
        "minute": lambda x: F.minute(x).cast("string"),
        "second": lambda x: F.second(x).cast("string"),
    }[_literal_sep(part).lower()](c),
    # --- round-8 wave: names promoted out of UNSUPPORTED ---
    # Modified Julian Day: day count anchored at 1858-11-17 (the public
    # astronomical definition; pure date arithmetic on both engines).
    "toModifiedJulianDay": lambda c: F.datediff(
        c.cast("date"), F.lit("1858-11-17").cast("date")
    ),
    "fromModifiedJulianDay": lambda c: F.date_add(
        F.lit("1858-11-17").cast("date"), c.cast("int")
    ),
    # week-numbering modes: 0 (MySQL default CH follows — Sunday weeks,
    # week 0 before the first Sunday) and 3 (ISO 8601, = toISOWeek).
    "toWeek": lambda c, mode=0: {0: _week_mode0, 3: F.weekofyear}[
        int(mode)
    ](c),
    "toYearWeek": lambda c, mode=0: {
        0: _yearweek_mode0,
        3: lambda x: F.year(F.date_add(x.cast("date"), 3 - F.weekday(x)))
        * 100
        + F.weekofyear(x),
    }[int(mode)](c),
    # CH toTime: keep the time-of-day, pin the date to 1970-01-02.
    "toTime": lambda c: F.timestamp_seconds(
        F.lit(86400) + F.pmod(F.unix_seconds(c), 86400)
    ),
    # sub-second makeDateTime: fraction/10^precision added as decimal
    # seconds (make_timestamp takes fractional seconds natively).
    "makeDateTime64": lambda y, mo, d, h, mi, s, frac=0, precision=3: (
        F.make_timestamp(
            y,
            mo,
            d,
            h,
            mi,
            s.cast("decimal(18,6)")
            + F.lit(frac).cast("decimal(18,6)")
            / F.lit(10 ** int(precision)).cast("decimal(18,6)"),
        )
    ),
    # US convention: month BEFORE day for slash/dash dates, then the
    # generic best-effort chain as fallback.
    "parseDateTimeBestEffortUS": lambda c: F.coalesce(
        F.try_to_timestamp(c, F.lit("M/d/yyyy H:m:s")),
        F.try_to_timestamp(c, F.lit("M/d/yyyy H:m")),
        F.try_to_timestamp(c, F.lit("M/d/yyyy")),
        F.try_to_timestamp(c, F.lit("M-d-yyyy H:m:s")),
        F.try_to_timestamp(c, F.lit("M-d-yyyy")),
        CH_FUNCTIONS["parseDateTimeBestEffort"](c),
    ),
    # timeSlots(start, duration[, size]): every size-aligned slot start
    # covering [start, start+duration] — slot ordinals are exact integer
    # floor-divides, so the sequence length is closed-form.
    "timeSlots": lambda ts, dur, size=1800: F.transform(
        F.sequence(
            F.floor(F.unix_seconds(ts) / int(size)).cast("long"),
            F.floor((F.unix_seconds(ts) + dur) / int(size)).cast("long"),
        ),
        lambda k: F.timestamp_seconds(k * int(size)),
    ),
    # map re-orderings: Spark maps serialize in construction order, so
    # rebuilding from sorted keys realizes CH's sorted map views.
    "mapSort": lambda m: F.map_from_arrays(
        F.array_sort(F.map_keys(m)),
        F.transform(
            F.array_sort(F.map_keys(m)), lambda k: F.element_at(m, k)
        ),
    ),
    "mapReverseSort": lambda m: F.map_from_arrays(
        F.reverse(F.array_sort(F.map_keys(m))),
        F.transform(
            F.reverse(F.array_sort(F.map_keys(m))),
            lambda k: F.element_at(m, k),
        ),
    ),
    # integer-keyed series densification: keys min..max (or ..bound),
    # absent keys -> 0 (the CH contract for mapPopulateSeries).
    "mapPopulateSeries": lambda m, bound=None: (
        lambda keys: F.map_from_arrays(
            keys,
            F.transform(
                keys, lambda k: F.coalesce(F.element_at(m, k), F.lit(0))
            ),
        )
    )(
        F.sequence(
            F.array_min(F.map_keys(m)),
            F.array_max(F.map_keys(m)) if bound is None else bound,
        )
    ),
    # NUL-padded fixed width; CH THROWS on overlong input — a scalar
    # shim cannot throw per-row, so overlong yields NULL (documented
    # delta, mirrors the *OrNull family shape).
    "toFixedString": lambda c, n: F.when(
        F.length(c) <= int(n), F.rpad(c, int(n), "\x00")
    ),
    # Hyperscan-backed in CH; the portable rewrite is the OR of the
    # literal pattern list (patterns must be literals — the static
    # shape is what lets Catalyst codegen the whole predicate chain).
    "multiMatchAny": lambda c, pats: F.array_contains(
        F.array(*[c.rlike(_literal_sep(p)) for p in pats]), F.lit(True)
    ),
    "multiMatchAnyIndex": lambda c, pats: F.coalesce(
        *[
            F.when(c.rlike(_literal_sep(p)), F.lit(i + 1))
            for i, p in enumerate(pats)
        ],
        F.lit(0),
    ),
    # tuple vector arithmetic — arrays are the rebuild's vector type
    # (SURVEY §2.B note on tuples; arrayDotProduct et al. already map),
    # so the tuple* family lands on zip_with/transform.
    "tuplePlus": lambda a, b: F.zip_with(a, b, lambda x, y: x + y),
    "tupleMinus": lambda a, b: F.zip_with(a, b, lambda x, y: x - y),
    "tupleMultiply": lambda a, b: F.zip_with(a, b, lambda x, y: x * y),
    "tupleDivide": lambda a, b: F.zip_with(a, b, lambda x, y: x / y),
    "tupleNegate": lambda a: F.transform(a, lambda x: -x),
    "tupleMultiplyByNumber": lambda a, n: F.transform(a, lambda x: x * n),
    "tupleDivideByNumber": lambda a, n: F.transform(a, lambda x: x / n),
    "tupleConcat": F.concat,
    "tupleHammingDistance": lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: (x != y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    ),
    # explicit-result-scale decimal arithmetic, truncating toward zero
    # (the CH contract) — exact at ANY requested scale via the scaled-
    # integer machinery (_decimal_div/_decimal_mul below), not native
    # decimal division (whose Spark result type decimal(38,6) would
    # HALF_UP-round the quotient at 6 fractional digits BEFORE the
    # truncation — the r8 ADVICE finding).
    # r11 promotions out of the unsupported tail (r10 verdict #7)
    "addInterval": lambda t, iv: t + iv,
    "toStringCutToZero": lambda c: F.substring_index(c, "\x00", 1),
    "timeZone": lambda: F.expr("current_timezone()"),
    # single-process engine: the server zone IS the session zone
    # (pinned UTC in session.py)
    "serverTimeZone": lambda: F.expr("current_timezone()"),
    # LowCardinality is a storage codec; at query level the function is
    # the identity (parquet dictionary encoding is automatic)
    "toLowCardinality": lambda c: c,
    "punycodeEncode": _text_kernel("punycodeEncode", _py_punycode_encode),
    "punycodeDecode": _text_kernel("punycodeDecode", _py_punycode_decode),
    "idnaEncode": _text_kernel("idnaEncode", _py_idna_encode),
    "idnaDecode": _text_kernel("idnaDecode", _py_idna_decode),
    "isValidUTF8": _text_kernel("isValidUTF8", _py_is_valid_utf8, "long"),
    "toValidUTF8": _text_kernel("toValidUTF8", _py_to_valid_utf8),
    "ngramDistance": _two_arg_kernel("ngramDistance", _py_ngram_distance),
    "ngramSearch": _two_arg_kernel("ngramSearch", _py_ngram_search),
    "divideDecimal": lambda a, b, scale=10: _decimal_div(a, b, int(scale)),
    "multiplyDecimal": lambda a, b, scale=10: _decimal_mul(
        a, b, int(scale)
    ),
    # two-proportion z-test: pooled z statistic + unpooled Wald CI for
    # p1-p2. p-value omitted: neither engine exposes erf, and shipping
    # a polynomial approximation would be false precision (documented).
    "proportionsZTest": lambda sx, sy, tx, ty, conf=0.95: (
        lambda p1, p2, pp: F.struct(
            (
                (p1 - p2)
                / F.sqrt(pp * (1 - pp) * (1.0 / tx + 1.0 / ty))
            ).alias("z_stat"),
            (
                (p1 - p2)
                - F.lit(_Z_ALPHA_2[round(1 - conf, 10)])
                * F.sqrt(p1 * (1 - p1) / tx + p2 * (1 - p2) / ty)
            ).alias("ci_low"),
            (
                (p1 - p2)
                + F.lit(_Z_ALPHA_2[round(1 - conf, 10)])
                * F.sqrt(p1 * (1 - p1) / tx + p2 * (1 - p2) / ty)
            ).alias("ci_high"),
        )
    )(
        sx.cast("double") / tx,
        sy.cast("double") / ty,
        (sx + sy).cast("double") / (tx + ty),
    ),
    # closed-form minimum sample sizes (normal approximation); the
    # power/alpha grid is the explicit constant table _Z_POWER/_Z_ALPHA_2
    "minSampleSizeConversion": lambda p1, mde, power=0.8, alpha=0.05: (
        lambda za, zb, p2: (
            F.pow(
                za * F.sqrt(2 * ((p1 + p2) / 2) * (1 - (p1 + p2) / 2))
                + zb * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2)),
                2,
            )
            / (mde * mde)
        )
    )(
        F.lit(_Z_ALPHA_2[round(alpha, 10)]),
        F.lit(_Z_POWER[round(power, 10)]),
        p1 + mde,
    ),
    "minSampleSizeContinuous": lambda mu, sigma, mde, power=0.8, alpha=0.05: (
        F.lit(2.0)
        * F.pow(
            F.lit(_Z_ALPHA_2[round(alpha, 10)])
            + F.lit(_Z_POWER[round(power, 10)]),
            2,
        )
        * (sigma * sigma)
        / ((mde * mu) * (mde * mu))
    ),
    # bit-exact ClickHouse integer hashes (see the _u64_* helpers: exact
    # wrapping uint64 arithmetic in DECIMAL(38,0), no UDF, codegen-able)
    "intHash32": _int_hash32,
    "intHash64": _int_hash64,
    "normalizeUTF8NFC": _nfc,
    "normalizeUTF8NFD": _normalize_utf8("NFD"),
    "normalizeUTF8NFKC": _normalize_utf8("NFKC"),
    "normalizeUTF8NFKD": _normalize_utf8("NFKD"),
    # English Porter stemmer (functions/porter.py); other languages
    # raise — see _stem
    "stem": _stem,
    # CH splits on runs of non-alphanumeric ASCII (same separator class
    # as `tokens`); empty leading/trailing fragments dropped.
    "splitByNonAlpha": lambda c: F.filter(
        F.split(c, "[^A-Za-z0-9]+"), lambda x: x != ""
    ),
    # docs-page alias of length() over arrays
    "length_array": F.size,
    # Spark strings are UTF-16 code units — the UTF8-suffixed variants
    # collapse onto their base mappings (documented in NON_BIT notes)
    "positionCaseInsensitiveUTF8": lambda c, s: F.instr(
        F.lower(c), F.lower(s)
    ),
    # Base58 (Bitcoin alphabet) as pure Catalyst bignum arithmetic for
    # inputs ≤ 8 ASCII bytes (value < 2^64 → the DECIMAL(38,0) u64
    # machinery; NULL for longer/non-ASCII inputs — documented shim
    # bound; a web-scale pipeline would Arrow-UDF the long tail).
    "base58Encode": lambda c: _base58_encode(c),
    "base58Decode": lambda c: _base58_decode(c),
    # Geo family as literal-unrolled Catalyst arithmetic (r8 wave 7):
    # geohash bisection-bit interleave, ray-cast polygon test against a
    # literal polygon, any-of literal ellipses, haversine central angle.
    "geohashEncode": lambda lon, lat, p=12: _geohash_encode(lon, lat, p),
    "geohashDecode": lambda s, p=12: _geohash_decode(s, p),
    "geohashesInBox": lambda a, b, c, d, p=4: _geohashes_in_box(
        a, b, c, d, p
    ),
    "pointInPolygon": lambda x, y, poly: _point_in_polygon(x, y, poly),
    "pointInEllipses": lambda x, y, *e: _point_in_ellipses(x, y, *e),
    "greatCircleAngle": _great_circle_angle,
    # Effective-TLD domain extraction with the fixed non-Custom label
    # set (the *Custom public-suffix-list variants stay unsupported).
    "firstSignificantSubdomain": _first_significant_subdomain,
    "cutToFirstSignificantSubdomain": _cut_to_first_significant_subdomain,
}


# ---------------------------------------------------------------------------
# round-12 promotions out of the reasoned-unsupported tail (r11 verdict #1/#4)
# ---------------------------------------------------------------------------

#: lazily-built Arrow kernels for this block, keyed by (name, literal args)
_R12_UDFS: dict = {}


def _crc32_ieee(c: Column) -> Column:
    """ClickHouse ``CRC32IEEE``: reflected CRC-32 (poly 0xEDB88320) with
    init 0 and no final xor (the public CRCImpl in the CH function
    reference). Pure-JVM identity — a reflected CRC is affine in its
    init state, so crc(init=0, M) = zlib(M) XOR zlib(0^len(M)): the
    init/final-xor terms cancel. Verified against a bit-level reference
    implementation on the full priority vector set."""
    zeros = F.call_function(
        "repeat", F.lit("\x00"), F.octet_length(c)
    )
    return F.crc32(c.cast("binary")).bitwiseXOR(
        F.crc32(zeros.cast("binary"))
    )


_CRC64_POLY = 0xC96C5795D7870F42  # reflected CRC-64/ECMA-182 (CH CRC64)


def _crc64(c: Column) -> Column:
    """ClickHouse ``CRC64``: reflected CRC-64 with the ECMA-182
    polynomial, init 0, no final xor. Table-driven Arrow kernel; the
    UInt64 result is returned as its two's-complement Int64 (the repo's
    standing UInt64 convention)."""
    if "crc64" not in _R12_UDFS:
        tab = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ _CRC64_POLY if crc & 1 else crc >> 1
            tab.append(crc)

        def one(v):
            if isinstance(v, str):
                v = v.encode("utf-8")
            crc = 0
            for b in v:
                crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
            return crc - (1 << 64) if crc >= (1 << 63) else crc

        _R12_UDFS["crc64"] = F.pandas_udf(
            lambda s: s.map(lambda v: None if v is None else one(v)),
            "long",
        )
    return _R12_UDFS["crc64"](c)


def _render_ipv6_py(b: bytes) -> str:
    """RFC 5952 canonical text form, with ClickHouse's IPv4-mapped
    special case: ``::ffff:a.b.c.d`` renders the dotted-quad tail
    (Python's ipaddress would render ``::ffff:c0a8:2``)."""
    import ipaddress

    a = ipaddress.IPv6Address(bytes(b))
    m = a.ipv4_mapped
    return f"::ffff:{m}" if m is not None else str(a)


def _ipv6_num_to_string(c: Column) -> Column:
    """``IPv6NumToString(FixedString(16))`` → canonical text. The
    16-byte address travels as BINARY (Spark has no 128-bit int)."""
    if "ipv6n2s" not in _R12_UDFS:
        _R12_UDFS["ipv6n2s"] = F.pandas_udf(
            lambda s: s.map(
                lambda v: None
                if v is None or len(v) != 16
                else _render_ipv6_py(v)
            ),
            "string",
        )
    return _R12_UDFS["ipv6n2s"](c)


def _ipv6_string_to_num_py(v: str):
    import ipaddress

    try:
        a = ipaddress.ip_address(v)
    except ValueError:
        return None  # CH throws; repo policy: NULL on invalid input
    if isinstance(a, ipaddress.IPv4Address):
        return b"\x00" * 10 + b"\xff\xff" + a.packed  # IPv4-mapped (CH)
    return a.packed


def _ipv6_string_to_num(c: Column) -> Column:
    """``IPv6StringToNum(text)`` → 16-byte BINARY; dotted-quad input
    maps to the IPv4-mapped block exactly as ClickHouse does."""
    if "ipv6s2n" not in _R12_UDFS:
        _R12_UDFS["ipv6s2n"] = F.pandas_udf(
            lambda s: s.map(
                lambda v: None if v is None else _ipv6_string_to_num_py(v)
            ),
            "binary",
        )
    return _R12_UDFS["ipv6s2n"](c)


def _cut_ipv6(c: Column, bytes_v6, bytes_v4) -> Column:
    """``cutIPv6(bin16, bytesToCutForIPv6, bytesToCutForIPv4)``: zero
    the trailing N bytes (N chosen by whether the address is
    IPv4-mapped) and render. Matches the published docs example
    (cut 2 bytes of …cafe:f00d → …cafe:0)."""
    if not isinstance(bytes_v6, int) or not isinstance(bytes_v4, int):
        raise TypeError("cutIPv6 byte counts must be Python int literals")
    key = f"cutipv6:{bytes_v6}:{bytes_v4}"
    if key not in _R12_UDFS:

        def one(v, _b6=bytes_v6, _b4=bytes_v4):
            if v is None or len(v) != 16:
                return None
            b = bytes(v)
            mapped = b[:10] == b"\x00" * 10 and b[10:12] == b"\xff\xff"
            n = max(0, min(16, _b4 if mapped else _b6))
            return _render_ipv6_py(b[: 16 - n] + b"\x00" * n if n else b)

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(_f), "string"
        )
    return _R12_UDFS[key](c)


def _ipv6_cidr_to_range(c: Column, prefix) -> Column:
    """``IPv6CIDRToRange(bin16, prefix)`` → struct(lo, hi) of the
    prefix-masked block. Rendered as canonical text, the same
    documented deviation as IPv4CIDRToRange (CH returns IPv6 binary;
    text is the Spark-side IPv6 story)."""
    if not isinstance(prefix, int) or not (0 <= prefix <= 128):
        raise TypeError("IPv6CIDRToRange prefix must be an int in 0..128")
    key = f"ipv6cidr:{prefix}"
    if key not in _R12_UDFS:

        def one(v, _p=prefix):
            if v is None or len(v) != 16:
                return None
            x = int.from_bytes(bytes(v), "big")
            mask = ((1 << _p) - 1) << (128 - _p) if _p else 0
            lo = (x & mask).to_bytes(16, "big")
            hi = ((x & mask) | ((1 << (128 - _p)) - 1)).to_bytes(16, "big")
            return [_render_ipv6_py(lo), _render_ipv6_py(hi)]

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(_f), "array<string>"
        )
    arr = _R12_UDFS[key](c)
    return F.struct(
        F.element_at(arr, 1).alias("lo"), F.element_at(arr, 2).alias("hi")
    )


_JSON_MISSING = object()


def _json_nav(v: str, keys: tuple):
    """Navigate a parsed JSON doc by ClickHouse indices_or_keys: string
    keys index objects, ints index arrays 1-based (negative = from the
    end). Returns _JSON_MISSING when the path does not resolve."""
    import json as _json

    try:
        node = _json.loads(v)
    except (ValueError, TypeError):
        return _JSON_MISSING
    for k in keys:
        if isinstance(k, bool):
            return _JSON_MISSING
        if isinstance(k, int):
            if not isinstance(node, list):
                return _JSON_MISSING
            i = k - 1 if k > 0 else len(node) + k
            if not (0 <= i < len(node)):
                return _JSON_MISSING
            node = node[i]
        else:
            if not isinstance(node, dict) or k not in node:
                return _JSON_MISSING
            node = node[k]
    return node


def _json_dumps_compact(node) -> str:
    import json as _json

    return _json.dumps(node, separators=(",", ":"), ensure_ascii=False)


def _simple_json_raw_scan(v: str, name: str) -> str:
    """The simpleJSON* scan: find the FIRST occurrence of ``"name"``
    followed by ``:`` at ANY nesting depth (a raw text search, not a
    parse — CH's visitParam family, src/Functions/FunctionsVisitParam.h)
    and return the raw slice of the value, separators included.
    Not found → '' (the simpleJSON empty-result convention)."""
    needle = f'"{name}"'
    start = 0
    n = len(v)
    while True:
        i = v.find(needle, start)
        if i < 0:
            return ""
        j = i + len(needle)
        while j < n and v[j] in " \t\r\n":
            j += 1
        if j < n and v[j] == ":":
            j += 1
            break
        start = i + 1
    while j < n and v[j] in " \t\r\n":
        j += 1
    if j >= n:
        return ""
    ch0 = v[j]
    if ch0 in "{[":
        close = "}" if ch0 == "{" else "]"
        depth = 0
        k = j
        in_str = False
        while k < n:
            c = v[k]
            if in_str:
                if c == "\\":
                    k += 1
                elif c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c in "{[":
                depth += 1
            elif c in "]}":
                depth -= 1
                if depth == 0 and c == close:
                    return v[j : k + 1]
            k += 1
        return ""
    if ch0 == '"':
        k = j + 1
        while k < n:
            if v[k] == "\\":
                k += 2
                continue
            if v[k] == '"':
                return v[j : k + 1]
            k += 1
        return ""
    k = j
    while k < n and v[k] not in ",}] \t\r\n":
        k += 1
    return v[j:k]


def _simple_json_extract_raw(c: Column, name) -> Column:
    """``simpleJSONExtractRaw``: first-occurrence raw text scan for the
    single key at any depth (NOT the path-navigating JSONExtractRaw —
    it returns the verbatim slice of the original document and accepts
    exactly one key)."""
    if isinstance(name, Column):
        raise TypeError("simpleJSONExtractRaw key must be a literal")
    key = ("sjraw", str(name))
    if key not in _R12_UDFS:
        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _k=str(name): s.map(
                lambda v: None
                if v is None
                else _simple_json_raw_scan(v, _k)
            ),
            "string",
        )
    return _R12_UDFS[key](c)


def _json_extract_raw(c: Column, *keys) -> Column:
    """``JSONExtractRaw``: the extracted subtree re-serialized in
    compact form. NON_BIT_COMPATIBLE nuance: CH returns the raw slice
    of the original document, so the two differ only in preserved
    whitespace (identical on compact documents — DuckDB's json_extract
    normalizes the same way)."""
    key = ("jraw", keys)
    if key not in _R12_UDFS:

        def one(v, _k=keys):
            node = _json_nav(v, _k)
            return None if node is _JSON_MISSING else _json_dumps_compact(node)

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            "string",
        )
    return _R12_UDFS[key](c)


def _json_type(c: Column, *keys) -> Column:
    """``JSONType``: CH type-tag of the addressed node ('Object',
    'Array', 'String', 'Int64', 'UInt64', 'Double', 'Bool', 'Null');
    missing path → SQL NULL. Ints that fit Int64 tag as 'Int64' (the
    simdjson signed-first rule), [2^63, 2^64) as 'UInt64', and integer
    literals outside any 64-bit range as 'Double' (simdjson falls back
    to double parsing there)."""
    key = ("jtype", keys)
    if key not in _R12_UDFS:

        def one(v, _k=keys):
            node = _json_nav(v, _k)
            if node is _JSON_MISSING:
                return None
            if node is None:
                return "Null"
            if isinstance(node, bool):
                return "Bool"
            if isinstance(node, int):
                # simdjson's ranges: signed-first, UInt64 for
                # [2^63, 2^64), Double outside any 64-bit range
                if node >= 1 << 64 or node < -(1 << 63):
                    return "Double"
                return "UInt64" if node >= 1 << 63 else "Int64"
            if isinstance(node, float):
                return "Double"
            if isinstance(node, str):
                return "String"
            if isinstance(node, list):
                return "Array"
            return "Object"

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            "string",
        )
    return _R12_UDFS[key](c)


#: CH base type → Spark SQL type string (the typed-JSONExtract mapping;
#: UInt widths widen into the next signed Spark type, UInt64 keeps the
#: repo's two's-complement Int64 convention).
_CH_BASE_TO_SPARK: dict[str, str] = {
    "Int8": "tinyint", "Int16": "smallint", "Int32": "int",
    "Int64": "long", "UInt8": "smallint", "UInt16": "int",
    "UInt32": "long", "UInt64": "long", "Float32": "float",
    "Float64": "double", "String": "string", "Bool": "boolean",
    "Date": "date", "DateTime": "timestamp",
}


def _ch_type_to_spark(t: str) -> str:
    """Recursive CH type text → Spark type text (Array/Nullable/Map)."""
    t = t.strip()
    if t.startswith("Array(") and t.endswith(")"):
        return f"array<{_ch_type_to_spark(t[6:-1])}>"
    if t.startswith("Nullable(") and t.endswith(")"):
        return _ch_type_to_spark(t[9:-1])
    if t.startswith("Map(") and t.endswith(")"):
        depth, split = 0, -1
        inner = t[4:-1]
        for i, ch in enumerate(inner):
            depth += ch == "("
            depth -= ch == ")"
            if ch == "," and depth == 0:
                split = i
                break
        if split < 0:
            raise ValueError(f"malformed Map type: {t!r}")
        return (
            f"map<{_ch_type_to_spark(inner[:split])},"
            f"{_ch_type_to_spark(inner[split + 1:])}>"
        )
    try:
        return _CH_BASE_TO_SPARK[t]
    except KeyError:
        raise ValueError(
            f"JSONExtract: unsupported ClickHouse type {t!r}; supported "
            f"bases: {sorted(_CH_BASE_TO_SPARK)} plus "
            "Array()/Nullable()/Map()"
        ) from None


def _json_coerce(node, ch_t: str):
    """Best-effort typed coercion of a parsed JSON node to the CH type.
    Pinned deviation: a type-mismatched node yields NULL (ClickHouse
    JSONExtract substitutes the type's default value — 0 / '' — which
    silently fabricates data; NULL is the honest Spark-side signal)."""
    ch_t = ch_t.strip()
    if node is _JSON_MISSING or node is None:
        return None
    if ch_t.startswith("Nullable(") and ch_t.endswith(")"):
        return _json_coerce(node, ch_t[9:-1])
    if ch_t.startswith("Array(") and ch_t.endswith(")"):
        if not isinstance(node, list):
            return None
        return [_json_coerce(e, ch_t[6:-1]) for e in node]
    if ch_t.startswith("Map(") and ch_t.endswith(")"):
        if not isinstance(node, dict):
            return None
        inner = ch_t[4:-1]
        depth, split = 0, -1
        for i, ch in enumerate(inner):
            depth += ch == "("
            depth -= ch == ")"
            if ch == "," and depth == 0:
                split = i
                break
        if split < 0:
            return None
        vt = inner[split + 1:]
        return {str(k): _json_coerce(v, vt) for k, v in node.items()}
    base = ch_t
    if base.startswith("Int") or base.startswith("UInt"):
        if isinstance(node, bool):
            return int(node)
        if isinstance(node, int):
            return node
        if isinstance(node, float) and float(node).is_integer():
            return int(node)
        return None
    if base.startswith("Float"):
        if isinstance(node, bool):
            return None
        return float(node) if isinstance(node, (int, float)) else None
    if base == "String":
        return node if isinstance(node, str) else None
    if base == "Bool":
        return node if isinstance(node, bool) else None
    if base in ("Date", "DateTime"):
        if not isinstance(node, str):
            return None
        import datetime as _dt

        try:
            if base == "Date":
                return _dt.date.fromisoformat(node)
            return _dt.datetime.fromisoformat(node)
        except ValueError:
            return None
    return None


def _json_extract_typed(c: Column, *args) -> Column:
    """Typed generic ``JSONExtract(json, …keys…, 'Type')`` (r11 verdict
    #4): the trailing CH type literal routes through
    ``_ch_type_to_spark`` and the node is coerced in one Arrow kernel.
    Supports the base scalar set plus Array()/Nullable()/Map()."""
    if not args or not isinstance(args[-1], str):
        raise TypeError(
            "JSONExtract needs a trailing ClickHouse type literal, e.g. "
            "JSONExtract(j, 'a', 'Int64')"
        )
    *keys, ch_t = args
    spark_t = _ch_type_to_spark(ch_t)
    key = ("jtyped", tuple(keys), ch_t)
    if key not in _R12_UDFS:

        def one(v, _k=tuple(keys), _t=ch_t):
            return _json_coerce(_json_nav(v, _k), _t)

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            spark_t,
        )
    return _R12_UDFS[key](c)


def _json_extract_kv(c: Column, *args) -> Column:
    """``JSONExtractKeysAndValues(json, …keys…, 'T')`` → array of
    (key, T-typed value) structs over the addressed object."""
    if not args or not isinstance(args[-1], str):
        raise TypeError(
            "JSONExtractKeysAndValues needs a trailing type literal"
        )
    *keys, ch_t = args
    spark_t = _ch_type_to_spark(ch_t)
    key = ("jkv", tuple(keys), ch_t)
    if key not in _R12_UDFS:

        def one(v, _k=tuple(keys), _t=ch_t):
            node = _json_nav(v, _k)
            if node is _JSON_MISSING or not isinstance(node, dict):
                return None
            return [
                {"key": str(k), "value": _json_coerce(val, _t)}
                for k, val in node.items()
            ]

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            f"array<struct<key:string,value:{spark_t}>>",
        )
    return _R12_UDFS[key](c)


def _json_extract_kv_raw(c: Column, *keys) -> Column:
    """``JSONExtractKeysAndValuesRaw``: values as compact raw JSON."""
    key = ("jkvraw", keys)
    if key not in _R12_UDFS:

        def one(v, _k=keys):
            node = _json_nav(v, _k)
            if node is _JSON_MISSING or not isinstance(node, dict):
                return None
            return [
                {"key": str(k), "value": _json_dumps_compact(val)}
                for k, val in node.items()
            ]

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            "array<struct<key:string,value:string>>",
        )
    return _R12_UDFS[key](c)


def _json_extract_array_raw(c: Column, *keys) -> Column:
    """``JSONExtractArrayRaw``: the addressed array's elements, each as
    compact raw JSON text."""
    key = ("jarrraw", keys)
    if key not in _R12_UDFS:

        def one(v, _k=keys):
            node = _json_nav(v, _k)
            if node is _JSON_MISSING or not isinstance(node, list):
                return None
            return [_json_dumps_compact(e) for e in node]

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            "array<string>",
        )
    return _R12_UDFS[key](c)


def _bit_slice(c: Column, off, ln=None) -> Column:
    """``bitSlice(s, offset[, length])``: 1-based bit offset (negative =
    from the end), optional length (negative = leave that many bits off
    the end); the slice is left-aligned and zero-padded into whole
    bytes. Returned as BINARY — a bit slice is arbitrary bytes, which
    Spark strings (UTF-8) cannot carry; CH strings are byte strings.
    Matches the docs examples (bitSlice('Hello',1,8)='H')."""
    if not isinstance(off, int) or (ln is not None and not isinstance(ln, int)):
        raise TypeError("bitSlice offset/length must be Python int literals")
    key = f"bitslice:{off}:{ln}"
    if key not in _R12_UDFS:

        def one(v, _o=off, _l=ln):
            if isinstance(v, str):
                v = v.encode("utf-8")
            nbits = len(v) * 8
            start = _o - 1 if _o > 0 else (nbits + _o if _o < 0 else 0)
            start = max(0, start)
            if start >= nbits:
                return b""
            if _l is None:
                end = nbits
            elif _l >= 0:
                end = min(start + _l, nbits)
            else:
                end = max(nbits + _l, start)
            take = end - start
            if take <= 0:
                return b""
            x = int.from_bytes(v, "big")
            x >>= nbits - end
            x &= (1 << take) - 1
            x <<= (-take) % 8
            return x.to_bytes((take + 7) // 8, "big")

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            "binary",
        )
    return _R12_UDFS[key](c)


#: Spark typeof() name → ClickHouse in-memory byte width for the
#: fixed-width scalar set (CH Date = 2 bytes, DateTime = 4).
_BYTE_SIZE_FIXED: dict[str, int] = {
    "tinyint": 1, "smallint": 2, "int": 4, "bigint": 8,
    "float": 4, "double": 8, "boolean": 1, "date": 2, "timestamp": 4,
}


def _byte_size_one(c: Column) -> Column:
    """One argument of ``byteSize``: fixed widths per the CH docs table,
    String = octet length + 9 (8-byte size prefix + terminator). typeof()
    folds to a constant per column, so the CASE costs nothing at run
    time. Supported over the scalar/string set; other types (arrays,
    maps, structs) fall through the CASE to NULL — the documented
    subset in ch_catalog FAMILIES."""
    t = F.call_function("typeof", c)
    expr = F.when(
        t == F.lit("string"), F.octet_length(c.cast("string")) + F.lit(9)
    )
    for name, sz in _BYTE_SIZE_FIXED.items():
        expr = expr.when(t == F.lit(name), F.lit(sz))
    return expr.cast("long")


def _byte_size(*cols) -> Column:
    if not cols:
        raise TypeError("byteSize needs at least one argument")
    out = _byte_size_one(cols[0])
    for c in cols[1:]:
        out = out + _byte_size_one(c)
    return out


def _convert_charset(c: Column, frm, to) -> Column:
    """``convertCharset(s, from, to)`` over the JVM-portable charset
    set (US-ASCII, ISO-8859-1, UTF-8, UTF-16/BE/LE — the charsets
    Spark's encode/decode accept; CH links ICU with hundreds more,
    documented subset). Input: BINARY bytes in ``from`` (a string
    input contributes its UTF-8 bytes, so from='UTF-8' composes
    naturally). Output: a Spark string for to=UTF-8, else BINARY in
    the target charset (Spark strings can only carry UTF-8)."""
    if not isinstance(frm, str) or not isinstance(to, str):
        raise TypeError("convertCharset charsets must be string literals")
    decoded = F.decode(c.cast("binary"), frm)
    if to.upper().replace("-", "") == "UTF8":
        return decoded
    return F.encode(decoded, to)


def _xxhash32(c: Column, seed: int = 0) -> Column:
    """Bit-exact xxHash32 (seed 0 = the ClickHouse call shape) as an
    Arrow kernel — Spark ships only the 64-bit family member, and its
    xxhash64 runs seed 42, so this is the one xxHash CH users can
    migrate stored values through unchanged. Verified against the
    published reference vectors (xxh32('')=0x02CC5D05, 'a'=0x550D7456,
    'abc'=0x32D153FF). Returns the UInt32 as a non-negative long."""
    if not isinstance(seed, int):
        raise TypeError("xxHash32 seed must be a Python int literal")
    key = f"xxh32:{seed}"
    if key not in _R12_UDFS:
        P1, P2, P3 = 2654435761, 2246822519, 3266489917
        P4, P5 = 668265263, 374761393
        M = 0xFFFFFFFF

        def one(v, _s=seed):
            data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            n = len(data)
            i = 0
            if n >= 16:
                vs = [
                    (_s + P1 + P2) & M, (_s + P2) & M, _s & M, (_s - P1) & M,
                ]
                while i <= n - 16:
                    for k in range(4):
                        x = vs[k] + int.from_bytes(
                            data[i + 4 * k : i + 4 * k + 4], "little"
                        ) * P2
                        x &= M
                        x = ((x << 13) | (x >> 19)) & M
                        vs[k] = (x * P1) & M
                    i += 16
                h = 0
                for k, r in zip(range(4), (1, 7, 12, 18)):
                    h += ((vs[k] << r) | (vs[k] >> (32 - r))) & M
                h &= M
            else:
                h = (_s + P5) & M
            h = (h + n) & M
            while i <= n - 4:
                h = (h + int.from_bytes(data[i : i + 4], "little") * P3) & M
                h = ((((h << 17) | (h >> 15)) & M) * P4) & M
                i += 4
            while i < n:
                h = (h + data[i] * P5) & M
                h = ((((h << 11) | (h >> 21)) & M) * P1) & M
                i += 1
            h ^= h >> 15
            h = (h * P2) & M
            h ^= h >> 13
            h = (h * P3) & M
            h ^= h >> 16
            return h

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            "long",
        )
    return _R12_UDFS[key](c)


def _now64(precision=3) -> Column:
    """``now64(p)``: the current timestamp floored to 10^-p seconds.
    Spark timestamps carry microseconds, so p ≤ 6 is exact and p > 6
    saturates at micros (CH DateTime64 goes to 9; documented cap)."""
    p = min(int(precision), 6)
    q = 10 ** (6 - p)
    um = F.unix_micros(F.current_timestamp())
    # exact integer floor (pmod floors for negatives too; float
    # division would truncate toward zero pre-1970)
    return F.timestamp_micros(um - F.pmod(um, F.lit(q)))


def _parse_datetime64_best_effort(c: Column, precision=3) -> Column:
    """``parseDateTime64BestEffort``: the best-effort parse chain with
    fractional seconds kept, floored to the requested precision (micros
    cap, as _now64)."""
    p = min(int(precision), 6)
    q = 10 ** (6 - p)
    ts = F.coalesce(
        F.try_to_timestamp(c),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss.SSS")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy HH:mm:ss")),
    )
    um = F.unix_micros(ts)
    return F.timestamp_micros(um - F.pmod(um, F.lit(q)))


CH_FUNCTIONS.update(
    {
        # session introspection — Spark's own catalog/user builtins
        "currentDatabase": F.current_database,
        "currentUser": F.current_user,
        # r12 band 2
        "xxHash32": _xxhash32,
        "toIPv6": lambda c: _ipv6_string_to_num(c),
        "now64": _now64,
        "parseDateTime64BestEffort": _parse_datetime64_best_effort,
        "CRC32IEEE": _crc32_ieee,
        "CRC64": _crc64,
        "IPv6NumToString": _ipv6_num_to_string,
        "IPv6StringToNum": _ipv6_string_to_num,
        "cutIPv6": _cut_ipv6,
        "IPv6CIDRToRange": _ipv6_cidr_to_range,
        "JSONExtract": _json_extract_typed,
        "JSONExtractRaw": _json_extract_raw,
        "simpleJSONExtractRaw": _simple_json_extract_raw,
        "JSONType": _json_type,
        "JSONExtractKeysAndValues": _json_extract_kv,
        "JSONExtractKeysAndValuesRaw": _json_extract_kv_raw,
        "JSONExtractArrayRaw": _json_extract_array_raw,
        "bitSlice": _bit_slice,
        "byteSize": _byte_size,
        "convertCharset": _convert_charset,
    }
)


# ---------------------------------------------------------------------------
# r13 band: the final mechanically-promotable names — bit-level hash
# kernels (functions/hash_kernels.py; validation tiers in that module's
# docstring), no-ops, WGS-84 distance, compensated summation, timezone
# introspection, toTypeName, and the random generators.
# ---------------------------------------------------------------------------

def _kernel_hash(name: str, fn, out: str = "long", signed64: bool = False):
    """Column builder over a bytes-level kernel from hash_kernels.py.
    String input contributes its UTF-8 bytes (the CH String hash
    contract); UInt64 outputs render as two's-complement BIGINT when
    ``signed64`` (the established CRC64 convention)."""

    def build(c: Column) -> Column:
        key = ("khash", name)
        if key not in _R12_UDFS:

            def one(v, _f=fn, _s=signed64):
                h = _f(v.encode("utf-8") if isinstance(v, str) else bytes(v))
                if _s and h >= 1 << 63:
                    h -= 1 << 64
                return h

            _R12_UDFS[key] = F.pandas_udf(
                lambda s, _g=one: s.map(
                    lambda v: None if v is None else _g(v)
                ),
                out,
            )
        return _R12_UDFS[key](c)

    return build


def _murmur3_128_bytes(v: bytes) -> bytes:
    from .hash_kernels import murmur3_x64_128

    h1, h2 = murmur3_x64_128(v)
    return h1.to_bytes(8, "little") + h2.to_bytes(8, "little")


def _geo_distance(lon1, lat1, lon2, lat2) -> Column:
    """``geoDistance``: surface distance on the WGS-84 ellipsoid in
    meters via the Andoyer-Lambert first-order flattening correction —
    all JVM-side built-ins (no UDF), so it codegens and scales.
    NON_BIT_COMPATIBLE: CH evaluates a float32 piecewise-polynomial
    approximation of the same quantity; both are documented
    approximations of the WGS-84 geodesic (sub-0.5% apart)."""
    a_m = F.lit(6378137.0)  # WGS-84 semi-major axis
    flat = F.lit(1.0 / 298.257223563)
    p1, p2 = F.radians(lat1), F.radians(lat2)
    fm = (p1 + p2) / 2
    gm = (p1 - p2) / 2
    lm = (F.radians(lon1) - F.radians(lon2)) / 2
    s = F.pow(F.sin(gm), 2) * F.pow(F.cos(lm), 2) + F.pow(
        F.cos(fm), 2
    ) * F.pow(F.sin(lm), 2)
    c = F.pow(F.cos(gm), 2) * F.pow(F.cos(lm), 2) + F.pow(
        F.sin(fm), 2
    ) * F.pow(F.sin(lm), 2)
    # try_divide: coincident points give S = W = 0 (ANSI-safe 0/0 →
    # NULL), antipodal quarter-cases give C = 0; both coalesce to the
    # uncorrected great-circle term below
    w = F.atan(F.sqrt(F.try_divide(s, c)))
    d = 2 * w * a_m
    r = F.try_divide(F.sqrt(s * c), w)
    h1 = F.try_divide(3 * r - 1, 2 * c)
    h2 = F.try_divide(3 * r + 1, 2 * s)
    corr = d * (
        1
        + flat * h1 * F.pow(F.sin(fm), 2) * F.pow(F.cos(gm), 2)
        - flat * h2 * F.pow(F.cos(fm), 2) * F.pow(F.sin(gm), 2)
    )
    return F.coalesce(
        F.when(F.isnan(corr), F.lit(0.0)).otherwise(corr), d, F.lit(0.0)
    )


def _sum_kahan(c: Column) -> Column:
    """``sumKahan``: error-compensated float summation. Implemented as
    exact Shewchuk summation (math.fsum — strictly tighter than Kahan)
    in an Arrow grouped-agg UDF. Scale note: grouped-agg UDFs skip
    map-side partial aggregation (every value shuffles to its group),
    so at 100 TB prefer plain sum() unless the compensation is the
    point."""
    key = "sumkahan"
    if key not in _R12_UDFS:
        import math

        from pyspark.sql.functions import PandasUDFType

        def fsum_agg(v):
            return math.fsum(v.dropna())

        _R12_UDFS[key] = F.pandas_udf(
            fsum_agg, "double", PandasUDFType.GROUPED_AGG
        )
    return _R12_UDFS[key](c.cast("double"))


def _sum_with_overflow(c: Column) -> Column:
    """``sumWithOverflow``: sum with Int64 wraparound (CH keeps the
    input width and lets it wrap). Exact total in decimal(38,0), then
    one mod-2^64 wrap back into signed range — wrap(sum) == sum of
    per-add wraps."""
    # 2^63 exceeds the Java long literal range — go through string casts
    two63 = F.expr(f"CAST('{1 << 63}' AS DECIMAL(38,0))")
    two64 = F.expr(f"CAST('{1 << 64}' AS DECIMAL(38,0))")
    s = F.sum(c.cast("decimal(38,0)"))
    return (F.pmod(s + two63, two64) - two63).cast("long")


def _spark_type_to_ch(t: str) -> str:
    """Inverse of ``_ch_type_to_spark``: Spark typeof() text → CH type
    name (the documented scalar/array/map subset; unknown types pass
    through verbatim)."""
    t = t.strip()
    prim = {
        "tinyint": "Int8", "smallint": "Int16", "int": "Int32",
        "bigint": "Int64", "float": "Float32", "double": "Float64",
        "string": "String", "boolean": "Bool", "date": "Date32",
        "timestamp": "DateTime64(6)", "timestamp_ntz": "DateTime64(6)",
        "binary": "String", "void": "Nothing",
    }
    if t in prim:
        return prim[t]
    if t.startswith("decimal(") and t.endswith(")"):
        return "Decimal(" + t[8:-1] + ")"
    if t.startswith("array<") and t.endswith(">"):
        return f"Array({_spark_type_to_ch(t[6:-1])})"
    if t.startswith("map<") and t.endswith(">"):
        inner = t[4:-1]
        depth = 0
        for i, ch in enumerate(inner):
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                return (
                    f"Map({_spark_type_to_ch(inner[:i])}, "
                    f"{_spark_type_to_ch(inner[i + 1:])})"
                )
    return t


def _to_type_name(c: Column) -> Column:
    """``toTypeName``: CH type name of the expression, derived from
    Spark's typeof() (constant-folds per column) through the inverse of
    the r12 CH-type→Spark-schema map."""
    key = "totypename"
    if key not in _R12_UDFS:
        _R12_UDFS[key] = F.pandas_udf(
            lambda s: s.map(
                lambda v: None if v is None else _spark_type_to_ch(v)
            ),
            "string",
        )
    return _R12_UDFS[key](F.call_function("typeof", c))


def _register_r13_band() -> None:
    from . import hash_kernels as hk

    CH_FUNCTIONS.update(
        {
            # no-ops: CH uses these to steer its optimizer/analyzer;
            # the value contract is the identity (or constant 0)
            "identity": lambda c: c,
            "materialize": lambda c: c,
            "ignore": lambda *cs: F.lit(0),
            "concatAssumeInjective": lambda *cs: F.concat(*cs),
            # bit-level hash kernels — validation tier per kernel in
            # hash_kernels.py's module docstring
            "murmurHash2_32": _kernel_hash("mm2_32", hk.murmur2_32),
            "murmurHash2_64": _kernel_hash(
                "mm2_64", hk.murmur2_64a, signed64=True
            ),
            # gcc libstdc++ _Hash_bytes == MurmurHash64A @ seed
            # 0xc70f6907 (hash_bytes.cc); same kernel, gcc's seed
            "gccMurmurHash": _kernel_hash(
                "gccmm",
                lambda b: hk.murmur2_64a(b, 0xC70F6907),
                signed64=True,
            ),
            # h1 ^ h2 of the x64_128 kernel — FunctionsHashing.h
            # MurmurHash3Impl64's fold
            "murmurHash3_64": _kernel_hash(
                "mm3_64",
                lambda b, _m=hk.murmur3_x64_128: (
                    lambda t: t[0] ^ t[1]
                )(_m(b)),
                signed64=True,
            ),
            "murmurHash3_128": _kernel_hash(
                "mm3_128", _murmur3_128_bytes, out="binary"
            ),
            "metroHash64": _kernel_hash(
                "metro", hk.metro_hash64, signed64=True
            ),
            "farmFingerprint64": _kernel_hash(
                "farmfp", hk.farm_fingerprint64, signed64=True
            ),
            "wyHash64": _kernel_hash(
                "wyh", hk.wy_hash64, signed64=True
            ),
            "xxh3": _kernel_hash("xxh3", hk.xxh3_64, signed64=True),
            # upgrade: sipHash64 was NBC-mapped to xxhash64 through
            # r12; now the true SipHash-2-4(k=0,0) kernel,
            # Guava-validated bit-exact
            "sipHash64": _kernel_hash(
                "sip64", hk.sip_hash_2_4, signed64=True
            ),
            "geoDistance": _geo_distance,
            "sumKahan": _sum_kahan,
            "sumWithOverflow": _sum_with_overflow,
            # timezone introspection — sessions pin a zone, so these
            # fold to constants per plan
            "timeZoneOf": lambda c: F.current_timezone(),
            "timeZoneOffset": lambda c: (
                F.unix_seconds(
                    F.from_utc_timestamp(c, F.current_timezone())
                )
                - F.unix_seconds(c)
            ),
            "toTypeName": _to_type_name,
            # random generators (nondeterministic — contract-tested)
            "rand": lambda: F.floor(F.rand() * F.lit(1 << 32)).cast(
                "long"
            ),
            "rand32": lambda: F.floor(F.rand() * F.lit(1 << 32)).cast(
                "long"
            ),
            # full-entropy 64-bit: xxhash64 over a fresh v4 UUID
            # (two's-complement rendering of CH's UInt64 contract)
            "rand64": lambda: F.xxhash64(F.uuid()),
            "randCanonical": lambda: F.rand(),
            "generateUUIDv4": lambda: F.uuid(),
        }
    )


_register_r13_band()


# ---------------------------------------------------------------------------
# r13 band 2: Joda-syntax datetime trio, the AES encrypt/decrypt family
# (Spark's JVM-side aes_encrypt/aes_decrypt — FIPS-197/SP 800-38A
# validated in tests), random distributions, MD4, formatRow, and the
# block/server introspection set.
# ---------------------------------------------------------------------------

#: process-stable identifiers for the introspection set
_R13B_START_TS = __import__("time").time()
_R13B_SERVER_UUID = str(__import__("uuid").uuid4())


def _cipher_mode(mode) -> tuple[int, str]:
    """'aes-128-ecb' → (16, 'ECB'). Literal-only (plan-time dispatch);
    supported block modes are the Spark-native ECB/CBC/GCM subset of
    CH's list (documented in ch_catalog FAMILIES)."""
    if isinstance(mode, Column):
        raise TypeError("cipher mode must be a string literal")
    parts = str(mode).lower().split("-")
    if (
        len(parts) != 3
        or parts[0] != "aes"
        or parts[1] not in ("128", "192", "256")
        or parts[2] not in ("ecb", "cbc", "gcm")
    ):
        raise ValueError(f"unsupported cipher mode {mode!r}")
    return int(parts[1]) // 8, parts[2].upper()


def _encrypt(mode, plain, key, iv=None, aad=None) -> Column:
    """``encrypt(mode, plaintext, key[, iv[, aad]])``: CH output layout
    — ECB/CBC emit ciphertext only (PKCS#7 padded), GCM emits
    ciphertext || 16-byte tag. Spark prefixes the IV on CBC/GCM
    output, so the prefix is stripped to match; CBC/GCM therefore
    REQUIRE the explicit-iv call shape (CH's recommended one)."""
    _klen, smode = _cipher_mode(mode)
    plain_b = plain.cast("binary") if isinstance(plain, Column) else F.lit(plain)
    key_b = key.cast("binary") if isinstance(key, Column) else F.lit(key)
    if smode == "ECB":
        return F.aes_encrypt(plain_b, key_b, F.lit(smode))
    if iv is None:
        raise TypeError(f"{smode} needs an explicit iv (the CH call shape)")
    iv_b = iv.cast("binary") if isinstance(iv, Column) else F.lit(iv)
    aad_b = (
        (aad.cast("binary") if isinstance(aad, Column) else F.lit(aad))
        if aad is not None
        else F.lit(b"")
    )
    out = F.aes_encrypt(
        plain_b, key_b, F.lit(smode), F.lit("DEFAULT"), iv_b, aad_b
    )
    # Spark prefixes the IV (16 bytes CBC, 12 GCM); CH does not.
    skip = 12 if smode == "GCM" else 16
    return F.substring(out, skip + 1, 2147483647)


def _decrypt(mode, ct, key, iv=None, aad=None, try_: bool = False) -> Column:
    """``decrypt``/``tryDecrypt``: rebuild Spark's iv-prefixed layout
    from the CH one (prepend the explicit iv), then aes_decrypt /
    try_aes_decrypt. Returns BINARY (CH returns String; Spark strings
    must be valid UTF-8, so the caller casts when the plaintext is
    text)."""
    _klen, smode = _cipher_mode(mode)
    ct_b = ct.cast("binary") if isinstance(ct, Column) else F.lit(ct)
    key_b = key.cast("binary") if isinstance(key, Column) else F.lit(key)
    fn = F.try_aes_decrypt if try_ else F.aes_decrypt
    if smode == "ECB":
        return fn(ct_b, key_b, F.lit(smode))
    if iv is None:
        raise TypeError(f"{smode} needs an explicit iv (the CH call shape)")
    iv_b = iv.cast("binary") if isinstance(iv, Column) else F.lit(iv)
    aad_b = (
        (aad.cast("binary") if isinstance(aad, Column) else F.lit(aad))
        if aad is not None
        else F.lit(b"")
    )
    # aes_decrypt reads the IV from the input prefix (no iv arg):
    # signature (input, key, mode, padding, aad)
    return fn(
        F.concat(iv_b, ct_b), key_b, F.lit(smode), F.lit("DEFAULT"), aad_b
    )


def _mysql_fold_key(key, klen: int) -> bytes:
    """MySQL AES key folding: XOR the key bytes cyclically into a
    klen-byte buffer (so over-long keys wrap around). Literal-only —
    the fold happens at plan time."""
    if isinstance(key, Column):
        raise TypeError("aes_*_mysql key must be a literal")
    kb = key.encode("utf-8") if isinstance(key, str) else bytes(key)
    buf = bytearray(klen)
    for i, byte in enumerate(kb):
        buf[i % klen] ^= byte
    return bytes(buf)


def _aes_encrypt_mysql(mode, plain, key, iv=None) -> Column:
    """``aes_encrypt_mysql``: MySQL-compatible AES — over-long keys
    fold (XOR-wrap), over-long IVs truncate to the block size."""
    klen, smode = _cipher_mode(mode)
    folded = _mysql_fold_key(key, klen)
    if iv is not None and not isinstance(iv, Column):
        ivb = iv.encode("utf-8") if isinstance(iv, str) else bytes(iv)
        iv = ivb[:16]
    return _encrypt(mode, plain, F.lit(folded), iv)


def _aes_decrypt_mysql(mode, ct, key, iv=None) -> Column:
    klen, smode = _cipher_mode(mode)
    folded = _mysql_fold_key(key, klen)
    if iv is not None and not isinstance(iv, Column):
        ivb = iv.encode("utf-8") if isinstance(iv, str) else bytes(iv)
        iv = ivb[:16]
    return _decrypt(mode, ct, F.lit(folded), iv)


def _pdudf(key: str, fn, out: str, nondeterministic: bool = False):
    """Cache an elementwise pandas UDF under ``key``.

    ``nondeterministic`` flags the random family (randBinomial,
    randomString, fuzzBits, …) the way Spark flags rand()/uuid():
    without it Catalyst treats the UDF as deterministic and may
    common-subexpression-eliminate two calls into one draw, or
    re-execute with different results on retry/recompute."""
    if key not in _R12_UDFS:
        udf = F.pandas_udf(fn, out)
        if nondeterministic:
            udf = udf.asNondeterministic()
        _R12_UDFS[key] = udf
    return _R12_UDFS[key]


def _rand_binomial(n, p) -> Column:
    """``randBinomial(n, p)``: numpy binomial per Arrow batch (the
    JVM surface has no binomial sampler; vectorized, not per-row)."""
    if isinstance(n, Column) or isinstance(p, Column):
        raise TypeError("randBinomial args must be literals")
    n_i, p_f = int(n), float(p)

    def gen(s):
        import numpy as np
        import pandas as _pd

        return _pd.Series(
            np.random.binomial(n_i, p_f, len(s)).astype("int64")
        )

    return _pdudf(f"randbin:{n_i}:{p_f}", gen, "long", nondeterministic=True)(F.lit(0))


def _random_string(length) -> Column:
    """``randomString(n)``: n random bytes (any value) per row."""
    if isinstance(length, Column):
        raise TypeError("randomString length must be a literal")
    ln = int(length)

    def gen(s):
        import numpy as np
        import pandas as _pd

        return _pd.Series(
            [np.random.bytes(ln) for _ in range(len(s))]
        )

    return _pdudf(f"randstr:{ln}", gen, "binary", nondeterministic=True)(F.lit(0))


def _random_printable_ascii(length) -> Column:
    """``randomPrintableASCII(n)``: n chars uniform in [32, 126]."""
    if isinstance(length, Column):
        raise TypeError("randomPrintableASCII length must be a literal")
    ln = int(length)

    def gen(s):
        import numpy as np
        import pandas as _pd

        codes = np.random.randint(32, 127, size=(len(s), ln))
        return _pd.Series(
            ["".join(map(chr, row)) for row in codes]
        )

    return _pdudf(f"randasc:{ln}", gen, "string", nondeterministic=True)(F.lit(0))


def _fuzz_bits(c: Column, prob) -> Column:
    """``fuzzBits(s, p)``: flip each BIT of the input independently
    with probability p (CH's fuzzing helper). Output is BINARY of the
    same length."""
    if isinstance(prob, Column):
        raise TypeError("fuzzBits probability must be a literal")
    p_f = float(prob)

    def gen(s, _p=p_f):
        import numpy as np
        import pandas as _pd

        def one(v):
            if v is None:
                return None
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            if not b:
                return b""
            bits = np.unpackbits(np.frombuffer(b, dtype=np.uint8))
            flip = np.random.random(bits.shape) < _p
            return np.packbits(bits ^ flip).tobytes()

        return s.map(one)

    return _pdudf(f"fuzz:{p_f}", gen, "binary", nondeterministic=True)(c)


def _format_row_cols(cols, fmt: str) -> Column:
    """Shared CSV/TSV single-row rendering: CH CSV quotes String
    fields (doubling embedded quotes) and renders NULL as \\N; TSV is
    unquoted with backslash escapes. typeof() folds per column, so
    the string-vs-number dispatch costs nothing at run time."""
    rendered = []
    for c in cols:
        t = F.call_function("typeof", c)
        s = c.cast("string")
        if fmt == "CSV":
            quoted = F.concat(
                F.lit('"'),
                F.regexp_replace(s, '"', '""'),
                F.lit('"'),
            )
            cell = F.when(t == F.lit("string"), quoted).otherwise(s)
        else:  # TSV
            esc = F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(s, r"\\", r"\\\\"),
                    "\t", r"\\t",
                ),
                "\n", r"\\n",
            )
            cell = F.when(t == F.lit("string"), esc).otherwise(s)
        rendered.append(F.coalesce(cell, F.lit(r"\N")))
    sep = "," if fmt == "CSV" else "\t"
    out = F.concat_ws(sep, *rendered)
    return out


def _format_row(fmt, *cols) -> Column:
    if isinstance(fmt, Column):
        raise TypeError("formatRow format must be a literal")
    f = str(fmt).upper()
    if f not in ("CSV", "TSV"):
        raise ValueError(
            "formatRow supports the CSV/TSV subset (named formats "
            "needing column metadata — JSONEachRow etc — are not "
            "derivable from bare Columns)"
        )
    return F.concat(_format_row_cols(cols, f), F.lit("\n"))


def _format_row_no_newline(fmt, *cols) -> Column:
    if isinstance(fmt, Column):
        raise TypeError("formatRowNoNewline format must be a literal")
    f = str(fmt).upper()
    if f not in ("CSV", "TSV"):
        raise ValueError("formatRowNoNewline supports the CSV/TSV subset")
    return _format_row_cols(cols, f)


def _block_size() -> Column:
    """``blockSize``: rows in the current block — the Arrow batch is
    the Spark analogue of the CH block."""

    def gen(s):
        import pandas as _pd

        return _pd.Series([len(s)] * len(s), dtype="int64")

    return _pdudf("blocksize", gen, "long")(F.lit(0))


def _row_number_in_block() -> Column:
    """``rowNumberInBlock``: 0-based row index within the current
    Arrow batch (CH: within the current block)."""

    def gen(s):
        import pandas as _pd

        return _pd.Series(range(len(s)), dtype="int64")

    return _pdudf("rownuminblock", gen, "long")(F.lit(0))


def _tid() -> Column:
    """``tid``: OS thread id of the executing worker (CH: the thread
    executing the query; here the Python worker thread)."""

    def gen(s):
        import threading

        import pandas as _pd

        t = threading.get_native_id()
        return _pd.Series([t] * len(s), dtype="int64")

    return _pdudf("tid", gen, "long")(F.lit(0))


def _hostname_udf(key: str, fqdn: bool) -> Column:
    def gen(s, _f=fqdn):
        import socket

        import pandas as _pd

        h = socket.getfqdn() if _f else socket.gethostname()
        return _pd.Series([h] * len(s))

    return _pdudf(key, gen, "string")(F.lit(0))


def _detect_charset(c: Column) -> Column:
    """``detectCharset``: CH routes through configured ICU dictionaries;
    this maps the same contract onto the decisive heuristic available
    without models — bytes that decode as UTF-8 → 'UTF-8', else
    'WINDOWS-1252' (the ISO-8859-1 superset every byte decodes in).
    NON_BIT_COMPATIBLE."""

    def gen(s):
        def one(v):
            if v is None:
                return None
            b = v if isinstance(v, (bytes, bytearray)) else str(v).encode(
                "utf-8", "surrogateescape"
            )
            try:
                b.decode("utf-8")
                return "UTF-8"
            except UnicodeDecodeError:
                return "WINDOWS-1252"

        return s.map(one)

    return _pdudf("detectcharset", gen, "string")(c)


def _detect_language(c: Column) -> Column:
    """``detectLanguage``: CH routes through configured FastText-like
    models; this maps the same contract onto the repo's stopword-voting
    heuristic (operators/text.py predict_lang — the lang_id query's
    kernel). Unrecognized text returns 'und' where CH also degrades.
    NON_BIT_COMPATIBLE."""
    from ..operators.text import predict_lang, tokenize

    return predict_lang(tokenize(F.lower(c)))


def _register_r13_band2() -> None:
    from . import hash_kernels as hk

    CH_FUNCTIONS.update(
        {
            # Joda-syntax datetime trio: Spark's native pattern language
            # IS the JDK DateTimeFormatter (Joda-compatible) dialect, so
            # these are direct built-in mappings (the MySQL-% variants
            # already translate patterns)
            "formatDateTimeInJodaSyntax": lambda ts, fmt: F.date_format(
                ts, fmt
            ),
            "fromUnixTimestampInJodaSyntax": lambda x, fmt: F.date_format(
                F.timestamp_seconds(x), fmt
            ),
            "parseDateTimeInJodaSyntax": lambda s, fmt: F.to_timestamp(
                s, fmt
            ),
            # AES family over Spark's JVM-side cipher (ECB/CBC/GCM,
            # PKCS#7) — FIPS-197 / SP 800-38A vectors in tests
            "encrypt": _encrypt,
            "decrypt": _decrypt,
            "tryDecrypt": lambda mode, ct, key, iv=None, aad=None: _decrypt(
                mode, ct, key, iv, aad, try_=True
            ),
            "aes_encrypt_mysql": _aes_encrypt_mysql,
            "aes_decrypt_mysql": _aes_decrypt_mysql,
            # random distributions (JVM randn/rand where the math is
            # closed-form; numpy Arrow batches for binomial)
            "randNormal": lambda mean, sd: F.lit(float(mean))
            + F.randn() * F.lit(float(sd)),
            "randUniform": lambda a, b: F.lit(float(a))
            + F.rand() * F.lit(float(b) - float(a)),
            "randLogNormal": lambda mean, sd: F.exp(
                F.lit(float(mean)) + F.randn() * F.lit(float(sd))
            ),
            "randBinomial": _rand_binomial,
            "randomString": _random_string,
            "randomPrintableASCII": _random_printable_ascii,
            "fuzzBits": _fuzz_bits,
            # MD4 (RFC 1320 kernel, hash_kernels.py — OpenSSL 3
            # dropped it from hashlib)
            "MD4": _kernel_hash("md4", hk.md4, out="binary"),
            # one-row format rendering (CSV/TSV subset)
            "formatRow": _format_row,
            "formatRowNoNewline": _format_row_no_newline,
            # server/block introspection — the documented Spark
            # analogues: executor host, Spark engine version, session
            # process uptime/uuid, partition≈block
            "hostName": lambda: _hostname_udf("hostname", False),
            "FQDN": lambda: _hostname_udf("fqdn", True),
            "version": lambda: F.call_function("version"),
            "uptime": lambda: (
                F.unix_seconds(F.current_timestamp())
                - F.lit(int(_R13B_START_TS))
            ),
            "serverUUID": lambda: F.lit(_R13B_SERVER_UUID),
            # per-plan-build UUID: constant across the query's rows
            # (CH scopes it to the query execution; each builder call
            # mints its own, so two calls in one plan differ — noted)
            "queryID": lambda: F.lit(
                str(__import__("uuid").uuid4())
            ),
            "initialQueryID": lambda: F.lit(
                str(__import__("uuid").uuid4())
            ),
            "tid": _tid,
            "blockSize": _block_size,
            "blockNumber": lambda: F.spark_partition_id().cast("long"),
            "rowNumberInBlock": _row_number_in_block,
            # unique & increasing-within-partition, NOT dense across
            # blocks (CH's counter is dense but explicitly
            # order-unspecified under parallelism) — noted
            "rowNumberInAllBlocks": lambda: F.monotonically_increasing_id(),
            # language/charset detection without models: the same
            # n-gram heuristic the lang_id query ships; CH needs
            # configured dictionaries for these
            "detectLanguage": _detect_language,
            "detectCharset": _detect_charset,
        }
    )


_register_r13_band2()


# ---------------------------------------------------------------------------
# r13 band 3: block-local helpers (neighbor / runningConcurrency /
# nowInBlock — the Arrow batch IS the CH block, footguns included),
# server/filesystem introspection, query normalization, text
# fingerprints (ngram/wordShingle MinHash+SimHash), reinterpret,
# UUIDv7, and the bf16/weighted quantile tails.
# ---------------------------------------------------------------------------

#: getMacro backing store — CH reads <macros> from server config; set
#: yours with set_macros({...}). Missing names raise, as CH does.
_MACROS: dict[str, str] = {}


def set_macros(macros: dict) -> None:
    """Configure the ``getMacro`` substitution map (the CH <macros>
    server-config analogue)."""
    _MACROS.clear()
    _MACROS.update({str(k): str(v) for k, v in macros.items()})


def _get_macro(name) -> Column:
    if isinstance(name, Column):
        raise TypeError("getMacro name must be a literal")
    if str(name) not in _MACROS:
        raise KeyError(
            f"no macro {name!r} configured (set_macros — the CH "
            f"<macros> config analogue)"
        )
    return F.lit(_MACROS[str(name)])


def _get_setting(name) -> Column:
    """``getSetting``: reads the ACTIVE session's conf key verbatim
    (CH reads the query-level setting); unknown keys raise, as CH
    does."""
    from pyspark.sql import SparkSession

    if isinstance(name, Column):
        raise TypeError("getSetting name must be a literal")
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("getSetting needs an active SparkSession")
    try:
        return F.lit(spark.conf.get(str(name)))
    except Exception as exc:  # noqa: BLE001 — mirror CH's unknown-setting error
        raise KeyError(f"unknown setting {name!r}") from exc


def _has_column_in_table(db, table, column) -> Column:
    """``hasColumnInTable(db, table, col)`` over the active session
    catalog (temp views register with db '')."""
    from pyspark.sql import SparkSession

    if any(isinstance(a, Column) for a in (db, table, column)):
        raise TypeError("hasColumnInTable args must be literals")
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("hasColumnInTable needs an active SparkSession")
    qualified = f"{db}.{table}" if str(db) else str(table)
    try:
        cols = {c.name for c in spark.catalog.listColumns(qualified)}
    except Exception:
        return F.lit(False)
    return F.lit(str(column) in cols)


#: functions that break constancy even over constant args (CH: rand
#: columns are per-row; now()/today() fold per query and stay constant)
_NONCONST_FNS = {
    "rand", "randn", "random", "uuid", "shuffle",
    "monotonically_increasing_id", "spark_partition_id",
    "input_file_name",
}


def _node_is_constant(node) -> bool:
    """Recursive plan-time foldability walk over Spark 4's ColumnNode
    tree (Literal leaves; functions fold iff deterministic over
    all-constant args)."""
    name = node.getClass().getSimpleName()
    if name == "Literal":
        return True
    if name in ("UnresolvedFunction", "InvokedFunction"):
        try:
            if str(node.functionName()).lower() in _NONCONST_FNS:
                return False
            args = node.arguments()
            return all(
                _node_is_constant(args.apply(i))
                for i in range(args.size())
            )
        except Exception:  # noqa: BLE001 — unknown shape = not constant
            return False
    if name == "Cast":
        try:
            return _node_is_constant(node.child())
        except Exception:  # noqa: BLE001
            return False
    return False


def _is_constant(c: Column) -> Column:
    """``isConstant``: 1 iff the expression folds to one value for the
    whole query — Literal leaves and deterministic functions over
    constant args (the post-folding answer CH gives); column refs and
    per-row generators report 0."""
    try:
        foldable = _node_is_constant(c._jc.node())  # noqa: SLF001
    except Exception:  # noqa: BLE001
        foldable = False
    return F.lit(1 if foldable else 0).cast("tinyint")


def _default_value_of_type_name(t) -> Column:
    """``defaultValueOfTypeName('T')``: the CH zero value of T, typed
    via the r12 CH-type→Spark-schema map (numerics → 0, String → '',
    Date/DateTime → epoch, Array → [], Nullable → NULL)."""
    if isinstance(t, Column):
        raise TypeError("defaultValueOfTypeName takes a literal type")
    ch_t = str(t).strip()
    spark_t = _ch_type_to_spark(ch_t)
    if ch_t.startswith("Nullable("):
        return F.lit(None).cast(spark_t)
    if ch_t.startswith("Array("):
        return F.array().cast(spark_t)
    if ch_t in ("String", "FixedString"):
        return F.lit("")
    if ch_t.startswith("Date"):
        return F.lit("1970-01-01").cast(spark_t)
    return F.lit(0).cast(spark_t)


def _visible_width(c: Column) -> Column:
    """``visibleWidth``: rendered console width — length of the text
    form, NULL rendering 4 chars wide (CH prints ᴺᵁᴸᴸ)."""
    return F.coalesce(F.length(c.cast("string")), F.lit(4)).cast("long")


def _generate_uuid_v7() -> Column:
    """``generateUUIDv7``: RFC 9562 layout — 48-bit unix-ms timestamp,
    version 7, variant 10, 74 random bits (entropy from xxhash64 over
    fresh v4 UUIDs, all JVM-side)."""
    ts_hex = F.lpad(
        F.lower(F.conv(F.unix_millis(F.current_timestamp()).cast("string"),
                       10, 16)),
        12, "0",
    )
    r = F.lower(F.lpad(F.hex(F.xxhash64(F.uuid())), 16, "0"))
    r2 = F.lower(F.lpad(F.hex(F.xxhash64(F.uuid())), 16, "0"))
    variant = F.substring(F.lit("89ab"), (F.abs(F.xxhash64(F.uuid())) % 4 + 1).cast("int"), 1)
    return F.concat(
        F.substring(ts_hex, 1, 8), F.lit("-"),
        F.substring(ts_hex, 9, 4), F.lit("-"),
        F.lit("7"), F.substring(r, 1, 3), F.lit("-"),
        variant, F.substring(r, 4, 3), F.lit("-"),
        F.substring(r2, 1, 12),
    )


def _neighbor(c: Column, offset, default=None, dtype: str = "double") -> Column:
    """``neighbor(x, offset[, default])``: the value ``offset`` rows
    ahead (negative = behind) WITHIN THE CURRENT BLOCK — faithfully
    block-local like CH (the Arrow batch is the block), including the
    documented order-dependence footgun. Out-of-block rows take
    ``default`` (literal) or NULL.

    ``dtype`` dispatches the UDF's type: CH's neighbor preserves the
    argument type, but a Column's type is not introspectable at
    expression-build time, so callers with non-double inputs
    (string/date/decimal) must pass their type explicitly — the
    default double cast would otherwise silently NULL or round them.
    pandas ``shift`` itself is dtype-agnostic."""
    if isinstance(offset, Column):
        raise TypeError("neighbor offset must be a literal int")
    off = int(offset)
    if isinstance(default, Column):
        raise TypeError("neighbor default must be a literal")
    key = ("neighbor", off, repr(default), dtype)
    if key not in _R12_UDFS:

        def gen(s, _o=off, _d=default):
            out = s.shift(-_o)
            if _d is not None:
                out = out.fillna(_d)
            return out

        _R12_UDFS[key] = F.pandas_udf(gen, dtype)
    arg = c.cast("double") if dtype == "double" else c.cast(dtype)
    return _R12_UDFS[key](arg)


def _running_difference_swf(c: Column) -> Column:
    """``runningDifferenceStartingWithFirstValue``: block-local
    difference with the block's first row returning its own value
    (runningDifference returns 0 there)."""
    key = "rdswf"
    if key not in _R12_UDFS:

        def gen(s):
            d = s.diff()
            if len(s):
                d.iloc[0] = s.iloc[0]
            return d

        _R12_UDFS[key] = F.pandas_udf(gen, "double")
    return _R12_UDFS[key](c.cast("double"))


def _running_concurrency(begin: Column, end: Column) -> Column:
    """``runningConcurrency(begin, end)``: intervals concurrently open
    at each row's begin, rows processed in block order (CH requires
    begin-sorted input; same contract here). Heap-based per batch."""
    # two inputs + in-batch sequential state → SCALAR_ITER over one
    # struct column
    if ("runconc", "udf") not in _R12_UDFS:
        from pyspark.sql.functions import PandasUDFType

        def sgen(it):
            import heapq

            import pandas as _pd

            # struct input arrives as a pandas DataFrame per batch
            for pdf in it:
                heap: list = []
                out = []
                for b, e in zip(pdf["b"], pdf["e"]):
                    heapq.heappush(heap, e)
                    while heap and heap[0] <= b:
                        heapq.heappop(heap)
                    out.append(len(heap))
                yield _pd.Series(out, dtype="int64")

        _R12_UDFS[("runconc", "udf")] = F.pandas_udf(
            sgen, "long", PandasUDFType.SCALAR_ITER
        )
    return _R12_UDFS[("runconc", "udf")](
        F.struct(
            begin.cast("double").alias("b"), end.cast("double").alias("e")
        )
    )


def _now_in_block() -> Column:
    """``nowInBlock``: the wall clock evaluated PER BLOCK (now() folds
    to one value per query; this one moves between Arrow batches)."""
    key = "nowinblock"
    if key not in _R12_UDFS:

        def gen(s):
            import datetime as _dt

            import pandas as _pd

            t = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
            return _pd.Series([t] * len(s))

        # wall-clock per block: nondeterministic by definition (stops
        # Catalyst CSE-folding two calls into one reading)
        _R12_UDFS[key] = F.pandas_udf(gen, "timestamp").asNondeterministic()
    return _R12_UDFS[key](F.lit(0))


_SLEEP_CAP = 3.0  # CH caps sleep() at 3 seconds


def _sleep(seconds) -> Column:
    """``sleep(n)``: sleeps min(n, 3) once per block, returns 0 (the
    CH throttle/test helper, cap included)."""
    if isinstance(seconds, Column):
        raise TypeError("sleep seconds must be a literal")
    sec = min(float(seconds), _SLEEP_CAP)
    key = ("sleep", sec)
    if key not in _R12_UDFS:

        def gen(s, _sec=sec):
            import time as _time

            import pandas as _pd

            _time.sleep(_sec)
            return _pd.Series([0] * len(s), dtype="int64")

        _R12_UDFS[key] = F.pandas_udf(gen, "long")
    return _R12_UDFS[key](F.lit(0))


def _sleep_each_row(seconds) -> Column:
    """``sleepEachRow(n)``: min(n, 3) seconds per ROW (capped like
    CH; use on tiny frames — it is the documented test helper)."""
    if isinstance(seconds, Column):
        raise TypeError("sleepEachRow seconds must be a literal")
    sec = min(float(seconds), _SLEEP_CAP)
    key = ("sleepeach", sec)
    if key not in _R12_UDFS:

        def gen(s, _sec=sec):
            import time as _time

            import pandas as _pd

            for _ in range(len(s)):
                _time.sleep(_sec)
            return _pd.Series([0] * len(s), dtype="int64")

        _R12_UDFS[key] = F.pandas_udf(gen, "long")
    return _R12_UDFS[key](F.lit(0))


def _log_trace(msg) -> Column:
    """``logTrace('msg')``: emits the message to the executor log once
    per block, returns 0."""
    if isinstance(msg, Column):
        raise TypeError("logTrace message must be a literal")
    m = str(msg)
    key = ("logtrace", m)
    if key not in _R12_UDFS:

        def gen(s, _m=m):
            import logging

            import pandas as _pd

            logging.getLogger("clickhouse_objects_analysis_spark").info(_m)
            return _pd.Series([0] * len(s), dtype="int64")

        _R12_UDFS[key] = F.pandas_udf(gen, "long")
    return _R12_UDFS[key](F.lit(0))


def _user_files_dir() -> str:
    import os as _os

    return _os.environ.get(
        "SPARK_GRAFT_USER_FILES",
        _os.path.join(_os.getcwd(), ".scratch", "user_files"),
    )


def _file(path, default=None) -> Column:
    """``file('name')``: content of a file under the user-files dir
    (the CH user_files_path sandbox — escaping the base dir is
    refused, as CH refuses)."""
    import os as _os

    if isinstance(path, Column):
        raise TypeError("file path must be a literal")
    base = _os.path.realpath(_user_files_dir())
    full = _os.path.realpath(_os.path.join(base, str(path)))
    if not (full == base or full.startswith(base + _os.sep)):
        raise ValueError(f"file() path escapes the user-files dir: {path!r}")
    try:
        with open(full, "rb") as fh:
            return F.lit(fh.read().decode("utf-8"))
    except OSError:
        if default is not None and not isinstance(default, Column):
            return F.lit(default)
        raise


def _statvfs_field(field: str) -> Column:
    import os as _os

    st = _os.statvfs(_os.getcwd())
    val = {
        "capacity": st.f_blocks * st.f_frsize,
        "available": st.f_bavail * st.f_frsize,
        "unreserved": st.f_bfree * st.f_frsize,
    }[field]
    return F.lit(int(val))


#: literal-replacement for normalizeQuery: strings, then numbers not
#: embedded in identifiers, then ?-list collapse (the CH rendering).
_NQ_STR_RE = re.compile(r"('(?:[^'\\]|\\.)*')")
_NQ_NUM_RE = re.compile(r"(?<![\w.])-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?(?![\w.])")
_NQ_LIST_RE = re.compile(r"\?(?:\s*,\s*\?)+")


def _normalize_query_text(q: str) -> str:
    q = _NQ_STR_RE.sub("?", q)
    q = _NQ_NUM_RE.sub("?", q)
    q = _NQ_LIST_RE.sub("?..", q)
    return re.sub(r"\s+", " ", q).strip()


def _normalize_query(c: Column) -> Column:
    """``normalizeQuery``: literals → ?, literal lists → ?.., collapsed
    whitespace. NON_BIT_COMPATIBLE: CH normalizes off its own AST, so
    alias handling differs on exotic queries; the placeholder rendering
    matches."""
    key = "normquery"
    if key not in _R12_UDFS:
        _R12_UDFS[key] = F.pandas_udf(
            lambda s: s.map(
                lambda v: None if v is None else _normalize_query_text(v)
            ),
            "string",
        )
    return _R12_UDFS[key](c)


def _reinterpret(c: Column, t) -> Column:
    """``reinterpret(x, 'T')``: reuse the source VALUE's bytes as T
    (little-endian, CH's in-memory layout) over the numeric/String
    subset. Literal target type."""
    if isinstance(t, Column):
        raise TypeError("reinterpret target type must be a literal")
    ch_t = str(t).strip()
    packs = {
        "Int8": ("b", 1), "UInt8": ("B", 1), "Int16": ("h", 2),
        "UInt16": ("H", 2), "Int32": ("i", 4), "UInt32": ("I", 4),
        "Int64": ("q", 8), "UInt64": ("Q", 8),
        "Float32": ("f", 4), "Float64": ("d", 8),
    }
    if ch_t not in packs and ch_t != "String":
        raise ValueError(f"reinterpret target {ch_t!r} outside the subset")
    key = ("reinterp", ch_t)
    if key not in _R12_UDFS:

        def one(v, _t=ch_t):
            import struct as _struct

            if isinstance(v, (bytes, bytearray)):
                b = bytes(v)
            elif isinstance(v, str):
                b = v.encode("utf-8")
            elif isinstance(v, float):
                b = _struct.pack("<d", v)
            else:
                b = int(v).to_bytes(8, "little", signed=int(v) < 0)
            if _t == "String":
                return b.rstrip(b"\x00").decode("utf-8", "replace")
            fmt, width = packs[_t]
            b = (b + bytes(width))[:width]
            out = _struct.unpack("<" + fmt, b)[0]
            if _t == "UInt64" and out >= 1 << 63:
                out -= 1 << 64  # two's-complement BIGINT rendering
            return out

        out_type = (
            "string" if ch_t == "String"
            else "double" if ch_t.startswith("Float")
            else "long"
        )
        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            out_type,
        )
    return _R12_UDFS[key](c)


def _text_fingerprint(kind: str, c: Column, n=3, hashnum=6) -> Column:
    """Shared ngram/wordShingle MinHash+SimHash fingerprints.
    NON_BIT_COMPATIBLE: CH hashes grams with its internal CRC-based
    kernels; ours uses the Guava-validated farm_fingerprint64. Same
    contract — MinHash returns (combined k-min, combined k-max) as a
    struct, SimHash a 64-bit bit-vote fingerprint."""
    if isinstance(n, Column) or isinstance(hashnum, Column):
        raise TypeError("fingerprint n/hashnum must be literals")
    n_i, k_i = int(n), int(hashnum)
    key = ("textfp", kind, n_i, k_i)
    if key not in _R12_UDFS:

        def grams_of(v: str, _kind=kind, _n=n_i):
            if _kind.startswith("ngram"):
                s = v
                return [s[i : i + _n] for i in range(max(len(s) - _n + 1, 0))] or [s]
            words = v.split()
            return [
                " ".join(words[i : i + _n])
                for i in range(max(len(words) - _n + 1, 0))
            ] or [" ".join(words)]

        minhash = kind.endswith("MinHash")

        def one(v, _k=k_i, _min=minhash):
            from .hash_kernels import farm_fingerprint64 as _fp

            hs = sorted({_fp(g.encode("utf-8")) for g in grams_of(v)})
            if _min:
                lo = hs[:_k]
                hi = hs[-_k:]

                def comb(xs):
                    h = _fp(b"".join(x.to_bytes(8, "little") for x in xs))
                    return h - (1 << 64) if h >= 1 << 63 else h

                return {"h1": comb(lo), "h2": comb(hi)}
            votes = [0] * 64
            for h in hs:
                for b in range(64):
                    votes[b] += 1 if (h >> b) & 1 else -1
            out = 0
            for b in range(64):
                if votes[b] > 0:
                    out |= 1 << b
            return out - (1 << 64) if out >= 1 << 63 else out

        if minhash:
            # StructType returns need a DataFrame, not a Series of dicts
            def gen_struct(s, _f=one):
                import pandas as _pd

                rows = [
                    {"h1": None, "h2": None} if v is None else _f(v)
                    for v in s
                ]
                return _pd.DataFrame(rows, columns=["h1", "h2"])

            _R12_UDFS[key] = F.pandas_udf(
                gen_struct, "h1 bigint, h2 bigint"
            )
        else:
            _R12_UDFS[key] = F.pandas_udf(
                lambda s, _f=one: s.map(
                    lambda v: None if v is None else _f(v)
                ),
                "bigint",
            )
    return _R12_UDFS[key](c)


def _quantile_bfloat16(c: Column, level=0.5) -> Column:
    """``quantileBFloat16``: values truncated to bfloat16 (top 16 bits
    of the float32 representation), quantile picked from the truncated
    multiset (inverted-CDF — an element, no interpolation, like CH's
    bf16 histogram walk). NON_BIT_COMPATIBLE on the exact histogram
    boundary rule."""
    if isinstance(level, Column):
        raise TypeError("quantileBFloat16 level must be a literal")
    q = float(level)
    key = ("qbf16", q)
    if key not in _R12_UDFS:
        from pyspark.sql.functions import PandasUDFType

        def agg(v, _q=q):
            import numpy as np

            vals = v.dropna().astype("float32").to_numpy()
            if not len(vals):
                return None
            trunc = (vals.view(np.uint32) & np.uint32(0xFFFF0000)).view(
                np.float32
            )
            return float(
                np.quantile(trunc, _q, method="inverted_cdf")
            )

        _R12_UDFS[key] = F.pandas_udf(agg, "double", PandasUDFType.GROUPED_AGG)
    return _R12_UDFS[key](c.cast("double"))


def _register_r13_band3() -> None:
    import os as _os
    import platform as _platform
    import random as _random

    CH_FUNCTIONS.update(
        {
            "generateUUIDv7": lambda: _generate_uuid_v7(),
            "nowInBlock": lambda *a: _now_in_block(),
            # one random UInt32 per plan build — constant across the
            # query's rows, CH's exact contract
            "randConstant": lambda: F.lit(
                _random.getrandbits(32)
            ).cast("long"),
            # non-distributed context: CH returns 1/1 outside a
            # Distributed table; partition parallelism is Spark's
            # plane (blockNumber)
            "shardNum": lambda: F.lit(1),
            "shardCount": lambda: F.lit(1),
            "getOSKernelVersion": lambda: F.lit(
                f"{_platform.system()} {_platform.release()}"
            ),
            "getMacro": _get_macro,
            "getSetting": _get_setting,
            "hasColumnInTable": _has_column_in_table,
            "isConstant": _is_constant,
            "defaultValueOfTypeName": _default_value_of_type_name,
            "visibleWidth": _visible_width,
            "indexHint": lambda *cs: F.lit(1).cast("tinyint"),
            "replicate": lambda x, arr: F.transform(arr, lambda _: x),
            "neighbor": _neighbor,
            "runningDifferenceStartingWithFirstValue": (
                _running_difference_swf
            ),
            "runningConcurrency": _running_concurrency,
            "sleep": _sleep,
            "sleepEachRow": _sleep_each_row,
            "logTrace": _log_trace,
            "file": _file,
            "filesystemAvailable": lambda: _statvfs_field("available"),
            "filesystemCapacity": lambda: _statvfs_field("capacity"),
            "filesystemUnreserved": lambda: _statvfs_field("unreserved"),
            "normalizeQuery": _normalize_query,
            "normalizedQueryHash": lambda c: F.xxhash64(
                _normalize_query(c)
            ),
            # exact weighted quantile where CH sketches — strictly
            # tighter, NBC
            "quantileTDigestWeighted": lambda c, w, q=0.5: F.percentile(
                c, float(q) if not isinstance(q, Column) else q, w
            ),
            "quantileBFloat16": _quantile_bfloat16,
            "ngramMinHash": lambda c, n=3, k=6: _text_fingerprint(
                "ngramMinHash", c, n, k
            ),
            "wordShingleMinHash": lambda c, n=3, k=6: _text_fingerprint(
                "wordShingleMinHash", c, n, k
            ),
            "ngramSimHash": lambda c, n=3: _text_fingerprint(
                "ngramSimHash", c, n
            ),
            "wordShingleSimHash": lambda c, n=3: _text_fingerprint(
                "wordShingleSimHash", c, n
            ),
            "reinterpret": _reinterpret,
        }
    )


_register_r13_band3()


# ---------------------------------------------------------------------------
# r13 band 4: arrayReduceInRanges, SQL re-rendering (formatQuery via
# the chparse token stream), schema-text generators, heuristic
# detect* tail, fuzzy multi-match, buildId, aggThrow.
# ---------------------------------------------------------------------------

def _array_reduce_in_ranges(agg_name, ranges: Column, arr: Column) -> Column:
    """``arrayReduceInRanges('agg', ranges, arr)``: the named aggregate
    over each (start, length) slice — ranges is array<struct<start,
    length>> (CH's Array(Tuple(Int, Int))); 1-based starts like
    arraySlice. Reuses arrayReduce's literal-name dispatch."""
    name = _literal_sep(agg_name)

    def one_slice(t):
        return _array_reduce(
            name,
            F.slice(arr, t.getField("start"), t.getField("length")),
        )

    return F.transform(ranges, one_slice)


def _format_query_tokens(sql: str, single_line: bool) -> str:
    from ..plans.chparse import _render, tokenize

    toks = tokenize(sql)
    if single_line:
        return _render(toks)
    out = _render(toks)
    breaks = (
        "FROM", "WHERE", "PREWHERE", "GROUP", "HAVING", "ORDER",
        "LIMIT", "SETTINGS", "UNION",
    )
    for kw in breaks:
        out = re.sub(rf"(?<!\n) (?={kw} )", "\n", out)
    return out


def _format_query(c: Column, single_line: bool = False) -> Column:
    """``formatQuery`` / ``formatQuerySingleLine``: canonical
    re-rendering off the token stream (comments dropped, one space per
    separator; multi-line form breaks before top-level clause
    keywords). NON_BIT_COMPATIBLE: CH renders from its own AST with
    its own indentation rules — the single-line CONTENT matches, byte
    layout does not."""
    key = ("fmtq", single_line)
    if key not in _R12_UDFS:
        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _sl=single_line: s.map(
                lambda v: None
                if v is None
                else _format_query_tokens(v, _sl)
            ),
            "string",
        )
    return _R12_UDFS[key](c)


_CH_TO_CAPNP = {
    "Int8": "Int8", "Int16": "Int16", "Int32": "Int32", "Int64": "Int64",
    "UInt8": "UInt8", "UInt16": "UInt16", "UInt32": "UInt32",
    "UInt64": "UInt64", "Float32": "Float32", "Float64": "Float64",
    "String": "Text", "Bool": "Bool", "Date": "UInt16",
    "DateTime": "UInt32",
}
_CH_TO_PROTO = {
    "Int8": "int32", "Int16": "int32", "Int32": "int32",
    "Int64": "int64", "UInt8": "uint32", "UInt16": "uint32",
    "UInt32": "uint32", "UInt64": "uint64", "Float32": "float",
    "Float64": "double", "String": "bytes", "Bool": "bool",
    "Date": "uint32", "DateTime": "uint32",
}


def _split_structure(structure: str) -> list[tuple[str, str]]:
    """'a Int64, b String' → [(a, Int64), ...] with paren-aware commas."""
    fields, depth, cur = [], 0, []
    for ch in structure:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        fields.append("".join(cur))
    out = []
    for f in fields:
        parts = f.strip().split(None, 1)
        if len(parts) == 2:
            out.append((parts[0], parts[1].strip()))
    return out


def _structure_to_schema(structure, kind: str) -> Column:
    """``structureToCapnProtoSchema`` / ``structureToProtobufSchema``:
    'name Type, ...' → the target IDL text over the scalar map above
    (unmapped types raise, as CH does for unsupported types)."""
    if isinstance(structure, Column):
        raise TypeError("structure must be a string literal")
    fields = _split_structure(str(structure))
    if kind == "capnp":
        lines = ["struct Message", "{"]
        for i, (name, t) in enumerate(fields):
            if t not in _CH_TO_CAPNP:
                raise ValueError(f"no Cap'n Proto mapping for {t!r}")
            lines.append(f"    {name} @{i} : {_CH_TO_CAPNP[t]};")
        lines.append("}")
    else:
        lines = ['syntax = "proto3";', "", "message Message", "{"]
        for i, (name, t) in enumerate(fields):
            if t not in _CH_TO_PROTO:
                raise ValueError(f"no Protobuf mapping for {t!r}")
            lines.append(f"    {_CH_TO_PROTO[t]} {name} = {i + 1};")
        lines.append("}")
    return F.lit("\n".join(lines))


_RAND_STRUCT_TYPES = [
    "Int8", "Int16", "Int32", "Int64", "UInt8", "UInt16", "UInt32",
    "UInt64", "Float32", "Float64", "String", "Date", "DateTime", "Bool",
]


def _generate_random_structure(n=None, seed=None) -> Column:
    """``generateRandomStructure([n[, seed]])``: 'c1 Type, c2 Type…'.
    Seeded calls are deterministic for THIS generator (CH's internal
    generator draws a different sequence — same contract, noted)."""
    import random as _random

    if isinstance(n, Column) or isinstance(seed, Column):
        raise TypeError("generateRandomStructure args must be literals")
    rng = _random.Random(seed) if seed is not None else _random.Random()
    count = int(n) if n is not None else rng.randint(1, 10)
    cols = ", ".join(
        f"c{i + 1} {rng.choice(_RAND_STRUCT_TYPES)}" for i in range(count)
    )
    return F.lit(cols)


#: tiny keyword-vote tables for the heuristic detect* tail (CH routes
#: these through configured dictionaries/models — same contract, NBC)
_PROG_LANG_KW = {
    "Python": ["def ", "import ", "elif ", "lambda ", "None"],
    "C++": ["#include", "std::", "template<", "nullptr", "->"],
    "Rust": ["fn ", "let mut", "impl ", "pub fn", "::<"],
    "Go": ["func ", "package ", ":=", "go func", "chan "],
    "JavaScript": ["function ", "const ", "=>", "console.log", "var "],
    "Java": ["public static", "void ", "new ", "extends ", "System.out"],
    "SQL": ["SELECT ", "FROM ", "WHERE ", "GROUP BY", "INSERT INTO"],
}

_TONALITY_VALENCE = {
    "good": 1, "great": 2, "excellent": 3, "love": 3, "loved": 3,
    "like": 1, "happy": 2, "wonderful": 3, "best": 2, "amazing": 3,
    "fantastic": 3, "nice": 1, "awesome": 3, "perfect": 3, "enjoy": 2,
    "pleasant": 1, "superb": 3, "delight": 2, "win": 1, "positive": 1,
    "bad": -1, "terrible": -3, "awful": -3, "hate": -3, "hated": -3,
    "dislike": -1, "sad": -2, "horrible": -3, "worst": -2, "poor": -1,
    "disappointing": -2, "negative": -1, "fail": -2, "failure": -2,
    "broken": -1, "ugly": -2, "angry": -2, "wrong": -1, "lose": -1,
    "annoying": -2,
}


def _detect_programming_language(c: Column) -> Column:
    key = "detectproglang"
    if key not in _R12_UDFS:

        def one(v):
            scores = {
                lang: sum(v.count(kw) for kw in kws)
                for lang, kws in _PROG_LANG_KW.items()
            }
            best = max(scores, key=lambda g: (scores[g], g))
            return best if scores[best] > 0 else "Undefined"

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            "string",
        )
    return _R12_UDFS[key](c)


def _detect_tonality(c: Column) -> Column:
    key = "detecttonality"
    if key not in _R12_UDFS:

        def one(v):
            words = re.findall(r"[a-z']+", v.lower())
            hits = [_TONALITY_VALENCE[w] for w in words
                    if w in _TONALITY_VALENCE]
            return float(sum(hits) / len(hits)) if hits else 0.0

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            "float",
        )
    return _R12_UDFS[key](c)


def _detect_language_mixed(c: Column) -> Column:
    """``detectLanguageMixed``: Map(lang → share) over the stopword
    votes of the built-in heuristic (languages with zero votes are
    omitted, as CH omits undetected languages)."""
    from ..operators.text import lang_scores, tokenize as _tok

    words = _tok(F.lower(c))
    scores = lang_scores(words)
    langs = list(scores)
    total = None
    for lang in langs:
        total = scores[lang] if total is None else total + scores[lang]
    m = F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in langs]),
        F.array(
            *[
                (scores[lang] / F.nullif(total.cast("double"), F.lit(0)))
                for lang in langs
            ]
        ),
    )
    return F.map_filter(m, lambda _, v: v.isNotNull() & (v > 0))


def _edit_within(pattern: str, hay: str, k: int) -> bool:
    """Approximate SUBSTRING match: min edit distance of pattern
    against any substring of hay ≤ k (first DP row free — the standard
    semi-global alignment)."""
    m = len(pattern)
    prev = [0] * (len(hay) + 1)
    cur = [0] * (len(hay) + 1)
    for i in range(1, m + 1):
        cur[0] = i
        pc = pattern[i - 1]
        for j in range(1, len(hay) + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (pc != hay[j - 1]),
            )
        prev, cur = cur, prev
    return min(prev) <= k


def _multi_fuzzy_match_any(c: Column, distance, patterns) -> Column:
    """``multiFuzzyMatchAny(hay, k, [patterns])``: 1 if any pattern
    matches a substring within edit distance k. CH runs hyperscan;
    this is the exact semi-global DP (slow path — the contract, not
    the SIMD engine). Literal patterns/distance."""
    if isinstance(distance, Column) or isinstance(patterns, Column):
        raise TypeError("multiFuzzyMatchAny distance/patterns must be literals")
    k = int(distance)
    pats = tuple(str(p) for p in patterns)
    key = ("mfma", k, pats)
    if key not in _R12_UDFS:

        def one(v, _k=k, _p=pats):
            return 1 if any(_edit_within(p, v, _k) for p in _p) else 0

        _R12_UDFS[key] = F.pandas_udf(
            lambda s, _f=one: s.map(
                lambda v: None if v is None else _f(v)
            ),
            "tinyint",
        )
    return _R12_UDFS[key](c)


def _agg_throw(c: Column, prob=1.0) -> Column:
    """``aggThrow(p)``: the CH fault-injection test aggregate — raises
    with probability p at aggregation time, else returns NULL."""
    if isinstance(prob, Column):
        raise TypeError("aggThrow probability must be a literal")
    p_f = float(prob)
    key = ("aggthrow", p_f)
    if key not in _R12_UDFS:
        from pyspark.sql.functions import PandasUDFType

        def agg(v, _p=p_f):
            import random as _random

            if _random.random() < _p:
                raise RuntimeError("Aggregate function aggThrow has thrown")
            return None

        # random fault injection: nondeterministic like rand()
        _R12_UDFS[key] = F.pandas_udf(
            agg, "double", PandasUDFType.GROUPED_AGG
        ).asNondeterministic()
    return _R12_UDFS[key](c.cast("double"))


def _register_r13_band4() -> None:
    CH_FUNCTIONS.update(
        {
            "arrayReduceInRanges": _array_reduce_in_ranges,
            "formatQuery": lambda c: _format_query(c, False),
            "formatQuerySingleLine": lambda c: _format_query(c, True),
            "structureToCapnProtoSchema": lambda s: _structure_to_schema(
                s, "capnp"
            ),
            "structureToProtobufSchema": lambda s: _structure_to_schema(
                s, "proto"
            ),
            "generateRandomStructure": _generate_random_structure,
            "detectProgrammingLanguage": _detect_programming_language,
            "detectTonality": _detect_tonality,
            "detectLanguageMixed": _detect_language_mixed,
            "multiFuzzyMatchAny": _multi_fuzzy_match_any,
            "aggThrow": _agg_throw,
            # engine build identifier: the git-revision component of
            # Spark's version() (CH returns its ELF build-id hex)
            "buildId": lambda: F.element_at(
                F.split(F.call_function("version"), " "), 2
            ),
        }
    )


_register_r13_band4()

NON_BIT_COMPATIBLE = NON_BIT_COMPATIBLE | frozenset(
    {
        # r13 spec-transcribed kernels: the variant each implements is
        # pinned (metrohash64_2 constants; XXH3 with the published
        # kSecret, empty-input canonical value asserted) but no
        # independent implementation exists in this container to
        # certify byte parity with the upstream revision CH vendors.
        # wyHash64 matches the CH docs example
        # wyHash64('ClickHouse') = 12336419557878201794 and is treated
        # as bit-exact; sipHash64 was REMOVED from this set in r13
        # (true SipHash-2-4 kernel, Guava-validated).
        "metroHash64",
        "xxh3",
        # geoDistance: Andoyer-Lambert ellipsoidal approximation vs
        # CH's float32 piecewise polynomial — same WGS-84 contract,
        # different approximation error (sub-0.5%)
        "geoDistance",
        # sumKahan: exact Shewchuk fsum — at least as accurate as CH's
        # Kahan compensation, not the same rounding trajectory
        "sumKahan",
        # r13 band 2: model-backed detection mapped onto the repo's
        # built-in heuristics (CH needs configured FastText/ICU
        # dictionaries; same contract, different classifier)
        "detectLanguage",
        "detectCharset",
        # r13 band 3: same contract, different internal hash/sketch
        "normalizeQuery",       # CH normalizes off its own AST
        "normalizedQueryHash",  # xxhash64 of the normalized text
        "ngramMinHash",         # farm_fingerprint64 gram hashes
        "wordShingleMinHash",
        "ngramSimHash",
        "wordShingleSimHash",
        "quantileTDigestWeighted",  # exact weighted vs t-digest sketch
        "quantileBFloat16",     # inverted-CDF pick vs CH histogram walk
        # r13 band 4: heuristic/contract surfaces over different engines
        "formatQuery",          # token re-render vs CH's AST printer
        "formatQuerySingleLine",
        "generateRandomStructure",  # different seeded generator sequence
        "detectProgrammingLanguage",  # keyword votes vs CH's dictionary
        "detectTonality",       # built-in valence list vs CH dictionary
        "detectLanguageMixed",  # stopword shares vs CH models
        "multiFuzzyMatchAny",   # exact semi-global DP vs hyperscan
        "buildId",              # Spark git revision vs CH ELF build-id
    }
)


def translate_name(ch_name: str) -> Builder:
    """Spark builder for a ClickHouse function name; KeyError with the
    full supported list if unknown. Names in ``NON_BIT_COMPATIBLE`` keep
    the contract but not the byte-level output — see that set's docs."""
    try:
        return CH_FUNCTIONS[ch_name]
    except KeyError:
        raise KeyError(
            f"no translation for ClickHouse function {ch_name!r}; "
            f"{len(CH_FUNCTIONS)} names supported"
        ) from None


def ch_expr(ch_name: str, *args) -> Column:
    """Evaluate a ClickHouse-named function over Columns/lambdas."""
    return translate_name(ch_name)(*args)
