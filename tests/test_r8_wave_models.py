"""Round-8 wave-1 behavior tests: the promoted translation-table names
against independent pure-Python references (the third implementation
besides Spark and the DuckDB oracle) — bit-exact intHash32/intHash64,
MySQL-mode-0 week numbering across year boundaries, Modified Julian Day
round-trips, and timeSlots alignment."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import ch_expr

_M64 = (1 << 64) - 1


def _fmix64(x: int) -> int:
    x &= _M64
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & _M64
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & _M64
    x ^= x >> 33
    return x


def _int_hash64(x: int) -> int:
    """ClickHouse SQL intHash64 = fmix64 over the FunctionsHashing.h
    salt (IntHash64Impl)."""
    return _fmix64((x ^ 0x4CF2D2BAAE6DA887) & _M64)


def _int_hash32(key: int) -> int:
    """ClickHouse SQL intHash32 = Wang's 64→32 mix over the
    FunctionsHashing.h salt, with the ROTATE first xor step
    (Hash.h intHash32<0x75D9543DE018BF45>)."""
    key = (key ^ 0x75D9543DE018BF45) & _M64
    key = ((~key) + (key << 18)) & _M64
    key ^= ((key >> 31) | (key << 33)) & _M64
    key = (key * 21) & _M64
    key ^= key >> 11
    key = (key + (key << 6)) & _M64
    key ^= key >> 22
    return key & 0xFFFFFFFF


def _week_mode0(d: datetime.date) -> int:
    jan1 = datetime.date(d.year, 1, 1)
    w1 = (jan1.weekday() + 1) % 7  # 0 = Sunday
    off = (7 - w1) % 7
    doy = (d - jan1).days
    return 0 if doy < off else (doy - off) // 7 + 1


def test_int_hash_bit_exact(spark):
    """intHash64 is MurmurHash3's fmix64, intHash32 Thomas Wang's mix —
    the decimal-mod-2^64 Catalyst pipeline must be BIT-exact, including
    negative longs (reinterpreted as uint64) and the 2^63 boundary."""
    probes = [
        0, 1, 2, 63, 64, 255, 256, 1 << 31, (1 << 31) - 1,
        (1 << 62) + 12345, (1 << 63) - 1, -1, -2, -(1 << 62),
        -(1 << 63), 987654321987654321, -987654321987654321,
    ]
    df = spark.createDataFrame([(x,) for x in probes], "x long")
    rows = df.select(
        "x",
        ch_expr("intHash64", F.col("x")).alias("h64"),
        ch_expr("intHash32", F.col("x")).alias("h32"),
    ).collect()
    for r in rows:
        u = r["x"] & _M64
        assert (r["h64"] + (1 << 64)) % (1 << 64) == _int_hash64(u), r["x"]
        assert r["h32"] == _int_hash32(u), r["x"]


def test_week_mode0_decade_sweep(spark):
    """toWeek mode 0 over ten year boundaries including leap years and
    years starting on every weekday; toYearWeek rolls week-0 days into
    the previous year's last week."""
    start = datetime.date(2015, 12, 20)
    days = [(start + datetime.timedelta(days=i)) for i in range(0, 3800, 7)]
    days += [datetime.date(y, 1, 1) for y in range(2015, 2026)]
    days += [datetime.date(y, 12, 31) for y in range(2015, 2026)]
    df = spark.createDataFrame([(d,) for d in days], "d date")
    rows = df.select(
        "d",
        ch_expr("toWeek", F.col("d")).alias("w0"),
        ch_expr("toYearWeek", F.col("d")).alias("yw0"),
    ).collect()
    for r in rows:
        want = _week_mode0(r["d"])
        assert r["w0"] == want, (r["d"], r["w0"], want)
        if want == 0:
            prev_end = datetime.date(r["d"].year - 1, 12, 31)
            expect = (r["d"].year - 1) * 100 + _week_mode0(prev_end)
        else:
            expect = r["d"].year * 100 + want
        assert r["yw0"] == expect, (r["d"], r["yw0"], expect)


def test_mjd_round_trip(spark):
    """fromModifiedJulianDay(toModifiedJulianDay(d)) == d and the MJD
    epoch anchors at 1858-11-17 = day 0."""
    df = spark.createDataFrame(
        [(datetime.date(1858, 11, 17),), (datetime.date(2024, 2, 29),),
         (datetime.date(1970, 1, 1),)],
        "d date",
    )
    rows = df.select(
        "d",
        ch_expr("toModifiedJulianDay", F.col("d")).alias("mjd"),
        ch_expr(
            "fromModifiedJulianDay",
            ch_expr("toModifiedJulianDay", F.col("d")),
        ).alias("rt"),
    ).collect()
    assert {r["d"]: r["mjd"] for r in rows}[datetime.date(1858, 11, 17)] == 0
    assert {r["d"]: r["mjd"] for r in rows}[datetime.date(1970, 1, 1)] == 40587
    assert all(r["rt"] == r["d"] for r in rows)


def test_time_slots_alignment(spark):
    """Every slot is size-aligned, the first contains start, the last
    contains start+duration, and the count is the closed form."""
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 1, 10, 17, 5), 3700)],
        "ts timestamp, dur int",
    )
    row = df.select(
        ch_expr("timeSlots", F.col("ts"), F.col("dur")).alias("slots")
    ).collect()[0]
    slots = row["slots"]
    assert slots[0] == datetime.datetime(2024, 3, 1, 10, 0, 0)
    assert slots[-1] == datetime.datetime(2024, 3, 1, 11, 0, 0)
    assert len(slots) == 3
    assert all(s.minute in (0, 30) and s.second == 0 for s in slots)


def test_proportions_ztest_known_value(spark):
    """z for (120/1000 vs 100/1000) against the hand-computed pooled
    statistic; CI must bracket the difference symmetrically."""
    df = spark.range(1)
    r = df.select(
        ch_expr(
            "proportionsZTest",
            F.lit(120), F.lit(100), F.lit(1000), F.lit(1000),
        ).alias("t")
    ).collect()[0]["t"]
    p1, p2, pp = 0.12, 0.10, 0.11
    z = (p1 - p2) / ((pp * (1 - pp) * (2 / 1000)) ** 0.5)
    assert abs(r["z_stat"] - z) < 1e-12
    mid = (r["ci_low"] + r["ci_high"]) / 2
    assert abs(mid - (p1 - p2)) < 1e-12


def test_tuple_family_and_decimal(spark):
    df = spark.range(1)
    a = F.array(F.lit(3), F.lit(5), F.lit(7))
    b = F.array(F.lit(1), F.lit(5), F.lit(2))
    r = df.select(
        ch_expr("tuplePlus", a, b).alias("p"),
        ch_expr("tupleHammingDistance", a, b).alias("h"),
        ch_expr(
            "divideDecimal",
            F.lit(123.45).cast("decimal(10,2)"),
            F.lit(8).cast("decimal(10,2)"),
            4,
        ).cast("string").alias("dd"),
    ).collect()[0]
    assert r["p"] == [4, 10, 9]
    assert r["h"] == 2
    # 123.45 / 8 = 15.43125 -> truncated toward zero at scale 4
    assert r["dd"] == "15.4312"


def test_decimal_div_mul_nonterminating_high_scale(spark):
    """The r8-ADVICE finding: native decimal division adjusts
    2/3 to decimal(38,6) and HALF_UP-rounds digit 6 BEFORE truncation
    (0.666667 -> scale-10 render 0.6666670000). The scaled-integer
    path must deliver all 10 truncated digits, toward zero, for both
    signs, and multiplyDecimal must not quantize inputs at 6 digits."""
    df = spark.range(1)

    def dd(a, b, s):
        return ch_expr(
            "divideDecimal",
            F.lit(a).cast("decimal(20,7)"),
            F.lit(b).cast("decimal(20,7)"),
            s,
        ).cast("string")

    def dm(a, b, s):
        return ch_expr(
            "multiplyDecimal",
            F.lit(a).cast("decimal(20,7)"),
            F.lit(b).cast("decimal(20,7)"),
            s,
        ).cast("string")

    r = df.select(
        dd("2", "3", 10).alias("d23"),
        dd("-2", "3", 10).alias("dn23"),
        dd("1", "7", 12).alias("d17"),
        dm("0.0000012", "0.0000012", 14).alias("m_tiny"),
        dm("-1.5", "1.5", 10).alias("m_neg"),
    ).collect()[0]
    assert r["d23"] == "0.6666666666"  # truncated, never ...67
    assert r["dn23"] == "-0.6666666666"  # toward zero, not floor
    assert r["d17"] == "0.142857142857"
    # 1.2e-6 squared = 1.44e-12: vanishes if inputs quantize at 1e-6
    assert r["m_tiny"] == "0.00000000000144"
    assert r["m_neg"] == "-2.2500000000"


def test_decimal_div_mul_two_limb_wide_envelope(spark):
    """r10 verdict #6: the old envelope (|value| < 10^12 quantization,
    divide |a| < 10^(26-scale), multiply |a·b| < 10^14) silently NULLed
    big-but-representable inputs. The two-limb rewrite must be exact up
    to the full decimal(38,12) quantization (|value| < 10^26; divide
    divisor |b| < 10^13), agreeing digit-for-digit with Python's
    arbitrary-precision int arithmetic, and still NULL cleanly beyond
    the envelope."""
    df = spark.range(1)

    def dd(a, b, s):
        return ch_expr(
            "divideDecimal",
            F.lit(a).cast("decimal(38,12)"),
            F.lit(b).cast("decimal(26,7)"),
            s,
        ).cast("string")

    def dm(a, b, s):
        return ch_expr(
            "multiplyDecimal",
            F.lit(a).cast("decimal(38,12)"),
            F.lit(b).cast("decimal(38,12)"),
            s,
        ).cast("string")

    a_big = "1000000000000000000.5"  # 1e18 + 0.5 — 1e6x the old bound
    r = df.select(
        dd(a_big, "7.3", 6).alias("d_big"),
        dd("-" + a_big, "7.3", 6).alias("d_big_neg"),
        dd(a_big, "3", 10).alias("d_big_s10"),
        dm("10000000000000.5", "10000000000000.5", 2).alias("m_sq"),
        dm("99999999999999999999999999", "2", 0).alias("m_edge"),
        dm("10000000000000000000", "10000000000000000000", 0).alias(
            "m_overflow"  # 1e38 result: exceeds decimal(38) -> NULL
        ),
        dd("1", "20000000000000", 4).alias("d_divisor_over"),  # |b|>=1e13
        # quotients past the decimal(38,6) division type's 10^32
        # integer capacity (r11 review finding: these THREW under ANSI
        # instead of returning the exact in-envelope result)
        dd("9000000000000000000000000", "0.0000001", 1).alias("d_huge_q"),
        dm("100000000000000000000", "100000000000000", 1).alias(
            "m_huge_q"
        ),
    ).collect()[0]

    # ground truth from Python ints (scaled by 10^12 like the engine)
    xa = 10**30 + 5 * 10**11  # a_big * 10^12
    xb = 73 * 10**11  # 7.3 * 10^12
    q6 = xa * 10**6 // xb
    assert r["d_big"] == f"{q6 // 10**6}.{q6 % 10**6:06d}"
    assert r["d_big_neg"] == "-" + r["d_big"]
    q10 = xa * 10**10 // (3 * 10**12)
    assert r["d_big_s10"] == f"{q10 // 10**10}.{q10 % 10**10:010d}"
    # (1e13 + 0.5)^2 = 1e26 + 1e13 + 0.25 -> scale-2 truncation
    m = (10**25 + 5 * 10**11) ** 2  # (value*10^12)^2 = value^2*10^24
    q2 = m // 10**22  # result*10^2
    assert r["m_sq"] == f"{q2 // 100}.{q2 % 100:02d}"
    assert r["m_edge"] == str((10**26 - 1) * 2)
    assert r["m_overflow"] is None
    assert r["d_divisor_over"] is None
    # 9e24 / 1e-7 = 9e31 -> scale-1 render "9...0.0" (33 digits + .0)
    qh = (9 * 10**36) * 10 // (10**5)  # scaled ints: 9e24*1e12 / 1e-7*1e12
    assert r["d_huge_q"] == f"{qh // 10}.{qh % 10}"
    qm = (10**32 * 10**26) * 10 // 10**24  # xa*xb*10/10^24, scale 1
    assert r["m_huge_q"] == f"{qm // 10}.{qm % 10}"


def test_decimal_div_mul_randomized_vs_bignum(spark):
    """Randomized cross-check of the two-limb machinery against Python
    arbitrary-precision ints: 60 seeded pairs spanning the full widened
    envelope (magnitudes 1e-6..1e24, both signs, scales 0..12), one
    Spark job for all of them. Ground truth: truncation toward zero of
    the exact scaled-integer quotient/product."""
    import random

    rng = random.Random(0xC0FFEE)
    cases = []
    for i in range(60):
        ea = rng.uniform(-6, 24)
        eb = rng.uniform(-6, 12)  # divisor envelope |b| < 1e13
        a = rng.choice([-1, 1]) * round(10**ea, 6)
        b = rng.choice([-1, 1]) * round(10**eb, 6)
        if b == 0:
            b = 1.5
        s = rng.randint(0, 12)
        cases.append((i, f"{a:.6f}", f"{b:.6f}", s))

    cols = []
    for i, a, b, s in cases:
        cols.append(
            ch_expr(
                "divideDecimal",
                F.lit(a).cast("decimal(38,12)"),
                F.lit(b).cast("decimal(20,7)"),
                s,
            ).cast("string").alias(f"d{i}")
        )
        cols.append(
            ch_expr(
                "multiplyDecimal",
                F.lit(a).cast("decimal(38,12)"),
                F.lit(b).cast("decimal(20,7)"),
                s,
            ).cast("string").alias(f"m{i}")
        )
    row = spark.range(1).select(*cols).collect()[0]

    def scaled_int(txt: str) -> int:
        # value * 10^12 as an exact int from the fixed-point literal
        neg = txt.startswith("-")
        ip, _, fp = txt.lstrip("-").partition(".")
        v = int(ip) * 10**12 + int((fp + "0" * 12)[:12])
        return -v if neg else v

    for i, a, b, s in cases:
        xa, xb = scaled_int(a), scaled_int(b)
        sign = -1 if (xa < 0) != (xb < 0) else 1
        # expected divide: trunc-toward-zero at scale s
        qd = abs(xa) * 10**s // abs(xb)
        exp_d = None if qd >= 10**38 else sign * qd
        got_d = row[f"d{i}"]
        if exp_d is None:
            assert got_d is None, (i, a, b, s, got_d)
        else:
            assert got_d is not None, (i, a, b, s)
            # digit-exact check straight from the rendered string
            neg = got_d.startswith("-")
            ip, _, fp = got_d.lstrip("-").partition(".")
            got_scaled = int(ip) * 10**s + int(fp or "0")
            assert (-got_scaled if neg else got_scaled) == exp_d, (
                i, a, b, s, got_d, exp_d,
            )
        # expected multiply
        qm = abs(xa) * abs(xb) // 10 ** (24 - s) if s <= 24 else None
        exp_m = None if qm is None or qm >= 10**38 else sign * qm
        got_m = row[f"m{i}"]
        if exp_m is None:
            assert got_m is None, (i, a, b, s, got_m)
        else:
            assert got_m is not None, (i, a, b, s)
            neg = got_m.startswith("-")
            ip, _, fp = got_m.lstrip("-").partition(".")
            got_scaled = int(ip) * 10**s + int(fp or "0")
            assert (-got_scaled if neg else got_scaled) == exp_m, (
                i, a, b, s, got_m, exp_m,
            )
