"""Wave-13 kernel models (the fuzz-the-kernels pattern from waves 8-12):
each new scalar is checked against an independent Python reference over
randomized inputs — one Spark round trip per test, vectorized over all
examples."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import ch_expr

_rng = random.Random(71393)


def _ascii_strings(n=60, maxlen=24):
    alpha = "abcdefghijklmnopqrstuvwxyzABC0123456789 _-&<>\"'"
    return [
        "".join(_rng.choice(alpha) for _ in range(_rng.randint(0, maxlen)))
        for _ in range(n)
    ]


def _java_hash_ref(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) & 0xFFFFFFFF
    return h - 2**32 if h >= 2**31 else h


def test_java_hive_hash_match_reference(spark):
    vals = _ascii_strings() + ["", "a", "zzzzzzzzzzzzzzzzzzzzzzzz"]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    got = {
        r["i"]: (r["jh"], r["hh"])
        for r in df.select(
            "i",
            ch_expr("javaHash", F.col("s")).alias("jh"),
            ch_expr("hiveHash", F.col("s")).alias("hh"),
        ).collect()
    }
    for i, v in enumerate(vals):
        ref = _java_hash_ref(v)
        assert got[i] == (ref, ref & 0x7FFFFFFF), (v, got[i])


def test_bitmask_decompose_reconstructs(spark):
    vals = [0, 1, 137, 2**31 - 1, 2**62 - 1, -1, -2, -(2**63)] + [
        _rng.randrange(0, 2**62) for _ in range(40)
    ] + [-_rng.randrange(1, 2**62) for _ in range(10)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, n long")
    got = {
        r["i"]: (r["back"], r["lst"])
        for r in df.select(
            "i",
            F.aggregate(
                ch_expr("bitmaskToArray", F.col("n")),
                F.lit(0).cast("long"),
                lambda a, p: a + p,
            ).alias("back"),
            ch_expr("bitmaskToList", F.col("n")).alias("lst"),
        ).collect()
    }
    for i, v in enumerate(vals):
        back, lst = got[i]
        # two's-complement wrap: terms sum to v modulo 2^64 (the sign
        # bit appears as Int64 min, so the plain sum matches exactly)
        assert back == v
        parts = [int(x) for x in lst.split(",")] if lst else []
        assert sum(parts) == v
        # ascending by bit position: positives ascending, then the
        # (negative) sign-bit term last for v < 0
        pos_parts = [p for p in parts if p > 0]
        assert pos_parts == sorted(pos_parts)
        assert bool(parts and parts[-1] < 0) == (v < 0)


def test_lgamma_tgamma_erf_vs_math(spark):
    xs = [0.5, 1.0, 1.5, 4.7, 8.0, 12.5] + [
        0.5 + _rng.random() * 12 for _ in range(30)
    ]
    ys = [-3.0, -0.5, 0.0, 0.5, 2.5, -1.25] + [
        (_rng.random() - 0.5) * 8 for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(zip(xs, ys, strict=True))],
        "i long, x double, y double",
    )
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            ch_expr("lgamma", F.col("x")).alias("lg"),
            ch_expr("tgamma", F.col("x")).alias("tg"),
            ch_expr("erf", F.col("y")).alias("e"),
            ch_expr("erfc", F.col("y")).alias("ec"),
        ).collect()
    }
    for i, (x, y) in enumerate(zip(xs, ys, strict=True)):
        r = got[i]
        assert abs(r["lg"] - math.lgamma(x)) < 1e-10 * max(1, abs(math.lgamma(x)))
        assert abs(r["tg"] - math.gamma(x)) < 1e-9 * math.gamma(x)
        assert abs(r["e"] - math.erf(y)) < 2e-7  # A&S 7.1.26 bound
        assert abs(r["ec"] - math.erfc(y)) < 2e-7
        assert abs(r["e"] + r["ec"] - 1.0) < 1e-15


def _byte_hamming_ref(a: str, b: str) -> int:
    m = min(len(a), len(b))
    return sum(a[i] != b[i] for i in range(m)) + abs(len(a) - len(b))


def test_byte_hamming_vs_reference(spark):
    pairs = [
        (a, b)
        for a, b in zip(_ascii_strings(40, 12), _ascii_strings(40, 12))
    ] + [("", ""), ("", "xyz"), ("abc", "abc")]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i long, a string, b string",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", ch_expr("byteHammingDistance", F.col("a"), F.col("b")).alias("d")
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        assert got[i] == _byte_hamming_ref(a, b), (a, b)


def test_xml_encode_decode_roundtrip(spark):
    vals = _ascii_strings(40, 20) + ['<a href="x">&amp; \'q\'</a>', "&&<<>>"]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    got = {
        r["i"]: r["rt"]
        for r in df.select(
            "i",
            ch_expr(
                "decodeXMLComponent", ch_expr("encodeXMLComponent", F.col("s"))
            ).alias("rt"),
        ).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == v, (v, got[i])
