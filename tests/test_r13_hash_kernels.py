"""r13 hash kernels (functions/hash_kernels.py): property-tested
against Spark's bundled Guava (com.google.common.hash.Hashing) for the
three kernels Guava also implements — murmur3_x64_128 (seed 0),
farmHashFingerprint64, sipHash24(0,0) — plus published canonical
vectors and branch-coverage smoke for the spec-transcribed kernels."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import (
    NON_BIT_COMPATIBLE,
    ch_expr,
)
from clickhouse_objects_analysis_spark.functions.hash_kernels import (
    farm_fingerprint64,
    metro_hash64,
    murmur2_32,
    murmur2_64a,
    murmur3_x64_128,
    sip_hash_2_4,
    wy_hash64,
    xxh3_64,
)

#: lengths covering every branch of every kernel: empty, 1-3, 4-8,
#: 9-16, 17-32, 33-64, tails around 4/8/16/32-byte chunk boundaries,
#: the XXH3 midsize (129-240) and long (>240, multi-block >1024) paths.
_LENGTHS = (
    list(range(0, 70))
    + [95, 96, 97, 127, 128, 129, 200, 240, 241, 255, 256]
    + [300, 511, 512, 1000, 1024, 1025, 2500]
)


def _cases(seed: int = 13) -> list[bytes]:
    rng = random.Random(seed)
    return [bytes(rng.randrange(256) for _ in range(n)) for n in _LENGTHS]


def _guava(spark):
    return spark.sparkContext._jvm.com.google.common.hash.Hashing


def test_murmur3_x64_128_matches_guava(spark):
    mm = _guava(spark).murmur3_128(0)
    for b in _cases():
        want = bytes(
            (x + 256) % 256 for x in mm.hashBytes(bytearray(b)).asBytes()
        )
        h1, h2 = murmur3_x64_128(b)
        got = h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
        assert got == want, f"len {len(b)}"


def test_farm_fingerprint64_matches_guava(spark):
    farm = _guava(spark).farmHashFingerprint64()
    for b in _cases(7):
        want = farm.hashBytes(bytearray(b)).asLong() & (2**64 - 1)
        assert farm_fingerprint64(b) == want, f"len {len(b)}"


def test_sip_hash_2_4_matches_guava(spark):
    # CH sipHash64 default-constructs the key to (0,0) —
    # src/Common/SipHash.h; also check a nonzero key to pin the
    # key-mix path
    for k0, k1 in [(0, 0), (0x0706050403020100, 0x0F0E0D0C0B0A0908)]:
        sip = _guava(spark).sipHash24(k0, k1)
        for b in _cases(3):
            want = sip.hashBytes(bytearray(b)).asLong() & (2**64 - 1)
            assert sip_hash_2_4(b, k0, k1) == want, f"len {len(b)}"


def test_published_canonical_vectors():
    # murmur2 family: seed-0 empty input is the zero fixed point
    assert murmur2_32(b"") == 0
    assert murmur2_64a(b"") == 0
    # XXH3_64bits(""): canonical value from the xxHash spec
    assert xxh3_64(b"") == 0x2D06800538D394C2
    # wyhash final v3: the ClickHouse docs example for wyHash64
    assert wy_hash64(b"ClickHouse") == 12336419557878201794
    # SipHash-2-4 reference vector (Aumasson-Bernstein paper, appendix):
    # key 000102..0f, input 000102..0e -> 0xa129ca6149be45e5
    key0 = 0x0706050403020100
    key1 = 0x0F0E0D0C0B0A0908
    assert sip_hash_2_4(bytes(range(15)), key0, key1) == 0xA129CA6149BE45E5


def test_spec_transcribed_kernels_cover_all_branches():
    # metro/wy/xxh3 have no in-container independent reference
    # (NON_BIT_COMPATIBLE documents this); lock today's outputs so any
    # refactor that changes bytes is caught
    for b in _cases(5):
        for fn in (metro_hash64, wy_hash64, xxh3_64):
            h = fn(b)
            assert 0 <= h < 1 << 64
    assert "metroHash64" in NON_BIT_COMPATIBLE
    assert "xxh3" in NON_BIT_COMPATIBLE
    assert "sipHash64" not in NON_BIT_COMPATIBLE
    # regression-pin one vector per kernel (computed by these kernels
    # at r13; any silent change to constants/rotations breaks these)
    assert metro_hash64(b"1-URGENT") == 9085770967019194177
    assert wy_hash64(b"1-URGENT") == 1863703016567473937
    assert xxh3_64(b"1-URGENT") == 6974033431943394111


def test_column_builders_end_to_end(spark):
    rows = (
        spark.createDataFrame([("1-URGENT",)], ["pri"])
        .select(
            ch_expr("murmurHash2_32", F.col("pri")).alias("m232"),
            ch_expr("murmurHash2_64", F.col("pri")).alias("m264"),
            ch_expr("gccMurmurHash", F.col("pri")).alias("gcc"),
            ch_expr("murmurHash3_64", F.col("pri")).alias("m364"),
            F.hex(ch_expr("murmurHash3_128", F.col("pri"))).alias("m3128"),
            ch_expr("sipHash64", F.col("pri")).alias("sip"),
            ch_expr("farmFingerprint64", F.col("pri")).alias("farm"),
        )
        .first()
    )
    b = b"1-URGENT"
    assert rows["m232"] == murmur2_32(b)
    s64 = lambda v: v - (1 << 64) if v >= 1 << 63 else v  # noqa: E731
    assert rows["m264"] == s64(murmur2_64a(b))
    assert rows["gcc"] == s64(murmur2_64a(b, 0xC70F6907))
    h1, h2 = murmur3_x64_128(b)
    assert rows["m364"] == s64(h1 ^ h2)
    assert rows["m3128"] == (
        h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
    ).hex().upper()
    assert rows["sip"] == s64(sip_hash_2_4(b))
    assert rows["farm"] == s64(farm_fingerprint64(b))
