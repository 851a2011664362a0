"""r13 band-2 promotions: AES family validated against the published
FIPS-197 / NIST SP 800-38A known-answer vectors (the cipher runs
JVM-side via Spark's aes_encrypt; these tests pin the CH
output-layout adaptation — PKCS#7, iv-prefix strip, MySQL key fold),
MD4 against the RFC 1320 test suite, plus the Joda trio, formatRow,
and introspection contracts."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clickhouse_objects_analysis_spark.functions.ch import (
    NON_BIT_COMPATIBLE,
    _mysql_fold_key,
    ch_expr,
)
from clickhouse_objects_analysis_spark.functions.hash_kernels import md4

# FIPS-197 appendix C.1: AES-128, key 000102...0f,
# plaintext 00112233445566778899aabbccddeeff
_FIPS_KEY = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
_FIPS_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_FIPS_CT = "69C4E0D86A7B0430D8CDB78070B4C55A"

# NIST SP 800-38A F.2.1: AES-128-CBC, key 2b7e1516..., iv 000102...,
# first plaintext block 6bc1bee2... -> 7649abac...
_NIST_KEY = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
_NIST_IV = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
_NIST_PT = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
_NIST_CT = "7649ABAC8119B246CEE98E9B12E9197D"


def test_aes_known_answer_vectors(spark):
    row = (
        spark.range(1)
        .select(
            F.hex(
                ch_expr("encrypt", "aes-128-ecb", F.lit(_FIPS_PT), F.lit(_FIPS_KEY))
            ).alias("ecb"),
            F.hex(
                ch_expr(
                    "encrypt", "aes-128-cbc", F.lit(_NIST_PT),
                    F.lit(_NIST_KEY), F.lit(_NIST_IV),
                )
            ).alias("cbc"),
        )
        .first()
    )
    # PKCS#7 appends one full padding block to exact-block inputs;
    # the FIRST 16 bytes must equal the published vector
    assert row["ecb"][:32] == _FIPS_CT
    assert len(row["ecb"]) == 64  # 2 blocks: data + padding
    assert row["cbc"][:32] == _NIST_CT


def test_aes_ch_output_layout(spark):
    key = bytes(range(16))
    iv = bytes(range(16))
    row = (
        spark.range(1)
        .select(
            F.length(
                ch_expr("encrypt", "aes-128-gcm", F.lit(b"hello"),
                        F.lit(key), F.lit(iv[:12]))
            ).alias("gcm_len"),
            F.length(
                ch_expr("encrypt", "aes-128-cbc", F.lit(b"hello"),
                        F.lit(key), F.lit(iv))
            ).alias("cbc_len"),
            ch_expr(
                "decrypt", "aes-128-gcm",
                ch_expr("encrypt", "aes-128-gcm", F.lit(b"hello"),
                        F.lit(key), F.lit(iv[:12])),
                F.lit(key), F.lit(iv[:12]),
            ).cast("string").alias("rt"),
            ch_expr(
                "tryDecrypt", "aes-128-gcm", F.lit(b"x"),
                F.lit(key), F.lit(iv[:12]),
            ).alias("tryd"),
        )
        .first()
    )
    # CH GCM layout: ciphertext || 16-byte tag, NO iv prefix
    assert row["gcm_len"] == 5 + 16
    # CH CBC layout: PKCS#7-padded ciphertext only (5 -> 16 bytes)
    assert row["cbc_len"] == 16
    assert row["rt"] == "hello"
    assert row["tryd"] is None


def test_mysql_key_fold():
    # shorter key zero-pads; longer key XOR-wraps (MySQL semantics)
    assert _mysql_fold_key(b"abc", 16) == b"abc" + bytes(13)
    folded = _mysql_fold_key(b"0123456789abcdef0123", 16)
    want = bytearray(b"0123456789abcdef")
    for i, byte in enumerate(b"0123"):
        want[i] ^= byte
    assert folded == bytes(want)
    with pytest.raises(TypeError):
        _mysql_fold_key(F.lit(b"col"), 16)


def test_md4_rfc1320_suite():
    vectors = {
        b"": "31d6cfe0d16ae931b73c59d7e0c089c0",
        b"a": "bde52cb31de33e46245e05fbdbd6fb24",
        b"abc": "a448017aaf21d8525fc10ae87aa6729d",
        b"message digest": "d9130a8164549fe818874806e1c7014b",
        b"abcdefghijklmnopqrstuvwxyz": "d79e1c308aa5bbcdeea8ed63df412da9",
        b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789":
            "043f8582f241db351ce627e153e7f0e4",
        b"1234567890" * 8: "e33b4ddc9c38f2199c3e7b164fcc0536",
    }
    for msg, hexdigest in vectors.items():
        assert md4(msg).hex() == hexdigest, msg


def test_joda_trio_and_format_row(spark):
    row = (
        spark.range(1)
        .select(
            ch_expr(
                "formatDateTimeInJodaSyntax",
                F.lit("2024-05-01 12:34:56").cast("timestamp"),
                "yyyy/MM/dd HH:mm",
            ).alias("f"),
            ch_expr(
                "fromUnixTimestampInJodaSyntax", F.lit(0), "yyyy-MM-dd"
            ).alias("u"),
            ch_expr("formatRow", "CSV", F.lit('say "hi"'), F.lit(7)).alias(
                "csv"
            ),
            ch_expr(
                "formatRowNoNewline", "TSV",
                F.lit("a\tb"), F.lit(None).cast("int"),
            ).alias("tsv"),
        )
        .first()
    )
    assert row["f"] == "2024/05/01 12:34"
    assert row["u"] == "1970-01-01"
    assert row["csv"] == '"say ""hi""",7\n'
    assert row["tsv"] == "a\\tb\t\\N"
    with pytest.raises(ValueError):
        ch_expr("formatRow", "JSONEachRow", F.lit(1))


def test_detection_heuristics_are_nbc(spark):
    assert "detectLanguage" in NON_BIT_COMPATIBLE
    assert "detectCharset" in NON_BIT_COMPATIBLE
    row = (
        spark.range(1)
        .select(
            ch_expr(
                "detectLanguage", F.lit("el perro y el gato son amigos")
            ).alias("es"),
            ch_expr("detectCharset", F.lit(b"caf\xe9")).alias("w1252"),
        )
        .first()
    )
    assert row["es"] == "es"
    assert row["w1252"] == "WINDOWS-1252"
