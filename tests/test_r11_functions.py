"""r11 unsupported-tail promotions (functions/ch.py): punycode/IDNA
codecs, byte-level UTF-8 validation/repair, 4-gram distance/search,
and the scalar shims (addInterval, toStringCutToZero, timeZone,
toLowCardinality). Kernel-level ground truth is the Python stdlib
reference codec / hand-computed gram arithmetic."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clickhouse_objects_analysis_spark.functions.ch import (
    _py_idna_decode,
    _py_idna_encode,
    _py_ngram_distance,
    _py_ngram_search,
    _py_punycode_decode,
    _py_punycode_encode,
    ch_expr,
)


def test_punycode_idna_kernels_pure():
    assert _py_punycode_encode("München") == "Mnchen-3ya"
    assert _py_punycode_decode("Mnchen-3ya") == "München"
    assert _py_punycode_decode("ÿ") is None  # non-ascii input
    assert _py_idna_encode("bücher.example") == "xn--bcher-kva.example"
    assert _py_idna_encode("straße.de") == "strasse.de"  # lossy ß→ss
    assert _py_idna_decode("xn--mnchen-3ya.de") == "münchen.de"
    assert _py_idna_encode("") == ""
    # label too long -> codec error -> NULL channel
    assert _py_idna_encode("ü" * 200 + ".de") is None


def test_ngram_kernels_pure():
    # identical strings: zero distance, full search hit
    assert _py_ngram_distance("ABCDEF", "ABCDEF") == 0.0
    assert _py_ngram_search("ABCDEF", "ABCDEF") == 1.0
    # disjoint grams: distance 1
    assert _py_ngram_distance("AAAA", "BBBB") == 1.0
    assert _py_ngram_search("AAAA", "BBBB") == 0.0
    # hand-computed: 'ABCDE' grams {ABCD, BCDE}; 'BCDEF' grams
    # {BCDE, CDEF}: symdiff 2, total 4; needle hits 1/2
    assert _py_ngram_distance("ABCDE", "BCDEF") == 0.5
    assert _py_ngram_search("ABCDE", "BCDEF") == 0.5
    # multiset counting: 'AAAAA' has gram AAAA x2
    assert _py_ngram_search("AAAAA", "AAAA") == 1.0
    assert _py_ngram_distance("AAAAA", "AAAA") == pytest.approx(1 / 3)
    # short strings -> empty gram sets
    assert _py_ngram_distance("ab", "ab") == 0.0
    assert _py_ngram_search("ABCDEF", "ab") == 0.0
    # byte grams, not char grams: é is 2 bytes
    assert _py_ngram_distance("ééé", "ééé") == 0.0


def test_promoted_scalars_end_to_end(spark):
    df = spark.range(1)
    r = df.select(
        ch_expr(
            "addInterval",
            F.lit("2024-03-01 10:00:00").cast("timestamp"),
            F.expr("INTERVAL 90 MINUTES"),
        ).cast("string").alias("ai"),
        ch_expr(
            "toStringCutToZero", F.lit("abc\x00def\x00g")
        ).alias("cut"),
        ch_expr("timeZone").alias("tz"),
        ch_expr("toLowCardinality", F.lit("x")).alias("lc"),
        ch_expr("isValidUTF8", F.unhex(F.lit("41FF"))).alias("bad"),
        ch_expr("isValidUTF8", F.lit("plain")).alias("good"),
        ch_expr("toValidUTF8", F.unhex(F.lit("41FF42"))).alias("fixed"),
        ch_expr("punycodeEncode", F.lit("héllo")).alias("pe"),
        ch_expr("idnaDecode", F.lit("xn--bcher-kva.example")).alias("idd"),
        ch_expr("ngramDistance", F.lit("ABCDE"), F.lit("BCDEF")).alias(
            "ngd"
        ),
    ).collect()[0]
    assert r["ai"] == "2024-03-01 11:30:00"
    assert r["cut"] == "abc"
    assert r["tz"] == "UTC"
    assert r["lc"] == "x"
    assert r["bad"] == 0 and r["good"] == 1
    assert r["fixed"] == "A�B"
    assert r["pe"] == "hllo-bpa"
    assert r["idd"] == "bücher.example"
    assert r["ngd"] == 0.5
