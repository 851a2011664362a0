"""Round-10 wave-5 function promotions: the Porter stemmer against the
canonical vector set from the published algorithm, and the Unicode
normalization forms against stdlib-independent codepoint expectations
plus the standard invariants (idempotence, NFC∘NFD identity)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clickhouse_objects_analysis_spark.functions.ch import ch_expr
from clickhouse_objects_analysis_spark.functions.porter import porter_stem

#: Canonical Porter behavior: the step-by-step examples from the 1980
#: paper, run through the FULL algorithm (so e.g. 'agreed' ends 'agre'
#: after step 5a, 'relational' ends 'relat' after step 4).
VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed",
    "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop",
    "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_vectors():
    bad = {
        w: (porter_stem(w), want)
        for w, want in VECTORS.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_porter_guards():
    # length <= 2 unchanged (the paper's guard); stems never grow
    assert porter_stem("is") == "is"
    assert porter_stem("a") == "a"
    for w in VECTORS:
        assert len(porter_stem(w)) <= len(w), w
    # NOT idempotent by design: the paper's algorithm re-stems its own
    # output differently in places (agree -> agre -> agr); pin one such
    # case so nobody "fixes" it into divergence from the spec
    assert porter_stem("agreed") == "agre"
    assert porter_stem("agre") == "agr"


def test_stem_rejects_unknown_language(spark):
    with pytest.raises(ValueError):
        ch_expr("stem", "de", F.lit("laufen"))
    with pytest.raises(ValueError):
        ch_expr("stem", F.lit("en"), F.lit("running"))


def test_normalization_forms(spark):
    # composed / compat characters with stdlib-independent expectations:
    # NFD decomposes \u00e9 -> e+U+0301; NFKC folds U+FB01 -> 'fi' and
    # U+00B2 -> '2'; NFKD expands U+00BD -> '1' U+2044 '2'; NFC
    # recomposes the NFD output back to the precomposed form. All
    # literals are explicit escapes: composed and decomposed forms are
    # visually identical in source text.
    row = (
        spark.range(1)
        .select(
            ch_expr("normalizeUTF8NFD", F.lit("caf\u00e9")).alias("nfd"),
            ch_expr(
                "normalizeUTF8NFKC", F.lit("\ufb01le\u00b2")
            ).alias("nfkc"),
            ch_expr(
                "normalizeUTF8NFKD", F.lit("\u00bd\u00e9")
            ).alias("nfkd"),
            ch_expr(
                "normalizeUTF8NFC",
                ch_expr("normalizeUTF8NFD", F.lit("\u00c5\u00e9")),
            ).alias("roundtrip"),
        )
        .first()
    )
    assert row["nfd"] == "cafe\u0301"
    assert row["nfkc"] == "file2"
    assert row["nfkd"] == "1\u20442e\u0301"
    assert row["roundtrip"] == "\u00c5\u00e9"


def test_porter_fuzz_invariants():
    """Random lowercase words: the stemmer must never crash, never grow
    a word, always emit lowercase ASCII, and respect the length-2
    guard — the structural envelope the 73 vectors can't cover."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        w=st.text(
            alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz"),
            min_size=0,
            max_size=24,
        )
    )
    @settings(max_examples=300, deadline=None)
    def check(w):
        out = porter_stem(w)
        assert len(out) <= len(w)
        assert out.isascii()
        assert out == out.lower()
        if len(w) <= 2:
            assert out == w

    check()
