"""Round-7 wave 12: the audit's final "unclaimed" scalar harvest —
first-occurrence replaces (literal + regex, with backreferences),
XML-entity encoding, codepoint-safe reverse, formatReadableTimeDelta's
English duration rendering, and unbin's bit-text decode. All
expectations hand-computed against the documented ClickHouse behavior;
the oracled end-to-end slice is `ch_r7_function_surface_5`."""

from __future__ import annotations

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import ch_expr


def test_w12_first_occurrence_replaces(spark):
    r = (
        spark.range(1)
        .select(
            ch_expr("replaceOne", F.lit("aXbXc"), "X", "_").alias("r1"),
            ch_expr("replaceOne", F.lit("abc"), "Z", "_").alias("r1_miss"),
            ch_expr("replaceOne", F.lit("XX"), "X", "YY").alias("r1_grow"),
            ch_expr("replaceRegexpOne", F.lit("a1b22c"), r"\d+", "#").alias(
                "rr"
            ),
            ch_expr(
                "replaceRegexpOne", F.lit("a1b22c"), r"(\d+)b", "[$1]"
            ).alias("rr_backref"),
            ch_expr("replaceRegexpOne", F.lit("abc"), r"x+", "#").alias(
                "rr_miss"
            ),
            # zero-length first match inserts at the front, like Java's
            # replaceFirst
            ch_expr("replaceRegexpOne", F.lit("abc"), r"z*", "#").alias(
                "rr_empty"
            ),
            # $-anchored pattern: the prefix cut preserves the anchor
            # position (prefix ends exactly at the match end)
            ch_expr("replaceRegexpOne", F.lit("aba"), r"a$", "#").alias(
                "rr_anchor"
            ),
        )
        .first()
    )
    assert r.r1 == "a_bXc"
    assert r.r1_miss == "abc"
    assert r.r1_grow == "YYX"
    assert r.rr == "a#b22c"
    assert r.rr_backref == "a[1]22c"
    assert r.rr_miss == "abc"
    assert r.rr_empty == "#abc"
    assert r.rr_anchor == "ab#"


def test_w12_xml_reverse(spark):
    r = (
        spark.range(1)
        .select(
            ch_expr(
                "encodeXMLComponent", F.lit("<a href=\"x\">&'y'</a>")
            ).alias("xml"),
            # '&' escapes first — no double-escape of produced entities
            ch_expr("encodeXMLComponent", F.lit("&lt;")).alias("amp_first"),
            ch_expr("reverseUTF8", F.lit("abc")).alias("rev"),
        )
        .first()
    )
    assert r.xml == (
        "&lt;a href=&quot;x&quot;&gt;&amp;&apos;y&apos;&lt;/a&gt;"
    )
    assert r.amp_first == "&amp;lt;"
    assert r.rev == "cba"


def test_w12_format_readable_time_delta(spark):
    year, month = 31536000, 2635200
    r = (
        spark.range(1)
        .select(
            ch_expr("formatReadableTimeDelta", F.lit(7322)).alias("hms"),
            ch_expr("formatReadableTimeDelta", F.lit(1)).alias("one"),
            ch_expr("formatReadableTimeDelta", F.lit(0)).alias("zero"),
            ch_expr("formatReadableTimeDelta", F.lit(61)).alias("ms"),
            ch_expr("formatReadableTimeDelta", F.lit(120)).alias("flat"),
            ch_expr(
                "formatReadableTimeDelta",
                F.lit(year + month + 86400 + 3661),
            ).alias("full"),
        )
        .first()
    )
    assert r.hms == "2 hours, 2 minutes and 2 seconds"
    assert r.one == "1 second"
    assert r.zero == "0 seconds"
    assert r.ms == "1 minute and 1 second"
    assert r.flat == "2 minutes"
    assert r.full == (
        "1 year, 1 month, 1 day, 1 hour, 1 minute and 1 second"
    )


def test_w12_unbin(spark):
    r = (
        spark.range(1)
        .select(
            ch_expr("unbin", F.lit("01000001")).alias("u1"),
            # 7-bit input: first group left-pads to a byte
            ch_expr("unbin", F.lit("1000010")).alias("u2"),
            ch_expr("unbin", F.lit("0100000101000010")).alias("u3"),
            ch_expr("unbin", F.lit("")).alias("u4"),
            ch_expr("unbin", F.bin(F.lit(16706))).alias("u5"),
        )
        .first()
    )
    assert r.u1 == "A"
    assert r.u2 == "B"
    assert r.u3 == "AB"
    assert r.u4 == ""
    assert r.u5 == "AB"


def test_w12_gd_logistic_step(spark):
    """One hand-computed softsign-logistic gradient step: rows
    (x=1, y=1), (x=2, y=0) from w=b=0 give p=500000 each, residuals
    ∓500000, gw=+500000, gb=0, so w ← 0 − floor(500000/128) = −3906."""
    from clickhouse_objects_analysis_spark.queries.r7_wave3 import _gdl_step

    fact = spark.createDataFrame(
        [(1, 1000000), (2, 0)], "x long, ymicro long"
    )
    state = spark.range(1).select(
        F.lit(0).cast("long").alias("w"), F.lit(0).cast("long").alias("b")
    )
    r = _gdl_step(fact, state).first()
    assert (r.w, r.b, r.n) == (-3906, 0, 2)


def test_w12_replace_regexp_one_fuzz(spark):
    """Seeded fuzz of replaceRegexpOne against Python's
    re.sub(count=1) over a Java/Python-common pattern subset (literals,
    classes, quantifiers, groups, alternation, anchors) — 300 random
    strings x 8 pattern shapes in one Spark job."""
    import random
    import re as _re

    from clickhouse_objects_analysis_spark.functions.ch import ch_expr

    # (pattern, java_repl, python_repl)
    shapes = [
        ("a", "#", "#"),
        ("b+", "<>", "<>"),
        ("[ab]c", "#", "#"),
        ("(a)(b)", "$2$1", r"\2\1"),
        ("a|cb", "#", "#"),
        ("c*", "#", "#"),
        ("ab$", "#", "#"),
        ("^a", "#", "#"),
    ]
    rng = random.Random(1207)
    strings = [
        "".join(rng.choice("abc") for _ in range(rng.randrange(0, 9)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    cols = [
        ch_expr("replaceRegexpOne", F.col("s"), pat, jrepl).alias(f"c{i}")
        for i, (pat, jrepl, _) in enumerate(shapes)
    ]
    rows = df.select("s", *cols).collect()
    for r in rows:
        for i, (pat, _, prepl) in enumerate(shapes):
            want = _re.sub(pat, prepl, r.s, count=1)
            assert r[f"c{i}"] == want, (r.s, pat, r[f"c{i}"], want)


def test_w12_replace_one_fuzz(spark):
    """replaceOne against str.replace(..., 1) on random needles."""
    import random

    from clickhouse_objects_analysis_spark.functions.ch import ch_expr

    rng = random.Random(11)
    cases = []
    for _ in range(300):
        s = "".join(rng.choice("abxy") for _ in range(rng.randrange(0, 10)))
        needle = "".join(
            rng.choice("abxy") for _ in range(rng.randrange(1, 4))
        )
        cases.append((s, needle))
    df = spark.createDataFrame(cases, "s string, nd string")
    rows = df.select(
        "s",
        "nd",
        ch_expr("replaceOne", F.col("s"), F.col("nd"), F.lit("+Z+")).alias(
            "got"
        ),
    ).collect()
    for r in rows:
        assert r.got == r.s.replace(r.nd, "+Z+", 1), (r.s, r.nd, r.got)


def _py_frtd(sec: int) -> str:
    parts = []
    rem = sec
    for unit, size in (
        ("year", 31536000),
        ("month", 2635200),
        ("day", 86400),
        ("hour", 3600),
        ("minute", 60),
        ("second", 1),
    ):
        n, rem = divmod(rem, size)
        if n > 0:
            parts.append(f"{n} {unit}" + ("" if n == 1 else "s"))
    if not parts:
        return "0 seconds"
    if len(parts) == 1:
        return parts[0]
    return ", ".join(parts[:-1]) + " and " + parts[-1]


def test_w12_frtd_fuzz(spark):
    """formatReadableTimeDelta against the Python ladder reference on
    random + boundary-adjacent second counts."""
    import random

    from clickhouse_objects_analysis_spark.functions.ch import ch_expr

    rng = random.Random(99)
    vals = sorted(
        {rng.randrange(0, 200_000_000) for _ in range(200)}
        | {0, 1, 59, 60, 61, 3599, 3600, 86399, 86400,
           2635199, 2635200, 31535999, 31536000}
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select(
        "v", ch_expr("formatReadableTimeDelta", F.col("v")).alias("got")
    ).collect()
    for r in rows:
        assert r.got == _py_frtd(r.v), (r.v, r.got)


def test_w12_unbin_fuzz(spark):
    """unbin against the Python chunk-and-chr reference on random bit
    strings (1-3 bytes, leading zeros sometimes stripped to exercise
    the first-group pad)."""
    import random

    from clickhouse_objects_analysis_spark.functions.ch import ch_expr

    def py_unbin(bits: str) -> str:
        if not bits:
            return ""
        pad = (-len(bits)) % 8
        bits = "0" * pad + bits
        return "".join(
            chr(int(bits[i : i + 8], 2)) for i in range(0, len(bits), 8)
        )

    rng = random.Random(5)
    cases = set()
    for _ in range(250):
        nb = rng.randrange(1, 4)
        bits = "".join(
            format(rng.randrange(32, 127), "08b") for _ in range(nb)
        )
        if rng.random() < 0.5:
            bits = bits.lstrip("0")
        cases.add(bits)
    df = spark.createDataFrame([(b,) for b in sorted(cases)], "b string")
    rows = df.select(
        "b", ch_expr("unbin", F.col("b")).alias("got")
    ).collect()
    for r in rows:
        assert r.got == py_unbin(r.b), (r.b, r.got)
