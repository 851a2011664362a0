"""Hypothesis-driven randomized properties for the custom operators
(SURVEY §5: the reference has no property-based testing; the rebuild
does). Each example round-trips through Spark, so example counts are kept
small and deadlines disabled — the value is adversarial input shapes
(duplicates, empty groups, boundary values), not volume."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_objects_analysis_spark.operators.joins import range_join
from clickhouse_objects_analysis_spark.operators.limits import (
    limit_by,
    limit_with_ties,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

points_st = st.lists(
    st.integers(min_value=-20, max_value=20), min_size=0, max_size=12
)
intervals_st = st.lists(
    st.tuples(
        st.integers(min_value=-20, max_value=20),
        st.integers(min_value=0, max_value=15),
    ),
    min_size=0,
    max_size=8,
)


@given(pts=points_st, ivs=intervals_st, width=st.sampled_from([1, 4, 9]))
@settings(**_SETTINGS)
def test_range_join_inner_matches_brute_force(spark, pts, ivs, width):
    if not pts or not ivs:
        return
    p_df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(pts)], "pid int, x int"
    )
    i_df = spark.createDataFrame(
        [(j, lo, lo + span) for j, (lo, span) in enumerate(ivs)],
        "iid int, lo int, hi int",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(p_df, i_df, "x", "lo", "hi", width).collect()
    }
    want = {
        (i, j)
        for i, x in enumerate(pts)
        for j, (lo, span) in enumerate(ivs)
        if lo <= x < lo + span
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group
            st.integers(min_value=-50, max_value=50),  # value
        ),
        min_size=0,
        max_size=25,
    ),
    n=st.integers(min_value=1, max_value=4),
    offset=st.integers(min_value=0, max_value=2),
)
@settings(**_SETTINGS)
def test_limit_by_matches_per_group_slice(spark, rows, n, offset):
    if not rows:
        return
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], "g int, v int, uid int"
    )
    got = sorted(
        (r.g, r.v, r.uid)
        for r in limit_by(df, ["g"], ["v", "uid"], n, offset=offset).collect()
    )
    want = []
    by_group: dict[int, list] = {}
    for i, (g, v) in enumerate(rows):
        by_group.setdefault(g, []).append((v, i))
    for g, vs in by_group.items():
        for v, i in sorted(vs)[offset : offset + n]:
            want.append((g, v, i))
    assert got == sorted(want)


@given(
    vals=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=20),
    n=st.integers(min_value=1, max_value=5),
)
@settings(**_SETTINGS)
def test_limit_with_ties_keeps_full_tie_groups(spark, vals, n):
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    got = sorted(r.v for r in limit_with_ties(df, ["v"], n).collect())
    s = sorted(vals)
    if len(s) <= n:
        want = s
    else:
        cutoff = s[n - 1]
        want = [v for v in s if v <= cutoff]
    assert got == want


# ---- round-4 sweep-line / scrub properties ----

_iv_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),   # start
        st.integers(min_value=1, max_value=10),   # length
    ),
    min_size=1,
    max_size=10,
)


@given(ivs=_iv_sets)
@settings(**_SETTINGS)
def test_max_concurrency_sweep_matches_brute_force(spark, ivs):
    """The windowed ±1 sweep (max_intersections' core) must equal the
    brute-force point-wise maximum over half-open intervals."""
    from pyspark.sql import Window

    rows = [(i, lo, lo + ln) for i, (lo, ln) in enumerate(ivs)]
    df = spark.createDataFrame(rows, "event_id long, lo long, hi long")
    pts = df.select(
        F.col("lo").alias("t"), F.lit(1).alias("d"), "event_id"
    ).unionAll(
        df.select(F.col("hi").alias("t"), F.lit(-1).alias("d"), "event_id")
    )
    w = Window.orderBy("t", "d", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    got = (
        pts.select(F.sum("d").over(w).alias("c"))
        .agg(F.max("c"))
        .collect()[0][0]
    )
    brute = max(
        sum(1 for lo, ln in ivs if lo <= t < lo + ln)
        for t in range(0, 45)
    )
    assert got == brute


_doc_words = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f"]),
    min_size=0,
    max_size=12,
)


@given(docs=st.lists(_doc_words, min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_scrub_invariants(spark, docs):
    """scrub_boilerplate_spans invariants on random corpora: kept text
    is a subsequence of the original, n_removed is consistent, and a
    document with no df>=2 5-gram survives untouched."""
    from clickhouse_objects_analysis_spark.queries.llm_wave6 import (
        scrub_boilerplate_spans,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in scrub_boilerplate_spans(
            df, "doc_id", "text", ngram=5, min_df=2
        ).collect()
    }
    from collections import Counter

    grams = Counter()
    for ws in docs:
        for seen_in_doc in ({tuple(ws[i:i + 5])
                             for i in range(len(ws) - 4)},):
            grams.update(seen_in_doc)
    frequent = {g for g, c in grams.items() if c >= 2}
    for i, ws in enumerate(docs):
        out = got[i]["scrubbed_text"].split(" ") if got[i][
            "scrubbed_text"
        ] else []
        assert got[i]["n_removed"] == len(ws) - len(out)
        # kept tokens are a subsequence of the original
        it = iter(ws)
        assert all(any(w == x for x in it) for w in out)
        if not any(tuple(ws[j:j + 5]) in frequent
                   for j in range(len(ws) - 4)):
            assert out == ws  # untouched when no frequent span


# ---------------------------------------------------------------------------
# Multimodal codec kernels (pure Python — the mapInPandas plumbing is
# covered by the oracle parity queries; here the encode/decode pair is
# fuzzed over arbitrary document lengths).

@given(st.text(max_size=400))
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_fuzz(text):
    from clickhouse_objects_analysis_spark.operators.multimodal import (
        _build_wav,
        _decode_wav,
    )

    n = len(text.encode("utf-8"))
    ns, k = 64 + n % 256, 1 + n % 7
    vals = [((i * k) % 200 - 100) * 100 for i in range(ns)]
    got = _decode_wav(_build_wav(n))
    assert got == (
        ns, 8000, 1,
        max(abs(v) for v in vals), sum(abs(v) for v in vals),
    )


@given(st.text(max_size=400))
@settings(max_examples=60, deadline=None)
def test_avi_roundtrip_fuzz(text):
    """Every synthesized AVI must decode to the geometry arithmetic —
    the parser cross-checks avih, strh, and the movi chunk count on
    every example, so any header inconsistency the builder could emit
    becomes a failure here."""
    from clickhouse_objects_analysis_spark.operators.multimodal import (
        _avi_geometry,
        _build_avi,
        _decode_avi,
    )

    n = len(text.encode("utf-8"))
    w, h, nf = _avi_geometry(n)
    assert _decode_avi(_build_avi(n)) == (nf, w, h, 40000, nf * w * h * 3)
