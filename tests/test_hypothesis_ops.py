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
