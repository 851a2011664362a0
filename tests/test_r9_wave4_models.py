"""Round-9 wave-4 behavior tests vs pure-Python references, plus the
rank-interval bucket-math property behind equi_depth_histogram and
quantile_treatment_effect."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark_rows():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from clickhouse_objects_analysis_spark.queries import QUERIES
    from clickhouse_objects_analysis_spark.session import get_spark

    spark = get_spark("tests")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def _q6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def test_qte_matches_sorted_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT user_id % 2, value FROM '{SF}/events.parquet'"
    ).fetchall()
    arms = defaultdict(list)
    for v, x in rows:
        arms[int(v)].append(x)
    for xs in arms.values():
        xs.sort()
    got = {r["decile"]: r for r in spark_rows("quantile_treatment_effect")}
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        qc = arms[0][math.ceil(d * len(arms[0]) / 10) - 1]
        qt = arms[1][math.ceil(d * len(arms[1]) / 10) - 1]
        r = got[d]
        assert r["q_control"] == qc and r["q_treat"] == qt
        assert r["qte"] == _q6(qt - qc)


def test_beta_posterior_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT user_id % 2, CASE WHEN value > 10 THEN 1 ELSE 0 END "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    s = {0: 0, 1: 0}
    n = {0: 0, 1: 0}
    for v, ok in rows:
        s[int(v)] += ok
        n[int(v)] += 1

    def post(v):
        a, b = 1.0 + s[v], 1.0 + n[v] - s[v]
        return a / (a + b), a * b / ((a + b) ** 2 * (a + b + 1))

    m0, v0 = post(0)
    m1, v1 = post(1)
    [r] = spark_rows("bayes_beta_posterior_ab")
    assert (r["s_control"], r["n_control"]) == (s[0], n[0])
    assert r["mean_control"] == _q6(m0)
    assert r["mean_treat"] == _q6(m1)
    assert r["z_treat_minus_control"] == _q6((m1 - m0) / math.sqrt(v0 + v1))


def test_segment_uplift_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT event_type, user_id % 2, "
        f"CASE WHEN value > 10 THEN 1 ELSE 0 END "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    s = defaultdict(int)
    n = defaultdict(int)
    for et, v, ok in rows:
        s[(et, int(v))] += ok
        n[(et, int(v))] += 1
    got = {r["event_type"]: r for r in spark_rows("segment_uplift_table")}
    for et in {k[0] for k in n}:
        r = got[et]
        r0 = s[(et, 0)] / n[(et, 0)]
        r1 = s[(et, 1)] / n[(et, 1)]
        pp = (s[(et, 0)] + s[(et, 1)]) / (n[(et, 0)] + n[(et, 1)])
        z = (r1 - r0) / math.sqrt(
            pp * (1 - pp) * (1 / n[(et, 0)] + 1 / n[(et, 1)])
        )
        assert r["uplift"] == _q6(r1 - r0)
        assert r["z_pooled"] == _q6(z)


def test_char_class_profile_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for src, t in rows:
        a = agg[src]
        a[0] += len(t)
        a[1] += sum(1 for c in t if "a" <= c <= "z")
        a[2] += sum(1 for c in t if c.isdigit())
        a[3] += t.count(" ")
    got = {r["source"]: r for r in spark_rows("char_class_profile")}
    assert set(got) == set(agg)
    for src, (nc, na, nd, ns) in agg.items():
        r = got[src]
        assert (r["n_chars"], r["n_alpha"], r["n_digit"], r["n_space"]) == (
            nc, na, nd, ns,
        )
        assert r["n_other"] == nc - na - nd - ns
        assert r["alpha_ratio"] == _q6(na / nc)


@settings(max_examples=200, deadline=None)
@given(n=st.integers(1, 10_000_000), buckets=st.integers(1, 64))
def test_rank_interval_bucket_math(n, buckets):
    """The exact-integer bucket boundaries used by equi_depth_histogram:
    bucket b covers ranks [ceil(b·n/B)+1, ceil((b+1)·n/B)] — the ranges
    must partition 1..n exactly (no rank lost or double-counted) and
    bucket sizes must differ by at most 1 ... they equal the row-level
    floor((r-1)·B/n) assignment by construction."""
    prev_hi = 0
    for b in range(buckets):
        lo = (b * n + buckets - 1) // buckets + 1
        hi = ((b + 1) * n + buckets - 1) // buckets
        assert lo == prev_hi + 1
        prev_hi = hi
        if hi >= lo:
            # every rank in [lo, hi] maps back to bucket b
            assert (lo - 1) * buckets // n == b
            assert (hi - 1) * buckets // n == b
    assert prev_hi == n
