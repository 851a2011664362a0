"""Round-10 wave-2 behavior tests vs pure-Python references — the HLL
sketch, conformal calibration, Hill estimator, and Kish ESS recomputed
independently from the raw parquet rows."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark_rows():
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from clickhouse_objects_analysis_spark.queries import QUERIES
    from clickhouse_objects_analysis_spark.session import get_spark

    spark = get_spark("tests")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def _q6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def _wang32(x: int) -> int:
    m = 0xFFFFFFFF
    h = x & m
    h = ((m - h) + (h << 15)) & m
    h ^= h >> 12
    h = (h + (h << 2)) & m
    h ^= h >> 4
    h = (h * 2057) & m
    h ^= h >> 16
    return h


def test_hll_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT l_returnflag, l_orderkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    M, P, WBITS = 64, 6, 26
    regs: dict[str, dict[int, int]] = defaultdict(dict)
    exact: dict[str, set] = defaultdict(set)
    for flag, ok in rows:
        exact[flag].add(ok)
        h = _wang32(ok)
        b, w = h & (M - 1), h >> P
        rho = WBITS + 1 if w == 0 else WBITS - w.bit_length() + 1
        regs[flag][b] = max(regs[flag].get(b, 0), rho)
    got = {r["grp"]: r for r in spark_rows("hll_distinct_audit")}
    assert set(got) == set(regs)
    alpha = 0.7213 / (1.0 + 1.079 / M)
    for flag, rg in regs.items():
        s = sum(1.0 / (1 << r) for r in rg.values()) + (M - len(rg))
        e = alpha * M * M / s
        if e <= 2.5 * M and len(rg) < M:
            e = M * math.log(M / (M - len(rg)))
        r = got[flag]
        assert r["exact_distinct"] == len(exact[flag])
        assert r["registers_hit"] == len(rg)
        assert r["hll_estimate"] == pytest.approx(_q6(e), abs=1e-9)
        # the m=64 standard error is ~1.04/sqrt(64) = 13%; allow 4 sigma
        assert abs(r["rel_error"]) < 0.52


def test_conformal_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT event_type, value, day(ts) FROM '{SF}/events.parquet'"
    ).fetchall()
    tr = defaultdict(lambda: [0, 0])
    for t, v, d in rows:
        if d <= 15:
            vc = math.floor(v * 100 + 0.5)
            tr[t][0] += vc
            tr[t][1] += 1
    got = {
        r["event_type"]: r
        for r in spark_rows("conformal_interval_calibration")
    }
    assert set(got) == set(tr)
    for t in tr:
        s, n = tr[t]
        mean = s / (100.0 * n)
        cal = sorted(
            abs(math.floor(v * 100 + 0.5) / 100.0 - mean)
            for tt, v, d in rows
            if tt == t and 16 <= d <= 23
        )
        k = math.ceil(0.9 * (len(cal) + 1))
        q_hat = cal[k - 1]
        test = [
            abs(math.floor(v * 100 + 0.5) / 100.0 - mean)
            for tt, v, d in rows
            if tt == t and d >= 24
        ]
        cov = sum(r <= q_hat for r in test) / len(test)
        r = got[t]
        assert r["predicted"] == pytest.approx(_q6(mean), abs=1e-9)
        assert r["q_hat"] == pytest.approx(_q6(q_hat), abs=1e-9)
        assert (r["n_cal"], r["n_test"]) == (len(cal), len(test))
        assert r["coverage"] == pytest.approx(_q6(cov), abs=1e-9)
        # split-conformal marginal guarantee: coverage ≥ 0.9 minus
        # finite-sample slack (loose bound for the model check)
        assert r["coverage"] > 0.8


def test_hill_reference(spark_rows):
    vals = [
        v
        for (v,) in duckdb.sql(
            f"SELECT n_chars FROM '{SF}/documents.parquet' "
            "ORDER BY n_chars DESC, doc_id LIMIT 201"
        ).fetchall()
    ]
    k, xk = 200, vals[200]
    s_nano = sum(
        math.floor(math.log(v / xk) * 1e9 + 0.5) for v in vals[:200]
    )
    alpha = k / (s_nano / 1e9)
    [r] = spark_rows("hill_tail_index")
    assert (r["k"], r["x_k"]) == (k, xk)
    assert r["alpha_hill"] == pytest.approx(_q6(alpha), abs=1e-9)
    assert r["alpha_se"] == pytest.approx(
        _q6(alpha / math.sqrt(k)), abs=1e-9
    )
    assert r["alpha_hill"] > 0


def test_kish_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT source, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0])
    for s, w in rows:
        a = agg[s]
        a[0] += 1
        a[1] += w
        a[2] += w * w
    got = {r["source"]: r for r in spark_rows("kish_effective_sample_size")}
    assert set(got) == set(agg)
    for s, (n, sw, sww) in agg.items():
        n_eff = sw * sw / sww
        r = got[s]
        assert r["n"] == n
        assert r["n_eff"] == pytest.approx(_q6(n_eff), abs=1e-9)
        assert r["design_effect"] == pytest.approx(_q6(n / n_eff), abs=1e-9)
        assert r["weight_cv"] == pytest.approx(
            _q6(math.sqrt(n * sww / (sw * sw) - 1.0)), abs=1e-9
        )
        # Kish inequality: 1 ≤ n_eff ≤ n (equality iff uniform weights)
        assert 1.0 <= r["n_eff"] <= n + 1e-9
