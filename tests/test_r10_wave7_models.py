"""Round-10 wave-7 behavior tests vs pure-Python references — each query
recomputed independently (no SQL reuse) from the raw parquet rows."""

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


def test_lambda_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT o_totalprice, o_orderpriority FROM '{SF}/orders.parquet'"
    ).fetchall()
    grid = defaultdict(int)
    for price, pri in rows:
        grid[(min(int(price // 55000), 9), pri)] += 1
    rowmax = defaultdict(int)
    colsum = defaultdict(int)
    for (b, pri), n in grid.items():
        rowmax[b] = max(rowmax[b], n)
        colsum[pri] += n
    n = len(rows)
    srm = sum(rowmax.values())
    mc = max(colsum.values())
    (r,) = spark_rows("goodman_kruskal_lambda")
    assert (r["n"], r["sum_row_max"], r["max_col"]) == (n, srm, mc)
    assert r["lambda_gk"] == _q6((srm - mc) / (n - mc))
    assert 0.0 <= r["lambda_gk"] <= 1.0


def test_gamma_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT l_discount, l_quantity FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    grid = defaultdict(int)
    for disc, qty in rows:
        grid[(math.floor(disc * 100 + 0.5), min(int(qty // 5), 9))] += 1
    cells = list(grid.items())
    p = q = 0
    for i, ((x1, y1), n1) in enumerate(cells):
        for (x2, y2), n2 in cells:
            if x2 > x1 and y2 > y1:
                p += n1 * n2
            elif x2 > x1 and y2 < y1:
                q += n1 * n2
    (r,) = spark_rows("goodman_kruskal_gamma")
    assert (r["n"], r["concordant"], r["discordant"]) == (
        len(rows),
        p,
        q,
    )
    assert r["gamma"] == _q6((p - q) / (p + q))
    assert -1.0 <= r["gamma"] <= 1.0


def test_odds_ratio_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT n_chars, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    a = b = c = d = 0
    for nc, lang in rows:
        x = nc >= 300
        y = lang == "en"
        a += x and y
        b += x and not y
        c += (not x) and y
        d += (not x) and (not y)
    orr = a * d / b / c
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    (r,) = spark_rows("odds_ratio_ci")
    assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
    assert r["odds_ratio"] == _q6(orr)
    assert r["ci_lo"] == _q6(math.exp(math.log(orr) - 1.96 * se))
    assert r["ci_hi"] == _q6(math.exp(math.log(orr) + 1.96 * se))
    assert r["relative_risk"] == _q6((a / (a + b)) / (c / (c + d)))
    assert r["ci_lo"] <= r["odds_ratio"] <= r["ci_hi"]


def test_segmented_break_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE), ROUND(o_totalprice) "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    import datetime as dt

    day = defaultdict(int)
    for dd, dollars in rows:
        day[(dd - dt.date(1995, 1, 1)).days] += int(dollars)
    ts = sorted(day)
    nd = len(ts)

    def ols(pts):
        n = len(pts)
        sx = sum(t for t, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(t * t for t, _ in pts)
        sxy = sum(t * y for t, y in pts)
        syy = sum(y * y for _, y in pts)
        vxx = sxx - sx * sx / n
        vxy = sxy - sx * sy / n
        vyy = syy - sy * sy / n
        return vxy / vxx, vyy - vxy * vxy / vxx

    pts = [(t, day[t]) for t in ts]
    _, sse1 = ols(pts)
    best = None
    for i in range(60, nd - 60 + 1):
        if i % 30:
            continue
        sl, el = ols(pts[:i])
        sr, er = ols(pts[i:])
        key = (el + er, ts[i - 1])
        if best is None or key < best[0]:
            best = (key, ts[i - 1], sl, sr, el + er)
    (r,) = spark_rows("segmented_trend_break")
    assert r["break_t"] == best[1]
    assert abs(r["slope_left"] - _q6(best[2])) <= 2e-6
    assert abs(r["slope_right"] - _q6(best[3])) <= 2e-6
    assert r["sse_reduction"] == _q6(1.0 - best[4] / sse1)
    assert 0.0 <= r["sse_reduction"] <= 1.0
