"""Round-10 wave behavior tests vs pure-Python references — each query
recomputed independently (no SQL reuse) from the raw parquet rows, so a
shared misunderstanding between the Spark plan and its DuckDB twin
cannot pass silently."""

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


def test_page_hinkley_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT CAST(ts AS DATE), value FROM '{SF}/events.parquet'"
    ).fetchall()
    daily = defaultdict(lambda: [0, 0])  # day -> [centi_sum, count]
    for day, v in rows:
        daily[day][0] += math.floor(v * 100 + 0.5)
        daily[day][1] += 1
    ss = cc = u = 0
    umin = None
    want = []
    for day in sorted(daily):
        s, c = daily[day]
        x = (s - s % c) // c
        ss += s
        cc += c
        m = (ss - ss % cc) // cc
        u += x - m
        umin = u if umin is None else min(umin, u)
        stat = u - umin
        want.append(
            (day.isoformat(), _q6(x / 100.0), _q6(stat / 100.0), stat > 500)
        )
    got = [
        (r["day"], r["day_mean"], r["ph_stat"], r["drift"])
        for r in spark_rows("page_hinkley_drift")
    ]
    assert got == want
    # the statistic is a drawdown-from-minimum: never negative
    assert all(r[2] >= 0 for r in got)


def test_kendall_tau_b_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT l_extendedprice, l_quantity FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    grid = defaultdict(int)
    for p_, q_ in rows:
        grid[(min(int(p_ // 6875), 15), min(int(q_ // 5), 9))] += 1
    cells = list(grid.items())
    conc = disc = 0
    for (ax, ay), an in cells:
        for (bx, by), bn in cells:
            if bx > ax and by > ay:
                conc += an * bn
            elif bx > ax and by < ay:
                disc += an * bn
    n = sum(grid.values())
    rowm = defaultdict(int)
    colm = defaultdict(int)
    for (x, y), c in grid.items():
        rowm[x] += c
        colm[y] += c
    n0 = n * (n - 1) // 2
    n1 = sum(r * (r - 1) // 2 for r in rowm.values())
    n2 = sum(c * (c - 1) // 2 for c in colm.values())
    tau = (conc - disc) / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))
    [r] = spark_rows("kendall_tau_b_binned")
    assert (r["n"], r["concordant"], r["discordant"]) == (n, conc, disc)
    assert r["tau_b"] == pytest.approx(_q6(tau), abs=1e-9)
    assert -1.0 <= r["tau_b"] <= 1.0


def test_gini_split_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT l_extendedprice, l_returnflag FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    b = defaultdict(lambda: [0, 0])  # bucket -> [cnt, pos]
    for p_, f_ in rows:
        t = int(p_ // 1000)
        b[t][0] += 1
        b[t][1] += f_ == "R"
    n = sum(c for c, _ in b.values())
    np_ = sum(p for _, p in b.values())
    nl = pl = 0
    best = None
    for t in sorted(b):
        nl += b[t][0]
        pl += b[t][1]
        if nl >= n:
            continue
        nr, pr = n - nl, np_ - pl
        g = (nl / n) * (
            1.0 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
        ) + (nr / n) * (1.0 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2)
        if best is None or (g, t) < best:
            best = (g, t, nl, nr)
    [r] = spark_rows("gini_split_stump")
    g, t, nl, nr = best
    assert (r["best_threshold_bucket"], r["n_left"], r["n_right"]) == (
        t, nl, nr,
    )
    assert r["weighted_gini"] == pytest.approx(_q6(g), abs=1e-9)
    # a split can never beat 0 or reach past the 2-class maximum
    assert 0.0 <= r["weighted_gini"] <= 0.5


def test_mutual_information_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
    ).fetchall()
    j = defaultdict(int)
    for x, v in rows:
        j[(x, min(int(v // 50), 9))] += 1
    n = sum(j.values())
    nx = defaultdict(int)
    ny = defaultdict(int)
    for (x, y), c in j.items():
        nx[x] += c
        ny[y] += c
    mi = sum(
        (c / n) * math.log(n * c / (nx[x] * ny[y]))
        for (x, y), c in j.items()
    )
    hx = sum((c / n) * math.log(n / c) for c in nx.values())
    hy = sum((c / n) * math.log(n / c) for c in ny.values())
    [r] = spark_rows("mutual_information_nmi")
    assert r["n"] == n
    # float sums here are order-sensitive at the last ulp; compare loose
    assert r["h_x"] == pytest.approx(hx, abs=1e-5)
    assert r["h_y"] == pytest.approx(hy, abs=1e-5)
    assert r["mi"] == pytest.approx(mi, abs=1e-5)
    assert r["nmi"] == pytest.approx(mi / math.sqrt(hx * hy), abs=1e-4)
    # information inequalities: 0 ≤ MI ≤ min(H(X), H(Y))
    assert -1e-9 <= r["mi"] <= min(r["h_x"], r["h_y"]) + 1e-9
    assert 0.0 <= r["nmi"] <= 1.0


def test_psi_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT day(ts) <= 15, value FROM '{SF}/events.parquet'"
    ).fetchall()
    h = defaultdict(lambda: [0, 0])
    for is_base, v in rows:
        h[min(int(v // 50), 9)][0 if is_base else 1] += 1
    tb = sum(a for a, _ in h.values())
    tc = sum(b for _, b in h.values())
    got = {r["bin"]: r for r in spark_rows("population_stability_index")}
    assert set(got) == set(h)
    for bin_, (nb, nc) in h.items():
        p = (nb + 0.5) / (tb + 5.0)
        q = (nc + 0.5) / (tc + 5.0)
        r = got[bin_]
        assert (r["n_base"], r["n_current"]) == (nb, nc)
        assert r["base_share"] == pytest.approx(_q6(p), abs=1e-9)
        assert r["psi_term"] == pytest.approx(
            _q6((p - q) * math.log(p / q)), abs=1e-9
        )
        # each PSI term is a (p−q)ln(p/q) product of same-sign factors
        assert r["psi_term"] >= 0


def test_mcnemar_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT n_chars, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    b = c = both = 0
    for n_chars, text in rows:
        r1 = n_chars > 300
        r2 = len(text.split(" ")) > 55
        b += r1 and not r2
        c += r2 and not r1
        both += r1 and r2
    [r] = spark_rows("mcnemar_quality_rules")
    assert (r["n"], r["both_pass"], r["only_rule1"], r["only_rule2"]) == (
        len(rows), both, b, c,
    )
    assert r["chi2_cc"] == pytest.approx(
        _q6((abs(b - c) - 1) ** 2 / (b + c)), abs=1e-9
    )
    # the discordant cells must be non-degenerate for the test to mean
    # anything — guards the threshold choice against testdata drift
    assert b + c > 0


def test_page_hinkley_detects_injected_shift():
    """Synthetic sanity: a level shift in the back half must push the PH
    statistic past λ while the front half stays at ~0 — checked on the
    pure-Python model (the Spark plan equals it row-for-row above)."""
    days = [(d, 100, 10) for d in range(15)] + [
        (d, 200, 10) for d in range(15, 30)
    ]  # (day, centi_sum per unit, count): mean jumps 10 -> 20 centi
    ss = cc = u = 0
    umin = None
    stats = []
    for _, per, c in days:
        s = per * c
        x = (s - s % c) // c
        ss += s
        cc += c
        m = (ss - ss % cc) // cc
        u += x - m
        umin = u if umin is None else min(umin, u)
        stats.append(u - umin)
    assert max(stats[:15]) == 0
    assert stats[-1] > 500
