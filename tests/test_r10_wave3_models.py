"""Round-10 wave-3 behavior tests vs pure-Python references — each query
recomputed independently (no SQL reuse) from the raw parquet rows, so a
shared misunderstanding between the Spark plan and its DuckDB twin
cannot pass silently."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

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


def test_cohens_kappa_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT text, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    n = n11 = n10 = n01 = n00 = 0
    for text, nc in rows:
        wc = len(text.split())
        a = 30 <= wc <= 5000
        b = 6 * wc <= nc <= 60 * wc
        n += 1
        n11 += a and b
        n10 += a and not b
        n01 += (not a) and b
        n00 += (not a) and (not b)
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    kappa = (n * (n11 + n00) - pe_num) / (n * n - pe_num)
    (r,) = spark_rows("cohens_kappa_rules")
    assert (r["n"], r["n11"], r["n10"], r["n01"], r["n00"]) == (
        n,
        n11,
        n10,
        n01,
        n00,
    )
    assert r["kappa"] == _q6(kappa)
    # kappa never exceeds raw accord, and both live in [-1, 1]
    assert -1.0 <= r["kappa"] <= r["po"] <= 1.0


def test_kruskal_wallis_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT o_orderpriority, ROUND(o_totalprice*100) "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    vals = sorted({int(y) for _, y in rows})
    cnt = Counter(int(y) for _, y in rows)
    # 2*avg_rank at each distinct value
    r2 = {}
    below = 0
    for v in vals:
        r2[v] = 2 * below + cnt[v] + 1
        below += cnt[v]
    n = len(rows)
    groups = defaultdict(list)
    for pri, y in rows:
        groups[pri].append(int(y))
    css = 0.0
    for pri in sorted(groups):
        ys = groups[pri]
        mean_rank = sum(r2[y] for y in ys) / 2 / len(ys)
        css += len(ys) * (mean_rank - (n + 1) / 2) ** 2
    h = css * 12.0 / (n * (n + 1.0))
    tcorr = sum(t**3 - t for t in cnt.values())
    h_corr = h / (1.0 - tcorr / (float(n) ** 3 - n))
    got = {r["priority"]: r for r in spark_rows("kruskal_wallis_htest")}
    assert set(got) == set(groups)
    for pri, ys in groups.items():
        assert got[pri]["n_g"] == len(ys)
        assert got[pri]["mean_rank"] == _q6(
            sum(r2[y] for y in ys) / 2 / len(ys)
        )
    anyrow = next(iter(got.values()))
    assert anyrow["h_stat"] == _q6(h)
    assert anyrow["h_corrected"] == _q6(h_corr)
    assert anyrow["h_corrected"] >= anyrow["h_stat"] >= 0


def test_brown_forsythe_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT c_mktsegment, ROUND(c_acctbal*100) "
        f"FROM '{SF}/customer.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for seg, y in rows:
        groups[seg].append(int(y))
    stats = {}
    for seg, ys in groups.items():
        ys.sort()
        med = ys[(len(ys) + 1) // 2 - 1]  # lower median
        zs = [abs(y - med) for y in ys]
        stats[seg] = (med, len(zs), sum(zs), sum(z * z for z in zs))
    n = sum(s[1] for s in stats.values())
    k = len(stats)
    zbar = sum(s[2] for s in stats.values()) / n
    ssb = ssw = 0.0
    for seg in sorted(stats):
        med, ng, sz, sz2 = stats[seg]
        ssb += ng * (sz / ng - zbar) ** 2
        ssw += sz2 - sz * sz / ng
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = {r["segment"]: r for r in spark_rows("brown_forsythe_variance")}
    assert set(got) == set(stats)
    for seg, (med, ng, sz, _) in stats.items():
        assert got[seg]["median_cents"] == med
        assert got[seg]["n_g"] == ng
        assert got[seg]["mean_absdev"] == _q6(sz / ng / 100.0)
        assert got[seg]["f_stat"] == _q6(f)


def test_good_turing_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall()
    tc = Counter()
    for (text,) in rows:
        tc.update(text.split())
    n_tokens = sum(tc.values())
    vocab = len(tc)
    f1 = sum(1 for c in tc.values() if c == 1)
    f2 = sum(1 for c in tc.values() if c == 2)
    chao1 = vocab + (
        f1 * f1 / (2.0 * f2) if f2 else f1 * (f1 - 1) / 2.0
    )
    (r,) = spark_rows("good_turing_chao1")
    assert (r["n_tokens"], r["vocab"], r["f1"], r["f2"]) == (
        n_tokens,
        vocab,
        f1,
        f2,
    )
    assert r["p_unseen"] == _q6(f1 / n_tokens)
    assert r["chao1_richness"] == _q6(chao1)
    # Chao1 is a lower-bound richness estimate: never below the
    # observed vocabulary
    assert r["chao1_richness"] >= vocab


def test_james_stein_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT c_nationkey, ROUND(c_acctbal*100) "
        f"FROM '{SF}/customer.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for nk, y in rows:
        groups[int(nk)].append(int(y))
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    grand = sum(sum(v) for v in groups.values()) / n
    ssw = sum(
        sum(y * y for y in ys) - sum(ys) ** 2 / len(ys)
        for ys in groups.values()
    )
    sig2 = ssw / (n - k)
    ssb = sum(
        (sum(ys) / len(ys) - grand) ** 2 for ys in groups.values()
    )
    got = {r["nation"]: r for r in spark_rows("james_stein_nation_means")}
    assert set(got) == set(groups)
    shrunk_spread = raw_spread = 0.0
    for nk, ys in groups.items():
        mg = sum(ys) / len(ys)
        w = max(0.0, 1.0 - (k - 3) * sig2 / len(ys) / ssb)
        assert got[nk]["raw_mean"] == _q6(mg / 100.0)
        assert got[nk]["shrink_w"] == _q6(w)
        assert got[nk]["js_mean"] == _q6((grand + w * (mg - grand)) / 100.0)
        raw_spread += (mg - grand) ** 2
        shrunk_spread += (w * (mg - grand)) ** 2
    # shrinkage contracts the spread of means around the grand mean
    assert shrunk_spread <= raw_spread
    assert all(0.0 <= r["shrink_w"] <= 1.0 for r in got.values())


def test_logrank_reference(spark_rows):
    rows = duckdb.sql(
        f"""
        SELECT user_id, event_type, CAST(ts AS DATE) AS day, ts
        FROM '{SF}/events.parquet'
        WHERE event_type IN ('signup', 'purchase')
        """
    ).fetchall()
    signup = {}
    for uid, et, day, ts in rows:
        if et == "signup" and (uid not in signup or ts < signup[uid][1]):
            signup[uid] = (day, ts)
    conv = {}
    for uid, et, day, ts in rows:
        if et == "purchase" and uid in signup and ts > signup[uid][1]:
            d = (day - signup[uid][0]).days
            if uid not in conv or d < conv[uid]:
                conv[uid] = d
    n1_0 = sum(1 for uid in signup if uid % 2 == 1)
    n_all = len(signup)
    ev = defaultdict(lambda: [0, 0])  # d -> [d1, di]
    for uid, d in conv.items():
        ev[d][0] += uid % 2 == 1
        ev[d][1] += 1
    o1 = e1_q = v_q = 0
    n1, ni = n1_0, n_all
    for d in sorted(ev):
        d1, di = ev[d]
        o1 += d1
        e1_q += math.floor(di * n1 / ni * 1e9 + 0.5)
        if ni > 1:
            v_q += math.floor(
                di * n1 / ni * (ni - n1) / ni * (ni - di) / (ni - 1) * 1e9
                + 0.5
            )
        n1 -= d1
        ni -= di
    (r,) = spark_rows("logrank_test")
    assert (r["n_grp1"], r["n_grp0"], r["o1"]) == (
        n1_0,
        n_all - n1_0,
        o1,
    )
    assert r["e1"] == _q6(e1_q / 1e9)
    assert r["v"] == _q6(v_q / 1e9)
    assert r["chi2"] == _q6(
        (o1 - e1_q / 1e9) ** 2 / (v_q / 1e9)
    )
    assert r["chi2"] >= 0
