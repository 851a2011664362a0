"""Round-10 wave-6 behavior tests vs pure-Python references — each query
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


def test_cochran_armitage_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT o_totalprice, o_orderpriority FROM '{SF}/orders.parquet'"
    ).fetchall()
    g = defaultdict(lambda: [0, 0])
    for price, pri in rows:
        w = min(int(price // 110000), 4)
        g[w][0] += 1
        g[w][1] += pri in ("1-URGENT", "2-HIGH")
    n = sum(v[0] for v in g.values())
    kk = sum(v[1] for v in g.values())
    swn = sum(w * v[0] for w, v in g.items())
    sw2n = sum(w * w * v[0] for w, v in g.items())
    swk = sum(w * v[1] for w, v in g.items())
    p = kk / n
    z = (swk - kk * swn / n) / math.sqrt(
        p * (1.0 - p) * (sw2n - swn * swn / n)
    )
    got = {r["bucket"]: r for r in spark_rows("cochran_armitage_trend")}
    assert set(got) == set(g)
    for w, (n_i, k_i) in g.items():
        assert (got[w]["n_i"], got[w]["k_i"]) == (n_i, k_i)
        assert got[w]["rate"] == _q6(k_i / n_i)
        assert got[w]["z_trend"] == _q6(z)


def test_gumbel_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT CAST(ts AS DATE), value FROM '{SF}/events.parquet'"
    ).fetchall()
    mx = defaultdict(int)
    for day, v in rows:
        c = math.floor(v * 100 + 0.5)
        mx[day] = max(mx[day], c)
    vals = list(mx.values())
    n = len(vals)
    s1, s2 = sum(vals), sum(v * v for v in vals)
    mean = s1 / n / 100.0
    sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1)) / 100.0
    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    p = 1.0 - math.exp(-math.exp(-((400.0 - mu) / beta)))
    (r,) = spark_rows("gumbel_block_maxima")
    assert r["n_blocks"] == n
    assert r["mean_max"] == _q6(mean)
    assert r["beta"] == _q6(beta)
    assert r["mu"] == _q6(mu)
    assert r["p_exceed"] == _q6(p)
    assert 0.0 <= r["p_exceed"] <= 1.0


def test_pacf_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE), ROUND(o_totalprice) "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    import datetime as dt

    day = defaultdict(int)
    for d, dollars in rows:
        day[(d - dt.date(1995, 1, 1)).days] += int(dollars)
    n = len(day)
    s = sum(day.values())
    sxx = sum(x * x for x in day.values())

    def r_k(k):
        sxy = sh = st = m = 0
        for t, x in day.items():
            if t + k in day:
                sxy += x * day[t + k]
                sh += x
                st += day[t + k]
                m += 1  # COUNT matched pairs — (n-k) is wrong when the
                # calendar has revenue-free days (review finding)
        num = n * n * sxy - n * s * (sh + st) + m * s * s
        den = n * n * sxx - n * s * s
        return num / den

    r1, r2, r3 = r_k(1), r_k(2), r_k(3)
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 - phi22 * r1
    v2 = (1 - r1 * r1) * (1 - phi22 * phi22)
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / v2
    (r,) = spark_rows("pacf_yule_walker")
    assert r["phi_1"] == _q6(r1)
    assert r["phi_2"] == _q6(phi22)
    # the Durbin-Levinson lag-3 pivot composes several float ops whose
    # association differs between the closed-form SQL and this
    # reference; allow quantization-level noise
    assert abs(r["phi_3"] - _q6(phi33)) <= 2e-6
    assert all(abs(v) <= 1.0 for v in (r["phi_1"], r["phi_2"], r["phi_3"]))


def test_tukey_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT c_mktsegment, ROUND(c_acctbal*100) "
        f"FROM '{SF}/customer.parquet'"
    ).fetchall()
    g = defaultdict(list)
    for seg, y in rows:
        g[seg].append(int(y))
    n = sum(len(v) for v in g.values())
    k = len(g)
    ssw = sum(
        sum(y * y for y in ys) - sum(ys) ** 2 / len(ys)
        for ys in g.values()
    )
    msw = ssw / (n - k)
    got = {
        (r["seg_a"], r["seg_b"]): r for r in spark_rows("tukey_hsd_pairs")
    }
    segs = sorted(g)
    assert len(got) == k * (k - 1) // 2
    for i, a in enumerate(segs):
        for b in segs[i + 1:]:
            ma = sum(g[a]) / len(g[a])
            mb = sum(g[b]) / len(g[b])
            q = (ma - mb) / math.sqrt(
                msw / 2.0 * (1.0 / len(g[a]) + 1.0 / len(g[b]))
            )
            row = got[(a, b)]
            assert row["mean_diff"] == _q6((ma - mb) / 100.0)
            assert abs(row["q_stat"] - _q6(q)) <= 2e-6


def test_markov_removal_reference(spark_rows):
    rows = duckdb.sql(
        f"""
        SELECT user_id, ts, event_id, event_type
        FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    first_p = {}
    for uid, ts, eid, et in rows:
        if et == "purchase" and uid not in first_p:
            first_p[uid] = ts
    journeys = defaultdict(list)
    all_users = set()
    for uid, ts, eid, et in rows:
        all_users.add(uid)
        if et != "purchase" and (uid not in first_p or ts < first_p[uid]):
            journeys[uid].append(et)
    cnt = defaultdict(int)
    for uid in all_users:
        conv = uid in first_p
        path = ["START"] + journeys.get(uid, [])
        for a, b in zip(path, path[1:]):
            cnt[(a, b)] += 1
        cnt[(path[-1], "CONV" if conv else "LOSS")] += 1

    SCALE = 10**12
    ITERS = 120

    def absorb(removed):
        c2 = defaultdict(int)
        for (a, b), x in cnt.items():
            if a == removed:
                continue
            c2[(a, "LOSS" if b == removed else b)] += x
        states = sorted({a for a, _ in c2})
        tot = {s: sum(x for (a, _), x in c2.items() if a == s)
               for s in states}
        v = {s: 0 for s in states}
        for _ in range(ITERS):
            nv = {}
            for s in states:
                acc = c2.get((s, "CONV"), 0) * SCALE
                for (a, d), x in c2.items():
                    if a == s and d in v:
                        acc += x * v[d]
                nv[s] = acc // tot[s]
            v = nv
        return v["START"]

    v0 = absorb(None)
    chans = ["click", "error", "signup", "view"]
    effs = {c: 1.0 - absorb(c) / v0 for c in chans}
    tot_re = sum(effs.values())
    got = {r["channel"]: r for r in spark_rows("markov_removal_attribution")}
    assert set(got) == set(chans)
    for c in chans:
        assert got[c]["base_cvr"] == _q6(v0 / SCALE)
        assert got[c]["removal_effect"] == _q6(effs[c])
        assert got[c]["attribution_share"] == _q6(effs[c] / tot_re)
    # shares partition the removal mass
    assert abs(sum(r["attribution_share"] for r in got.values()) - 1.0) < 1e-5
