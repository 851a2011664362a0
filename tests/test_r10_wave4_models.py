"""Round-10 wave-4 behavior tests vs pure-Python references — each query
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


def test_delta_method_ratio_reference(spark_rows):
    rows = duckdb.sql(
        f"""
        SELECT c.c_mktsegment, o.o_custkey, ROUND(o.o_totalprice*100)
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        """
    ).fetchall()
    cust = defaultdict(lambda: [0, 0])  # (seg, cust) -> [y, m]
    for seg, ck, cents in rows:
        cust[(seg, ck)][0] += int(cents)
        cust[(seg, ck)][1] += 1
    segs = defaultdict(list)
    for (seg, _), (y, m) in cust.items():
        segs[seg].append((y, m))
    got = {r["segment"]: r for r in spark_rows("delta_method_ratio_ci")}
    assert set(got) == set(segs)
    for seg, pairs in segs.items():
        n_c = len(pairs)
        sy = sum(y for y, _ in pairs)
        sm = sum(m for _, m in pairs)
        r = sy / sm
        ss = sum((y - r * m) ** 2 for y, m in pairs)
        se = math.sqrt(n_c / (n_c - 1) * ss) / sm
        row = got[seg]
        assert row["n_customers"] == n_c
        assert row["n_orders"] == sm
        assert row["ratio"] == _q6(r / 100.0)
        # the linearized SE matches to quantization noise: the moment
        # expansion Syy - 2R*Sym + R^2*Smm evaluates in a different
        # float order than the direct residual sum
        assert abs(row["se"] - _q6(se / 100.0)) < 1e-4
        assert row["ci_lo"] < row["ratio"] < row["ci_hi"]


def test_hodges_lehmann_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT c_mktsegment, ROUND(c_acctbal*100) "
        f"FROM '{SF}/customer.parquet' "
        f"WHERE c_mktsegment IN ('BUILDING','MACHINERY')"
    ).fetchall()
    h1, h0 = Counter(), Counter()
    n1 = n0 = 0
    for seg, cents in rows:
        # Spark DIV and DuckDB // both truncate toward zero; python //
        # floors, so negative balances need the abs-trick to match
        c = int(cents)
        bx = abs(c) // 1000 * (1 if c >= 0 else -1)
        if seg == "BUILDING":
            h1[bx] += 1
            n1 += 1
        else:
            h0[bx] += 1
            n0 += 1
    diffs = Counter()
    for bx, w1 in h1.items():
        for by, w0 in h0.items():
            diffs[bx - by] += w1 * w0
    wtot = sum(diffs.values())
    cum = 0
    hl_bin = None
    for d in sorted(diffs):
        cum += diffs[d]
        if cum >= (wtot + 1) // 2:
            hl_bin = d
            break
    (r,) = spark_rows("hodges_lehmann_shift")
    assert (r["n1"], r["n0"]) == (n1, n0)
    assert r["hl_bin"] == hl_bin
    assert r["hl_shift_dollars"] == _q6(hl_bin * 10.0)


def test_ece_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_totalprice, o_orderpriority "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    g = defaultdict(lambda: [0, 0, 0, 0])  # bucket -> nt, kt, ns, ks
    for ok, price, pri in rows:
        b = min(int(price // 30000), 19)
        hi = pri in ("1-URGENT", "2-HIGH")
        if ok % 2 == 0:
            g[b][0] += 1
            g[b][1] += hi
        else:
            g[b][2] += 1
            g[b][3] += hi
    nt = sum(v[2] for v in g.values())
    ece_q = 0
    keep = {}
    for b, (n_tr, k_tr, n_te, k_te) in g.items():
        if n_tr > 0 and n_te > 0:
            conf = k_tr / n_tr
            acc = k_te / n_te
            ece_q += math.floor(abs(acc - conf) * n_te / nt * 1e9 + 0.5)
            keep[b] = (n_tr, n_te, conf, acc)
    got = {r["bucket"]: r for r in spark_rows("ece_reliability_bins")}
    assert set(got) == set(keep)
    for b, (n_tr, n_te, conf, acc) in keep.items():
        row = got[b]
        assert (row["n_train"], row["n_test"]) == (n_tr, n_te)
        assert row["conf"] == _q6(conf)
        assert row["acc"] == _q6(acc)
        assert row["ece"] == _q6(ece_q / 1e9)
    # ECE is a [0,1] gap measure
    assert 0.0 <= next(iter(got.values()))["ece"] <= 1.0


def test_theil_atkinson_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT o_custkey, ROUND(o_totalprice*100) "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    cust = defaultdict(int)
    for ck, cents in rows:
        cust[ck] += int(cents)
    n = len(cust)
    sx = sum(cust.values())
    st = sl = 0
    for x in cust.values():
        ratio = x * n / sx
        st += math.floor(ratio * math.log(ratio) * 1e9 + 0.5)
        sl += math.floor(math.log(ratio) * 1e9 + 0.5)
    (r,) = spark_rows("theil_atkinson_inequality")
    assert r["n_customers"] == n
    assert r["mean_revenue"] == _q6(sx / n / 100.0)
    assert r["theil_t"] == _q6(st / 1e9 / n)
    assert r["theil_l"] == _q6(-(sl / 1e9) / n)
    assert r["atkinson_1"] == _q6(1.0 - math.exp(sl / 1e9 / n))
    # entropy-family inequality measures are nonnegative; Atkinson(1)
    # relates to Theil-L via A = 1 - exp(-L)
    assert r["theil_t"] >= 0 and r["theil_l"] >= 0
    assert abs(r["atkinson_1"] - (1 - math.exp(-r["theil_l"]))) < 1e-5
