"""Round-9 wave-6 behavior tests vs pure-Python references."""

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


def test_dow_hour_heatmap_reference(spark_rows):
    import datetime

    rows = duckdb.sql(
        f"SELECT epoch_us(ts), user_id FROM '{SF}/events.parquet'"
    ).fetchall()
    cells = defaultdict(lambda: [0, set()])
    for tu, uid in rows:
        dt = datetime.datetime.fromtimestamp(
            tu / 1_000_000, tz=datetime.timezone.utc
        )
        c = cells[(dt.weekday(), dt.hour)]  # weekday(): 0 = Monday
        c[0] += 1
        c[1].add(uid)
    total = len(rows)
    got = {(r["dow"], r["hr"]): r for r in spark_rows("dow_hour_heatmap")}
    assert set(got) == set(cells)
    for key, (n, users) in cells.items():
        r = got[key]
        assert r["n_events"] == n and r["n_users"] == len(users)
        assert r["share"] == _q6(n / total)


def test_simpson_diversity_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    cnt = defaultdict(Counter)
    for src, t in rows:
        cnt[src].update(t.split(" "))
    got = {r["source"]: r for r in spark_rows("simpson_diversity_sources")}
    for src, c in cnt.items():
        total = sum(c.values())
        sum_sq = sum(v * v for v in c.values())
        r = got[src]
        assert r["total"] == total and r["vocab"] == len(c)
        assert r["simpson"] == _q6(1 - sum_sq / (total * total))
        assert r["effective_vocab"] == _q6(total * total / sum_sq)


def test_wasserstein_drift_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT source, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    per = defaultdict(Counter)
    allc = Counter()
    for src, v in rows:
        per[src][v] += 1
        allc[v] += 1
    grid = sorted(allc)
    ng = sum(allc.values())
    got = {r["source"]: r["w1_chars"] for r in spark_rows("wasserstein_length_drift")}
    for src, c in per.items():
        ns = sum(c.values())
        cum_s = cum_g = 0
        terms = []
        for v, nxt in zip(grid, grid[1:]):
            cum_s += c.get(v, 0)
            cum_g += allc[v]
            terms.append((v, abs(cum_s / ns - cum_g / ng) * (nxt - v)))
        terms.sort()
        acc = 0.0
        for _, t in terms:
            acc += t
        assert got[src] == _q6(acc), src
    # sanity: W1 of the corpus against itself would be 0; every source
    # should be strictly positive on this synthetic mix
    assert all(v > 0 for v in got.values())
