"""Round-9 wave-1 behavior tests: each query's math against an
independent pure-Python/numpy reference on the sf0.01 tables (the third
implementation besides Spark and the DuckDB oracle), plus fixture-level
unit checks for the deterministic tie-breaks."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


def _events():
    return duckdb.sql(
        f"SELECT event_id, epoch_us(ts) AS tu, user_id, value "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()


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


def test_twap_matches_reference(spark_rows):
    pts = defaultdict(list)
    for eid, tu, uid, v in _events():
        if uid < 40:
            pts[uid].append((tu, eid, v))
    expected = {}
    for uid, rows in pts.items():
        rows.sort()
        if len(rows) < 2:
            continue
        terms = []
        total = 0
        for (t0, e0, v0), (t1, _, _) in zip(rows, rows[1:]):
            terms.append((t0, e0, v0 * (t1 - t0)))
            total += t1 - t0
        terms.sort()
        acc = 0.0
        for _, _, term in terms:
            acc += term
        expected[uid] = (len(terms), total, _q6(acc / total))
    got = {
        r["user_id"]: (r["n_intervals"], r["total_us"], r["twap"])
        for r in spark_rows("time_weighted_average")
    }
    assert got == expected


def test_ohlc_matches_reference(spark_rows):
    import datetime

    days = defaultdict(list)
    for eid, tu, uid, v in _events():
        day = str(
            datetime.datetime.fromtimestamp(
                tu / 1_000_000, tz=datetime.timezone.utc
            ).date()
        )
        days[day].append((tu, eid, v))
    expected = {}
    for day, rows in days.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        expected[day] = (
            len(rows), rows[0][2], max(vals), min(vals), rows[-1][2],
            rows[-1][0] - rows[0][0] if len(rows) > 1 else 0,
        )
    got = {
        r["day"]: (
            r["n_events"], r["open"], r["high"], r["low"], r["close"],
            r["span_us"],
        )
        for r in spark_rows("ohlc_daily_bars")
    }
    assert got == expected


def test_ewma_matches_reference(spark_rows):
    pts = defaultdict(list)
    for eid, tu, uid, v in _events():
        if uid < 30:
            pts[uid].append((tu, eid, v))
    expected = {}
    for uid, rows in pts.items():
        if len(rows) < 2:
            continue
        rows.sort()
        acc = rows[0][2]
        for _, _, v in rows[1:]:
            acc = acc * 0.7 + v * 0.3
        expected[uid] = (len(rows), _q6(acc))
    got = {
        r["user_id"]: (r["n"], r["ewma"])
        for r in spark_rows("ewma_smoothing")
    }
    assert got == expected


def test_theil_sen_matches_reference(spark_rows):
    daily = duckdb.sql(
        f"SELECT CAST(date_diff('day', DATE '1995-01-01', o_orderdate) "
        f"AS BIGINT) d, "
        f"COUNT(*) c FROM '{SF}/orders.parquet' "
        f"WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31' "
        f"GROUP BY 1"
    ).fetchall()
    slopes = []
    for i, (d1, c1) in enumerate(daily):
        for d2, c2 in daily:
            if d1 < d2:
                slopes.append(((c2 - c1) / (d2 - d1), d1, d2))
    slopes.sort()
    k = (len(slopes) + 1) // 2
    med = slopes[k - 1][0]
    [r] = spark_rows("theil_sen_trend")
    assert r["n_days"] == len(daily)
    assert r["n_pairs"] == len(slopes)
    assert r["slope_per_day"] == _q6(med)


def test_equi_depth_matches_row_level_ntile(spark_rows):
    vals = sorted(
        v
        for (v,) in duckdb.sql(
            f"SELECT o_totalprice FROM '{SF}/orders.parquet'"
        ).fetchall()
    )
    n = len(vals)
    buckets = defaultdict(list)
    for r0, v in enumerate(vals):
        buckets[r0 * 8 // n].append(v)
    expected = {
        b: (len(vs), min(vs), max(vs)) for b, vs in buckets.items()
    }
    got = {
        r["bucket"]: (r["n_rows"], r["lo"], r["hi"])
        for r in spark_rows("equi_depth_histogram")
    }
    assert got == expected
    assert sum(c for c, _, _ in got.values()) == n  # no row lost/dup


def test_association_rules_matches_reference(spark_rows):
    baskets = defaultdict(set)
    for uid, et in duckdb.sql(
        f"SELECT DISTINCT user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall():
        baskets[uid].add(et)
    n_users = len(baskets)
    n_t = Counter()
    n_both = Counter()
    for uid, types in baskets.items():
        for t in types:
            n_t[t] += 1
        ts = sorted(types)
        for i, a in enumerate(ts):
            for b in ts[i + 1:]:
                n_both[(a, b)] += 1
    got = {(r["ante"], r["cons"]): r for r in spark_rows("association_rules_lift")}
    assert set(got) == set(n_both)
    for (a, b), nb in n_both.items():
        r = got[(a, b)]
        assert r["n_both"] == nb
        assert r["n_ante"] == n_t[a] and r["n_cons"] == n_t[b]
        assert r["support"] == _q6(nb / n_users)
        assert r["confidence"] == _q6(nb / n_t[a])
        assert r["lift"] == _q6(nb * n_users / (n_t[a] * n_t[b]))


def test_geohashes_in_box_known_cells(spark_rows):
    """geohashesInBox: a degenerate box (point) yields its own cell; a
    box spanning one cell boundary yields both cells; empty box yields
    an empty array."""
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.functions.ch import ch_expr
    from clickhouse_objects_analysis_spark.session import get_spark

    spark = get_spark("tests")
    df = spark.range(1)
    row = df.select(
        ch_expr(
            "geohashesInBox",
            F.lit(13.361389), F.lit(38.115556),
            F.lit(13.361389), F.lit(38.115556), 4,
        ).alias("pt"),
        ch_expr(
            "geohashesInBox",
            F.lit(-0.01), F.lit(0.0), F.lit(0.01), F.lit(0.0), 4,
        ).alias("pair"),
        ch_expr(
            "geohashesInBox",
            F.lit(10.0), F.lit(10.0), F.lit(9.0), F.lit(10.0), 4,
        ).alias("empty"),
    ).first()
    assert row["pt"] == ["sqc8"]
    assert len(row["pair"]) == 2 and row["pair"] == sorted(row["pair"])
    # the two cells straddle the prime meridian at the equator: the
    # west cell starts 'e' (lon bit 0), the east cell 's' (lon bit 1)
    assert {g[0] for g in row["pair"]} == {"e", "s"}
    assert row["empty"] == []


def test_winnowing_matches_reference(spark_rows):
    """Winnowing fingerprints per doc + pair overlaps vs a pure-Python
    reference (hashlib md5 — the third engine)."""
    import hashlib

    K, W = 16, 8
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        f"WHERE length(text) >= {K + W - 1}"
    ).fetchall()
    fps = {}
    for doc_id, text in docs:
        hs = [
            int(hashlib.md5(text[i:i + K].encode()).hexdigest()[:15], 16)
            for i in range(len(text) - K + 1)
        ]
        sel = {min(hs[j:j + W]) for j in range(len(hs) - W + 1)}
        fps[doc_id] = sel
    pair_shared = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sh = len(fps[a] & fps[b])
            if sh >= 2:
                pair_shared[(a, b)] = sh
    expected = sorted(
        ((a, b, sh, len(fps[a]), len(fps[b])) for (a, b), sh in pair_shared.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:50]
    got = [
        (r["id_a"], r["id_b"], r["shared"], r["n_fp_a"], r["n_fp_b"])
        for r in spark_rows("winnowing_fingerprints")
    ]
    assert got == expected
    assert len(got) > 0  # corpus has near-dup structure; empty = broken


def test_winnowing_guarantee_on_synthetic_pair():
    """The winnowing coverage guarantee: two docs sharing a substring of
    length >= k + w - 1 MUST share a fingerprint."""
    import hashlib

    K, W = 16, 8
    shared = "x" * 10 + "abcdefghijklmnopqrstuvw" + "y" * 10  # 23 = K+W-1 core
    d1 = "AAAA" + shared + "BBBB"
    d2 = "CCCCCC" + shared + "DDD"

    def wfp(text):
        hs = [
            int(hashlib.md5(text[i:i + K].encode()).hexdigest()[:15], 16)
            for i in range(len(text) - K + 1)
        ]
        return {min(hs[j:j + W]) for j in range(len(hs) - W + 1)}

    assert wfp(d1) & wfp(d2)
