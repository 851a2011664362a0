"""Round-7 wave-26 behavior tests: RFM vs an exact-ntile pandas
replay, new-vs-returning vs a first-seen scan."""

from __future__ import annotations

import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave26 import (
    new_vs_returning_daily_q,
    rfm_segmentation_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def _ntile5(order):
    n = len(order)
    q, r = divmod(n, 5)
    out = {}
    for p, uid in enumerate(order):
        if p < r * (q + 1):
            out[uid] = p // (q + 1) + 1
        else:
            out[uid] = r + (p - r * (q + 1)) // q + 1
    return out


def test_rfm_matches_exact_ntile(spark):
    got = {
        (r["r_q"], r["f_q"], r["m_q"]): r["n_users"]
        for r in rfm_segmentation_q(spark, SF_SMALL).collect()
    }
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["d"] = (
        pd.to_datetime(ev.ts).dt.normalize() - pd.Timestamp("2024-01-01")
    ).dt.days
    ev["vm"] = (ev.value * 1e6 + 0.5).apply(math.floor).astype(int)
    per = ev.groupby("user_id").agg(
        last_d=("d", "max"), freq=("d", "size"), monet=("vm", "sum")
    )
    r_q = _ntile5(
        [u for u, _ in sorted(per.last_d.items(), key=lambda kv: (kv[1], kv[0]))]
    )
    f_q = _ntile5(
        [u for u, _ in sorted(per.freq.items(), key=lambda kv: (kv[1], kv[0]))]
    )
    m_q = _ntile5(
        [u for u, _ in sorted(per.monet.items(), key=lambda kv: (kv[1], kv[0]))]
    )
    expected: dict[tuple[int, int, int], int] = {}
    for u in per.index:
        key = (r_q[u], f_q[u], m_q[u])
        expected[key] = expected.get(key, 0) + 1
    assert got == expected
    assert sum(got.values()) == len(per)  # every user in exactly one cell


def test_new_vs_returning_matches_scan(spark):
    got = {
        r["d"]: (r["new_users"], r["returning_users"])
        for r in new_vs_returning_daily_q(spark, SF_SMALL).collect()
    }
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["d"] = (
        pd.to_datetime(ev.ts).dt.normalize() - pd.Timestamp("2024-01-01")
    ).dt.days
    firsts = ev.groupby("user_id").d.min()
    daily = ev[["d", "user_id"]].drop_duplicates()
    expected = {}
    for d, grp in daily.groupby("d"):
        new = sum(1 for u in grp.user_id if firsts[u] == d)
        expected[d] = (new, len(grp) - new)
    assert got == expected
    # conservation: every user is new exactly once across all days
    assert sum(n for n, _ in got.values()) == len(firsts)
