"""Round-7 wave-27 behavior tests: power analysis vs a direct formula
replay, bounce rate vs a Python sessionizer."""

from __future__ import annotations

import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave27 import (
    _Z_A,
    _Z_B,
    ab_test_power_analysis_q,
    session_bounce_rate_q,
)

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"  # sf0.001 has no view/click first-touch users


def test_power_analysis_matches_formula(spark):
    row = ab_test_power_analysis_q(spark, SF_MID).collect()[0]
    ev = pd.read_parquet(f"{SF_MID}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    arms, convs = {}, {}
    for uid, grp in ev.groupby("user_id"):
        first = grp.iloc[0]
        if first.event_type not in ("view", "click"):
            continue
        arms[uid] = first.event_type
        later = grp[
            (grp.event_type == "purchase")
            & (grp.ts > first.ts)
            & (
                (grp.ts - first.ts).dt.total_seconds() <= 259200
            )
        ]
        convs[uid] = len(later) > 0
    n1 = sum(1 for a in arms.values() if a == "view")
    c1 = sum(1 for u, a in arms.items() if a == "view" and convs[u])
    n2 = sum(1 for a in arms.values() if a == "click")
    c2 = sum(1 for u, a in arms.items() if a == "click" and convs[u])
    assert (row["n_view"], row["conv_view"]) == (n1, c1)
    assert (row["n_click"], row["conv_click"]) == (n2, c2)
    p1, p2 = c1 / n1, c2 / n2
    n_arm = math.ceil(
        (_Z_A + _Z_B) ** 2 * (p1 * (1 - p1) + p2 * (1 - p2)) / (p1 - p2) ** 2
    )
    assert row["n_per_arm"] == n_arm
    # the planning number must be positive and finite
    assert 0 < row["n_per_arm"] < 10**9


def test_bounce_rate_matches_python_sessionizer(spark):
    row = session_bounce_rate_q(spark, SF_SMALL).collect()[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["t"] = ev.ts.astype("datetime64[us]").astype("int64")  # micros
    lens = []
    for _, grp in ev.sort_values(["t", "event_id"]).groupby("user_id"):
        cur = 0
        prev = None
        for t in grp.t:
            if prev is None or t - prev > 1800000000:
                if cur:
                    lens.append(cur)
                cur = 0
            cur += 1
            prev = t
        if cur:
            lens.append(cur)
    n_sessions = len(lens)
    n_bounce = sum(1 for x in lens if x == 1)
    assert row["n_sessions"] == n_sessions
    assert row["n_bounces"] == n_bounce
    assert abs(
        row["bounce_rate"]
        - math.floor(n_bounce / n_sessions * 1e4 + 0.5) / 1e4
    ) < 1e-9
    assert abs(
        row["mean_session_len"]
        - math.floor(sum(lens) / n_sessions * 1e4 + 0.5) / 1e4
    ) < 1e-9
