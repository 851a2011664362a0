"""Round-7 wave-23 behavior tests: streak RLE vs a direct scan,
seasonal-naive errors vs pandas."""

from __future__ import annotations

import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave23 import (
    longest_event_streak_q,
    seasonal_naive_backtest_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_longest_streak_matches_scan(spark):
    got = {
        r["event_type"]: (r["max_streak"], r["user_id"])
        for r in longest_event_streak_q(spark, SF_SMALL).collect()
    }
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    best: dict[str, tuple[int, int]] = {}
    for uid, grp in ev.groupby("user_id"):
        run_type, run_len = None, 0
        for et in grp.event_type:
            run_len = run_len + 1 if et == run_type else 1
            run_type = et
            cur = best.get(et)
            # ties resolve to the smaller user id
            if cur is None or run_len > cur[0] or (
                run_len == cur[0] and uid < cur[1]
            ):
                best[et] = (run_len, uid)
    assert got == best
    assert all(v[0] >= 1 for v in got.values())


def test_seasonal_naive_matches_pandas(spark):
    got = {r["event_type"]: r.asDict() for r in seasonal_naive_backtest_q(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["d"] = (
        pd.to_datetime(ev.ts).dt.normalize() - pd.Timestamp("2024-01-01")
    ).dt.days
    daily = ev.groupby(["event_type", "d"]).size().reset_index(name="c")
    for et, grp in daily.groupby("event_type"):
        by_d = dict(zip(grp.d, grp.c))
        errs = [
            (abs(c - by_d[d - 7]), c)
            for d, c in by_d.items()
            if d - 7 in by_d
        ]
        g = got[et]
        assert g["n_days"] == len(errs)
        total = sum(e for e, _ in errs)
        assert g["total_abs_err"] == total
        assert abs(g["mae"] - math.floor(total / len(errs) * 1e4 + 0.5) / 1e4) < 1e-9
        nano = sum(e * 1000000000 // a for e, a in errs)
        mape = math.floor(nano / len(errs) / 1e9 * 1e4 + 0.5) / 1e4
        assert abs(g["mape"] - mape) < 1e-9
