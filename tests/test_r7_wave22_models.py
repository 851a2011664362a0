"""Round-7 wave-22 behavior tests: top paths vs pandas trigram counts,
Kaplan-Meier vs a direct Python estimator."""

from __future__ import annotations

import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave22 import (
    kaplan_meier_survival_q,
    top_event_paths_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_top_paths_match_pandas(spark):
    got = [r.asDict() for r in top_event_paths_q(spark, SF_SMALL).collect()]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    counts: dict[str, int] = {}
    total = 0
    for _, grp in ev.groupby("user_id"):
        ts = grp.event_type.tolist()
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            counts[f"{a}>{b}>{c}"] = counts.get(f"{a}>{b}>{c}", 0) + 1
            total += 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["path"], r["n"]) for r in got] == top
    for r in got:
        assert abs(
            r["share"] - math.floor(r["n"] / total * 1e6 + 0.5) / 1e6
        ) < 1e-9


def test_kaplan_meier_matches_python(spark):
    rows = [r.asDict() for r in kaplan_meier_survival_q(spark, SF_SMALL).collect()]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["ts"] = pd.to_datetime(ev.ts)
    s = ev[ev.event_type == "signup"].groupby("user_id").ts.min()
    durations = {}
    for uid, t0 in s.items():
        later = ev[
            (ev.user_id == uid) & (ev.event_type == "purchase") & (ev.ts > t0)
        ]
        if len(later):
            durations[uid] = (
                later.ts.min().normalize() - t0.normalize()
            ).days
    n0 = len(s)
    days = sorted(set(durations.values()))
    surv, at_risk = 1.0, n0
    expected = []
    for d in days:
        d_i = sum(1 for v in durations.values() if v == d)
        expected.append((d, d_i, at_risk))
        at_risk -= d_i
    assert [(r["d"], r["d_i"], r["n_risk"]) for r in rows] == expected
    # survival law: strictly decreasing, within [0,1], and matching the
    # direct product to float tolerance
    prod, at_risk = 1.0, n0
    for r in rows:
        prod *= 1.0 - r["d_i"] / at_risk if r["d_i"] < at_risk else 0.0
        if r["d_i"] >= at_risk:
            prod = 0.0
        at_risk -= r["d_i"]
        assert abs(r["survival"] - prod) < 2e-6, r
        assert 0.0 <= r["survival"] <= 1.0
    vals = [r["survival"] for r in rows]
    assert vals == sorted(vals, reverse=True)
