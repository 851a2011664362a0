"""Round-7 wave-12 behavior tests: robust statistics and event
analytics against direct pandas/Python replays over sf0.001."""

from __future__ import annotations

import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave12 import (
    event_transition_matrix_q,
    first_touch_attribution_q,
    mad_robust_scale_q,
    trimmed_mean_value_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["ts"] = pd.to_datetime(ev.ts)
    return ev


def _median(vals) -> float:
    vals = sorted(vals)
    n = len(vals)
    return vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2


def test_mad_matches_python(spark):
    got = {r["event_type"]: r.asDict() for r in mad_robust_scale_q(spark, SF_SMALL).collect()}
    ev = _events()
    q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    for et, grp in ev.groupby("event_type"):
        m = _median(grp.value.tolist())
        mad = _median([abs(v - m) for v in grp.value])
        g = got[et]
        assert abs(g["median_value"] - q6(m)) < 1e-9
        assert abs(g["mad"] - q6(mad)) < 1e-9
        assert abs(g["sigma_robust"] - q6(mad * 1.4826)) < 1e-9
        # MAD is resistant: it must be <= the max abs deviation and > 0
        assert 0 < g["mad"] <= max(abs(v - m) for v in grp.value)


def test_trimmed_mean_matches_python(spark):
    got = {r["event_type"]: r.asDict() for r in trimmed_mean_value_q(spark, SF_SMALL).collect()}
    ev = _events()
    for et, grp in ev.groupby("event_type"):
        order = grp.sort_values(["value", "event_id"]).value.tolist()
        n = len(order)
        cut = math.floor(n * 0.05)
        kept = order[cut : n - cut]
        micro = [math.floor(v * 1e6 + 0.5) for v in kept]
        tm = sum(micro) / len(micro) / 1e6
        g = got[et]
        assert g["n_kept"] == len(kept)
        assert abs(g["trimmed_mean"] - math.floor(tm * 1e6 + 0.5) / 1e6) < 1e-9
        # trimming must pull the mean toward the median vs raw mean
        assert min(kept) >= order[0] and max(kept) <= order[-1]


def test_first_touch_attribution_matches_python(spark):
    got = {r["first_touch"]: r.asDict() for r in first_touch_attribution_q(spark, SF_SMALL).collect()}
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    users = {}
    for uid, grp in ev.groupby("user_id"):
        first = grp.iloc[0]
        later_purchase = (
            (grp.event_type == "purchase") & (grp.ts > first.ts)
        ).any()
        users[uid] = (first.event_type, bool(later_purchase))
    exp = {}
    for ft, conv in users.values():
        n, c = exp.get(ft, (0, 0))
        exp[ft] = (n + 1, c + conv)
    assert set(got) == set(exp)
    for ft, (n, c) in exp.items():
        g = got[ft]
        assert (g["n_users"], g["n_converted"]) == (n, c)
        assert abs(g["conversion_rate"] - math.floor(c / n * 1e4 + 0.5) / 1e4) < 1e-9
    assert sum(g["n_users"] for g in got.values()) == len(users)


def test_transition_matrix_rows_are_distributions(spark):
    rows = [r.asDict() for r in event_transition_matrix_q(spark, SF_SMALL).collect()]
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    pairs = {}
    for _, grp in ev.groupby("user_id"):
        types = grp.event_type.tolist()
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    got_n = {(r["src"], r["dst"]): r["n"] for r in rows}
    assert got_n == pairs
    by_src: dict[str, float] = {}
    for r in rows:
        by_src[r["src"]] = by_src.get(r["src"], 0.0) + r["p_transition"]
    # each row of the matrix sums to ~1 (floor quantization slack)
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-4, (src, total)
