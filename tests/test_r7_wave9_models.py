"""Round-7 wave-9 behavior tests: MMR selection against a pure-Python
greedy reference, rolling median against pandas, funnel latency against
a direct pandas replay — all over sf0.001."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave9 import (
    funnel_conversion_time_q,
    mmr_diversified_rerank_q,
    rolling_median_7d_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_mmr_matches_python_greedy(spark):
    got = [r.asDict() for r in mmr_diversified_rerank_q(spark, SF_SMALL).collect()]
    e = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = np.stack(e.embedding.to_numpy()).astype(np.float64)
    ids = e.vec_id.to_numpy()
    q = vecs[ids == 0][0]

    def nano_cos(a, b):
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        return math.floor(c * 1e9 + 0.5)

    rel = {int(i): nano_cos(vecs[k], q) for k, i in enumerate(ids) if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:20]
    vby = {int(i): vecs[k] for k, i in enumerate(ids)}
    sim = {
        (a, b): nano_cos(vby[a], vby[b])
        for a in cand
        for b in cand
        if a != b
    }
    sel = []
    first = max(cand, key=lambda i: (math.floor(0.7 * rel[i] + 0.5), -i))
    sel.append((1, first, math.floor(0.7 * rel[first] + 0.5)))
    while len(sel) < 5:
        pool = [i for i in cand if i not in {s[1] for s in sel}]
        scored = {
            i: math.floor(
                0.7 * rel[i]
                - 0.3 * max(sim[(i, s[1])] for s in sel)
                + 0.5
            )
            for i in pool
        }
        pick = max(pool, key=lambda i: (scored[i], -i))
        sel.append((len(sel) + 1, pick, scored[pick]))
    assert [(r["rank"], r["doc_id"], r["score_nano"]) for r in got] == sel
    # diversity: MMR's picks must not all be the top-5 by raw relevance
    top5_rel = set(sorted(rel, key=lambda i: (-rel[i], i))[:5])
    assert {r["doc_id"] for r in got} != top5_rel or len(top5_rel) < 5


def test_rolling_median_matches_pandas(spark):
    got = {
        (r["event_type"], r["d"]): r["med7"]
        for r in rolling_median_7d_q(spark, SF_SMALL).collect()
    }
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["d"] = (
        pd.to_datetime(ev.ts).dt.normalize()
        - pd.Timestamp("2024-01-01")
    ).dt.days
    daily = (
        ev.groupby(["event_type", "d"]).size().astype(float).reset_index(name="c")
    )
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("d").reset_index(drop=True)
        med = grp.c.rolling(7, min_periods=1).median()
        for d, m in zip(grp.d, med):
            assert abs(got[(et, d)] - round(m, 4)) < 1e-9, (et, d)
    assert len(got) == len(daily)


def test_funnel_conversion_time_matches_pandas(spark):
    row = funnel_conversion_time_q(spark, SF_SMALL).collect()[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["ts"] = pd.to_datetime(ev.ts)
    views = ev[ev.event_type == "view"].groupby("user_id").ts.min()
    deltas = []
    for uid, tv in views.items():
        later = ev[
            (ev.user_id == uid) & (ev.event_type == "purchase") & (ev.ts > tv)
        ]
        if len(later):
            deltas.append((later.ts.min() - tv).value / 1000)  # ns -> us
    deltas = sorted(deltas)
    assert row["n_converted"] == len(deltas)
    qs = np.quantile(deltas, [0.25, 0.5, 0.75], method="linear")
    assert abs(row["p25_sec"] - round(qs[0] / 1e6, 4)) < 2e-4
    assert abs(row["p50_sec"] - round(qs[1] / 1e6, 4)) < 2e-4
    assert abs(row["p75_sec"] - round(qs[2] / 1e6, 4)) < 2e-4
    assert row["max_sec"] == math.floor(max(deltas) / 1e6)
