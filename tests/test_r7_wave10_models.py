"""Round-7 wave-10 behavior tests: z-score monitor vs a pandas replay,
schema-evolution merge read invariants, deterministic quantile vs a
hashlib replay — all over sf0.001."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave10 import (
    quantile_deterministic_q,
    rate_spike_zscore_q,
    source_schema_evolution_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_rate_spike_zscore_matches_pandas(spark):
    got = {
        (r["event_type"], r["d"]): (r["c"], r["z"])
        for r in rate_spike_zscore_q(spark, SF_SMALL).collect()
    }
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["d"] = (
        pd.to_datetime(ev.ts).dt.normalize() - pd.Timestamp("2024-01-01")
    ).dt.days
    daily = ev.groupby(["event_type", "d"]).size().reset_index(name="c")
    n_expected = 0
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("d").reset_index(drop=True)
        cs = grp.c.tolist()
        for i in range(len(cs)):
            prior = cs[max(0, i - 14) : i]
            n = len(prior)
            if n < 7:
                continue
            s1, s2 = sum(prior), sum(v * v for v in prior)
            var = (s2 - s1 * s1 / n) / (n - 1)
            if var <= 0:
                continue
            n_expected += 1
            z = math.floor((cs[i] - s1 / n) / math.sqrt(var) * 1e4 + 0.5) / 1e4
            gc, gz = got[(et, int(grp.d[i]))]
            assert gc == cs[i]
            assert abs(gz - z) < 1e-9, (et, grp.d[i], gz, z)
    assert len(got) == n_expected


def test_schema_evolution_counts(spark):
    got = {r["batch"]: r.asDict() for r in source_schema_evolution_q(spark, SF_SMALL).collect()}
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    even, odd = o[o.o_orderkey % 2 == 0], o[o.o_orderkey % 2 == 1]
    assert got[1]["n"] == len(even) and got[2]["n"] == len(odd)
    assert got[1]["n_priority"] == 0  # column absent in batch-1 files
    assert got[2]["n_priority"] == len(odd)  # fully populated in batch 2
    for b, df in ((1, even), (2, odd)):
        cents = int(np.floor(df.o_totalprice.to_numpy() * 100 + 0.5).sum())
        assert got[b]["sum_cents"] == cents


def test_quantile_deterministic_matches_hash_replay(spark):
    got = {
        r["event_type"]: (r["n_sampled"], r["median_sampled"])
        for r in quantile_deterministic_q(spark, SF_SMALL).collect()
    }
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    for et, grp in ev.groupby("event_type"):
        keyed = sorted(
            (hashlib.md5(str(eid).encode()).hexdigest(), eid, val)
            for eid, val in zip(grp.event_id, grp.value)
        )[:100]
        vals = sorted(v for _, _, v in keyed)
        n = len(vals)
        med = (
            vals[n // 2]
            if n % 2
            else (vals[n // 2 - 1] + vals[n // 2]) / 2
        )
        med = math.floor(med * 1e6 + 0.5) / 1e6
        assert got[et] == (min(len(grp), 100), med), et
    # determinism: a rerun returns the identical sample median
    again = {
        r["event_type"]: (r["n_sampled"], r["median_sampled"])
        for r in quantile_deterministic_q(spark, SF_SMALL).collect()
    }
    assert again == got
