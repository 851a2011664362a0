"""Round-7 wave-18 behavior tests: deletion-vector reads, runtime DPP
(plan-asserted), and linear attribution vs a Python replay."""

from __future__ import annotations

import contextlib
import io
import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave18 import (
    deletion_vector_read_q,
    dynamic_partition_pruning_join_q,
    linear_touch_attribution_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_deletion_vector_counts(spark):
    row = deletion_vector_read_q(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    deleted = o[o.o_orderkey % 7 == 3]
    live = o[o.o_orderkey % 7 != 3]
    assert row["n_deleted"] == len(deleted)
    assert row["n_live"] == len(live)
    assert row["n_live"] + row["n_deleted"] == len(o)  # nothing lost
    cents = sum(math.floor(p * 100 + 0.5) for p in live.o_totalprice)
    assert row["live_cents"] == cents


def test_dpp_subquery_filter_reaches_fact_scan(spark):
    df = dynamic_partition_pruning_join_q(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the runtime partition filter must be injected into the fact scan
    assert "dynamicpruning" in plan.lower(), plan[:800]
    got = {r["part_month"]: (r["n"], r["cents"]) for r in df.collect()}
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["m"] = pd.to_datetime(o.o_orderdate).dt.strftime("%Y-%m")
    q1 = {"1995-01", "1995-02", "1995-03"}
    expected_months = set(o.m) & q1
    assert set(got) == expected_months
    for m in expected_months:
        grp = o[o.m == m]
        assert got[m][0] == len(grp)
        assert got[m][1] == sum(
            math.floor(p * 100 + 0.5) for p in grp.o_totalprice
        )


def test_linear_attribution_matches_python(spark):
    got = {r["event_type"]: r.asDict() for r in linear_touch_attribution_q(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["ts"] = pd.to_datetime(ev.ts)
    conv = ev[ev.event_type == "purchase"].groupby("user_id").ts.min()
    exp: dict[str, list[int]] = {}
    for uid, tc in conv.items():
        touches = ev[(ev.user_id == uid) & (ev.ts < tc)]
        n = len(touches)
        for et in touches.event_type:
            exp.setdefault(et, []).append(1000000000 // n)
    assert set(got) == set(exp)
    total_credit = 0
    for et, credits in exp.items():
        assert got[et]["n_touches"] == len(credits)
        assert got[et]["credit_nano"] == sum(credits)
        total_credit += sum(credits)
    # each converting user with touches distributes ~1e9 nanos (short
    # only of the DIV remainder, < n per user)
    crediting_users = sum(
        1 for uid, tc in conv.items()
        if len(ev[(ev.user_id == uid) & (ev.ts < tc)])
    )
    assert total_credit <= 1000000000 * crediting_users
    assert total_credit > 999000000 * crediting_users
