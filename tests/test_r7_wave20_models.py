"""Round-7 wave-20 behavior tests: the data-quality trio against
pandas replays, plus the audits' designed positive/negative cases."""

from __future__ import annotations

import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave20 import (
    functional_dependency_audit_q,
    referential_integrity_audit_q,
    snapshot_diff_report_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_snapshot_diff_matches_pandas(spark):
    row = snapshot_diff_report_q(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    cents = (o.o_totalprice * 100 + 0.5).apply(math.floor).astype(int)
    o = o.assign(cents=cents)
    removed = o[o.o_orderkey % 13 == 2]
    survived = o[o.o_orderkey % 13 != 2]
    changed = survived[
        (survived.o_orderkey % 11 == 5)
    ]
    assert row["n_added"] == 0  # the new snapshot derives from old keys
    assert row["n_removed"] == len(removed)
    assert row["n_changed"] == len(changed)
    assert row["n_unchanged"] == len(survived) - len(changed)
    assert row["total_cents_drift"] == 500 * len(changed)
    # conservation: every old row lands in exactly one class
    assert (
        row["n_removed"] + row["n_changed"] + row["n_unchanged"] == len(o)
    )


def test_referential_integrity_clean_on_testdata(spark):
    got = {r["fk"]: r.asDict() for r in referential_integrity_audit_q(spark, SF_SMALL).collect()}
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    assert got["lineitem.l_orderkey -> orders"]["n_rows"] == len(li)
    assert got["orders.o_custkey -> customer"]["n_rows"] == len(o)
    # TPC-H-shaped testdata is referentially intact — all audits clean
    expected_orphans = {
        "lineitem.l_orderkey -> orders": int(
            (~li.l_orderkey.isin(o.o_orderkey)).sum()
        ),
    }
    for fk, g in got.items():
        if fk in expected_orphans:
            assert g["n_orphans"] == expected_orphans[fk]
        assert 0 <= g["n_orphans"] <= g["n_rows"]


def test_functional_dependencies_true_and_false_cases(spark):
    got = {r["fd"]: r["n_violating_keys"] for r in functional_dependency_audit_q(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    # true dependencies hold
    assert got["orders: o_orderkey -> o_custkey"] == 0
    assert got["nation: n_nationkey -> n_regionkey"] == 0
    # the audit SURFACED a real testdata property: (l_orderkey,
    # l_linenumber) is NOT unique in the synthetic lineitem — pin the
    # violating-key count against a pandas recount
    dup_keys = int(
        (li.groupby(["l_orderkey", "l_linenumber"]).size() > 1).sum()
    )
    assert got["lineitem: (l_orderkey,l_linenumber) unique"] == dup_keys
    assert dup_keys > 0
    # the deliberately false rule must report real violations
    expected = int(
        (ev.groupby("user_id").event_type.nunique() > 1).sum()
    )
    assert got["events: user_id -> event_type (expected violated)"] == expected
    assert expected > 0
