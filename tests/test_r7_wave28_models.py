"""Round-7 wave-28 behavior tests: binary dedup vs a hashlib payload
replay, top-k+OTHER conservation laws."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave28 import (
    multimodal_binary_dedup_q,
    topk_plus_other_rollup_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_binary_dedup_matches_payload_hash_replay(spark):
    row = multimodal_binary_dedup_q(spark, SF_SMALL).collect()[0]
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    groups: dict[str, int] = {}
    for t in d.text:
        n = len(t.encode("utf-8"))
        w, h = 16 + (n % 32), 16 + ((n // 32) % 32)
        payload = b"P6\n%d %d\n255\n" % (w, h) + bytes([n % 256]) * (w * h * 3)
        dig = hashlib.md5(payload).hexdigest()
        groups[dig] = groups.get(dig, 0) + 1
    assert row["distinct_payloads"] == len(groups)
    dup = [c for c in groups.values() if c > 1]
    assert row["dup_groups"] == len(dup)
    assert row["rows_in_dup_groups"] == sum(dup)
    assert row["largest_group"] == max(groups.values())
    # conservation: every document is in exactly one payload group
    assert sum(groups.values()) == len(d)


def test_topk_other_conserves_region_totals(spark):
    rows = [r.asDict() for r in topk_plus_other_rollup_q(spark, SF_SMALL).collect()]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    c = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    n = pd.read_parquet(f"{SF_SMALL}/nation.parquet")
    r = pd.read_parquet(f"{SF_SMALL}/region.parquet")
    j = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(r, left_on="n_regionkey", right_on="r_regionkey")
    )
    j["cents"] = (j.o_totalprice * 100 + 0.5).apply(math.floor).astype(int)
    rev = j.groupby(["r_name", "n_name"]).cents.sum()
    for region, grp in rev.groupby(level=0):
        got = [x for x in rows if x["region"] == region]
        # conservation: the rollup never loses revenue
        assert sum(x["cents"] for x in got) == int(grp.sum())
        # at most 3 named rows + one OTHER per region
        named = [x for x in got if x["label"] != "OTHER"]
        assert len(named) <= 3
        ranked = grp.droplevel(0).sort_values(ascending=False)
        top3 = set(ranked.index[:3]) if len(ranked) > 3 else set(ranked.index)
        # ties at the boundary resolve by nation name in the query; the
        # cents of named rows must match the replay's per-nation sums
        for x in named:
            assert x["cents"] == int(rev[(region, x["label"])])
        other = [x for x in got if x["label"] == "OTHER"]
        if len(ranked) > 3:
            assert len(other) == 1
            assert other[0]["n_nations"] == len(ranked) - 3
