"""Round-7 wave-25 behavior test: co-purchase similarity against a
pandas co-occurrence replay."""

from __future__ import annotations

import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave25 import (
    copurchase_item_similarity_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_copurchase_matches_pandas(spark):
    got = [r.asDict() for r in copurchase_item_similarity_q(spark, SF_SMALL).collect()]
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    cp = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_partkey"]
        ]
        .drop_duplicates()
    )
    n_cust = cp.groupby("l_partkey").size().to_dict()
    co: dict[tuple[int, int], int] = {}
    for _, grp in cp.groupby("o_custkey"):
        parts = sorted(grp.l_partkey)
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                co[(a, b)] = co.get((a, b), 0) + 1
    scored = [
        (
            math.floor(c / math.sqrt(n_cust[a] * n_cust[b]) * 1e6 + 0.5) / 1e6,
            a,
            b,
            c,
        )
        for (a, b), c in co.items()
        if c >= 3
    ]
    top = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[:20]
    assert [
        (r["cosine"], r["pa"], r["pb"], r["c_ab"]) for r in got
    ] == top
    for r in got:
        assert r["n_a"] == n_cust[r["pa"]] and r["n_b"] == n_cust[r["pb"]]
        # cosine of binary vectors lives in (0, 1]
        assert 0 < r["cosine"] <= 1.0
        # co-occurrence can't exceed either marginal
        assert r["c_ab"] <= min(r["n_a"], r["n_b"])
