"""Round-7 wave-24 behavior test: the Lorenz curve against a pandas
replay of exact ntile semantics, plus concentration laws."""

from __future__ import annotations

import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave24 import (
    lorenz_curve_customers_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_lorenz_matches_pandas_ntile(spark):
    rows = [r.asDict() for r in lorenz_curve_customers_q(spark, SF_SMALL).collect()]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    cents = (o.o_totalprice * 100 + 0.5).apply(math.floor).astype(int)
    rev = (
        o.assign(cents=cents)
        .groupby("o_custkey")
        .cents.sum()
        .reset_index()
        .sort_values(["cents", "o_custkey"])
        .reset_index(drop=True)
    )
    n = len(rev)
    q, r = divmod(n, 10)
    deciles = []
    for p in range(n):  # exact SQL ntile tie-split positions
        if p < r * (q + 1):
            deciles.append(p // (q + 1) + 1)
        else:
            deciles.append(r + (p - r * (q + 1)) // q + 1)
    rev["decile"] = deciles
    agg = rev.groupby("decile").agg(
        n_customers=("cents", "size"), cents=("cents", "sum")
    )
    total = int(agg.cents.sum())
    assert [r_["decile"] for r_ in rows] == list(range(1, 11))
    cum = 0
    for r_ in rows:
        a = agg.loc[r_["decile"]]
        assert r_["n_customers"] == int(a.n_customers)
        assert r_["cents"] == int(a.cents)
        assert abs(
            r_["revenue_share"]
            - math.floor(int(a.cents) / total * 1e6 + 0.5) / 1e6
        ) < 1e-9
        cum += int(a.cents)
        assert abs(
            r_["cum_share"] - math.floor(cum / total * 1e6 + 0.5) / 1e6
        ) < 1e-9
    # concentration laws: shares are non-decreasing across deciles
    shares = [r_["revenue_share"] for r_ in rows]
    assert shares == sorted(shares)
    assert abs(rows[-1]["cum_share"] - 1.0) < 2e-6
