"""Round-5 aggregate wave vs independent numpy/pandas models — same
strategy as test_w6_models: recompute the statistic from the raw parquet
with a different library and compare to the registry query's output."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def li(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


def test_theils_u_model(spark, sf_dir, orders):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = QUERIES["theils_u"](spark, sf_dir).collect()[0]
    ct = pd.crosstab(orders["o_orderpriority"], orders["o_orderstatus"])
    n = ct.to_numpy().sum()
    px = ct.sum(axis=1).to_numpy() / n
    hx = -(px * np.log(px)).sum()
    hxy = 0.0
    for y in ct.columns:
        col = ct[y].to_numpy()
        ny = col.sum()
        nz = col[col > 0]
        hxy += -((nz / n) * np.log(nz / ny)).sum()
    assert got.n == n
    assert got.theils_u == pytest.approx((hx - hxy) / hx, abs=1e-5)


def test_mean_z_test_model(spark, sf_dir, li):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = QUERIES["mean_z_test"](spark, sf_dir).collect()[0]
    cents = (li["l_extendedprice"] * 100).round().astype("int64")
    a = cents[li["l_returnflag"] == "A"].to_numpy()
    r = cents[li["l_returnflag"] == "R"].to_numpy()
    z = (a.mean() - r.mean()) / np.sqrt(
        a.var() / len(a) + r.var() / len(r)
    )
    assert (got.n_a, got.n_r) == (len(a), len(r))
    assert got.z_stat == pytest.approx(z, abs=1e-4)


def test_categorical_iv_model(spark, sf_dir, orders):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = QUERIES["categorical_iv"](spark, sf_dir).collect()[0]
    bad = (orders["o_orderstatus"] == "F").astype(int)
    df = pd.DataFrame({"cat": orders["o_orderpriority"], "bad": bad})
    per = df.groupby("cat")["bad"].agg(["sum", "count"])
    g = per["count"] - per["sum"]
    b = per["sum"]
    keep = (g > 0) & (b > 0)
    gr = g[keep] / g.sum()
    br = b[keep] / b.sum()
    iv = ((gr - br) * np.log(gr / br)).sum()
    assert got.n_cats == int(keep.sum())
    assert got.information_value == pytest.approx(iv, abs=1e-5)


def test_sparkbar_is_24_glyphs_from_palette(spark, sf_dir):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    rows = QUERIES["sparkbar_hourly"](spark, sf_dir).collect()
    palette = set("▁▂▃▄▅▆▇█")
    assert rows
    for r in rows:
        assert len(r.bar) == 24
        assert set(r.bar) <= palette
        assert "█" in r.bar  # the max bucket always renders full height
