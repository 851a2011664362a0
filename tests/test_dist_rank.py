"""Two-pass partition-histogram rank (operators/dist_rank.py).

Correctness: exact match against pandas groupby-cumsum / average-rank on
randomized data, across partition counts (partition boundaries must not
change answers). Plan shape: the four rank statistics rebuilt on it
(array_auc, rank_corr_spearman, mann_whitney_utest,
kolmogorov_smirnov_test) must contain NO unpartitioned Window over query
data — the only global window allowed is the P-row ``__tot_*`` offset
prefix-sum.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_objects_analysis_spark.operators.dist_rank import (
    dist_cumsum,
    dist_ntile,
    histogram_r2,
)
from clickhouse_objects_analysis_spark.queries import QUERIES

from .test_plan_shapes import plan_of

RANK_QUERIES = [
    "array_auc",
    "rank_corr_spearman",
    "mann_whitney_utest",
    "kolmogorov_smirnov_test",
]


@st.composite
def histogram_frames(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    keys = draw(st.lists(st.sampled_from(["a", "b", "c"]), min_size=n, max_size=n))
    vals = draw(
        st.lists(
            st.integers(min_value=-50, max_value=50), min_size=n, max_size=n
        )
    )
    cnts = draw(
        st.lists(st.integers(min_value=1, max_value=9), min_size=n, max_size=n)
    )
    pdf = pd.DataFrame({"k": keys, "v": vals, "cnt": cnts})
    # distinct (k, v) per row — dist_cumsum's documented contract
    return pdf.drop_duplicates(["k", "v"]).reset_index(drop=True)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pdf=histogram_frames(), parts=st.sampled_from([1, 3, 8]))
def test_dist_cumsum_matches_pandas(spark, pdf, parts):
    df = spark.createDataFrame(pdf)
    got = (
        dist_cumsum(df, "v", ["cnt"], keys=["k"], num_partitions=parts)
        .toPandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = pdf.sort_values(["k", "v"]).reset_index(drop=True)
    exp["cum_cnt"] = exp.groupby("k")["cnt"].cumsum()
    pd.testing.assert_frame_equal(
        got[["k", "v", "cum_cnt"]].astype({"cum_cnt": "int64"}),
        exp[["k", "v", "cum_cnt"]].astype({"cum_cnt": "int64"}),
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vals=st.lists(
        st.integers(min_value=-20, max_value=20), min_size=1, max_size=120
    ),
    parts=st.sampled_from([1, 4]),
)
def test_histogram_r2_is_doubled_average_rank(spark, vals, parts):
    pdf = pd.DataFrame({"v": vals})
    df = spark.createDataFrame(pdf)
    got = (
        histogram_r2(df, "v", num_partitions=parts)
        .toPandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    # pandas average rank per distinct value, doubled, must equal r2
    avg_rank = pdf["v"].rank(method="average")
    exp = (
        pd.DataFrame({"v": pdf["v"], "r2x": 2 * avg_rank})
        .drop_duplicates("v")
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert list(got["v"]) == list(exp["v"])
    assert [float(x) for x in got["r2"]] == [float(x) for x in exp["r2x"]]
    assert int(got["cnt"].sum()) == len(vals)
    # below = rows strictly smaller
    for _, row in got.iterrows():
        assert row["below"] == int((pdf["v"] < row["v"]).sum())


def test_dist_cumsum_no_keys(spark):
    pdf = pd.DataFrame({"v": [5, 1, 3, 9, 7], "cnt": [2, 1, 4, 1, 3]})
    got = (
        dist_cumsum(spark.createDataFrame(pdf), "v", ["cnt"], num_partitions=3)
        .toPandas()
        .sort_values("v")["cum_cnt"]
        .tolist()
    )
    assert got == [1, 5, 7, 10, 11]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    n_rows=st.integers(min_value=1, max_value=40),
    n=st.sampled_from([2, 4, 7]),
    parts=st.sampled_from([1, 3]),
)
def test_dist_ntile_matches_sql_ntile(spark, n_rows, n, parts):
    """dist_ntile must reproduce SQL ntile(n) positions exactly,
    including the +1-row head buckets when n_rows % n != 0."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    pdf = pd.DataFrame(
        {"id": range(n_rows), "v": [(i * 37) % 11 for i in range(n_rows)]}
    )
    df = spark.createDataFrame(pdf)
    got = (
        dist_ntile(df, n, ["v", "id"], num_partitions=parts)
        .toPandas()
        .sort_values("id")["bucket"]
        .tolist()
    )
    exp = (
        df.withColumn("bucket", F.ntile(n).over(Window.orderBy("v", "id")))
        .toPandas()
        .sort_values("id")["bucket"]
        .tolist()
    )
    assert got == exp


def test_limit_with_ties_keeps_null_key_group(spark):
    """rank() puts NULL order keys in a rank group (NULLS FIRST); the
    semi-join rewrite must match them null-safely, not drop them."""
    from clickhouse_objects_analysis_spark.operators.limits import (
        limit_with_ties,
    )

    df = spark.createDataFrame(
        [(None,), (None,), (1,), (1,), (2,)], "v int"
    )
    got = sorted(
        (r.v if r.v is not None else -99)
        for r in limit_with_ties(df, ["v"], 3).collect()
    )
    # NULLS FIRST: ranks are [1,1,3,3,5] -> rank<=3 keeps both NULLs and
    # both 1s
    assert got == [-99, -99, 1, 1]


def test_limit_with_ties_is_take_ordered_plus_semi_join(spark, sf_dir):
    """WITH TIES must plan as distributed top-n + broadcast semi join —
    not a single-task global rank window."""
    plan = plan_of(QUERIES["limit_with_ties"](spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan
    assert "LeftSemi" in plan
    assert "windowspecdefinition" not in plan


@pytest.mark.parametrize("name", RANK_QUERIES + ["curriculum_quality_buckets"])
def test_rank_statistics_have_no_global_window_sort(spark, sf_dir, name):
    """Every Window over query data must carry partition columns; the only
    unpartitioned window allowed is the offset prefix-sum over the
    ``__tot_*`` totals table (≤ P × |key groups| rows by construction)."""
    plan = plan_of(QUERIES[name](spark, sf_dir), "extended")
    physical = plan.split("== Physical Plan ==")[-1]
    for line in physical.splitlines():
        m = re.search(r"\bWindow\b", line)
        if not m or "windowspecdefinition" not in line:
            continue
        spec = line[line.index("windowspecdefinition") :]
        if "__tot_" in line:
            continue  # tiny offset table — the one allowed global window
        assert "__dr_pid" in spec, f"unpartitioned Window in {name}: {line[:200]}"


def test_dist_cumsum_correct_with_exchange_reuse_off(spark):
    """The (pid, keys) offset join requires both branches to observe the
    same range boundaries. The lazy localCheckpoint in dist_cumsum pins
    this even when Catalyst's exchange reuse is disabled (without the
    pin, each branch would re-sample its own boundaries)."""
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "b", "a", "b", "a"],
            "v": [5, 1, 3, 9, 7, 8, 2, 4],
            "cnt": [2, 1, 4, 1, 3, 2, 5, 1],
        }
    )
    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        got = (
            dist_cumsum(
                spark.createDataFrame(pdf), "v", ["cnt"], keys=["k"],
                num_partitions=4,
            )
            .toPandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)
    exp = pdf.sort_values(["k", "v"]).reset_index(drop=True)
    exp["cum_cnt"] = exp.groupby("k")["cnt"].cumsum()
    assert got["cum_cnt"].astype("int64").tolist() == exp["cum_cnt"].astype(
        "int64"
    ).tolist()


# --- weighted_quantile_boundary_cw (r15 two-level boundary histogram) --


@st.composite
def weighted_rows(draw):
    n = draw(st.integers(min_value=1, max_value=80))
    keys = draw(
        st.lists(st.sampled_from(["a", "b"]), min_size=n, max_size=n)
    )
    # duplicates allowed (raw rows, not a histogram); values may be
    # negative (floor-division bucketing must stay monotone there)
    vals = draw(
        st.lists(
            st.integers(min_value=-40, max_value=40), min_size=n, max_size=n
        )
    )
    wts = draw(
        st.lists(st.integers(min_value=1, max_value=7), min_size=n, max_size=n)
    )
    return pd.DataFrame({"k": keys, "v": vals, "__w": wts})


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pdf=weighted_rows(),
    width=st.sampled_from([1, 3, 16]),
    thresholds=st.sampled_from(
        [[(2, 1)], [(4, 1), (2, 1), (4, 3)], [(10, 1), (10, 9)]]
    ),
)
def test_boundary_cw_selectors_match_full_cumsum(
    spark, pdf, width, thresholds
):
    """Every min{v: a·cw >= b·tw} / max{v: a·cw <= b·tw} selector (and
    the cw at the max) over the PRUNED frame must equal the same
    selector over the full per-distinct-value cumsum — the equivalence
    the three weighted-quantile queries rely on."""
    from clickhouse_objects_analysis_spark.operators.dist_rank import (
        weighted_quantile_boundary_cw,
    )

    df = spark.createDataFrame(pdf)
    got = weighted_quantile_boundary_cw(
        df, "k", "v", thresholds, width
    ).toPandas()
    # full cumsum reference in pandas
    h = (
        pdf.groupby(["k", "v"], as_index=False)["__w"]
        .sum()
        .sort_values(["k", "v"])
    )
    h["cw"] = h.groupby("k")["__w"].cumsum()
    tw = h.groupby("k")["__w"].sum().rename("tw")
    h = h.merge(tw, on="k")
    # pruned rows must carry the EXACT cw/tw of the full cumsum
    merged = got.merge(
        h, on=["k", "v"], suffixes=("", "_ref"), how="left"
    )
    assert merged["cw_ref"].notna().all()
    assert (merged["cw"] == merged["cw_ref"]).all()
    assert (merged["tw"] == merged["tw_ref"]).all()
    for a, b in thresholds:
        for k, grp in h.groupby("k"):
            sub = got[got["k"] == k]
            lo = grp[a * grp["cw"] >= b * grp["tw"]]
            lo_sub = sub[a * sub["cw"] >= b * sub["tw"]]
            assert lo_sub["v"].min() == lo["v"].min()
            hi = grp[a * grp["cw"] <= b * grp["tw"]]
            hi_sub = sub[a * sub["cw"] <= b * sub["tw"]]
            if len(hi):
                assert len(hi_sub) and hi_sub["v"].max() == hi["v"].max()
                assert hi_sub["cw"].max() == hi["cw"].max()
            else:
                assert not len(hi_sub)


def test_boundary_cw_exact_bucket_edge_hit(spark):
    """Threshold landing exactly on a bucket boundary: the previous
    nonzero bucket must be included so max{v: 2cw <= tw} survives."""
    from clickhouse_objects_analysis_spark.operators.dist_rank import (
        weighted_quantile_boundary_cw,
    )

    pdf = pd.DataFrame(
        {
            "k": ["a"] * 4,
            "v": [0, 1, 10, 11],  # buckets (width 8): 0, 0, 1, 1
            "__w": [1, 1, 1, 1],  # tw=4; 2cw==tw exactly at v=1
        }
    )
    got = (
        weighted_quantile_boundary_cw(
            spark.createDataFrame(pdf), "k", "v", [(2, 1)], 8
        )
        .toPandas()
        .sort_values("v")
    )
    sat = got[2 * got["cw"] <= got["tw"]]
    assert sat["v"].max() == 1 and int(sat["cw"].max()) == 2
    cross = got[2 * got["cw"] >= got["tw"]]
    assert cross["v"].min() == 1
