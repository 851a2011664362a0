"""Independent numpy models for the wave-6 statistics: the DuckDB
oracles share this repo's algebra (same expression trees by design —
that is what the hash gate needs), so these tests recompute the
statistics from raw data with textbook numpy formulas to guard the
formulas themselves."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def li(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


def test_covar_avg_weighted_model(spark, sf_dir, li):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = {
        r["l_returnflag"]: r
        for r in QUERIES["covar_avg_weighted"](spark, sf_dir).collect()
    }
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_quantity"].to_numpy(dtype=float)
        y = g["l_extendedprice"].to_numpy(dtype=float)
        assert got[flag]["covar_pop"] == pytest.approx(
            np.cov(x, y, bias=True)[0, 1], rel=1e-5, abs=1e-4
        )
        assert got[flag]["covar_samp"] == pytest.approx(
            np.cov(x, y, bias=False)[0, 1], rel=1e-5, abs=1e-4
        )
        assert got[flag]["avg_weighted"] == pytest.approx(
            np.average(y, weights=x), rel=1e-6
        )


def test_student_welch_ttest_model(spark, sf_dir, li):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    row = QUERIES["student_welch_ttest"](spark, sf_dir).collect()[0]
    a = li.loc[li["l_returnflag"] == "A", "l_extendedprice"].to_numpy(float)
    r = li.loc[li["l_returnflag"] == "R", "l_extendedprice"].to_numpy(float)
    na, nr = len(a), len(r)
    va, vr = a.var(ddof=1), r.var(ddof=1)
    sp2 = ((na - 1) * va + (nr - 1) * vr) / (na + nr - 2)
    t_student = (a.mean() - r.mean()) / np.sqrt(sp2 * (1 / na + 1 / nr))
    t_welch = (a.mean() - r.mean()) / np.sqrt(va / na + vr / nr)
    df_welch = (va / na + vr / nr) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vr / nr) ** 2 / (nr - 1)
    )
    assert row["n_a"] == na and row["n_r"] == nr
    assert row["t_student"] == pytest.approx(t_student, rel=1e-4, abs=1e-5)
    assert row["t_welch"] == pytest.approx(t_welch, rel=1e-4, abs=1e-5)
    assert row["df_welch"] == pytest.approx(df_welch, rel=1e-4)


def test_array_auc_model(spark, sf_dir):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    row = QUERIES["array_auc"](spark, sf_dir).collect()[0]
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    score = np.array([v[0] for v in e["embedding"]], dtype=np.float64)
    pos = (e["label"].to_numpy() >= 5).astype(int)
    # textbook: P(score_pos > score_neg) + 0.5 * P(tie)
    sp, sn = score[pos == 1], score[pos == 0]
    gt = (sp[:, None] > sn[None, :]).sum()
    eq = (sp[:, None] == sn[None, :]).sum()
    auc = (gt + 0.5 * eq) / (len(sp) * len(sn))
    assert row["n_pos"] == len(sp) and row["n_neg"] == len(sn)
    assert row["auc"] == pytest.approx(auc, abs=1e-6)


def test_max_intersections_model(spark, sf_dir):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = {
        r["user_id"]: r
        for r in QUERIES["max_intersections"](spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["event_type"] == "view"]
    hour_us = 3600 * 10**6
    for uid, g in ev.groupby("user_id"):
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        pts = sorted(
            [(x, 1) for x in t] + [(x + hour_us, -1) for x in t],
            key=lambda p: (p[0], p[1]),
        )
        best, cur, at = 0, 0, None
        for x, d in pts:
            cur += d
            if cur > best:
                best, at = cur, x
        assert got[uid]["max_intersections"] == best
        assert got[uid]["at_us"] == at


def test_rank_corr_spearman_model(spark, sf_dir, li):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = {
        r["l_returnflag"]: r["spearman_rho"]
        for r in QUERIES["rank_corr_spearman"](spark, sf_dir).collect()
    }
    for flag, g in li.groupby("l_returnflag"):
        rx = g["l_quantity"].rank(method="average").to_numpy()
        ry = (
            (g["l_extendedprice"] * 100).round().astype("int64")
            .rank(method="average").to_numpy()
        )
        rho = np.corrcoef(rx, ry)[0, 1]
        assert got[flag] == pytest.approx(rho, abs=1e-5)


def test_mann_whitney_model(spark, sf_dir, li):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    row = QUERIES["mann_whitney_utest"](spark, sf_dir).collect()[0]
    sub = li[li["l_returnflag"].isin(["A", "R"])].copy()
    y = (sub["l_extendedprice"] * 100).round().astype("int64")
    ranks = y.rank(method="average")
    a_mask = (sub["l_returnflag"] == "A").to_numpy()
    na, nr = int(a_mask.sum()), int((~a_mask).sum())
    u_a = ranks[a_mask].sum() - na * (na + 1) / 2
    n = na + nr
    _, t = np.unique(y, return_counts=True)
    tcorr = float((t.astype(np.float64) ** 3 - t).sum())
    sigma = np.sqrt(na * nr / 12.0 * ((n + 1) - tcorr / (n * (n - 1))))
    z = (u_a - na * nr / 2) / sigma
    assert row["n_a"] == na and row["n_r"] == nr
    assert row["u_a"] == pytest.approx(u_a, abs=0.51)
    assert row["z_stat"] == pytest.approx(z, abs=1e-5)


def test_lttb_model(spark, sf_dir):
    """Independent Python LTTB (mean-anchored variant): same bucketing,
    exact integer area comparison, same tie-breaks."""
    from fractions import Fraction

    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = {}
    for r in QUERIES["lttb_downsample"](spark, sf_dir).collect():
        got[(r["user_id"], r["bucket"])] = (r["t_us"], r["v_cents"])

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["event_type"] == "purchase"].copy()
    ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["y"] = (ev["value"] * 100).round().astype("int64")
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["t", "event_id"]).reset_index(drop=True)
        n = len(g)
        x = (g["t"] - g["t"].min()).to_numpy()
        y = g["y"].to_numpy()
        buckets: dict[int, list[int]] = {}
        for i in range(n):
            buckets.setdefault(i * 10 // n, []).append(i)
        bids = sorted(buckets)
        for j, b in enumerate(bids):
            idx = buckets[b]
            if j == 0:
                pick = idx[0]
            elif j == len(bids) - 1:
                pick = idx[-1]
            else:
                prev, nxt = buckets[bids[j - 1]], buckets[bids[j + 1]]
                ax = Fraction(int(sum(x[k] for k in prev)), len(prev))
                ay = Fraction(int(sum(y[k] for k in prev)), len(prev))
                cx = Fraction(int(sum(x[k] for k in nxt)), len(nxt))
                cy = Fraction(int(sum(y[k] for k in nxt)), len(nxt))
                best = None
                for k in idx:
                    area = abs(
                        (Fraction(int(x[k])) - ax) * (cy - ay)
                        - (cx - ax) * (Fraction(int(y[k])) - ay)
                    )
                    key = (-area, int(g["t"][k]), int(g["event_id"][k]))
                    if best is None or key < best[0]:
                        best = (key, k)
                pick = best[1]
            assert got[(uid, b)] == (int(g["t"][pick]), int(y[pick])), (
                uid, b,
            )


def test_cramers_v_model(spark, sf_dir):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    row = QUERIES["cramers_v_contingency"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    ct = pd.crosstab(o["o_orderstatus"], o["o_orderpriority"]).to_numpy()
    n = ct.sum()
    e = np.outer(ct.sum(1), ct.sum(0)) / n
    chi2 = ((ct - e) ** 2 / e).sum()
    v = np.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    cc = np.sqrt(chi2 / (chi2 + n))
    assert row["n"] == n
    assert row["cramers_v"] == pytest.approx(v, abs=1e-5)
    assert row["contingency_coef"] == pytest.approx(cc, abs=1e-5)


def test_quantiles_exact_weighted_model(spark, sf_dir, li):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = {
        r["l_returnflag"]: r
        for r in QUERIES["quantiles_exact_weighted"](spark, sf_dir).collect()
    }
    for flag, g in li.groupby("l_returnflag"):
        y = (g["l_extendedprice"] * 100).round().astype("int64").to_numpy()
        w = g["l_quantity"].astype("int64").to_numpy()
        order = np.argsort(y, kind="stable")
        ys, ws = y[order], w[order]
        cw = np.cumsum(ws)
        tw = int(cw[-1])
        for col, q in (("p25_cents", 0.25), ("p50_cents", 0.5),
                       ("p75_cents", 0.75)):
            expected = int(ys[np.searchsorted(cw, q * tw)])
            assert got[flag][col] == expected, (flag, col)


def test_kolmogorov_smirnov_model(spark, sf_dir, li):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    row = QUERIES["kolmogorov_smirnov_test"](spark, sf_dir).collect()[0]
    a = np.sort(
        (li.loc[li["l_returnflag"] == "A", "l_extendedprice"] * 100)
        .round().astype("int64").to_numpy()
    )
    r = np.sort(
        (li.loc[li["l_returnflag"] == "R", "l_extendedprice"] * 100)
        .round().astype("int64").to_numpy()
    )
    grid = np.unique(np.concatenate([a, r]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fr = np.searchsorted(r, grid, side="right") / len(r)
    d = np.abs(fa - fr).max()
    assert row["n_a"] == len(a) and row["n_r"] == len(r)
    assert row["ks_stat"] == pytest.approx(d, abs=1e-6)


def test_scrub_boilerplate_fixture(spark):
    """Handcrafted corpus: the span 'one two three four five' appears in
    3 docs (boilerplate at df>=3); 'alpha beta gamma delta eps' appears
    in only 2 (kept)."""
    from clickhouse_objects_analysis_spark.queries.llm_wave6 import (
        scrub_boilerplate_spans,
    )

    bp = "one two three four five"
    rare = "alpha beta gamma delta eps"
    docs = [
        (1, f"intro {bp} outro"),
        (2, f"{bp} tail words here"),
        (3, f"pre text {bp}"),
        (4, f"{rare} solo"),
        (5, f"{rare} again here"),
        (6, "totally unrelated text content"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in scrub_boilerplate_spans(df, "doc_id", "text").collect()
    }
    assert got[1]["scrubbed_text"] == "intro outro"
    assert got[1]["n_removed"] == 5
    assert got[2]["scrubbed_text"] == "tail words here"
    assert got[3]["scrubbed_text"] == "pre text"
    # df=2 span survives
    assert got[4]["scrubbed_text"] == f"{rare} solo"
    assert got[4]["n_removed"] == 0
    assert got[6]["scrubbed_text"] == "totally unrelated text content"


def test_kurt_pop_float_path_is_non_excess(spark):
    """functions/ch.py kurtPop must be NON-excess (m4/m2^2), matching
    the exact twin skew_kurt_agg — Spark's kurtosis is excess, so the
    builder adds the 3 back. [1,2,3,4]: m2=1.25, m4=2.5625 -> 1.64."""
    from clickhouse_objects_analysis_spark.functions.ch import ch_expr

    import pyspark.sql.functions as F

    df = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4)], "v double")
    got = df.agg(ch_expr("kurtPop", F.col("v")).alias("k")).collect()[0].k
    assert abs(got - 1.64) < 1e-9


def test_rank_corr_absent_from_translation_table():
    """rankCorr has no single-expression Spearman form; aliasing Pearson
    under the name would be a wrong statistic. It must stay absent."""
    from clickhouse_objects_analysis_spark.functions.ch import CH_FUNCTIONS

    assert "rankCorr" not in CH_FUNCTIONS
