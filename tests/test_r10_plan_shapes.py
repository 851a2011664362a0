"""Physical-plan shape assertions for the round-10 session-2 queries —
the SCALE.md claims made checkable: grid self-joins broadcast (never
sort-merge two row-scale sides), the Kruskal–Wallis rewrite really did
remove the row-scale join-back, the ratio-metric join broadcasts the
dimension side, and the leakage matrix rides the banded LSH join rather
than a cartesian."""

from __future__ import annotations

import contextlib
import io

from clickhouse_objects_analysis_spark.queries import QUERIES


def plan_of(df, mode: str = "simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_gamma_grid_self_join_is_broadcast(spark, sf_dir):
    plan = plan_of(QUERIES["goodman_kruskal_gamma"](spark, sf_dir))
    # the ≤110-cell grid crosses via a broadcast nested loop (theta
    # condition), never a data-sized SortMergeJoin
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kruskal_has_no_rowscale_join(spark, sf_dir):
    # after the histogram-pass rewrite the only joins left are the
    # broadcast of the 1-row ties/H frames — no join at row scale
    plan = plan_of(QUERIES["kruskal_wallis_htest"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_delta_method_broadcasts_customer_side(spark, sf_dir):
    plan = plan_of(QUERIES["delta_method_ratio_ci"](spark, sf_dir))
    # at test SF the customer projection broadcasts; either hash join
    # strategy is fine but a cartesian is not
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_hodges_lehmann_crosses_histograms_only(spark, sf_dir):
    plan = plan_of(QUERIES["hodges_lehmann_shift"](spark, sf_dir))
    # the $10-bin histograms cross via broadcast; the raw rows never
    # reach a join
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_leakage_rides_banded_join(spark, sf_dir):
    plan = plan_of(QUERIES["source_neardup_leakage"](spark, sf_dir))
    # LSH candidates come from an equi-join on (band_id, band_key) —
    # a hash join, never a cartesian / pure-theta nested loop
    assert "CartesianProduct" not in plan


def test_scan_agg_singletons_have_one_exchange(spark, sf_dir):
    # one-scan agg-to-constant queries: a single shuffle (the hash
    # aggregation's), nothing else
    for name in ("cohens_kappa_rules", "odds_ratio_ci",
                 "cochran_armitage_trend"):
        plan = plan_of(QUERIES[name](spark, sf_dir))
        # BroadcastExchange also matches "Exchange" — count only the
        # shuffling kind. The grid queries pay at most the grid agg's
        # hash exchange plus the final ordering's range exchange.
        n_shuffle = plan.count("Exchange hashpartitioning")
        assert n_shuffle <= 2, f"{name}: {n_shuffle} shuffles\n{plan}"
        assert "SortMergeJoin" not in plan, name
