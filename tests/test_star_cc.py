"""large-star/small-star connected components vs min-label propagation:
identical labels on arbitrary graphs, and the O(log n)-round guarantee on
the adversarial chain shape where min-label needs O(n) rounds."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_objects_analysis_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _labels(df):
    return {(r["node"], r["component"]) for r in df.collect()}


edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=40,
)


@given(edges=edge_lists)
@settings(**_SETTINGS)
def test_star_matches_minlabel_on_random_graphs(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    assert _labels(connected_components_star(df)) == _labels(
        connected_components(df)
    )


def test_chain_converges_in_log_rounds(spark):
    """A 256-node chain: min-label propagation moves the label one hop per
    round (needs ~n rounds); the star alternation folds the chain roughly
    in half each time, so 12 alternations must suffice for n=256."""
    n = 256
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = _labels(connected_components_star(df, max_iter=12))
    assert got == {(i, 0) for i in range(n)}


def test_minlabel_chain_needs_linear_rounds(spark):
    """Sanity of the comparison: the same 12-round budget leaves min-label
    propagation unconverged on the chain — the asymptotic gap is real."""
    n = 256
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = _labels(connected_components(df, max_iter=12))
    assert got != {(i, 0) for i in range(n)}


def test_auto_small_graphs_take_driver_union_find(spark, monkeypatch):
    """r12: at or below _CC_DRIVER_GATE edges the auto wrapper resolves
    by driver union-find — neither distributed algorithm may run — with
    the same canonical min-id labels."""
    from clickhouse_objects_analysis_spark.operators import dedup as d

    calls = []
    monkeypatch.setattr(
        d, "connected_components_star",
        lambda *a, **k: calls.append("star"),
    )
    monkeypatch.setattr(
        d, "connected_components",
        lambda *a, **k: calls.append("minlabel"),
    )
    n = 256
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = _labels(d.connected_components_auto(df))
    assert calls == []
    assert got == {(i, 0) for i in range(n)}


def test_auto_routes_chain_to_star(spark, monkeypatch):
    """Past the driver gate, the density probe must send a 256-node
    chain (1 edge per node) to the star algorithm — the adversarial
    shape where min-label needs O(n) rounds — and still produce the
    right components. The gate is pinned to 0 so the routing logic is
    what's under test."""
    from clickhouse_objects_analysis_spark.operators import dedup as d

    monkeypatch.setattr(d, "_CC_DRIVER_GATE", 0)
    calls = []
    real = d.connected_components_star
    monkeypatch.setattr(
        d, "connected_components_star",
        lambda *a, **k: calls.append("star") or real(*a, **k),
    )
    n = 256
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = _labels(d.connected_components_auto(df))
    assert calls == ["star"]
    assert got == {(i, 0) for i in range(n)}


def test_auto_routes_dense_cliques_to_minlabel(spark, monkeypatch):
    """Clique-like dup clusters (edges >> nodes) take the O(diameter)
    min-label path (driver gate pinned to 0 — routing under test)."""
    from clickhouse_objects_analysis_spark.operators import dedup as d

    monkeypatch.setattr(d, "_CC_DRIVER_GATE", 0)
    calls = []
    real = d.connected_components
    monkeypatch.setattr(
        d, "connected_components",
        lambda *a, **k: calls.append("minlabel") or real(*a, **k),
    )
    # two 8-cliques: 2*28 edges over 16 nodes -> 3.5 edges/node
    edges = [
        (base + i, base + j)
        for base in (0, 100)
        for i in range(8)
        for j in range(i + 1, 8)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = _labels(d.connected_components_auto(df))
    assert calls == ["minlabel"]
    assert got == {(i, 0) for i in range(8)} | {
        (100 + i, 100) for i in range(8)
    }


def test_pick_cc_algorithm_probe():
    from clickhouse_objects_analysis_spark.operators.dedup import (
        pick_cc_algorithm,
    )

    assert pick_cc_algorithm(255, 256) == "star"          # chain
    assert pick_cc_algorithm(56, 16) == "minlabel"        # cliques
    assert pick_cc_algorithm(0, 0) == "star"              # empty-safe
