"""Catalog-scale lineage extraction (VERDICT r5 item 5): the exact parse
path must handle a 1k-view synthetic catalog in seconds via the bounded
driver thread pool, with per-edge fidelity markers; the distributed regex
path must agree on the same catalog (the >10k-view route)."""

from __future__ import annotations

import time

import pytest


def _synthetic_catalog(n: int) -> list[tuple[str, str, str]]:
    """n Spark-parseable view DDLs over a 50-table / 7-dim base layer."""
    views = []
    for i in range(n):
        ddl = (
            f"CREATE VIEW cat.v_{i:04d} AS "
            f"SELECT a.id, b.name FROM cat.t_{i % 50} a "
            f"JOIN cat.dim_{i % 7} b ON a.k = b.k "
            f"WHERE a.id IN (SELECT id FROM cat.allow_{i % 3})"
        )
        views.append(("cat", f"v_{i:04d}", ddl))
    return views


@pytest.fixture(scope="module")
def catalog():
    return _synthetic_catalog(1000)


def test_1k_view_exact_extraction_under_30s(spark, catalog):
    from clickhouse_objects_analysis_spark.plans.lineage import (
        view_dependencies_with_method,
    )

    t0 = time.perf_counter()
    edges, errors = view_dependencies_with_method(spark, catalog)
    rows = edges.collect()
    elapsed = time.perf_counter() - t0
    assert elapsed < 30, f"1k-view exact extraction took {elapsed:.1f}s"
    assert errors.count() == 0
    # 3 deps per view, every one parse-grade
    assert len(rows) == 3000
    assert {r.method for r in rows} == {"exact"}
    by_view = {}
    for r in rows:
        by_view.setdefault(r.view, set()).add(r.dep)
    assert by_view["cat.v_0007"] == {"cat.t_7", "cat.dim_0", "cat.allow_1"}


def test_pool_matches_sequential(spark, catalog):
    """The thread pool must be a pure speedup — identical edges to a
    single-worker run on a 100-view slice."""
    from clickhouse_objects_analysis_spark.plans.lineage import (
        view_dependencies,
    )

    subset = catalog[:100]
    pooled, _ = view_dependencies(spark, subset)
    seq, _ = view_dependencies(spark, subset, max_workers=1)
    assert sorted(map(tuple, pooled.collect())) == sorted(
        map(tuple, seq.collect())
    )


def test_distributed_fallback_agrees(spark, catalog):
    """The executor-side route (no parser available) must produce the
    same edge set on this corpus, every edge marked 'token' (the
    tokenizer walk handles the whole corpus; 'regex' would mean it
    started failing and silently degrading)."""
    from clickhouse_objects_analysis_spark.plans.lineage import (
        extract_dependencies_distributed,
        view_dependencies,
    )

    subset = catalog[:200]
    views_df = spark.createDataFrame(
        subset, "db_name string, obj_name string, ddl string"
    ).repartition(8)
    dist = extract_dependencies_distributed(views_df)
    rows = dist.collect()
    assert {r.method for r in rows} == {"token"}
    exact, _ = view_dependencies(spark, subset)
    assert sorted((r.view, r.dep) for r in rows) == sorted(
        map(tuple, exact.collect())
    )


def _mixed_catalog(n: int, ch_every: int = 3) -> list[tuple[str, str, str]]:
    """A catalog where every ``ch_every``-th view is CH-only dialect
    (PREWHERE + SETTINGS → Spark's parser rejects it) — the injected
    parse-failure storm for the crossover test. The rest stay
    Spark-parseable."""
    views = []
    for i in range(n):
        if i % ch_every == 0:
            ddl = (
                f"CREATE VIEW cat.x_{i:04d} AS "
                f"SELECT id FROM cat.t_{i % 50} PREWHERE sign > 0 "
                f"SETTINGS max_threads = 1"
            )
            views.append(("cat", f"x_{i:04d}", ddl))
        else:
            ddl = (
                f"CREATE VIEW cat.x_{i:04d} AS "
                f"SELECT a.id, b.name FROM cat.t_{i % 50} a "
                f"JOIN cat.dim_{i % 7} b ON a.k = b.k "
                f"WHERE a.id IN (SELECT id FROM cat.allow_{i % 3})"
            )
            views.append(("cat", f"x_{i:04d}", ddl))
    return views


def test_fallback_crossover_degrades_per_view(spark):
    """VERDICT r6 item 8: under a storm of parse failures (every 3rd
    view CH-only), the exact path must degrade PER VIEW — rejected DDLs
    come back with method='token' (the tokenizer fallback) and correct
    edges, while every parseable neighbour keeps its parse-grade
    'exact' marker. A wholesale fallback (all-token) or a dropped view
    fails here."""
    from clickhouse_objects_analysis_spark.plans.lineage import (
        view_dependencies_with_method,
    )

    n = 300
    edges, errors = view_dependencies_with_method(spark, _mixed_catalog(n))
    assert errors.count() == 0
    rows = edges.collect()
    methods: dict[str, set] = {}
    deps: dict[str, set] = {}
    for r in rows:
        methods.setdefault(r.view, set()).add(r.method)
        deps.setdefault(r.view, set()).add(r.dep)
    assert len(methods) == n  # no view dropped
    for i in range(n):
        view = f"cat.x_{i:04d}"
        if i % 3 == 0:
            assert methods[view] == {"token"}, (view, methods[view])
            assert deps[view] == {f"cat.t_{i % 50}"}
        else:
            assert methods[view] == {"exact"}, (view, methods[view])
            assert deps[view] == {
                f"cat.t_{i % 50}", f"cat.dim_{i % 7}", f"cat.allow_{i % 3}"
            }


def test_1k_mixed_fidelity_ratio_recorded(spark):
    """Per-edge fidelity ratio for the 1k-view mixed run, recorded to
    LINEAGE_FIDELITY.json at the repo root (the artifact the directive
    asks for): with 1/3 of views CH-only, exact edges = 2/3·n·3 and
    token edges = 1/3·n·1 → exact ratio 6/7 ≈ 0.857, deterministic."""
    import json
    import os
    import time as _time

    from clickhouse_objects_analysis_spark.plans.lineage import (
        view_dependencies_with_method,
    )

    import pyspark.sql.functions as F

    n = 1000
    t0 = _time.perf_counter()
    edges, errors = view_dependencies_with_method(spark, _mixed_catalog(n))
    counts = {
        r["method"]: r["cnt"]
        for r in edges.groupBy("method")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    elapsed = _time.perf_counter() - t0
    assert errors.count() == 0
    exact, token = counts.get("exact", 0), counts.get("token", 0)
    n_ch = len(range(0, n, 3))  # 334 CH-dialect views
    assert token == n_ch  # 1 dep each
    assert exact == (n - n_ch) * 3  # 3 deps each
    ratio = exact / (exact + token)
    assert 0.85 < ratio < 0.87, counts
    out = {
        "views": n,
        "ch_dialect_share": round(1 / 3, 4),
        "edges_exact": exact,
        "edges_token": token,
        "edge_fidelity_ratio": round(ratio, 4),
        "elapsed_sec": round(elapsed, 2),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "LINEAGE_FIDELITY.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    assert elapsed < 30, f"1k-view mixed extraction took {elapsed:.1f}s"
