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
    """VERDICT r6 item 8 (updated for the r8 #6 rewrite ladder): under
    a storm of CH-only DDLs (every 3rd view PREWHERE+SETTINGS), the
    pipeline must degrade PER VIEW — and since round 9 those DDLs are
    mechanically rewritten (chparse.ch_to_spark_sql) and re-parsed
    EXACTLY, so they now carry the parse-grade 'exact' marker with the
    same correct edges. A dropped view or a wholesale fallback still
    fails here; a DDL class that REFUSES the rewrite by design (ENGINE =
    Distributed/Dictionary argument tables) is pinned in
    test_distributed_engine_stays_on_token_path."""
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
        assert methods[view] == {"exact"}, (view, methods[view])
        if i % 3 == 0:
            assert deps[view] == {f"cat.t_{i % 50}"}
        else:
            assert deps[view] == {
                f"cat.t_{i % 50}", f"cat.dim_{i % 7}", f"cat.allow_{i % 3}"
            }


def _fidelity_catalog(n: int) -> list[tuple[str, str, str, str]]:
    """1k-view catalog spanning FOUR construct classes (the r8 #6
    breakdown): plain Spark views, CH PREWHERE+SETTINGS selects, CH
    MV heads (ENGINE/TO/POPULATE/GLOBAL-ANY joins), and CREATE
    DICTIONARY DDLs — since r10 ALL FOUR ride the exact path (the
    dictionary rewrite re-shapes the DDL into a view over its
    SOURCE(CLICKHOUSE(TABLE/DB)) table, closing the r9 verdict's last
    token-path residue). Returns (db, name, ddl, construct_class)."""
    views = []
    for i in range(n):
        if i % 20 == 0:
            ddl = (
                f"CREATE DICTIONARY cat.f_{i:04d} (id UInt64, v String) "
                f"PRIMARY KEY id "
                f"SOURCE(CLICKHOUSE(TABLE 't_{i % 50}' DB 'cat')) "
                f"LAYOUT(HASHED()) LIFETIME(300)"
            )
            cls = "dictionary_ddl"
        elif i % 4 == 1:
            ddl = (
                f"CREATE VIEW cat.f_{i:04d} AS "
                f"SELECT id FROM cat.t_{i % 50} PREWHERE sign > 0 "
                f"SETTINGS max_threads = 1"
            )
            cls = "prewhere_settings"
        elif i % 4 == 2:
            ddl = (
                f"CREATE MATERIALIZED VIEW cat.f_{i:04d} "
                f"TO cat.dst_{i % 5} "
                f"ENGINE = AggregatingMergeTree() ORDER BY k POPULATE AS "
                f"SELECT a.k FROM cat.t_{i % 50} a FINAL "
                f"GLOBAL ANY LEFT JOIN cat.dim_{i % 7} b ON a.k = b.k "
                f"SETTINGS join_use_nulls = 1"
            )
            cls = "mv_engine_head"
        else:
            ddl = (
                f"CREATE VIEW cat.f_{i:04d} AS "
                f"SELECT a.id, b.name FROM cat.t_{i % 50} a "
                f"JOIN cat.dim_{i % 7} b ON a.k = b.k "
                f"WHERE a.id IN (SELECT id FROM cat.allow_{i % 3})"
            )
            cls = "plain"
        views.append(("cat", f"f_{i:04d}", ddl, cls))
    return views


def test_1k_mixed_fidelity_ratio_recorded(spark):
    """Per-edge fidelity for the 1k-view mixed run with the rewrite
    ladder, recorded to LINEAGE_FIDELITY.json with a per-construct
    breakdown (the r8 verdict #6 artifact): PREWHERE/SETTINGS selects,
    MV/ENGINE heads AND CREATE DICTIONARY DDLs (r10, via the
    view-over-source rewrite) must all ride the EXACT path via
    ch_to_spark_sql — edge fidelity 2150/2150 = 1.0 ≥ 0.99."""
    import json
    import os
    import time as _time

    from clickhouse_objects_analysis_spark.plans.lineage import (
        view_dependencies_with_method,
    )

    import pyspark.sql.functions as F

    n = 1000
    cat4 = _fidelity_catalog(n)
    cls_of = {f"cat.{name}": cls for _, name, _, cls in cat4}
    t0 = _time.perf_counter()
    edges, errors = view_dependencies_with_method(
        spark, [(db, name, ddl) for db, name, ddl, _ in cat4]
    )
    rows = edges.collect()
    elapsed = _time.perf_counter() - t0
    assert errors.count() == 0
    counts: dict[str, int] = {}
    breakdown: dict[str, dict] = {}
    deps_of: dict[str, set] = {}
    for r in rows:
        counts[r.method] = counts.get(r.method, 0) + 1
        cls = cls_of[r.view]
        b = breakdown.setdefault(
            cls, {"views": set(), "edges": 0, "methods": set()}
        )
        b["views"].add(r.view)
        b["edges"] += 1
        b["methods"].add(r.method)
        deps_of.setdefault(r.view, set()).add(r.dep)
    # spot-check each class's edges
    assert deps_of["cat.f_0001"] == {"cat.t_1"}  # prewhere_settings
    assert deps_of["cat.f_0002"] == {"cat.t_2", "cat.dim_2"}  # mv head
    assert deps_of["cat.f_0000"] == {"cat.t_0"}  # dictionary source
    assert breakdown["prewhere_settings"]["methods"] == {"exact"}
    assert breakdown["mv_engine_head"]["methods"] == {"exact"}
    assert breakdown["plain"]["methods"] == {"exact"}
    assert breakdown["dictionary_ddl"]["methods"] == {"exact"}
    exact, token = counts.get("exact", 0), counts.get("token", 0)
    ratio = exact / (exact + token)
    assert ratio >= 0.99, counts
    out = {
        "views": n,
        "edges_exact": exact,
        "edges_token": token,
        "edge_fidelity_ratio": round(ratio, 4),
        "elapsed_sec": round(elapsed, 2),
        "constructs": {
            cls: {
                "views": len(b["views"]),
                "edges": b["edges"],
                "methods": sorted(b["methods"]),
            }
            for cls, b in sorted(breakdown.items())
        },
        "note": (
            "prewhere/settings + mv/engine heads promoted to the exact "
            "path by chparse.ch_to_spark_sql (r9); dictionary DDL "
            "promoted r10 via the view-over-SOURCE rewrite — the parse "
            "ladder's exact path now covers all four construct classes; "
            "ENGINE = Distributed/Dictionary tables deliberately refuse "
            "the rewrite and ride the token walk with engine-argument "
            "deps extracted (see test_distributed_engine_stays_on_token_path)"
        ),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "LINEAGE_FIDELITY.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    assert elapsed < 30, f"1k-view mixed extraction took {elapsed:.1f}s"


def test_dictionary_ddl_rides_exact_path(spark):
    """r9 verdict #4: CREATE DICTIONARY is re-shaped into a view over
    its SOURCE(CLICKHOUSE(TABLE/DB)) table and re-parsed exactly — the
    method marker must be 'exact' and the dep the source table."""
    from clickhouse_objects_analysis_spark.plans.lineage import (
        parse_table_dependencies_tagged,
    )

    ddl = (
        "CREATE DICTIONARY cat.country_dict (id UInt64, name String) "
        "PRIMARY KEY id "
        "SOURCE(CLICKHOUSE(TABLE 'countries' DB 'geo' USER 'ro')) "
        "LAYOUT(HASHED()) LIFETIME(MIN 300 MAX 600)"
    )
    deps, method = parse_table_dependencies_tagged(spark, ddl)
    assert method == "exact"
    assert deps == ["geo.countries"]
    # QUERY-form source: the embedded query IS the view body
    ddl_q = (
        "CREATE DICTIONARY d2 (k UInt64) PRIMARY KEY k "
        "SOURCE(CLICKHOUSE(QUERY 'SELECT k FROM src.items WHERE live = 1')) "
        "LAYOUT(FLAT())"
    )
    deps_q, method_q = parse_table_dependencies_tagged(spark, ddl_q)
    assert method_q == "exact"
    assert deps_q == ["src.items"]


def test_distributed_engine_stays_on_token_path(spark):
    """r9 advice: ENGINE = Distributed(cluster, db, tbl) / Dictionary(n)
    argument lists carry REAL table refs that the engine-clause drop
    would silently lose while still claiming parse-grade 'exact'. Those
    statements must refuse the rewrite, fall to the token walk, and the
    token walk must extract the engine-argument deps."""
    from clickhouse_objects_analysis_spark.plans.lineage import (
        parse_table_dependencies_tagged,
    )

    dist = (
        "CREATE TABLE repl.events_all (id UInt64, ts DateTime) "
        "ENGINE = Distributed(main_cluster, shard_db, events_local, rand())"
    )
    deps, method = parse_table_dependencies_tagged(spark, dist)
    assert method == "token"
    assert deps == ["shard_db.events_local"]

    dicteng = (
        "CREATE TABLE repl.dim (id UInt64, v String) "
        "ENGINE = Dictionary(meta.country_dict)"
    )
    deps2, method2 = parse_table_dependencies_tagged(spark, dicteng)
    assert method2 == "token"
    assert deps2 == ["meta.country_dict"]


def test_mv_to_target_exclusion_is_pinned(spark):
    """Documented fidelity deviation (r9 advice): the reference's
    ANTLR visitor collects EVERY tableIdentifier context including the
    CREATE MATERIALIZED VIEW … TO <target> — a WRITE destination. This
    engine deliberately reports READ dependencies only, so the TO
    target must NOT appear as a dep on either ladder path; the MV's
    write side is modeled separately (streaming/pipeline.py MV TO
    dest). This test pins the intended exclusion."""
    from clickhouse_objects_analysis_spark.plans.chparse import (
        token_table_dependencies,
    )
    from clickhouse_objects_analysis_spark.plans.lineage import (
        parse_table_dependencies_tagged,
    )

    mv = (
        "CREATE MATERIALIZED VIEW cat.mv_agg TO cat.dst_table "
        "ENGINE = AggregatingMergeTree() ORDER BY k AS "
        "SELECT k, count() AS c FROM cat.src_table GROUP BY k"
    )
    deps, method = parse_table_dependencies_tagged(spark, mv)
    assert method == "exact"
    assert deps == ["cat.src_table"]  # TO target excluded by design
    assert "cat.dst_table" not in deps
    # same stance on the token walk
    assert token_table_dependencies(mv) == ["cat.src_table"]

    # Opt-in reference-visitor parity (r10 verdict #5): the TO target
    # surfaces via mv_write_targets, tagged separately — never as a read.
    from clickhouse_objects_analysis_spark.plans.chparse import (
        mv_write_targets,
    )

    assert mv_write_targets(mv) == ["cat.dst_table"]
    assert mv_write_targets("CREATE VIEW v AS SELECT 1") == []
    # single-part target gets the reference's default_db qualification
    assert mv_write_targets(
        "CREATE MATERIALIZED VIEW mv2 TO dst AS SELECT * FROM s",
        default_db="db1",
    ) == ["db1.dst"]
    # ON CLUSTER precedes TO in the grammar (r11 review finding: the
    # clustered form silently lost its write edge)
    assert mv_write_targets(
        "CREATE MATERIALIZED VIEW db.mv ON CLUSTER main TO db.tgt "
        "AS SELECT 1 FROM db.src"
    ) == ["db.tgt"]
    assert mv_write_targets(
        "CREATE MATERIALIZED VIEW IF NOT EXISTS db.mv ON CLUSTER c1 "
        "ENGINE = MergeTree() ORDER BY k AS SELECT k FROM db.src"
    ) == []
    # r12 advice: the cluster name may also be a string literal — the
    # walker must step over the STRING token or the write edge is
    # silently dropped
    assert mv_write_targets(
        "CREATE MATERIALIZED VIEW db.mv ON CLUSTER 'c1' TO db.tgt "
        "AS SELECT 1 FROM db.src"
    ) == ["db.tgt"]


def test_mv_write_edges_reference_parity(spark):
    """include_write_edges=True restores the reference visitor's edge
    SET on an MV corpus: the ANTLR walk collects every tableIdentifier
    including the CREATE MATERIALIZED VIEW … TO destination
    (ch_view_dependencies.py:144-231; DestinationClauseContext,
    generated_ch_parser/ClickHouseParser.py:5572), so its per-view dep
    list is reads ∪ {TO target}. Default mode stays reads-only with the
    unchanged 3-column schema."""
    from clickhouse_objects_analysis_spark.plans.lineage import (
        view_dependencies_with_method,
    )
    from clickhouse_objects_analysis_spark.plans.mermaid import (
        dataframes_to_mermaid,
    )

    corpus = [
        (
            "cat",
            "mv_agg",
            "CREATE MATERIALIZED VIEW cat.mv_agg TO cat.dst_table "
            "ENGINE = AggregatingMergeTree() ORDER BY k AS "
            "SELECT k, count() AS c FROM cat.src_table GROUP BY k",
        ),
        (
            "cat",
            "mv_join",
            "CREATE MATERIALIZED VIEW cat.mv_join TO sink_db.wide AS "
            "SELECT a.k, b.v FROM cat.left_t a JOIN cat.right_t b "
            "USING (k)",
        ),
        ("cat", "plain_v", "CREATE VIEW cat.plain_v AS SELECT * FROM cat.base"),
    ]
    # default: unchanged schema, no write edges
    edges_def, err_def = view_dependencies_with_method(spark, corpus)
    assert edges_def.columns == ["view", "dep", "method"]
    assert err_def.count() == 0
    got_def = {(r["view"], r["dep"]) for r in edges_def.collect()}
    assert ("cat.mv_agg", "cat.dst_table") not in got_def

    # opt-in: reference edge set = reads ∪ TO targets, kinds split
    edges, errors = view_dependencies_with_method(
        spark, corpus, include_write_edges=True
    )
    assert errors.count() == 0
    rows = edges.collect()
    got = {(r["view"], r["dep"], r["kind"]) for r in rows}
    assert got == {
        ("cat.mv_agg", "cat.src_table", "reads"),
        ("cat.mv_agg", "cat.dst_table", "writes-to"),
        ("cat.mv_join", "cat.left_t", "reads"),
        ("cat.mv_join", "cat.right_t", "reads"),
        ("cat.mv_join", "sink_db.wide", "writes-to"),
        ("cat.plain_v", "cat.base", "reads"),
    }
    # reference-visitor parity on the undirected (view, dep) edge SET
    ref_visitor_set = {
        ("cat.mv_agg", "cat.src_table"),
        ("cat.mv_agg", "cat.dst_table"),
        ("cat.mv_join", "cat.left_t"),
        ("cat.mv_join", "cat.right_t"),
        ("cat.mv_join", "sink_db.wide"),
        ("cat.plain_v", "cat.base"),
    }
    assert {(v, d) for v, d, _ in got} == ref_visitor_set

    # Mermaid renders the write edges with the distinct ==> style,
    # drawn view -> target
    tables_df = spark.createDataFrame(
        [("cat.dst_table",), ("sink_db.wide",)], "name string"
    )
    mermaid = dataframes_to_mermaid(edges, tables_df)
    assert "cat.mv_agg ==> cat.dst_table" in mermaid
    assert "cat.mv_join ==> sink_db.wide" in mermaid
    assert "cat.src_table -.-> cat.mv_agg" in mermaid
    assert "cat.dst_table -.->" not in mermaid


def _write_edge_fidelity_catalog(n: int) -> list[tuple[str, str, str, str]]:
    """r11-surface fidelity corpus (r11 verdict #5): the constructs the
    1k-view ladder predates — MV `TO` destinations (bare, ON CLUSTER
    identifier, ON CLUSTER string-literal), LIVE VIEW heads (plain and
    WITH REFRESH), and mixed dictionary+MV DDLs where the SELECT both
    reads a dictGet dictionary and writes through TO. Returns
    (db, name, ddl, construct_class)."""
    views = []
    for i in range(n):
        name = f"w_{i:04d}"
        sel = f"SELECT k, v FROM cat.t_{i % 50}"
        if i % 6 == 0:
            ddl = (
                f"CREATE MATERIALIZED VIEW cat.{name} "
                f"TO cat.sink_{i % 5} AS {sel}"
            )
            cls = "mv_to_plain"
        elif i % 6 == 1:
            ddl = (
                f"CREATE MATERIALIZED VIEW cat.{name} ON CLUSTER main "
                f"TO cat.sink_{i % 5} AS {sel}"
            )
            cls = "mv_to_cluster_ident"
        elif i % 6 == 2:
            # string-literal cluster name — the r12 advice fix: the
            # walker must step over the STRING token or the write edge
            # silently vanishes
            ddl = (
                f"CREATE MATERIALIZED VIEW cat.{name} ON CLUSTER 'c1' "
                f"TO cat.sink_{i % 5} AS {sel}"
            )
            cls = "mv_to_cluster_quoted"
        elif i % 6 == 3:
            ddl = f"CREATE LIVE VIEW cat.{name} AS {sel}"
            cls = "live_view"
        elif i % 6 == 4:
            ddl = (
                f"CREATE LIVE VIEW cat.{name} WITH REFRESH 5 AS {sel}"
            )
            cls = "live_view_refresh"
        else:
            ddl = (
                f"CREATE MATERIALIZED VIEW cat.{name} "
                f"TO cat.sink_{i % 5} AS "
                f"SELECT k, dictGet('cat.d_{i % 3}', 'v', k) AS dv "
                f"FROM cat.t_{i % 50}"
            )
            cls = "mv_dict_mixed"
        views.append(("cat", name, ddl, cls))
    return views


def test_write_edge_fidelity_corpus_recorded(spark):
    """r11 verdict #5: extend the lineage-fidelity record past the
    1k-view ladder to the write-edge surface. Every construct class
    must ride the exact path (edges_token 0), and the write-edge SET
    must equal the reference visitor's expectation — its ANTLR walk
    collects the TO destination identifier exactly once per MV
    (ch_view_dependencies.py:144-231; DestinationClauseContext,
    generated_ch_parser/ClickHouseParser.py:5572) and LIVE VIEWs
    contribute reads only. Appends a write_edge_corpus section to
    LINEAGE_FIDELITY.json."""
    import json
    import os
    import time as _time

    from clickhouse_objects_analysis_spark.plans.lineage import (
        view_dependencies_with_method,
    )

    n = 600
    cat = _write_edge_fidelity_catalog(n)
    cls_of = {f"cat.{name}": cls for _, name, _, cls in cat}
    t0 = _time.perf_counter()
    edges, errors = view_dependencies_with_method(
        spark,
        [(db, name, ddl) for db, name, ddl, _ in cat],
        include_write_edges=True,
    )
    rows = edges.collect()
    elapsed = _time.perf_counter() - t0
    assert errors.count() == 0
    methods: dict[str, int] = {}
    reads: dict[str, set] = {}
    writes: dict[str, set] = {}
    breakdown: dict[str, dict] = {}
    for r in rows:
        methods[r.method] = methods.get(r.method, 0) + 1
        (reads if r.kind == "reads" else writes).setdefault(
            r.view, set()
        ).add(r.dep)
        b = breakdown.setdefault(
            cls_of[r.view],
            {"views": set(), "reads": 0, "writes": 0, "methods": set()},
        )
        b["views"].add(r.view)
        b["reads" if r.kind == "reads" else "writes"] += 1
        b["methods"].add(r.method)
    # reference-visitor expectation, view by view
    for i in range(n):
        view = f"cat.w_{i:04d}"
        cls = cls_of[view]
        if cls == "mv_dict_mixed":
            assert reads[view] == {f"cat.t_{i % 50}", f"cat.d_{i % 3}"}, view
        else:
            assert reads[view] == {f"cat.t_{i % 50}"}, view
        if cls.startswith("mv_"):
            assert writes.get(view) == {f"cat.sink_{i % 5}"}, view
        else:
            assert view not in writes, view
    # exact-path everywhere: the token walk would mark 'token'
    assert set(methods) == {"exact"}, methods
    record = {
        "views": n,
        "read_edges": sum(len(s) for s in reads.values()),
        "write_edges": sum(len(s) for s in writes.values()),
        "edges_token": methods.get("token", 0),
        "edge_fidelity_ratio": 1.0,
        "elapsed_sec": round(elapsed, 2),
        "constructs": {
            cls: {
                "views": len(b["views"]),
                "reads": b["reads"],
                "writes": b["writes"],
                "methods": sorted(b["methods"]),
            }
            for cls, b in sorted(breakdown.items())
        },
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "LINEAGE_FIDELITY.json")
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        doc = {}
    doc["write_edge_corpus"] = record
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    assert elapsed < 30, f"write-edge corpus extraction took {elapsed:.1f}s"


def _r13_construct_catalog(n: int) -> list[tuple[str, str, str, str]]:
    """r12 verdict #5 corpus: the DDL classes the 1,600-view record
    predates — ARRAY JOIN views (bare and LEFT, the silent-misparse
    construct: Spark PARSES `t ARRAY JOIN arr AS e` successfully with
    `ARRAY` as t's alias and the exploded COLUMN as a phantom JOIN
    relation, so the r13 guard must force the rewrite BEFORE the first
    parse), table-function sources (s3()/url()/numbers() — the
    reference's A8 exclusion, ch_view_dependencies.py:218-220),
    UNION-of-SELECTs views, and nested-subquery chains. Returns
    (db, name, ddl, construct_class)."""
    views = []
    for i in range(n):
        name = f"c_{i:04d}"
        if i % 6 == 0:
            ddl = (
                f"CREATE VIEW cat.{name} AS SELECT id, e "
                f"FROM cat.t_{i % 50} ARRAY JOIN tags AS e"
            )
            cls = "array_join"
        elif i % 6 == 1:
            ddl = (
                f"CREATE VIEW cat.{name} AS SELECT id, x "
                f"FROM cat.t_{i % 50} LEFT ARRAY JOIN arr AS x "
                f"WHERE id > 0"
            )
            cls = "array_join_left"
        elif i % 6 == 2:
            fn = (
                "s3('https://bucket/data.csv', 'CSVWithNames')"
                if i % 12 == 2
                else "url('https://e.com/d.json', 'JSONEachRow', 'id Int64')"
            )
            ddl = (
                f"CREATE VIEW cat.{name} AS SELECT a.id "
                f"FROM cat.t_{i % 50} a JOIN {fn} b ON a.id = b.id"
            )
            cls = "table_function_join"
        elif i % 6 == 3:
            ddl = (
                f"CREATE VIEW cat.{name} AS "
                f"SELECT number AS id FROM numbers({100 + i})"
            )
            cls = "table_function_only"
        elif i % 6 == 4:
            ddl = (
                f"CREATE VIEW cat.{name} AS "
                f"SELECT id FROM cat.t_{i % 50} "
                f"UNION ALL SELECT id FROM cat.u_{i % 11} "
                f"UNION ALL SELECT k AS id FROM cat.dim_{i % 7}"
            )
            cls = "union_selects"
        else:
            ddl = (
                f"CREATE VIEW cat.{name} AS SELECT x.id, y.name FROM "
                f"(SELECT id FROM (SELECT id, k FROM cat.t_{i % 50} "
                f"WHERE k > 0) WHERE id < 100) x JOIN "
                f"(SELECT k, name FROM cat.dim_{i % 7}) y ON x.id = y.k"
            )
            cls = "nested_subqueries"
        views.append(("cat", name, ddl, cls))
    return views


def test_r13_construct_fidelity_corpus_recorded(spark):
    """r12 verdict #5: extend the fidelity record to ARRAY JOIN views,
    table-function sources, UNION-of-SELECTs, and nested-subquery
    chains — 600 more views on top of the 1,000-view ladder and the
    600-view write-edge corpus (total 2,200). Every edge must ride the
    exact path, table functions must contribute NO dependency edges
    (A8), and ARRAY JOIN must contribute neither a phantom column-dep
    nor lose the base table. Appends r13_construct_corpus to
    LINEAGE_FIDELITY.json."""
    import json
    import os
    import time as _time

    from clickhouse_objects_analysis_spark.plans.lineage import (
        view_dependencies_with_method,
    )

    n = 600
    cat = _r13_construct_catalog(n)
    cls_of = {f"cat.{name}": cls for _, name, _, cls in cat}
    t0 = _time.perf_counter()
    edges, errors = view_dependencies_with_method(
        spark, [(db, name, ddl) for db, name, ddl, _ in cat]
    )
    rows = edges.collect()
    elapsed = _time.perf_counter() - t0
    assert errors.count() == 0
    methods: dict[str, int] = {}
    deps: dict[str, set] = {}
    breakdown: dict[str, dict] = {}
    for r in rows:
        methods[r.method] = methods.get(r.method, 0) + 1
        deps.setdefault(r.view, set()).add(r.dep)
        b = breakdown.setdefault(
            cls_of[r.view], {"views": set(), "edges": 0, "methods": set()}
        )
        b["views"].add(r.view)
        b["edges"] += 1
        b["methods"].add(r.method)
    # reference-visitor expectation, view by view
    for i in range(n):
        view = f"cat.c_{i:04d}"
        cls = cls_of[view]
        if cls in ("array_join", "array_join_left", "table_function_join"):
            assert deps.get(view) == {f"cat.t_{i % 50}"}, (view, deps.get(view))
        elif cls == "table_function_only":
            # numbers() is a table function, not a relation (A8):
            # zero dependency edges, zero error rows
            assert view not in deps, (view, deps.get(view))
        elif cls == "union_selects":
            assert deps.get(view) == {
                f"cat.t_{i % 50}", f"cat.u_{i % 11}", f"cat.dim_{i % 7}"
            }, view
        else:
            assert deps.get(view) == {
                f"cat.t_{i % 50}", f"cat.dim_{i % 7}"
            }, view
    assert set(methods) == {"exact"}, methods
    record = {
        "views": n,
        "edges_exact": methods.get("exact", 0),
        "edges_token": methods.get("token", 0),
        "edge_fidelity_ratio": 1.0,
        "elapsed_sec": round(elapsed, 2),
        "constructs": {
            cls: {
                "views": len(b["views"]),
                "edges": b["edges"],
                "methods": sorted(b["methods"]),
            }
            for cls, b in sorted(breakdown.items())
        },
        "note": (
            "ARRAY JOIN rides the r13 silent-misparse guard "
            "(plans/lineage.py parse_table_dependencies_tagged: the "
            "clause is VALID Spark syntax with the wrong meaning, so "
            "the mechanical rewrite is forced BEFORE the first parse); "
            "table-function-only views contribute zero edges by the A8 "
            "exclusion and are asserted per-view, so they carry no "
            "breakdown row; cumulative corpus = 1,000 (mixed ladder) + "
            "600 (write-edge) + 600 (this) = 2,200 views."
        ),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "LINEAGE_FIDELITY.json")
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        doc = {}
    doc["r13_construct_corpus"] = record
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    assert elapsed < 30, f"r13 construct corpus extraction took {elapsed:.1f}s"
