"""ch_to_spark_sql (r8 verdict #6): each CH-only construct class must
rewrite into SQL that (a) Spark's parser accepts and (b) yields exactly
the same dependency set as the token walk on the original DDL — the
invariant that makes the exact-path promotion safe.
"""

from __future__ import annotations

import pytest

from clickhouse_objects_analysis_spark.plans.chparse import (
    ch_to_spark_sql,
    token_table_dependencies,
)
from clickhouse_objects_analysis_spark.plans.lineage import (
    parse_table_dependencies_tagged,
)

CASES = [
    # (ddl, expected tags subset)
    (
        "SELECT id FROM db.t PREWHERE sign > 0 SETTINGS max_threads = 1",
        {"prewhere", "settings"},
    ),
    (
        "SELECT id FROM db.t PREWHERE a = 1 WHERE b IN "
        "(SELECT id FROM db.allow) GROUP BY id",
        {"prewhere"},
    ),
    (
        "CREATE MATERIALIZED VIEW db.mv TO db.dst "
        "ENGINE = SummingMergeTree() PARTITION BY toYYYYMM(d) "
        "ORDER BY k TTL d + INTERVAL 30 DAY POPULATE AS "
        "SELECT k, d FROM db.src GLOBAL ANY LEFT JOIN db.dim USING (k)",
        # populate rides inside the engine-clause drop span
        {"mv_head", "engine_clause", "global_mod", "join_strength"},
    ),
    (
        "SELECT a FROM db.t FINAL SAMPLE 0.1 OFFSET 0.5 WHERE x > 1",
        {"final", "sample"},
    ),
    (
        "SELECT id, x FROM db.arr_t ARRAY JOIN tags AS x "
        "JOIN db.dim ON x = db.dim.k SETTINGS a = 1",
        {"array_join", "settings"},
    ),
    (
        "SELECT x FROM db.t GROUP BY x WITH TOTALS "
        "LIMIT 5 BY x FORMAT JSONEachRow",
        {"with_totals", "limit_by", "format_tail"},
    ),
    (
        "CREATE LIVE VIEW db.lv ON CLUSTER main AS SELECT v FROM db.src",
        {"live_view", "on_cluster"},
    ),
    (
        "SELECT t FROM db.series ORDER BY t WITH FILL FROM 0 TO 10 STEP 1 "
        "INTERPOLATE (v AS v)",
        {"with_fill"},
    ),
]


@pytest.mark.parametrize("ddl,tags", CASES, ids=[str(i) for i in range(len(CASES))])
def test_rewrite_promotes_to_exact_with_same_deps(spark, ddl, tags):
    rewritten, applied = ch_to_spark_sql(ddl)
    assert tags <= set(applied), (applied, rewritten)
    deps, method = parse_table_dependencies_tagged(spark, ddl, "db")
    assert method == "exact", (method, rewritten)
    assert deps == token_table_dependencies(ddl, default_db="db"), rewritten


def test_plain_sql_untouched():
    sql = "SELECT a, b FROM db.t WHERE a > 1 ORDER BY b LIMIT 10"
    rewritten, applied = ch_to_spark_sql(sql)
    assert applied == []
    assert rewritten == sql


def test_strings_and_quoted_idents_survive_rendering(spark):
    ddl = (
        "SELECT `odd``col`, 'it''s' FROM db.`odd``name` "
        "PREWHERE s != 'PREWHERE SETTINGS FINAL'"
    )
    deps, method = parse_table_dependencies_tagged(spark, ddl, "db")
    assert method == "exact"
    assert deps == ["db.odd`name"]
