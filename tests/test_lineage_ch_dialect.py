"""ClickHouse-dialect DDL corpus regression (VERDICT round-1 item 7):
each statement is genuinely un-Spark-parseable (or carries a SETTINGS
tail to force the fallback), so extraction runs the conservative regex
path; expected dependency lists are hand-derived. Mirrors the reference's
heuristic guards (ch_view_dependencies.py:132-229)."""

from __future__ import annotations

import pytest

from clickhouse_objects_analysis_spark.plans.lineage import (
    parse_table_dependencies,
    regex_table_dependencies,
)
from clickhouse_objects_analysis_spark.queries.lineage_queries import (
    CH_DIALECT_DDLS,
)

CASES = [(name, ddl, deps) for _db, name, ddl, deps in CH_DIALECT_DDLS]


@pytest.mark.parametrize("name,ddl,expected", CASES, ids=[c[0] for c in CASES])
def test_full_pipeline_extraction(spark, name, ddl, expected):
    """parse_table_dependencies (which falls back to regex on parser
    rejection) must produce exactly the hand-derived deps."""
    assert parse_table_dependencies(spark, ddl, default_db="test") == expected


@pytest.mark.parametrize("name,ddl,expected", CASES, ids=[c[0] for c in CASES])
def test_regex_fallback_extraction(name, ddl, expected):
    """The pure regex path must agree on every corpus entry — it is the
    path a 100 TB catalog's distributed extraction runs."""
    assert regex_table_dependencies(ddl, default_db="test") == expected


def test_spark_parser_rejects_regex_designates():
    """Corpus entries without a SETTINGS tail must actually fail Spark's
    parser — otherwise the corpus silently stops covering the fallback."""
    import pyspark.sql.utils  # noqa: F401 — ensure session classes loaded

    from clickhouse_objects_analysis_spark.session import get_spark

    spark = get_spark("tests")
    parser = spark._jsparkSession.sessionState().sqlParser()
    # Deliberately Spark-parseable entries: these exercise the EXACT
    # path's semantics (insert_values_trap pins the InsertIntoStatement
    # write-edge exclusion in _scan_plan_json) rather than the fallback.
    # v_shadow_inner_cte: Spark's parser accepts it by reading ANY as a
    # table alias, so the pipeline test runs the exact path — the regex
    # test still pins the fallback on the same statement.
    spark_parseable = {"insert_values_trap", "v_shadow_inner_cte"}
    must_fail = [
        (name, ddl)
        for _db, name, ddl, _deps in CH_DIALECT_DDLS
        if "SETTINGS" not in ddl and name not in spark_parseable
    ]
    assert must_fail, "corpus lost its Spark-unparseable entries"
    for name, ddl in must_fail:
        with pytest.raises(Exception):  # noqa: PT011 — Py4J parse error
            parser.parsePlan(ddl)


def test_array_join_operand_excluded():
    got = regex_table_dependencies(
        "SELECT id, x FROM test.t LEFT ARRAY JOIN arr AS x SETTINGS a=1",
        default_db="test",
    )
    assert got == ["test.t"]


def test_doubled_quote_identifiers_collapse():
    got = regex_table_dependencies(
        'SELECT 1 FROM "we""ird"."do""uble" SETTINGS a=1', default_db="test"
    )
    assert got == ['we"ird.do"uble']


# ---------------------------------------------------------------------------
# Grammar-family coverage map (VERDICT r6 item 5): every rule of the
# reference grammar (generated_ch_parser/ClickHouseParser.py:1361, 129
# rules) → the corpus entry exercising it through the fallback extractor,
# a pointer to the suite covering it outside this corpus, or an explicit
# "not-lineage-reachable" verdict with the reason. The test below checks
# the map is total over the 129 names and that every referenced corpus id
# exists — no rule family can silently drop out of coverage.
# ---------------------------------------------------------------------------

_ELSEWHERE = "elsewhere:"  # covered by another test module
_NOT_REACHABLE = "not-lineage-reachable:"  # rule cannot yield a dependency

RULE_FAMILY_COVERAGE: dict[str, str] = {
    # statements
    "queryStmt": "select_format_tail",  # FORMAT/INTO OUTFILE tails
    "query": "script_etl",
    "alterStmt": "alter_update_in",
    "alterTableClause": "alter_add_projection",
    "assignmentExprList": "alter_update_in",
    "assignmentExpr": "alter_update_in",
    "tableColumnPropertyType": "t_proj_codec",  # DEFAULT/MATERIALIZED
    "partitionClause": "optimize_dedup_by",  # PARTITION 202401
    "attachStmt": "t_attach",
    "checkStmt": "script_check_exists",
    "createStmt": "mv_daily_engine",
    "dictionarySchemaClause": "dict_hashed",
    "dictionaryAttrDfnt": "dict_range_hashed",
    "dictionaryEngineClause": "dict_hashed",
    "dictionaryPrimaryKeyClause": "dict_hashed",
    "dictionaryArgExpr": "dict_external_src",
    "sourceClause": "dict_hashed",
    "lifetimeClause": "dict_range_hashed",
    "layoutClause": "dict_range_hashed",
    "rangeClause": "dict_range_hashed",
    "dictionarySettingsClause": "dict_range_hashed",
    "clusterClause": "t_uuid_cluster_sample_by",
    "uuidClause": "t_uuid_cluster_sample_by",
    "destinationClause": "mv_to_dest",
    "subqueryClause": "v_or_replace",
    "tableSchemaClause": "t_proj_codec",
    "engineClause": "mv_daily_engine",
    "partitionByClause": "mv_daily_engine",
    "primaryKeyClause": "t_ttl_group_set",
    "sampleByClause": "t_uuid_cluster_sample_by",
    "ttlClause": "mv_ttl_to_volume",
    "engineExpr": "mv_daily_engine",
    "tableElementExpr": "t_proj_codec",
    "tableColumnDfnt": "t_proj_codec",
    "tableColumnPropertyExpr": "t_proj_codec",
    "tableIndexDfnt": "t_proj_codec",  # INDEX idx_v ... TYPE minmax
    "tableProjectionDfnt": "t_proj_codec",
    "codecExpr": "t_proj_codec",
    "codecArgExpr": "t_proj_codec",
    "ttlExpr": "mv_ttl_to_volume",
    "ttlSetExpr": "t_ttl_group_set",  # GROUP BY k SET v = sum(v)
    "describeStmt": _ELSEWHERE + "test_plan_shapes TestCatalogStatements",
    "dropStmt": "script_rebuild",
    "existsStmt": "script_check_exists",
    "explainStmt": "explain_pipeline",
    "insertStmt": "insert_select",
    "columnsClause": "insert_values_trap",  # INSERT INTO t (id, note)
    "dataClause": "insert_values_trap",
    "assignmentValues": "insert_values_trap",
    "assignmentValue": "insert_values_trap",
    "deleteStmt": "lightweight_delete",
    "inPartitionClause": "alter_update_in_partition",
    "updateStmt": "alter_update_in",
    "killStmt": "kill_query",
    "optimizeStmt": "optimize_dedup_by",
    "renameStmt": "t_rename_stmt",
    "renameEntityClause": "t_exchange",
    "projectionSelectStmt": "t_proj_codec",
    # select structure
    "selectUnionStmt": "v_union_all",
    "selectStmtWithParens": "v_setops_three",
    "selectStmt": "v_prewhere",
    "withClause": "v_multi_cte",
    "withExprList": "v_multi_cte",
    "withExpr": "v_with_expr_alias",
    "topClause": "v_top",
    "fromClause": "v_prewhere",
    "arrayJoinClause": "v_array_join",
    "windowClause": "v_named_window_frame",
    "prewhereClause": "v_prewhere",
    "whereClause": "v_prewhere",
    "groupByClause": "v_totals",
    "havingClause": "v_top",
    "orderByClause": "v_with_fill",
    "interpolateClause": "v_fill_from_trap",
    "projectionOrderByClause": "t_proj_codec",  # PROJECTION p_ord
    "limitByClause": "v_limit_by",
    "limitClause": "v_sample_ratio_offset",
    "settingsClause": "v_settings",
    "joinExpr": "v_any_join",
    "joinOp": "v_asof",
    "joinOpCross": "v_comma_join",
    "joinConstraintClause": "v_any_join",
    "sampleClause": "v_sample",
    "limitExpr": "watch_events_limit",
    "orderExprList": "v_with_fill",
    "orderExpr": "v_with_fill",
    "ratioExpr": "v_sample_ratio_offset",  # SAMPLE 1/10 OFFSET 1/2
    "settingExprList": "v_settings",
    "settingExpr": "v_settings",
    "windowExpr": "v_named_window_frame",
    "winPartitionByClause": "v_named_window_frame",
    "winOrderByClause": "v_named_window_frame",
    "winFrameClause": "v_named_window_frame",
    "winFrameExtend": "v_named_window_frame",
    "winFrameBound": "v_named_window_frame",
    "setStmt": "script_check_exists",  # SET max_threads = 4
    "showStmt": _ELSEWHERE + "test_cli (SHOW CREATE TABLE fallback chain)",
    "systemStmt": "system_reload",
    "truncateStmt": "script_truncate_select",
    "useStmt": _ELSEWHERE + "test_plan_shapes TestCatalogStatements (USE)",
    "watchStmt": "script_ddl_then_watch",
    # expression layer — every corpus entry parses these; the mapped id
    # is the entry that stresses the rule's trap specifically
    "columnTypeExpr": "t_proj_codec",  # Enum8('…'=1) value list
    "columnExprList": "v_scalar_subquery",
    "columnsExpr": "v_columns_except",
    "columnExpr": "v_string_concat_keywords",
    "columnArgList": "v_lambda_array_join",
    "columnArgExpr": "v_lambda_array_join",
    "columnLambdaExpr": "v_lambda_array_join",
    "columnIdentifier": "v_quoted_dot_idents",
    "nestedIdentifier": "v_quoted_dot_idents",
    "columnExceptExpr": "v_columns_except",
    "tableExpr": "v_nested_from",
    "tableFunctionExpr": "v_s3_join",
    "tableIdentifier": "v_backtick",
    "tableArgList": "v_remote_fn",
    "tableArgExpr": "v_cluster_fn",
    "databaseIdentifier": "v_merge_bare_db",
    "dictionaryIdentifier": "v_dictget_crossdb",
    "floatingLiteral": "v_sample",  # SAMPLE 0.1
    "numberLiteral": "v_settings",
    "stringLiteral": "v_string_from_trap",
    "literal": "v_string_doubled_quote",
    "interval": "mv_ttl_to_volume",  # INTERVAL 30 DAY
    "keyword": "v_string_concat_keywords",
    "keywordForAlias": "v_comma_alias",
    "alias": "v_comma_alias",
    "identifier": "v_backtick",
    "identifierOrNull": _NOT_REACHABLE
    + " NULL-identifier alternative only appears in EXCHANGE/RENAME "
    "error recovery; the identifier branch is t_exchange",
    "enumValue": "t_proj_codec",  # Enum8('fresh FROM farm' = 1, …)
}


def test_rule_family_coverage_total():
    """The map must cover all 129 grammar rules, and every corpus id it
    references must exist — a renamed/dropped entry fails here instead
    of silently shrinking grammar coverage."""
    import re as _re

    ref = "/root/reference/generated_ch_parser/ClickHouseParser.py"
    with open(ref) as fh:
        m = _re.search(r"ruleNames\s*=\s*\[(.*?)\]", fh.read(), _re.S)
    rules = _re.findall(r'"(\w+)"', m.group(1))
    assert len(rules) == 129
    assert sorted(RULE_FAMILY_COVERAGE) == sorted(rules)
    corpus_ids = {name for _db, name, _ddl, _deps in CH_DIALECT_DDLS}
    for rule, target in RULE_FAMILY_COVERAGE.items():
        if target.startswith((_ELSEWHERE, _NOT_REACHABLE)):
            continue
        assert target in corpus_ids, f"{rule} -> missing corpus id {target}"


def test_corpus_size_floor():
    assert len(CH_DIALECT_DDLS) >= 115, len(CH_DIALECT_DDLS)


# ---------------------------------------------------------------------------
# Tokenizer fallback (plans/chparse.py) — the mid-fidelity path between
# Spark's parser and the flat regex scan. It must agree with the
# hand-derived corpus everywhere the regex does, AND fix the four
# structural failure classes the flat scan cannot express.
# ---------------------------------------------------------------------------

from clickhouse_objects_analysis_spark.plans.chparse import (  # noqa: E402
    token_table_dependencies,
)
from clickhouse_objects_analysis_spark.plans.lineage import (  # noqa: E402
    fallback_table_dependencies,
)


@pytest.mark.parametrize("name,ddl,expected", CASES, ids=[c[0] for c in CASES])
def test_token_fallback_extraction(name, ddl, expected):
    """The tokenizer walk must produce the hand-derived deps on the full
    corpus — it is now the first no-parser path executors run."""
    assert token_table_dependencies(ddl, default_db="test") == expected


#: (name, ddl, correct deps, what the flat regex scan gets instead) —
#: the structural cases that motivated the tokenizer. The wrong-regex
#: column is asserted too: if the regex scan ever starts agreeing, the
#: case should graduate into CH_DIALECT_DDLS.
TOKEN_ONLY_CASES = [
    (
        "cte_scope_is_subtree_not_global",
        "SELECT * FROM (WITH x AS (SELECT id FROM test.inner_src) "
        "SELECT * FROM x) t JOIN x ON t.id = x.id SETTINGS a=1",
        ["test.inner_src", "test.x"],  # outer x is a real table
        ["test.inner_src"],
    ),
    (
        "window_clause_is_not_a_cte",
        "SELECT sum(v) OVER w FROM test.t WINDOW w AS (PARTITION BY id) "
        "UNION ALL SELECT 1 FROM w SETTINGS a=1",
        ["test.t", "test.w"],
        ["test.t"],
    ),
    (
        "comma_list_continues_past_derived_table",
        "SELECT * FROM test.a, (SELECT 1) s, test.b SETTINGS x=1",
        ["test.a", "test.b"],
        ["test.a"],
    ),
    (
        "expression_from_is_not_a_relation",
        "SELECT EXTRACT(YEAR FROM ts), substring(s FROM 1 FOR 2) "
        "FROM test.t SETTINGS a=1",
        ["test.t"],
        ["test.t", "test.ts"],
    ),
]


@pytest.mark.parametrize(
    "name,ddl,expected,regex_gets",
    TOKEN_ONLY_CASES,
    ids=[c[0] for c in TOKEN_ONLY_CASES],
)
def test_token_fixes_regex_failure_classes(name, ddl, expected, regex_gets):
    assert token_table_dependencies(ddl, default_db="test") == expected
    assert regex_table_dependencies(ddl, default_db="test") == regex_gets
    # the production ladder routes these through the tokenizer
    deps, method = fallback_table_dependencies(ddl, default_db="test")
    assert (deps, method) == (expected, "token")


def test_fallback_ladder_degrades_to_regex():
    """Unbalanced parens break the paren map — the ladder must still
    answer, tagged 'regex'."""
    ddl = "SELECT 1 FROM test.t WHERE f(x > 2 SETTINGS a=1"
    deps, method = fallback_table_dependencies(ddl, default_db="test")
    assert method == "regex"
    assert deps == ["test.t"]


def test_token_scalar_subquery_in_with_expression():
    """CH's expression-WITH (`WITH (SELECT …) AS alias`) carries real
    dependencies inside the skipped item."""
    got = token_table_dependencies(
        "WITH (SELECT max(id) FROM test.m) AS mx "
        "SELECT mx FROM test.t SETTINGS a=1",
        default_db="test",
    )
    assert got == ["test.m", "test.t"]


def test_token_mixed_with_list_registers_late_ctes():
    got = token_table_dependencies(
        "WITH 1 AS c, d AS (SELECT id FROM test.src) "
        "SELECT c FROM d SETTINGS a=1",
        default_db="test",
    )
    assert got == ["test.src"]


# ---------------------------------------------------------------------------
# Fuzz: the fallback ladder must answer on ANY input — tokenizer result
# or regex result, never an unhandled exception, never a hang.
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SQLISH = st.lists(
    st.sampled_from(
        list("abcXY_019 \t\n.,()'`\"\\/*-%;=#?&")
        + ["FROM ", "JOIN ", "WITH ", "SELECT ", "AS ", "--", "/*", "*/"]
    ),
    max_size=60,
).map("".join)


@given(sql=_SQLISH)
@settings(max_examples=300, deadline=None)
def test_fallback_ladder_total(sql):
    deps, method = fallback_table_dependencies(sql, default_db="test")
    assert method in ("token", "regex")
    assert deps == sorted(deps)
    assert len(deps) == len(set(deps))
    for d in deps:
        assert d  # never an empty name


@given(sql=_SQLISH)
@settings(max_examples=300, deadline=None)
def test_tokenizer_is_total_or_valueerror(sql):
    from clickhouse_objects_analysis_spark.plans.chparse import tokenize

    toks = tokenize(sql)  # must never raise or hang
    assert all(isinstance(t, tuple) and len(t) == 2 for t in toks)
    try:
        token_table_dependencies(sql, default_db="test")
    except ValueError:
        pass  # unbalanced parens — the ladder's regex cue


def test_token_parenthesized_join_keeps_leading_relation():
    """Code-review regression: the body of a parenthesized join is a
    relation LIST — its head has no FROM of its own and was dropped."""
    assert token_table_dependencies(
        "SELECT * FROM (t1 JOIN t2 USING (id))", default_db="d"
    ) == ["d.t1", "d.t2"]
    assert token_table_dependencies(
        "SELECT * FROM (t1, t2)", default_db="d"
    ) == ["d.t1", "d.t2"]
    assert token_table_dependencies(
        "SELECT * FROM ((a JOIN b ON a.x = b.x) JOIN c ON 1 = 1)",
        default_db="d",
    ) == ["d.a", "d.b", "d.c"]


def test_token_with_fill_from_bound_is_not_a_relation():
    """Code-review regression: ORDER BY … WITH FILL FROM <expr> — the
    bound after FILL's FROM is expression syntax."""
    assert token_table_dependencies(
        "SELECT d FROM t ORDER BY d WITH FILL FROM mn TO mx",
        default_db="d",
    ) == ["d.t"]
