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
    must_fail = [
        (name, ddl)
        for _db, name, ddl, _deps in CH_DIALECT_DDLS
        if "SETTINGS" not in ddl
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
