"""Driver contract for the spark-graft builder (PySpark target).

Delegates to clickhouse_objects_analysis_spark.queries — the named,
oracle-checked registry covering SURVEY.md §2 (relational core, custom
operators, lineage pipeline, LLM-data ops, streaming slice).

Ordering: plain natural registry order (module import order), as the
round-4 docstring promised — the rotation lists that steered earlier
driver windows are deleted. The driver's capped window simply reads the
registry front-to-back; full-registry verification every round is
tools/local_parity.py, which oracle-checks every entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_objects_analysis_spark.queries import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shape pricing summary on sf0.001 (scan → pushed
    filter → hash agg → sort; SURVEY §7 M0)."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL equivalents; keys without an entry are the
    deliberately non-SQL-expressible ops (approx sketches, LSH candidate
    sets, stubbed decoders) → rows-only checks."""
    return dict(ORACLE)
