"""The main correctness gate, locally: every oracle-declared query must
match DuckDB at sf0.01 (mirrors the driver's t2 comparison); rows-only
queries must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from clickhouse_objects_analysis_spark.queries import ORACLE, QUERIES

from .parity import assert_frames_match, run_oracle

ORACLE_NAMES = sorted(ORACLE)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLE))


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(ORACLE[name], sf_dir)
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
