"""The main correctness gate, locally: every oracle-declared query must
match DuckDB at sf0.01 (mirrors the driver's t2 comparison); rows-only
queries must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from clickhouse_objects_analysis_spark.queries import ORACLE, QUERIES

from .parity import assert_driver_safe_schema, assert_frames_match, run_oracle

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
    df = QUERIES[name](spark, sf_dir)
    assert_driver_safe_schema(df.schema, name)
    spark_pdf = df.toPandas()
    oracle_pdf = run_oracle(ORACLE[name], sf_dir)
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_schema_lint_rejects_complex_columns(spark):
    """Regression for the r6 driver red row: a query emitting a raw
    array column must fail parity LOCALLY (the driver's row-sort
    canonicalizer crashes on unhashable cells) before it can err in a
    driver window."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(F.array(F.col("id")).alias("a"))
    with pytest.raises(AssertionError, match="driver-unsafe"):
        assert_driver_safe_schema(df.schema, "lint_demo")


def test_frame_hash_is_row_order_insensitive():
    """The driver sorts rows before hashing; tools/local_parity.frame_hash
    must mirror that so a query lacking a total ORDER BY cannot pass
    locally on lucky emit order."""
    import pandas as pd

    from tools.local_parity import frame_hash

    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = pd.DataFrame({"x": [3, 1, 2], "y": ["c", "a", "b"]})
    c = pd.DataFrame({"x": [3, 1, 2], "y": ["c", "a", "z"]})
    assert frame_hash(a) == frame_hash(b)
    assert frame_hash(a) != frame_hash(c)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
