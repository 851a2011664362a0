"""Source/sink query entries: table functions, file formats, partitioned
layout, INSERT/CTAS (SURVEY §2.B scans/sources/sinks; grammar anchors
cited in sources.io and inline below).

Sinks write under the repo-local .scratch/ (testdata is read-only), keyed
by scale factor so sf0.01 correctness runs and sf0.1 bench runs don't
clobber each other. Every round-trip query re-writes its sink on each call
— the write is part of what's being exercised.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.io import (
    numbers,
    read_csv,
    read_json,
    scratch_path,
    write_csv,
    write_json,
    write_partitioned_parquet,
)
from .registry import query, tables


def _sf_key(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")) or "default"


@query(
    "source_numbers",
    oracle="""
    SELECT range::BIGINT AS number, (range * range)::BIGINT AS square
    FROM range(1000)
    ORDER BY number
    """,
)
def source_numbers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numbers(n) table function (reference tableFunctionExpr
    ClickHouseParser.py:17060) → spark.range: generated splittable source,
    no storage, no shuffle."""
    return numbers(spark, 1000).select(
        "number", (F.col("number") * F.col("number")).alias("square")
    ).orderBy("number")


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT n_nationkey::BIGINT AS n_nationkey, n_name, n_regionkey::BIGINT AS n_regionkey
    FROM nation
    ORDER BY n_nationkey
    """,
)
def source_csv_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTO OUTFILE FORMAT CSVWithNames + CSV source (QueryStmtContext
    :1688): write nation to CSV, read it back with an explicit schema —
    values must survive the text round trip exactly."""
    n = tables(spark, sf_dir)["nation"]
    path = write_csv(n, scratch_path("sinks", _sf_key(sf_dir), "nation_csv"))
    back = read_csv(
        spark, path, "n_nationkey bigint, n_name string, n_regionkey bigint"
    )
    return back.orderBy("n_nationkey")


@query(
    "source_json_roundtrip",
    oracle="""
    SELECT r_regionkey::BIGINT AS r_regionkey, r_name
    FROM region
    ORDER BY r_regionkey
    """,
)
def source_json_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORMAT JSONEachRow round trip (newline-delimited JSON sink +
    schema-on-read source)."""
    r = tables(spark, sf_dir)["region"]
    path = write_json(r, scratch_path("sinks", _sf_key(sf_dir), "region_json"))
    back = read_json(spark, path, "r_regionkey bigint, r_name string")
    return back.orderBy("r_regionkey")


@query(
    "sink_partitioned_parquet",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def sink_partitioned_parquet_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MergeTree PARTITION BY (PartitionByClauseContext :5963) as
    hive-partitioned parquet: write orders partitioned by priority, read
    back one priority — the filter becomes a PartitionFilter (directory
    pruning), so the scan touches 1/5 of the data files."""
    o = tables(spark, sf_dir)["orders"]
    path = write_partitioned_parquet(
        o, scratch_path("sinks", _sf_key(sf_dir), "orders_by_priority"),
        ["o_orderpriority"],
    )
    back = spark.read.parquet(path).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "insert_select_ctas",
    oracle="""
    SELECT o_orderkey::BIGINT AS o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ORDER BY o_orderkey
    """,
)
def insert_select_ctas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE AS SELECT + INSERT INTO ... SELECT (InsertStmtContext
    :7607, DataClauseSelect :7842, CreateStmtContext :3943): CTAS the
    urgent orders into an external parquet table, append the high-priority
    ones with INSERT INTO ... SELECT, read the table back."""
    import shutil

    tables(spark, sf_dir)  # registers the `orders` temp view
    loc = scratch_path("sinks", _sf_key(sf_dir), "ctas_orders")
    spark.sql("DROP TABLE IF EXISTS ctas_orders")
    shutil.rmtree(loc, ignore_errors=True)  # external CTAS wants an empty dir
    spark.sql(
        f"""
        CREATE TABLE ctas_orders USING parquet LOCATION '{loc}' AS
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderpriority = '1-URGENT'
        """
    )
    spark.sql(
        """
        INSERT INTO ctas_orders
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderpriority = '2-HIGH'
        """
    )
    return spark.table("ctas_orders").orderBy("o_orderkey")


@query(
    "table_function_file",
    oracle="""
    SELECT s_suppkey::BIGINT AS s_suppkey, s_name,
           s_nationkey::BIGINT AS s_nationkey
    FROM supplier
    ORDER BY s_suppkey
    """,
)
def table_function_file_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table functions file()/url()/s3() (tableFunctionExpr
    ClickHouseParser.py:17060) via the sources.io.table_function
    dispatcher: write supplier as TSVWithNames, read it back through
    ``file(path, 'TSVWithNames')`` — the identical code path serves
    s3()/url(), only the URI scheme differs (s3:// → s3a://)."""
    from ..sources.io import table_function

    s = tables(spark, sf_dir)["supplier"].select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    path = scratch_path("sinks", _sf_key(sf_dir), "supplier_tsv")
    (
        s.write.mode("overwrite")
        .option("header", True)
        .option("sep", "\t")
        .csv(path)
    )
    back = table_function(
        spark,
        "file",
        path,
        "TSVWithNames",
        schema="s_suppkey bigint, s_name string, s_nationkey bigint",
    )
    return back.orderBy("s_suppkey")


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
           n_regionkey::BIGINT AS n_regionkey
    FROM nation
    ORDER BY n_nationkey
    """,
)
def source_orc_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORMAT ORC round trip (the reference's format clause admits ORC
    among its FORMAT identifiers): columnar sink + schema-preserving
    source, Spark's built-in vectorized ORC reader/writer. The oracle
    reads the SAME rows from the parquet table — if the ORC round trip
    dropped, re-typed, or reordered anything, the hash gate catches it."""
    n = tables(spark, sf_dir)["nation"].select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )
    path = scratch_path("sinks", _sf_key(sf_dir), "nation_orc")
    n.write.mode("overwrite").orc(path)
    return spark.read.orc(path).orderBy("n_nationkey")
