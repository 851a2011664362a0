"""File-format sources and sinks + table functions.

Reference surface (SURVEY §2.B):
- table functions `numbers()/s3()/url()` (TableExprFunctionContext
  ClickHouseParser.py:16923, tableFunctionExpr :17060) → `spark.range` and
  `spark.read.format(...)` connectors;
- `INTO OUTFILE ... FORMAT ...` (QueryStmtContext :1688) → `df.write
  .format("csv"/"json"/"parquet")`;
- MergeTree PARTITION BY (PartitionByClauseContext :5963) → parquet
  directory partitioning, which Catalyst prunes at read time.

Scale notes: CSV/JSON are *exchange* formats — schema-on-read, no
statistics, no column pruning; parquet is the storage format (dictionary +
RLE encodings subsume LowCardinality, min/max row-group stats subsume
PREWHERE-style skipping). Partitioned layout turns equality predicates on
the partition column into directory pruning — zero I/O for untouched
partitions, the same job MergeTree's partition key does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Repo-local scratch root for sinks (testdata itself is read-only).
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)


def scratch_path(*parts: str) -> str:
    path = os.path.join(SCRATCH, *parts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def numbers(spark: SparkSession, n: int, col: str = "number") -> DataFrame:
    """ClickHouse ``numbers(n)`` table function (reference grammar
    :17060) — `spark.range` is the exact analogue: a generated, splittable
    source with no storage behind it."""
    return spark.range(n).select(F.col("id").alias(col))


def write_csv(df: DataFrame, path: str) -> str:
    """INTO OUTFILE ... FORMAT CSVWithNames."""
    df.write.mode("overwrite").option("header", True).csv(path)
    return path


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """CSV source with explicit schema (schema-on-read; never infer in
    production — inference is a second full scan)."""
    return spark.read.schema(schema).option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> str:
    """INTO OUTFILE ... FORMAT JSONEachRow (newline-delimited JSON)."""
    df.write.mode("overwrite").json(path)
    return path


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> str:
    """MergeTree PARTITION BY analogue: hive-style directory partitioning.
    Reads that filter on the partition column prune directories before any
    I/O (check .explain for PartitionFilters).

    The repartition on the partition columns is the small-files guard:
    without it every input task writes one file into EVERY partition
    directory (tasks x partitions files — the classic partitionBy
    blow-up); with it each directory gets one file per shuffle partition
    holding that key. AQE coalesces the shuffle when partitions are
    small; genuinely hot partition keys can add a salt column to split
    output files."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return path


#: ClickHouse FORMAT names (DataClauseFormat ClickHouseParser.py:7823) →
#: (spark format, reader options).
_CH_FORMATS = {
    "parquet": ("parquet", {}),
    "native": ("parquet", {}),  # closest columnar-binary equivalent
    "csv": ("csv", {"header": "false"}),
    "csvwithnames": ("csv", {"header": "true"}),
    "tabseparated": ("csv", {"header": "false", "sep": "\t"}),
    "tsv": ("csv", {"header": "false", "sep": "\t"}),
    "tsvwithnames": ("csv", {"header": "true", "sep": "\t"}),
    "jsoneachrow": ("json", {}),
}


def table_function(
    spark: SparkSession,
    name: str,
    *args,
    schema: str | None = None,
) -> DataFrame:
    """ClickHouse table-function dispatch (TableExprFunctionContext
    ClickHouseParser.py:16923, tableFunctionExpr :17060):

    - ``numbers(n)`` → `spark.range(n)` (generated, splittable);
    - ``file(path, format)`` / ``url(addr, format)`` / ``s3(uri, format)``
      → `spark.read.format(...).load(...)` — one code path, only the URI
      scheme differs. `s3://` is rewritten to the Hadoop `s3a://`
      connector scheme; http(s)/cloud URIs need the matching Hadoop
      filesystem on the cluster classpath (offline here, so tests drive
      the dispatcher through local file paths — same code path).

    Format names are ClickHouse FORMAT identifiers (CSVWithNames,
    JSONEachRow, TabSeparated, Parquet, ...). Pass ``schema`` for text
    formats — schema-on-read inference is a second full scan and is never
    the production path.
    """
    fname = name.lower()
    if fname == "numbers":
        return numbers(spark, int(args[0]))
    if fname in ("file", "url", "s3"):
        path = str(args[0])
        fmt = str(args[1]).lower() if len(args) > 1 else "parquet"
        if fmt not in _CH_FORMATS:
            raise ValueError(f"unsupported FORMAT {args[1]!r}")
        spark_fmt, opts = _CH_FORMATS[fmt]
        if fname == "s3":
            path = path.replace("s3://", "s3a://", 1)
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.format(spark_fmt).load(path)
    raise ValueError(f"unknown table function {name!r}")
