"""Mutation statements as copy-on-write parquet rewrites.

Reference surface (SURVEY §2.B "Statements beyond SELECT"): ClickHouse
mutations `ALTER TABLE ... DELETE WHERE` / `UPDATE` (grammar rule list
ClickHouseParser.py:1361, whereClause accessors :8073-8301), `OPTIMIZE ...
DEDUPLICATE` (OptimizeStmtContext :8366-8409) and `TTL` expiry
(TtlClauseContext :6113, TtlExprContext :6890).

Vanilla Spark-on-Parquet has no in-place mutation, and ClickHouse mutations
are themselves asynchronous *part rewrites* — so the faithful Spark shape
is the same one Delta/Iceberg use underneath: read current snapshot →
transform → write new snapshot directory → flip the current-version
pointer. Each mutation rewrites data files once; reads always see a
complete, consistent version. At 100 TB you partition the table and rewrite
only partitions whose predicate can match (partition pruning on the
mutation predicate) — `MutableParquetTable.mutate` takes the whole
DataFrame transform, so a partition-aware subclass only needs to override
the write path.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Mapping, Sequence
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


class MutableParquetTable:
    """A parquet-backed table with versioned copy-on-write mutations."""

    def __init__(self, spark: SparkSession, base: DataFrame, path: str):
        self.spark = spark
        self.path = path
        if os.path.exists(path):
            shutil.rmtree(path)
        self._version = 0
        base.write.mode("overwrite").parquet(self._vpath(0))

    def _vpath(self, v: int) -> str:
        return os.path.join(self.path, f"v{v}")

    def df(self) -> DataFrame:
        return self.spark.read.parquet(self._vpath(self._version))

    def mutate(self, transform: Callable[[DataFrame], DataFrame]) -> "MutableParquetTable":
        new_v = self._version + 1
        transform(self.df()).write.mode("overwrite").parquet(self._vpath(new_v))
        self._version = new_v
        return self

    # -- the ClickHouse mutation statements --------------------------------

    def delete_where(self, cond: Column) -> "MutableParquetTable":
        """ALTER TABLE ... DELETE WHERE cond: keep rows where the predicate
        is NOT satisfied (NULL predicate rows survive, matching SQL
        three-valued DELETE semantics)."""
        return self.mutate(lambda df: df.filter(~F.coalesce(cond, F.lit(False))))

    def update_where(
        self, assignments: Mapping[str, Column], cond: Column
    ) -> "MutableParquetTable":
        """ALTER TABLE ... UPDATE col = expr, ... WHERE cond."""

        def apply(df: DataFrame) -> DataFrame:
            for col_name, value in assignments.items():
                df = df.withColumn(
                    col_name, F.when(cond, value).otherwise(F.col(col_name))
                )
            return df

        return self.mutate(apply)

    def optimize_deduplicate(
        self, subset: Optional[Sequence[str]] = None
    ) -> "MutableParquetTable":
        """OPTIMIZE TABLE ... DEDUPLICATE [BY cols]: full-row (or by-column)
        dedup folded into the compaction rewrite."""
        return self.mutate(
            lambda df: df.dropDuplicates(list(subset) if subset else None)
        )

    def expire_ttl(self, ttl_cond: Column) -> "MutableParquetTable":
        """TTL expiry: drop rows whose TTL condition has come due (the
        scheduled filter-rewrite a MergeTree TTL merge performs)."""
        return self.delete_where(ttl_cond)
