"""Set operations (grammar: selectUnionStmt ClickHouseParser.py:8827 — this
grammar vintage has only UNION ALL; Spark's union/intersect/except provide
the full modern ClickHouse set — SURVEY §2.B set-ops row)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables


@query(
    "union_all",
    oracle="""
    SELECT k, COUNT(*) AS cnt FROM (
        SELECT s_nationkey AS k FROM supplier
        UNION ALL
        SELECT c_nationkey AS k FROM customer
    ) GROUP BY k ORDER BY k
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (selectUnionStmt reference ClickHouseParser.py:8827) —
    no dedup shuffle, just concatenated partitions."""
    t = tables(spark, sf_dir)
    u = t["supplier"].select(F.col("s_nationkey").alias("k")).unionAll(
        t["customer"].select(F.col("c_nationkey").alias("k"))
    )
    return u.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).orderBy("k")


@query(
    "union_distinct",
    oracle="""
    SELECT seg FROM (
        SELECT c_mktsegment AS seg FROM customer
        UNION
        SELECT o_orderpriority AS seg FROM orders
    ) ORDER BY seg
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — union().distinct(); dedup costs one hash shuffle."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_mktsegment").alias("seg"))
        .union(t["orders"].select(F.col("o_orderpriority").alias("seg")))
        .distinct()
        .orderBy("seg")
    )


@query(
    "intersect_q",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    ORDER BY k
    """,
)
def intersect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — customers with both fulfilled and open orders."""
    o = tables(spark, sf_dir)["orders"]
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return f.intersect(op).orderBy("k")


@query(
    "except_q",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    ORDER BY k
    """,
)
def except_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — customer keys that never ordered (set-op spelling of the
    anti join)."""
    t = tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_custkey").alias("k"))
    o = t["orders"].select(F.col("o_custkey").alias("k"))
    return c.exceptAll(o).distinct().orderBy("k")


@query(
    "setops_all_multiplicity",
    oracle="""
    WITH a AS (SELECT l_suppkey % 50 AS k FROM lineitem
               WHERE l_returnflag = 'A'),
    b AS (SELECT l_suppkey % 50 AS k FROM lineitem
          WHERE l_returnflag = 'R')
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n, 'intersect_all' AS op
    FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
    UNION ALL
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n, 'except_all' AS op
    FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
    ORDER BY op, k
    """,
)
def setops_all_multiplicity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — the multiplicity-preserving (bag
    semantics) set operations: per key, intersect keeps min(countA,
    countB) copies and except keeps countA−countB. Both plan as a
    single hash aggregate per side plus a join on the key — no row-level
    materialization of duplicates is needed until the final count, and
    the compare folds them straight back to (key, n)."""
    li = tables(spark, sf_dir)["lineitem"]
    a = li.filter(F.col("l_returnflag") == "A").select(
        (F.col("l_suppkey") % 50).alias("k")
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        (F.col("l_suppkey") % 50).alias("k")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    ea = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    return ia.unionByName(ea).orderBy("op", "k")
