"""Mutation query entries: DELETE WHERE, UPDATE, OPTIMIZE DEDUPLICATE, TTL
(SURVEY §2.B "Statements beyond SELECT"; operators.mutations implements the
copy-on-write rewrites).

Each query snapshots a testdata table into .scratch/, applies the mutation
through MutableParquetTable, and returns an aggregate over the mutated
snapshot. The oracle expresses the post-mutation state directly over the
original table — if the rewrite lost or duplicated rows, the aggregates
diverge.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.mutations import MutableParquetTable
from ..sources.io import scratch_path
from .registry import query, tables


def _table_path(sf_dir: str, name: str) -> str:
    key = os.path.basename(sf_dir.rstrip("/")) or "default"
    return scratch_path("mutations", key, name)


@query(
    "mutation_delete_where",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    WHERE NOT (l_quantity > 45)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def mutation_delete_where_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE lineitem DELETE WHERE l_quantity > 45 — copy-on-write
    rewrite, then an aggregate over the surviving snapshot."""
    li = tables(spark, sf_dir)["lineitem"]
    t = MutableParquetTable(spark, li, _table_path(sf_dir, "lineitem_del"))
    t.delete_where(F.col("l_quantity") > 45)
    return (
        t.df()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "mutation_update",
    oracle="""
    SELECT CASE WHEN o_totalprice > 300000 THEN 'BIG' ELSE o_orderstatus END
               AS o_orderstatus,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    ORDER BY o_orderstatus
    """,
)
def mutation_update_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE orders UPDATE o_orderstatus = 'BIG' WHERE
    o_totalprice > 300000 — conditional column rewrite."""
    o = tables(spark, sf_dir)["orders"]
    t = MutableParquetTable(spark, o, _table_path(sf_dir, "orders_upd"))
    t.update_where(
        {"o_orderstatus": F.lit("BIG")}, F.col("o_totalprice") > 300000
    )
    return (
        t.df()
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderstatus")
    )


@query(
    "optimize_deduplicate",
    oracle="""
    WITH doubled AS (
        SELECT l_orderkey, l_partkey FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_partkey FROM lineitem
    ),
    deduped AS (SELECT DISTINCT l_orderkey, l_partkey FROM doubled)
    SELECT (l_partkey % 10)::BIGINT AS bucket, COUNT(*) AS n
    FROM deduped
    GROUP BY 1
    ORDER BY bucket
    """,
)
def optimize_deduplicate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE TABLE ... DEDUPLICATE (OptimizeStmtContext :8366): a table
    salted with full duplicates is compacted back to distinct rows."""
    li = tables(spark, sf_dir)["lineitem"].select("l_orderkey", "l_partkey")
    doubled = li.unionAll(li)
    t = MutableParquetTable(spark, doubled, _table_path(sf_dir, "lineitem_dup"))
    t.optimize_deduplicate()
    return (
        t.df()
        .groupBy((F.col("l_partkey") % 10).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@query(
    "ttl_expiry",
    oracle="""
    SELECT event_type, COUNT(*) AS n_live
    FROM events
    WHERE NOT (ts < (SELECT MAX(ts) FROM events) - INTERVAL 30 DAY)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ttl_expiry_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL ts + INTERVAL 30 DAY (TtlClauseContext :6113): rows older than
    30 days before the newest event are expired by a filter-rewrite — the
    scheduled merge a MergeTree TTL performs."""
    ev = tables(spark, sf_dir)["events"]
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 30 DAYS")).alias("c")
    ).first()["c"]
    t = MutableParquetTable(spark, ev, _table_path(sf_dir, "events_ttl"))
    t.expire_ttl(F.col("ts") < F.lit(cutoff))
    return (
        t.df()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_live"))
        .orderBy("event_type")
    )
