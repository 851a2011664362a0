"""Round-7 session-18 queries: merge-on-read deletion vectors, dynamic
partition pruning, and linear multi-touch attribution.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; deletion vectors are the merge-on-read
cousin of the copy-on-write mutations (operators/mutations.py —
ClickHouse's lightweight DELETE mask semantics), DPP is the Spark
runtime-filter flagship a partitioned 100 TB lake lives on, and linear
attribution completes the attribution pair started by
first_touch_attribution."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.io import scratch_path
from .registry import query, tables


def _sf_key(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")) or "default"


@query(
    "deletion_vector_read",
    oracle="""
    WITH live AS (
        SELECT * FROM orders WHERE NOT (o_orderkey % 7 = 3)),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted
          FROM orders WHERE o_orderkey % 7 = 3)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_live,
           (SELECT n_deleted FROM t) AS n_deleted,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS live_cents
    FROM live
    """,
)
def deletion_vector_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors: the base snapshot is
    written ONCE; a delete lands as a tiny tombstone key file
    (here: every o_orderkey % 7 == 3), and readers apply it as an
    anti-join — ClickHouse's lightweight-DELETE mask semantics, and
    the Delta/Iceberg deletion-vector pattern, versus the
    copy-on-write rewrite of operators/mutations.py. The trade is
    explicit: CoW pays at write (rewrite touched files) and reads
    clean; MoR pays at read (one broadcast anti-join per scan) and
    deletes in O(tombstones). At 100 TB the tombstone side stays
    broadcast-sized until compaction folds it in.

    The oracle re-derives live rows from the source predicate, so a
    reader that drops the wrong rows cannot hash-match. Counts and
    cents are exact integers."""
    o = tables(spark, sf_dir)["orders"]
    base_dir = scratch_path("sinks", _sf_key(sf_dir), "dv_base", "x")
    base_dir = os.path.dirname(base_dir)
    tomb_dir = os.path.join(base_dir, "_tombstones")
    o.write.mode("overwrite").parquet(os.path.join(base_dir, "base"))
    o.filter(F.col("o_orderkey") % 7 == 3).select("o_orderkey").write.mode(
        "overwrite"
    ).parquet(tomb_dir)
    base = spark.read.parquet(os.path.join(base_dir, "base"))
    tombs = spark.read.parquet(tomb_dir)
    live = base.join(
        F.broadcast(tombs.withColumnRenamed("o_orderkey", "dk")),
        base["o_orderkey"] == F.col("dk"),
        "left_anti",
    )
    n_del = tombs.agg(F.count("*").cast("long").alias("n_deleted"))
    return (
        live.agg(
            F.count("*").cast("long").alias("n_live"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).cast("long").alias("live_cents"),
        )
        .crossJoin(F.broadcast(n_del))
        .select("n_live", "n_deleted", "live_cents")
    )


@query(
    "dynamic_partition_pruning_join",
    oracle="""
    WITH m AS (SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS part_month
               FROM orders
               WHERE o_orderdate BETWEEN DATE '1995-01-01'
                                     AND DATE '1995-03-31')
    SELECT o.part_month,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM (SELECT strftime(o_orderdate, '%Y-%m') AS part_month, o_totalprice
          FROM orders) o
    JOIN m ON o.part_month = m.part_month
    GROUP BY o.part_month ORDER BY o.part_month
    """,
)
def dynamic_partition_pruning_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is a
    month-PARTITIONED parquet snapshot; the dim side (Q1-1995 months)
    is only known after a filter, so static pruning can't help — Spark
    injects the dim's partition keys as a RUNTIME subquery filter into
    the fact scan (`dynamicpruning#` in the plan, asserted in
    tests/test_plan_shapes.py), reading 3 directories instead of all.
    THE flagship lake optimization: at 100 TB with daily partitions,
    DPP is the difference between scanning 3 days and 3000. The
    oracle replays the month join relationally from the source
    table."""
    o = tables(spark, sf_dir)["orders"]
    snap = scratch_path("sinks", _sf_key(sf_dir), "dpp_orders", "x")
    snap = os.path.dirname(snap)
    fact_dir = os.path.join(snap, "fact")
    o.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.date_format("o_orderdate", "yyyy-MM").alias("part_month"),
    ).repartition("part_month").write.mode("overwrite").partitionBy(
        "part_month"
    ).parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = (
        o.filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") <= "1995-03-31")
        )
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), fact["part_month"] == dim["m"])
        .groupBy("part_month")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).cast("long").alias("cents"),
        )
        .orderBy("part_month")
    )


@query(
    "linear_touch_attribution",
    oracle="""
    WITH conv AS (
        SELECT user_id, MIN(ts) AS t_conv
        FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    touches AS (
        SELECT e.user_id, e.event_type,
               CAST(COUNT(*) OVER (PARTITION BY e.user_id) AS BIGINT)
                   AS nt
        FROM events e JOIN conv c
          ON e.user_id = c.user_id AND e.ts < c.t_conv)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(1000000000 // nt) AS BIGINT) AS credit_nano
    FROM touches GROUP BY event_type ORDER BY event_type
    """,
)
def linear_touch_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every event BEFORE a user's
    first purchase shares the conversion credit equally (1/n per
    touch) — the equal-weight counterpart of first_touch_attribution
    (winner-takes-all). Credit is quantized per touch as the exact
    integer 1e9 DIV n, so channel totals are order-free integer sums;
    the per-user touch count is one window over the pre-conversion
    stream, and the conversion timestamps ride a broadcast join."""
    ev = tables(spark, sf_dir)["events"]
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_conv"))
    )
    touches = (
        ev.join(F.broadcast(conv), "user_id")
        .filter(F.col("ts") < F.col("t_conv"))
        .withColumn(
            "n_touches",
            F.count("*").over(Window.partitionBy("user_id")).cast("long"),
        )
    )
    return (
        touches.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum(F.expr("1000000000 div n_touches"))
            .cast("long")
            .alias("credit_nano"),
        )
        .orderBy("event_type")
    )
