"""Window-function surface (reference grammar: ColumnExprWinFunctionContext
ClickHouseParser.py:15519, winPartitionBy :11606, winOrderBy :11656, frames
:11706-11895).

Scale notes: every window here is partitioned by a key (parallel, one
shuffle); the single global-window query (cumulative_daily_revenue) runs
over a pre-aggregated input that is small by construction — the pattern to
copy at 100 TB (aggregate first, window the aggregate)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables


@query(
    "window_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rk,
           dense_rank() OVER w AS drk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank over one named window spec (WINDOW clause
    reference ClickHouseParser.py:9618; function names via :15571). The
    shared `Window` object is the DataFrame-API analogue of a named window."""
    o = tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey)  OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           date_diff('day',
                     lag(o_orderdate) OVER w,
                     o_orderdate) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lagInFrame/leadInFrame (reference ClickHouseParser.py:15571) →
    F.lag/F.lead."""
    o = tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_rows_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames (WinFrameClauseContext reference
    ClickHouseParser.py:11706-11735; extents :11760-11895)."""
    o = tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias(
            "moving_avg_3"
        ),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_range_frame",
    oracle="""
    SELECT p_partkey, p_size,
           CAST(COUNT(*) OVER (
               ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cnt_similar_size
    FROM part
    ORDER BY p_partkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (RANGE accessor reference ClickHouseParser.py:11706):
    peers by value distance, not row position."""
    p = tables(spark, sf_dir)["part"]
    w = Window.orderBy("p_size").rangeBetween(-2, 0)
    return p.select(
        "p_partkey",
        "p_size",
        F.count(F.lit(1)).over(w).alias("cnt_similar_size"),
    ).orderBy("p_partkey")


@query(
    "window_first_last_ntile",
    oracle="""
    SELECT o_orderkey,
           first_value(o_orderkey) OVER w AS cheapest_order,
           last_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS priciest_order,
           ntile(4) OVER w AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_first_last_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value (reference ClickHouseParser.py:15571) + ntile.
    last_value needs the full-partition frame (default frame stops at
    CURRENT ROW — classic SQL trap, same in ClickHouse)."""
    o = tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w_full).alias("priciest_order"),
        F.ntile(4).over(w).alias("price_quartile"),
    ).orderBy("o_orderkey")


@query(
    "cumulative_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', l_shipdate) AS ship_day,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                   AS rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT strftime(ship_day, '%Y-%m-%d') AS ship_day,
           CAST(ROUND(rev, 2) AS DOUBLE) AS daily_revenue,
           CAST(ROUND(SUM(rev) OVER (ORDER BY ship_day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
               AS cumulative_revenue
    FROM daily
    ORDER BY ship_day
    """,
)
def cumulative_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-window: the daily rollup shuffles once; the global
    cumulative window then runs over ~90 rows. At 100 TB the global window
    input stays O(days), never O(rows) — this ordering is the point.

    Per-row revenue is cast to DECIMAL(38,6) before any summation so both
    engines accumulate *identical* quantities exactly — a running double sum
    rounds differently at half-cent boundaries depending on partial-agg
    order (this was round 1's only driver hash mismatch)."""
    li = tables(spark, sf_dir)["lineitem"]
    daily = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("day", "l_shipdate").alias("ship_day"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("rev")
        )
    )
    w = Window.orderBy("ship_day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("ship_day", "yyyy-MM-dd").alias("ship_day"),
        F.round("rev", 2).cast("double").alias("daily_revenue"),
        F.round(F.sum("rev").over(w), 2).cast("double").alias("cumulative_revenue"),
    ).orderBy("ship_day")


@query(
    "named_window_clause",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w, 2)
                AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, rn
    """,
)
def named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause (windowClause reference ClickHouseParser.py
    :9618 via SelectStmtContext :8960): one spec shared by multiple
    window functions — issued through spark.sql so the actual WINDOW
    syntax surface is exercised, not just the Window-object API. Both
    functions share one sort; decimal accumulation keeps the running sum
    hash-exact."""
    tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w, 2)
                    AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, rn
    """)


@query(
    "window_distribution_fns",
    oracle="""
    WITH s AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 199 = 0
    )
    SELECT o_orderkey, o_orderstatus,
           CAST(ROUND(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
           CAST(ROUND(cume_dist() OVER w, 6) AS DOUBLE) AS cume,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderstatus
                                          ORDER BY o_totalprice, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND CURRENT ROW)
               AS second_key
    FROM s
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderstatus, o_totalprice, o_orderkey
    """,
)
def window_distribution_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank, cume_dist,
    nth_value(…, 2) — over per-status price order (1/199 key slice keeps
    the oracle compare bounded). The ratio outputs round at 1e-6; ties
    are broken by the key so both engines rank identically. Partitioned
    windows: parallel per status group."""
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") % 199 == 0)
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.percent_rank().over(w), 6).cast("double").alias(
                "pct_rank"
            ),
            F.round(F.cume_dist().over(w), 6).cast("double").alias("cume"),
            F.nth_value("o_orderkey", 2)
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("second_key"),
        )
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    )


@query(
    "grouping_id_flags",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    ORDER BY gid, status, priority
    """,
)
def grouping_id_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/grouping_id over GROUPING SETS — the flag that
    distinguishes a real NULL from a rollup supertotal (groupingSets
    reference in the GROUP BY clause grammar). Spark's grouping_id bit
    order matches the column list order, compared here via the same
    2·g(status)+g(priority) encoding on both engines."""
    o = tables(spark, sf_dir)["orders"]
    o.createOrReplaceTempView("orders_gidf")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                    AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders_gidf
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY gid, status, priority
        """
    )
