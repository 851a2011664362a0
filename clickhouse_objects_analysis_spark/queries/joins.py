"""Join surface: every joinOp variant from the grammar
(ClickHouseParser.py:10574-10645, joinExpr :10431), including the custom
ASOF / ANY rewrites from operators.joins.

Scale notes live on each query; the recurring ones: dimension tables
(region/nation/customer/supplier/part) are broadcast — verify no shuffle on
the big fact side; fact-fact joins shuffle on the join key and rely on AQE
for skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.joins import any_join, asof_join
from .registry import query, tables


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way INNER JOIN (JoinOpInnerContext reference
    ClickHouseParser.py:10596) + agg + top-k. `customer` is explicitly
    broadcast (≈ ClickHouse GLOBAL JOIN, JoinExprOpContext :10332) so the
    fact tables never shuffle for it."""
    t = tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS order_cnt
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    ORDER BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER JOIN (JoinOpLeftRightContext reference
    ClickHouseParser.py:10618) — customers with zero orders kept at cnt=0."""
    t = tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
        .orderBy("c_custkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH f AS (SELECT o_custkey AS k, COUNT(*) AS f_cnt
               FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
         neg AS (SELECT c_custkey AS k, ROUND(c_acctbal, 2) AS bal
                 FROM customer WHERE c_acctbal < 0)
    SELECT COALESCE(f.k, neg.k) AS k, f.f_cnt, neg.bal
    FROM f FULL OUTER JOIN neg ON f.k = neg.k
    ORDER BY k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN (JoinOpFullContext reference ClickHouseParser.py:10574)."""
    t = tables(spark, sf_dir)
    f = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("f_cnt"))
    )
    neg = (
        t["customer"]
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("k"), F.round("c_acctbal", 2).alias("bal"))
    )
    return (
        f.join(neg, "k", "full_outer")
        .select("k", "f_cnt", "bal")
        .orderBy("k")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI JOIN (SEMI accessor reference ClickHouseParser.py:10618) =
    EXISTS. No right columns, no duplication — cheaper than join+distinct."""
    t = tables(spark, sf_dir)
    c = t["customer"]
    p_orders = t["orders"].filter(F.col("o_orderstatus") == "P")
    return (
        c.join(p_orders, c.c_custkey == p_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI JOIN (ANTI accessor reference ClickHouseParser.py:10618) =
    NOT EXISTS — also the building block for the reference's CTE-name
    exclusion (A7, ch_view_dependencies.py:226-229)."""
    t = tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    ORDER BY r.r_name, s.o_orderstatus
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (JoinOpCrossContext reference ClickHouseParser.py:10855).
    Only ever sane when one side is tiny — Spark plans broadcast-nested-loop."""
    t = tables(spark, sf_dir)
    statuses = t["orders"].select("o_orderstatus").distinct()
    return (
        t["region"].crossJoin(statuses).select("r_name", "o_orderstatus")
        .orderBy("r_name", "o_orderstatus")
    )


@query(
    "join_theta",
    oracle="""
    SELECT p.p_brand, COUNT(*) AS cnt
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + inequality residual (ON constraints,
    joinConstraintClause reference ClickHouseParser.py:10970). The equi key
    keeps it a hash join; the inequality is a post-probe filter — NOT a
    nested-loop."""
    t = tables(spark, sf_dir)
    l, p = t["lineitem"], t["part"]
    return (
        l.join(
            F.broadcast(p),
            (l.l_partkey == p.p_partkey) & (l.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("p_brand")
    )


@query(
    "join_using",
    oracle="""
    SELECT n_name, COUNT(*) AS supp_cnt
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USING(col) constraint (reference ClickHouseParser.py:10970) —
    Spark's `on=[name]` list form; output carries the key once."""
    t = tables(spark, sf_dir)
    s = t["supplier"].withColumnRenamed("s_nationkey", "n_nationkey")
    return (
        s.join(F.broadcast(t["nation"]), on=["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("supp_cnt"))
        .orderBy("n_name")
    )


@query(
    "any_join",
    oracle="""
    WITH first_order AS (
        SELECT o_custkey, o_orderkey, o_orderdate FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT c.c_custkey, f.o_orderkey AS first_orderkey, f.o_orderdate AS first_orderdate
    FROM customer c LEFT JOIN first_order f ON c.c_custkey = f.o_custkey
    ORDER BY c.c_custkey
    """,
)
def any_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY LEFT JOIN (ANY accessor reference ClickHouseParser.py:10618):
    each customer joined to exactly one (their earliest) order, via
    operators.joins.any_join with an explicit deterministic order."""
    t = tables(spark, sf_dir)
    orders = t["orders"].select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").alias("first_orderdate"),
    )
    res = any_join(
        t["customer"],
        orders,
        on=["c_custkey"],
        order=["first_orderdate", "first_orderkey"],
        how="left",
    )
    return res.select("c_custkey", "first_orderkey", "first_orderdate").orderBy(
        "c_custkey"
    )


@query(
    "asof_join",
    oracle="""
    WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               MAX(event_id) AS click_id,
               ROUND(arg_max(value, event_id), 4) AS click_value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    errors AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id, e.user_id, c.click_id AS last_click_id,
           c.click_value AS last_click_value
    FROM errors e ASOF JOIN clicks c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    ORDER BY e.event_id
    """,
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF JOIN (ASOF accessors reference ClickHouseParser.py:10596/10618):
    for each 'error' event, the most recent 'click' by the same user at or
    before it. operators.joins.asof_join (union-and-window; one shuffle)."""
    ev = tables(spark, sf_dir)["events"]
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("last_click_id"),
            F.round(F.max_by("value", "event_id"), 4).alias("last_click_value"),
        )
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    res = asof_join(
        errors,
        clicks,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["last_click_id", "last_click_value"],
        direction="backward",
        how="inner",
    )
    return res.select(
        "event_id", "user_id", "last_click_id", "last_click_value"
    ).orderBy("event_id")


@query(
    "range_bin_join",
    oracle="""
    WITH iv AS (
      SELECT d, CAST(epoch(d) AS BIGINT) AS lo,
             CAST(epoch(d + INTERVAL 1 DAY) AS BIGINT) AS hi
      FROM (SELECT DISTINCT date_trunc('day', ts) AS d FROM events)
    )
    SELECT strftime(iv.d, '%Y-%m-%d') AS day, e.event_type,
           COUNT(*) AS n, ROUND(SUM(e.value), 2) AS total
    FROM events e
    JOIN iv ON CAST(epoch(e.ts) AS BIGINT) >= iv.lo
           AND CAST(epoch(e.ts) AS BIGINT) <  iv.hi
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
)
def range_bin_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range predicate without an equi key (theta ON constraint,
    joinConstraintClause ClickHouseParser.py:10970): events matched into
    day intervals via operators.joins.range_join — bins quantize the time
    axis so the plan is a plain shuffle equi-join on the bin id + exact
    re-check, NOT the BroadcastNestedLoopJoin Spark would otherwise pick
    for a pure inequality condition (plan-asserted in tests). 6-hour bins
    → each day-interval explodes into ≤5 bins."""
    from ..operators.joins import range_join

    e = tables(spark, sf_dir)["events"].select(
        "event_type", "value", F.unix_timestamp("ts").alias("ep")
    )
    iv = (
        tables(spark, sf_dir)["events"]
        .select(F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .select(
            "d",
            F.unix_timestamp("d").alias("lo"),
            F.unix_timestamp(F.col("d") + F.expr("INTERVAL 1 DAY")).alias("hi"),
        )
    )
    joined = range_join(e, iv, "ep", "lo", "hi", bin_width=6 * 3600)
    return (
        joined.groupBy(
            F.date_format("d", "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n.n_name,
           CAST(s.s_suppkey AS BIGINT) AS s_suppkey,
           s.s_name
    FROM supplier s RIGHT OUTER JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY n_name, s_suppkey NULLS FIRST, s_name
    """,
)
def join_right_outer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (joinOpTypeOuter, ClickHouseParser.py rule area
    :1361 joins): every nation survives even with no supplier. Catalyst
    plans this as a broadcast right-outer with the small side broadcast —
    the fact side never shuffles."""
    t = tables(spark, sf_dir)
    s, n = t["supplier"], t["nation"]
    return (
        s.join(n, s["s_nationkey"] == n["n_nationkey"], "right_outer")
        .select(
            "n_name",
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
        )
        .orderBy("n_name", F.asc_nulls_first("s_suppkey"), "s_name")
    )
