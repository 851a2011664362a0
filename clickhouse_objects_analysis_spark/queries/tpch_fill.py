"""The six TPC-H shapes the testdata schema forced us to adapt (q2/q4/q11/
q16/q20/q21), completing the 22-query family structurally.

The reference grammar parses every one of these SELECT shapes
(generated_ch_parser/ClickHouseParser.py:8931 selectStmt; the subquery and
join rules :10431-10649); the testdata schema omits partsupp, l_commitdate,
l_receiptdate, l_shipmode and o_comment, so the canonical predicates are
re-expressed on columns that exist while keeping each query's defining
STRUCTURE intact:

  q2  — correlated scalar MIN subquery selecting the cheapest supplier
        per part within a region (supply cost := min unit price observed
        in lineitem).
  q4  — EXISTS semi join from orders to a filtered fact subquery
        ("late" := a returned line, l_returnflag = 'R').
  q11 — GROUP BY + HAVING against a *global* scalar-subquery threshold
        (share-of-total predicate).
  q16 — COUNT(DISTINCT) roll-up with a NOT IN exclusion subquery.
  q20 — IN-subquery nesting three deep with a correlated aggregate
        threshold (supplier's share of a part's shipped volume).
  q21 — the EXISTS + NOT EXISTS pair over the same fact table (the only
        supplier with a returned line in a multi-supplier order).

Float discipline (the driver hashes exact values): SUMs that feed ROUND
go through DECIMAL(38,6); MIN/MAX over doubles and per-row double
arithmetic are order-independent and stay native; every ORDER BY sorts on
exact (decimal/int/string) keys before any rounded projection.

Scale notes: part, supplier, nation, region are dimension tables —
every plan below broadcasts them (part after its filter). The only
shuffles are lineitem aggregations on their natural grouping keys with
map-side partial aggregation; q21's per-order roll-up shuffles lineitem
once on l_orderkey and everything after is dimension-sized. No correlated
subquery survives into the physical plan: each is decorrelated by hand
into an aggregate + broadcast or same-key join, which is exactly what
Catalyst's decorrelation would aim for — stated here so the 100 TB plan
is the written-down one, not an optimizer accident.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables

_DEC = "decimal(38,6)"


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: "late" order :=
    has a returned line (no l_commitdate/l_receiptdate in the testdata).
    EXISTS compiles to a LEFT SEMI join on the natural key — at 100 TB
    both sides shuffle on l_orderkey once and the count is a
    dimension-small roll-up on priority."""
    t = tables(spark, sf_dir)
    o, li = t["orders"], t["lineitem"]
    quarter = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        quarter.join(returned, quarter.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH sc AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
    FROM part p
    JOIN sc        ON sc.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = sc.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      AND sc.cost = (
          SELECT MIN(sc2.cost)
          FROM sc sc2
          JOIN supplier s2 ON s2.s_suppkey = sc2.l_suppkey
          JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
          WHERE sc2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: supply cost :=
    MIN(l_extendedprice / l_quantity) observed in lineitem per
    (part, supplier) — no partsupp table. The correlated scalar MIN is
    decorrelated into a per-part aggregate joined back on p_partkey
    (identical result set: ties on the exact double min all survive, as
    in the canonical query). lineitem shuffles once on (partkey,
    suppkey) with map-side combine; the per-part min re-aggregates that
    dimension-sized result; part/supplier/nation/region broadcast.
    MIN over doubles is order-independent, so cross-engine equality on
    the join predicate is exact."""
    t = tables(spark, sf_dir)
    li, p, s, n, r = t["lineitem"], t["part"], t["supplier"], t["nation"], t["region"]
    europe_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    sc = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
        .join(F.broadcast(europe_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_per_part = sc.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    return (
        sc.join(min_per_part, on="l_partkey")
        .filter(F.col("cost") == F.col("min_cost"))
        .join(
            F.broadcast(p.filter(F.col("p_size") == 15)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH scoped AS (
        SELECT l.l_partkey,
               CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(38,6)) AS v
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
    ),
    per_part AS (
        SELECT l_partkey, SUM(v) AS val FROM scoped GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(ROUND(val, 2) AS DOUBLE) AS value
    FROM per_part
    WHERE val > (SELECT SUM(v) * 0.001 FROM scoped)
    ORDER BY val DESC, l_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: part "value"
    := revenue booked through suppliers of one region (no partsupp); the
    defining HAVING-against-a-global-scalar structure is intact. The
    scalar total re-aggregates the per-part sums (one extra
    dimension-sized agg, no second fact scan) and broadcasts as a 1-row
    cross join — at 100 TB the fact table is read once, shuffled once on
    l_partkey. Exact decimal arithmetic end-to-end; the threshold
    compare and the sort both run on the exact decimal."""
    t = tables(spark, sf_dir)
    li, s, n, r = t["lineitem"], t["supplier"], t["nation"], t["region"]
    asia_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    scoped = li.join(F.broadcast(asia_supp), li.l_suppkey == asia_supp.s_suppkey).select(
        "l_partkey",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(_DEC).alias("v"),
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum("v").alias("val"))
    total = per_part.agg((F.sum("val") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .orderBy(F.col("val").desc(), "l_partkey")
        .select("l_partkey", F.round("val", 2).cast("double").alias("value"))
    )


@query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#17'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): COUNT(DISTINCT supplier)
    per part attribute triple, excluding complained-about suppliers —
    adapted exclusion := negative account balance (no o_comment). NOT IN
    compiles to a broadcast LEFT ANTI join (s_suppkey is non-null, so
    NOT IN and ANTI agree); part is broadcast after its selective
    filter. The distinct-count shuffles (brand, type, size, suppkey)
    once with map-side dedup, then a dimension-sized final roll-up."""
    t = tables(spark, sf_dir)
    li, p, s = t["lineitem"], t["part"], t["supplier"]
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = p.filter(
        (F.col("p_brand") != "Brand#17")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_part_promotion",
    oracle="""
    WITH red_1997 AS (
        SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    ),
    part_total AS (
        SELECT l_partkey, SUM(qty) AS part_qty FROM red_1997
        GROUP BY l_partkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT r.l_suppkey
        FROM red_1997 r
        JOIN part_total pt ON pt.l_partkey = r.l_partkey
        WHERE r.qty > 0.3 * pt.part_qty)
    ORDER BY s.s_name
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: a supplier
    qualifies when it shipped > 30% of a red-named part's 1997 volume
    (no partsupp availqty). Keeps the three-deep IN-subquery nesting
    with a correlated aggregate threshold; the correlation decorrelates
    into a per-part total joined back on partkey (dimension-sized after
    the first roll-up). The part-name filter broadcasts into the fact
    scan, the fact shuffles once on (suppkey, partkey), and the final
    IN is a broadcast LEFT SEMI against the 25k-row supplier side.
    l_quantity is integral-valued, so every sum and the 0.3× compare
    are exact in any accumulation order."""
    t = tables(spark, sf_dir)
    li, p, s = t["lineitem"], t["part"], t["supplier"]
    red = p.filter(F.col("p_name").startswith("red")).select("p_partkey")
    red_1997 = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = red_1997.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    qualifying = (
        red_1997.join(part_total, on="l_partkey")
        .filter(F.col("qty") > F.lit(0.3) * F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qualifying), s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(DISTINCT o.o_orderkey) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "kept
    waiting" := the supplier with the ONLY returned line in a
    multi-supplier finished order (no l_receiptdate/l_commitdate). The
    EXISTS + NOT EXISTS pair is the defining structure; rather than two
    extra passes over the fact table, one per-order roll-up computes
    (distinct suppliers, distinct returning suppliers, the returning
    supplier key) — EXISTS ⇔ n_supp > 1, NOT EXISTS ⇔ exactly one
    returning supplier. lineitem shuffles ONCE on l_orderkey (the
    canonical self-join form scans it three times); orders joins on the
    same key, and everything downstream is supplier-dimension-sized.
    MAX(CASE WHEN returned) is well-defined because the filter pins the
    returning-supplier set to size 1."""
    t = tables(spark, sf_dir)
    li, o, s = t["lineitem"], t["orders"], t["supplier"]
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
        F.max(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("ret_supp"),
    )
    lone_returner = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
    ).select("l_orderkey", "ret_supp")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        lone_returner.join(finished, lone_returner.l_orderkey == finished.o_orderkey)
        .groupBy("ret_supp")
        .agg(F.countDistinct("o_orderkey").alias("numwait"))
        .join(F.broadcast(s), F.col("ret_supp") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
