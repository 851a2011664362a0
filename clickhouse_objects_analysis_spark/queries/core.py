"""Relational core: scan / filter / project / aggregate / sort / limit.

Covers SURVEY.md §2.B "Scans", "Projections / filters", "Aggregations",
"Sorts / limits / top-k" rows. Every query is pure DataFrame API (JVM-side,
whole-stage codegen); floats are rounded identically on both sides so the
driver's value hash is stable across engines.

Reference parity anchors are cited per query (reference file:line).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.limits import limit_by, limit_with_ties
from ..operators.totals import with_totals
from .registry import query, tables


# --------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape).
# Exercises scan → pushed filter → hash agg (partial+final) → sort in one
# plan. Scale: single shuffle on the 2-value grouping key; the parquet scan
# prunes to 8 of 11 columns and pushes the l_shipdate predicate
# (verify: .explain shows PushedFilters + ReadSchema).
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter+groupBy+agg+sort — the SELECT core of the grammar's
    selectStmt (reference ClickHouseParser.py:8931)."""
    li = tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE + projection (whereClause reference ClickHouseParser.py:9735;
    PREWHERE :9690 is subsumed by parquet predicate pushdown)."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            # per-row arithmetic stays unrounded: IEEE ops on identical
            # inputs are bit-identical across engines; rounding would
            # INTRODUCE decimal-vs-binary divergence at .xx5 boundaries
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "group_by_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS order_cnt, ROUND(SUM(o_totalprice), 2) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    ORDER BY o_custkey
    """,
)
def group_by_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter (havingClause reference
    ClickHouseParser.py:9979)."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("order_cnt") >= 15)
        .orderBy("o_custkey")
    )


@query(
    "group_by_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def group_by_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH ROLLUP (GroupByClauseCubeOrRollupContext reference
    ClickHouseParser.py:9841) → df.rollup."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "group_by_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def group_by_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH CUBE (reference ClickHouseParser.py:9841) → df.cube."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (GroupByClauseGroupingSetsContext reference
    ClickHouseParser.py:9812) — via Spark SQL on the registered view."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@query(
    "with_totals",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT NULL AS o_orderstatus, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    ORDER BY o_orderstatus NULLS LAST
    """,
)
def with_totals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... WITH TOTALS (TOTALS accessor in SelectStmtContext,
    reference ClickHouseParser.py:8931-9030): grand-total row appended,
    implemented via rollup + grouping_id filter (operators.totals)."""
    o = tables(spark, sf_dir)["orders"]
    res = with_totals(
        o,
        ["o_orderstatus"],
        [
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        ],
    )
    return res.orderBy(F.col("o_orderstatus").asc_nulls_last())


@query(
    "conditional_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_hi_disc,
           ROUND(SUM(CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END), 2) AS sum_big_qty_price,
           ROUND(AVG(CASE WHEN l_tax > 0.04 THEN l_extendedprice END), 4) AS avg_taxed_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse -If combinators (countIf/sumIf/avgIf — plain function
    names via reference ClickHouseParser.py:15571) = agg over CASE WHEN."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
                "cnt_hi_disc"
            ),
            F.round(
                F.sum(
                    F.when(F.col("l_quantity") > 25, F.col("l_extendedprice")).otherwise(
                        0
                    )
                ),
                2,
            ).alias("sum_big_qty_price"),
            F.round(
                F.avg(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 4
            ).alias("avg_taxed_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "arg_max_min",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, o_totalprice) AS key_of_max_price,
           arg_min(o_orderkey, o_totalprice) AS key_of_min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def arg_max_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse argMax/argMin (function names via reference
    ClickHouseParser.py:15571) → F.max_by / F.min_by."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("key_of_max_price"),
            F.min_by("o_orderkey", "o_totalprice").alias("key_of_min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "quantiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS p90_price,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse quantile/median (reference ClickHouseParser.py:15571) →
    exact F.percentile (interpolated, matches quantile_cont). The approx
    variant (uniq-style) is `approx_quantiles` below (rows-only check)."""
    li = tables(spark, sf_dir)["lineitem"]
    # One percentile aggregate with an array of quantiles — a single
    # per-group buffer instead of three independent exact-percentile sorts.
    q = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        li.groupBy("l_returnflag")
        .agg(q.alias("__q"))
        .select(
            "l_returnflag",
            F.round(F.col("__q")[0], 4).alias("median_price"),
            F.round(F.col("__q")[1], 4).alias("p90_price"),
            F.round(F.col("__q")[2], 4).alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "approx_quantiles",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_in_bound,
           TRUE AS p99_in_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantileTDigest-style approximate percentiles → percentile_approx
    (sketch-based; at 100 TB this is the one to use — single-pass,
    mergeable, bounded memory per group).

    The sketch value itself is engine-specific, but its ERROR BOUND is a
    deterministic claim: percentile_approx(accuracy=10000) guarantees
    rank error ≤ 1e-4·N. The check is rank-based and SORT-FREE: pass 1
    runs the sketch, pass 2 counts rows strictly below / at-or-below
    each estimate, and the bound holds iff the estimate's rank interval
    [cnt_lt, cnt_le] intersects [(q−δ)·n, (q+δ)·n] with δ = 0.02 (200×
    the guarantee). Two cheap scans instead of the exact-percentile
    per-group sort the first cut of this gate paid (0.62 s → 1.99 s at
    sf0.1; this shape is ~0.4 s) — and the same two-pass rank check is
    how you'd validate a sketch at 100 TB, where the exact sort is the
    thing you bought the sketch to avoid."""
    li = tables(spark, sf_dir)["lineitem"]
    sk = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a50"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("a99"),
    )
    x = F.col("l_extendedprice")
    g = (
        li.join(F.broadcast(sk), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(x < F.col("a50"), 1).otherwise(0)).alias("lt50"),
            F.sum(F.when(x <= F.col("a50"), 1).otherwise(0)).alias("le50"),
            F.sum(F.when(x < F.col("a99"), 1).otherwise(0)).alias("lt99"),
            F.sum(F.when(x <= F.col("a99"), 1).otherwise(0)).alias("le99"),
        )
    )
    n = F.col("n")

    def in_bound(lt: str, le: str, q: float, delta: float = 0.02):
        return (F.col(lt) <= (q + delta) * n) & (
            F.col(le) >= (q - delta) * n
        )

    return g.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        in_bound("lt50", "le50", 0.5).alias("p50_in_bound"),
        in_bound("lt99", "le99", 0.99).alias("p99_in_bound"),
    ).orderBy("l_returnflag")


@query(
    "approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS uniq_orders,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def approx_count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse uniq/uniqHLL12 (reference ClickHouseParser.py:15571) →
    approx_count_distinct (HyperLogLog++). The exact variant is
    `count_distinct` below.

    The HLL estimate is engine-specific, but its relative-error bound is
    deterministic: at rsd=0.01 the estimate must sit within 5% of the
    exact count (5× the configured rsd). Exact and sketch run as two
    SEPARATE single-purpose aggregations joined on the 3-row group key:
    fusing them into one agg makes Catalyst plan the distinct via Expand
    (every row duplicated into both aggregation paths) and drags the
    high-precision HLL over the expanded rows — 6.7 s at sf0.1 vs ~0.8 s
    for the split plan."""
    li = tables(spark, sf_dir)["lineitem"]
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("uniq_orders")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx")
    )
    g = exact.join(F.broadcast(approx), "l_returnflag")
    return g.select(
        "l_returnflag",
        F.col("uniq_orders").cast("long").alias("uniq_orders"),
        (
            F.abs(F.col("approx") - F.col("uniq_orders"))
            <= 0.05 * F.col("uniq_orders")
        ).alias("within_bound"),
    ).orderBy("l_returnflag")


@query(
    "count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS uniq_orders,
           COUNT(DISTINCT l_suppkey)  AS uniq_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniqExact / COUNT(DISTINCT) (reference ClickHouseParser.py:15571)."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_orderkey").alias("uniq_orders"),
            F.count_distinct("l_suppkey").alias("uniq_suppliers"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "group_array",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list(n_name ORDER BY n_name), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def group_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse groupArray (reference ClickHouseParser.py:15571) →
    collect_list; sorted + stringified for a deterministic value hash."""
    n = tables(spark, sf_dir)["nation"]
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
        )
        .orderBy("n_regionkey")
    )


@query(
    "order_by_nulls_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def order_by_nulls_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT/OFFSET (orderByClause reference
    ClickHouseParser.py:10027; limitClause :10241). Total sort with a limit
    collapses to TakeOrderedAndProject — no full shuffle at scale."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc_nulls_last(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(20)
    )


@query(
    "limit_by",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 2
    ORDER BY o_custkey, o_orderkey
    """,
)
def limit_by_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT n BY cols (limitByClause reference ClickHouseParser.py:10153)
    → operators.limits.limit_by (row_number window rewrite)."""
    o = tables(spark, sf_dir)["orders"]
    res = limit_by(
        o,
        by=["o_custkey"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        n=2,
    )
    return res.select("o_custkey", "o_orderkey", "o_totalprice").orderBy(
        "o_custkey", "o_orderkey"
    )


@query(
    "limit_with_ties",
    oracle="""
    SELECT l_quantity FROM (
        SELECT l_quantity, rank() OVER (ORDER BY l_quantity) AS rk
        FROM lineitem
    ) WHERE rk <= 100
    ORDER BY l_quantity
    """,
)
def limit_with_ties_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT n WITH TIES (reference ClickHouseParser.py:10241-area) →
    rank()-filter rewrite (operators.limits.limit_with_ties)."""
    li = tables(spark, sf_dir)["lineitem"]
    res = limit_with_ties(li, order=[F.col("l_quantity")], n=100)
    return res.select("l_quantity").orderBy("l_quantity")


@query(
    "deterministic_sample",
    oracle="""
    SELECT COUNT(*) AS sampled_rows, ROUND(SUM(o_totalprice), 2) AS sampled_total
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE k (SampleClauseContext reference ClickHouseParser.py:11016):
    ClickHouse samples deterministically on the SAMPLE BY key hash; the
    portable equivalent is a key-modulo filter. (Random TABLESAMPLE exists
    as df.sample but is not oracle-comparable.)"""
    o = tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderkey") % 10 == 0).agg(
        F.count(F.lit(1)).alias("sampled_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("sampled_total"),
    )


@query(
    "group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (GroupByClauseAllContext reference
    ClickHouseParser.py:9771) — native in Spark SQL 3.4+."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


@query(
    "cte_and_subquery",
    oracle="""
    WITH big_orders AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    )
    SELECT c_mktsegment, COUNT(*) AS big_cnt,
           ROUND(SUM(o_totalprice), 2) AS big_total
    FROM big_orders b JOIN customer c ON b.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def cte_and_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH/CTE (withClause reference ClickHouseParser.py:9222) + scalar
    subquery (ColumnExprSubqueryContext :14920). Scale note: the scalar
    subquery is one tiny agg job; the join broadcasts `customer`."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        )
        SELECT c_mktsegment, COUNT(*) AS big_cnt,
               ROUND(SUM(o_totalprice), 2) AS big_total
        FROM big_orders b JOIN customer c ON b.o_custkey = c.c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "in_subquery",
    oracle="""
    SELECT COUNT(*) AS cnt, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) predicate (reference ClickHouseParser.py:14920) —
    Catalyst plans it as a left-semi join."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT COUNT(*) AS cnt, ROUND(SUM(l_extendedprice), 2) AS total
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        """
    )


@query(
    "top_k",
    oracle="""
    SELECT p_brand, COUNT(*) AS cnt
    FROM part
    GROUP BY p_brand
    ORDER BY cnt DESC, p_brand
    LIMIT 5
    """,
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse topK agg (reference ClickHouseParser.py:15571) — exact
    form: group-count + TakeOrderedAndProject."""
    p = tables(spark, sf_dir)["part"]
    return (
        p.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "p_brand")
        .limit(5)
    )
