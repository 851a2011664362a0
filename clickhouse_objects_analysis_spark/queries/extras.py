"""Remaining §2.B surface: dictionaries (dictGet), map functions, decimal /
UInt64 arithmetic, and a join-heavy flagship (TPC-H Q5 shape) exercising
the broadcast-star plan shape the 100 TB design leans on.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.ch import ch_expr
from .registry import query, tables


@query(
    "dict_get_lookup",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation, COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    ORDER BY region, nation
    """,
)
def dict_get_lookup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse external dictionaries (dictionarySchemaClause, rule list
    ClickHouseParser.py:1361): ``dictGet('nation_dict', 'n_name', key)``
    is a broadcast-joined dimension lookup in Spark — the dictionary IS a
    broadcast hash table, built once per executor, no shuffle of the fact
    side."""
    t = tables(spark, sf_dir)
    c, n, r = t["customer"], t["nation"], t["region"]
    enriched = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return (
        enriched.groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("region", "nation")
    )


@query(
    "map_functions",
    oracle="""
    SELECT p_partkey::BIGINT AS p_partkey,
           2::BIGINT AS n_keys,
           p_retailprice AS brand_price,
           p_size::DOUBLE AS size_val,
           'brand_price,size' AS keys_sorted
    FROM part
    ORDER BY p_partkey
    """,
)
def map_functions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map type surface (Map(K,V) ColumnTypeExprComplex :14415; map fns via
    :15571): build map<string,double> per row, then size / element_at /
    map_keys — the oracle states the expected values directly from the
    source columns, so a wrong map op diverges."""
    p = tables(spark, sf_dir)["part"]
    m = F.create_map(
        F.lit("brand_price"), F.col("p_retailprice"),
        F.lit("size"), F.col("p_size").cast("double"),
    )
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.size(m).cast("long").alias("n_keys"),
        F.element_at(m, "brand_price").alias("brand_price"),
        F.element_at(m, "size").alias("size_val"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_sorted"),
    ).orderBy("p_partkey")


@query(
    "decimal_uint64_arithmetic",
    oracle="""
    SELECT l_returnflag,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS exact_sum,
           SUM(CAST(l_orderkey AS DECIMAL(20,0)) * 4294967296)::DOUBLE AS big_sum
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def decimal_uint64_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal(p,s) + UInt64 handling (ColumnTypeExprParam :14374; SURVEY
    §1.2): exact decimal summation, and >int64-range arithmetic through
    DecimalType(20,0) — the documented UInt64 widening strategy. Final
    cast to double only for cross-engine comparison."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("exact_sum"),
            F.sum(
                F.col("l_orderkey").cast("decimal(20,0)") * F.lit(4294967296)
            )
            .cast("double")
            .alias("big_sum"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "ch_function_translation",
    oracle="""
    SELECT l_orderkey::BIGINT AS okey,
           l_linenumber::BIGINT AS ln,
           CAST(strftime(l_shipdate, '%Y%m') AS BIGINT) AS yyyymm,
           CAST(isodow(l_shipdate) AS BIGINT) AS dow,
           (l_orderkey // 100)::BIGINT AS bucket,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS band,
           lower(l_returnflag) || '_' || upper(l_linestatus) AS tag,
           6.0 AS arr_sum,
           ((l_orderkey >> 24) & 255) || '.' || ((l_orderkey >> 16) & 255)
               || '.' || ((l_orderkey >> 8) & 255) || '.' || (l_orderkey & 255)
               AS ip,
           CAST(('0x' || substr(md5(l_returnflag), 1, 15)) AS BIGINT) AS h
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    ORDER BY okey, ln
    """,
)
def ch_function_translation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse→Spark function-name translation table exercised
    end-to-end (functions/ch.py; grammar treats every function as a plain
    identifier, ClickHouseParser.py:15571): date shims (toYYYYMM,
    toDayOfWeek Mon=1), truncating intDiv, multiIf, string ops, 1-indexed
    array ops over range(), IPv4NumToString bit arithmetic, halfMD5 —
    every expression below is built via ch_expr(name, ...)."""
    # Deterministic 2% slice: this query demonstrates translation-table
    # semantics; the filter keeps the oracle compare and the global sort
    # from dominating its cost at larger SFs.
    li = tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") % 50 == 0)
    q = F.col("l_quantity")
    return li.select(
        F.col("l_orderkey").cast("long").alias("okey"),
        F.col("l_linenumber").cast("long").alias("ln"),
        ch_expr("toYYYYMM", F.col("l_shipdate")).cast("long").alias("yyyymm"),
        ch_expr("toDayOfWeek", F.col("l_shipdate")).cast("long").alias("dow"),
        ch_expr("intDiv", F.col("l_orderkey"), F.lit(100))
        .cast("long")
        .alias("bucket"),
        ch_expr(
            "multiIf", q < 10, F.lit("low"), q < 30, F.lit("mid"), F.lit("high")
        ).alias("band"),
        ch_expr(
            "concat",
            ch_expr("lower", F.col("l_returnflag")),
            F.lit("_"),
            ch_expr("upper", F.col("l_linestatus")),
        ).alias("tag"),
        ch_expr("arraySum", ch_expr("range", F.lit(4))).alias("arr_sum"),
        ch_expr("IPv4NumToString", F.col("l_orderkey")).alias("ip"),
        ch_expr("halfMD5", F.col("l_returnflag")).alias("h"),
    ).orderBy("okey", "ln")


@query(
    "bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    ORDER BY o_orderpriority
    """,
)
def bucketed_colocated_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join — the ClickHouse LOCAL/co-located-shard
    join (JoinExprOpContext :10332) and the standard 100 TB answer to the
    fact⋈fact shuffle: both tables written bucketed+sorted by the join key
    (`bucketBy(8, orderkey).sortBy(orderkey)`), so the sort-merge join
    reads bucket i against bucket i with NO Exchange and no sort in the
    plan (tests assert this). The bucketed write is paid ONCE at ingest —
    modeled literally: tables are external (data under .scratch), and a
    later session re-attaches the existing bucketed files via CREATE
    TABLE ... CLUSTERED BY ... LOCATION instead of rewriting them."""
    from ..sources.io import scratch_path

    t = tables(spark, sf_dir)
    key = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    specs = (
        (
            f"lineitem_b_{key}",
            t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
            "l_orderkey",
            "l_orderkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE",
        ),
        (
            f"orders_b_{key}",
            t["orders"].select("o_orderkey", "o_orderpriority"),
            "o_orderkey",
            "o_orderkey BIGINT, o_orderpriority STRING",
        ),
    )
    for name, df, col, ddl_cols in specs:
        path = scratch_path("buckets", key, name)
        if spark.catalog.tableExists(name):
            continue
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            spark.sql(
                f"CREATE TABLE {name} ({ddl_cols}) USING parquet "
                f"CLUSTERED BY ({col}) SORTED BY ({col}) INTO 8 BUCKETS "
                f"LOCATION '{path}'"
            )
        else:
            (
                df.write.mode("overwrite")
                .option("path", path)
                .bucketBy(8, col)
                .sortBy(col)
                .saveAsTable(name)
            )
    ln, on = specs[0][0], specs[1][0]
    l = spark.table(ln)
    o = spark.table(on)
    joined = l.hint("merge").join(o, l["l_orderkey"] == o["o_orderkey"])
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "correlated_scalar_subquery",
    oracle="""
    SELECT l1.l_partkey::BIGINT AS l_partkey,
           l1.l_orderkey::BIGINT AS l_orderkey,
           l1.l_extendedprice AS min_price
    FROM lineitem l1
    WHERE l1.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey
    )
    AND l1.l_partkey < 200
    ORDER BY l_partkey, l_orderkey
    """,
)
def correlated_scalar_subquery_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (ColumnExprSubqueryContext :14920),
    TPC-H Q2/Q17 shape: rows priced at their group minimum. Written as
    SQL so Catalyst's subquery decorrelation runs — it plans as an
    aggregate + join, not a per-row subquery (no O(n²))."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(l1.l_partkey AS BIGINT) AS l_partkey,
               CAST(l1.l_orderkey AS BIGINT) AS l_orderkey,
               l1.l_extendedprice AS min_price
        FROM lineitem l1
        WHERE l1.l_extendedprice = (
            SELECT MIN(l2.l_extendedprice) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey
        )
        AND l1.l_partkey < 200
        ORDER BY l_partkey, l_orderkey
        """
    )


@query(
    "select_except_settings",
    oracle="""
    SELECT o_orderkey::BIGINT AS o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_totalprice > 400000
    ORDER BY o_orderkey
    """,
)
def select_except_settings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT COLUMNS(...) EXCEPT (columnExceptExpr, rule list
    ClickHouseParser.py:1361) → df.drop; plus per-query SETTINGS
    (settingsClause :10271). The DF is returned LAZY: per-query session
    confs in Spark must scope the *terminal action*, so the SETTINGS
    analogue lives in functions.settings.query_settings (tested in
    TestKillSystem) and is applied by whoever runs the action — round 1
    collected mid-query here to force the conf to cover execution, which
    was the repo's only driver-collect in a batch query path."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.filter(F.col("o_totalprice") > 400000)
        .drop("o_custkey", "o_totalprice", "o_orderdate")
        .withColumn("o_orderkey", F.col("o_orderkey").cast("long"))
        .orderBy("o_orderkey")
    )


@query(
    "skew_salted_join",
    oracle="""
    WITH dim(flag, flag_name) AS (
        VALUES ('A', 'accepted'), ('N', 'none'), ('R', 'returned')
    )
    SELECT d.flag_name,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN dim d ON l.l_returnflag = d.flag
    GROUP BY 1
    ORDER BY flag_name
    """,
)
def skew_salted_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join on a maximally skewed key (l_returnflag has 3 values —
    an unsalted shuffle join runs in 3 tasks no matter the cluster size).
    operators.skew fans each hot key over 16 salts; the merge hint keeps
    the dim from broadcasting so the technique is actually exercised.
    Result provably identical to the plain join (the oracle is one)."""
    li = tables(spark, sf_dir)["lineitem"]
    dim = spark.createDataFrame(
        [("A", "accepted"), ("N", "none"), ("R", "returned")],
        "l_returnflag string, flag_name string",
    )
    from ..operators.skew import salted_join

    joined = salted_join(
        li.select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"),
        dim.hint("merge"),
        on=["l_returnflag"],
        fact_unique_cols=["l_orderkey", "l_linenumber"],
        n_salts=16,
    )
    return (
        joined.groupBy("flag_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("flag_name")
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    ORDER BY revenue DESC, nation
    """,
)
def q5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the star-join stress test. Plan shape to want at
    100 TB: lineitem (the only big fact) joins orders on the shuffle key,
    every dimension (customer/supplier/nation/region) broadcasts, the
    region filter prunes before the join, and the agg runs partial+final.
    AQE picks broadcast automatically at these sizes; the explicit hints
    pin the plan at any scale factor."""
    t = tables(spark, sf_dir)
    l, o, c = t["lineitem"], t["orders"], t["customer"]
    s, n, r = t["supplier"], t["nation"], t["region"]
    joined = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("c_nationkey") == F.col("s_nationkey"))
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "nation")
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           SUM(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    )
    GROUP BY 1, 2, 3, 4
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers (HAVING subquery + 3-way
    join; IN-subquery surface per ColumnExprSubqueryContext
    ClickHouseParser.py:14920). Scale plan: the HAVING aggregate reduces
    lineitem to one row per qualifying order BEFORE any join (map-side
    combined); the qualifying-order set is tiny (top ~0.3% of orders) so
    it broadcasts as a semi-join filter into BOTH fact scans — lineitem
    and orders are each filtered before the customer join, and the only
    big shuffle left is the final per-order aggregation."""
    t = tables(spark, sf_dir)
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .select("l_orderkey")
    )
    li_f = li.join(F.broadcast(big), on="l_orderkey", how="left_semi")
    o_f = o.join(
        F.broadcast(big.withColumnRenamed("l_orderkey", "o_orderkey")),
        on="o_orderkey",
        how="left_semi",
    )
    return (
        li_f.join(o_f, li_f["l_orderkey"] == o_f["o_orderkey"])
        .join(c, o_f["o_custkey"] == c["c_custkey"])
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "tablesample_fraction",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS within_5sigma
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def tablesample_fraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random TABLESAMPLE (SAMPLE ratio without OFFSET — the probabilistic
    variant next to deterministic_sample's hash-mod): ``df.sample`` plants
    a per-partition Bernoulli filter directly above the scan, so sampling
    is pushdown-adjacent (no shuffle, no state). The sampled row SET is
    partition-layout-dependent, so no oracle can reproduce it — but the
    binomial concentration claim is deterministic: per group, the sampled
    count must land within 5σ of n·p (σ = √(n·p·(1−p)); for the smallest
    test group that is still a ±4% corridor, crossed with probability
    < 1e-6). The query emits the exact per-group total plus that bound
    check, making the sampler driver-checkable."""
    li = tables(spark, sf_dir)["lineitem"]
    p = 0.1
    samp = (
        li.sample(fraction=p, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_samp"))
    )
    tot = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_total"))
    j = tot.join(samp, "l_returnflag", "left").na.fill({"n_samp": 0})
    mean = F.col("n_total") * F.lit(p)
    sigma = F.sqrt(F.col("n_total") * F.lit(p * (1 - p)))
    return j.select(
        "l_returnflag",
        F.col("n_total").cast("long").alias("n_total"),
        (F.abs(F.col("n_samp") - mean) <= F.lit(5.0) * sigma)
        .alias("within_5sigma"),
    ).orderBy("l_returnflag")


@query(
    "exists_subquery",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(1 AS INT) AS has_big_order
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 250000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F'
                        AND o.o_totalprice < 1000)
    ORDER BY c_custkey
    """,
)
def exists_subquery_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS predicates (grammar
    ColumnExprSubqueryContext + NOT, ClickHouseParser.py:14920) via
    ``spark.sql`` so Catalyst's subquery decorrelation is exercised
    end-to-end: both predicates rewrite to left-semi / left-anti hash
    joins on o_custkey — no per-row subquery execution, and at scale the
    filtered orders side is small enough that AQE broadcasts it."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name, CAST(1 AS INT) AS has_big_order
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 250000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F'
                            AND o.o_totalprice < 1000)
        ORDER BY c_custkey
        """
    )


@query(
    "pivot_event_types",
    oracle="""
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                AS BIGINT) AS error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END)
                AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                AS BIGINT) AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def pivot_event_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — long-to-wide event counts per user. ``groupBy().pivot()``
    with an EXPLICIT value list compiles to ONE pass of conditional
    aggregates (pivot_first), exactly the CASE-WHEN form of the oracle;
    omitting the list would cost an extra distinct-values job. One
    map-side-combined shuffle on user_id; width is bounded by the value
    list, so the plan is scale-independent of event volume."""
    ev = tables(spark, sf_dir)["events"]
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    ).orderBy("user_id")


@query(
    "running_difference",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id, value,
               lag(value) OVER w AS prev_value,
               lag(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           COALESCE(value - prev_value, 0.0) AS value_delta,
           CAST(COALESCE(epoch_us(ts) - epoch_us(prev_ts), 0)
                AS BIGINT) AS micros_since_prev
    FROM o WHERE user_id < 10 ORDER BY user_id, ts, event_id
    """,
)
def running_difference_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``runningDifference`` — per-user delta of value and of
    timestamp vs the previous event, as a lag window (the relational
    form of CH's block-order-dependent original; PARTITION BY makes the
    semantics deterministic, which CH itself recommends via
    neighbor()/window functions now). Float-parity: value - prev_value
    subtracts the identical doubles on both engines; time delta is
    integer microseconds. One shuffle on user_id, sort within."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    tdelta = (
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    ).cast("long")
    return (
        ev.filter(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.coalesce(delta, F.lit(0.0)).alias("value_delta"),
            F.coalesce(tdelta, F.lit(0)).alias("micros_since_prev"),
        )
        .orderBy("user_id", "ts", "event_id")
        .drop("ts")
    )
