"""Scalar expression / function-library surface (grammar: every labeled
columnExpr alternative, ClickHouseParser.py:14808-15627; generic function
call :15571). Each query batches one function family; the ClickHouse
function names covered are listed in the docstrings — the name→Spark
translation table itself lives in functions/ch.py."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.fill import with_fill
from .registry import query, tables


@query(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           lower(c_name)                          AS name_lower,
           upper(c_mktsegment)                    AS seg_upper,
           concat(c_name, ':', c_mktsegment)      AS name_seg,
           substr(c_name, 1, 8)                   AS name_prefix,
           length(c_name)                         AS name_len,
           replace(c_name, 'Customer', 'Cust')    AS name_short,
           strpos(c_name, '#')                    AS hash_pos,
           trim(c_mktsegment)                     AS seg_trim,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded
    FROM customer
    ORDER BY c_custkey
    LIMIT 500
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse lower/upper/concat/substring/length/replaceAll/position/
    trim/leftPad (names via reference ClickHouseParser.py:15571) →
    pyspark.sql.functions equivalents; also SUBSTRING/TRIM special syntax
    (ColumnExprSubstringContext :14979, ColumnExprTrimContext :15251)."""
    c = tables(spark, sf_dir)["customer"]
    return (
        c.select(
            "c_custkey",
            F.lower("c_name").alias("name_lower"),
            F.upper("c_mktsegment").alias("seg_upper"),
            F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.length("c_name").alias("name_len"),
            F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
            F.instr(F.col("c_name"), "#").alias("hash_pos"),
            F.trim(F.col("c_mktsegment")).alias("seg_trim"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        )
        .orderBy("c_custkey")
        .limit(500)
    )


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('day',   o_orderdate), '%Y-%m-%d') AS order_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           strftime(o_orderdate, '%Y%m')                       AS order_yyyymm,
           EXTRACT(year FROM o_orderdate)                      AS order_year,
           EXTRACT(month FROM o_orderdate)                     AS order_month_num,
           EXTRACT(isodow FROM o_orderdate)                    AS order_isodow,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
    FROM orders
    ORDER BY o_orderkey
    LIMIT 1000
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse toStartOfDay/toStartOfMonth/toYYYYMM/toYear/toMonth/
    toDayOfWeek/dateDiff/date-plus-INTERVAL (names via reference
    ClickHouseParser.py:15571; INTERVAL literal :15177, EXTRACT :14873)."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.select(
            "o_orderkey",
            # date-typed outputs serialize as yyyy-MM-dd strings so the
            # value hash is representation-independent across engines
            F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_day"
            ),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            ),
            F.date_format("o_orderdate", "yyyyMM").alias("order_yyyymm"),
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month_num"),
            (F.weekday("o_orderdate") + 1).cast("long").alias("order_isodow"),
            F.datediff(
                F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")
            ).cast("long").alias("days_to_2002"),
            F.date_format(
                F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd"
            ).alias("due_date"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@query(
    "math_functions",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1000)                   AS abs_diff,
           ROUND(sqrt(p_retailprice), 4)               AS sqrt_price,
           ROUND(ln(p_retailprice), 4)                 AS ln_price,
           ROUND(exp(p_size / 25.0), 4)                AS exp_size,
           ROUND(pow(p_size, 2), 1)                    AS size_sq,
           CAST(floor(p_retailprice) AS BIGINT)        AS floor_price,
           CAST(ceil(p_retailprice) AS BIGINT)         AS ceil_price,
           p_size % 7                                  AS size_mod
    FROM part
    ORDER BY p_partkey
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse abs/sqrt/log/exp/pow/floor/ceil/modulo (reference
    ClickHouseParser.py:15571) + arithmetic operators (:14824/:15628)."""
    p = tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000).alias("abs_diff"),
        F.round(F.sqrt("p_retailprice"), 4).alias("sqrt_price"),
        F.round(F.log("p_retailprice"), 4).alias("ln_price"),
        F.round(F.exp(F.col("p_size") / 25.0), 4).alias("exp_size"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.floor("p_retailprice").alias("floor_price"),
        F.ceil("p_retailprice").alias("ceil_price"),
        (F.col("p_size") % 7).alias("size_mod"),
    ).orderBy("p_partkey")


@query(
    "case_cast",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END                         AS price_band,
           CASE o_orderstatus WHEN 'F' THEN 'fulfilled'
                              WHEN 'O' THEN 'open'
                              ELSE 'other' END         AS status_name,
           CAST(floor(o_totalprice) AS BIGINT)         AS price_int,
           CAST(o_orderkey AS VARCHAR)                 AS key_str,
           (o_orderstatus = 'F') AND (o_totalprice > 200000) AS is_big_f
    FROM orders
    ORDER BY o_orderkey
    """,
)
def case_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE (ColumnExprCaseContext reference ClickHouseParser.py:15445) →
    when/otherwise chains (ClickHouse if/multiIf too); CAST + `::`
    (:15009/:15059) → .cast; boolean ops (:15037/:15396/:15500)."""
    o = tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", "fulfilled")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_name"),
        # floor, not cast: DuckDB's double→int cast rounds, Spark's truncates
        F.floor("o_totalprice").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)).alias(
            "is_big_f"
        ),
    ).orderBy("o_orderkey")


@query(
    "array_functions",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           len(words)                                   AS n_words,
           words[1]                                     AS first_word,
           words[len(words)]                            AS last_word,
           list_contains(words, 'spark')                AS has_spark,
           list_position(words, 'data')                 AS data_pos,
           array_to_string(list_sort(list_distinct(list_filter(words, w -> length(w) > 4))), ',')
                                                        AS long_words,
           CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT)
                                                        AS total_chars
    FROM t
    ORDER BY doc_id
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: literal/subscript (1-indexed, ColumnExprArrayAccess
    reference ClickHouseParser.py:15306 — Spark element_at is also
    1-indexed, no shim needed), has/indexOf/length, and higher-order
    lambdas arrayFilter/arrayMap/arraySum (columnLambdaExpr :16510) →
    Spark transform/filter/aggregate."""
    d = tables(spark, sf_dir)["documents"]
    words = F.split(F.col("text"), " ")
    t = d.select("doc_id", words.alias("words"))
    return t.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        F.element_at("words", 1).alias("first_word"),
        F.element_at("words", -1).alias("last_word"),
        F.array_contains("words", "spark").alias("has_spark"),
        F.array_position("words", "data").cast("long").alias("data_pos"),
        F.array_join(
            F.array_sort(
                F.array_distinct(F.filter("words", lambda w: F.length(w) > 4))
            ),
            ",",
        ).alias("long_words"),
        F.aggregate(
            F.transform("words", lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    ).orderBy("doc_id")


@query(
    "array_join_explode",
    oracle="""
    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE length(word) > 0
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 25
    """,
)
def array_join_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY JOIN (ArrayJoinClauseContext reference
    ClickHouseParser.py:9528) / arrayJoin function → explode: word-count
    over documents. Explode-then-aggregate shuffles only (word, partial
    count) thanks to map-side combine."""
    d = tables(spark, sf_dir)["documents"]
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(25)
    )


@query(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           json_extract_string(props, '$.missing')           AS missing_value
    FROM events
    ORDER BY event_id
    LIMIT 2000
    """,
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse JSONExtract*/visitParamExtract* (reference
    ClickHouseParser.py:15571) → get_json_object/from_json."""
    e = tables(spark, sf_dir)["events"]
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
            F.get_json_object("props", "$.missing").alias("missing_value"),
        )
        .orderBy("event_id")
        .limit(2000)
    )


@query(
    "regex_functions",
    oracle="""
    SELECT doc_id,
           regexp_matches(text, 'spark.*join')            AS mentions_spark_join,
           regexp_extract(text, '([a-z]+) join', 1)       AS join_kind,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_novowels
    FROM documents
    ORDER BY doc_id
    """,
)
def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse match/extract/replaceRegexpAll (reference
    ClickHouseParser.py:15571) → rlike/regexp_extract/regexp_replace."""
    d = tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id",
        F.col("text").rlike("spark.*join").alias("mentions_spark_join"),
        F.regexp_extract("text", "([a-z]+) join", 1).alias("join_kind"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("len_novowels"),
    ).orderBy("doc_id")


@query(
    "tuple_struct",
    oracle="""
    SELECT o_orderkey,
           to_json({'status': o_orderstatus, 'priority': o_orderpriority}) AS meta_json,
           o_orderstatus AS meta_status
    FROM orders
    ORDER BY o_orderkey
    LIMIT 1000
    """,
)
def tuple_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuple literal + access (ColumnExprTupleContext reference
    ClickHouseParser.py:15285, ColumnExprTupleAccessContext :15418) →
    struct() + getField; serialized via to_json so the value hash is
    representation-independent."""
    o = tables(spark, sf_dir)["orders"]
    meta = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    return (
        o.select(
            "o_orderkey",
            F.to_json(meta).alias("meta_json"),
            meta.getField("status").alias("meta_status"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@query(
    "with_fill_days",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', l_shipdate) AS ship_day,
               COUNT(*) AS n_ship,
               ROUND(AVG(l_extendedprice), 4) AS avg_price
        FROM lineitem
        WHERE l_suppkey = 1
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    ),
    axis AS (
        SELECT unnest(generate_series(TIMESTAMP '1997-01-01 00:00:00',
                                      TIMESTAMP '1997-12-31 00:00:00',
                                      INTERVAL 1 DAY)) AS ship_day
    )
    SELECT strftime(a.ship_day, '%Y-%m-%d') AS ship_day,
           CAST(COALESCE(d.n_ship, 0) AS BIGINT) AS n_ship,
           last_value(d.avg_price IGNORE NULLS)
               OVER (ORDER BY a.ship_day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_known_price
    FROM axis a LEFT JOIN daily d ON a.ship_day = d.ship_day
    ORDER BY ship_day
    """,
)
def with_fill_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... WITH FILL + INTERPOLATE (reference
    ClickHouseParser.py:11204/:10080) via operators.fill.with_fill:
    supplier 1's sparse 1997 shipping days densified to every day, counts
    filled with 0, price carried forward."""
    li = tables(spark, sf_dir)["lineitem"]
    daily = (
        li.filter(
            (F.col("l_suppkey") == 1)
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("day", "l_shipdate").alias("ship_day"))
        .agg(
            F.count(F.lit(1)).alias("n_ship"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )
    filled = with_fill(
        daily,
        order_col="ship_day",
        step=F.expr("INTERVAL 1 DAY"),
        from_=F.lit("1997-01-01").cast("timestamp"),
        to=F.lit("1997-12-31").cast("timestamp"),
        fill_zero=["n_ship"],
        interpolate_prev=["avg_price"],
    )
    return filled.select(
        F.date_format("ship_day", "yyyy-MM-dd").alias("ship_day"),
        F.col("n_ship").cast("long").alias("n_ship"),
        F.col("avg_price").alias("last_known_price"),
    ).orderBy("ship_day")


@query(
    "array_cumsum_difference",
    oracle="""
    WITH q AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w_cum AS BIGINT)
                   AS cum,
               CAST(COALESCE(CAST(l_quantity AS BIGINT)
                             - lag(CAST(l_quantity AS BIGINT)) OVER w_ord,
                             0) AS BIGINT) AS diff
        FROM lineitem WHERE l_orderkey < 1000
        WINDOW w_cum AS (PARTITION BY l_orderkey
                         ORDER BY l_linenumber, l_partkey, l_suppkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_ord AS (PARTITION BY l_orderkey
                         ORDER BY l_linenumber, l_partkey, l_suppkey)
    )
    SELECT l_orderkey,
           string_agg(CAST(cum AS VARCHAR), ','
                      ORDER BY l_linenumber, l_partkey, l_suppkey)
               AS cum_qty,
           string_agg(CAST(diff AS VARCHAR), ','
                      ORDER BY l_linenumber, l_partkey, l_suppkey)
               AS qty_diff
    FROM q GROUP BY l_orderkey ORDER BY l_orderkey
    """,
)
def array_cumsum_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayCumSum`` / ``arrayDifference`` (array-in,
    array-out higher-order functions; grammar ColumnExprFunction
    reference ClickHouseParser.py:15571). The Spark-first form computes
    the per-element values as WINDOW functions over the exploded rows —
    whole-stage-codegen, one sort per group — and only then packs the
    arrays, instead of per-array O(n²) lambda folds (HOFs are
    CodegenFallback: interpreted per element). l_quantity is integral →
    BIGINT arithmetic, hash-exact; arrays render as canonical comma
    strings (portable across engines' array hashing)."""
    from pyspark.sql import Window

    li = tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") < 1000)
    # l_linenumber alone is NOT unique per order in the synthetic data —
    # (linenumber, partkey, suppkey) is; an ambiguous window order would
    # let the two engines pick different-but-valid lag sequences.
    order_cols = ["l_linenumber", "l_partkey", "l_suppkey"]
    w_cum = (
        Window.partitionBy("l_orderkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_lag = Window.partitionBy("l_orderkey").orderBy(*order_cols)
    qty = F.col("l_quantity").cast("long")
    q = li.select(
        "l_orderkey",
        *order_cols,
        F.sum(qty).over(w_cum).alias("cum"),
        F.coalesce(qty - F.lag(qty).over(w_lag), F.lit(0)).alias("diff"),
    )

    def packed(col: str):
        return F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(*order_cols, col))
                ),
                lambda st: st[col].cast("string"),
            ),
            ",",
        )

    return (
        q.groupBy("l_orderkey")
        .agg(
            packed("cum").alias("cum_qty"),
            packed("diff").alias("qty_diff"),
        )
        .orderBy("l_orderkey")
    )


@query(
    "with_fill_numeric",
    oracle="""
    WITH sizes AS (
        SELECT p_size, COUNT(*) AS n_parts
        FROM part WHERE p_retailprice > 1800 GROUP BY p_size
    ),
    axis AS (SELECT unnest(generate_series(1, 50, 1)) AS p_size)
    SELECT CAST(a.p_size AS INT) AS p_size,
           CAST(COALESCE(s.n_parts, 0) AS BIGINT) AS n_parts
    FROM axis a LEFT JOIN sizes s ON a.p_size = s.p_size
    ORDER BY p_size
    """,
)
def with_fill_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric ORDER BY ... WITH FILL FROM 1 TO 51 STEP 1 (the integer-
    axis variant of with_fill_days; OrderExprContext WITH FILL accessors
    reference ClickHouseParser.py:11204). The sparse per-size histogram
    of expensive parts densifies onto the full 1..50 size axis with
    zero-filled gaps — same operators.fill.with_fill machinery, numeric
    step instead of an INTERVAL."""
    from ..operators.fill import with_fill

    p = tables(spark, sf_dir)["part"]
    sizes = (
        p.filter(F.col("p_retailprice") > 1800)
        .groupBy("p_size")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    filled = with_fill(
        sizes,
        "p_size",
        step=F.lit(1),
        from_=F.lit(1),
        to=F.lit(50),
        fill_zero=["n_parts"],
    )
    return filled.select(
        F.col("p_size").cast("int").alias("p_size"),
        F.col("n_parts").cast("long").alias("n_parts"),
    ).orderBy("p_size")
