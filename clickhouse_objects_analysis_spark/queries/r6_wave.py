"""Round-6 query wave: corrMatrix, anyHeavy (exact-mode twin),
groupArrayLast, JSON-payload stats, and the round-6 translation-table
names exercised end-to-end (functions/ch.py additions: countMatches,
countSubstrings, left/right, toStartOfWeek/toMonday, toDayOfYear,
toStartOfFifteenMinutes, addHours, toInt64OrNull, JSONExtractInt/JSONHas
— grammar anchor ClickHouseParser.py:15571 treats every function as a
generic call).

All oracled: the DuckDB twin computes the same values, with doubles
rounded to 6 places per the registry convention.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.ch import ch_expr
from .registry import query, tables


@query(
    "ch_r6_function_surface",
    oracle="""
    SELECT event_id::BIGINT AS eid,
           len(regexp_extract_all(props, '[0-9]+'))::BIGINT AS cm,
           ((length(props) - length(replace(props, 'a', '')))
              / 1)::BIGINT AS cs,
           left(props, 5)  AS l5,
           right(props, 4) AS r4,
           strftime(ts::DATE - INTERVAL 1 DAY * CAST(dayofweek(ts) AS INT),
                    '%Y-%m-%d') AS sow,
           strftime(date_trunc('week', ts), '%Y-%m-%d') AS mon,
           dayofyear(ts)::BIGINT AS doy,
           time_bucket(INTERVAL '15 minutes', ts)::TIMESTAMP AS s15,
           (ts + INTERVAL 1 HOUR * CAST(event_id % 24 AS INT)) AS ah,
           (user_id & 255)::BIGINT AS ba,
           xor(event_id, user_id)::BIGINT AS bx,
           TRY_CAST(right(props, 2) AS BIGINT) AS maybe_int
    FROM events
    WHERE event_id % 20 = 0
    ORDER BY eid
    """,
)
def ch_r6_function_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 translation-table names end-to-end against DuckDB
    arithmetic twins (regex counts, literal-substring counts via length
    arithmetic, left/right, Sunday/Monday week starts, day-of-year,
    15-minute floor vs time_bucket, addHours, bit ops, try-cast)."""
    c = F.col("props")
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 20 == 0)
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        ch_expr("countMatches", c, F.lit("[0-9]+")).alias("cm"),
        ch_expr("countSubstrings", c, F.lit("a")).alias("cs"),
        ch_expr("left", c, F.lit(5)).alias("l5"),
        ch_expr("right", c, F.lit(4)).alias("r4"),
        F.date_format(ch_expr("toStartOfWeek", F.col("ts")), "yyyy-MM-dd")
        .alias("sow"),
        F.date_format(ch_expr("toMonday", F.col("ts")), "yyyy-MM-dd")
        .alias("mon"),
        ch_expr("toDayOfYear", F.col("ts")).cast("long").alias("doy"),
        ch_expr("toStartOfFifteenMinutes", F.col("ts")).alias("s15"),
        ch_expr(
            "addHours", F.col("ts"), (F.col("event_id") % 24).cast("int")
        ).alias("ah"),
        ch_expr("bitAnd", F.col("user_id"), F.lit(255))
        .cast("long")
        .alias("ba"),
        ch_expr("bitXor", F.col("event_id"), F.col("user_id"))
        .cast("long")
        .alias("bx"),
        ch_expr("toInt64OrNull", ch_expr("right", c, F.lit(2))).alias(
            "maybe_int"
        ),
    ).orderBy("eid")


@query(
    "corr_matrix",
    oracle="""
    SELECT l_returnflag AS flag,
           round(corr(l_quantity, l_extendedprice), 6) AS c_qty_price,
           round(corr(l_quantity, l_discount), 6)      AS c_qty_disc,
           round(corr(l_extendedprice, l_discount), 6) AS c_price_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY flag
    """,
)
def corr_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse corrMatrix: all pairwise Pearson correlations of a
    column set in ONE aggregation pass (each pair is an independent
    map-side-combinable moment sketch — no shuffle beyond the group
    keys, identical at any scale)."""
    li = tables(spark, sf_dir)["lineitem"]
    pairs = [
        ("c_qty_price", "l_quantity", "l_extendedprice"),
        ("c_qty_disc", "l_quantity", "l_discount"),
        ("c_price_disc", "l_extendedprice", "l_discount"),
    ]
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            *[
                F.round(F.corr(a, b), 6).cast("double").alias(out)
                for out, a, b in pairs
            ]
        )
        .orderBy("flag")
    )


@query(
    "any_heavy_mode",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS heavy, n
    FROM (
        SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n,
               row_number() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY count(*) DESC, o_orderpriority
               ) AS rn
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    ORDER BY status
    """,
)
def any_heavy_mode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse anyHeavy as its deterministic exact twin: the modal
    value per group (count + row_number, ties broken by value). anyHeavy
    itself is a probabilistic heavy-hitter; the exact mode is the
    engine-stable contract the oracle can check — and the two-level
    aggregate (partial counts map-side, tiny |groups|x|values| table
    into one window) is the scalable plan."""
    o = tables(spark, sf_dir)["orders"]
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("heavy"),
            "n",
        )
        .orderBy("status")
    )


@query(
    "group_array_last_n",
    oracle="""
    SELECT user_id,
           array_to_string(
             (array_agg(event_type ORDER BY ts, event_id))[-3:], ','
           ) AS last3,
           count(*)::BIGINT AS n_events
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 3
    ORDER BY user_id
    """,
)
def group_array_last_n_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse groupArrayLast(3): the last N values in event order.
    collect_list of (ts, event_id, payload) structs + array_sort + a
    negative-offset slice — the sort happens per GROUP inside the
    aggregated array (bounded by per-user event counts), never as a
    global window. Rendered via array_join so the output column is a
    plain string (driver/oracle canonicalizers row-sort the frame and
    cannot hash raw array cells)."""
    e = tables(spark, sf_dir)["events"]
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.slice(arr, -3, 3), lambda s: s["event_type"]
                ),
                ",",
            ).alias("last3"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .filter(F.col("n_events") >= 3)
        .orderBy("user_id")
    )


@query(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n,
           count(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
                 AS BIGINT))::BIGINT AS n_has_k,
           min(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
                 AS BIGINT))::BIGINT AS min_k,
           max(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
                 AS BIGINT))::BIGINT AS max_k,
           round(avg(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
                 AS BIGINT)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_props_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload stats: JSONExtractInt / JSONHas (via the
    translation table) over the events.props JSON column, aggregated per
    event type. get_json_object stays JVM-side (Jackson path evaluation
    inside codegen) — the scan prunes to (event_type, props) and the agg
    is map-side-combinable; the oracle re-derives the values with regex
    extraction, deliberately NOT mirroring the implementation."""
    e = tables(spark, sf_dir)["events"]
    k = ch_expr("JSONExtractInt", F.col("props"), "k")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(ch_expr("JSONHas", F.col("props"), "k"), 1))
            .cast("long")
            .alias("n_has_k"),
            F.min(k).cast("long").alias("min_k"),
            F.max(k).cast("long").alias("max_k"),
            F.round(F.avg(k), 6).cast("double").alias("avg_k"),
        )
        .orderBy("event_type")
    )
