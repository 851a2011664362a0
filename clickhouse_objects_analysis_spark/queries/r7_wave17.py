"""Round-7 session-17 queries: Spark-4 SQL scalar UDFs and the VARIANT
semi-structured type.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has neither; SQL UDFs are the ClickHouse `CREATE FUNCTION
... AS (x) -> expr` analogue (lambda UDFs in DDL — reference grammar's
CreateFunctionStmt), and VARIANT is Spark 4's typed semi-structured
column, the engine-native successor to get_json_object string probing
(ClickHouse analogue: the JSON Object type / JSONExtract family)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables


@query(
    "sql_udf_surface",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big,
           CAST(SUM((CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 9)
                    // 10) AS BIGINT) AS discounted_cents
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sql_udf_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (Spark 4 `CREATE TEMPORARY FUNCTION ... RETURN
    expr`) — the ClickHouse `CREATE FUNCTION f AS (x) -> expr` lambda
    DDL, which the reference's grammar parses as CreateFunctionStmt.
    Two UDFs (a predicate and an integer-cents discount) are created
    in DDL and used inside an aggregate; Catalyst INLINES the function
    body into the plan — the explain shows the expression, not a call,
    so whole-stage codegen and pushdown are unaffected (the reason SQL
    UDFs are the 100 TB-safe UDF tier, unlike Python row UDFs). The
    oracle states the inlined expressions directly; integer cents ×9
    DIV 10 keeps the discount exact."""
    tables(spark, sf_dir)  # register views
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_big(p DOUBLE) "
        "RETURNS BOOLEAN RETURN p > 150000"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION discount_cents(p DOUBLE) "
        "RETURNS BIGINT RETURN CAST(FLOOR(p * 100 + 0.5) AS BIGINT) * 9 "
        "DIV 10"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN is_big(o_totalprice) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_big,
               CAST(SUM(discount_cents(o_totalprice)) AS BIGINT)
                   AS discounted_cents
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@query(
    "variant_json_surface",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(props::JSON ->> '$.k' AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(MAX(CAST(props::JSON ->> '$.k' AS BIGINT)) AS BIGINT)
               AS max_k,
           CAST(SUM(CASE WHEN CAST(props::JSON ->> '$.k' AS BIGINT) IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def variant_json_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4's typed semi-structured column — the
    engine-native JSON path, ClickHouse's JSON/Object type analogue):
    `parse_json` converts the props string ONCE into a binary variant,
    then `variant_get` extracts typed paths without re-parsing per
    expression — at 100 TB, parse-once-extract-many is the difference
    between one JSON tokenizer pass and one per get_json_object call.
    The oracle uses DuckDB's native JSON extraction over the same
    strings; counts/sums are exact integers."""
    ev = tables(spark, sf_dir)["events"]
    v = ev.select(
        "event_type", F.parse_json("props").alias("pv")
    ).select(
        "event_type",
        F.expr("variant_get(pv, '$.k', 'bigint')").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
            F.sum(F.col("k").isNull().cast("long")).cast("long").alias(
                "n_missing"
            ),
        )
        .orderBy("event_type")
    )
