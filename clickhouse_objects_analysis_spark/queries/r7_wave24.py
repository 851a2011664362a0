"""Round-7 session-24 query: the customer revenue Lorenz curve.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has no revenue analytics; this is the concentration curve
(whale analysis) behind every "top X% of customers drive Y% of
revenue" statement — the per-entity counterpart of
gini_source_concentration, built on the distributed ntile so no group
ever sorts in one task."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dist_rank import dist_ntile
from .registry import query, tables


@query(
    "lorenz_curve_customers",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey),
    ranked AS (
        SELECT cents,
               ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
        FROM rev),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM ranked),
    d AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
                 CAST(SUM(cents) AS BIGINT) AS cents
          FROM ranked GROUP BY decile)
    SELECT CAST(d.decile AS BIGINT) AS decile, d.n_customers, d.cents,
           FLOOR(CAST(d.cents AS DOUBLE) / t.total * 1000000 + 0.5)
               / 1000000 AS revenue_share,
           FLOOR(CAST(SUM(d.cents) OVER (ORDER BY d.decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / t.total * 1000000 + 0.5) / 1000000
               AS cum_share
    FROM d CROSS JOIN tot t ORDER BY decile
    """,
)
def lorenz_curve_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue: customers ranked into exact
    revenue deciles (SQL ntile tie-split semantics), each decile's
    revenue share and the cumulative share — the whale-concentration
    readout (decile 10's share ≈ "top 10% drive X%"), per-entity
    sibling of gini_source_concentration.

    Scale shape: the ranking is operators/dist_rank.dist_ntile — exact
    global ntile positions from the partition-histogram cumulative
    count, NO single-task sort anywhere (the row_number trap this
    session's sf10 sweep caught in trimmed_mean_value is exactly what
    this avoids). Revenue is integer cents end-to-end; shares are one
    floor-quantized integer ratio each; the cumulative share sums ≤10
    exact integers before its single division."""
    o = tables(spark, sf_dir)["orders"]
    rev = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).cast("long").alias("cents")
    )
    ranked = dist_ntile(
        rev, 10, ["cents", "o_custkey"], out_col="decile"
    )
    d = ranked.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
    )
    tot = d.agg(F.sum("cents").cast("long").alias("total"))
    from pyspark.sql import Window

    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    share = F.col("cents").cast("double") / F.col("total")
    cum = F.sum("cents").over(wcum).cast("double") / F.col("total")
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_customers",
            "cents",
            (F.floor(share * 1000000 + F.lit(0.5)) / 1000000).alias(
                "revenue_share"
            ),
            (F.floor(cum * 1000000 + F.lit(0.5)) / 1000000).alias(
                "cum_share"
            ),
        )
        .orderBy("decile")
    )
