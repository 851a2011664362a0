"""Round-8 query wave 13: join-skew audit — the pre-flight check a
100 TB join runs before committing to a shuffle strategy: per-key
frequency profile of the join column, the hottest keys' share of the
table, and the salt factor that would level each hot key to mean-sized
buckets (the number operators/skew.py's salted join takes as input).

Reference parity note: no planning surface in the reference; extends
the scale-engineering charter (SURVEY §7) alongside compaction_planning
and parts_storage_stats.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables


@query(
    "join_skew_audit",
    oracle="""
    WITH k AS (
        SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(MAX(cnt) AS BIGINT) AS max_cnt
        FROM k
    )
    SELECT k.key, k.cnt,
           CAST(floor(CAST(k.cnt AS DOUBLE) / tot.total * 1000000 + 0.5)
                AS BIGINT) AS share_u,
           CAST(ceil(CAST(k.cnt AS DOUBLE) * tot.n_keys / tot.total)
                AS BIGINT) AS salt_factor,
           tot.n_keys, tot.total, tot.max_cnt
    FROM k CROSS JOIN tot
    ORDER BY k.cnt DESC, k.key LIMIT 10
    """,
)
def join_skew_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-frequency profile of lineitem.l_suppkey (the canonical
    many-to-one join column): the ten hottest keys with their table
    share and the salt factor that levels each to mean-sized buckets —
    ceil(cnt · n_keys / total), i.e. how many average keys' worth of
    rows the hot key carries. One groupBy plus a 1-row broadcast of the
    totals; at 100 TB this is the same single shuffle the real join
    would pay anyway, run once to DECIDE whether to salt."""
    li = tables(spark, sf_dir)["lineitem"]
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = k.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "key", "cnt",
            F.floor(
                F.col("cnt").cast("double") / F.col("total") * 1000000 + 0.5
            )
            .cast("long")
            .alias("share_u"),
            F.ceil(
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("total")
            )
            .cast("long")
            .alias("salt_factor"),
            "n_keys", "total", "max_cnt",
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(10)
    )
