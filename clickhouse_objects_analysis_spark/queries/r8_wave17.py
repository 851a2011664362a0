"""Round-8 query wave 17: behavioral texture metrics — inter-arrival
burstiness per event type (is traffic Poisson-like or bursty?) and a
Simpson's-paradox audit (does the pooled value/trend reverse inside
every segment?). Both are exact closed forms over integer-derived
moments.

Reference parity note: no behavioral-statistics surface in the
reference; extends the analytics charter (SURVEY §7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables


@query(
    "interarrival_burstiness",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               date_diff('second', lag(ts) OVER w, ts) AS gap
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    g AS (SELECT event_type, CAST(gap AS BIGINT) AS gap
          FROM seq WHERE gap IS NOT NULL),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(gap) AS DOUBLE) AS sg,
               CAST(SUM(gap * gap) AS DOUBLE) AS sgg
        FROM g GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(floor(sg / n * 10000 + 0.5) AS BIGINT) AS mean_gap_u,
           CAST(floor(sqrt((sgg - sg * sg / n) / n) * 10000 + 0.5)
                AS BIGINT) AS sd_gap_u,
           CAST(floor((sqrt((sgg - sg * sg / n) / n) - sg / n)
                      / (sqrt((sgg - sg * sg / n) / n) + sg / n)
                      * 1000000 + 0.5) AS BIGINT) AS burstiness_u
    FROM s ORDER BY event_type
    """,
)
def interarrival_burstiness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of inter-arrival gaps
    per event type: B ≈ 0 for Poisson traffic, → 1 for bursty, < 0 for
    pacemaker-regular — the one-number check before any queueing or
    rate-limit model. Gaps come from one (type, ts) window pass;
    moments are exact integer-second sums; σ is the population SD.
    100 TB: one shuffle by event_type, everything else map-side."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "event_type",
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
            ).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    s = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("gap").cast("double").alias("sg"),
        F.sum(F.col("gap") * F.col("gap")).cast("double").alias("sgg"),
    )
    mu = F.col("sg") / F.col("n")
    sd = F.sqrt((F.col("sgg") - F.col("sg") * F.col("sg") / F.col("n")) / F.col("n"))
    return s.select(
        "event_type", "n",
        F.floor(mu * 10000 + 0.5).cast("long").alias("mean_gap_u"),
        F.floor(sd * 10000 + 0.5).cast("long").alias("sd_gap_u"),
        F.floor((sd - mu) / (sd + mu) * 1000000 + 0.5)
        .cast("long")
        .alias("burstiness_u"),
    ).orderBy("event_type")


@query(
    "simpsons_paradox_audit",
    oracle="""
    WITH base AS (
        SELECT l_returnflag AS seg,
               CAST(l_quantity AS DOUBLE) AS x,
               CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS y
        FROM lineitem
    ),
    seg_s AS (
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx
        FROM base GROUP BY seg
    ),
    pool AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               SUM(sx) AS sx, SUM(sy) AS sy, SUM(sxy) AS sxy,
               SUM(sxx) AS sxx
        FROM seg_s
    ),
    slopes AS (
        SELECT seg, n,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx)
                FROM pool) AS pooled_slope
        FROM seg_s
    )
    SELECT seg, n,
           CAST(floor(slope * 10000 + 0.5) AS BIGINT) AS slope_u,
           CAST(floor(pooled_slope * 10000 + 0.5) AS BIGINT)
               AS pooled_slope_u,
           CASE WHEN slope * pooled_slope < 0 THEN 1 ELSE 0 END
               AS sign_flip
    FROM slopes ORDER BY seg
    """,
)
def simpsons_paradox_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit on revenue-vs-quantity: the OLS slope
    within each return-flag segment against the pooled slope, flagging
    sign reversals (the aggregation artifact that makes pooled KPIs
    lie). Segment moments aggregate once and ROLL UP to the pooled
    moments — the pooled pass is free, not a second scan. Slopes are
    the exact moment formula, scaled-floor rendered.

    Caveat baked into the twin: segment sums fold in Spark's partition
    order, so the moments use DOUBLE sums of integer-cent-scale values
    that stay exactly representable — the same discipline as the
    covariance/regression family."""
    li = tables(spark, sf_dir)["lineitem"]
    base = li.select(
        F.col("l_returnflag").alias("seg"),
        F.col("l_quantity").cast("double").alias("x"),
        (
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).cast("double").alias("y"),
    )
    seg_s = base.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    pool = seg_s.agg(
        F.sum("n").cast("long").alias("pn"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxy").alias("psxy"),
        F.sum("sxx").alias("psxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    pooled = (F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")) / (
        F.col("pn") * F.col("psxx") - F.col("psx") * F.col("psx")
    )
    return (
        seg_s.crossJoin(F.broadcast(pool))
        .select(
            "seg", "n",
            F.floor(slope * 10000 + 0.5).cast("long").alias("slope_u"),
            F.floor(pooled * 10000 + 0.5)
            .cast("long")
            .alias("pooled_slope_u"),
            F.when(slope * pooled < 0, 1).otherwise(0).alias("sign_flip"),
        )
        .orderBy("seg")
    )
