"""Round-7 session-26 queries: RFM segmentation and the
new-vs-returning daily split.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has neither; RFM is the classic customer-value
segmentation (recency/frequency/monetary quintiles), and
new-vs-returning is the product-analytics daily acquisition split —
both built on first-class distributed primitives (dist_ntile; a
min-over-group broadcast) rather than single-task windows."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dist_rank import dist_ntile
from .registry import query, tables


@query(
    "rfm_segmentation",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(MAX(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)))
                    AS BIGINT) AS last_d,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS monet
        FROM events GROUP BY user_id),
    q AS (SELECT user_id,
                 ntile(5) OVER (ORDER BY last_d, user_id) AS r_q,
                 ntile(5) OVER (ORDER BY freq, user_id) AS f_q,
                 ntile(5) OVER (ORDER BY monet, user_id) AS m_q
          FROM per_user)
    SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM q GROUP BY r_q, f_q, m_q ORDER BY r_q, f_q, m_q
    """,
)
def rfm_segmentation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every user scored into exact quintiles of
    Recency (last active day), Frequency (event count), and Monetary
    (integer-micro value sum), then counted per (R,F,M) cell — the
    classic customer-value grid behind retention/win-back targeting.

    Scale shape: the three quintile assignments run through
    operators/dist_rank.dist_ntile (exact SQL ntile positions from
    partition-histogram cumulative counts), so there is NO single-task
    global sort per measure — the trap a plain
    ntile() OVER (ORDER BY …) would plant three times over. All three
    measures are exact integers; the per-user table is one groupBy of
    the raw events."""
    ev = tables(spark, sf_dir)["events"]
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
        ).cast("long").alias("last_d"),
        F.count("*").cast("long").alias("freq"),
        F.sum(
            F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
        ).cast("long").alias("monet"),
    ).localCheckpoint(eager=False)  # three ntile passes read it
    r = dist_ntile(per_user, 5, ["last_d", "user_id"], out_col="r_q").select(
        "user_id", "r_q"
    )
    f = dist_ntile(per_user, 5, ["freq", "user_id"], out_col="f_q").select(
        "user_id", "f_q"
    )
    m = dist_ntile(per_user, 5, ["monet", "user_id"], out_col="m_q").select(
        "user_id", "m_q"
    )
    return (
        r.join(f, "user_id")
        .join(m, "user_id")
        .groupBy(
            F.col("r_q").cast("long").alias("r_q"),
            F.col("f_q").cast("long").alias("f_q"),
            F.col("m_q").cast("long").alias("m_q"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("r_q", "f_q", "m_q")
    )


@query(
    "new_vs_returning_daily",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(MIN(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)))
                    AS BIGINT) AS first_d
        FROM events GROUP BY user_id),
    daily AS (
        SELECT DISTINCT
               CAST(datediff('day', DATE '2024-01-01', CAST(e.ts AS DATE))
                    AS BIGINT) AS d,
               e.user_id, f.first_d
        FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT d,
           CAST(SUM(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
           CAST(SUM(CASE WHEN d > first_d THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_users
    FROM daily GROUP BY d ORDER BY d
    """,
)
def new_vs_returning_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New vs returning daily actives: a user is NEW on their
    first-ever active day and RETURNING on every later active day —
    the acquisition/retention split every product dashboard leads
    with. First-seen days are one min-aggregate broadcast back onto
    the distinct (day, user) presence table; both counts are exact
    integers from one groupBy. Raw event volume collapses at the two
    distinct/aggregate steps; nothing windows."""
    ev = tables(spark, sf_dir)["events"]
    d_col = F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
    firsts = ev.groupBy("user_id").agg(
        F.min(d_col).cast("long").alias("first_d")
    )
    daily = (
        ev.select(d_col.cast("long").alias("d"), "user_id")
        .distinct()
        .join(F.broadcast(firsts), "user_id")
    )
    return (
        daily.groupBy("d")
        .agg(
            F.sum((F.col("d") == F.col("first_d")).cast("long"))
            .cast("long")
            .alias("new_users"),
            F.sum((F.col("d") > F.col("first_d")).cast("long"))
            .cast("long")
            .alias("returning_users"),
        )
        .orderBy("d")
    )
