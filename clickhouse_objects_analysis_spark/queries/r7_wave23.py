"""Round-7 session-23 queries: run-length event streaks and a
seasonal-naive forecast backtest.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has neither; streaks are the run-length-encoding sequence
op (engagement/monotony detection), and the backtest closes the
forecasting loop opened by holt_winters_weekday — a forecaster is only
trustworthy against a measured baseline error."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables


@query(
    "longest_event_streak",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
               - row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS grp
        FROM events),
    streaks AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS len
        FROM seq GROUP BY user_id, event_type, grp),
    best AS (
        SELECT event_type, len, user_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY len DESC, user_id) AS rk
        FROM streaks)
    SELECT event_type,
           CAST(len AS BIGINT) AS max_streak,
           CAST(user_id AS BIGINT) AS user_id
    FROM best WHERE rk = 1 ORDER BY event_type
    """,
)
def longest_event_streak_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest same-type event streak per type (and who holds it) —
    run-length encoding via the two-row_number island trick: the
    difference of a global and a per-type sequence number is constant
    exactly within a consecutive run. Engagement/monotony detection
    (a 50-click streak is a bot signature; repetition_ngram_filter's
    event-stream sibling). Two window passes over the same
    (user, time) sort order — Catalyst reuses the sort — then one
    groupBy on bounded streak keys."""
    ev = tables(spark, sf_dir)["events"]
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "grp"
        ),
    )
    streaks = seq.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").cast("long").alias("len")
    )
    best = Window.partitionBy("event_type").orderBy(
        F.desc("len"), "user_id"
    )
    return (
        streaks.withColumn("rk", F.row_number().over(best))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("len").alias("max_streak"),
            F.col("user_id").cast("long").alias("user_id"),
        )
        .orderBy("event_type")
    )


@query(
    "seasonal_naive_backtest",
    oracle="""
    WITH base AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
    j AS (
        SELECT cur.event_type, cur.d, cur.c AS actual, prev.c AS forecast
        FROM base cur JOIN base prev
          ON prev.event_type = cur.event_type AND prev.d = cur.d - 7)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ABS(actual - forecast)) AS BIGINT) AS total_abs_err,
           FLOOR(CAST(SUM(ABS(actual - forecast)) AS DOUBLE) / COUNT(*)
                 * 10000 + 0.5) / 10000 AS mae,
           FLOOR(CAST(SUM((ABS(actual - forecast) * 1000000000)
                          // actual) AS DOUBLE)
                 / COUNT(*) / 1000000000.0 * 10000 + 0.5) / 10000 AS mape
    FROM j GROUP BY event_type ORDER BY event_type
    """,
)
def seasonal_naive_backtest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: forecast each day's count with the
    value 7 days earlier and measure MAE / MAPE per series — the
    baseline every real forecaster (holt_winters_weekday) must beat
    before it earns its complexity; skipping this step is how teams
    ship models worse than `same day last week`. The lag join is a
    self-equi-join on (series, d−7) over the tiny daily table. Float
    parity: MAE's numerator is an exact integer; MAPE quantizes each
    per-day ratio to an exact integer nano (|e|·1e9 DIV actual) BEFORE
    the sum, so the aggregate is order-free — a double sum of the raw
    ratios would have been the one accumulation-order exposure in the
    query."""
    ev = tables(spark, sf_dir)["events"]
    base = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
    ).agg(F.count("*").cast("long").alias("c"))
    cur = base.select("event_type", "d", F.col("c").alias("actual"))
    prev = base.select(
        "event_type", (F.col("d") + 7).alias("d"), F.col("c").alias("forecast")
    )
    j = cur.join(prev, ["event_type", "d"])
    abs_err = F.abs(F.col("actual") - F.col("forecast"))
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum(abs_err).cast("long").alias("total_abs_err"),
            (
                F.floor(
                    F.sum(abs_err).cast("double") / F.count("*") * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("mae"),
            (
                F.floor(
                    F.sum(
                        F.expr(
                            "abs(actual - forecast) * 1000000000 div actual"
                        )
                    ).cast("double")
                    / F.count("*")
                    / F.lit(1000000000.0)
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("mape"),
        )
        .orderBy("event_type")
    )
