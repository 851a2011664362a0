"""Streaming query entries (SURVEY §2 streaming surface). Each runs a real
Structured Streaming query (availableNow replay of events.parquet) and
returns the materialized result, which the batch oracles reproduce — so
even the streaming slice is value-checked, not just rows-counted."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..streaming.pipeline import (
    materialized_view_sink,
    upsert_latest_sink,
    watch_heartbeats,
    session_counts,
    sliding_counts,
    stateful_user_peaks,
    stream_static_enrichment,
    stream_stream_click_purchase,
    stream_stream_left_outer,
    tumbling_counts,
)
from .registry import query, tables


@query(
    "streaming_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)) AS win_start,
           time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP))
               + INTERVAL 5 MINUTE AS win_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY win_start, event_type
    """,
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE-VIEW analogue (watchStmt reference ClickHouseParser.py:14249):
    readStream → watermark → 5-min tumbling count/sum → complete-mode
    memory sink. Oracle = the equivalent batch windowing."""
    tables(spark, sf_dir)
    res = tumbling_counts(spark, sf_dir)
    return res.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("win_start", "event_type")


@query(
    "streaming_sliding_window",
    oracle="""
    WITH e AS (
        SELECT unnest([time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)),
                       time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP))
                           - INTERVAL 5 MINUTE]) AS win_start
        FROM events
    )
    SELECT win_start, win_start + INTERVAL 10 MINUTE AS win_end,
           COUNT(*) AS n_events
    FROM e
    GROUP BY 1, 2
    ORDER BY win_start
    """,
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: width 10 min, slide 5 min — every event
    belongs to exactly two windows."""
    tables(spark, sf_dir)
    res = sliding_counts(spark, sf_dir)
    return res.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "n_events",
    ).orderBy("win_start")


@query(
    "streaming_session_window",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 10 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-min inactivity gap) via F.session_window —
    custom stateful windowing the reference grammar has no syntax for;
    oracle = the batch gaps-and-islands rewrite."""
    tables(spark, sf_dir)
    res = session_counts(spark, sf_dir)
    return res.select(
        "user_id",
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        "n_events",
    ).orderBy("user_id", "session_start")


@query(
    "streaming_stateful_state",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(MAX(value), 2) AS peak_value,
           MAX(CAST(ts AS TIMESTAMP)) AS last_ts
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def streaming_stateful_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, peak value, last ts) maintained in the streaming state
    store across microbatches. The batch oracle is the same aggregate —
    if state merged or carried wrong across batches, the values diverge."""
    tables(spark, sf_dir)
    res = stateful_user_peaks(spark, sf_dir)
    return res.select(
        "user_id", "n_events", "peak_value", F.col("last_ts")
    ).orderBy("user_id")


@query(
    "streaming_mv_to_dest",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           ROUND(value * 100, 2) AS cents
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def streaming_mv_to_dest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZED VIEW ... TO dest (destinationClause reference
    ClickHouseParser.py:5572): append-mode parquet sink; result read back
    from the destination table — checking the full MV round trip."""
    tables(spark, sf_dir)
    return materialized_view_sink(spark, sf_dir).orderBy("event_id")


@query(
    "hypertable_rollup",
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS b, event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(38,6))) AS sv
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT date_trunc('day', b) AS b, event_type,
             SUM(n) AS n, SUM(sv) AS sv
      FROM h GROUP BY 1, 2
    ),
    m AS (
      SELECT date_trunc('month', b) AS b, event_type,
             SUM(n) AS n, SUM(sv) AS sv
      FROM d GROUP BY 1, 2
    )
    SELECT * FROM (
      SELECT 'hour'  AS level, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, CAST(n AS BIGINT) AS n,
             CAST(ROUND(sv, 2) AS DOUBLE) AS total FROM h
      UNION ALL
      SELECT 'day', strftime(b, '%Y-%m-%d %H:%M:%S'), event_type,
             CAST(n AS BIGINT), CAST(ROUND(sv, 2) AS DOUBLE) FROM d
      UNION ALL
      SELECT 'month', strftime(b, '%Y-%m-%d %H:%M:%S'), event_type,
             CAST(n AS BIGINT), CAST(ROUND(sv, 2) AS DOUBLE) FROM m
    )
    ORDER BY level, bucket, event_type
    """,
)
def hypertable_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup (TimescaleDB continuous
    aggregates; the AggregatingMergeTree -State/-Merge shape from the
    engine clause surface, EngineExprContext ClickHouseParser.py:6180):
    hourly partial aggregates are computed ONCE from raw events; daily
    re-aggregates the hourly partials and monthly the daily — each level
    reads its parent, never the raw table. At 100 TB the hourly table is
    ~events/3600 rows and everything above it is metadata-sized; the raw
    scan happens exactly once, which is the entire point of the pattern.
    Counts and sums are mergeable partials; avg = sv/n at read time.

    Per-row value is cast to DECIMAL(38,6) before the hourly sum so every
    level accumulates identical exact quantities in both engines — a double
    sum rounds differently at half-cent boundaries depending on partial-agg
    order (this was round 2's only driver hash mismatch)."""
    e = tables(spark, sf_dir)["events"]
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("b"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("sv"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "b").alias("b"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    monthly = daily.groupBy(
        F.date_trunc("month", "b").alias("b"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))

    def lvl(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("level"),
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n",
            F.round("sv", 2).cast("double").alias("total"),
        )

    return (
        lvl(hourly, "hour")
        .unionByName(lvl(daily, "day"))
        .unionByName(lvl(monthly, "month"))
        .orderBy("level", "bucket", "event_type")
    )


@query(
    "streaming_stream_static_join",
    oracle="""
    SELECT time_bucket(INTERVAL 1 DAY, CAST(e.ts AS TIMESTAMP)) AS win_start,
           c.c_mktsegment,
           COUNT(*) AS n_purchases,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(38,6))), 2) AS DOUBLE)
               AS total_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    WHERE e.event_type = 'purchase'
    GROUP BY 1, 2
    ORDER BY win_start, c_mktsegment
    """,
)
def streaming_stream_static_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (the JOIN-inside-a-materialized-view shape;
    createStmt subquery clause reference ClickHouseParser.py:5617): the
    purchase stream enriched against the broadcast customer dimension,
    then a 1-day tumbling rollup per market segment. The dimension is
    re-read per micro-batch — slowly-changing dims are picked up without
    restarting the stream. Decimal accumulation keeps the replayed
    stream's partial-agg order irrelevant to the hash gate."""
    tables(spark, sf_dir)
    res = stream_static_enrichment(spark, sf_dir)
    return res.select(
        F.col("win.start").alias("win_start"),
        "c_mktsegment",
        "n_purchases",
        F.round("__sv", 2).cast("double").alias("total_value"),
    ).orderBy("win_start", "c_mktsegment")


@query(
    "streaming_stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           epoch_us(CAST(p.ts AS TIMESTAMP))
               - epoch_us(CAST(c.ts AS TIMESTAMP)) AS gap_us
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY click_id, purchase_id
    """,
)
def streaming_stream_stream_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (clicks × next-hour purchases per
    user), watermarked on both sides so join state is evictable — the
    hardest streaming primitive in SURVEY §2's streaming superset. The
    batch oracle replays the identical interval join; integer-microsecond
    gaps keep the hash gate exact."""
    tables(spark, sf_dir)
    res = stream_stream_click_purchase(spark, sf_dir)
    return res.orderBy("click_id", "purchase_id")


@query(
    "watch_events_heartbeat",
    oracle="""
    WITH b AS (
        SELECT CAST(event_id % 4 AS BIGINT) AS version,
               CAST(COUNT(*) AS BIGINT) AS n_new_rows
        FROM events GROUP BY 1
    )
    SELECT version, n_new_rows,
           CAST(SUM(n_new_rows) OVER (ORDER BY version) AS BIGINT)
               AS n_total
    FROM b ORDER BY version
    """,
)
def watch_events_heartbeat_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATCH lv EVENTS (watchStmt EVENTS accessor, reference
    ClickHouseParser.py:14249-14321): subscribe to a live view's update
    heartbeats — version counter + row deltas, not contents. Four
    deterministic source slices replay as four micro-batch updates; the
    oracle recomputes each slice's size and the running total."""
    tables(spark, sf_dir)
    return watch_heartbeats(spark, sf_dir).orderBy("version")


@query(
    "watch_limit_bounded",
    oracle="""
    WITH b AS (
        SELECT CAST(event_id % 4 AS BIGINT) AS version,
               CAST(COUNT(*) AS BIGINT) AS n_new_rows
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT version, n_new_rows,
               CAST(SUM(n_new_rows) OVER (ORDER BY version) AS BIGINT)
                   AS n_total
        FROM b
    )
    SELECT version, n_new_rows, n_total
    FROM t WHERE version < 2 ORDER BY version
    """,
)
def watch_limit_bounded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATCH lv LIMIT 2 (watchStmt LIMIT accessor): the bounded
    subscription — detach after the first two updates. The streaming
    query is stopped by a monitor once two heartbeats are recorded;
    the oracle is the heartbeat stream truncated at version 2."""
    tables(spark, sf_dir)
    return watch_heartbeats(spark, sf_dir, limit=2).orderBy("version")


@query(
    "streaming_upsert_sink",
    oracle="""
    WITH r AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           event_id AS last_event_id,
           ts AS last_ts,
           ROUND(value, 2) AS last_value
    FROM r WHERE rn = 1 ORDER BY user_id
    """,
)
def streaming_upsert_sink_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree streaming WRITE path: four micro-batch upserts
    into a keyed parquet destination, latest (ts, event_id) per user
    winning each merge. The batch oracle takes one argmax over the whole
    table — equal iff latest-wins merged correctly across every batch
    boundary."""
    tables(spark, sf_dir)
    res = upsert_latest_sink(spark, sf_dir)
    return res.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
        F.round("value", 2).alias("last_value"),
    ).orderBy("user_id")


@query(
    "streaming_join_left_outer",
    oracle="""
    SELECT c.event_id AS c_id,
           c.user_id AS c_user,
           p.event_id AS p_id,
           epoch_us(CAST(p.ts AS TIMESTAMP))
               - epoch_us(CAST(c.ts AS TIMESTAMP)) AS gap_us
    FROM events c LEFT JOIN events p
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click'
    ORDER BY c_id, p_id
    """,
)
def streaming_join_left_outer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — clicks with their
    next-hour purchases OR a watermark-proven NULL. The replay unions a
    far-future sentinel into both sides so the watermark passes all real
    data and every outer result flushes before the stream ends
    (streaming/pipeline.py:stream_stream_left_outer); the batch oracle
    is the plain left interval join."""
    tables(spark, sf_dir)
    res = stream_stream_left_outer(spark, sf_dir)
    return res.orderBy("c_id", "p_id")
