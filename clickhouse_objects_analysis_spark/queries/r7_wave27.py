"""Round-7 session-27 queries: A/B-test power analysis and session
bounce rate.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has neither; power analysis is the experimentation-platform
planning formula (required sample size per arm from observed rates),
and bounce rate is the single-event-session share every web-analytics
deployment reports — both pure aggregates over shapes the registry
already owns (attribution conversion rates; the 30-minute-gap
sessionizer of batch_sessionization)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables

#: two-sided alpha=0.05 and power=0.80 normal quantiles — literals so
#: both engines square identical doubles.
_Z_A = 1.959963984540054
_Z_B = 0.8416212335729143


@query(
    "ab_test_power_analysis",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id, event_type AS ft,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rk,
               ts AS t0
        FROM events),
    ft AS (SELECT user_id, ft, t0 FROM firsts WHERE rk = 1
           AND ft IN ('view', 'click')),
    conv AS (SELECT DISTINCT f.user_id
             FROM ft f JOIN events e
               ON e.user_id = f.user_id
              AND e.event_type = 'purchase' AND e.ts > f.t0
              AND epoch_us(e.ts) - epoch_us(f.t0) <= 259200000000),
    arms AS (
        SELECT ft.ft AS arm,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(COUNT(c.user_id) AS BIGINT) AS n_conv
        FROM ft LEFT JOIN conv c ON ft.user_id = c.user_id
        GROUP BY ft.ft),
    wide AS (
        SELECT
          MAX(CASE WHEN arm = 'view' THEN n_users END) AS n1,
          MAX(CASE WHEN arm = 'view' THEN n_conv END) AS c1,
          MAX(CASE WHEN arm = 'click' THEN n_users END) AS n2,
          MAX(CASE WHEN arm = 'click' THEN n_conv END) AS c2
        FROM arms),
    rates AS (
        SELECT n1, c1, n2, c2,
               CAST(c1 AS DOUBLE) / n1 AS p1,
               CAST(c2 AS DOUBLE) / n2 AS p2
        FROM wide)
    SELECT CAST(n1 AS BIGINT) AS n_view, CAST(c1 AS BIGINT) AS conv_view,
           CAST(n2 AS BIGINT) AS n_click, CAST(c2 AS BIGINT) AS conv_click,
           FLOOR(p1 * 10000 + 0.5) / 10000 AS p_view,
           FLOOR(p2 * 10000 + 0.5) / 10000 AS p_click,
           CAST(CEIL(
               ({_Z_A!r} + {_Z_B!r}) * ({_Z_A!r} + {_Z_B!r})
               * (p1 * (1 - p1) + p2 * (1 - p2))
               / ((p1 - p2) * (p1 - p2))) AS BIGINT) AS n_per_arm
    FROM rates
    """,
)
def ab_test_power_analysis_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion power analysis: from the OBSERVED conversion
    rates of the view-first and click-first cohorts (conversion =
    purchase within a 72-hour attribution window of the first touch —
    an unbounded window saturates both cohorts at identical rates and
    degenerates the formula), the required sample size per arm
    to detect that difference at two-sided α=0.05 with 80% power —
    n = (z_α + z_β)² (p₁q₁ + p₂q₂) / (p₁ − p₂)², the planning number
    an experimentation platform quotes before any test launches.

    Float parity: the rates are single integer-ratio divisions, the z
    quantiles are shared literals, and the whole formula is ONE fixed
    expression ceil'd to an integer — both engines execute identical
    double ops. The cohort/conversion plumbing is two aggregates and a
    broadcast-sized LEFT join.

    r15 (OPTIMIZATION_r15.md, the gopher min-struct recipe): the
    first-event pick is ``min(struct(ts, event_id, event_type))`` per
    user — identical row to the old row_number window because
    (ts, event_id) is unique; the cohort filter applies after the pick
    exactly as rk == 1 did, and the aggregate partial-combines
    map-side instead of sorting the event stream per user."""
    ev = tables(spark, sf_dir)["events"]
    ft = (
        ev.groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id", "event_type")).alias("f"))
        .filter(F.col("f.event_type").isin("view", "click"))
        .select(
            "user_id",
            F.col("f.event_type").alias("arm"),
            F.col("f.ts").alias("t0"),
        )
    )
    conv = (
        ft.join(
            ev.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("cu"), F.col("ts").alias("ct")
            ),
            (F.col("user_id") == F.col("cu"))
            & (F.col("ct") > F.col("t0"))
            & (
                F.unix_micros("ct") - F.unix_micros("t0")
                <= 259200000000  # 72h attribution window
            ),
        )
        .select("user_id")
        .distinct()
        .withColumn("is_conv", F.lit(1))
    )
    arms = (
        ft.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.count("is_conv").cast("long").alias("n_conv"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "view", F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == "view", F.col("n_conv"))).alias("c1"),
        F.max(F.when(F.col("arm") == "click", F.col("n_users"))).alias("n2"),
        F.max(F.when(F.col("arm") == "click", F.col("n_conv"))).alias("c2"),
    )
    p1 = F.col("c1").cast("double") / F.col("n1")
    p2 = F.col("c2").cast("double") / F.col("n2")
    z2 = F.lit(_Z_A + _Z_B) * F.lit(_Z_A + _Z_B)
    n_arm = F.ceil(
        z2 * (p1 * (1 - p1) + p2 * (1 - p2)) / ((p1 - p2) * (p1 - p2))
    ).cast("long")
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return wide.select(
        F.col("n1").cast("long").alias("n_view"),
        F.col("c1").cast("long").alias("conv_view"),
        F.col("n2").cast("long").alias("n_click"),
        F.col("c2").cast("long").alias("conv_click"),
        q4(p1).alias("p_view"),
        q4(p2).alias("p_click"),
        n_arm.alias("n_per_arm"),
    )


@query(
    "session_bounce_rate",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t,
                      event_id
               FROM events),
    s AS (SELECT user_id, event_type,
                 SUM(CASE WHEN prev_t IS NULL
                          OR t - prev_t > 1800000000 THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
          FROM (SELECT user_id, event_type, t, event_id,
                       lag(t) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id) AS prev_t
                FROM e)),
    per_sess AS (SELECT user_id, session_id,
                        CAST(COUNT(*) AS BIGINT) AS len,
                        MIN(event_type) AS any_type
                 FROM s GROUP BY user_id, session_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           FLOOR(CAST(SUM(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) * 10000 + 0.5) / 10000 AS bounce_rate,
           FLOOR(CAST(SUM(len) AS DOUBLE) / COUNT(*) * 10000 + 0.5)
               / 10000 AS mean_session_len
    FROM per_sess
    """,
)
def session_bounce_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate over 30-minute-gap sessions (the exact
    batch_sessionization assigner: lag + running sum over integer
    microseconds): share of sessions containing a single event, plus
    the mean session length — the engagement headline next to WAU.
    One window pass per user builds session ids; both outputs are
    integer ratios floor-quantized."""
    ev = tables(spark, sf_dir)["events"]
    w_ord = Window.partitionBy("user_id").orderBy("t", "event_id")
    e = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("t")
    ).withColumn("prev_t", F.lag("t").over(w_ord))
    s = e.withColumn(
        "session_id",
        F.sum(
            F.when(
                F.col("prev_t").isNull()
                | (F.col("t") - F.col("prev_t") > 1800000000),
                1,
            ).otherwise(0)
        ).over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = s.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("len")
    )
    bounce = F.sum((F.col("len") == 1).cast("long"))
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return per_sess.agg(
        F.count("*").cast("long").alias("n_sessions"),
        bounce.cast("long").alias("n_bounces"),
        q4(bounce.cast("double") / F.count("*")).alias("bounce_rate"),
        q4(F.sum("len").cast("double") / F.count("*")).alias(
            "mean_session_len"
        ),
    )
