"""Round-8 query wave 18: cohort LTV curves (cumulative revenue per
signup cohort by age week — the "when does a cohort pay back" view that
retention matrices only hint at) and the entropy rate of the behavioral
Markov chain (how predictable is the next event, one number tying the
transition-matrix / next-event-backtest family together).

Reference parity note: no business-analytics surface in the reference;
extends the analytics charter (SURVEY §7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH s AS (
        SELECT user_id,
               date_trunc('week', MIN(ts)) AS cohort
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    sz AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_users
           FROM s GROUP BY cohort),
    rev AS (
        SELECT s.cohort,
               CAST(floor(date_diff('day', s.cohort, e.ts) / 7.0)
                    AS BIGINT) AS age_week,
               CAST(SUM(CAST(floor(e.value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s.cohort
        GROUP BY 1, 2
    )
    SELECT CAST(r.cohort AS VARCHAR) AS cohort,
           r.age_week,
           z.cohort_users,
           r.cents,
           CAST(SUM(r.cents) OVER (PARTITION BY r.cohort ORDER BY
                r.age_week ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW) AS BIGINT) AS cum_cents,
           CAST(floor(CAST(SUM(r.cents) OVER (PARTITION BY r.cohort
                ORDER BY r.age_week ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS DOUBLE) / z.cohort_users * 100
                + 0.5) AS BIGINT) AS cum_ltv_u
    FROM rev r JOIN sz z ON z.cohort = r.cohort
    ORDER BY cohort, age_week
    """,
)
def cohort_ltv_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV per signup-week cohort by age week: purchase
    revenue (exact integer cents) accumulates along each cohort's age
    axis and normalizes by cohort size — the payback curve. One join of
    purchases against the per-user cohort (broadcastable: cohorts are
    user-sized), one (cohort, age) aggregation, then a cohort-partition
    running sum over the tiny curve table."""
    ev = tables(spark, sf_dir)["events"]
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    )
    sz = s.groupBy("cohort").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s), "user_id")
        .filter(F.col("ts") >= F.col("cohort"))
        .groupBy(
            "cohort",
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("cohort")) / 7.0
            )
            .cast("long")
            .alias("age_week"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("cohort").orderBy("age_week").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        rev.join(F.broadcast(sz), "cohort")
        .select(
            F.col("cohort").cast("date").cast("string").alias("cohort"),
            "age_week",
            "cohort_users",
            "cents",
            F.sum("cents").over(w).cast("long").alias("cum_cents"),
            F.floor(
                F.sum("cents").over(w).cast("double")
                / F.col("cohort_users")
                * 100
                + 0.5
            )
            .cast("long")
            .alias("cum_ltv_u"),
        )
        .orderBy("cohort", "age_week")
    )


@query(
    "markov_entropy_rate",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    bi AS (SELECT cur, nxt FROM seq WHERE nxt IS NOT NULL),
    tr AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
           FROM bi GROUP BY cur, nxt),
    row_t AS (SELECT cur, CAST(SUM(c) AS BIGINT) AS rc FROM tr GROUP BY cur),
    tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS n FROM row_t),
    h AS (
        SELECT t.cur,
               SUM(CAST(t.c AS DOUBLE) / r.rc
                   * ln(CAST(t.c AS DOUBLE) / r.rc)) AS neg_h_row
        FROM tr t JOIN row_t r ON r.cur = t.cur
        GROUP BY t.cur
    )
    SELECT h.cur,
           r.rc AS n_transitions,
           CAST(floor(-h.neg_h_row / ln(2) * 1000000 + 0.5) AS BIGINT)
               AS row_entropy_bits_u,
           (SELECT CAST(floor(-SUM(CAST(r2.rc AS DOUBLE) / tot.n
                                   * h2.neg_h_row) / ln(2) * 1000000
                              + 0.5) AS BIGINT)
            FROM h h2 JOIN row_t r2 ON r2.cur = h2.cur CROSS JOIN tot)
               AS entropy_rate_bits_u
    FROM h JOIN row_t r ON r.cur = h.cur
    ORDER BY h.cur
    """,
)
def markov_entropy_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order behavioral Markov chain:
    per-state conditional entropy H(next | cur) in bits, and the chain
    entropy rate Σ π(cur)·H(row) with π the empirical transition-count
    distribution — the predictability ceiling for any next-event model
    (markov_next_event_accuracy's top-1 score lives under it). The
    |states|² transition table folds per-row in cur order with
    identical double terms on both engines; ordering inside each row's
    SUM is the per-group fold over ≤|states| terms, whose magnitudes
    stay far above the 1e-6 quantum relative to the scaled floor."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bi = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
    )
    tr = bi.groupBy("cur", "nxt").agg(
        F.count("*").cast("long").alias("c")
    )
    row_t = tr.groupBy("cur").agg(F.sum("c").cast("long").alias("rc"))
    h = (
        tr.join(row_t, "cur")
        .groupBy("cur")
        .agg(
            F.sum(
                (F.col("c").cast("double") / F.col("rc"))
                * F.log(F.col("c").cast("double") / F.col("rc"))
            ).alias("neg_h_row")
        )
    )
    tot = row_t.agg(F.sum("rc").cast("long").alias("n"))
    rate = (
        h.join(row_t, "cur")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.floor(
                -F.sum(
                    F.col("rc").cast("double")
                    / F.col("n")
                    * F.col("neg_h_row")
                )
                / float(__import__("math").log(2))
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("entropy_rate_bits_u")
        )
    )
    return (
        h.join(row_t, "cur")
        .crossJoin(F.broadcast(rate))
        .select(
            "cur",
            F.col("rc").alias("n_transitions"),
            F.floor(
                -F.col("neg_h_row")
                / float(__import__("math").log(2))
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("row_entropy_bits_u"),
            "entropy_rate_bits_u",
        )
        .orderBy("cur")
    )
