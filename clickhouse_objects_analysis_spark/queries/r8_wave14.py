"""Round-8 query wave 14: experimentation analytics — position-based
(U-shaped) attribution closing the multi-touch family, a
difference-in-differences uplift estimate, and a sequential SPRT
monitor over the daily conversion stream (the "peek early without
lying to yourself" test an A/B platform runs every morning).

Reference parity note: no experimentation surface in the reference;
extends the analytics charter (SURVEY §7) alongside ab_test_power /
ab_ztest_power_suite / the attribution family.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables

_CUTOFF = "2024-01-20 00:00:00"

# SPRT design literals: H0 p=0.24 vs H1 p=0.30, alpha=beta=0.05.
_P0, _P1 = 0.24, 0.30
_L_POS = math.log(_P1 / _P0)  # per-conversion LLR increment
_L_NEG = math.log((1 - _P1) / (1 - _P0))  # per-non-conversion
_B_UP = math.log((1 - 0.05) / 0.05)  # accept H1 boundary
_B_DN = math.log(0.05 / (1 - 0.05))  # accept H0 boundary


@query(
    "u_shaped_attribution",
    oracle="""
    WITH conv AS (
        SELECT user_id, MIN(ts) AS t_conv
        FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    touches AS (
        SELECT e.user_id, e.event_type,
               ROW_NUMBER() OVER w AS pos,
               CAST(COUNT(*) OVER (PARTITION BY e.user_id) AS BIGINT)
                   AS nt
        FROM events e JOIN conv c
          ON e.user_id = c.user_id AND e.ts < c.t_conv
        WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts, e.event_id))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(CASE
                WHEN nt = 1 THEN 1000000000
                WHEN nt = 2 THEN 500000000
                WHEN pos = 1 OR pos = nt THEN 400000000
                ELSE 200000000 // (nt - 2) END) AS BIGINT) AS credit_nano
    FROM touches GROUP BY event_type ORDER BY event_type
    """,
)
def u_shaped_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped / 40-20-40) attribution: the first and
    last pre-conversion touches take 40% each, the middle splits the
    remaining 20% equally. Credit is integer nanos (exact integer
    division for the middle share), so channel totals are order-free
    integer sums. Completes the attribution family: first-touch,
    linear, time-decay, position-based. Same scale shape: conversions
    broadcast, one per-user window for position, channel-sized agg."""
    ev = tables(spark, sf_dir)["events"]
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_conv"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    touches = (
        ev.join(F.broadcast(conv), "user_id")
        .filter(F.col("ts") < F.col("t_conv"))
        .select(
            "user_id", "event_type",
            F.row_number().over(w).alias("pos"),
            F.count("*")
            .over(Window.partitionBy("user_id"))
            .cast("long")
            .alias("nt"),
        )
    )
    credit = (
        F.when(F.col("nt") == 1, F.lit(1000000000))
        .when(F.col("nt") == 2, F.lit(500000000))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("nt")),
            F.lit(400000000),
        )
        .otherwise(F.expr("200000000 div (nt - 2)"))
    )
    return (
        touches.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum(credit).cast("long").alias("credit_nano"),
        )
        .orderBy("event_type")
    )


@query(
    "difference_in_differences",
    oracle=f"""
    WITH g AS (
        SELECT user_id % 2 AS grp,
               CASE WHEN ts >= TIMESTAMP '{_CUTOFF}' THEN 1 ELSE 0 END
                   AS post,
               value
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    cell AS (
        SELECT grp, post,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM g GROUP BY grp, post
    )
    SELECT grp, post, n, cents,
           CAST(floor(CAST(cents AS DOUBLE) / n / 100 * 1000000 + 0.5)
                AS BIGINT) AS mean_u,
           (SELECT CAST(floor((
                 (CAST(t1.cents AS DOUBLE) / t1.n
                  - CAST(t0.cents AS DOUBLE) / t0.n)
               - (CAST(c1.cents AS DOUBLE) / c1.n
                  - CAST(c0.cents AS DOUBLE) / c0.n)) / 100 * 1000000
                + 0.5) AS BIGINT)
            FROM cell t1, cell t0, cell c1, cell c0
            WHERE t1.grp = 1 AND t1.post = 1 AND t0.grp = 1 AND t0.post = 0
              AND c1.grp = 0 AND c1.post = 1 AND c0.grp = 0 AND c0.post = 0)
               AS did_u
    FROM cell ORDER BY grp, post
    """,
)
def difference_in_differences_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Difference-in-differences uplift: treatment = odd users, the
    post period starts at the cutoff; DiD = (T_post − T_pre) −
    (C_post − C_pre) over per-cell mean event values. Values are
    summed as exact integer cents, means and the DiD estimate are one
    double expression over four cell aggregates (scaled-floor
    rendered). The four cells come from ONE scan + one 4-group
    aggregation; the estimate is a broadcast of a 4-row table."""
    ev = tables(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("click", "purchase")
    )
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    cell = (
        ev.select(
            (F.col("user_id") % 2).alias("grp"),
            F.when(F.col("ts") >= cutoff, 1).otherwise(0).alias("post"),
            # floor(+0.5), not a bare cast: DuckDB rounds double→BIGINT
            # casts, Spark truncates — the explicit floor is the shared
            # semantics (see the round() memory note)
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents_v"),
        )
        .groupBy("grp", "post")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents_v").cast("long").alias("cents"),
        )
    )
    m = {
        (g, p): F.first(
            F.when(
                (F.col("grp") == g) & (F.col("post") == p),
                F.col("cents").cast("double") / F.col("n"),
            ),
            ignorenulls=True,
        )
        for g in (0, 1)
        for p in (0, 1)
    }
    did = cell.agg(
        F.floor(
            ((m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)]))
            / 100
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("did_u")
    )
    return (
        cell.crossJoin(F.broadcast(did))
        .select(
            "grp", "post", "n", "cents",
            F.floor(
                F.col("cents").cast("double") / F.col("n") / 100 * 1000000
                + 0.5
            )
            .cast("long")
            .alias("mean_u"),
            "did_u",
        )
        .orderBy("grp", "post")
    )


@query(
    "sprt_sequential_monitor",
    oracle=f"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    llr AS (
        SELECT day, n, x,
               SUM(x * {_L_POS!r} + (n - x) * {_L_NEG!r})
                   OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS s
        FROM d
    )
    SELECT CAST(day AS VARCHAR) AS first_day, n, x,
           CAST(floor(s * 1000000 + 0.5) AS BIGINT) AS llr_u,
           CASE WHEN s >= {_B_UP!r} THEN 'accept_h1'
                WHEN s <= {_B_DN!r} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr ORDER BY first_day
    """,
)
def sprt_sequential_monitor_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wald SPRT over the daily conversion stream (H0 p=0.24 vs H1
    p=0.30, alpha=beta=0.05): the log-likelihood ratio is a running
    integer-weighted sum (x·ln(p1/p0) + (n−x)·ln(q1/q0) per day,
    increments as Python float literals shared with the oracle), and
    each day reports continue / accept-H0 / accept-H1 against the Wald
    boundaries — sequential monitoring with a guaranteed error bound,
    unlike daily re-peeking at a fixed-horizon z-test. One scan to
    |days| rows; the prefix fold is day-ordered and engine-identical.
    """
    ev = tables(spark, sf_dir)["events"]
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("x"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = F.sum(
        F.col("x") * F.lit(_L_POS) + (F.col("n") - F.col("x")) * F.lit(_L_NEG)
    ).over(w)
    return d.select(
        F.col("day").cast("string").alias("first_day"),
        "n", "x",
        F.floor(s * 1000000 + 0.5).cast("long").alias("llr_u"),
        F.when(s >= _B_UP, "accept_h1")
        .when(s <= _B_DN, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("first_day")
