"""Round-8 query wave 10: lead-lag analytics between two daily event
series — the cross-correlation function over ±7-day shifts (which
signal leads?) and a lag-1 Granger causality F-test (does yesterday's
click volume explain today's purchases beyond purchase history?).

Both are exact closed forms over integer daily counts: every moment is
an integer sum, and the final statistic is one deterministic double
expression replayed verbatim by the DuckDB twin (scaled-floor
rendered), so there is no iterative fitting and no libm drift.

Reference parity note: no time-series surface in the reference repo;
extends the analytics charter (SURVEY §7) alongside the Theil-Sen /
CUSUM / Mann-Kendall / Holt family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables

_DAILY_CTE = """
    daily AS (
        SELECT CAST(ts AS DATE) AS d,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   ::BIGINT AS x,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   ::BIGINT AS y
        FROM events GROUP BY 1
    )
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    return ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("y"),
    )


@query(
    "cross_correlation_leadlag",
    oracle=f"""
    WITH {_DAILY_CTE},
    lags AS (SELECT unnest(range(-7, 8)) AS k),
    paired AS (
        SELECT l.k, a.x AS x, b.y AS y
        FROM daily a
        JOIN lags l ON TRUE
        JOIN daily b ON b.d = a.d + CAST(l.k AS INT)
    ),
    s AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy
        FROM paired GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS lag, n,
           CAST(floor((n * sxy - sx * sy)
                      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                      * 1000000 + 0.5) AS BIGINT) AS corr_u
    FROM s
    WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    ORDER BY lag
    """,
)
def cross_correlation_leadlag_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCF between daily click volume and daily purchase volume at lags
    -7..+7 (corr of x_t against y_{t+k}): the daily aggregation is one
    events scan; the 15 shifted pairings come from a lag-table join on
    the DATE key (dates-sized, trivially partitioned), and each lag's
    Pearson r is the exact integer-moment formula. 100 TB: the only
    big-data stage is the per-day count — everything after runs on
    |days| rows."""
    daily = _daily(spark, sf_dir)
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("k"))
    a, b = daily.alias("a"), daily.alias("b")
    paired = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.d") == F.date_add(F.col("a.d"), F.col("k")))
        .select("k", F.col("a.x").alias("x"), F.col("b.y").alias("y"))
    )
    s = paired.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return (
        s.filter((vx > 0) & (vy > 0))
        .select(
            F.col("k").cast("long").alias("lag"),
            "n",
            F.floor((n * sxy - sx * sy) / F.sqrt(vx * vy) * 1000000 + 0.5)
            .cast("long")
            .alias("corr_u"),
        )
        .orderBy("lag")
    )


@query(
    "granger_causality_lag1",
    oracle=f"""
    WITH {_DAILY_CTE},
    l AS (
        SELECT y,
               lag(y) OVER (ORDER BY d) AS y1,
               lag(x) OVER (ORDER BY d) AS x1
        FROM daily
    ),
    r AS (SELECT * FROM l WHERE y1 IS NOT NULL),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(y1) AS DOUBLE) AS sy1,
               CAST(SUM(x1) AS DOUBLE) AS sx1,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(y1 * y1) AS DOUBLE) AS sy1y1,
               CAST(SUM(x1 * x1) AS DOUBLE) AS sx1x1,
               CAST(SUM(y * y1) AS DOUBLE) AS syy1,
               CAST(SUM(y * x1) AS DOUBLE) AS syx1,
               CAST(SUM(y1 * x1) AS DOUBLE) AS sy1x1
        FROM r
    ),
    c AS (
        SELECT n,
               syy - sy * sy / n AS tss,
               sy1y1 - sy1 * sy1 / n AS a11,
               sx1x1 - sx1 * sx1 / n AS a22,
               sy1x1 - sy1 * sx1 / n AS a12,
               syy1 - sy * sy1 / n AS c1,
               syx1 - sy * sx1 / n AS c2
        FROM s
    )
    SELECT n,
           CAST(floor((tss - c1 * c1 / a11) * 10000 + 0.5) AS BIGINT)
               AS rss_restricted_u,
           CAST(floor((tss - ((c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12)) * c1
                           - ((a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12)) * c2)
                      * 10000 + 0.5) AS BIGINT) AS rss_unrestricted_u,
           CAST(floor((((tss - c1 * c1 / a11)
                        - (tss - ((c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12)) * c1
                               - ((a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12)) * c2))
                       / ((tss - ((c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12)) * c1
                               - ((a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12)) * c2)
                          / (n - 3))) * 10000 + 0.5) AS BIGINT) AS f_stat_u
    FROM c
    """,
)
def granger_causality_lag1_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lag-1 Granger test, closed form: restricted OLS y_t ~ y_{t-1}
    vs unrestricted y_t ~ y_{t-1} + x_{t-1} (both with intercept, via
    centered moments), F = ((RSS_r - RSS_u) / 1) / (RSS_u / (n - 3)).
    Every moment is an exact integer sum over the daily series; the
    2×2 normal equations solve by determinant — the oracle spells out
    the identical expression tree so both engines build the same
    doubles. 100 TB: one events scan to |days| rows, then constant
    algebra."""
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("d")  # |days| rows: constant-sized window
    lagged = daily.select(
        "y",
        F.lag("y").over(w).alias("y1"),
        F.lag("x").over(w).alias("x1"),
    ).filter(F.col("y1").isNotNull())
    s = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("y1").cast("double").alias("sy1"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("y1") * F.col("y1")).cast("double").alias("sy1y1"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("sx1x1"),
        F.sum(F.col("y") * F.col("y1")).cast("double").alias("syy1"),
        F.sum(F.col("y") * F.col("x1")).cast("double").alias("syx1"),
        F.sum(F.col("y1") * F.col("x1")).cast("double").alias("sy1x1"),
    )
    n = F.col("n")
    tss = F.col("syy") - F.col("sy") * F.col("sy") / n
    a11 = F.col("sy1y1") - F.col("sy1") * F.col("sy1") / n
    a22 = F.col("sx1x1") - F.col("sx1") * F.col("sx1") / n
    a12 = F.col("sy1x1") - F.col("sy1") * F.col("sx1") / n
    c1 = F.col("syy1") - F.col("sy") * F.col("sy1") / n
    c2 = F.col("syx1") - F.col("sy") * F.col("sx1") / n
    det = a11 * a22 - a12 * a12
    b1 = (c1 * a22 - c2 * a12) / det
    b2 = (a11 * c2 - a12 * c1) / det
    rss_r = tss - c1 * c1 / a11
    rss_u = tss - b1 * c1 - b2 * c2
    f_stat = (rss_r - rss_u) / (rss_u / (n - F.lit(3)))
    return s.select(
        "n",
        F.floor(rss_r * 10000 + 0.5).cast("long").alias("rss_restricted_u"),
        F.floor(rss_u * 10000 + 0.5)
        .cast("long")
        .alias("rss_unrestricted_u"),
        F.floor(f_stat * 10000 + 0.5).cast("long").alias("f_stat_u"),
    )
