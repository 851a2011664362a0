"""Round-8 query wave 15: experimentation platform staples, continued —
CUPED variance reduction (the pre-period covariate adjustment every
mature A/B stack applies before reading a metric) and the
sample-ratio-mismatch chi-square guard (the assignment-integrity check
that runs before ANY result is trusted).

Reference parity note: no experimentation surface in the reference;
extends the analytics charter (SURVEY §7) alongside wave 14.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables

_CUTOFF = "2024-01-20 00:00:00"

#: chi-square critical value, 1 dof, alpha = 0.001
_CHI2_CRIT = 10.827566170662733


@query(
    "cuped_variance_reduction",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUTOFF}'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_CUTOFF}'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy
        FROM per_user
    )
    SELECT n,
           CAST(floor((sxy - sx * sy / n) / (sxx - sx * sx / n)
                      * 1000000 + 0.5) AS BIGINT) AS theta_u,
           CAST(floor((syy - sy * sy / n) / (n - 1) * 10000 + 0.5)
                AS BIGINT) AS var_y_u,
           CAST(floor(((syy - sy * sy / n)
                       - ((sxy - sx * sy / n) * (sxy - sx * sy / n))
                         / (sxx - sx * sx / n)) / (n - 1) * 10000 + 0.5)
                AS BIGINT) AS var_cuped_u,
           CAST(floor((1.0 - (((sxy - sx * sy / n) * (sxy - sx * sy / n))
                              / (sxx - sx * sx / n))
                             / (syy - sy * sy / n)) * 1000000 + 0.5)
                AS BIGINT) AS var_ratio_u
    FROM s
    """,
)
def cuped_variance_reduction_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUPED: adjust each user's experiment-period metric y by their
    pre-period covariate x with θ = cov(x,y)/var(x); the adjusted
    variance is var(y)·(1 − ρ²), computed here in closed form from six
    exact integer-cent moments (per-user sums in one scan + one
    aggregation). Reports θ, the raw and adjusted variances, and the
    variance ratio — the % of metric noise the pre-period explains
    away. All doubles derive from the same integer sums in the same
    expression shape on both engines, scaled-floor rendered."""
    ev = tables(spark, sf_dir)["events"]
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    s = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    return s.select(
        "n",
        F.floor(cxy / vx * 1000000 + 0.5).cast("long").alias("theta_u"),
        F.floor(vy / (n - F.lit(1)) * 10000 + 0.5)
        .cast("long")
        .alias("var_y_u"),
        F.floor((vy - (cxy * cxy) / vx) / (n - F.lit(1)) * 10000 + 0.5)
        .cast("long")
        .alias("var_cuped_u"),
        F.floor(
            (F.lit(1.0) - ((cxy * cxy) / vx) / vy) * 1000000 + 0.5
        )
        .cast("long")
        .alias("var_ratio_u"),
    )


@query(
    "sample_ratio_mismatch",
    oracle="""
    WITH arms AS (
        SELECT user_id % 2 AS arm,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM arms)
    SELECT a.arm, a.n, t.total,
           CAST(floor(power(CAST(a.n AS DOUBLE) - t.total / 2.0, 2)
                      / (t.total / 2.0) * 2 * 1000000 + 0.5) AS BIGINT)
               AS chi2_u,
           CASE WHEN power(CAST(a.n AS DOUBLE) - t.total / 2.0, 2)
                     / (t.total / 2.0) * 2 > 10.827566170662733
                THEN 1 ELSE 0 END AS srm_flag
    FROM arms a CROSS JOIN t ORDER BY a.arm
    """,
)
def sample_ratio_mismatch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch: distinct users per 50/50 assignment arm,
    the chi-square statistic against the expected split (both arms
    contribute (n−E)²/E; with two symmetric arms that is 2·(n−E)²/E),
    and a flag against the 1-dof α=0.001 critical value — the standard
    'stop, your randomization is broken' guard. One distinct-count
    aggregation plus a one-row totals broadcast."""
    ev = tables(spark, sf_dir)["events"]
    arms = ev.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.countDistinct("user_id").cast("long").alias("n")
    )
    t = arms.agg(F.sum("n").cast("long").alias("total"))
    chi2 = (
        F.pow(F.col("n").cast("double") - F.col("total") / 2.0, 2)
        / (F.col("total") / 2.0)
        * 2
    )
    return (
        arms.crossJoin(F.broadcast(t))
        .select(
            "arm", "n", "total",
            F.floor(chi2 * 1000000 + 0.5).cast("long").alias("chi2_u"),
            F.when(chi2 > _CHI2_CRIT, 1).otherwise(0).alias("srm_flag"),
        )
        .orderBy("arm")
    )
