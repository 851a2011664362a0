"""Round-8 query wave 19: covariate balance (standardized mean
difference between experiment arms, raw and within strata — the
balance table a causal analysis prints before trusting any estimate)
and the dispersion index of daily event counts (count-level
overdispersion: Poisson ≈ 1, clumped ≫ 1 — the count-side sibling of
interarrival_burstiness).

Reference parity note: no causal/statistics surface in the reference;
extends the analytics charter (SURVEY §7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables


@query(
    "covariate_balance_smd",
    oracle="""
    WITH u AS (
        SELECT user_id, user_id % 2 AS arm, user_id % 5 AS stratum,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS x
        FROM events GROUP BY user_id
    ),
    cell AS (
        SELECT stratum, arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(x * x) AS DOUBLE) AS sxx
        FROM u GROUP BY stratum, arm
    ),
    w AS (
        SELECT t.stratum, t.n AS n_t, c.n AS n_c,
               t.sx / t.n AS mu_t, c.sx / c.n AS mu_c,
               (t.sxx - t.sx * t.sx / t.n) / (t.n - 1) AS v_t,
               (c.sxx - c.sx * c.sx / c.n) / (c.n - 1) AS v_c
        FROM cell t JOIN cell c ON t.stratum = c.stratum
        WHERE t.arm = 1 AND c.arm = 0
    )
    SELECT stratum, n_t, n_c,
           CAST(floor((mu_t - mu_c) / sqrt((v_t + v_c) / 2)
                      * 1000000 + 0.5) AS BIGINT) AS smd_u,
           CASE WHEN abs((mu_t - mu_c) / sqrt((v_t + v_c) / 2)) > 0.1
                THEN 1 ELSE 0 END AS imbalance_flag
    FROM w ORDER BY stratum
    """,
)
def covariate_balance_smd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized mean difference of the per-user spend covariate
    between 50/50 arms, within each of five strata: SMD = (μT − μC) /
    √((s²T + s²C)/2), flagged at the conventional |SMD| > 0.1 imbalance
    threshold. Moments are exact integer-cent sums per (stratum, arm)
    cell — one scan, one 10-cell aggregation, one stratum self-join of
    the tiny cell table."""
    ev = tables(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("x")
    ).select(
        (F.col("user_id") % 2).alias("arm"),
        (F.col("user_id") % 5).alias("stratum"),
        "x",
    )
    cell = u.groupBy("stratum", "arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    t = cell.filter(F.col("arm") == 1).select(
        "stratum",
        F.col("n").alias("n_t"),
        (F.col("sx") / F.col("n")).alias("mu_t"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v_t"),
    )
    c = cell.filter(F.col("arm") == 0).select(
        "stratum",
        F.col("n").alias("n_c"),
        (F.col("sx") / F.col("n")).alias("mu_c"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v_c"),
    )
    smd = (F.col("mu_t") - F.col("mu_c")) / F.sqrt(
        (F.col("v_t") + F.col("v_c")) / 2
    )
    return (
        t.join(c, "stratum")
        .select(
            "stratum", "n_t", "n_c",
            F.floor(smd * 1000000 + 0.5).cast("long").alias("smd_u"),
            F.when(F.abs(smd) > 0.1, 1).otherwise(0).alias(
                "imbalance_flag"
            ),
        )
        .orderBy("stratum")
    )


@query(
    "count_overdispersion_index",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(c) AS DOUBLE) AS sc,
               CAST(SUM(c * c) AS DOUBLE) AS scc
        FROM d GROUP BY event_type
    )
    SELECT event_type, n_days,
           CAST(floor(sc / n_days * 10000 + 0.5) AS BIGINT) AS mean_u,
           CAST(floor((scc - sc * sc / n_days) / (n_days - 1) * 10000
                      + 0.5) AS BIGINT) AS var_u,
           CAST(floor(((scc - sc * sc / n_days) / (n_days - 1))
                      / (sc / n_days) * 1000000 + 0.5) AS BIGINT)
               AS dispersion_u,
           CASE WHEN ((scc - sc * sc / n_days) / (n_days - 1))
                     / (sc / n_days) > 1.5 THEN 1 ELSE 0 END
               AS overdispersed_flag
    FROM s ORDER BY event_type
    """,
)
def count_overdispersion_index_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dispersion index (variance-to-mean ratio) of daily counts per
    event type: ≈1 under Poisson arrivals, ≫1 when days clump — the
    count-level overdispersion check that decides Poisson vs negative
    binomial for any rate model. Exact integer daily counts, moment
    formula, flagged above 1.5."""
    ev = tables(spark, sf_dir)["events"]
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    s = d.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("double").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("scc"),
    )
    mean = F.col("sc") / F.col("n_days")
    var = (F.col("scc") - F.col("sc") * F.col("sc") / F.col("n_days")) / (
        F.col("n_days") - 1
    )
    return s.select(
        "event_type", "n_days",
        F.floor(mean * 10000 + 0.5).cast("long").alias("mean_u"),
        F.floor(var * 10000 + 0.5).cast("long").alias("var_u"),
        F.floor(var / mean * 1000000 + 0.5)
        .cast("long")
        .alias("dispersion_u"),
        F.when(var / mean > 1.5, 1).otherwise(0).alias(
            "overdispersed_flag"
        ),
    ).orderBy("event_type")
