"""Round-7 session-22 queries: top event paths and Kaplan–Meier
survival.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has neither; path mining extends the sequence family
(transition matrix → order-2 paths), and Kaplan–Meier is the
censoring-aware time-to-event curve behind churn/conversion analyses
(ClickHouse deployments build it from windowFunnel + manual
cumulative terms, exactly as here)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables


@query(
    "top_event_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (SELECT e1 || '>' || e2 || '>' || e3 AS path
              FROM seq WHERE e3 IS NOT NULL),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_paths FROM paths)
    SELECT p.path, CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.n_paths)
                 * 1000000 + 0.5) / 1000000 AS share
    FROM paths p CROSS JOIN tot t
    GROUP BY p.path ORDER BY n DESC, path LIMIT 10
    """,
)
def top_event_paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 length-3 event paths across user sequences — the order-2
    extension of event_transition_matrix and the discovery side of the
    windowFunnel family (funnels VERIFY a hypothesized path; this
    SURFACES the paths worth hypothesizing). Two lead() offsets in one
    window pass build the path stream map-side; the total is a 1-row
    broadcast; shares are one floor-quantized integer ratio."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    paths = seq.select(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).localCheckpoint(eager=False)  # counted twice (total + per-path)
    tot = paths.agg(F.count("*").cast("long").alias("n_paths"))
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n",
            (
                F.floor(
                    F.col("n").cast("double") / F.col("n_paths") * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("share"),
        )
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@query(
    "kaplan_meier_survival",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS t0 FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT s.user_id,
                 MIN(datediff('day', CAST(s.t0 AS DATE), CAST(e.ts AS DATE)))
                     AS d
          FROM s JOIN events e
            ON e.user_id = s.user_id AND e.event_type = 'purchase'
           AND e.ts > s.t0
          GROUP BY s.user_id),
    cohort AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM s),
    ev AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS d_i FROM p GROUP BY d),
    km AS (
        SELECT d, d_i,
               c.n0 - COALESCE(SUM(d_i) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk,
               c.n0 AS n0
        FROM ev CROSS JOIN cohort c),
    surv AS (
        SELECT d, d_i, CAST(n_risk AS BIGINT) AS n_risk,
               SUM(CASE WHEN d_i < n_risk
                        THEN ln(1.0 - CAST(d_i AS DOUBLE) / n_risk)
                        ELSE 0.0 END)
                   OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS logs,
               MAX(CASE WHEN d_i >= n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS hit_zero
        FROM km)
    SELECT CAST(d AS BIGINT) AS d, d_i, n_risk,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE FLOOR(exp(logs) * 1000000 + 0.5) / 1000000 END
               AS survival
    FROM surv ORDER BY d
    """,
)
def kaplan_meier_survival_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival for signup→purchase conversion: S(d) =
    Π_{i≤d} (1 − dᵢ/nᵢ) over event days, where nᵢ (at risk) shrinks by
    prior conversions and never-converting users stay at risk to the
    window end (right-censoring) — the churn/time-to-event curve that a
    plain conversion rate misstates whenever observation windows
    differ. The product is computed as exp of a RUNNING SUM of
    ln(1 − dᵢ/nᵢ): both engines accumulate the ordered prefix one row
    at a time over integer-ratio terms, so the fold order is identical
    (the cumulative_daily_revenue discipline), then one exp and the
    floor quantization. Event-day table is tiny after the per-user
    min-aggregation; raw volume stops at the first groupBy."""
    ev = tables(spark, sf_dir)["events"]
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("tp"))
        .join(F.broadcast(s), "user_id")
        .filter(F.col("tp") > F.col("t0"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.datediff(F.to_date("tp"), F.to_date("t0"))
            ).alias("d")
        )
    )
    cohort = s.agg(F.count("*").cast("long").alias("n0"))
    evd = p.groupBy("d").agg(F.count("*").cast("long").alias("d_i"))
    wprev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    wcur = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    km = evd.crossJoin(F.broadcast(cohort)).withColumn(
        "n_risk",
        (F.col("n0") - F.coalesce(F.sum("d_i").over(wprev), F.lit(0))).cast(
            "long"
        ),
    )
    # the day everyone remaining converts has d_i == n_risk -> the KM
    # product hits EXACTLY zero (ln is undefined); carry an absorbing
    # flag instead of folding a -inf into the running sum
    term = F.when(
        F.col("d_i") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d_i").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    logs = F.sum(term).over(wcur)
    hit_zero = F.max(
        (F.col("d_i") >= F.col("n_risk")).cast("int")
    ).over(wcur)
    surv = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.floor(F.exp(logs) * 1000000 + F.lit(0.5)) / 1000000
    )
    return km.select(
        F.col("d").cast("long").alias("d"),
        "d_i",
        "n_risk",
        surv.alias("survival"),
    ).orderBy("d")
