"""Round-8 query wave 13: join-skew audit — the pre-flight check a
100 TB join runs before committing to a shuffle strategy: per-key
frequency profile of the join column, the hottest keys' share of the
table, and the salt factor that would level each hot key to mean-sized
buckets (the number operators/skew.py's salted join takes as input).

Reference parity note: no planning surface in the reference; extends
the scale-engineering charter (SURVEY §7) alongside compaction_planning
and parts_storage_stats.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables


@query(
    "join_skew_audit",
    oracle="""
    WITH k AS (
        SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(MAX(cnt) AS BIGINT) AS max_cnt
        FROM k
    )
    SELECT k.key, k.cnt,
           CAST(floor(CAST(k.cnt AS DOUBLE) / tot.total * 1000000 + 0.5)
                AS BIGINT) AS share_u,
           CAST(ceil(CAST(k.cnt AS DOUBLE) * tot.n_keys / tot.total)
                AS BIGINT) AS salt_factor,
           tot.n_keys, tot.total, tot.max_cnt
    FROM k CROSS JOIN tot
    ORDER BY k.cnt DESC, k.key LIMIT 10
    """,
)
def join_skew_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-frequency profile of lineitem.l_suppkey (the canonical
    many-to-one join column): the ten hottest keys with their table
    share and the salt factor that levels each to mean-sized buckets —
    ceil(cnt · n_keys / total), i.e. how many average keys' worth of
    rows the hot key carries. One groupBy plus a 1-row broadcast of the
    totals; at 100 TB this is the same single shuffle the real join
    would pay anyway, run once to DECIDE whether to salt."""
    li = tables(spark, sf_dir)["lineitem"]
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = k.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "key", "cnt",
            F.floor(
                F.col("cnt").cast("double") / F.col("total") * 1000000 + 0.5
            )
            .cast("long")
            .alias("share_u"),
            F.ceil(
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("total")
            )
            .cast("long")
            .alias("salt_factor"),
            "n_keys", "total", "max_cnt",
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(10)
    )


@query(
    "time_decay_attribution",
    oracle="""
    WITH conv AS (
        SELECT user_id, MIN(ts) AS t_conv
        FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    touches AS (
        SELECT e.event_type,
               least(CAST(floor(date_diff('second', e.ts, c.t_conv)
                                / 604800.0) AS BIGINT), 20) AS k
        FROM events e JOIN conv c
          ON e.user_id = c.user_id AND e.ts < c.t_conv)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(1000000000 >> k) AS BIGINT) AS credit_nano
    FROM touches GROUP BY event_type ORDER BY event_type
    """,
)
def time_decay_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution with a one-week half-life —
    the third member of the attribution family (first_touch winner-
    takes-all, linear equal-split, now recency-weighted). Weights are
    EXACT negative powers of two (credit = 1e9 >> weeks-before-
    conversion, capped at 20): every touch contributes an integer, so
    channel totals are order-free integer sums — no float accumulation
    can diverge between engines. Same scale shape as the linear
    variant: conversions broadcast, one map-side weight per touch, one
    channel-sized aggregation."""
    ev = tables(spark, sf_dir)["events"]
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_conv"))
    )
    k = F.least(
        F.floor(
            (
                F.unix_timestamp("t_conv") - F.unix_timestamp("ts")
            ).cast("double")
            / 604800.0
        ).cast("long"),
        F.lit(20),
    )
    touches = (
        ev.join(F.broadcast(conv), "user_id")
        .filter(F.col("ts") < F.col("t_conv"))
        .select("event_type", k.alias("k"))
        # pyspark's shiftright binding takes only a literal bit count;
        # the SQL function form accepts a column
        .select(
            "event_type",
            F.expr("shiftright(1000000000L, CAST(k AS INT))").alias("w"),
        )
    )
    return (
        touches.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum("w").cast("long").alias("credit_nano"),
        )
        .orderBy("event_type")
    )


@query(
    "nelson_aalen_hazard",
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
    na AS (
        SELECT d, d_i,
               c.n0 - COALESCE(SUM(d_i) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
        FROM ev CROSS JOIN cohort c)
    SELECT CAST(d AS BIGINT) AS d, d_i, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(FLOOR(SUM(CAST(d_i AS DOUBLE) / n_risk)
                          OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW)
                      * 1000000 + 0.5) AS BIGINT) AS cum_hazard_u
    FROM na ORDER BY d
    """,
)
def nelson_aalen_hazard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard for the same signup→purchase
    cohort as kaplan_meier_survival: H(d) = Σ_{i≤d} dᵢ/nᵢ — the
    estimator of choice when hazard INCREMENTS matter (plateaus =
    conversion fatigue) rather than the survival product. The running
    sum folds identical integer-ratio terms in identical d-order on
    both engines (the cumulative-prefix discipline), then one floor
    quantization. Same scale shape as KM: raw volume stops at the
    per-user min; the curve is |days| rows."""
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
    n0 = s.agg(F.count(F.lit(1)).cast("long").alias("n0"))
    evd = p.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("d_i"))
    w_prev = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    na = evd.crossJoin(F.broadcast(n0)).withColumn(
        "n_risk",
        F.col("n0") - F.coalesce(F.sum("d_i").over(w_prev), F.lit(0)),
    )
    return na.select(
        F.col("d").cast("long").alias("d"),
        "d_i",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.floor(
            F.sum(F.col("d_i").cast("double") / F.col("n_risk")).over(w_cum)
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("cum_hazard_u"),
    ).orderBy("d")
