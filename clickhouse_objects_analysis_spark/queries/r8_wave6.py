"""Round-8 query wave 6: Markov next-event prediction backtest — the
evaluation loop on top of the registry's event_transition_matrix: fit
first-order transition counts on the pre-cutoff window, predict the
most likely next event type, score top-1 accuracy on the post-cutoff
window. The classic "is my sequence model better than marginal?"
baseline every behavioral-ML pipeline runs.

Reference parity note: no sequence-model surface in the reference
repo; extends the analytics charter (SURVEY §7) alongside
event_transition_matrix / top_event_paths / sequence_match.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import q6, query, tables

_CUTOFF = "2024-01-20 00:00:00"


@query(
    "markov_next_event_accuracy",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               lead(event_type) OVER w AS nxt,
               lead(ts) OVER w AS nxt_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    bi AS (
        SELECT event_type AS cur, nxt, ts FROM seq WHERE nxt IS NOT NULL
    ),
    train AS (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
        FROM bi WHERE ts < TIMESTAMP '{_CUTOFF}'
        GROUP BY cur, nxt
    ),
    pred AS (
        SELECT cur, nxt AS pred FROM (
            SELECT cur, nxt,
                   ROW_NUMBER() OVER (PARTITION BY cur
                                      ORDER BY c DESC, nxt) AS rn
            FROM train) WHERE rn = 1
    ),
    test AS (
        SELECT cur, nxt FROM bi WHERE ts >= TIMESTAMP '{_CUTOFF}'
    )
    SELECT t.cur,
           p.pred,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t.nxt = p.pred THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           FLOOR(CAST(SUM(CASE WHEN t.nxt = p.pred THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000
               AS accuracy
    FROM test t LEFT JOIN pred p USING (cur)
    GROUP BY t.cur, p.pred
    ORDER BY t.cur
    """,
)
def markov_next_event_accuracy_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov next-event backtest: transition counts fitted
    on bigrams starting before the cutoff, per-state argmax prediction
    (ties break lexically), top-1 accuracy scored on post-cutoff
    bigrams. States unseen in training predict NULL and score zero —
    surfaced, not dropped (LEFT join).

    Scale shape: bigrams form in one window pass per user (the same
    (user, ts) shuffle the sessionization queries ride); the fitted
    model is |states|² rows → broadcast to the test stream; scoring is
    one map-side comparison plus a states-sized aggregation. Accuracy
    is one double division of exact counts."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.lead("event_type").over(w).alias("nxt"),
    )
    bi = seq.filter(F.col("nxt").isNotNull()).select(
        F.col("event_type").alias("cur"), "nxt", "ts"
    )
    bi = bi.localCheckpoint(eager=False)  # feeds train AND test
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    train = (
        bi.filter(F.col("ts") < cutoff)
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rn = Window.partitionBy("cur").orderBy(F.desc("c"), F.asc("nxt"))
    pred = (
        train.withColumn("rn", F.row_number().over(rn))
        .filter(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("pred"))
    )
    test = bi.filter(F.col("ts") >= cutoff).select("cur", "nxt")
    return (
        test.join(F.broadcast(pred), "cur", "left")
        .groupBy("cur", "pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("nxt") == F.col("pred"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        .withColumn(
            "accuracy",
            q6(F.col("n_correct").cast("double") / F.col("n_test")),
        )
        .orderBy("cur")
    )
