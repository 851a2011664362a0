"""Round-7 session-9 queries: MMR diversified re-ranking, rolling window
median, and funnel time-to-convert quantiles.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; MMR is the diversity re-ranker that sits
after the ANN/BM25/RRF retrieval stack (SURVEY §7 similarity charter),
the rolling median extends the window surface with an order-statistic
frame aggregate, and time-to-convert is the duration complement of the
windowFunnel depth queries."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.similarity import as_double
from .registry import query, tables

_MMR_SEL = """
    SELECT c.id, CAST(FLOOR(0.7 * c.rel - 0.3 * MAX(ps.sim) + 0.5)
                      AS BIGINT) AS score
    FROM cand c JOIN ps ON ps.ia = c.id AND ps.ib IN ({sel})
    WHERE c.id NOT IN ({sel})
    GROUP BY c.id, c.rel
    ORDER BY score DESC, c.id LIMIT 1
"""


@query(
    "mmr_diversified_rerank",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS vq FROM e WHERE vec_id = 0),
    cand AS (
        SELECT vec_id AS id,
               CAST(FLOOR(list_cosine_similarity(v, vq) * 1e9 + 0.5)
                    AS BIGINT) AS rel, v
        FROM e CROSS JOIN q WHERE vec_id <> 0
        ORDER BY rel DESC, vec_id LIMIT 20),
    ps AS (SELECT a.id AS ia, b.id AS ib,
                  CAST(FLOOR(list_cosine_similarity(a.v, b.v) * 1e9 + 0.5)
                       AS BIGINT) AS sim
           FROM cand a JOIN cand b ON a.id <> b.id),
    s1 AS (SELECT id, CAST(FLOOR(0.7 * rel + 0.5) AS BIGINT) AS score
           FROM cand ORDER BY rel DESC, id LIMIT 1),
    s2 AS ({_MMR_SEL.format(sel="(SELECT id FROM s1)")}),
    s3 AS ({_MMR_SEL.format(
        sel="(SELECT id FROM s1), (SELECT id FROM s2)")}),
    s4 AS ({_MMR_SEL.format(
        sel="(SELECT id FROM s1), (SELECT id FROM s2), (SELECT id FROM s3)")}),
    s5 AS ({_MMR_SEL.format(
        sel="(SELECT id FROM s1), (SELECT id FROM s2), "
            "(SELECT id FROM s3), (SELECT id FROM s4)")})
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS rank, CAST(id AS BIGINT) AS doc_id,
               score AS score_nano FROM s1
        UNION ALL SELECT 2, id, score FROM s2
        UNION ALL SELECT 3, id, score FROM s3
        UNION ALL SELECT 4, id, score FROM s4
        UNION ALL SELECT 5, id, score FROM s5
    ) ORDER BY rank
    """,
)
def mmr_diversified_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (λ=0.7, k=5 over a 20-doc
    candidate pool): each step picks argmax of λ·rel − (1−λ)·max-sim-to-
    already-selected, trading relevance against redundancy — the
    diversity stage a RAG pipeline runs after ANN/BM25/RRF retrieval.
    MMR is inherently sequential in k (each pick changes the penalty
    landscape), so the loop is k=5 driver-bounded single-row pulls —
    the ≤k-row control-flow pull pattern (same budget class as the
    sketch pulls) — while everything heavy stays distributed: candidate
    generation is the broadcast-query cosine top-k over the full
    corpus, and the 20×20 pair-sim matrix is one self-join computed
    engine-side. The oracle unrolls the same 5 steps as chained CTEs.

    Float parity: rel and pairwise sims quantize to the 1e-9 grid
    BEFORE selection; each MMR score is floor(0.7·int − 0.3·int + 0.5)
    — one fixed double expression over integers per (candidate, step),
    so selection order cannot diverge between engines."""
    e = tables(spark, sf_dir)["embeddings"]
    base = e.select(
        F.col("vec_id").cast("long").alias("id"),
        as_double(F.col("embedding")).alias("v"),
    )
    qv = base.filter(F.col("id") == 0).select(F.col("v").alias("vq"))
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda a, b: a + b
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    )
    nano = lambda c: F.floor(c * 1e9 + F.lit(0.5)).cast("long")  # noqa: E731
    cand = (
        base.filter(F.col("id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "id",
            nano(dot("v", "vq") / (nrm(F.col("v")) * nrm(F.col("vq"))))
            .alias("rel"),
            "v",
        )
        .orderBy(F.desc("rel"), "id")
        .limit(20)
        .localCheckpoint()  # 20 rows: selection loop re-reads it 5x
    )
    ps = (
        cand.alias("a")
        .join(F.broadcast(cand.alias("b")), F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            nano(
                dot("a.v", "b.v") / (nrm(F.col("a.v")) * nrm(F.col("b.v")))
            ).alias("sim"),
        )
        .localCheckpoint()
    )
    first = (
        cand.select(
            "id", F.floor(F.lit(0.7) * F.col("rel") + F.lit(0.5)).cast("long").alias("score")
        )
        .orderBy(F.desc("score"), "id")
        .first()
    )
    selected = [(1, first["id"], first["score"])]
    for step in range(2, 6):
        sel_ids = [s[1] for s in selected]
        nxt = (
            cand.filter(~F.col("id").isin(sel_ids))
            .join(
                ps.filter(F.col("ib").isin(sel_ids)),
                F.col("id") == F.col("ia"),
            )
            .groupBy("id", "rel")
            .agg(F.max("sim").alias("pen"))
            .select(
                "id",
                F.floor(
                    F.lit(0.7) * F.col("rel")
                    - F.lit(0.3) * F.col("pen")
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("score"),
            )
            .orderBy(F.desc("score"), "id")
            .first()
        )
        selected.append((step, nxt["id"], nxt["score"]))
    return spark.createDataFrame(
        selected, "rank long, doc_id long, score_nano long"
    ).orderBy("rank")


@query(
    "rolling_median_7d",
    oracle="""
    WITH base AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               CAST(COUNT(*) AS DOUBLE) AS c
        FROM events GROUP BY 1, 2)
    SELECT event_type, CAST(d AS BIGINT) AS d,
           ROUND(median(c) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
    FROM base ORDER BY event_type, d
    """,
)
def rolling_median_7d_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of daily event counts per type —
    the order-statistic window aggregate (exact percentile over a ROWS
    frame) that the avg/sum moving aggregates can't substitute for
    under outliers. Both engines interpolate the even-window middle
    pair as their mean — one add + one halve of exact integer counts,
    no accumulation order to diverge. Scale: one shuffle on the series
    key, frames re-sorted per partition; raw event volume is reduced
    by the upstream codegen daily groupBy."""
    ev = tables(spark, sf_dir)["events"]
    base = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
    ).agg(F.count("*").cast("double").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    return base.select(
        "event_type",
        F.col("d").cast("long").alias("d"),
        F.round(F.expr("percentile(c, 0.5)").over(w), 4).alias("med7"),
    ).orderBy("event_type", "d")


@query(
    "funnel_conversion_time",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    p AS (SELECT v.user_id, v.t_view, MIN(e.ts) AS t_purchase
          FROM v JOIN events e
            ON e.user_id = v.user_id AND e.event_type = 'purchase'
           AND e.ts > v.t_view
          GROUP BY v.user_id, v.t_view),
    d AS (SELECT CAST(epoch_us(t_purchase) - epoch_us(t_view) AS DOUBLE)
                     AS dt
          FROM p)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(quantile_cont(dt, 0.25) / 1000000.0, 4) AS p25_sec,
           ROUND(quantile_cont(dt, 0.50) / 1000000.0, 4) AS p50_sec,
           ROUND(quantile_cont(dt, 0.75) / 1000000.0, 4) AS p75_sec,
           CAST(FLOOR(MAX(dt) / 1000000.0) AS BIGINT) AS max_sec
    FROM d
    """,
)
def funnel_conversion_time_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution — the duration complement of the
    windowFunnel depth queries: for every user whose first 'purchase'
    follows their first 'view', the view→purchase latency in whole
    seconds, summarized as exact interpolated quartiles. Two min-aggs
    and one join on user_id (the view side pre-shrunk to one row per
    user before the join); quantiles interpolate over exact INTEGER
    microsecond deltas (unix_micros ↔ epoch_us, the ch_aggregates
    discipline), so the linear blend is a single multiply-add over
    exact values on both engines, divided to seconds once at the
    end."""
    ev = tables(spark, sf_dir)["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("tp"))
        .join(v, "user_id")
        .filter(F.col("tp") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("tp").alias("t_purchase"))
    )
    d = p.select(
        (
            F.unix_micros("t_purchase") - F.unix_micros("t_view")
        ).cast("double").alias("dt")
    )
    sec = lambda q: F.round(  # noqa: E731
        F.expr(f"percentile(dt, {q})") / F.lit(1000000.0), 4
    )
    return d.agg(
        F.count("*").cast("long").alias("n_converted"),
        sec("0.25").alias("p25_sec"),
        sec("0.50").alias("p50_sec"),
        sec("0.75").alias("p75_sec"),
        F.floor(F.max("dt") / F.lit(1000000.0)).cast("long").alias("max_sec"),
    )
