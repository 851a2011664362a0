"""Round-7 session-16 queries: kNN classifier evaluation, dedup
cluster-size histogram, and ship-latency quantiles.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; the eval metrics close the loop on
knn_classify (a weak labeler is only usable with measured
precision/recall), the cluster-size histogram is the corpus-duplication
profile a curation run reports, and ship latency is the classic
TPC-H-flavored day-delta analytic."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.dedup import connected_components_auto, minhash_lsh_pairs
from ..operators.similarity import cosine_topk
from .registry import query, tables


@query(
    "knn_eval_metrics",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS vq, label AS true_label
          FROM e WHERE vec_id < 100),
    c AS (SELECT vec_id, v, label FROM e WHERE vec_id >= 100),
    scored AS (
        SELECT q.query_id, c.vec_id AS corpus_id, c.label,
               FLOOR(list_cosine_similarity(q.vq, c.v) * 1e9 + 0.5) / 1e9
                   AS cos
        FROM q JOIN c ON TRUE),
    ranked AS (
        SELECT query_id, label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, corpus_id) AS rank
        FROM scored),
    votes AS (
        SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS votes
        FROM ranked WHERE rank <= 10 GROUP BY query_id, label),
    pred AS (
        SELECT query_id, label AS pred_label
        FROM (SELECT query_id, label, row_number() OVER (
                  PARTITION BY query_id ORDER BY votes DESC, label) AS vr
              FROM votes)
        WHERE vr = 1),
    joined AS (
        SELECT q.true_label, p.pred_label
        FROM q JOIN pred p ON q.query_id = p.query_id),
    labels AS (SELECT DISTINCT true_label AS label FROM joined
               UNION SELECT DISTINCT pred_label FROM joined),
    m AS (
        SELECT l.label,
               CAST(COALESCE(SUM(CASE WHEN j.true_label = l.label
                    AND j.pred_label = l.label THEN 1 END), 0) AS BIGINT)
                   AS tp,
               CAST(COALESCE(SUM(CASE WHEN j.true_label <> l.label
                    AND j.pred_label = l.label THEN 1 END), 0) AS BIGINT)
                   AS fp,
               CAST(COALESCE(SUM(CASE WHEN j.true_label = l.label
                    AND j.pred_label <> l.label THEN 1 END), 0) AS BIGINT)
                   AS fn
        FROM labels l CROSS JOIN joined j GROUP BY l.label)
    SELECT CAST(label AS BIGINT) AS label, tp, fp, fn,
           CASE WHEN tp + fp > 0 THEN
               FLOOR(CAST(tp AS DOUBLE) / (tp + fp) * 10000 + 0.5) / 10000
               ELSE 0.0 END AS precision_,
           CASE WHEN tp + fn > 0 THEN
               FLOOR(CAST(tp AS DOUBLE) / (tp + fn) * 10000 + 0.5) / 10000
               ELSE 0.0 END AS recall_,
           CASE WHEN 2 * tp + fp + fn > 0 THEN
               FLOOR(2.0 * tp / (2 * tp + fp + fn) * 10000 + 0.5) / 10000
               ELSE 0.0 END AS f1
    FROM m ORDER BY label
    """,
)
def knn_eval_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation for the kNN weak labeler: hold the first
    100 vectors out as a labeled eval set, predict each by k=10
    majority vote over the remaining corpus (the exact knn_classify
    recipe), and report the per-label confusion counts with
    precision / recall / F1 — the measurement without which a weak
    labeler cannot gate a curation pipeline. Label set = union of
    true and predicted labels, so a label the classifier never
    predicts still reports its recall=0 row.

    All counts are integers; each metric is one integer-ratio
    division floor-quantized. Scale: prediction inherits
    cosine_topk's corpus-never-shuffles plan; the confusion matrix is
    |labels|² bounded; the label×prediction cross join rides on the
    20-to-100-row joined frame, never the corpus."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 100)
    corpus = e.filter(F.col("vec_id") >= 100)
    topk = cosine_topk(corpus, q, "vec_id", "embedding", k=10)
    labels = corpus.select(F.col("vec_id").alias("corpus_id"), "label")
    votes = (
        topk.join(F.broadcast(labels), "corpus_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label")
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    joined = (
        q.select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("true_label"),
        )
        .join(pred, "query_id")
        .localCheckpoint(eager=False)  # label domain + matrix both read it
    )
    lab = (
        joined.select(F.col("true_label").alias("label"))
        .union(joined.select("pred_label"))
        .distinct()
    )
    m = (
        F.broadcast(lab)
        .crossJoin(joined)
        .groupBy("label")
        .agg(
            F.sum(
                (
                    (F.col("true_label") == F.col("label"))
                    & (F.col("pred_label") == F.col("label"))
                ).cast("long")
            ).alias("tp"),
            F.sum(
                (
                    (F.col("true_label") != F.col("label"))
                    & (F.col("pred_label") == F.col("label"))
                ).cast("long")
            ).alias("fp"),
            F.sum(
                (
                    (F.col("true_label") == F.col("label"))
                    & (F.col("pred_label") != F.col("label"))
                ).cast("long")
            ).alias("fn"),
        )
    )
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        q4(F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        q4(F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))),
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        q4(
            F.lit(2.0)
            * F.col("tp")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
        ),
    ).otherwise(F.lit(0.0))
    return (
        m.select(
            F.col("label").cast("long").alias("label"),
            "tp",
            "fp",
            "fn",
            prec.alias("precision_"),
            rec.alias("recall_"),
            f1.alias("f1"),
        )
        .orderBy("label")
    )


@query(
    "dup_cluster_size_histogram",
    oracle="""
    WITH RECURSIVE w AS (SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> length(x) > 0) AS ws
          FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                 for i in range(1, len(ws) - 1)]) AS s
           FROM w WHERE len(ws) >= 3),
    ix AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM ix a JOIN ix b ON a.g = b.g AND a.doc_id < b.doc_id),
    scored AS (SELECT c.id_a, c.id_b,
                      len(list_intersect(a.s, b.s))::DOUBLE AS inter,
                      len(a.s) AS la, len(b.s) AS lb
               FROM cand c
               JOIN sh a ON a.doc_id = c.id_a
               JOIN sh b ON b.doc_id = c.id_b),
    pairs AS (SELECT id_a, id_b FROM scored
              WHERE inter / (la + lb - inter) >= 0.8),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(s, t) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT r.s, e.b FROM reach r JOIN edges e ON r.t = e.a),
    comp AS (SELECT s AS doc_id, MIN(t) AS canonical FROM reach GROUP BY s),
    all_docs AS (
        SELECT d.doc_id, COALESCE(c.canonical, d.doc_id) AS canonical
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
    sizes AS (SELECT canonical, CAST(COUNT(*) AS BIGINT) AS sz
              FROM all_docs GROUP BY canonical)
    SELECT sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz) - COUNT(*) AS BIGINT) AS removable_docs
    FROM sizes GROUP BY sz ORDER BY cluster_size
    """,
)
def dup_cluster_size_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication profile: the histogram of near-dup cluster
    sizes (singletons included) — the one-page summary a dedup run
    reports: how many clusters of each size exist, how many documents
    they hold, and how many a keep-one policy would remove. Same
    MinHash-LSH → connected-components front as dedup_survivorship;
    the histogram is two tiny aggregates on the component map. The
    removable count is Σ(size−1) — the dedup yield estimate that
    decides whether the pipeline pays for itself."""
    d = tables(spark, sf_dir)["documents"]
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", k=3, num_hashes=32, bands=16, threshold=0.8
    )
    comp = connected_components_auto(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical")
    )
    all_docs = (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(F.coalesce("canonical", F.col("doc_id")).alias("canonical"))
    )
    sizes = all_docs.groupBy("canonical").agg(
        F.count("*").cast("long").alias("sz")
    )
    return (
        sizes.groupBy(F.col("sz").alias("cluster_size"))
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            (F.sum("sz") - F.count("*")).cast("long").alias("removable_docs"),
        )
        .orderBy("cluster_size")
    )


@query(
    "ship_latency_by_priority",
    oracle="""
    WITH d AS (
        SELECT o.o_orderpriority,
               CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS DOUBLE)
                   AS days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(days, 0.50), 4) AS p50_days,
           ROUND(quantile_cont(days, 0.90), 4) AS p90_days,
           CAST(MAX(days) AS BIGINT) AS max_days
    FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def ship_latency_by_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency quantiles per priority class — the
    operational SLA readout: does 1-URGENT actually ship faster?
    Integer day deltas (datediff on date columns, no timestamps) so
    the interpolated quantiles blend exact values; the fact-side join
    key is the only shuffle, and the orders side projects two columns
    before joining."""
    t = tables(spark, sf_dir)
    d = (
        t["lineitem"]
        .select("l_orderkey", "l_shipdate")
        .join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderpriority",
            F.datediff("l_shipdate", "o_orderdate").cast("double").alias("days"),
        )
    )
    return (
        d.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.expr("percentile(days, 0.50)"), 4).alias("p50_days"),
            F.round(F.expr("percentile(days, 0.90)"), 4).alias("p90_days"),
            F.max("days").cast("long").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )
