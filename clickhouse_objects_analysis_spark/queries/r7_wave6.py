"""Round-7 session-6 queries: bigram-LM quality scoring, label-aware
hard-negative mining, and directional containment dedup.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has no LM-scoring or embedding surface; these extend the
LLM-data-pipeline charter (SURVEY §7 north star). The bigram LM is the
CCNet-style corpus-perplexity quality filter one notch up from the
registry's `unigram_logprob_quality`; hard-negative mining is the
contrastive-training data-prep step over the `embeddings` table; and
containment is the asymmetric near-dup that catches quote/subset
duplication symmetric Jaccard misses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.dedup import containment_pairs
from ..operators.similarity import as_double
from .llm import _SHINGLE_CTE
from .registry import query, tables


def _ln_fold(col: str) -> F.Column:
    """Left fold of ln() over a numerically sorted integer list — the
    float-parity discipline from unigram_logprob_quality: every ln()
    argument is an integer count and both engines add the doubles in
    the same (sorted) order, so the sums agree bit-for-bit."""
    return F.aggregate(
        F.col(col), F.lit(0.0), lambda a, x: a + F.log(x.cast("double"))
    )


_LN_FOLD_SQL = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform({col}, x -> ln(x))), (a, b) -> a + b)"
)


@query(
    "bigram_lm_cross_entropy",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ws
                FROM documents),
    b2 AS (SELECT doc_id, z[1] AS w1, z[2] AS w2
           FROM (SELECT doc_id,
                        unnest(list_zip(ws[1:len(ws) - 1],
                                        ws[2:len(ws)])) AS z
                 FROM tk WHERE len(ws) >= 2)),
    vv AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
           FROM (SELECT unnest(ws) AS w FROM tk)),
    uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
            FROM b2 GROUP BY w1),
    big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM b2 GROUP BY w1, w2),
    p AS (SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 list_sort(list(c1 + v)) AS l1,
                 list_sort(list(c12 + 1)) AS l2
          FROM b2
          JOIN uni ON b2.w1 = uni.w1
          JOIN big ON b2.w1 = big.w1 AND b2.w2 = big.w2
          CROSS JOIN vv
          GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           ROUND(({_LN_FOLD_SQL.format(col="l1")}
                  - {_LN_FOLD_SQL.format(col="l2")}) / n_bigrams, 6)
               AS mean_nll
    FROM p ORDER BY doc_id
    """,
)
def bigram_lm_cross_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram-LM cross-entropy per document — the
    CCNet/KenLM-style quality score one order up from the registry's
    unigram proxy: mean over the doc's bigrams of
    -ln((c(w1,w2) + 1) / (c(w1) + V)), where c(w1) counts w1 as a
    bigram head and V is the corpus vocabulary. High values flag
    incoherent (word-salad) documents whose word PAIRS are rare even
    when the words themselves are common — exactly what the unigram
    score cannot see.

    Float parity: the per-doc sum is split into Σln(c1+V) − Σln(c12+1),
    each an explicit left fold over the numerically SORTED integer list
    on both engines (the unigram_logprob_quality discipline), so the
    double additions happen in identical order and the 6-digit round
    never straddles an ulp.

    Scale shape: bigrams are formed map-side from the token array
    (arrays_zip of two slices — no positional window, no extra
    shuffle). The unigram (head-count) table is vocabulary-sized →
    broadcast onto the bigram stream; the bigram-count table grows with
    the corpus → plain shuffle join on (w1, w2), the same key the
    stream already groups on. One groupBy(doc_id) collects the two
    doc-length-bounded lists; V is a 1-row broadcast cross join, never
    a driver scalar."""
    d = tables(spark, sf_dir)["documents"]
    tk = d.select("doc_id", F.split("text", " ").alias("ws"))
    n = F.size("ws")
    # Shared front (SCALE.md rule): the bigram stream feeds the two
    # count tables AND the per-doc join — checkpoint it once or the
    # split/zip/explode front runs three times.
    b2 = (
        tk.filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("ws", 1, n - 1).alias("w1"),
                    F.slice("ws", 2, n - 1).alias("w2"),
                )
            ).alias("z"),
        )
        .select("doc_id", F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
        .localCheckpoint(eager=False)
    )
    vv = (
        tk.select(F.explode("ws").alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    uni = b2.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    big = b2.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    p = (
        b2.join(F.broadcast(uni), "w1")
        .join(big, ["w1", "w2"])
        .crossJoin(F.broadcast(vv))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sort_array(F.collect_list(F.col("c1") + F.col("v"))).alias("l1"),
            F.sort_array(F.collect_list(F.col("c12") + F.lit(1))).alias("l2"),
        )
    )
    nll = (_ln_fold("l1") - _ln_fold("l2")) / F.col("n_bigrams")
    return p.select(
        "doc_id", "n_bigrams", F.round(nll, 6).alias("mean_nll")
    ).orderBy("doc_id")


@query(
    "hard_negative_mining",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS vq, label AS ql
          FROM e WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, e.vec_id AS corpus_id, e.label AS neg_label,
               FLOOR(list_cosine_similarity(q.vq, e.v) * 1e9 + 0.5) / 1e9
                   AS cos
        FROM q JOIN e ON e.label <> q.ql
    ),
    ranked AS (
        SELECT query_id, corpus_id, neg_label, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, corpus_id) AS rank
        FROM scored
    )
    SELECT query_id, corpus_id, CAST(neg_label AS BIGINT) AS neg_label,
           ROUND(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def hard_negative_mining_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each of 10
    query vectors, the top-5 most-cosine-similar corpus vectors whose
    LABEL differs from the query's — the near-miss examples a
    contrastive loss learns the most from (same-label neighbors are
    positives, not negatives, so the label filter is part of the
    semantics, not an optimization).

    Plan shape: the 10-row query side is broadcast and the label
    mismatch is the join predicate, so Spark plans a
    BroadcastNestedLoopJoin — corpus streams once map-side against a
    tiny in-memory matrix, which IS the designed brute-force scorer
    (the same corpus-never-shuffles contract as cosine_topk's matmul
    path; at 100 TB the candidate generation routes through the IVF
    index exactly as knn_classify documents, with the label filter
    applied to candidates). The 64-dim dot product runs in whole-stage
    codegen via zip_with/aggregate — no Python in the hot path. Cosines
    are quantized to a 1e-9 grid BEFORE ranking on both engines so an
    ulp-level sum disagreement cannot flip the rank-5 boundary."""
    e = tables(spark, sf_dir)["embeddings"]
    base = e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        as_double(F.col("embedding")).alias("v"),
        F.col("label").cast("long").alias("label"),
    )
    sq_norm = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda a, x: a + x * x
    )
    qs = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("vq"),
        F.col("label").alias("ql"),
    )
    joined = base.join(F.broadcast(qs), F.col("label") != F.col("ql"))
    dot = F.aggregate(
        F.zip_with("v", "vq", lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cos = dot / (F.sqrt(sq_norm(F.col("v"))) * F.sqrt(sq_norm(F.col("vq"))))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("corpus_id"),
        F.col("label").alias("neg_label"),
        (F.floor(cos * 1e9 + F.lit(0.5)) / 1e9).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "corpus_id",
            "neg_label",
            F.round("cos", 4).alias("cos"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


@query(
    "containment_overlap_pairs",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    ix0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
    stop AS (SELECT g FROM ix0 GROUP BY g HAVING COUNT(*) > 64),
    ix AS (SELECT * FROM ix0 WHERE g NOT IN (SELECT g FROM stop)),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(COUNT(*) AS DOUBLE) AS inter
              FROM ix a JOIN ix b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    scored AS (SELECT i.id_a, i.id_b, i.inter,
                      len(sa.s) AS la, len(sb.s) AS lb
               FROM inter i
               JOIN sh sa ON sa.doc_id = i.id_a
               JOIN sh sb ON sb.doc_id = i.id_b)
    SELECT contained_id, container_id, containment FROM (
        SELECT id_a AS contained_id, id_b AS container_id,
               ROUND(inter / la, 4) AS containment
        FROM scored WHERE inter / la >= 0.6
        UNION ALL
        SELECT id_b AS contained_id, id_a AS container_id,
               ROUND(inter / lb, 4) AS containment
        FROM scored WHERE inter / lb >= 0.6
    ) ORDER BY contained_id, container_id
    """,
)
def containment_overlap_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment near-dup pairs at C ≥ 0.6 over distinct
    word trigrams: C(A→B) = |A∩B|/|A| flags documents mostly CONTAINED
    in another (quotes, excerpts, subset pages) that symmetric Jaccard
    misses whenever the container is much longer than the contained
    doc. Same inverted-shingle-index plan as ngram_jaccard_pairs — one
    a<b pair join, one intersection count, two codegen ratio
    projections; the oracle replays the identical index (stop-gram cap
    included) so a missed candidate cannot hash-match.

    max_df=64 caps posting lists: the round-7 sf1→sf10 sweep measured
    the UNCAPPED run at exponent 1.214 (5.8 s → 94.6 s) because
    replicated corpora grow every shingle's df linearly and the pair
    stream as Σ C(df,2) — quadratically. The cap bounds every posting
    list (≤ C(64,2) pair instances per shingle) and never binds at the
    correctness scale (max trigram df at sf0.01 is 7), so reported
    containment is unchanged there and a documented lower bound past
    the cap — the ngram_jaccard max_df semantics."""
    d = tables(spark, sf_dir)["documents"]
    # Lazy checkpoint before the global sort (r15): the range
    # exchange's boundary-sampling job re-executed the pair-join map
    # stage — A/B at sf30: shipped 110.1/123.3 s vs checkpointed
    # 81.4/92.5 s (~1.3x); wash at sf0.1 (1.67 vs 1.70 min-of-5).
    return (
        containment_pairs(
            d, "doc_id", "text", k=3, threshold=0.6, max_df=64
        )
        .localCheckpoint(eager=False)
        .orderBy("contained_id", "container_id")
    )
