"""Fourth wave of LLM-training-pipeline operators: Gopher-style
heuristic quality rules, token-length histograms, a unigram-LM
perplexity proxy, kNN label classification over embeddings, and
semantic (embedding-space) deduplication.

Same contract as llm_extras / llm_wave3: each op is a ``queries()``
entry with a DuckDB oracle over the synthetic ``documents`` /
``embeddings`` tables, and every float that reaches the value hash is
either a single IEEE division of integer aggregates, or an explicit
left fold over a numerically sorted list so both engines add doubles in
the identical order (the char_entropy_quality discipline).

Scale shapes (100 TB story, per query, details in docstrings): one
explode + map-side-combined aggregate per text op; vocabulary-sized
broadcast joins; block-nested BLAS matmuls for embedding ops (driver
never holds the corpus); O(log n) star-contraction components for
semantic dedup clusters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.dedup import connected_components_auto
from ..operators.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_candidate_pairs,
)
from .registry import query, tables

#: Stopword set for the Gopher-style rule. The synthetic corpus draws
#: from a small systems vocabulary in which "a" and "the" play the
#: function-word role; real corpora would use the usual 20-50 word list.
_STOPWORDS = ("a", "the", "and", "of", "to", "in")

_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@query(
    "gopher_quality_rules",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
    agg AS (SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(length(w)) AS BIGINT) AS n_word_chars,
                   CAST(COUNT(DISTINCT CASE WHEN w IN ({_STOP_SQL})
                                            THEN w END) AS BIGINT)
                       AS n_stopwords
            FROM w GROUP BY doc_id)
    SELECT doc_id, n_words, n_word_chars, n_stopwords,
           ROUND(CAST(n_word_chars AS DOUBLE) / n_words, 6)
               AS mean_word_len,
           CAST(CASE WHEN n_words BETWEEN 10 AND 100000
                THEN 1 ELSE 0 END AS INT) AS r_word_count,
           CAST(CASE WHEN CAST(n_word_chars AS DOUBLE) / n_words
                          BETWEEN 3.0 AND 10.0
                THEN 1 ELSE 0 END AS INT) AS r_mean_word_len,
           CAST(CASE WHEN n_stopwords >= 2 THEN 1 ELSE 0 END AS INT)
               AS r_stopwords,
           CAST(CASE WHEN n_words BETWEEN 10 AND 100000
                      AND CAST(n_word_chars AS DOUBLE) / n_words
                          BETWEEN 3.0 AND 10.0
                      AND n_stopwords >= 2
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM agg ORDER BY doc_id
    """,
)
def gopher_quality_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality filter (Rae et al. 2021 §A1.1
    repertoire): word-count bounds, mean-word-length band, and minimum
    distinct-stopword presence, emitted as 0/1 INT rule columns plus the
    conjunctive ``keep`` verdict.

    Float-parity: mean_word_len is ONE double division of two integer
    aggregates — IEEE-exact on both engines — and every rule compares
    that same quantity, so rule flags can't straddle engines.

    Scale shape: explode + one map-side-combined groupBy(doc_id); the
    word stream never shuffles wider than (doc_id, 3 ints). At 100 TB
    this is the embarrassingly-parallel scan+agg you want — no joins,
    no windows, no Python."""
    d = tables(spark, sf_dir)["documents"]
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    agg = w.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("w")).alias("n_word_chars"),
        F.count_distinct(
            F.when(F.col("w").isin(*_STOPWORDS), F.col("w"))
        ).alias("n_stopwords"),
    )
    mwl = F.col("n_word_chars").cast("double") / F.col("n_words")
    r_wc = F.col("n_words").between(10, 100000)
    r_mwl = (mwl >= 3.0) & (mwl <= 10.0)
    r_stop = F.col("n_stopwords") >= 2
    as_int = lambda c: F.when(c, 1).otherwise(0).cast("int")  # noqa: E731
    return agg.select(
        "doc_id",
        "n_words",
        "n_word_chars",
        "n_stopwords",
        F.round(mwl, 6).alias("mean_word_len"),
        as_int(r_wc).alias("r_word_count"),
        as_int(r_mwl).alias("r_mean_word_len"),
        as_int(r_stop).alias("r_stopwords"),
        as_int(r_wc & r_mwl & r_stop).alias("keep"),
    ).orderBy("doc_id")


@query(
    "token_length_histogram",
    oracle="""
    WITH w AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT)
                          AS n_words
               FROM documents),
    b AS (SELECT CAST(n_words // 10 * 10 AS BIGINT) AS bucket_lo,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(MIN(n_words) AS BIGINT) AS min_words,
                 CAST(MAX(n_words) AS BIGINT) AS max_words
          FROM w GROUP BY 1)
    SELECT bucket_lo, n_docs, min_words, max_words,
           ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6)
               AS share
    FROM b ORDER BY bucket_lo
    """,
)
def token_length_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram over the corpus (fixed-width 10-token
    buckets) — the sequence-length profile a packing/curriculum stage
    reads first, and the ClickHouse ``histogram()`` analogue expressed
    relationally.

    Float-parity: share = n_docs / total via one double division of
    integer aggregates (the window SUM is an exact integer).

    Scale shape: one scan, one tiny groupBy (bucket count is bounded by
    max_doc_len/10), one single-partition window over that bounded
    bucket table — the only single-point stage touches dozens of rows,
    never the corpus."""
    d = tables(spark, sf_dir)["documents"]
    w = d.select(
        F.size(F.split("text", " ")).cast("long").alias("n_words")
    )
    b = w.groupBy(
        (F.floor(F.col("n_words") / 10) * 10).cast("long").alias("bucket_lo")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_words").alias("min_words"),
        F.max("n_words").alias("max_words"),
    )
    share = F.col("n_docs").cast("double") / F.sum("n_docs").over(
        Window.partitionBy()
    )
    return b.select(
        "bucket_lo",
        "n_docs",
        "min_words",
        "max_words",
        F.round(share, 6).alias("share"),
    ).orderBy("bucket_lo")


@query(
    "unigram_logprob_quality",
    oracle="""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
    f AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wc FROM w GROUP BY w),
    t AS (SELECT CAST(SUM(wc) AS BIGINT) AS total FROM f),
    p AS (SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_words,
                 list_sort(list(wc)) AS wcs
          FROM w JOIN f USING (w) GROUP BY doc_id)
    SELECT doc_id, n_words,
           ROUND(ln(total)
                 - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(wcs, x -> ln(x))),
                       (a, b) -> a + b) / n_words, 6) AS mean_nll,
           CAST(CASE WHEN ln(total)
                          - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list_transform(wcs, x -> ln(x))),
                                (a, b) -> a + b) / n_words > 3.6
                THEN 1 ELSE 0 END AS INT) AS high_surprise
    FROM p, t ORDER BY doc_id
    """,
)
def unigram_logprob_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy — the cheap stand-in for the KenLM
    quality score used by CCNet-style pipelines: per-document mean
    negative log-probability under the corpus's own unigram
    distribution. mean_nll = ln(total) - (1/n) * sum(ln(count(w_i)));
    high values mean rare-word-heavy (surprising) documents.

    Float-parity: every ln() argument is an INTEGER count (the
    char_entropy discipline) and the per-doc sum is an explicit left
    fold over the numerically sorted count list on both engines, so the
    double additions happen in identical order.

    Scale shape: the unigram table is vocabulary-sized → broadcast join
    onto the exploded word stream; one groupBy(doc_id) collecting a
    doc-length-bounded list; the corpus-total is a 1-row broadcast
    cross join, not a driver scalar."""
    d = tables(spark, sf_dir)["documents"]
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    # Shared front (SCALE.md rule): the unigram table feeds BOTH the
    # broadcast join and the corpus-total — checkpoint it once or the
    # corpus-wide word count runs twice.
    f = (
        w.groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .localCheckpoint(eager=False)
    )
    t = f.agg(F.sum("wc").alias("total"))
    p = (
        w.join(F.broadcast(f), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sort_array(F.collect_list("wc")).alias("wcs"),
        )
    )
    nll = F.log(F.col("total").cast("double")) - F.aggregate(
        F.col("wcs"),
        F.lit(0.0),
        lambda a, x: a + F.log(x.cast("double")),
    ) / F.col("n_words")
    return (
        p.crossJoin(F.broadcast(t))
        .select(
            "doc_id",
            "n_words",
            F.round(nll, 6).alias("mean_nll"),
            F.when(nll > 3.6, 1).otherwise(0).cast("int").alias(
                "high_surprise"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "knn_classify",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS vq FROM e WHERE vec_id < 20),
    c AS (SELECT vec_id, v, label FROM e WHERE vec_id >= 20),
    scored AS (
        SELECT q.query_id, c.vec_id AS corpus_id, c.label,
               FLOOR(list_cosine_similarity(q.vq, c.v) * 1e9 + 0.5) / 1e9
                   AS cos
        FROM q JOIN c ON TRUE
    ),
    ranked AS (
        SELECT query_id, label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, corpus_id) AS rank
        FROM scored
    ),
    votes AS (
        SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS votes
        FROM ranked WHERE rank <= 10 GROUP BY query_id, label
    ),
    best AS (
        SELECT query_id, label AS pred_label, votes,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY votes DESC, label) AS vr
        FROM votes
    )
    SELECT query_id, CAST(pred_label AS INT) AS pred_label, votes
    FROM best WHERE vr = 1 ORDER BY query_id
    """,
)
def knn_classify_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote label classification over the embedding
    corpus — the weak-labeling / label-propagation primitive of a
    curation pipeline (classify unlabeled docs by their nearest labeled
    neighbors). k=10 cosine neighbors per query vector, majority label,
    ties broken toward the smaller label id.

    Scale shape: reuses operators.similarity.cosine_topk — queries
    broadcast as a dense matrix, corpus streams through one BLAS matmul
    per Arrow batch, map-side partial top-k; only (query, label) pairs
    reach the vote aggregation. The vote itself is integer-exact."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 20)
    corpus = e.filter(F.col("vec_id") >= 20)
    topk = cosine_topk(corpus, q, "vec_id", "embedding", k=10)
    labels = corpus.select(
        F.col("vec_id").alias("corpus_id"), "label"
    )
    votes = (
        topk.join(F.broadcast(labels), "corpus_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("label").cast("int").alias("pred_label"),
            "votes",
        )
        .orderBy("query_id")
    )


@query(
    "semantic_dedup",
    oracle="""
    WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                         FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(s, t) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT r.s, e2.b FROM reach r JOIN edges e2 ON r.t = e2.a
    ),
    comp AS (SELECT s AS vec_id, MIN(t) AS canonical
             FROM reach GROUP BY s),
    lab AS (
        SELECT e.vec_id,
               COALESCE(comp.canonical, e.vec_id) AS canonical
        FROM e LEFT JOIN comp ON e.vec_id = comp.vec_id
    )
    SELECT vec_id, canonical,
           CAST(COUNT(*) OVER (PARTITION BY canonical) AS BIGINT)
               AS cluster_size,
           CAST(CASE WHEN vec_id = canonical THEN 1 ELSE 0 END AS INT)
               AS keep
    FROM lab ORDER BY vec_id
    """,
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDeDup-style, Abbas et al. 2023, at
    the exact-pairs baseline): embedding pairs with cosine >= 0.4 (this
    synthetic corpus is near-random — real near-dup corpora use ~0.95)
    are clustered with O(log n) star-contraction connected components;
    each cluster keeps its minimum vec_id. Output is the full corpus
    labeling (canonical id, cluster size, keep flag) — the oracle
    recomputes components via a recursive reachability CTE over the
    exact all-pairs graph.

    Scale shape (r8 verdict #7): pair generation gates on corpus size —
    at or below _BRUTE_GATE vectors (covers the sf0.01 oracle point, so
    the parity hash is untouched) the exact block-nested BLAS path runs
    (cosine_pairs); above it the registered query IS the IVF candidate
    path (ivf_candidate_pairs — adaptive centroids, constant cell size,
    linear pair work; recall gated separately by semantic_dedup_ivf).
    Components contract in O(log n) rounds; the final labeling is one
    broadcast join of the (small) non-singleton component map onto the
    corpus."""
    e = tables(spark, sf_dir)["embeddings"]
    if e.count() <= _BRUTE_GATE:
        pairs = cosine_pairs(e, "vec_id", "embedding", threshold=0.4)
    else:
        pairs = ivf_candidate_pairs(e, "vec_id", "embedding", threshold=0.4)
    return _dedup_labels(e, pairs)


#: Brute-force gate for semantic_dedup: the exact O(n²) pair scan runs
#: only at or below this corpus size; bigger corpora take the IVF
#: candidate path — the 100 TB shape. Chosen from measurement, not
#: vibes: at 2k vectors (sf0.1) one BLAS block scan is 3.7 s vs the IVF
#: path's ~6 s (k-means train + python-stage fixed costs dominate), at
#: 20k (sf1) the exponent-0.93 brute scan loses decisively. The sf0.01
#: (500) and sf0.1 (2000) oracle/bench points stay on the exact path,
#: so parity hashes and the sf0.1 bench are unchanged.
_BRUTE_GATE = 4096


def _dedup_labels(e: DataFrame, pairs: DataFrame) -> DataFrame:
    """Shared SemDeDup tail: connected components over a pair set, then
    one broadcast join of the (small) non-singleton component map onto
    the corpus for (canonical, cluster_size, keep). Components route
    through connected_components_auto (r12): a sub-gate pair set (the
    sf0.1 dedup graph is 920 edges) resolves by driver union-find
    instead of paying ~3 s of distributed alternation/probe jobs;
    bigger graphs take the density-routed distributed paths."""
    comp = connected_components_auto(pairs, "id_a", "id_b")
    lab = e.select("vec_id").join(
        F.broadcast(
            comp.select(
                F.col("node").alias("vec_id"),
                F.col("component").alias("comp"),
            )
        ),
        "vec_id",
        "left",
    ).select(
        "vec_id",
        F.coalesce(F.col("comp"), F.col("vec_id")).alias("canonical"),
    )
    w = Window.partitionBy("canonical")
    return (
        lab.withColumn(
            "cluster_size", F.count(F.lit(1)).over(w).cast("long")
        )
        .withColumn(
            "keep",
            F.when(F.col("vec_id") == F.col("canonical"), 1)
            .otherwise(0)
            .cast("int"),
        )
        .orderBy("vec_id")
    )


def semantic_dedup_ivf_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF dedup pipeline end-to-end WITHOUT the exact-baseline
    comparison — what actually runs at 100 TB, and what the scaling
    sweep times (the registry's ``semantic_dedup_ivf`` gate query also
    builds the quadratic exact pair set to assert recall, which would
    drown the IVF path's exponent in brute-force time)."""
    e = tables(spark, sf_dir)["embeddings"]
    pairs = ivf_candidate_pairs(e, "vec_id", "embedding", threshold=0.4)
    return _dedup_labels(e, pairs)


@query(
    "semantic_dedup_ivf",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           TRUE AS pair_recall_ok,
           TRUE AS no_false_pairs
    FROM embeddings
    """,
)
def semantic_dedup_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup's 100 TB candidate path, executable (r6 verdict
    directive #4): the same SemDeDup pair set, generated by the
    IVF-bucketed ``ivf_candidate_pairs`` (adaptive centroid count →
    constant cell size → LINEAR total pair work) instead of the exact
    quadratic block-nested scan.

    The candidate algorithm is not SQL-expressible, but with the seeded
    deterministic k-means the achieved pair recall is a fixed number, so
    — exactly like the ann_lsh/ann_ivf recall gates — the output is a
    deterministic gate row vs the exact ``cosine_pairs`` ground truth:
    measured recall 1.0 / 1.0 / 0.872 at sf0.001/0.01/0.1 (gate at
    mean ≥ 0.8), and precision is 1.0 by construction (candidates are
    exact-verified), asserted as no_false_pairs."""
    e = tables(spark, sf_dir)["embeddings"]
    exact = cosine_pairs(e, "vec_id", "embedding", threshold=0.4).select(
        "id_a", "id_b"
    )
    approx = ivf_candidate_pairs(
        e, "vec_id", "embedding", threshold=0.4
    ).select("id_a", "id_b")
    hits = exact.join(approx, ["id_a", "id_b"], "left_semi")
    false_p = approx.join(exact, ["id_a", "id_b"], "left_anti")
    return (
        e.agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_exact")))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hit")))
        .crossJoin(false_p.agg(F.count(F.lit(1)).alias("n_false")))
        .select(
            "n_vectors",
            (
                F.col("n_hit") / F.greatest(F.col("n_exact"), F.lit(1))
                >= F.lit(0.8)
            ).alias("pair_recall_ok"),
            (F.col("n_false") == 0).alias("no_false_pairs"),
        )
    )
