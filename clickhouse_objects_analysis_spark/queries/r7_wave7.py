"""Round-7 session-7 queries: hybrid-retrieval rank fusion, dedup
survivorship, triangle statistics, uniqUpTo, and the UNPIVOT surface.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; RRF + survivorship extend the
LLM-data-pipeline charter (SURVEY §7), triangle_stats extends the graph
surface past reachability, uniqUpTo is a ClickHouse aggregate
(`uniqUpTo(N)` — exact below N, N+1 above), and UNPIVOT completes the
PIVOT surface (pivot_event_types, windows.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.dedup import (
    connected_components_auto,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from ..operators.graph import triangle_stats
from ..operators.similarity import as_double
from .llm import _SCORED_CTE, _SHINGLE_CTE  # noqa: F401
from .registry import query, tables


@query(
    "rrf_hybrid_retrieval",
    oracle="""
    WITH w AS (SELECT doc_id,
                      unnest(list_filter(
                          string_split_regex(trim(text), '\\s+'),
                          x -> length(x) > 0)) AS w
               FROM documents),
    tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM w GROUP BY doc_id, w),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    dfreq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY w),
    qt AS (SELECT w, df FROM (
               SELECT w, df, row_number() OVER (ORDER BY df DESC, w) AS r
               FROM (SELECT w, df FROM dfreq
                     ORDER BY df DESC, w LIMIT 30))
           WHERE r IN (10, 20, 30)),
    lex AS (SELECT t.doc_id,
                   CAST(SUM(CAST(FLOOR(
                       t.tf * ln(CAST(n.n_docs AS DOUBLE) / q.df)
                       * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
            FROM tf t JOIN qt q ON t.w = q.w CROSS JOIN nd n
            GROUP BY t.doc_id),
    lexr AS (SELECT doc_id,
                    row_number() OVER (ORDER BY s DESC, doc_id) AS lex_rank
             FROM lex),
    qv AS (SELECT embedding::DOUBLE[] AS vq FROM embeddings
           WHERE vec_id = 0),
    dense AS (SELECT e.vec_id AS doc_id,
                     FLOOR(list_cosine_similarity(e.embedding::DOUBLE[],
                                                  q.vq) * 1e9 + 0.5) AS cn
              FROM embeddings e CROSS JOIN qv q),
    denser AS (SELECT doc_id,
                      row_number() OVER (ORDER BY cn DESC, doc_id)
                          AS dense_rank
               FROM dense),
    fused AS (
        SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
               CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
               CAST(COALESCE(d.dense_rank, 0) AS BIGINT) AS dense_rank,
               CAST(COALESCE(CAST(FLOOR(1e9 / (60 + l.lex_rank)) AS BIGINT), 0)
                    + COALESCE(CAST(FLOOR(1e9 / (60 + d.dense_rank)) AS BIGINT), 0)
                    AS BIGINT) AS rrf_nano
        FROM (SELECT * FROM lexr WHERE lex_rank <= 50) l
        FULL JOIN (SELECT * FROM denser WHERE dense_rank <= 50) d
          ON l.doc_id = d.doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lex_rank, dense_rank, rrf_nano
    FROM fused ORDER BY rrf_nano DESC, doc_id LIMIT 10
    """,
)
def rrf_hybrid_retrieval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (k=60) of a lexical and a dense retrieval
    list — the standard hybrid-search combiner: each ranking contributes
    1/(60+rank) and documents strong in EITHER modality surface. The
    lexical list is tf·idf over the same three data-derived query terms
    as bm25_retrieval (df ranks 10/20/30 — no literals baked in); the
    dense list is cosine against the vec_id=0 query embedding (doc_id
    and vec_id share an id space in the testdata). Both lists cut at
    rank 50, fused top-10 returned; rank 0 marks "absent from that
    list".

    Float parity: per-term lexical scores and per-doc cosines quantize
    to integer grids BEFORE ranking (tf·idf micro-units, cosine
    nano-units), and the RRF sum is an INTEGER sum of floor(1e9/(60+r))
    — two bounded integer adds, no order-dependent double accumulation
    anywhere past the single log/divide.

    Scale shape: the lexical side is the bm25 posting-list plan (3-term
    broadcast shrinks the tf stream before anything wide); the dense
    side broadcasts one query vector over a corpus that never shuffles;
    the fusion is a full outer join of two ≤50-row rank lists — a
    broadcast join regardless of corpus size. At 100 TB the global
    rank-50 cut becomes per-partition top-50 then a 50-row merge, which
    is exactly what Spark's TakeOrderedAndProject already does here."""
    d = tables(spark, sf_dir)["documents"]
    e = tables(spark, sf_dir)["embeddings"]
    words = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    tf = words.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qt = (
        dfreq.orderBy(F.desc("df"), "w")
        .limit(30)
        .withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc("df"), "w"))
        )
        .filter(F.col("r").isin(10, 20, 30))
        .select("w", "df")
    )
    s_micro = F.floor(
        F.col("tf")
        * F.log(F.col("n_docs").cast("double") / F.col("df"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    lex = (
        tf.join(F.broadcast(qt), "w")
        .crossJoin(F.broadcast(nd))
        .select("doc_id", s_micro.alias("sm"))
        .groupBy("doc_id")
        .agg(F.sum("sm").cast("long").alias("s"))
    )
    lexr = lex.withColumn(
        "lex_rank",
        F.row_number().over(Window.orderBy(F.desc("s"), "doc_id")),
    ).filter(F.col("lex_rank") <= 50)
    base = e.select(
        F.col("vec_id").cast("long").alias("doc_id"),
        as_double(F.col("embedding")).alias("v"),
    )
    qv = base.filter(F.col("doc_id") == 0).select(F.col("v").alias("vq"))
    dot = F.aggregate(
        F.zip_with("v", "vq", lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    )
    cn = F.floor(
        dot / (nrm(F.col("v")) * nrm(F.col("vq"))) * 1e9 + F.lit(0.5)
    ).cast("long")
    denser = (
        base.crossJoin(F.broadcast(qv))
        .select("doc_id", cn.alias("cn"))
        .withColumn(
            "dense_rank",
            F.row_number().over(Window.orderBy(F.desc("cn"), "doc_id")),
        )
        .filter(F.col("dense_rank") <= 50)
    )
    rr = lambda r: F.coalesce(  # noqa: E731
        F.floor(F.lit(1e9) / (F.lit(60) + r)).cast("long"), F.lit(0)
    )
    fused = (
        lexr.select("doc_id", "lex_rank")
        .join(denser.select("doc_id", "dense_rank"), "doc_id", "full_outer")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
            F.coalesce("dense_rank", F.lit(0)).cast("long").alias("dense_rank"),
            (rr(F.col("lex_rank")) + rr(F.col("dense_rank")))
            .cast("long")
            .alias("rrf_nano"),
        )
    )
    return fused.orderBy(F.desc("rrf_nano"), "doc_id").limit(10)


@query(
    "dedup_survivorship",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_CTE},
    {_SCORED_CTE},
    pairs AS (
      SELECT id_a, id_b FROM scored
      WHERE inter / (la + lb - inter) >= 0.8
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(s, t) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT r.s, e.b FROM reach r JOIN edges e ON r.t = e.a
    ),
    comp AS (SELECT s AS doc_id, MIN(t) AS canonical FROM reach GROUP BY s),
    full_map AS (
      SELECT d.doc_id, COALESCE(c.canonical, d.doc_id) AS canonical,
             d.n_chars
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
    ranked AS (
      SELECT doc_id, canonical, n_chars,
             CAST(COUNT(*) OVER (PARTITION BY canonical) AS BIGINT)
                 AS cluster_size,
             first_value(doc_id) OVER (
                 PARTITION BY canonical
                 ORDER BY n_chars DESC, doc_id) AS survivor_id
      FROM full_map)
    SELECT doc_id, canonical, cluster_size,
           CAST(survivor_id AS BIGINT) AS survivor_id,
           (doc_id = survivor_id) AS keep
    FROM ranked ORDER BY canonical, doc_id
    """,
)
def dedup_survivorship_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship — the curation decision AFTER clustering: every
    document (singletons included, unlike dedup_clusters which reports
    only clustered nodes) is mapped to its near-dup cluster, and the
    cluster's best-quality member (max n_chars, ties to the lower
    doc_id) is elected survivor; `keep` is the final emit/drop bit a
    dedup pipeline writes out. Survivor-by-quality differs from
    dedup_clusters' min-id canonical label on purpose — the label is a
    cluster NAME, the survivor is a QUALITY choice.

    Scale shape: MinHash-LSH pairs → auto-selected connected
    components (both O(log n)-round); the singleton completion is a
    LEFT join from the corpus to the component map (clustered nodes ≪
    corpus, AQE broadcasts the map); survivor election is one window
    over clusters whose size is bounded by the dedup clusters
    themselves, never the corpus."""
    d = tables(spark, sf_dir)["documents"]
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", k=3, num_hashes=32, bands=16, threshold=0.8
    )
    comp = connected_components_auto(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical")
    )
    full_map = (
        d.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("canonical", F.col("doc_id")).alias("canonical"),
            "n_chars",
        )
    )
    w = Window.partitionBy("canonical")
    elect = Window.partitionBy("canonical").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        full_map.withColumn(
            "cluster_size", F.count(F.lit(1)).over(w).cast("long")
        )
        .withColumn(
            "survivor_id", F.first("doc_id").over(elect).cast("long")
        )
        .select(
            "doc_id",
            "canonical",
            "cluster_size",
            "survivor_id",
            (F.col("doc_id") == F.col("survivor_id")).alias("keep"),
        )
        .orderBy("canonical", "doc_id")
    )


@query(
    "neardup_graph_triangles",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_SCORED_CTE},
    pairs AS (
      SELECT id_a AS u, id_b AS v FROM scored
      WHERE inter / (la + lb - inter) >= 0.5),
    deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
              SELECT u AS n FROM pairs
              UNION ALL SELECT v FROM pairs) GROUP BY n),
    tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM pairs e1
            JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v)
    SELECT CAST(COUNT(*) AS BIGINT)                       AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs)   AS n_edges,
           (SELECT t FROM tri)                            AS n_triangles,
           CAST(SUM(d * (d - 1) / 2) AS BIGINT)           AS n_wedges,
           ROUND(3.0 * (SELECT t FROM tri)
                 / SUM(d * (d - 1) / 2), 6)               AS global_clustering
    FROM deg
    """,
)
def neardup_graph_triangles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient of the
    near-duplicate similarity graph (edge = word-trigram Jaccard ≥ 0.5)
    — the transitivity audit of the dedup stack: clustering near 1
    means "A~B and B~C implies A~C" holds and connected components are
    safe as dedup clusters; low clustering warns that the threshold
    chains unlike documents together. Spark side runs the
    degree-ORIENTED algorithm (operators/graph.py): every wedge is
    generated only at its minimum-(degree,id) apex and closed with one
    join, bounding the candidate stream by O(m^1.5) regardless of skew;
    the oracle recomputes via the naive a<b<c triple join, so the two
    engines agree only if the orientation logic counts every triangle
    exactly once. (An earlier revision ran this on the supplier
    co-order graph — 90% dense on the testdata, making EXACT triangle
    counting inherently ~|V|³ work with nothing to optimize; the
    similarity graph is the sparse, semantically-motivated instance.)
    The clustering coefficient is one double division of two exact
    integers — no accumulation-order exposure."""
    d = tables(spark, sf_dir)["documents"]
    edges = ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.5)
    return triangle_stats(edges, "id_a", "id_b")


@query(
    "uniq_upto_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)             AS n_exact,
           CAST(LEAST(COUNT(DISTINCT user_id), 101) AS BIGINT) AS uniq_upto_100,
           CAST(LEAST(COUNT(DISTINCT user_id), 201) AS BIGINT) AS uniq_upto_200
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def uniq_upto_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `uniqUpTo(N)(x)`: exact distinct count while it is
    ≤ N, the sentinel N+1 once it exceeds N — the "is this column
    low-cardinality?" probe that never keeps more than N+1 states per
    group. Algebraically uniqUpTo(N) ≡ LEAST(countDistinct, N+1)
    (count > N ⟺ count ≥ N+1), which is how both engines compute it;
    two thresholds exercise both regimes against the testdata's 150
    users per type (100 → capped at 101, 200 → exact 150).

    100 TB note: Spark's count-distinct here is the generic two-phase
    expand; a state-bounded uniqUpTo would cap per-group state at N+1
    entries map-side — for N ≤ a few hundred the partial-aggregate
    hash set is already ≤ N+1 per group after local distinct, so the
    built-in plan matches the CH state bound up to constants."""
    ev = tables(spark, sf_dir)["events"]
    cd = F.countDistinct("user_id").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            cd.alias("n_exact"),
            F.least(cd, F.lit(101)).cast("long").alias("uniq_upto_100"),
            F.least(cd, F.lit(201)).cast("long").alias("uniq_upto_200"),
        )
        .orderBy("event_type")
    )


@query(
    "unpivot_lineitem_metrics",
    oracle="""
    WITH u AS (
      SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
    SELECT l_returnflag, metric,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(val * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           ROUND(SUM(CAST(FLOOR(val * 100 + 0.5) AS BIGINT))
                 / COUNT(*) / 100.0, 4) AS avg_value
    FROM u GROUP BY l_returnflag, metric
    ORDER BY l_returnflag, metric
    """,
)
def unpivot_lineitem_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT surface — the inverse of pivot_event_types: melt four
    lineitem measures into (metric, value) rows via DataFrame.unpivot
    (Catalyst Expand, one pass over the scan — NOT four self-unions)
    and aggregate per (returnflag, metric). Cents are integer-exact
    before the sum, so the per-metric averages are one deterministic
    division. The oracle unions four selects because DuckDB's UNPIVOT
    aliases column names differently; values agree regardless of melt
    mechanics. Scale: Expand multiplies rows 4× map-side but reads the
    parquet once with only the five referenced columns."""
    li = tables(spark, sf_dir)["lineitem"]
    melted = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    cents = F.floor(F.col("val") * 100 + F.lit(0.5)).cast("long")
    return (
        melted.select("l_returnflag", "metric", cents.alias("cents"))
        .groupBy("l_returnflag", "metric")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.round(
                F.sum("cents") / F.count(F.lit(1)) / F.lit(100.0), 4
            ).alias("avg_value"),
        )
        .orderBy("l_returnflag", "metric")
    )
