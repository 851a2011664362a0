"""Round-7 session-15 queries: char-gram Jaccard dedup, k-anonymity
audit, and per-label embedding outliers.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; char-gram Jaccard adds the
whitespace-robust axis to the dedup stack (word-gram Jaccard, MinHash,
SimHash, containment already registered), k-anonymity is the privacy
audit a dataset release pipeline runs next to pii_scrub, and label
outliers are the mislabel detector complementing knn_classify /
SemDeDup on the embeddings table."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.dedup import char_ngram_jaccard_pairs
from .registry import query, tables


@query(
    "char_ngram_jaccard_pairs",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               list_distinct([substr(text, i, 5)
                              for i in range(1, length(text) - 3)]) AS sh
        FROM documents WHERE length(text) >= 5),
    ix0 AS (SELECT doc_id, unnest(sh) AS g FROM s),
    stop AS (SELECT g FROM ix0 GROUP BY g HAVING COUNT(*) > 200),
    ix AS (SELECT * FROM ix0 WHERE g NOT IN (SELECT g FROM stop)),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS DOUBLE) AS inter
        FROM ix a JOIN ix b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    sz AS (SELECT doc_id, len(sh) AS sz FROM s)
    SELECT id_a, id_b,
           ROUND(inter / (sa.sz + sb.sz - inter), 4) AS jacc
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def char_ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by CHARACTER 5-gram Jaccard (J ≥ 0.5, stop-gram
    cap df > 200) — the whitespace-robust dedup axis: char shingles
    survive reflowed spacing, hyphenation, and glued tokens that break
    every word-gram signature. Same inverted-index plan and Σ C(df,2)
    bound as ngram_jaccard_pairs via the shared jaccard_pairs_from_sets
    tail; char grams have intrinsically high df, so the max_df cap
    (documented lower-bound semantics — capped grams can't vote for
    intersections, denominators stay full) is mandatory rather than
    optional at scale. The oracle rebuilds the identical capped index
    in SQL, so a candidate missed by the cap logic cannot
    hash-match."""
    d = tables(spark, sf_dir)["documents"]
    # Lazy checkpoint before the global sort — see ngram_jaccard_pairs
    return (
        char_ngram_jaccard_pairs(
            d, "doc_id", "text", k=5, threshold=0.5, max_df=200
        )
        .localCheckpoint(eager=False)
        .orderBy("id_a", "id_b")
    )


@query(
    "k_anonymity_audit",
    oracle="""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS grp_sz
        FROM customer GROUP BY 1, 2),
    ks AS (SELECT unnest([2, 5, 10]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(COUNT(*) FILTER (WHERE g.grp_sz < ks.k) AS BIGINT)
               AS groups_below_k,
           CAST(COALESCE(SUM(g.grp_sz) FILTER (WHERE g.grp_sz < ks.k), 0)
                AS BIGINT) AS rows_at_risk,
           CAST(MIN(g.grp_sz) AS BIGINT) AS min_group,
           CAST(COUNT(*) AS BIGINT) AS n_groups
    FROM ks CROSS JOIN g
    GROUP BY ks.k ORDER BY k
    """,
)
def k_anonymity_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (nation, market segment): for k ∈ {2, 5, 10}, how many
    quasi-identifier groups fall below k members and how many rows
    those groups expose — the privacy gate a dataset release runs
    after pii_scrub (a group of size 1 re-identifies its member even
    with direct identifiers scrubbed). One groupBy builds the group
    histogram (bounded by the quasi-ID domain, tiny), then the k sweep
    is a broadcast cross join over 3 literals — raw table volume
    touches only the first aggregate."""
    c = tables(spark, sf_dir)["customer"]
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("grp_sz")
    )
    ks = spark.createDataFrame([(2,), (5,), (10,)], "k long")
    below = F.col("grp_sz") < F.col("k")
    return (
        F.broadcast(ks)
        .crossJoin(g)
        .groupBy("k")
        .agg(
            F.sum(below.cast("long")).cast("long").alias("groups_below_k"),
            F.coalesce(
                F.sum(F.when(below, F.col("grp_sz"))), F.lit(0)
            ).cast("long").alias("rows_at_risk"),
            F.min("grp_sz").cast("long").alias("min_group"),
            F.count("*").cast("long").alias("n_groups"),
        )
        .orderBy("k")
    )


@query(
    "embedding_label_outliers",
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT))
                   AS vi,
               embedding::DOUBLE[] AS v
        FROM embeddings),
    cent AS (
        SELECT label, g.i AS dim, CAST(SUM(g.x) AS DOUBLE) AS s
        FROM q, (SELECT unnest(vi) AS x,
                        generate_subscripts(vi, 1) AS i) AS g
        GROUP BY label, g.i),
    cvec AS (SELECT label, list(s ORDER BY dim) AS c FROM cent
             GROUP BY label),
    scored AS (
        SELECT q.vec_id, q.label,
               FLOOR(list_dot_product(q.v, cv.c)
                     / sqrt(list_dot_product(q.v, q.v))
                     / sqrt(list_dot_product(cv.c, cv.c))
                     * 1e9 + 0.5) / 1e9 AS cos
        FROM q JOIN cvec cv ON q.label = cv.label),
    ranked AS (
        SELECT vec_id, label, cos,
               row_number() OVER (PARTITION BY label
                                  ORDER BY cos, vec_id) AS rk
        FROM scored)
    SELECT CAST(label AS BIGINT) AS label, CAST(rk AS BIGINT) AS rk,
           CAST(vec_id AS BIGINT) AS vec_id, cos
    FROM ranked WHERE rk <= 2 ORDER BY label, rk
    """,
)
def embedding_label_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mislabel candidates: the 2 vectors LEAST cosine-similar
    to their own label's centroid — the embedding-quality audit that
    surfaces annotation errors before contrastive training bakes them
    in (complements knn_classify, which predicts labels, and SemDeDup,
    which prunes same-label near-dups).

    Float parity: centroids come from integer-micro per-dimension sums
    (exact under any row order, the centroid-drift discipline); the
    row-vs-centroid cosine is a zip_with fold in dimension order on
    both engines (DuckDB's list_dot_product iterates in list order),
    quantized at 1e-9 before the per-label rank. Scale: one 64×
    explode groupBy for centroids (output |labels|×64), centroid table
    broadcast onto the corpus, per-label bottom-k via window — at
    100 TB swap the window for per-partition bottom-k + merge."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("label"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("vi"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    cent = (
        q.select("label", F.posexplode("vi").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.sum("x").cast("double").alias("s"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim").alias("d"), F.col("s")))
            ).getField("s").alias("c")
        )
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda a, b: a + b
    )
    cos = dot(F.col("v"), F.col("c")) / F.sqrt(
        dot(F.col("v"), F.col("v"))
    ) / F.sqrt(dot(F.col("c"), F.col("c")))
    scored = q.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        (F.floor(cos * 1e9 + F.lit(0.5)) / 1e9).alias("cos"),
    )
    w = Window.partitionBy("label").orderBy("cos", "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 2)
        .select("label", "rk", "vec_id", "cos")
        .orderBy("label", "rk")
    )
