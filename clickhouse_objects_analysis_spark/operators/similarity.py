"""Similarity search over embedding columns (array<float>).

Two paths, per SURVEY §7 M3:
- **Brute-force cosine top-k** — the exact baseline. The query side is
  broadcast; the corpus side streams. Dot products run JVM-side via
  zip_with/aggregate (no Python, no Arrow hop).
- **LSH-bucketed (random hyperplane / SimHash-for-vectors)** — the scale
  path: B deterministic pseudo-random hyperplanes → B-bit bucket per
  vector; only same-bucket pairs are scored. Multi-probe (`n_tables`
  independent bucket sets) trades recall for fan-out. At 100 TB the bucket
  join shuffles on a short int key instead of cross-joining.

Hyperplane components are derived from operators.text.hash64(seed) —
deterministic, no RNG state, reproducible across runs and engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .text import hash64

_HP_SCALE = 1000


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length numeric arrays (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pairs(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — exact O(n²)
    baseline; use lsh_cosine_pairs at scale."""
    a = emb.select(
        F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded).
    The queries side is broadcast — corpus never shuffles."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), as_double(F.col(vec_col)).alias("vc")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("vq")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("corpus_id"))
        .withColumn("cos", cosine(F.col("vq"), F.col("vc")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "corpus_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").alias("rank"),
        )
    )


def hyperplane(table: int, plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d ∈ [-500, 500)
    from the portable hash of 't{table}_p{plane}_d{d}'."""
    return F.array(
        *[
            (hash64(F.lit(f"t{table}_p{plane}_d{d}")) % _HP_SCALE - _HP_SCALE // 2)
            .cast("double")
            for d in range(dim)
        ]
    )


def lsh_bucket(vec: Column, table: int, n_planes: int, dim: int) -> Column:
    """B-bit bucket id: bit p = sign(vec · hyperplane_p)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bit = F.when(dot(vec, hyperplane(table, p, dim)) >= 0, 1).otherwise(0)
        bucket = bucket * 2 + bit
    return bucket


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing an LSH bucket
    with the query in at least one of ``n_tables`` hash tables.

    Scale shape: corpus is bucketed once per table (narrow), the join key
    is (table, bucket) — a shuffle on small ints; per-bucket candidate
    lists replace the n² cross join. Recall rises with n_tables."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), as_double(F.col(vec_col)).alias("vc")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("vq")
    )

    def bucketed(df: DataFrame, vec: str, out: str) -> DataFrame:
        tables_arr = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    lsh_bucket(F.col(vec), t, n_planes, dim).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select("*", F.explode(tables_arr).alias(out)).select(
            *df.columns, f"{out}.t", f"{out}.bucket"
        )

    cb = bucketed(c, "vc", "cb")
    qb = bucketed(q, "vq", "qb")
    candidates = (
        cb.join(qb, on=["t", "bucket"])
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select("query_id", "corpus_id", "vq", "vc")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return (
        candidates.withColumn("cos", cosine(F.col("vq"), F.col("vc")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "corpus_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").alias("rank"),
        )
    )
