"""Round-10 query wave 8: cross-source near-duplicate leakage — the
curation question the per-method dedup queries don't answer: WHICH
source pairs share near-duplicate documents (mirror sites, syndicated
feeds, scraped re-posts), the signal for dropping or down-weighting a
redundant source entirely rather than deduplicating row by row.

Oracle note: reuses dedup_minhash_lsh's exactness argument — the Spark
side generates candidates with MinHash-LSH (miss probability ~1e-7 at
the 0.8 threshold) and exact-verifies every pair, while the DuckDB twin
computes the exact all-pairs answer over the inverted shingle index, so
the two sides agree without the oracle replaying xxhash64.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import minhash_lsh_pairs
from .llm import _SCORED_CTE, _SHINGLE_CTE
from .registry import query, tables


@query(
    "source_neardup_leakage",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_SCORED_CTE},
    p AS (
        SELECT id_a, id_b FROM scored
        WHERE inter / (la + lb - inter) >= 0.8
    ),
    s AS (
        SELECT LEAST(da.source, db.source) AS src_a,
               GREATEST(da.source, db.source) AS src_b
        FROM p
        JOIN documents da ON da.doc_id = p.id_a
        JOIN documents db ON db.doc_id = p.id_b
    )
    SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           (src_a <> src_b) AS cross_source
    FROM s GROUP BY src_a, src_b ORDER BY src_a, src_b
    """,
)
def source_neardup_leakage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate leakage matrix between sources: every verified
    near-dup pair (MinHash-LSH candidates, exact Jaccard ≥ 0.8 — the
    dedup_minhash_lsh machinery) is attributed to its (source_a,
    source_b) pair, sorted so the matrix is upper-triangular, with the
    cross_source flag separating within-source duplication (re-posts)
    from cross-source leakage (mirrors/syndication — the rows a
    curation pipeline acts on by source, not by document).

    Scale shape: the pair stream is LSH-banded (never all-pairs); the
    two source lookups join the SMALL pair stream against documents'
    (id, source) projection — AQE broadcasts the pair side; the final
    agg is |sources|²-bounded."""
    d = tables(spark, sf_dir)["documents"]
    pairs = minhash_lsh_pairs(d, "doc_id", "text")
    src = d.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"),
                F.col("source").alias("sa"),
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"),
                F.col("source").alias("sb"),
            ),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
    )
    return (
        j.groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(
            "src_a",
            "src_b",
            "n_pairs",
            (F.col("src_a") != F.col("src_b")).alias("cross_source"),
        )
        .orderBy("src_a", "src_b")
    )
