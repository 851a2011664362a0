"""Round-7 session-5 queries: record linkage via a blocked fuzzy join.

Reference parity note: the reference repo (a lineage extractor) has no
fuzzy-match surface; this is part of the LLM-pipeline extension the
rebuild is chartered to carry (metadata/record dedup where keys are
dirty — the classic entity-resolution step before exact dedup can run).
The scalar kernels it verifies with are the same bit-exact-vs-DuckDB
Jaro-Winkler already proven by `string_distance_suite`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .registry import query, tables


@query(
    "record_linkage_fuzzy_join",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               lower(array_to_string(
                   list_slice(string_split(text, ' '), 1, 6), ' ')) AS title
        FROM documents
    ),
    b AS (
        SELECT doc_id, title,
               string_split(title, ' ')[1] AS k1,
               string_split(title, ' ')[2] AS k2
        FROM t
    ),
    p AS (
        SELECT x.doc_id AS id_a, y.doc_id AS id_b,
               jaro_winkler_similarity(x.title, y.title) AS jw
        FROM b x JOIN b y
          ON x.k1 = y.k1 AND x.k2 = y.k2 AND x.doc_id < y.doc_id
    )
    SELECT id_a, id_b, jw FROM p
    WHERE jw >= 0.93
    ORDER BY id_a, id_b
    """,
)
def record_linkage_fuzzy_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution as a BLOCKED fuzzy join: derive a dirty key (the
    document's first-6-token 'title'), block on the first two tokens so
    only plausibly-linkable records ever meet, then verify each blocked
    pair with the Arrow-batched Jaro-Winkler kernel (operators/text.py —
    bit-exact vs DuckDB, proven by string_distance_suite) and keep pairs
    ≥ 0.93. The never-all-pairs shape is the point: candidate volume is
    Σ block_size² over blocks, not n², and the verify kernel only sees
    survivors of the equi-join. 100 TB: the block key is a plain shuffle
    key (no skew here — measured max block ≈ n/vocab²); a production
    deployment swaps the token block for q-gram MinHash bands
    (operators/dedup.py band_rows) when keys are too dirty for prefix
    blocking, which slots into the same join. Oracle replays the exact
    same blocking + threshold, so a missed block or kernel divergence
    cannot hash-match."""
    d = tables(spark, sf_dir)["documents"]
    t = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lower(
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 6))
        ).alias("title"),
    )
    w = F.split(F.col("title"), " ")
    b = t.select(
        "doc_id", "title", w[0].alias("k1"), w[1].alias("k2")
    )
    pairs = (
        b.alias("x")
        .join(b.alias("y"), ["k1", "k2"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            ch_expr(
                "jaroWinklerSimilarity", F.col("x.title"), F.col("y.title")
            ).alias("jw"),
        )
    )
    return pairs.filter(F.col("jw") >= 0.93).orderBy("id_a", "id_b")
