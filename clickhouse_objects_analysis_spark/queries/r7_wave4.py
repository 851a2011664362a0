"""Round-7 session-4 queries: the incremental (streaming) near-dup
dedup path — continuous-ingest MinHash+LSH against a persisted band
index, the write-side twin of the batch dedup_minhash_lsh entry.

Reference parity note: the reference repo has no streaming surface; this
extends its dedup semantics (same shingle/minhash/LSH parameters as
dedup_minhash_lsh) to the arrival-ordered ingest shape a 100 TB
training-data pipeline actually runs. The oracle is the exact all-pairs
batch answer, so slice boundaries are proven not to leak into results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.bpe import bpe_oracle_sql, bpe_train
from ..streaming.pipeline import incremental_minhash_dedup
from .llm import _SCORED_CTE, _SHINGLE_CTE
from .registry import query, tables


@query(
    "incremental_minhash_dedup",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_SCORED_CTE},
    d AS (SELECT id_b, id_a,
                 ROUND(inter / (la + lb - inter), 4) AS jacc,
                 row_number() OVER (PARTITION BY id_b
                                    ORDER BY id_a) AS rn
          FROM scored
          WHERE inter / (la + lb - inter) >= 0.8)
    SELECT id_b AS doc_id, id_a AS rep_id, jacc AS rep_jacc
    FROM d WHERE rn = 1
    ORDER BY doc_id
    """,
)
def incremental_minhash_dedup_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming near-dup dedup: documents replay in 4 doc_id-ordered
    micro-batches; each batch LSH-joins against the persisted band index
    of all earlier arrivals, exact-verifies candidates at 0.8, and
    appends its own bands — O(batch + collisions) per ingest, the corpus
    text is never rescanned. Output: (dup doc, first-seen representative,
    exact Jaccard). Oracle = the all-pairs batch answer (LSH miss
    probability ≈ 1e-7 at s = 0.8; verification kills false positives),
    which also proves batch-boundary independence."""
    tables(spark, sf_dir)
    return incremental_minhash_dedup(spark, sf_dir, n_slices=4).orderBy(
        "doc_id"
    )


@query("bpe_merge_training", oracle=bpe_oracle_sql(8))
def bpe_merge_training_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): 8 merge
    rounds over the (distinct word, frequency) vocab of the documents
    table — pair counting is a map-side-combined aggregate over the
    vocab (never the corpus), merge application a narrow fold, each
    round's winner a 1-row collect. Integer counts + lexicographic
    tie-breaks make the whole trajectory bit-reproducible against the
    hand-unrolled DuckDB rounds."""
    d = tables(spark, sf_dir)["documents"]
    return bpe_train(spark, d, "text", merges=8)
