"""Deduplication operators for the LLM-data-pipeline surface: exact,
MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.

Design for 100 TB (the whole point of these rewrites):
- **Exact**: hash-groupBy on a text digest — one shuffle on a 32-byte key,
  never on the document bodies.
- **MinHash+LSH**: per-doc signature (narrow map, no shuffle) → explode to
  (band, band_key) → self-join on the band bucket → exact-Jaccard verify on
  candidates only. Candidate count is O(true pairs + LSH false positives),
  never O(n²). Banding (b bands of r rows) tunes the S-curve:
  P(candidate) = 1-(1-s^r)^b.
- **SimHash**: 32-bit fingerprint via per-word hash bit voting — pure
  aggregation, one shuffle; Hamming-close fingerprints = near-dups.
- **n-gram Jaccard**: inverted-index join (explode shingles, pair docs
  sharing one) — exact, but candidate set is bounded by shingle-sharing,
  not n².

All hashing uses operators.text.hash64 (md5-based, engine-portable) so the
DuckDB oracles reproduce values bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .text import hash64, shingles, tokenize

SIMHASH_BITS = 32


def normalized_text(text: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on the md5 of normalized text: one row per digest (the
    lowest id wins), with the group size as ``n_copies``."""
    h = F.md5(normalized_text(F.col(text_col)))
    return (
        df.select(F.col(id_col), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def with_shingles(df: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    """Attach distinct word-k-gram shingles as ``shingles``."""
    return df.withColumn("shingles", shingles(tokenize(F.col(text_col)), k))


def minhash_signature(shingle_col: Column, num_hashes: int) -> Column:
    """MinHash signature: element i = min over shingles of
    xxhash64(i, shingle). Signatures only steer LSH candidate generation
    (every candidate is exact-Jaccard-verified afterwards), so they don't
    need the portable-md5 contract — xxhash64 is a native seeded 64-bit
    hash, ~10× cheaper than an md5+conv chain per shingle."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(i, s))
        ),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold) via
    MinHash-LSH candidate generation + exact verification.

    With r = num_hashes/bands = 2 and b = 16, a pair at s = 0.8 is missed
    with probability (1 - 0.64)^16 ≈ 1e-7 — and every surfaced pair is
    exact-verified, so false positives are zero.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands

    docs = with_shingles(df, text_col, k).filter(F.size("shingles") > 0)
    sig = docs.select(
        F.col(id_col).alias("id"),
        F.col("shingles"),
        minhash_signature(F.col("shingles"), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "id",
        "shingles",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.md5(
                        F.concat_ws(",", F.transform(
                            F.slice(F.col("sig"), b * r + 1, r),
                            lambda v: v.cast("string"),
                        ))
                    ).alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select("id", "shingles", "band.band_id", "band.band_key")

    left = banded.alias("a")
    right = banded.alias("b")
    candidates = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        candidates.withColumn("jacc", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jacc") >= threshold)
        .select("id_a", "id_b", F.round("jacc", 4).alias("jacc"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs via an inverted shingle index: only doc
    pairs sharing at least one shingle are ever paired (bounded candidate
    set — the scalable exact alternative to an n² cross join)."""
    docs = with_shingles(df, text_col, k).filter(F.size("shingles") > 0)
    sets = docs.select(F.col(id_col).alias("id"), "shingles")
    inv = sets.select("id", F.explode("shingles").alias("shingle"))
    pairs = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    a = sets.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jacc", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jacc") >= threshold)
        .select("id_a", "id_b", F.round("jacc", 4).alias("jacc"))
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash fingerprint per document: each word's hash votes
    ±1 on every bit position; the sign of each bit-sum sets the bit.

    Implemented as explode → 32 conditional sums → recombine; the explode
    never shuffles (the aggregation's map-side combine eats it)."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    ).withColumn("h", hash64(F.col("word")))
    votes = words.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"bit{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fingerprint = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"bit{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select("id", fingerprint.alias("simhash"))
