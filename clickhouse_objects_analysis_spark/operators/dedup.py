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

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .text import hash64, shingles, tokenize

SIMHASH_BITS = 32

#: ASCII \s to match Java regex \s (Spark) and RE2 \s (DuckDB) — Python's
#: default \s is unicode-wide, the other two engines' is not.
_WS_RE = re.compile(r"\s+", re.ASCII)


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


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(id, shingles) with distinct word-k-grams — the Arrow-batched twin
    of with_shingles. Same semantics (ASCII-\\s+ split, empty tokens
    dropped, first-occurrence-distinct, docs under k words excluded), but
    the per-gram work is Python string slicing over a batch instead of an
    interpreted slice/concat expression per element — the expression form
    measured ~8s for 5k docs, this ~0.2s; it's the front of every
    near-dup pipeline, so the constant matters."""

    def gen(batches):
        for pdf in batches:
            ids, shs = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in _WS_RE.split((t or "").strip()) if w]
                if len(ws) < k:
                    continue
                grams = dict.fromkeys(
                    " ".join(ws[j : j + k]) for j in range(len(ws) - k + 1)
                )
                ids.append(i)
                shs.append(list(grams))
            # Explicit dtypes: an empty batch would otherwise default to
            # float64 columns, which Arrow can't cast to list<string>.
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "shingles": pd.Series(shs, dtype="object"),
                }
            )

    return df.select(F.col(id_col).cast("long").alias(id_col), text_col).mapInPandas(
        gen, schema="id long, shingles array<string>"
    )


def minhash_signature(shingle_col: Column, num_hashes: int) -> Column:
    """MinHash signature: element i = min over shingles of
    xxhash64(i, shingle). Signatures only steer LSH candidate generation
    (every candidate is exact-Jaccard-verified afterwards), so they don't
    need the portable-md5 contract — xxhash64 is a native seeded 64-bit
    hash, ~10× cheaper than an md5+conv chain per shingle.

    Expression form (array-in/array-out); the hot path below uses
    minhash_signatures (explode + groupBy-min), which stays inside
    whole-stage codegen — higher-order-function lambdas don't."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(i, s))
        ),
    )


def minhash_signatures(sets: DataFrame, num_hashes: int) -> DataFrame:
    """(id, shingles) → (id, h0..h{n-1}) via explode + groupBy-min.

    Each exploded row evaluates ``num_hashes`` native xxhash64 calls in
    generated code, and the min-aggregation combines map-side — the
    explode never survives the shuffle (one output row per doc). This is
    the whole-stage-codegen formulation of the same signature the
    array-expression form computes."""
    ex = sets.select("id", F.explode("shingles").alias("sh"))
    return ex.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
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

    sets = shingle_sets(df, id_col, text_col, k)
    sig = minhash_signatures(sets, num_hashes)

    # Band keys: one native multi-arg xxhash64 over each band's r signature
    # columns; explode to (id, band_id, band_key) for the bucket self-join.
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[F.col(f"h{b * r + j}") for j in range(r)]
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_id", "band.band_key")

    candidates = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_jaccard(candidates, sets, threshold)


def _verify_jaccard(
    pairs: DataFrame, sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs.

    The doc→shingle-set dictionary is broadcast once (it is the *small*,
    deduplicated side — attaching arrays per pair would ship each doc's
    shingles once per candidate, an O(pairs·|s|) Arrow stream that
    measured 4× slower). Each executor then scores bare id pairs against
    pre-built frozensets: one intersection per pair, built-once sets.
    The expression-level jaccard() would evaluate array_intersect twice
    per row (CodegenFallback, no subexpression elimination). If the doc
    universe outgrows a broadcast, flip back to two joins — the pair
    stream itself never needs to change."""
    rows = sets.collect()
    bc = sets.sparkSession.sparkContext.broadcast(
        {r["id"]: frozenset(r["shingles"]) for r in rows}
    )

    def score(batches):
        lut = bc.value
        for pdf in batches:
            out_a, out_b, out_j = [], [], []
            for ia, ib in zip(pdf["id_a"], pdf["id_b"]):
                x, y = lut[ia], lut[ib]
                inter = len(x & y)
                j = inter / (len(x) + len(y) - inter)
                if j >= threshold:
                    out_a.append(ia)
                    out_b.append(ib)
                    out_j.append(j)
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "jacc": out_j})

    out = pairs.select("id_a", "id_b").mapInPandas(
        score, schema="id_a long, id_b long, jacc double"
    )
    return out.select("id_a", "id_b", F.round("jacc", 4).alias("jacc"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs via a prefix-filtered inverted index.

    Plain inverted-index joins explode on common shingles (every pair of
    docs sharing "of the and" becomes a candidate — near-n² on natural
    text). Prefix filtering (Bayardo/Chaudhuri AllPairs) fixes that
    *without losing exactness*: order each doc's shingles by ascending
    global document frequency and index only the first
    |s| − ⌈t·|s|⌉ + 1 of them. If J(a,b) ≥ t, the two prefixes provably
    share a shingle, so candidate generation only pays for *rare*
    shingles; every candidate is then exact-verified. One extra
    aggregation (the global df counts) buys a candidate set near the true
    output size."""
    sets = shingle_sets(df, id_col, text_col, k)
    inv = sets.select(
        "id", F.size("shingles").alias("sz"), F.explode("shingles").alias("shingle")
    )
    sh_df = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rk_w = Window.partitionBy("id").orderBy("df", "shingle")
    prefix = (
        inv.join(sh_df, "shingle")
        .withColumn("rk", F.row_number().over(rk_w))
        .filter(
            F.col("rk")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        )
        .select("id", "sz", "shingle")
    )
    # Length filter rides along for free: J(a,b) ≥ t forces
    # t·|b| ≤ |a| (and symmetrically), so wildly different sizes never
    # become candidates.
    pairs = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.sz") >= threshold * F.col("b.sz"))
            & (F.col("b.sz") >= threshold * F.col("a.sz")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_jaccard(pairs, sets, threshold)


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
