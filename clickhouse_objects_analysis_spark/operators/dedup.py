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
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame

from .text import hash64, shingles, tokenize

SIMHASH_BITS = 32

#: Doc-count ceiling for the broadcast-dict Jaccard verification strategy;
#: above this the shingle dictionary outgrows a cheap broadcast
#: (~2 KB/doc) and verification switches to the join-attach path.
_DICT_VERIFY_MAX_DOCS = 20_000

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


def spread_scan(df: DataFrame, id_col: str) -> DataFrame:
    """Ensure the Arrow shingle pass parallelizes: the testdata tables
    are single-row-group parquet files whose scan is ONE unsplittable
    task, which would serialize the whole Python gram kernel on one
    core (measured 2.1 s -> 0.65 s for the sf0.1 shingle front). The
    repartition is CONDITIONAL on the input actually being
    under-parallel, so a 100 TB input that already arrives as thousands
    of splits pays no text reshuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, id_col)
    return df


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, k: int = 3,
    spread: bool = True,
) -> DataFrame:
    """(id, shingles) with distinct word-k-grams — the Arrow-batched twin
    of with_shingles. Same semantics (ASCII-\\s+ split, empty tokens
    dropped, first-occurrence-distinct, docs under k words excluded), but
    the per-gram work is Python string slicing over a batch instead of an
    interpreted slice/concat expression per element — the expression form
    measured ~8s for 5k docs, this ~0.2s; it's the front of every
    near-dup pipeline, so the constant matters.

    ``spread=False`` skips the scan-parallelizing repartition — for
    callers that shingle many SMALL frames in a loop (the incremental
    ingest path shingles one micro-batch at a time), where the
    per-call plan->RDD probe plus a 32-way shuffle of a ~1k-doc slice
    costs more than the parallelism buys (measured +1.7 s across the
    4-slice replay)."""
    if spread:
        df = spread_scan(df, id_col)

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


def band_rows(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, h0..h{n-1}) signatures → (id, band_id, band_key) LSH bucket
    rows: one native multi-arg xxhash64 over each band's r = n/bands
    signature columns, exploded for the bucket join. Shared by the batch
    self-join pipeline (minhash_lsh_pairs) and the incremental
    band-index path (streaming.pipeline.incremental_minhash_dedup)."""
    if bands <= 0 or num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    return sig.select(
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

    # Checkpoint the shingle front once: the signature path, the verify
    # count() and the verify collect()/join all consume `sets` — without
    # this the Arrow shingle pass recomputes 3-4x per call (measured ~40%
    # of the whole pipeline at sf0.1). Lazy: the first consumer's action
    # materializes it.
    sets = shingle_sets(df, id_col, text_col, k).localCheckpoint(eager=False)
    sig = minhash_signatures(sets, num_hashes)
    banded = band_rows(sig, num_hashes, bands)

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
    pairs: DataFrame, sets: DataFrame, threshold: float,
    strategy: str = "auto",
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs.

    Two physical strategies, same semantics (the expression-level
    jaccard() is avoided in both — array_intersect is CodegenFallback and
    the formula evaluates it twice):

    - **dict** (doc universe ≤ _DICT_VERIFY_MAX_DOCS): broadcast the
      doc→frozenset lookup once, stream bare id pairs. Cheapest when the
      candidate stream dwarfs the doc set — pair arrays never move.
    - **join** (beyond that): attach the shingle arrays to the candidate
      rows with two equi joins and score per pair in Arrow batches. Moves
      O(candidates·|s|) instead of broadcasting O(docs·|s|) to every
      worker — with prefix+length filtering the candidate stream is near
      output size, so this is the 100 TB path. (An 8× corpus replication
      measured the dict broadcast at ~80 MB turning verification into the
      bottleneck — hence the switch.)

    ``strategy`` pins a path: "auto" gates on the doc count (one count
    job); "join" skips the gate entirely — callers that run verification
    once per micro-batch (incremental_minhash_dedup) use it to avoid
    paying a count + collect + broadcast per batch."""
    if strategy == "auto":
        strategy = (
            "dict" if sets.count() <= _DICT_VERIFY_MAX_DOCS else "join"
        )
    if strategy == "dict":
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
                yield pd.DataFrame(
                    {"id_a": out_a, "id_b": out_b, "jacc": out_j}
                )

        out = pairs.select("id_a", "id_b").mapInPandas(
            score, schema="id_a long, id_b long, jacc double"
        )
        return out.select("id_a", "id_b", F.round("jacc", 4).alias("jacc"))

    a_sets = sets.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b_sets = sets.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    attached = pairs.select("id_a", "id_b").join(a_sets, "id_a").join(
        b_sets, "id_b"
    )

    def score_pairs(batches):
        for pdf in batches:
            out_a, out_b, out_j = [], [], []
            for ia, ib, xs, ys in zip(
                pdf["id_a"], pdf["id_b"], pdf["sh_a"], pdf["sh_b"]
            ):
                x = set(xs)
                inter = len(x.intersection(ys))
                j = inter / (len(x) + len(ys) - inter)
                if j >= threshold:
                    out_a.append(ia)
                    out_b.append(ib)
                    out_j.append(j)
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "jacc": out_j})

    out = attached.mapInPandas(
        score_pairs, schema="id_a long, id_b long, jacc double"
    )
    return out.select("id_a", "id_b", F.round("jacc", 4).alias("jacc"))


def char_shingle_sets(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """(id, shingles) with distinct CHARACTER k-grams over the raw text
    — the whitespace-robust twin of the word-gram shingle_sets: char
    shingles survive reflowed spacing, hyphenation, and concatenated
    tokens that word grams miss. Same contract (first-occurrence
    distinct, docs under k chars excluded, Arrow-batched slicing)."""
    df = spread_scan(df, id_col)

    def gen(batches):
        for pdf in batches:
            ids, shs = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = t or ""
                if len(t) < k:
                    continue
                grams = dict.fromkeys(
                    t[j : j + k] for j in range(len(t) - k + 1)
                )
                ids.append(i)
                shs.append(list(grams))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "shingles": pd.Series(shs, dtype="object"),
                }
            )

    return df.select(F.col(id_col).cast("long").alias(id_col), text_col).mapInPandas(
        gen, schema="id long, shingles array<string>"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs via inverted-index co-occurrence
    counting.

    |a ∩ b| for every co-occurring pair falls out of one self-join on the
    inverted index followed by a count aggregate — the pair-instance
    stream is narrow (two ids), map-side combined, fully whole-stage
    codegen, and the shingle strings themselves never enter a shuffle or
    a Python worker. Jaccard then needs only the per-doc set sizes
    (|a∪b| = |a|+|b|−|a∩b|), attached via two broadcast-sized joins.
    Pairs sharing no shingle have J = 0 < threshold, so skipping them is
    exact.

    Scale note: cost is Σ_shingle C(df, 2). On natural text that sum is
    tame once shingles are k ≥ 3 words (measured: max df 25, 1.3M
    instances for 5k docs; linear under corpus replication). On corpora
    with mega-df stop-shingles, set ``max_df``: shingles appearing in more
    than ``max_df`` documents are dropped from the inverted index BEFORE
    the pair join, bounding every posting list — and thereby the whole
    pair stream — at C(max_df, 2). This is a documented approximation:
    intersections no longer count stop-shingles (denominators stay the
    full set sizes), so reported Jaccard is a lower bound; boilerplate a
    real pipeline caps away is exactly what shouldn't vote for "near-dup"
    anyway. Past that, switch to minhash_lsh_pairs — at that scale exact
    all-pairs Jaccard itself is the wrong ask."""
    # Checkpoint the shingle front: `sizes` (consumed twice by the
    # attach joins) and the inverted index both read it — without this
    # the Arrow shingle pass recomputes up to 3x.
    sets = shingle_sets(df, id_col, text_col, k).localCheckpoint(eager=False)
    return jaccard_pairs_from_sets(
        sets, threshold, max_df, num_partitions=_pair_join_partitions(df)
    )


def char_ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard pairs over CHARACTER k-gram sets — same inverted
    index, Σ C(df,2) bound, and max_df stop-shingle semantics as
    ngram_jaccard_pairs (reported Jaccard is a documented lower bound
    under the cap), but robust to whitespace reflow / token gluing the
    word-gram sets cannot see. Char grams have much higher df than word
    trigrams, so max_df is effectively mandatory at any real scale."""
    sets = char_shingle_sets(df, id_col, text_col, k).localCheckpoint(
        eager=False
    )
    return jaccard_pairs_from_sets(
        sets, threshold, max_df, num_partitions=_pair_join_partitions(df)
    )


#: Per-partition budget for the pinned-ShuffledHashJoin build maps of
#: the pair-join family. 32 MiB keeps each LongHashedRelation build an
#: order of magnitude under the per-task execution-memory share on any
#: sane executor sizing.
_PAIR_BUILD_BYTES = 32 << 20


def _pair_join_partitions(src_df: DataFrame) -> int | None:
    """Scale-adaptive partition count for the pinned-SHJ pair joins
    (r15; the graph.py ``_scan_input_bytes`` discipline — zero Spark
    jobs). The hashed inverted index builds ~36 bytes of hash-map per
    COMPRESSED text-scan byte (sf10-measured: 59 MB documents.parquet →
    52M winnowing index rows ≈ 2.1 GB of build maps), so with
    ``spark.sql.shuffle.partitions`` pinned to the core count the sf30
    sweep DIED in ``ShuffledHashJoinExec.buildHashedRelation`` ("Can't
    acquire 134217728 bytes"): 32 scale-blind partitions × >128 MB
    builds. Returns a count that bounds each build near
    ``_PAIR_BUILD_BYTES``, floored at defaultParallelism — at sf0.1/sf1
    the floor binds, so LOCAL PLANS ARE UNCHANGED (callers skip the
    explicit repartition entirely when the floor binds). None when the
    input bytes are unknowable (non-file source); the session default
    then stands and cluster deployments own the conf."""
    import math

    from .graph import _scan_input_bytes

    b = _scan_input_bytes(src_df)
    if b is None:
        return None
    par = src_df.sparkSession.sparkContext.defaultParallelism
    return max(par, math.ceil(b * 36 / _PAIR_BUILD_BYTES))


def _hashed_pair_intersections(
    sets: DataFrame,
    max_df: int | None = None,
    cap_strategy: str = "stoplist",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id_a, id_b, inter) co-occurrence counts over the xxhash64-keyed
    inverted index — the shared pair-join discipline of the exact
    Jaccard/containment family (r11): 8-byte shuffle keys instead of
    gram text, optional df cap BEFORE any pair is formed, and a pinned
    ShuffledHashJoin self-join (sort-merge would sort both ~E-sized
    index sides — measured 53→12 s at the 500k-doc point). One
    definition so the next pair-join tuning lands once.

    ``cap_strategy`` picks how the df cap is applied (identical
    output, different plan):

    - ``"stoplist"`` (default): groupBy-count the over-cap grams and
      broadcast an anti-join — three full-index exchanges, but the
      stop groupBy combines map-side to distinct-gram size and NO
      in-partition sort of the raw index. The robust choice for
      high-density indexes (char k-grams: ~10× the word-trigram index;
      the r13 window variant OOM-killed the sf10 char sweep).
    - ``"window"``: a window count over the join's own hash(sh)
      exchange, applied to ONE side only — a pair survives iff its
      gram survives on the capped side, and the raw build side holds
      a superset of every capped gram's rows, so emitted pairs are
      provably identical. One full-index exchange replaces three, at
      the cost of one in-partition sort of the index. Measured on
      word trigrams (containment, sf10): 28.4 → 22.0 s. Opt in where
      the index is trigram-sized and the sort provably fits."""
    inv = sets.select("id", F.explode("shingles").alias("s")).select(
        "id", F.xxhash64("s").alias("sh")
    )
    # Scale-adaptive pair-join partitioning (see _pair_join_partitions):
    # only when the derived count EXCEEDS the session default — at
    # sf0.1/sf1 the floor binds and this branch is skipped, so the
    # local plan (and the driver bench) is byte-identical to r14's.
    par = sets.sparkSession.sparkContext.defaultParallelism
    if num_partitions is not None and num_partitions > par:
        inv = inv.repartition(num_partitions, "sh")
    if max_df is not None and cap_strategy == "window":
        from pyspark.sql import Window as _W

        capped = (
            inv.withColumn(
                "df", F.count(F.lit(1)).over(_W.partitionBy("sh"))
            )
            .filter((F.col("df") >= 2) & (F.col("df") <= int(max_df)))
            .drop("df")
        )
        return (
            capped.alias("a")
            .join(
                inv.alias("b").hint("shuffle_hash"),
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .groupBy(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    if max_df is not None:
        # The stop list (only mega-df shingles) is tiny — broadcast the
        # anti-join; posting lists shrink before any pair is formed.
        stop = (
            inv.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > int(max_df))
            .select("sh")
        )
        inv = inv.join(F.broadcast(stop), "sh", "left_anti")
    return (
        inv.alias("a")
        .join(
            inv.alias("b").hint("shuffle_hash"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def jaccard_pairs_from_sets(
    sets: DataFrame,
    threshold: float,
    max_df: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Shared Jaccard tail over a (id, shingles) frame (caller
    checkpoints it): inverted-index pair co-occurrence, optional df cap,
    size-attach joins — see ngram_jaccard_pairs for the scale contract.

    The inverted index keys on xxhash64(shingle), not the shingle
    string: the pair self-join shuffles 8-byte keys instead of ~25-byte
    gram text (r11: 53→12 s at the 500k-doc scale point), and the join
    is pinned ShuffledHashJoin — sort-merge would SORT both ~26M-row
    sides, which was the dominant cost of the whole near-dup graph
    build. Intersection counts are exact up to 64-bit hash collisions
    (~n²·2⁻⁶⁴ ≈ 4e-5 expected colliding pairs at 26M index rows — the
    same accepted-risk class as the xxhash64 MinHash signatures)."""
    sizes = sets.select("id", F.size("shingles").alias("sz"))
    inter = _hashed_pair_intersections(
        sets, max_df, num_partitions=num_partitions
    )
    a_sz = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sza"))
    b_sz = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("szb"))
    jacc = F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
    # The size attaches are NOT explicitly broadcast (r15): the doc-size
    # table grows with the corpus, and the forced broadcast built a
    # >128 MB LongHashedRelation at sf30 and DIED ("Can't acquire ...
    # to build hash relation") while 32 pair-join tasks held execution
    # memory. AQE converts these to broadcast at runtime whenever the
    # measured size fits (sf0.1: ~80 KB -> BroadcastHashJoin, plan
    # unchanged) and keeps a shuffle join when it doesn't — degrade,
    # never die.
    return (
        inter.join(a_sz, "id_a")
        .join(b_sz, "id_b")
        .withColumn("jacc", jacc)
        .filter(F.col("jacc") >= threshold)
        .select("id_a", "id_b", F.round("jacc", 4).alias("jacc"))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """Directional containment C(A→B) = |A∩B| / |A| over distinct word
    k-gram shingle sets — the asymmetric cousin of Jaccard that catches
    quote/subset duplication (a short doc embedded inside a longer one),
    which symmetric Jaccard misses because the union is dominated by the
    container.

    Emits one row per ordered pair with C ≥ threshold:
    (contained_id, container_id, containment). Both directions of every
    co-occurring unordered pair are evaluated from ONE intersection
    count — the inverted-index pair join runs once with id_a < id_b,
    then the two directional ratios inter/|A| and inter/|B| are filtered
    independently, so the pair stream is never doubled.

    Scale shape is identical to ngram_jaccard_pairs (same inverted
    index, same Σ C(df,2) bound, same optional ``max_df`` stop-shingle
    cap making reported containment a documented lower bound, same
    xxhash64 key narrowing + pinned ShuffledHashJoin — see
    jaccard_pairs_from_sets); the extra work over Jaccard is two
    codegen projections."""
    sets = shingle_sets(df, id_col, text_col, k).localCheckpoint(eager=False)
    sizes = sets.select("id", F.size("shingles").alias("sz"))
    # word-trigram index → the single-exchange window cap (r13:
    # sf10 28.4 → 22.0 s; see _hashed_pair_intersections for why the
    # denser char-gram indexes stay on the stop-list plan)
    inter = _hashed_pair_intersections(
        sets,
        max_df,
        cap_strategy="window",
        num_partitions=_pair_join_partitions(df),
    )
    a_sz = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sza"))
    b_sz = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("szb"))
    # No explicit broadcast — the sf30 sweep killed the forced form
    # (see jaccard_pairs_from_sets); AQE broadcasts when it fits.
    both = inter.join(a_sz, "id_a").join(b_sz, "id_b")
    # Both directional ratios are emitted from ONE scan via an exploded
    # 2-element array instead of a fwd/rev UNION: Catalyst does NOT
    # reuse the pair-join exchange across union branches (r12 plan
    # audit: 2 ShuffledHashJoins / 0 ReusedExchange — the entire
    # inverted-index self-join ran twice, the dominant cost at sf10;
    # checkpointing the pre-threshold pair frame instead was measured
    # WORSE — it materializes the full co-occurrence set).
    e = F.explode(
        F.array(
            F.struct(
                F.col("id_a").alias("contained_id"),
                F.col("id_b").alias("container_id"),
                (F.col("inter") / F.col("sza")).alias("containment"),
            ),
            F.struct(
                F.col("id_b").alias("contained_id"),
                F.col("id_a").alias("container_id"),
                (F.col("inter") / F.col("szb")).alias("containment"),
            ),
        )
    ).alias("e")
    return (
        both.select(e)
        .filter(F.col("e.containment") >= threshold)
        .select(
            F.col("e.contained_id").alias("contained_id"),
            F.col("e.container_id").alias("container_id"),
            F.round("e.containment", 4).alias("containment"),
        )
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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over an undirected pair graph → the dedup
    CLUSTERING step: near-dup pairs become clusters, each labeled by its
    minimum member id (the canonical document).

    Algorithm: iterative min-label propagation — each round every node
    takes the min label among itself and its neighbors; converges in
    O(component diameter) rounds. Near-dup clusters are shallow (dup
    groups link through shared shingles), so diameter is small in
    practice. Each round is ONE shuffle (join on node id + groupBy-min,
    both map-side combined); `localCheckpoint` keeps the plan flat across
    rounds like the lineage closure does. For adversarially long chain
    graphs at 100 TB, the asymptotic upgrade is
    ``connected_components_star`` (large-star/small-star, O(log n)
    rounds) — same DataFrame building blocks.

    Returns (node, component) for every node appearing in ``edges``.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint()
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    # Convergence probe: labels only ever decrease, so the label-sum
    # strictly decreases exactly when any label changed — one cheap agg
    # per round instead of a join-and-compare pass. Decimal(38,0) so the
    # probe can't overflow on 64-bit ids at scale.
    def _label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr"))
        )
        labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr"), F.col("component"))
                ).alias("component"),
            )
            # Lazy checkpoint: the convergence probe right below is the
            # action that materializes it, so each round costs ONE Spark
            # job instead of two (eager checkpoint + probe) — measured
            # ~2x on the per-round fixed cost that dominates shallow
            # dedup graphs.
            .localCheckpoint(eager=False)
        )
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log n) rounds on ANY graph shape, vs the O(diameter)
    rounds of min-label propagation (``connected_components``): a chain
    of length n converges in ~log n alternations instead of n rounds.

    Per alternation (two shuffles, both groupBy-min map-side combined):
    - **large-star**: around each center u, every LARGER neighbor v > u
      re-points to m(u) = min(N(u) ∪ {u}) — long chains fold in half.
    - **small-star**: edges are now (child > parent); around each child u,
      all its parents collapse onto the minimum one — stars flatten.

    Convergence = edge multiset stable (probed with one count+hash agg per
    alternation, no driver-side edge materialization). At the fixpoint the
    edge set is a forest of depth-1 stars rooted at each component's
    minimum id. Returns (node, component) for every node in ``edges`` —
    identical output contract to ``connected_components``.
    """
    # Symmetric neighbor list: every edge seen from both endpoints.
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    all_nodes = sym.select(F.col("u").alias("node")).distinct().localCheckpoint()

    def probe(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
        ).first()
        return (row[0], row[1])

    def large_star(e: DataFrame) -> DataFrame:
        # Large-star is defined on the UNDIRECTED graph: re-symmetrize the
        # (child > parent)-directed edges so every center sees its full
        # neighborhood (without this, round 2's `v > u` filter would drop
        # every edge and the loop would "converge" on an empty forest).
        es = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = es.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            es.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # Input edges satisfy u > v (large-star output): group each child's
        # parents, collapse all of them (and the child) onto the minimum.
        m = e.groupBy("u").agg(F.min("v").alias("m"))
        with_m = e.join(m, "u")
        repointed = with_m.select(F.col("v").alias("u"), F.col("m").alias("v"))
        kept = with_m.select("u", F.col("m").alias("v"))
        return (
            repointed.union(kept)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    e = sym
    prev = None
    for _ in range(max_iter):
        # Lazy checkpoints: the probe is the materializing action, so one
        # alternation costs one Spark job instead of three while still
        # truncating lineage each round.
        e = large_star(e).localCheckpoint(eager=False)
        e = small_star(e).localCheckpoint(eager=False)
        cur = probe(e)
        if cur == prev:
            break
        prev = cur
    # Fixpoint edges are (node -> component-min) stars; roots map to
    # themselves, and isolated-by-dedup nodes (filtered self loops) too.
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = all_nodes.join(
        labels.select("node"), "node", "left_anti"
    ).withColumn("component", F.col("node"))
    return labels.union(roots)


def pick_cc_algorithm(n_edges: int, n_nodes_max: int,
                      density_threshold: float = 2.0) -> str:
    """Choose the CC algorithm from a cheap density probe.

    Min-label propagation costs O(diameter) rounds — unbeatable on the
    shallow, dense clusters real dedup graphs produce (dup groups are
    near-cliques: edges >> nodes), but an adversarial chain degrades it
    to O(n) rounds. Large/small-star is O(log n) on ANY shape but pays
    two shuffles per alternation. The probe: a graph averaging >=
    ``density_threshold`` edges per node is clique-like (a k-clique has
    (k-1)/2 edges per node, a chain ~1), so dense -> 'minlabel',
    sparse -> 'star'. Sparse-but-shallow graphs (perfect stars,
    triangles) also route to 'star', which converges in O(1)
    alternations there — the mis-route costs a constant factor, never
    an asymptotic one."""
    if n_edges >= density_threshold * max(n_nodes_max, 1):
        return "minlabel"
    return "star"


def connected_components_auto(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    density_threshold: float = 2.0,
) -> DataFrame:
    """Connected components with algorithm auto-selection: one cheap
    aggregate (edge count + approx endpoint cardinalities — a single
    map-side-combined pass, no shuffle of the edge list) routes to
    min-label propagation on dense clique-like graphs and to
    large/small-star on sparse ones, so adversarial chains can't trigger
    O(n) rounds (see ``pick_cc_algorithm``). Output contract matches
    both underlying implementations: (node, component) for every node in
    ``edges``."""
    # Materialize the edge list ONCE (often the tail of an expensive
    # pair-generation pipeline — MinHash bands, cosine blocks); the
    # probe and the chosen algorithm both read the checkpoint instead
    # of recomputing the pipeline.
    e = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint()
    row = e.agg(
        F.count(F.lit(1)).alias("m"),
        F.approx_count_distinct("a").alias("na"),
        F.approx_count_distinct("b").alias("nb"),
    ).first()
    if row[0] <= _CC_DRIVER_GATE:
        return _driver_union_find(e)
    algo = pick_cc_algorithm(row[0], max(row[1], row[2]), density_threshold)
    if algo == "minlabel":
        return connected_components(e, "a", "b", max_iter)
    return connected_components_star(e, "a", "b", max_iter)


#: Driver union-find gate (the _BRUTE_GATE discipline, r12): below this
#: EDGE count the distributed contraction's per-round jobs are pure
#: fixed overhead — measured 3.2 s of alternation/probe jobs for a
#: 920-edge dedup graph at sf0.1 vs ~0.1 s of driver union-find. 100k
#: edges collect to ~1.6 MB; past the gate the O(log n) star
#: contraction runs unchanged (the 100 TB shape — a near-dup graph at
#: that scale has billions of edges and never takes this path).
_CC_DRIVER_GATE = 100_000


def _driver_union_find(e: DataFrame) -> DataFrame:
    """(node, component) via driver-side union-find over a CHECKPOINTED,
    size-gated edge frame. Union always attaches the larger root under
    the smaller, so every tree's root is the minimum id of its
    component — the same canonical labeling the distributed paths
    produce."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in e.collect():
        a, b = r[0], r[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    data = [(n, find(n)) for n in parent]
    # preserve the source id type so the sub-gate path matches the
    # distributed paths on non-integer node ids (r12 advice)
    node_t = e.schema[0].dataType
    out_schema = T.StructType(
        [
            T.StructField("node", node_t, True),
            T.StructField("component", node_t, True),
        ]
    )
    return e.sparkSession.createDataFrame(data, out_schema)
