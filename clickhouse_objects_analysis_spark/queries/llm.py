"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal plumbing (SURVEY §7 M3; north-star requirement in BASELINE.json).

Oracle portability: all hashing is md5-derived (operators.text.hash64), so
the DuckDB oracles reproduce the exact same values — the SimHash oracle is
even generated from the same bit arithmetic. Approximate/ANN variants whose
candidate sets are algorithm-specific are verified end-to-end instead
(exact-verified output). The multimodal decode is a REAL parse: documents
are rendered to valid binary P6 PPM images and decoded back with the
stdlib netpbm parser, with every field arithmetically oracled."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.dedup import (
    SIMHASH_BITS,
    connected_components_auto,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ..operators.multimodal import (
    FRAME_BYTES,
    attach_binary_payload,
    decode_features,
    encode_ppm_payload,
    resize_images,
    sample_frames,
)
from ..operators.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
    pq_cosine_topk,
)
from ..operators.text import (
    LANG_STOPWORDS,
    bpe_ish_tokens,
    predict_lang_table,
    quality_features_table,
    rolling_fingerprints,
    tokenize,
)
from ..session import widen_scan
from .registry import query, tables

# Shared DuckDB CTE: word-trigram shingle sets per document (mirrors
# operators.dedup.with_shingles: \s+ tokenization, distinct 3-grams).
_SHINGLE_CTE = """
    w AS (SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> length(x) > 0) AS ws
          FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                 for i in range(1, len(ws) - 1)]) AS s
           FROM w WHERE len(ws) >= 3)
"""

# Candidate pairs via the inverted shingle index (docs sharing >= 1
# shingle), intersection evaluated ONCE per pair — the all-pairs triple
# list_intersect form cost ~6 s (ngram) / ~17 s (clusters) per oracle run
# at sf0.01, which alone could blow the driver's correctness budget.
_SCORED_CTE = """
    ix AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM ix a JOIN ix b ON a.g = b.g AND a.doc_id < b.doc_id),
    scored AS (SELECT c.id_a, c.id_b,
                      len(list_intersect(a.s, b.s))::DOUBLE AS inter,
                      len(a.s) AS la, len(b.s) AS lb
               FROM cand c
               JOIN sh a ON a.doc_id = c.id_a
               JOIN sh b ON b.doc_id = c.id_b)
"""


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS text_hash,
           MIN(doc_id) AS doc_id,
           COUNT(*)    AS n_copies
    FROM documents
    GROUP BY 1
    ORDER BY doc_id
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-text md5, lowest id kept.
    One shuffle on a 32-byte digest regardless of document size."""
    d = tables(spark, sf_dir)["documents"]
    return exact_dedup(d, "text", "doc_id").orderBy("doc_id")


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_SCORED_CTE}
    SELECT id_a, id_b, ROUND(inter / (la + lb - inter), 4) AS jacc
    FROM scored
    WHERE inter / (la + lb - inter) >= 0.8
    ORDER BY id_a, id_b
    """,
)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32)+LSH(16 bands of 2) candidates, exact-Jaccard-verified at
    0.8. The oracle is the exact all-pairs answer: LSH miss probability at
    s=0.8 is (1-.64)^16 ≈ 1e-7, and verification kills false positives, so
    the outputs agree. Spark side never goes O(n²)."""
    d = tables(spark, sf_dir)["documents"]
    return minhash_lsh_pairs(
        d, "doc_id", "text", k=3, num_hashes=32, bands=16, threshold=0.8
    ).orderBy("id_a", "id_b")


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_SCORED_CTE}
    SELECT id_a, id_b, ROUND(inter / (la + lb - inter), 4) AS jacc
    FROM scored
    WHERE inter / (la + lb - inter) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-Jaccard near-dup pairs via the inverted shingle index
    (only docs sharing a shingle are paired — never a cross join)."""
    d = widen_scan(tables(spark, sf_dir)["documents"])
    # Lazy checkpoint before the global sort (r15): the range
    # exchange's boundary-sampling job re-executes the pair-join map
    # stage otherwise — measured 110-123 -> 81-93 s at sf30 on the
    # containment sibling, a wash at sf0.1.
    return (
        ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.5)
        .localCheckpoint(eager=False)
        .orderBy("id_a", "id_b")
    )


def _simhash_oracle(order_by: bool = True) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS bit{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN bit{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH words AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                          x -> length(x) > 0)) AS word
        FROM documents
    ),
    h AS (SELECT doc_id,
                 CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h
          FROM words),
    votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
    SELECT doc_id AS id, {fp} AS simhash FROM votes{" ORDER BY id" if order_by else ""}
    """


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (bit-voting over portable word hashes);
    the oracle replays the identical bit arithmetic in SQL."""
    d = tables(spark, sf_dir)["documents"]
    return simhash(d, "doc_id", "text").orderBy("id")


@query(
    "embedding_neardup_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.45
    ORDER BY id_a, id_b
    """,
)
def embedding_neardup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact baseline; the LSH-bucketed
    scale path is ann_lsh_topk). Dot products via zip_with/aggregate —
    JVM-side, no Python."""
    e = tables(spark, sf_dir)["embeddings"]
    return cosine_pairs(e, "vec_id", "embedding", threshold=0.45).orderBy(
        "id_a", "id_b"
    )


@query(
    "ann_cosine_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS vq FROM e WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, e.vec_id AS corpus_id,
               FLOOR(list_cosine_similarity(q.vq, e.v) * 1e9 + 0.5) / 1e9
                   AS cos
        FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, corpus_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, corpus_id) AS rank
        FROM scored
    )
    SELECT query_id, corpus_id, ROUND(cos, 4) AS cos, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def ann_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors — the exact ANN
    baseline; query side broadcast, corpus never shuffles."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    res = cosine_topk(e, q, "vec_id", "embedding", k=5)
    return res.withColumn("rank", F.col("rank").cast("long")).orderBy(
        "query_id", "rank"
    )


_ANN_GATE_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           TRUE AS mean_recall_ok,
           TRUE AS every_query_hit
    FROM embeddings WHERE vec_id < 10
    """


def _ann_recall_gate(exact: DataFrame, approx: DataFrame,
                     mean_threshold: float) -> DataFrame:
    """Recall of an approximate top-k against the exact top-k, emitted as
    a deterministic gate row: the candidate SET is algorithm-specific
    (not SQL-expressible), but with seeded hyperplanes / seeded k-means
    the achieved recall is a fixed number, so `recall ≥ threshold` is an
    oracle-checkable claim. Thresholds sit well under the measured floor
    at sf0.001/0.01/0.1 so the gate tests the algorithm, not noise."""
    ex = exact.select("query_id", "corpus_id")
    hits = ex.join(approx.select("query_id", "corpus_id"),
                   ["query_id", "corpus_id"], "left_semi")
    per_q = (
        ex.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .na.fill({"n_hit": 0})
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (F.sum("n_hit") / F.sum("n_exact") >= F.lit(mean_threshold))
        .alias("mean_recall_ok"),
        (F.min("n_hit") >= 1).alias("every_query_hit"),
    )


@query("ann_lsh_topk", oracle=_ANN_GATE_ORACLE)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (random-hyperplane buckets): the
    100 TB path — shuffle on small int bucket keys instead of an n² cross
    join. Parameters follow a measured sweep on this corpus (near-random
    vectors, top-5 cos ≈ 0.3, the hardest regime for LSH): vs the exact
    top-5, (planes=8, tables=4) → recall 0.06 @ 13% of corpus scored;
    (6,8) → 0.26 @ 13%; (5,12) → 0.60 @ 33%; (4,16) → 0.96 @ 64% (barely
    sublinear). (5,12) is the honest middle; corpora with real near-dup
    structure (cos ≥ 0.8) sit far up the S-curve and need fewer tables.

    Output is the recall gate vs the exact top-5 (measured mean recall
    0.58–0.82 across sf0.001/0.01/0.1, min 2-of-5 per query; gate at
    mean ≥ 0.5, every query ≥ 1) — see _ann_recall_gate."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    approx = lsh_cosine_topk(
        e, q, "vec_id", "embedding", k=5, dim=64, n_planes=5, n_tables=12
    )
    exact = cosine_topk(e, q, "vec_id", "embedding", k=5)
    return _ann_recall_gate(exact, approx, mean_threshold=0.5)


@query("ann_ivf_topk", oracle=_ANN_GATE_ORACLE)
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate top-k (operators.similarity.ivf_cosine_topk):
    spherical-k-means coarse quantizer on a bounded sample, map-only
    centroid assignment, probe the best n_probe inverted lists. On this
    near-random corpus (top-5 cos ≈ 0.3) the measured sweep vs exact
    top-5: (C=32, probe=4) → recall 0.48–0.54 @ ~12% of corpus scored;
    (32, 8) → 0.74 @ 25%; (64, 8) → 0.46–0.62 @ 12%. Strictly dominates
    the LSH variant here (LSH needed 33% scanned for recall 0.60) because
    learned centroids adapt to the data while hyperplanes are oblivious.

    Output is the recall gate vs the exact top-5 (measured mean recall
    0.72–0.74 across sf0.001/0.01/0.1, min 2-of-5 per query; gate at
    mean ≥ 0.6, every query ≥ 1) — see _ann_recall_gate."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    approx = ivf_cosine_topk(
        e, q, "vec_id", "embedding", k=5, n_centroids=32, n_probe=8
    )
    exact = cosine_topk(e, q, "vec_id", "embedding", k=5)
    return _ann_recall_gate(exact, approx, mean_threshold=0.6)


@query("ann_pq_topk", oracle=_ANN_GATE_ORACLE)
def ann_pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-k with exact re-rank
    (operators.similarity.pq_cosine_topk) — the COMPRESSION scale path
    next to LSH (oblivious buckets) and IVF (candidate pruning): the
    index is m=16 one-byte codes per vector (32x smaller than the
    float64 embedding), the ADC scan reads only codes + per-query
    lookup tables, and each partition emits just its top rerank*k
    candidates before the exact re-rank. Composable with IVF at 100 TB
    (IVF prunes the lists, PQ compresses what remains — the FAISS
    IVF-PQ layout).

    Measured on this near-random corpus (the hardest regime) vs the
    exact top-5: (m=16, ksub=16, rerank=8) -> recall 0.86/0.92/0.84 at
    sf0.001/0.01/0.1 with min 2-of-5 per query — above IVF's 0.74 at a
    fraction of the scan bytes. Gate at mean >= 0.7, every query >= 1
    — see _ann_recall_gate."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    approx = pq_cosine_topk(
        e, q, "vec_id", "embedding", k=5, m=16, ksub=16, rerank=8
    )
    exact = cosine_topk(e, q, "vec_id", "embedding", k=5)
    return _ann_recall_gate(exact, approx, mean_threshold=0.7)


@query(
    "text_quality",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> length(x) > 0) AS ws,
               length(text) AS n_chars,
               length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct
        FROM documents
    ),
    feats AS (
        SELECT doc_id,
               len(ws) AS n_words,
               n_chars,
               (n_chars - (len(ws) - 1)) / greatest(len(ws), 1) AS mean_word_len,
               len(list_distinct(ws)) / greatest(len(ws), 1)::DOUBLE AS distinct_ratio,
               punct / greatest(n_chars, 1)::DOUBLE AS punct_ratio,
               len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is'], w)))
                   / greatest(len(ws), 1)::DOUBLE AS stopword_ratio
        FROM f
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_chars AS BIGINT) AS n_chars,
           ROUND(mean_word_len, 4)   AS mean_word_len,
           ROUND(distinct_ratio, 4)  AS distinct_ratio,
           ROUND(punct_ratio, 4)     AS punct_ratio,
           ROUND(stopword_ratio, 4)  AS stopword_ratio,
           ROUND(0.4 * least(n_words / 100.0, 1.0)
                 + 0.4 * distinct_ratio
                 + 0.2 * (1 - least(punct_ratio * 10, 1.0)), 4) AS quality
    FROM feats
    ORDER BY doc_id
    """,
)
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (C4/Gopher-style heuristics, simplified): length,
    lexical diversity, punctuation, stopword density → one score. Token
    stats run explode+agg (codegen), not interpreted HOF lambdas — the
    round-1 HOF form was the slowest query in the bench at 14.3 s."""
    d = tables(spark, sf_dir)["documents"]
    f = quality_features_table(d, "doc_id", "text")
    quality = (
        F.lit(0.4) * F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * F.col("distinct_ratio")
        + F.lit(0.2) * (1 - F.least(F.col("punct_ratio") * 10, F.lit(1.0)))
    )
    return f.select(
        "doc_id",
        "n_words",
        "n_chars",
        F.round("mean_word_len", 4).alias("mean_word_len"),
        F.round("distinct_ratio", 4).alias("distinct_ratio"),
        F.round("punct_ratio", 4).alias("punct_ratio"),
        F.round("stopword_ratio", 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality"),
    ).orderBy("doc_id")


def _lang_id_oracle() -> str:
    score = {
        lang: f"len(list_filter(ws, w -> list_contains({list(sw)!r}, w)))"
        for lang, sw in LANG_STOPWORDS.items()
    }
    langs = list(score)
    case = f"CASE WHEN greatest({', '.join(score[l] for l in langs)}) = 0 THEN 'und' "
    for i, lang in enumerate(langs[:-1]):
        geq = " AND ".join(
            f"{score[lang]} >= {score[other]}" for other in langs[i + 1 :]
        )
        case += f"WHEN {geq} THEN '{lang}' "
    case += f"ELSE '{langs[-1]}' END"
    return f"""
    WITH w AS (SELECT doc_id,
                      list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> length(x) > 0) AS ws
               FROM documents)
    SELECT doc_id, {case} AS predicted_lang FROM w ORDER BY doc_id
    """


@query("lang_id", oracle=_lang_id_oracle())
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID (stopword-voting n-gram heuristic, deterministic
    tie-break en>de>fr>es, all-zero → 'und')."""
    d = tables(spark, sf_dir)["documents"]
    return predict_lang_table(d, "doc_id", "text").orderBy("doc_id")


@query(
    "token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> length(x) > 0)) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))
                AS BIGINT) AS bpe_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token stream
    (alnum runs and single punctuation)."""
    d = tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).cast("long").alias("ws_tokens"),
        F.size(bpe_ish_tokens(F.col("text"))).cast("long").alias("bpe_tokens"),
    ).orderBy("doc_id")


@query(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_concat([CAST(0 AS BIGINT)],
                           [CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)
                            for i in range(1, length(text) + 1)]),
               (acc, c) -> (acc * 131 + c) % 1073741789
           ) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Karp–Rabin rolling-hash fingerprint over characters — identical
    modular arithmetic on both engines."""
    d = tables(spark, sf_dir)["documents"]
    return rolling_fingerprints(d, "doc_id", "text").orderBy("doc_id")


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text)                  AS checksum,
           'text/plain'               AS mime
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing: opaque payload + typed metadata;
    metadata-only reads never touch the blob (column pruning)."""
    d = tables(spark, sf_dir)["documents"]
    mm = attach_binary_payload(d, "doc_id", "text")
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.col("meta.mime").alias("mime"),
    ).orderBy("doc_id")


@query(
    "multimodal_resize",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id,
           (16 + n % 64)::BIGINT          AS orig_w,
           (16 + (n // 64) % 64)::BIGINT  AS orig_h,
           32::BIGINT AS w, 24::BIGINT AS h,
           least(n, 32 * 24)::BIGINT      AS out_bytes
    FROM b
    ORDER BY doc_id
    """,
)
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub resize through real binary-in/binary-out Arrow plumbing; the
    oracle replays the deterministic dimension arithmetic and the
    target-bounded payload size."""
    d = tables(spark, sf_dir)["documents"]
    mm = attach_binary_payload(d, "doc_id", "text")
    out = resize_images(mm, target_w=32, target_h=24)
    return out.select(
        "doc_id", "orig_w", "orig_h", "w", "h",
        F.length("payload").cast("long").alias("out_bytes"),
    ).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    f AS (
        SELECT doc_id, n,
               unnest(range(0, CAST(ceil(n / {FRAME_BYTES}.0) AS BIGINT), 2))
                   AS frame_idx
        FROM b WHERE n > 0
    )
    SELECT doc_id, frame_idx,
           least({FRAME_BYTES}, n - frame_idx * {FRAME_BYTES})::BIGINT
               AS frame_nbytes
    FROM f
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling as a 1→N mapInPandas (UDTF shape): every 2nd
    fixed-size frame of each payload emitted with index + byte length;
    the oracle recomputes the frame grid arithmetically."""
    d = tables(spark, sf_dir)["documents"]
    mm = attach_binary_payload(d, "doc_id", "text")
    return sample_frames(mm, every_n=2).orderBy("doc_id", "frame_idx")


@query(
    "multimodal_decode",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents),
    d AS (
        SELECT doc_id,
               (16 + L % 32)          AS w,
               (16 + (L // 32) % 32)  AS h,
               (L % 256)              AS fill
        FROM b
    )
    SELECT doc_id,
           (9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
              + w * h * 3)::BIGINT AS n_bytes,
           w::BIGINT               AS width,
           h::BIGINT               AS height,
           fill::DOUBLE            AS mean_px
    FROM d
    ORDER BY doc_id
    """,
)
def multimodal_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: synthesize a valid binary P6 PPM per
    document (mapInPandas ingest), then parse it back with the
    dependency-free netpbm decoder (stdlib seam — PIL/injection slot in
    for other formats). The oracle replays the header+pixel arithmetic:
    n_bytes = header(9 + digit widths) + w*h*3, mean = the solid fill.
    """
    d = tables(spark, sf_dir)["documents"]
    ppm = encode_ppm_payload(d, "doc_id", "text")
    feats = decode_features(ppm, strict=True)  # stdlib parse must succeed
    return feats.select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        F.element_at("features", 1).alias("mean_px"),
    ).orderBy("doc_id")


@query(
    "dedup_clusters",
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
    comp AS (SELECT s AS doc_id, MIN(t) AS canonical FROM reach GROUP BY s)
    SELECT c.doc_id, c.canonical,
           COUNT(*) OVER (PARTITION BY c.canonical) AS cluster_size,
           (c.doc_id = c.canonical) AS keep
    FROM comp c
    ORDER BY canonical, doc_id
    """,
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING — the step after pair generation in a real
    dedup pipeline: group verified MinHash-LSH pairs (jaccard >= 0.8)
    into connected components, label each cluster by its minimum doc_id
    (the canonical copy to keep), and report cluster sizes. The oracle
    recomputes components via a recursive reachability CTE over the exact
    all-pairs graph. Spark side: operators.dedup.connected_components_auto
    — a one-aggregate density probe routes dense clique-like graphs to
    min-label propagation (O(diameter) rounds) and sparse chain-like ones
    to large/small-star (O(log n) rounds on any shape)."""
    d = tables(spark, sf_dir)["documents"]
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", k=3, num_hashes=32, bands=16, threshold=0.8
    )
    comp = connected_components_auto(pairs, "id_a", "id_b")
    w = Window.partitionBy("canonical")
    return (
        comp.select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("canonical"),
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("keep", F.col("doc_id") == F.col("canonical"))
        .orderBy("canonical", "doc_id")
    )
