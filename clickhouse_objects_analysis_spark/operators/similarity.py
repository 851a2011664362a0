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

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import ArrayType, DoubleType, LongType

_HP_SCALE = 1000


def _hash64_py(s: str) -> int:
    """Driver-side twin of operators.text.hash64 (first 15 md5 hex digits,
    base-16). Hyperplanes are query-time constants — computing them in
    Python keeps 2k+ md5 expressions out of the Catalyst plan (the
    expression-tree blowup made the LSH query ~40× slower than it should
    be; with plain double literals analysis cost is negligible)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length numeric arrays (JVM-side).

    Note: Spark higher-order functions are CodegenFallback — the lambda is
    interpreted per element. Fine for O(rows) work (norms, bucket bits);
    for O(pairs) scoring use dot_pd (Arrow-batched numpy), which is the
    hot path at scale."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@F.pandas_udf(DoubleType())
def dot_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched row-wise dot product: each batch becomes two dense
    (batch, dim) matrices and one vectorized einsum — the 100 TB path for
    pairwise scoring (~100× the interpreted zip_with/aggregate fold)."""
    va = np.stack(a.to_numpy())
    vb = np.stack(b.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", va, vb))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    max_block_bytes: int = 256 << 20,
    min_block_rows: int = 512,
    max_block_rows: int = 16384,
    num_blocks: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — exact baseline,
    block-nested loop.

    The corpus is hash-split into ``nb`` blocks, each bounded by
    ``max_block_bytes``; every unordered block pair (p ≤ q) becomes one
    cogroup, whose worker gets the two blocks as dense matrices and runs
    ONE BLAS matmul — entirely executor-side (the round-3 version
    round-tripped each block through the driver as toPandas()+broadcast;
    now the driver never touches a corpus row). A pair (a,b) is emitted
    exactly once: cross-block pairs live in exactly one (p,q) group, and
    the diagonal groups keep only the id-ordered triangle. Shuffle volume
    is O(n·nb·dim) replicated rows + O(result) — the naive pair join
    would move O(n²·dim). ``nb`` also floors at the square root of the
    cluster parallelism so the nb(nb+1)/2 groups keep every core busy
    even when the corpus fits one block.
    At real scale prefer lsh_cosine_topk / ivf_cosine_topk; this is the
    labeled exact oracle."""
    spark = emb.sparkSession
    src = emb.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    stats = src.agg(
        F.count(F.lit(1)).alias("n"), F.first(F.size("v")).alias("dim")
    ).head()
    n, dim = stats[0], stats[1]
    if n == 0:
        return spark.createDataFrame([], "id_a long, id_b long, cos double")
    nb_mem = -(-(n * dim * 8) // max_block_bytes)
    par = spark.sparkContext.defaultParallelism
    nb_par = int(np.ceil((np.sqrt(8 * par + 1) - 1) / 2))  # nb(nb+1)/2 >= par
    # Parallelism floor only helps while blocks stay matmul-sized: below
    # ~min_block_rows per block the per-cogroup Arrow/worker overhead
    # exceeds the BLAS win. Cap the floor by the row budget; the memory
    # bound always wins. (r5 sweep at sf0.1, 2000x64: the old broadcast
    # pair-join fan-out cost ~1.3s regardless of nb; the explode fan-out
    # + fused n/dim agg brought the whole query to ~0.5-0.8s with nb
    # 1-8 inside noise.)
    nb_rows = -(-n // min_block_rows)
    # Hard row cap per block: the matmul is chunked (below), but block
    # size still bounds the per-task INPUT matrices and the worst-case
    # result burst, and a 10x data step must grow the number of block
    # pairs, not the per-task working set (the r6 sf10 run OOM-killed
    # the host when 75k-row blocks met an unchunked |p| x |q| output).
    nb_cap = -(-n // max_block_rows)
    nb = int(max(1, nb_mem, nb_cap, min(nb_par, nb_rows)))
    if num_blocks is not None:  # explicit override (tuning/tests)
        nb = max(1, int(num_blocks))
    a = src.withColumn(
        "g", F.pmod(F.xxhash64("id"), F.lit(nb)).cast("int")
    )
    # two independent lineages of the same corpus; block-pair fan-out via
    # generators (a row in block g plays the p-role for every q >= g and
    # the q-role for every p <= g) — pure map-side, no join. The right
    # lineage renames id/v: both sides share the same source attributes,
    # and identical attribute ids across a self-cogroup make Catalyst's
    # column pruning drop the right side's payload columns.
    left = a.select(
        F.col("g").alias("p"),
        F.explode(F.sequence(F.col("g"), F.lit(nb - 1))).alias("q"),
        "id",
        "v",
    )
    right = a.select(
        F.explode(F.sequence(F.lit(0), F.col("g"))).alias("p"),
        F.col("g").alias("q"),
        F.col("id").alias("rid"),
        F.col("v").alias("rv"),
    )

    def score(key, lpdf, rpdf):
        p, q = key
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "cos": pd.Series(dtype="float64")}
            )
        lids = lpdf["id"].to_numpy()
        lmat = np.stack(lpdf["v"].to_numpy())
        lunit = lmat / np.linalg.norm(lmat, axis=1, keepdims=True)
        rids = rpdf["rid"].to_numpy()
        rmat = np.stack(rpdf["rv"].to_numpy())
        runit = rmat / np.linalg.norm(rmat, axis=1, keepdims=True)
        # Row-chunked matmul: peak memory is O(chunk x |q|) (~128 MB of
        # float64 here) regardless of block size — the full |p| x |q|
        # cosine matrix at large blocks is the thing that OOMs, and the
        # kept-pair density (not the scored-cell count) is what the
        # output actually costs.
        chunk = max(1, int((128 << 20) // (8 * max(len(rids), 1))))
        frames = []
        for lo in range(0, len(lids), chunk):
            cls = lids[lo : lo + chunk]
            cos = lunit[lo : lo + chunk] @ runit.T  # (chunk, |q|)
            keep = cos >= threshold
            if p == q:  # diagonal sees both orders — keep one triangle
                keep &= cls[:, None] < rids[None, :]
            ai, bj = np.nonzero(keep)
            if len(ai):
                frames.append(
                    pd.DataFrame(
                        {
                            "id_a": pd.Series(
                                np.minimum(cls[ai], rids[bj]), dtype="int64"
                            ),
                            "id_b": pd.Series(
                                np.maximum(cls[ai], rids[bj]), dtype="int64"
                            ),
                            "cos": pd.Series(cos[ai, bj], dtype="float64"),
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "cos": pd.Series(dtype="float64")}
            )
        return pd.concat(frames, ignore_index=True)

    out = (
        left.groupBy("p", "q")
        .cogroup(right.groupBy("p", "q"))
        .applyInPandas(score, schema="id_a long, id_b long, cos double")
    )
    return out.select("id_a", "id_b", F.round("cos", 4).alias("cos"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded).
    The queries side is broadcast — corpus never shuffles."""
    src = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    q_rows = queries.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    ).toPandas()
    q_ids = q_rows["id"].to_numpy()
    q_mat = np.stack(q_rows["v"].to_numpy())
    q_unit = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = src.sparkSession.sparkContext.broadcast((q_ids, q_unit))

    def score(batches):
        ids, unit = bc.value
        keep = 2 * k  # local candidates per query (buffer for boundary ties)
        for pdf in batches:
            cids = pdf["id"].to_numpy()
            cmat = np.stack(pdf["v"].to_numpy())
            cunit = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
            cos = cunit @ unit.T  # (batch, n_queries)
            # Quantize to a 1e-9 grid (half-up) BEFORE any ranking: the
            # oracle engine sums the dot product in a different order, and
            # a ~1-ulp disagreement at the rank-k boundary would flip the
            # neighbor set. Both sides rank the same quantized value.
            cos = np.floor(cos * 1e9 + 0.5) / 1e9
            cos[cids[:, None] == ids[None, :]] = -np.inf  # self-matches out
            # Map-side top-k: only each batch's best `keep` candidates per
            # query reach the shuffle (partial top-k, like partial agg).
            kth = min(keep, len(cids)) - 1
            top = np.argpartition(-cos, kth, axis=0)[: kth + 1]  # (keep, nq)
            qi = np.broadcast_to(np.arange(len(ids)), top.shape)
            sel = cos[top, qi] > -np.inf
            yield pd.DataFrame(
                {
                    "query_id": ids[qi[sel]],
                    "corpus_id": cids[top[sel]],
                    "cos": cos[top, qi][sel],
                }
            )

    # Queries broadcast as a dense matrix; the corpus streams through one
    # matmul per Arrow batch and only skinny (qid, cid, cos) rows reach the
    # per-query top-k window — the corpus vectors never leave their
    # partition.
    scored = src.mapInPandas(
        score, schema="query_id long, corpus_id long, cos double"
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


def hyperplane_values(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d ∈ [-500, 500)
    from the portable hash of 't{table}_p{plane}_d{d}'."""
    return [
        float(_hash64_py(f"t{table}_p{plane}_d{d}") % _HP_SCALE - _HP_SCALE // 2)
        for d in range(dim)
    ]


def hyperplane(table: int, plane: int, dim: int) -> Column:
    """Hyperplane as a literal double array (constants, no per-row work)."""
    return F.array(*[F.lit(c) for c in hyperplane_values(table, plane, dim)])


def lsh_bucket(vec: Column, table: int, n_planes: int, dim: int) -> Column:
    """B-bit bucket id: bit p = sign(vec · hyperplane_p). The planes are a
    literal array-of-arrays; the fold runs entirely JVM-side. (Kept as the
    expression-level reference; the batch path is lsh_buckets_udf.)"""
    planes = F.array(*[hyperplane(table, p, dim) for p in range(n_planes)])
    bits = F.transform(
        planes, lambda p: F.when(dot(vec, p) >= 0, 1).otherwise(0)
    )
    return F.aggregate(bits, F.lit(0), lambda acc, b: acc * 2 + b)


def lsh_buckets_udf(n_tables: int, n_planes: int, dim: int):
    """Pandas UDF: vec → array of ``n_tables`` bucket ids, all tables in
    one (batch, dim) × (dim, n_tables·n_planes) matmul per Arrow batch.
    Same bits as lsh_bucket (bit p of table t = sign(vec · plane_{t,p}),
    MSB-first fold) without 2k+ literal nodes in the Catalyst plan or
    per-element interpreted lambdas."""
    flat = np.array(
        [
            hyperplane_values(t, p, dim)
            for t in range(n_tables)
            for p in range(n_planes)
        ]
    )  # (n_tables*n_planes, dim)
    weights = 2 ** np.arange(n_planes - 1, -1, -1)  # bit 0 is the MSB

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (batch, dim)
        bits = (mat @ flat.T >= 0).astype(np.int64)
        vals = bits.reshape(len(mat), n_tables, n_planes) @ weights
        return pd.Series(list(vals))

    return buckets


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
        F.col(id_col).alias("corpus_id"),
        as_double(F.col(vec_col)).alias("vc"),
        norm(as_double(F.col(vec_col))).alias("nc"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("vq"),
        norm(as_double(F.col(vec_col))).alias("nq"),
    )

    buckets = lsh_buckets_udf(n_tables, n_planes, dim)

    def bucketed(df: DataFrame, vec: str) -> DataFrame:
        return df.select(
            "*", F.posexplode(buckets(F.col(vec))).alias("t", "bucket")
        )

    cb = bucketed(c, "vc")
    qb = bucketed(q, "vq")
    candidates = (
        cb.join(F.broadcast(qb), on=["t", "bucket"])
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select("query_id", "corpus_id", "vq", "vc", "nq", "nc")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return (
        candidates.withColumn(
            "cos", dot_pd(F.col("vq"), F.col("vc")) / (F.col("nq") * F.col("nc"))
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "corpus_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").alias("rank"),
        )
    )


def train_centroids(sample_unit: np.ndarray, n_centroids: int, iters: int = 10) -> np.ndarray:
    """Spherical k-means on a driver-sized sample (the FAISS-IVF coarse
    quantizer shape: the quantizer trains on a bounded sample regardless
    of corpus size). Deterministic: init = evenly spaced rows of the
    id-sorted sample; Lloyd iterations are pure numpy. Empty clusters
    keep their previous centroid. Returns unit-norm (n_centroids, dim)."""
    n = min(n_centroids, len(sample_unit))
    init_idx = np.linspace(0, len(sample_unit) - 1, n).astype(int)
    cent = sample_unit[init_idx].copy()
    for _ in range(iters):
        assign = (sample_unit @ cent.T).argmax(axis=1)
        acc = np.zeros_like(cent)
        np.add.at(acc, assign, sample_unit)
        counts = np.bincount(assign, minlength=n)
        nonempty = counts > 0
        cent[nonempty] = acc[nonempty]
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def ivf_assign_udf(centroids: np.ndarray):
    """Pandas UDF: vec → nearest-centroid id, one (batch, dim) × (dim, C)
    matmul per Arrow batch. The centroid matrix rides inside the UDF
    closure → serialized once per executor, like a broadcast."""

    @F.pandas_udf(LongType())
    def assign(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())
        unit = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        return pd.Series((unit @ centroids.T).argmax(axis=1).astype(np.int64))

    return assign


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_centroids: int = 32,
    n_probe: int = 4,
    max_train: int = 4096,
    kmeans_iters: int = 10,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path next
    to LSH (lsh_cosine_topk), same shape as FAISS IVF-Flat:

    1. TRAIN: a deterministic pseudo-random sample (ORDER BY xxhash64(id)
       LIMIT max_train — a scalable TakeOrdered, no full collect) trains a
       spherical-k-means coarse quantizer on the driver.
    2. ASSIGN: every corpus vector goes to its nearest centroid via one
       matmul per Arrow batch — a map-only pass; at 100 TB this is the
       materialized index table, partitioned by centroid_id.
    3. PROBE: each query scores all C centroids (driver-side, C is tiny)
       and takes the best n_probe → candidate lists are the union of
       n_probe inverted lists ≈ n_probe/C of the corpus.
    4. SCORE: candidates join on the short int centroid key (queries
       broadcast), exact cosine via Arrow-batched dot, per-query top-k
       window. Unlike LSH multi-probe, each corpus vector lives in exactly
       one list → no dropDuplicates pass.
    """
    src = corpus.select(
        F.col(id_col).cast("long").alias("corpus_id"),
        as_double(F.col(vec_col)).alias("vc"),
    )
    train_pdf = (
        src.orderBy(F.xxhash64(F.col("corpus_id")))
        .limit(max_train)
        .toPandas()
        .sort_values("corpus_id")
    )
    train_mat = np.stack(train_pdf["vc"].to_numpy())
    train_unit = train_mat / np.maximum(
        np.linalg.norm(train_mat, axis=1, keepdims=True), 1e-12
    )
    cent = train_centroids(train_unit, n_centroids, kmeans_iters)

    assigned = src.select(
        "corpus_id",
        "vc",
        norm(F.col("vc")).alias("nc"),
        ivf_assign_udf(cent)(F.col("vc")).alias("cid"),
    )

    q_rows = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        as_double(F.col(vec_col)).alias("vq"),
    ).toPandas()
    q_mat = np.stack(q_rows["vq"].to_numpy())
    q_unit = q_mat / np.maximum(
        np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12
    )
    probe = np.argsort(-(q_unit @ cent.T), axis=1)[:, :n_probe]
    probe_pdf = pd.DataFrame(
        {
            "query_id": np.repeat(q_rows["query_id"].to_numpy(), n_probe),
            "cid": probe.ravel().astype(np.int64),
            "vq": [v for v in q_rows["vq"] for _ in range(n_probe)],
        }
    )
    spark = corpus.sparkSession
    probe_df = spark.createDataFrame(probe_pdf).withColumn(
        "nq", norm(F.col("vq"))
    )

    candidates = (
        assigned.join(F.broadcast(probe_df), on="cid")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select("query_id", "corpus_id", "vq", "vc", "nq", "nc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return (
        candidates.withColumn(
            "cos", dot_pd(F.col("vq"), F.col("vc")) / (F.col("nq") * F.col("nc"))
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "corpus_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rank"),
        )
    )


def ivf_candidate_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_centroids: int | None = None,
    n_probe: int = 4,
    target_rows_per_cell: int = 256,
    max_centroids: int = 4096,
    kmeans_iters: int = 10,
    chunk_rows: int = 2048,
) -> DataFrame:
    """IVF-bucketed near-dup candidate pairs — the executable 100 TB path
    for semantic dedup (SemDeDup-style), replacing the exact block-nested
    ``cosine_pairs`` all-pairs scan.

    1. TRAIN: same bounded-sample spherical-k-means coarse quantizer as
       ``ivf_cosine_topk`` (deterministic, driver-sized regardless of
       corpus size).  ``n_centroids`` defaults to ADAPTIVE —
       C ≈ n·n_probe / target_rows_per_cell, so cell size stays constant
       as the corpus grows and total pair work Σ|cell|² ≈ C·cell² ≈
       n·n_probe·cell is LINEAR in n (a fixed C would leave it
       quadratic, n²·n_probe²/C).  The train sample scales with C
       (≥ 4 rows per centroid) but stays driver-bounded.
    2. MULTI-PROBE ASSIGN: every vector joins its ``n_probe`` nearest
       cells (one Arrow-batched matmul per batch) — multi-probe on the
       INDEX side, so two vectors are candidates iff their probe sets
       intersect; a near-dup pair straddling a cell boundary is still
       caught when either's second-choice cell is the other's first.
    3. PAIR: one ``applyInPandas`` per cell — ids sorted, one chunked
       BLAS matmul per cell, emit the id-ordered triangle with exact
       cosine ≥ ``threshold``.  The shuffle key is a short int cell id.
       A pair co-probed into multiple cells is emitted per cell and
       deduped once at the end (≤ n_probe duplicates per pair).

    Candidates are EXACT-verified (step 3 computes true cosine), so the
    result is a subset of the ``cosine_pairs`` ground truth: precision is
    1.0 by construction and only recall is approximate — which is what
    the ``semantic_dedup_ivf`` gate asserts a floor on.
    """
    spark = emb.sparkSession
    src = emb.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    if n_centroids is None:
        n = src.count()
        n_centroids = int(
            min(max(8, n * n_probe // target_rows_per_cell), max_centroids)
        )
    max_train = min(max(4096, 4 * n_centroids), 16384)
    train_pdf = (
        src.orderBy(F.xxhash64(F.col("id")))
        .limit(max_train)
        .toPandas()
        .sort_values("id")
    )
    if len(train_pdf) == 0:
        return spark.createDataFrame([], "id_a long, id_b long, cos double")
    train_mat = np.stack(train_pdf["v"].to_numpy())
    train_unit = train_mat / np.maximum(
        np.linalg.norm(train_mat, axis=1, keepdims=True), 1e-12
    )
    cent = train_centroids(train_unit, n_centroids, kmeans_iters)
    probe = min(n_probe, len(cent))

    @F.pandas_udf(ArrayType(LongType()))
    def probe_cells(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())
        unit = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        order = np.argsort(-(unit @ cent.T), axis=1)[:, :probe]
        return pd.Series(list(order.astype(np.int64)))

    assigned = src.select(
        "id", "v", F.explode(probe_cells("v")).alias("cell")
    )

    def pairs_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(pdf["v"].to_numpy())[order]
        unit = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        out = []
        # chunk the |cell| x |cell| matmul so the per-task working set is
        # bounded by chunk_rows x |cell| regardless of cell size
        for s in range(0, len(ids), chunk_rows):
            block = unit[s : s + chunk_rows] @ unit.T
            rows, cols = np.nonzero(block >= threshold)
            gi = rows + s
            keep = cols > gi  # id-ordered upper triangle only
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[gi[keep]],
                            "id_b": ids[cols[keep]],
                            "cos": block[rows[keep], cols[keep]],
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "cos": pd.Series(dtype="float64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    pairs = assigned.groupBy("cell").applyInPandas(
        pairs_in_cell, "id_a long, id_b long, cos double"
    )
    return pairs.dropDuplicates(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-compression ANN path
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    sample_unit: np.ndarray, m: int, ksub: int, iters: int = 10
) -> np.ndarray:
    """Per-subspace Euclidean k-means codebooks, FAISS-PQ shape: split
    dim into ``m`` contiguous subvectors, learn ``ksub`` centroids per
    subspace on a driver-sized sample. Deterministic like
    train_centroids: init = evenly spaced rows of the id-sorted sample,
    pure-numpy Lloyd, empty clusters keep their previous centroid.
    Returns (m, ksub, dim // m)."""
    n, dim = sample_unit.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        sub = sample_unit[:, j * dsub : (j + 1) * dsub]
        k = min(ksub, len(sub))
        init_idx = np.linspace(0, len(sub) - 1, k).astype(int)
        cent = sub[init_idx].copy()
        for _ in range(iters):
            d2 = (
                (sub**2).sum(1)[:, None]
                - 2.0 * sub @ cent.T
                + (cent**2).sum(1)[None, :]
            )
            assign = d2.argmin(1)
            acc = np.zeros_like(cent)
            np.add.at(acc, assign, sub)
            counts = np.bincount(assign, minlength=k)
            nz = counts > 0
            cent[nz] = acc[nz] / counts[nz, None]
        books.append(cent)
    return np.stack(books)


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    m: int = 8,
    ksub: int = 16,
    max_train: int = 4096,
    kmeans_iters: int = 10,
    rerank: int = 4,
) -> DataFrame:
    """PQ approximate top-k with exact re-rank — the third scale path
    next to LSH and IVF, FAISS PQx-ADC shape:

    1. TRAIN: same deterministic sample protocol as IVF (ORDER BY
       xxhash64(id) LIMIT max_train), per-subspace codebooks on the
       driver. Vectors are unit-normalized first, so the asymmetric
       distance Σⱼ dot(qⱼ, c_{j,code_j}) approximates the cosine.
    2. ENCODE: map-only Pandas UDF vec → m uint8-range codes. At 100 TB
       this is the materialized index: m bytes per vector (64× smaller
       than the float64 vector) — PQ's contract is COMPRESSION of the
       scan, not candidate pruning, which is why it composes with IVF.
    3. ADC SCAN: each partition of the code table is scanned against the
       per-query lookup tables (m·ksub dots per query, built driver-side
       and shipped in the UDF closure); the partition emits only its
       per-query top rerank·k rows, so the shuffle after the linear scan
       is bounded by partitions × queries × rerank·k.
    4. RE-RANK: the ≤ rerank·k·partitions candidates per query get exact
       cosines (broadcast query vectors, Arrow dot), window top-k.
    """
    src = corpus.select(
        F.col(id_col).cast("long").alias("corpus_id"),
        as_double(F.col(vec_col)).alias("vc"),
    )
    train_pdf = (
        src.orderBy(F.xxhash64(F.col("corpus_id")))
        .limit(max_train)
        .toPandas()
        .sort_values("corpus_id")
    )
    train_mat = np.stack(train_pdf["vc"].to_numpy())
    train_unit = train_mat / np.maximum(
        np.linalg.norm(train_mat, axis=1, keepdims=True), 1e-12
    )
    books = train_pq_codebooks(train_unit, m, ksub, kmeans_iters)
    dsub = books.shape[2]

    q_rows = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        as_double(F.col(vec_col)).alias("vq"),
    ).toPandas()
    q_ids = q_rows["query_id"].to_numpy()
    q_mat = np.stack(q_rows["vq"].to_numpy())
    q_unit = q_mat / np.maximum(
        np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12
    )
    # LUT[qi, j, c] = dot(q_j, book[j, c]); ADC score = Σ_j LUT[qi, j, code_j]
    lut = np.einsum(
        "qjd,jcd->qjc", q_unit.reshape(len(q_unit), m, dsub), books
    )
    n_keep = rerank * k

    def adc_scan(batches):
        """Per-partition ADC: linear scan of the code table, emit the
        partition-local top n_keep per query."""
        best: dict[int, list] = {}  # query idx -> [(score, corpus_id)]
        for pdf in batches:
            mat = np.stack(pdf["vc"].to_numpy())
            unit = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            codes = np.empty((len(mat), m), dtype=np.int64)
            for j in range(m):
                sub = unit[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (sub**2).sum(1)[:, None]
                    - 2.0 * sub @ books[j].T
                    + (books[j] ** 2).sum(1)[None, :]
                )
                codes[:, j] = d2.argmin(1)
            # scores: (queries, batch) via LUT gather; ids hoisted out
            # of the query loop, argpartition instead of a full sort
            # (only the top n_keep matter)
            jj = np.arange(m)
            ids = pdf["corpus_id"].to_numpy()
            for qi in range(len(q_ids)):
                s = lut[qi][jj[None, :], codes].sum(axis=1)
                k_eff = min(n_keep + 1, len(s))
                part = np.argpartition(-s, k_eff - 1)[:k_eff]
                keep = part[np.argsort(-s[part])]
                cur = best.setdefault(qi, [])
                cur.extend(
                    (float(s[i]), int(ids[i]))
                    for i in keep
                    if int(ids[i]) != int(q_ids[qi])
                )
                cur.sort(key=lambda t: (-t[0], t[1]))
                del cur[n_keep:]
        rows = [
            (int(q_ids[qi]), cid)
            for qi, lst in best.items()
            for (_s, cid) in lst
        ]
        yield pd.DataFrame(
            rows or [(None, None)], columns=["query_id", "corpus_id"]
        ).dropna().astype("int64")

    cand = src.mapInPandas(
        adc_scan, schema="query_id long, corpus_id long"
    )

    spark = corpus.sparkSession
    q_df = spark.createDataFrame(q_rows).withColumn(
        "nq", norm(F.col("vq"))
    )
    reranked = (
        cand.join(src, "corpus_id")
        .join(F.broadcast(q_df), "query_id")
        .withColumn("nc", norm(F.col("vc")))
        .withColumn(
            "cos",
            dot_pd(F.col("vq"), F.col("vc")) / (F.col("nq") * F.col("nc")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return (
        reranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "corpus_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rank"),
        )
    )
