"""Round-5 LLM-data wave: corpus statistics for training-data curation —
n-gram novelty scoring (per-source contribution of first-seen n-grams),
the token frequency spectrum (counts-of-counts, the Zipf/Good-Turing
diagnostic), and a least-squares Zipf slope fit.

Scale shapes: everything is explode → hash aggregate → (one) join — no
windows over row data, no driver loops. The novelty join keys on the
n-gram itself; a pathologically hot gram is one row on the build side,
and AQE skew-join splits the probe side if a single gram's postings
dominate a partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.text import shingles, tokenize
from ..session import widen_scan
from .llm import _SHINGLE_CTE
from .registry import query, tables

#: Quantizer shared with ch_aggregates_w7: order-independent integer
#: sums of per-row double terms.
_Q = 1_000_000_000


@query(
    "ngram_novelty",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    g AS (SELECT w2.doc_id, w2.source, unnest(sh.s) AS g
          FROM sh JOIN (SELECT doc_id, source FROM documents) w2
            ON sh.doc_id = w2.doc_id),
    first AS (SELECT g, MIN(doc_id) AS fd FROM g GROUP BY g),
    per AS (
        SELECT g.doc_id, g.source,
               COUNT(*) AS ng,
               SUM(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END) AS novel
        FROM g JOIN first f USING (g)
        GROUP BY g.doc_id, g.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(novel) AS BIGINT) AS novel_grams,
           CAST(SUM(ng) AS BIGINT) AS total_grams,
           CAST(ROUND(SUM(novel) / CAST(SUM(ng) AS DOUBLE), 6) AS DOUBLE)
               AS novelty
    FROM per GROUP BY source ORDER BY source
    """,
)
def ngram_novelty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty / contribution scoring: for each source, the share
    of its documents' distinct 3-grams that FIRST appear (lowest doc_id)
    in that document — the de-duplicated marginal contribution a curation
    pipeline uses to decide whether a source still adds new text or only
    repeats the corpus.

    Join-free plan (r6 rewrite, 6.6 s -> ~1 s at sf0.1): a doc's novel
    count is exactly the number of grams whose corpus-wide MIN(doc_id)
    is that doc, so ``first.groupBy(fd).count()`` replaces the gram-keyed
    join back (which re-shuffled the full gram string stream a second
    time), and each doc's total gram count is just the SIZE of its
    distinct-shingle array — no explode at all on that side.  What
    remains is ONE gram-keyed aggregate (map-side combined) plus
    doc-cardinality rollups; at 100 TB the only heavy exchange is the
    unavoidable distinct-gram min, at one pass instead of three."""
    d = widen_scan(tables(spark, sf_dir)["documents"])
    grams = shingles(tokenize(F.col("text")), 3)
    per_doc = d.select(
        "doc_id", "source", F.size(grams).alias("ng")
    )
    sh = d.select("doc_id", F.explode(grams).alias("g"))
    novel_per_doc = (
        sh.groupBy("g")
        .agg(F.min("doc_id").alias("fd"))
        .groupBy("fd")
        .agg(F.count(F.lit(1)).alias("novel"))
    )
    per = per_doc.join(
        novel_per_doc, per_doc.doc_id == novel_per_doc.fd, "left"
    ).select(
        "doc_id", "source", "ng", F.coalesce("novel", F.lit(0)).alias("novel")
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("novel").cast("long").alias("novel_grams"),
            F.sum("ng").cast("long").alias("total_grams"),
            F.round(
                F.sum("novel") / F.sum("ng").cast("double"), 6
            )
            .cast("double")
            .alias("novelty"),
        )
        .orderBy("source")
    )


@query(
    "token_frequency_spectrum",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    g AS (SELECT unnest(s) AS g FROM sh),
    tc AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY g)
    SELECT CAST(CASE WHEN c <= 20 THEN c ELSE 21 END AS BIGINT)
               AS freq_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_tokens
    FROM tc GROUP BY 1 ORDER BY 1
    """,
)
def token_frequency_spectrum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frequency-of-frequencies spectrum over 3-gram types (document
    frequency k, capped at 20 with a tail bucket) — the Good-Turing /
    vocabulary-growth diagnostic a tokenizer-training pipeline reads
    before choosing vocab size.  3-grams rather than unigrams because
    the spectrum of a bounded unigram vocabulary saturates; the n-gram
    type space keeps growing with the corpus.  Two chained hash
    aggregates, both map-side combined; the second runs on |types|
    rows."""
    d = widen_scan(tables(spark, sf_dir)["documents"])
    g = d.select(
        F.explode(shingles(tokenize(F.col("text")), 3)).alias("g")
    )
    tc = g.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return (
        tc.groupBy(
            F.when(F.col("c") <= 20, F.col("c"))
            .otherwise(F.lit(21))
            .cast("long")
            .alias("freq_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
        .orderBy("freq_bucket")
    )


@query(
    "zipf_fit",
    oracle="""
    WITH w AS (SELECT list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> length(x) > 0) AS ws
               FROM documents),
    tok AS (SELECT unnest(ws) AS t FROM w),
    tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t),
    top AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS r
            FROM tc ORDER BY c DESC, t LIMIT 1000),
    q AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(FLOOR(LN(CAST(r AS DOUBLE)) * 1e9 + 0.5)
                        AS BIGINT)) AS sx,
               SUM(CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1e9 + 0.5)
                        AS BIGINT)) AS sy,
               SUM(CAST(FLOOR(LN(CAST(r AS DOUBLE))
                              * LN(CAST(r AS DOUBLE)) * 1e9 + 0.5)
                        AS BIGINT)) AS sxx,
               SUM(CAST(FLOOR(LN(CAST(r AS DOUBLE))
                              * LN(CAST(c AS DOUBLE)) * 1e9 + 0.5)
                        AS BIGINT)) AS sxy
        FROM top
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
           CAST(ROUND(
             (n * (CAST(sxy AS DOUBLE) / 1e9)
              - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
             / (n * (CAST(sxx AS DOUBLE) / 1e9)
                - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9)),
             6) AS DOUBLE) AS zipf_slope
    FROM q
    """,
)
def zipf_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law slope: least-squares fit of ln(freq) against ln(rank)
    over the top-1000 tokens (a healthy natural corpus sits near −1; a
    templated/boilerplate corpus flattens).  The top-1000 comes from a
    distributed TakeOrdered (never a global sort); the 1000-row rank
    window is metadata-scale by construction.  Per-rank log terms are
    quantized to int64 before summing (the w7 discipline) so the slope
    is accumulation-order-proof; one double expression at the end."""
    from pyspark.sql import Window

    d = tables(spark, sf_dir)["documents"]
    tok = d.select(F.explode(tokenize(F.col("text"))).alias("t"))
    tc = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    top = (
        tc.orderBy(F.col("c").desc(), "t")
        .limit(1000)
        .withColumn(
            "r",
            F.row_number().over(Window.orderBy(F.col("c").desc(), "t")),
        )
    )

    def _q(col):
        return F.floor(col * F.lit(_Q) + F.lit(0.5)).cast("long")

    lr = F.log(F.col("r").cast("double"))
    lc = F.log(F.col("c").cast("double"))
    q = top.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(_q(lr)).alias("sx"),
        F.sum(_q(lc)).alias("sy"),
        F.sum(_q(lr * lr)).alias("sxx"),
        F.sum(_q(lr * lc)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    # de-quantize each sum BEFORE combining: the quantum does not cancel
    # in (n·Sxy − Sx·Sy)/(n·Sxx − Sx²) because the products mix one
    # quantized factor with two (caught by test_zipf_slope_model)
    sx = F.col("sx").cast("double") / F.lit(1e9)
    sy = F.col("sy").cast("double") / F.lit(1e9)
    sxx = F.col("sxx").cast("double") / F.lit(1e9)
    sxy = F.col("sxy").cast("double") / F.lit(1e9)
    return q.select(
        F.col("n").cast("long").alias("n_ranks"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        .cast("double")
        .alias("zipf_slope"),
    )


@query(
    "kmeans_clusters",
    oracle="""
    WITH e AS (SELECT vec_id AS id,
                      list_transform(embedding,
                          -- promote BEFORE multiplying: FLOAT * INT
                          -- runs in single precision in DuckDB and
                          -- crosses .5 differently than Spark's double
                          x -> CAST(round(CAST(x AS DOUBLE) * 1000000)
                                    AS BIGINT)) AS a
               FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cl, a AS c
           FROM e ORDER BY id LIMIT 4),
    j1 AS (SELECT e.id, e.a,
                  MIN(list_sum(list_transform(range(1, 65),
                        i -> (e.a[i] - c0.c[i]) * (e.a[i] - c0.c[i])))
                      * 4 + c0.cl) AS enc
           FROM e CROSS JOIN c0 GROUP BY e.id, e.a),
    a1 AS (SELECT id, a, enc % 4 AS cl FROM j1),
    n1 AS (SELECT cl, COUNT(*) AS n FROM a1 GROUP BY cl),
    s1 AS (SELECT cl, t.i, SUM(a[t.i]) AS s
           FROM a1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
           GROUP BY cl, t.i),
    c1 AS (SELECT s1.cl, list(s1.s // n1.n ORDER BY s1.i) AS c
           FROM s1 JOIN n1 USING (cl) GROUP BY s1.cl, n1.n),
    j2 AS (SELECT e.id,
                  MIN(list_sum(list_transform(range(1, 65),
                        i -> (e.a[i] - c1.c[i]) * (e.a[i] - c1.c[i])))
                      * 4 + c1.cl) AS enc
           FROM e CROSS JOIN c1 GROUP BY e.id),
    a2 AS (SELECT id, enc % 4 AS cl, enc // 4 AS dist FROM j2)
    SELECT CAST(cl AS BIGINT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(dist // 1000) AS BIGINT) AS inertia_k
    FROM a2 GROUP BY cl ORDER BY cl
    """,
)
def kmeans_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic integer k-means (operators/kmeans.py): two exact
    Lloyd iterations, k=4, lowest-id init, over the embeddings table.
    Everything is int64 (quantized vectors, exact squared-L2, argmin
    with encoded tie-breaks, truncating integer centroid means), so the
    full iterative trajectory — normally where float accumulation order
    breaks cross-engine reproducibility — is bit-identical between
    Spark and the DuckDB oracle's hand-unrolled two iterations."""
    from ..operators.kmeans import kmeans_report

    e = tables(spark, sf_dir)["embeddings"]
    return kmeans_report(e, "vec_id", "embedding", k=4, iters=2)


@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    g0 AS (SELECT w2.source, unnest(sh.s) AS g
           FROM sh JOIN (SELECT doc_id, source FROM documents) w2
             ON sh.doc_id = w2.doc_id),
    g AS (SELECT DISTINCT source, g FROM g0),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY source),
    px AS (SELECT a.source AS src_a, b.source AS src_b,
                  CAST(COUNT(*) AS BIGINT) AS inter
           FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
           GROUP BY 1, 2)
    SELECT px.src_a, px.src_b, px.inter,
           CAST(ROUND(CAST(px.inter AS DOUBLE)
                      / (sa.n + sb.n - px.inter), 6) AS DOUBLE) AS jaccard
    FROM px JOIN sz sa ON sa.source = px.src_a
            JOIN sz sb ON sb.source = px.src_b
    WHERE CAST(px.inter AS DOUBLE) / (sa.n + sb.n - px.inter) >= 0.01
    ORDER BY src_a, src_b
    """,
)
def source_overlap_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix: Jaccard similarity of the distinct
    3-gram vocabularies of every source pair (reported above 1% — the
    cross-source contamination diagnostic a mixture designer reads
    before weighting sources).  Shape: one explode + distinct, a
    gram-keyed self-join whose fan-out per gram is bounded by the
    SOURCE count (never the corpus), and a |sources|² rollup — the
    same inverted-index pattern as ngram_jaccard_pairs lifted from
    documents to sources."""
    d = widen_scan(tables(spark, sf_dir)["documents"])
    g = d.select(
        "source",
        F.explode(shingles(tokenize(F.col("text")), 3)).alias("g"),
    )
    # ONE gram-keyed shuffle (r14, guide §2.4): collect each gram's
    # source SET (collect_set partial-aggregates map-side, so per-map
    # rows carry at most |sources| entries), then both the per-source
    # distinct-gram sizes and every pairwise intersection fall out of
    # the ≤|sources|-sized array with map-side transforms + tiny aggs.
    # The old shape paid a (source, g) distinct exchange PLUS a
    # gram-keyed self-join (a second full gram shuffle and a per-gram
    # fanout); lazy localCheckpoint shares the gram agg between the two
    # consumers instead of recomputing it (the dedup-front discipline).
    grp = (
        g.groupBy("g")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .localCheckpoint(eager=False)
    )
    sz = (
        grp.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    pair_combos = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    px = (
        grp.select(F.explode(pair_combos).alias("p"))
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    j = (
        px.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).cast("double"),
        )
        .filter(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter"))
            >= 0.01
        )
    )
    return j.select("src_a", "src_b", "inter", "jaccard").orderBy(
        "src_a", "src_b"
    )
