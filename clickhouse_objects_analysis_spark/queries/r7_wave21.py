"""Round-7 session-21 queries: dedup-method overlap and a
deterministic Poisson bootstrap.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has neither; the overlap query is the meta-analysis that
justifies WHICH near-dup detectors a pipeline stacks (methods that
flag the same pairs are redundant; disjoint ones are complementary),
and the bootstrap gives interval estimates without an RNG — the
md5-uniform → inverse-CDF trick that makes resampling reproducible
across engines and reruns."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import char_ngram_jaccard_pairs, ngram_jaccard_pairs
from ..operators.text import quality_score
from .llm import _SCORED_CTE, _SHINGLE_CTE
from .registry import query, tables


@query(
    "dedup_method_overlap",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_SCORED_CTE},
    wordp AS (SELECT id_a, id_b FROM scored
              WHERE inter / (la + lb - inter) >= 0.5),
    cs AS (SELECT doc_id,
                  list_distinct([substr(text, i, 5)
                                 for i in range(1, length(text) - 3)]) AS sh
           FROM documents WHERE length(text) >= 5),
    cix0 AS (SELECT doc_id, unnest(sh) AS g FROM cs),
    cstop AS (SELECT g FROM cix0 GROUP BY g HAVING COUNT(*) > 200),
    cix AS (SELECT * FROM cix0 WHERE g NOT IN (SELECT g FROM cstop)),
    cinter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      CAST(COUNT(*) AS DOUBLE) AS inter
               FROM cix a JOIN cix b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
    csz AS (SELECT doc_id, len(sh) AS sz FROM cs),
    charp AS (SELECT id_a, id_b FROM cinter
              JOIN csz sa ON sa.doc_id = id_a
              JOIN csz sb ON sb.doc_id = id_b
              WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
    u AS (SELECT COALESCE(w.id_a, c.id_a) AS id_a,
                 w.id_a IS NOT NULL AS in_word,
                 c.id_a IS NOT NULL AS in_char
          FROM wordp w
          FULL JOIN charp c ON w.id_a = c.id_a AND w.id_b = c.id_b)
    SELECT CAST(SUM(CASE WHEN in_word AND NOT in_char THEN 1 ELSE 0 END)
                AS BIGINT) AS word_only,
           CAST(SUM(CASE WHEN in_char AND NOT in_word THEN 1 ELSE 0 END)
                AS BIGINT) AS char_only,
           CAST(SUM(CASE WHEN in_word AND in_char THEN 1 ELSE 0 END)
                AS BIGINT) AS both_methods,
           FLOOR(CAST(SUM(CASE WHEN in_word AND in_char THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
               AS pair_jaccard
    FROM u
    """,
)
def dedup_method_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-analysis of the dedup stack: compare the PAIR SETS found
    by word-trigram Jaccard ≥ 0.5 and char-5-gram Jaccard ≥ 0.5 —
    pairs found only by words, only by chars, by both, and the Jaccard
    of the two pair sets. High overlap ⇒ the methods are redundant
    (drop one at 100 TB); low ⇒ complementary detectors that should
    stack. One full outer join of two already-bounded pair streams;
    every figure is an exact integer (the set-Jaccard is one
    floor-quantized ratio)."""
    d = tables(spark, sf_dir)["documents"]
    wordp = ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.5).select(
        "id_a", "id_b", F.lit(True).alias("in_word")
    )
    charp = char_ngram_jaccard_pairs(
        d, "doc_id", "text", k=5, threshold=0.5, max_df=200
    ).select("id_a", "id_b", F.lit(True).alias("in_char"))
    u = wordp.join(charp, ["id_a", "id_b"], "full_outer").select(
        F.coalesce("in_word", F.lit(False)).alias("w"),
        F.coalesce("in_char", F.lit(False)).alias("c"),
    )
    return u.agg(
        F.sum((F.col("w") & ~F.col("c")).cast("long"))
        .cast("long")
        .alias("word_only"),
        F.sum((F.col("c") & ~F.col("w")).cast("long"))
        .cast("long")
        .alias("char_only"),
        F.sum((F.col("w") & F.col("c")).cast("long"))
        .cast("long")
        .alias("both_methods"),
        (
            F.floor(
                F.sum((F.col("w") & F.col("c")).cast("long")).cast("double")
                / F.count("*")
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("pair_jaccard"),
    )


#: Poisson(1) inverse-CDF thresholds P(X <= k), written as literals so
#: both engines branch on identical doubles.
_POIS = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253,
]

_POIS_CASE_SQL = "CASE " + " ".join(
    f"WHEN u < {t!r} THEN {k}" for k, t in enumerate(_POIS)
) + " ELSE 8 END"


@query(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH q AS (
        SELECT doc_id,
               CAST(FLOOR((0.4 * least(len(ws) / 100.0, 1.0)
                     + 0.4 * len(list_distinct(ws))
                           / greatest(len(ws), 1)::DOUBLE
                     + 0.2 * (1 - least(punct
                           / greatest(n_chars, 1)::DOUBLE * 10, 1.0)))
                     * 1000000 + 0.5) AS BIGINT) AS q_micro
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> length(x) > 0) AS ws,
                     length(text) AS n_chars,
                     length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                         AS punct
              FROM documents)),
    reps AS (SELECT unnest(range(1, 33)) AS b),
    w AS (SELECT q.doc_id, q.q_micro, reps.b,
                 (('0x' || substr(md5(CAST(q.doc_id AS VARCHAR) || ':'
                                      || CAST(reps.b AS VARCHAR)), 1, 15))
                  ::BIGINT) / 1152921504606846976.0 AS u
          FROM q CROSS JOIN reps),
    wt AS (SELECT doc_id, q_micro, b, {_POIS_CASE_SQL} AS wgt FROM w),
    rep_means AS (
        SELECT b,
               CAST(SUM(wgt * q_micro) AS DOUBLE) / SUM(wgt) AS m
        FROM wt GROUP BY b),
    pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(q_micro) AS BIGINT) AS sq FROM q)
    SELECT pt.n_docs,
           CAST(32 AS BIGINT) AS n_replicates,
           FLOOR(CAST(pt.sq AS DOUBLE) / pt.n_docs + 0.5) / 1000000.0
               AS mean_q,
           FLOOR(quantile_cont(rm.m, 0.025) + 0.5) / 1000000.0 AS ci_lo,
           FLOOR(quantile_cont(rm.m, 0.975) + 0.5) / 1000000.0 AS ci_hi
    FROM pt, rep_means rm
    GROUP BY pt.n_docs, pt.sq
    """,
)
def bootstrap_mean_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for the mean document quality — WITHOUT
    an RNG: each (doc, replicate) pair draws its resample weight by
    pushing a deterministic md5-uniform through the Poisson(1) inverse
    CDF (the standard streaming-bootstrap approximation of multinomial
    resampling), so the interval is bit-reproducible across engines,
    reruns, and partitionings. 32 replicates; each replicate mean is an
    exact integer ratio (weights and micro-qualities are integers), and
    the 2.5/97.5 percentiles interpolate over those 32 doubles.

    Scale shape: the B× fan-out is map-side (one crossJoin with a
    32-row literal frame — no shuffle of the corpus beyond the
    replicate groupBy, which is 32 map-side-combinable partials). At
    100 TB the per-replicate state is ONE (Σwq, Σw) pair — the whole
    bootstrap costs one pass over the data."""
    d = tables(spark, sf_dir)["documents"]
    q = d.select(
        "doc_id",
        F.floor(quality_score(F.col("text")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("q_micro"),
    ).localCheckpoint(eager=False)  # point estimate + fan-out both read
    reps = F.broadcast(spark.range(1, 33).select(F.col("id").alias("b")))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long") / F.lit(1152921504606846976.0)
    wgt = F.lit(8)
    for k in range(len(_POIS) - 1, -1, -1):
        wgt = F.when(F.col("u") < F.lit(_POIS[k]), F.lit(k)).otherwise(wgt)
    rep_means = (
        q.crossJoin(reps)
        .withColumn("u", u)
        .withColumn("wgt", wgt)
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("wgt") * F.col("q_micro")).cast("double")
                / F.sum("wgt")
            ).alias("m")
        )
    )
    pt = q.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("q_micro").cast("long").alias("sq"),
    )
    return (
        rep_means.crossJoin(F.broadcast(pt))
        .groupBy("n_docs", "sq")
        .agg(
            F.expr("percentile(m, 0.025)").alias("plo"),
            F.expr("percentile(m, 0.975)").alias("phi"),
        )
        .select(
            "n_docs",
            F.lit(32).cast("long").alias("n_replicates"),
            (
                F.floor(F.col("sq").cast("double") / F.col("n_docs") + F.lit(0.5))
                / F.lit(1000000.0)
            ).alias("mean_q"),
            (F.floor(F.col("plo") + F.lit(0.5)) / F.lit(1000000.0)).alias(
                "ci_lo"
            ),
            (F.floor(F.col("phi") + F.lit(0.5)) / F.lit(1000000.0)).alias(
                "ci_hi"
            ),
        )
    )
