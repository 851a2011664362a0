"""Round-9 query wave 3: sampling-design and curation-audit analytics —
Neyman optimal stratified allocation, cross-source vocabulary overlap,
and the quality×dedup filter confusion audit (with McNemar's test).

Reference parity note: none exist in the reference repo; they extend
the LLM-data-curation charter (how much to sample from each source,
how much sources overlap lexically, and whether two keep/drop filters
agree beyond chance).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import q6, query, tables

# ---------------------------------------------------------------------------
# neyman_allocation
# ---------------------------------------------------------------------------

_NEYMAN_N = 1000  # total sample budget to allocate


@query(
    "neyman_allocation",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_h,
               CAST(SUM(n_chars) AS BIGINT) AS sx,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY source
    ),
    v AS (
        SELECT source, n_h,
               sqrt((sxx - CAST(sx AS DOUBLE) * sx / n_h)
                    / (n_h - 1)) AS s_h
        FROM s WHERE n_h >= 2
    ),
    t AS (
        SELECT list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(
                           list_sort(list(struct_pack(
                               source := source,
                               w := n_h * s_h))),
                           x -> x.w)),
                   (a, b) -> a + b) AS denom
        FROM v
    )
    SELECT v.source, v.n_h,
           FLOOR(v.s_h * 1000000 + 0.5) / 1000000 AS s_h,
           CAST(FLOOR({_NEYMAN_N} * (v.n_h * v.s_h) / t.denom)
                AS BIGINT) AS n_alloc,
           FLOOR({_NEYMAN_N} * (v.n_h * v.s_h) / t.denom
                 * 1000000 + 0.5) / 1000000 AS n_exact
    FROM v CROSS JOIN t
    ORDER BY v.source
    """,
)
def neyman_allocation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation of a {_NEYMAN_N}-doc sample budget over
    source strata: n_h ∝ N_h·S_h (stratum size × stddev of doc length),
    the design that minimizes the variance of the stratified mean — the
    principled answer to 'how much should we sample from each source
    for the quality audit'. S_h comes from exact integer Σx/Σx² (one
    fixed IEEE tree); the denominator Σ N_h·S_h is folded over the
    source-sorted term list so both engines add the handful of doubles
    in the same order.

    Scale shape: one map-side-combined groupBy(source) carrying three
    integer aggregates; everything after is a strata-sized (≤ sources)
    computation."""
    d = tables(spark, sf_dir)["documents"]
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum("n_chars").cast("long").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("long")
        .alias("sxx"),
    )
    s_h = F.sqrt(
        (
            F.col("sxx")
            - F.col("sx").cast("double") * F.col("sx") / F.col("n_h")
        )
        / (F.col("n_h") - 1)
    )
    v = s.filter(F.col("n_h") >= 2).select(
        "source", "n_h", s_h.alias("s_h")
    )
    t = v.agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("source"),
                            (F.col("n_h") * F.col("s_h")).alias("w"),
                        )
                    )
                ),
                lambda x: x.getField("w"),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("denom")
    )
    share = F.lit(_NEYMAN_N) * (F.col("n_h") * F.col("s_h")) / F.col("denom")
    return (
        v.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_h",
            q6(F.col("s_h")).alias("s_h"),
            F.floor(share).cast("long").alias("n_alloc"),
            q6(share).alias("n_exact"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# source_vocab_overlap
# ---------------------------------------------------------------------------


@query(
    "source_vocab_overlap",
    oracle="""
    WITH v AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab
           FROM v GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_shared,
           sa.vocab AS vocab_a, sb.vocab AS vocab_b,
           FLOOR(CAST(i.n_shared AS DOUBLE)
                 / (sa.vocab + sb.vocab - i.n_shared)
                 * 1000000 + 0.5) / 1000000 AS jaccard,
           FLOOR(CAST(i.n_shared AS DOUBLE) / sa.vocab
                 * 1000000 + 0.5) / 1000000 AS containment_a,
           FLOOR(CAST(i.n_shared AS DOUBLE) / sb.vocab
                 * 1000000 + 0.5) / 1000000 AS containment_b
    FROM inter i JOIN sz sa ON i.src_a = sa.source
                 JOIN sz sb ON i.src_b = sb.source
    ORDER BY i.src_a, i.src_b
    """,
)
def source_vocab_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap matrix: Jaccard and both
    directional containments of the distinct-token sets of every source
    pair — the lexical-diversity diagnostic behind mixture re-weighting
    (two sources with containment ≈ 1 add tokens, not coverage).

    Scale shape: the vocabulary relation is one distinct over
    (source, token) — map-side combined; the pair intersection joins on
    the TOKEN (the inverted-index discipline: posting lists are
    per-token source lists, bounded by the source count, so the pair
    stream is Σ_token C(sources_with_token, 2) ≤ C(S,2)·vocab — linear
    in vocabulary for fixed source count); sizes broadcast."""
    d = tables(spark, sf_dir)["documents"]
    v = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds sizes AND the pair join
    )
    sz = v.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab")
    )
    inter = (
        v.alias("a")
        .join(
            v.alias("b"),
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("vocab").alias("vocab_a"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("vocab").alias("vocab_b"))
    ns = F.col("n_shared").cast("double")
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "vocab_a",
            "vocab_b",
            q6(
                ns / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared"))
            ).alias("jaccard"),
            q6(ns / F.col("vocab_a")).alias("containment_a"),
            q6(ns / F.col("vocab_b")).alias("containment_b"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# quality_dedup_confusion
# ---------------------------------------------------------------------------


@query(
    "quality_dedup_confusion",
    oracle="""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
    q AS (SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_words,
                 CAST(SUM(length(w)) AS BIGINT) AS n_chars_w
          FROM w GROUP BY doc_id),
    flags AS (
        SELECT d.doc_id,
               CASE WHEN q.n_words >= 20
                     AND CAST(q.n_chars_w AS DOUBLE) / q.n_words <= 8.0
                    THEN 1 ELSE 0 END AS keep_quality,
               CASE WHEN d.doc_id = MIN(d.doc_id) OVER (
                        PARTITION BY md5(lower(d.text)))
                    THEN 1 ELSE 0 END AS keep_dedup
        FROM documents d JOIN q ON d.doc_id = q.doc_id
    ),
    c AS (
        SELECT CAST(SUM(keep_quality * keep_dedup) AS BIGINT) AS n11,
               CAST(SUM(keep_quality * (1 - keep_dedup)) AS BIGINT)
                   AS n10,
               CAST(SUM((1 - keep_quality) * keep_dedup) AS BIGINT)
                   AS n01,
               CAST(SUM((1 - keep_quality) * (1 - keep_dedup))
                    AS BIGINT) AS n00
        FROM flags
    )
    SELECT n11, n10, n01, n00,
           FLOOR(CAST(n11 + n00 AS DOUBLE) / (n11 + n10 + n01 + n00)
                 * 1000000 + 0.5) / 1000000 AS agreement,
           CASE WHEN n10 + n01 = 0 THEN 0.0
                ELSE FLOOR(CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
                           / (n10 + n01) * 1000000 + 0.5) / 1000000
           END AS mcnemar_chi2
    FROM c
    """,
)
def quality_dedup_confusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the quality filter and the exact-dedup filter agree? The 2×2
    keep/drop confusion table (n11/n10/n01/n00), raw agreement, and
    McNemar's χ² = (b-c)²/(b+c) on the discordant cells — the paired
    test for whether the two filters' keep rates differ beyond chance.
    Quality keep = (≥20 words AND mean word length ≤ 8); dedup keep =
    the minimum doc_id of each normalized-text hash group (the
    dedup_exact survivorship rule).

    Scale shape: one explode+agg for the word stats, one window keyed by
    the md5 text hash (hash groups are duplicate clusters — small by
    construction), one four-integer global fold. All scores are fixed
    expressions over the four exact counts."""
    d = tables(spark, sf_dir)["documents"]
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    qstats = w.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("w")).alias("n_chars_w"),
    )
    from pyspark.sql import Window

    mwl = F.col("n_chars_w").cast("double") / F.col("n_words")
    dd = Window.partitionBy(F.md5(F.lower(F.col("text"))))
    flags = (
        d.join(qstats, "doc_id")
        .select(
            "doc_id",
            F.when((F.col("n_words") >= 20) & (mwl <= 8.0), 1)
            .otherwise(0)
            .alias("keep_quality"),
            F.when(F.col("doc_id") == F.min("doc_id").over(dd), 1)
            .otherwise(0)
            .alias("keep_dedup"),
        )
    )
    c = flags.agg(
        F.sum(F.col("keep_quality") * F.col("keep_dedup"))
        .cast("long")
        .alias("n11"),
        F.sum(F.col("keep_quality") * (1 - F.col("keep_dedup")))
        .cast("long")
        .alias("n10"),
        F.sum((1 - F.col("keep_quality")) * F.col("keep_dedup"))
        .cast("long")
        .alias("n01"),
        F.sum((1 - F.col("keep_quality")) * (1 - F.col("keep_dedup")))
        .cast("long")
        .alias("n00"),
    )
    total = F.col("n11") + F.col("n10") + F.col("n01") + F.col("n00")
    disc = F.col("n10") + F.col("n01")
    return c.select(
        "n11",
        "n10",
        "n01",
        "n00",
        q6((F.col("n11") + F.col("n00")).cast("double") / total).alias(
            "agreement"
        ),
        F.when(disc == 0, F.lit(0.0))
        .otherwise(
            q6(
                ((F.col("n10") - F.col("n01")) * (F.col("n10") - F.col("n01")))
                .cast("double")
                / disc
            )
        )
        .alias("mcnemar_chi2"),
    )
