"""LLM-pipeline wave 8 (round-7 session 2): substring-level exact
duplication (the Lee et al. 2022 "Deduplicating Training Data Makes
Language Models Better" signal, re-expressed relationally) and a
Heaps' law vocabulary-growth fit. (A char-entropy filter was drafted
here too, then dropped: llm_wave3's char_entropy_quality already
covers it — same formula, same value-sorted fold.)

Cross-engine float discipline (registry convention): every aggregate
accumulates exact integers; the few float reductions fold over
VALUE-SORTED lists (array_sort / list_sort both engines) so the IEEE
addition order is identical, then round to 6 places.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dist_rank import dist_cumsum
from ..session import widen_scan
from .registry import query, tables

#: Window width for substring-level dedup. 40 chars ≈ the ~50-token
#: threshold of the suffix-array work scaled to the synthetic corpus'
#: short documents; at sf0.01 ~9% of windows participate in a
#: cross-document duplicate, so the signal is non-degenerate.
_WIN = 40


@query(
    "substring_dup_spans",
    oracle=f"""
    WITH d AS (SELECT doc_id, text FROM documents
               WHERE length(text) >= {_WIN}),
    w AS (SELECT doc_id, md5(substr(text, CAST(i AS INT), {_WIN})) AS h
          FROM d, unnest(generate_series(1, length(text) - {_WIN} + 1))
               AS t(i)),
    g AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    per AS (SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS total_windows,
                   CAST(SUM(CASE WHEN h IN (SELECT h FROM g)
                            THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows
            FROM w GROUP BY doc_id)
    SELECT doc_id, total_windows, dup_windows,
           ROUND(CAST(dup_windows AS DOUBLE) / total_windows, 6)
               AS dup_ratio
    FROM per ORDER BY doc_id
    """,
)
def substring_dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated character windows across documents: every
    ``_WIN``-char window is hashed; a window whose hash appears in ≥2
    distinct documents is a duplicated span. Per document: window count,
    duplicated-window count, and the duplication ratio — the
    document-level filter signal of substring-level dedup (the
    suffix-array method's output, approximated by fixed-width windows,
    which is exactly how the distributed implementations of that paper
    shard the problem).

    r15 (OPTIMIZATION_r15.md): windows are keyed by ``xxhash64`` (the
    8-byte production key the r9 docstring promised — 4× narrower than
    the md5 hex this shipped with; grouping is identical unless two
    distinct windows collide in 64 bits, oracle-verified at the tested
    SFs), built ARRAY-SIDE per doc so the duplicate-set aggregate runs
    over per-doc DISTINCT hashes (``array_distinct`` on the doc row)
    as a plain map-side-combined count instead of count_distinct's
    two-phase (hash, doc_id) distinct shuffle. The per-window explode
    is ``explode_outer`` — the inner form triggers Catalyst's
    InferFiltersFromGenerate, which re-evaluates the interpreted
    window-hash transform in an inferred size()>0 filter (measured 30×
    on the gram kernel; every doc here has ≥1 window so outer adds no
    rows). Plan: duplicate-set agg + doc agg shuffle 8-byte keys; the
    window stream crosses the dup join (AQE broadcast at this SF,
    shuffle at 100 TB, never OOM)."""
    d = widen_scan(tables(spark, sf_dir)["documents"]).filter(
        F.length("text") >= _WIN
    )
    wh = F.transform(
        F.sequence(F.lit(1), F.length("text") - _WIN + 1),
        lambda i: F.xxhash64(F.substring(F.col("text"), i, _WIN)),
    )
    hb = d.select("doc_id", wh.alias("wh"))
    dup = (
        hb.select(F.explode(F.array_distinct("wh")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    w = hb.select("doc_id", F.explode_outer("wh").alias("h"))
    per = (
        w.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_windows"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("long")
            .alias("dup_windows"),
        )
    )
    return per.select(
        "doc_id",
        "total_windows",
        "dup_windows",
        F.round(
            F.col("dup_windows").cast("double") / F.col("total_windows"), 6
        ).alias("dup_ratio"),
    ).orderBy("doc_id")


@query(
    "heaps_law_fit",
    oracle="""
    WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM documents),
    first_occ AS (SELECT w, MIN(doc_id) AS fd FROM words GROUP BY w),
    newv AS (SELECT fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS nv
             FROM first_occ GROUP BY fd),
    ntok AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt
             FROM words GROUP BY doc_id),
    per AS (SELECT n.doc_id, n.nt, COALESCE(v.nv, 0) AS nv
            FROM ntok n LEFT JOIN newv v ON n.doc_id = v.doc_id),
    cum AS (SELECT doc_id,
                   CAST(SUM(nt) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cn,
                   CAST(SUM(nv) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cv
            FROM per),
    pts AS (SELECT list_sort(list([cn, cv])) AS pairs,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   MAX(cn) AS nt_total, MAX(cv) AS vocab
            FROM cum),
    s AS (SELECT m, nt_total, vocab,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(pairs, p -> ln(p[1]))),
                     (a, b) -> a + b) AS sx,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(pairs, p -> ln(p[2]))),
                     (a, b) -> a + b) AS sy,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(pairs, p -> ln(p[1]) * ln(p[1]))),
                     (a, b) -> a + b) AS sxx,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(pairs, p -> ln(p[1]) * ln(p[2]))),
                     (a, b) -> a + b) AS sxy
           FROM pts)
    SELECT m AS n_checkpoints, nt_total AS total_tokens, vocab,
           ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS beta,
           ROUND((sy - ((m * sxy - sx * sy) / (m * sxx - sx * sx)) * sx)
                 / m, 6) AS log_k
    FROM s
    """,
)
def heaps_law_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law V(n) ≈ K·n^β fitted over per-document corpus
    checkpoints: after each document (in doc_id order), n = cumulative
    tokens and V = cumulative distinct vocabulary. V comes from
    first-occurrence counting (min doc_id per word → histogram →
    cumulative sum), so no per-checkpoint distinct scan; both cumsums
    run through the distributed two-pass dist_cumsum. β/log K are the
    closed-form least squares over (ln n, ln V), with the four power
    sums folded over the VALUE-SORTED checkpoint list (n is strictly
    increasing, so value order IS document order) — identical IEEE
    trees in both engines.

    100 TB: first-occurrence and token counts are map-side-combined
    word aggregations; checkpoints are doc-level rows (one per
    document). At real corpus sizes the fit would subsample
    checkpoints (every 2^k-th document) — the fold is the only
    driver-side-sized stage, and it is one array of (n, V) longs."""
    docs = tables(spark, sf_dir)["documents"]
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    first_occ = words.groupBy("w").agg(F.min("doc_id").alias("fd"))
    newv = first_occ.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("nv")
    )
    ntok = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nt")
    )
    per = ntok.join(newv, "doc_id", "left").select(
        "doc_id",
        "nt",
        F.coalesce(F.col("nv"), F.lit(0)).cast("long").alias("nv"),
    )
    cum = dist_cumsum(per, "doc_id", ["nt", "nv"]).select(
        F.col("cum_nt").alias("cn"), F.col("cum_nv").alias("cv")
    )
    pts = cum.agg(
        F.array_sort(
            F.collect_list(F.array(F.col("cn"), F.col("cv")))
        ).alias("pairs"),
        F.count(F.lit(1)).cast("long").alias("m"),
        F.max("cn").alias("nt_total"),
        F.max("cv").alias("vocab"),
    )

    def fold(expr):
        return F.aggregate(
            F.transform("pairs", expr), F.lit(0.0), lambda a, b: a + b
        )

    s = pts.select(
        "m",
        "nt_total",
        "vocab",
        fold(lambda p: F.log(p[0].cast("double"))).alias("sx"),
        fold(lambda p: F.log(p[1].cast("double"))).alias("sy"),
        fold(
            lambda p: F.log(p[0].cast("double"))
            * F.log(p[0].cast("double"))
        ).alias("sxx"),
        fold(
            lambda p: F.log(p[0].cast("double"))
            * F.log(p[1].cast("double"))
        ).alias("sxy"),
    )
    beta = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("m").alias("n_checkpoints"),
        F.col("nt_total").alias("total_tokens"),
        "vocab",
        F.round(beta, 6).alias("beta"),
        F.round((F.col("sy") - beta * F.col("sx")) / F.col("m"), 6).alias(
            "log_k"
        ),
    )
