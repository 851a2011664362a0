"""Round-10 query wave 3: agreement, rank-ANOVA, spread-homogeneity,
vocabulary-coverage, empirical-Bayes shrinkage, and survival-comparison
operators — Cohen's kappa between two curation rules, the Kruskal–Wallis
H test across order priorities, the Brown–Forsythe robust variance-
homogeneity test, Good–Turing unseen-mass + Chao1 richness of the token
vocabulary, James–Stein (positive-part) shrinkage of per-nation means,
and the log-rank test comparing signup→purchase survival curves.

Reference parity note: the reference grammar admits the statistical
aggregate family (``mannWhitneyUTest``, ``studentTTest``,
``kolmogorovSmirnovTest``, … — plain aggregate names reachable from the
generic function rule, generated_ch_parser/ClickHouseParser.py:15571);
this wave extends the same family to the k-group rank test, the robust
Levene variant, and the two-sample survival comparison a curation
pipeline reads next.

Exactness discipline (the file-level contract every wave follows):
monetary values quantize to integer cents at the scan; rank moments fold
as exact int64 (hi/lo quotient/remainder splits where a sum could leave
int64 at scale); squared-deviation folds over the ≤25-row group frames
run as an ORDERED cumulative sum whose terms are all nonnegative, so the
fold order is pinned and "last" = MAX (the cumulative_daily_revenue /
kaplan_meier discipline); per-event-day log-rank terms are nano-quantized
(×1e9, floor+0.5) per row before summing so the aggregate is order-free
(the hill_tail_index precedent); the only free doubles are the single
final statistic expressions, floor-quantized at 1e6 via q6.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.dist_rank import histogram_r2
from ..operators.text import tokenize
from ..session import widen_scan
from .registry import q6, query, tables

#: DuckDB word-count expression over ``text`` (empty tokens dropped) —
#: the SQL twin of operators/text.tokenize + F.size.
_WC_SQL = (
    "len(list_filter(string_split_regex(trim(text), '\\s+'),"
    " x -> length(x) > 0))"
)


# ---------------------------------------------------------------------------
# cohens_kappa_rules
# ---------------------------------------------------------------------------


@query(
    "cohens_kappa_rules",
    oracle=f"""
    WITH r AS (
        SELECT CASE WHEN {_WC_SQL} BETWEEN 30 AND 5000
                    THEN 1 ELSE 0 END AS a,
               CASE WHEN n_chars BETWEEN 6 * {_WC_SQL}
                                     AND 60 * {_WC_SQL}
                    THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a * b) AS BIGINT) AS n11,
               CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
               CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
               CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
        FROM r
    )
    SELECT n, n11, n10, n01, n00,
           FLOOR(CAST(n11 + n00 AS DOUBLE) / n * 1000000 + 0.5)
               / 1000000 AS po,
           FLOOR(CAST((n11 + n10) * (n11 + n01)
                      + (n01 + n00) * (n10 + n00) AS DOUBLE)
                 / n / n * 1000000 + 0.5) / 1000000 AS pe,
           FLOOR(CAST(n * (n11 + n00)
                      - ((n11 + n10) * (n11 + n01)
                         + (n01 + n00) * (n10 + n00)) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n
                    - ((n11 + n10) * (n11 + n01)
                       + (n01 + n00) * (n10 + n00)))
                 * 1000000 + 0.5) / 1000000 AS kappa
    FROM m
    """,
)
def cohens_kappa_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ agreement between two independent document-curation
    rules — rule A: word count in [30, 5000]; rule B: mean chars/word
    (n_chars/words) in [6, 60], evaluated as the integer comparison
    ``6·wc ≤ n_chars ≤ 60·wc`` so no division enters the predicate.
    κ = (p_o − p_e)/(1 − p_e) rearranged to the all-integer form
    (n·(n11+n00) − Σ marginal products) / (n² − Σ marginal products):
    every count is exact int64 and the statistic is ONE final division
    per engine. κ is the number a labeling pipeline reads before
    trusting a cheap rule as a proxy for an expensive one — raw accord
    p_o overstates agreement whenever the marginals are skewed.

    Scale shape: one map-side-combined scan-agg to a single 2×2 row;
    nothing downstream grows with rows. n² ≤ int64 to ~3e9 docs; the
    marginal products promote through DOUBLE only inside the final
    statistic."""
    d = widen_scan(tables(spark, sf_dir)["documents"])
    wc = F.size(tokenize(F.col("text")))
    a = (wc >= 30) & (wc <= 5000)
    b = (F.col("n_chars") >= 6 * wc) & (F.col("n_chars") <= 60 * wc)
    m = d.select(
        a.cast("long").alias("a"), b.cast("long").alias("b")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("long")
        .alias("n00"),
    )
    pe_num = (F.col("n11") + F.col("n10")) * (
        F.col("n11") + F.col("n01")
    ) + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    n = F.col("n").cast("double")
    return m.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        q6((F.col("n11") + F.col("n00")).cast("double") / n).alias("po"),
        q6(pe_num.cast("double") / n / n).alias("pe"),
        q6(
            (F.col("n") * (F.col("n11") + F.col("n00")) - pe_num).cast(
                "double"
            )
            / (n * n - pe_num.cast("double"))
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# kruskal_wallis_htest
# ---------------------------------------------------------------------------


@query(
    "kruskal_wallis_htest",
    oracle="""
    WITH b AS (
        SELECT o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
        FROM orders
    ),
    r AS (
        SELECT pri, y,
               2 * RANK() OVER (ORDER BY y)
                 + COUNT(*) OVER (PARTITION BY y) - 1 AS r2
        FROM b
    ),
    ties AS (
        SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tcorr,
               CAST(SUM(t) AS BIGINT) AS n
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM b GROUP BY y)
    ),
    g AS (
        SELECT pri, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(r2 // 100000000) AS BIGINT) AS s_hi,
               CAST(SUM(r2 % 100000000) AS BIGINT) AS s_lo
        FROM r GROUP BY pri
    ),
    gm AS (
        SELECT pri, n_g,
               (CAST(s_hi AS HUGEINT) * 100000000 + s_lo) AS sra2
        FROM g
    ),
    fold AS (
        SELECT pri, n_g,
               CAST(sra2 AS DOUBLE) / 2 / n_g AS mean_rank,
               SUM(n_g * (CAST(sra2 AS DOUBLE) / 2 / n_g
                          - (t.n + 1) / 2.0)
                       * (CAST(sra2 AS DOUBLE) / 2 / n_g
                          - (t.n + 1) / 2.0))
                   OVER (ORDER BY pri) AS css,
               t.n AS n, t.tcorr AS tcorr
        FROM gm CROSS JOIN ties t
    ),
    h AS (
        SELECT MAX(css) * 12.0 / (MAX(n) * (MAX(n) + 1.0)) AS h_raw,
               MAX(n) AS n, MAX(tcorr) AS tcorr
        FROM fold
    )
    SELECT f.pri AS priority, f.n_g AS n_g,
           FLOOR(f.mean_rank * 1000000 + 0.5) / 1000000 AS mean_rank,
           FLOOR(h.h_raw * 1000000 + 0.5) / 1000000 AS h_stat,
           FLOOR(h.h_raw
                 / (1.0 - CAST(h.tcorr AS DOUBLE)
                          / (CAST(h.n AS DOUBLE) * h.n * h.n - h.n))
                 * 1000000 + 0.5) / 1000000 AS h_corrected
    FROM fold f CROSS JOIN h ORDER BY f.pri
    """,
)
def kruskal_wallis_htest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H (rank ANOVA) of order value across the five
    order priorities — the k-group extension of mann_whitney_utest:
    H = 12/(N(N+1)) · Σ n_g(R̄_g − (N+1)/2)², tie-corrected by
    1 − Σ(t³−t)/(N³−N). Combined ranks come from the two-pass
    partition-histogram rank (operators/dist_rank.py): the (value, pri)
    histogram joins the value-level r2 back (histogram-sized join), so
    ΣR_g·2 folds as Σ n_g(y)·r2(y) with no row-level sort; the product
    accumulates as a hi/lo quotient/remainder split (divisor 1e8),
    exact past sf100. The 5-term squared-deviation fold runs as an
    ordered cumulative sum (terms ≥ 0 ⇒ last = MAX), pinning the double
    fold order on both engines.

    Scale shape: ONE hash agg to the value histogram — the per-priority
    multiplicities ride along as indicator-sum extra_aggs over the
    FIXED TPC-H priority domain (mann_whitney's binary-indicator trick
    ×5; an unexpected priority value would vanish from the Spark side
    and fail the oracle hash, so the hardcoding is self-checking) —
    then one range-partitioned prefix pass for ranks; nothing joins
    back at row scale and everything downstream is ≤5 rows."""
    o = tables(spark, sf_dir)["orders"]
    pris = [
        "1-URGENT",
        "2-HIGH",
        "3-MEDIUM",
        "4-NOT SPECIFIED",
        "5-LOW",
    ]
    b = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y"),
    )
    h = histogram_r2(
        b,
        "y",
        extra_aggs={
            f"c{i}": F.sum((F.col("pri") == p).cast("long"))
            for i, p in enumerate(pris)
        },
    )
    ties = h.agg(
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tcorr"),
        F.sum("cnt").alias("n"),
    )
    per = h.agg(
        *[
            agg
            for i in range(len(pris))
            for agg in (
                F.sum(f"c{i}").alias(f"n_g{i}"),
                F.sum(F.expr(f"c{i} * r2 DIV 100000000")).alias(
                    f"s_hi{i}"
                ),
                F.sum(F.expr(f"c{i} * r2 % 100000000")).alias(f"s_lo{i}"),
            )
        ]
    )
    g = per.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("pri"),
                        F.col(f"n_g{i}").alias("n_g"),
                        F.col(f"s_hi{i}").alias("s_hi"),
                        F.col(f"s_lo{i}").alias("s_lo"),
                    )
                    for i, p in enumerate(pris)
                ]
            )
        ).alias("s")
    ).select("s.pri", "s.n_g", "s.s_hi", "s.s_lo")
    sra2 = (
        F.col("s_hi").cast("decimal(38,0)") * F.lit(100000000)
        + F.col("s_lo")
    ).cast("double")
    gm = g.select("pri", "n_g", sra2.alias("sra2")).crossJoin(
        F.broadcast(ties)
    )
    mean_rank = F.col("sra2") / 2 / F.col("n_g")
    dev = mean_rank - (F.col("n") + 1) / F.lit(2.0)
    wfold = Window.orderBy("pri").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fold = gm.select(
        "pri",
        "n_g",
        "n",
        "tcorr",
        mean_rank.alias("mean_rank"),
        F.sum(F.col("n_g") * dev * dev).over(wfold).alias("css"),
    )
    hrow = fold.agg(
        (
            F.max("css") * 12.0 / (F.max("n") * (F.max("n") + F.lit(1.0)))
        ).alias("h_raw"),
        F.max("n").alias("nn"),
        F.max("tcorr").alias("tc"),
    )
    nn = F.col("nn").cast("double")
    return (
        fold.select("pri", "n_g", "mean_rank")
        .crossJoin(F.broadcast(hrow))
        .select(
            F.col("pri").alias("priority"),
            "n_g",
            q6(F.col("mean_rank")).alias("mean_rank"),
            q6(F.col("h_raw")).alias("h_stat"),
            q6(
                F.col("h_raw")
                / (
                    F.lit(1.0)
                    - F.col("tc").cast("double") / (nn * nn * nn - nn)
                )
            ).alias("h_corrected"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# brown_forsythe_variance
# ---------------------------------------------------------------------------


@query(
    "brown_forsythe_variance",
    oracle="""
    WITH b AS (
        SELECT c_mktsegment AS seg,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS y
        FROM customer
    ),
    h AS (
        SELECT seg, y, CAST(COUNT(*) AS BIGINT) AS cnt FROM b
        GROUP BY seg, y
    ),
    hc AS (
        SELECT seg, y, cnt,
               SUM(cnt) OVER (PARTITION BY seg ORDER BY y) AS cum,
               SUM(cnt) OVER (PARTITION BY seg) AS n_g
        FROM h
    ),
    med AS (
        SELECT seg, MIN(y) AS med FROM hc
        WHERE cum >= (n_g + 1) // 2 GROUP BY seg
    ),
    z AS (
        SELECT b.seg, ABS(b.y - m.med) AS z, m.med
        FROM b JOIN med m ON b.seg = m.seg
    ),
    g AS (
        SELECT seg, MAX(med) AS med,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(z) AS BIGINT) AS sz,
               CAST(SUM(z * z // 10000000) AS BIGINT) AS s2_hi,
               CAST(SUM(z * z % 10000000) AS BIGINT) AS s2_lo
        FROM z GROUP BY seg
    ),
    tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(sz) AS BIGINT) AS sza,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    ),
    fold AS (
        SELECT g.seg, g.med, g.n_g, g.sz,
               CAST(g.s2_hi AS HUGEINT) * 10000000 + g.s2_lo AS sz2,
               SUM(g.n_g * (CAST(g.sz AS DOUBLE) / g.n_g
                            - CAST(t.sza AS DOUBLE) / t.n)
                         * (CAST(g.sz AS DOUBLE) / g.n_g
                            - CAST(t.sza AS DOUBLE) / t.n))
                   OVER (ORDER BY g.seg) AS ssb,
               SUM(CAST(CAST(g.s2_hi AS HUGEINT) * 10000000 + g.s2_lo
                        AS DOUBLE)
                   - CAST(g.sz AS DOUBLE) * g.sz / g.n_g)
                   OVER (ORDER BY g.seg) AS ssw,
               t.n AS n, t.k AS k
        FROM g CROSS JOIN tot t
    ),
    f AS (
        SELECT MAX(ssb) / (MAX(k) - 1)
                   / (MAX(ssw) / (MAX(n) - MAX(k))) AS f_stat
        FROM fold
    )
    SELECT fo.seg AS segment, fo.n_g AS n_g, fo.med AS median_cents,
           FLOOR(CAST(fo.sz AS DOUBLE) / fo.n_g / 100.0 * 1000000 + 0.5)
               / 1000000 AS mean_absdev,
           FLOOR(f.f_stat * 1000000 + 0.5) / 1000000 AS f_stat
    FROM fold fo CROSS JOIN f ORDER BY fo.seg
    """,
)
def brown_forsythe_variance_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown–Forsythe spread-homogeneity test of account balance across
    market segments: the one-way ANOVA F statistic applied to
    z = |x − median_g| — the robust Levene variant that survives heavy
    tails where the classic variance-ratio test does not. Group medians
    are the LOWER median (smallest y with cum ≥ ⌈n_g/2⌉), computed from
    the per-segment value histogram's distributed cumulative counts
    (operators/dist_rank.py) — an explicit integer definition shared by
    both engines, immune to interpolation-convention drift between
    DuckDB quantile_cont and Spark percentile. z sums fold as exact
    int64 (z² as a hi/lo split, divisor 1e7, exact past sf100); the
    5-term SSB/SSW folds run as ordered cumulative sums (nonneg terms ⇒
    last = MAX); F evaluates once per engine.

    Scale shape: one hash agg to the (segment, value) histogram, one
    range-partitioned prefix pass per segment, one broadcast join of
    the 5 medians back to rows, one moment agg — no global sort."""
    c = tables(spark, sf_dir)["customer"]
    b = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("y"),
    )
    h = histogram_r2(b, "y", keys=["seg"])
    cum = F.col("below") + F.col("cnt")
    wng = Window.partitionBy("seg")
    hn = h.withColumn("n_g", F.sum("cnt").over(wng))
    med = (
        hn.filter(cum >= F.expr("(n_g + 1) DIV 2"))
        .groupBy("seg")
        .agg(F.min("y").alias("med"))
    )
    z = b.join(F.broadcast(med), "seg").select(
        "seg", "med", F.abs(F.col("y") - F.col("med")).alias("z")
    )
    g = z.groupBy("seg").agg(
        F.max("med").alias("med"),
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.expr("z * z DIV 10000000")).alias("s2_hi"),
        F.sum(F.expr("z * z % 10000000")).alias("s2_lo"),
    )
    tot = g.agg(
        F.sum("n_g").alias("n"),
        F.sum("sz").alias("sza"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    sz2 = (
        F.col("s2_hi").cast("decimal(38,0)") * F.lit(10000000)
        + F.col("s2_lo")
    ).cast("double")
    zbar_g = F.col("sz").cast("double") / F.col("n_g")
    zbar = F.col("sza").cast("double") / F.col("n")
    wfold = Window.orderBy("seg").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fold = g.crossJoin(F.broadcast(tot)).select(
        "seg",
        "med",
        "n_g",
        "sz",
        "n",
        "k",
        F.sum(F.col("n_g") * (zbar_g - zbar) * (zbar_g - zbar))
        .over(wfold)
        .alias("ssb"),
        F.sum(sz2 - F.col("sz").cast("double") * F.col("sz") / F.col("n_g"))
        .over(wfold)
        .alias("ssw"),
    )
    frow = fold.agg(
        (
            F.max("ssb")
            / (F.max("k") - 1)
            / (F.max("ssw") / (F.max("n") - F.max("k")))
        ).alias("f_stat")
    )
    return (
        fold.select("seg", "n_g", "med", "sz")
        .crossJoin(F.broadcast(frow))
        .select(
            F.col("seg").alias("segment"),
            "n_g",
            F.col("med").alias("median_cents"),
            q6(
                F.col("sz").cast("double") / F.col("n_g") / F.lit(100.0)
            ).alias("mean_absdev"),
            q6(F.col("f_stat")).alias("f_stat"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# good_turing_chao1
# ---------------------------------------------------------------------------


@query(
    "good_turing_chao1",
    oracle="""
    WITH w AS (SELECT list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> length(x) > 0) AS ws
               FROM documents),
    tok AS (SELECT unnest(ws) AS t FROM w),
    tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t),
    m AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f1,
               CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f2
        FROM tc
    )
    SELECT n_tokens, vocab, f1, f2,
           FLOOR(CAST(f1 AS DOUBLE) / n_tokens * 1000000 + 0.5)
               / 1000000 AS p_unseen,
           FLOOR((1.0 - CAST(f1 AS DOUBLE) / n_tokens) * 1000000 + 0.5)
               / 1000000 AS coverage,
           FLOOR((vocab + CASE WHEN f2 > 0
                               THEN CAST(f1 AS DOUBLE) * f1 / (2.0 * f2)
                               ELSE CAST(f1 AS DOUBLE) * (f1 - 1) / 2.0
                          END) * 1000000 + 0.5) / 1000000
               AS chao1_richness
    FROM m
    """,
)
def good_turing_chao1_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing unseen-probability mass and the Chao1 species-richness
    estimator over the whitespace-token vocabulary: p₀ = f₁/N (the mass
    a language model should reserve for tokens never seen in this
    corpus), coverage = 1 − p₀ (Good's estimator of how much of the true
    token distribution the corpus has touched), and Chao1 richness
    V + f₁²/(2f₂) (bias-corrected f₁(f₁−1)/2 when f₂ = 0) — the "how
    many token types exist that we haven't seen" lower bound a
    vocabulary-size decision reads next to heaps_law_fit's growth curve
    and token_frequency_spectrum's full histogram. All counts are exact
    int64; the three estimators evaluate once on one row.

    Scale shape: explode → two chained map-side-combined hash aggs
    (token counts, then frequency-class counts folded in the same agg);
    the second runs on |vocab| rows and reduces to ONE row."""
    d = widen_scan(tables(spark, sf_dir)["documents"])
    tok = d.select(F.explode(tokenize(F.col("text"))).alias("t"))
    tc = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    m = tc.agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    chao_add = F.when(
        F.col("f2") > 0, f1 * f1 / (F.lit(2.0) * F.col("f2"))
    ).otherwise(f1 * (f1 - 1) / F.lit(2.0))
    return m.select(
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        q6(f1 / F.col("n_tokens")).alias("p_unseen"),
        q6(F.lit(1.0) - f1 / F.col("n_tokens")).alias("coverage"),
        q6(F.col("vocab") + chao_add).alias("chao1_richness"),
    )


# ---------------------------------------------------------------------------
# james_stein_nation_means
# ---------------------------------------------------------------------------


@query(
    "james_stein_nation_means",
    oracle="""
    WITH b AS (
        SELECT c_nationkey AS nation,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS y
        FROM customer
    ),
    g AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y // 10000000) AS BIGINT) AS s2_hi,
               CAST(SUM(y * y % 10000000) AS BIGINT) AS s2_lo
        FROM b GROUP BY nation
    ),
    tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(sy) AS BIGINT) AS sya,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    ),
    fold AS (
        SELECT g.nation, g.n_g, g.sy,
               SUM(CAST(CAST(g.s2_hi AS HUGEINT) * 10000000 + g.s2_lo
                        AS DOUBLE)
                   - CAST(g.sy AS DOUBLE) * g.sy / g.n_g)
                   OVER (ORDER BY g.nation) AS cssw,
               SUM((CAST(g.sy AS DOUBLE) / g.n_g
                    - CAST(t.sya AS DOUBLE) / t.n)
                   * (CAST(g.sy AS DOUBLE) / g.n_g
                      - CAST(t.sya AS DOUBLE) / t.n))
                   OVER (ORDER BY g.nation) AS cssb,
               t.n AS n, t.k AS k, t.sya AS sya
        FROM g CROSS JOIN tot t
    ),
    s AS (
        SELECT MAX(cssw) / (MAX(n) - MAX(k)) AS sig2,
               MAX(cssb) AS ssb, MAX(n) AS n, MAX(k) AS k,
               MAX(sya) AS sya
        FROM fold
    )
    SELECT f.nation, f.n_g,
           FLOOR(CAST(f.sy AS DOUBLE) / f.n_g / 100.0 * 1000000 + 0.5)
               / 1000000 AS raw_mean,
           FLOOR(GREATEST(0.0, 1.0 - (s.k - 3) * s.sig2 / f.n_g / s.ssb)
                 * 1000000 + 0.5) / 1000000 AS shrink_w,
           FLOOR((CAST(s.sya AS DOUBLE) / s.n
                  + GREATEST(0.0,
                             1.0 - (s.k - 3) * s.sig2 / f.n_g / s.ssb)
                    * (CAST(f.sy AS DOUBLE) / f.n_g
                       - CAST(s.sya AS DOUBLE) / s.n)) / 100.0
                 * 1000000 + 0.5) / 1000000 AS js_mean
    FROM fold f CROSS JOIN s ORDER BY f.nation
    """,
)
def james_stein_nation_means_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """James–Stein (positive-part) empirical-Bayes shrinkage of the
    per-nation mean account balance toward the grand mean: each group
    mean x̄_g has sampling variance σ̂²/n_g (σ̂² pooled within-group),
    and the shrinkage weight w_g = max(0, 1 − (k−3)·(σ̂²/n_g)/SSB)
    pulls small-n groups hardest — the estimator that dominates the
    raw group means in total squared error for k ≥ 4, and the
    segment-level smoothing a reporting pipeline applies before ranking
    sparse segments. Moments are exact int64 (y² as hi/lo splits,
    divisor 1e7); the ≤25-term SSW/SSB folds run as ordered cumulative
    sums (nonneg terms ⇒ last = MAX); weights and shrunk means evaluate
    once per group row.

    Scale shape: one map-side-combined moment agg to ≤25 rows;
    everything downstream is constant-size."""
    c = tables(spark, sf_dir)["customer"]
    b = c.select(
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("y"),
    )
    g = b.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("y * y DIV 10000000")).alias("s2_hi"),
        F.sum(F.expr("y * y % 10000000")).alias("s2_lo"),
    )
    tot = g.agg(
        F.sum("n_g").alias("n"),
        F.sum("sy").alias("sya"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    sy2 = (
        F.col("s2_hi").cast("decimal(38,0)") * F.lit(10000000)
        + F.col("s2_lo")
    ).cast("double")
    mean_g = F.col("sy").cast("double") / F.col("n_g")
    mean_all = F.col("sya").cast("double") / F.col("n")
    wfold = Window.orderBy("nation").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fold = g.crossJoin(F.broadcast(tot)).select(
        "nation",
        "n_g",
        "sy",
        "n",
        "k",
        "sya",
        F.sum(sy2 - F.col("sy").cast("double") * F.col("sy") / F.col("n_g"))
        .over(wfold)
        .alias("cssw"),
        F.sum((mean_g - mean_all) * (mean_g - mean_all))
        .over(wfold)
        .alias("cssb"),
    )
    s = fold.agg(
        (F.max("cssw") / (F.max("n") - F.max("k"))).alias("sig2"),
        F.max("cssb").alias("ssb"),
        F.max("n").alias("nt"),
        F.max("k").alias("kt"),
        F.max("sya").alias("syat"),
    )
    w = F.greatest(
        F.lit(0.0),
        F.lit(1.0)
        - (F.col("kt") - 3) * F.col("sig2") / F.col("n_g") / F.col("ssb"),
    )
    grand = F.col("syat").cast("double") / F.col("nt")
    mg = F.col("sy").cast("double") / F.col("n_g")
    return (
        fold.select("nation", "n_g", "sy")
        .crossJoin(F.broadcast(s))
        .select(
            "nation",
            "n_g",
            q6(mg / F.lit(100.0)).alias("raw_mean"),
            q6(w).alias("shrink_w"),
            q6((grand + w * (mg - grand)) / F.lit(100.0)).alias(
                "js_mean"
            ),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# logrank_test
# ---------------------------------------------------------------------------


@query(
    "logrank_test",
    oracle="""
    WITH s AS (SELECT user_id, user_id % 2 AS grp, MIN(ts) AS t0
               FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT s.user_id, s.grp,
                 MIN(datediff('day', CAST(s.t0 AS DATE), CAST(e.ts AS DATE)))
                     AS d
          FROM s JOIN events e
            ON e.user_id = s.user_id AND e.event_type = 'purchase'
           AND e.ts > s.t0
          GROUP BY s.user_id, s.grp),
    cohort AS (
        SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1_0,
               CAST(COUNT(*) AS BIGINT) AS n0_all
        FROM s
    ),
    ev AS (SELECT d,
                  CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS d1,
                  CAST(COUNT(*) AS BIGINT) AS di
           FROM p GROUP BY d),
    risk AS (
        SELECT d, d1, di,
               c.n1_0 - COALESCE(SUM(d1) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n1,
               c.n0_all - COALESCE(SUM(di) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS ni
        FROM ev CROSS JOIN cohort c
    ),
    terms AS (
        SELECT CAST(SUM(d1) AS BIGINT) AS o1,
               CAST(SUM(CAST(FLOOR(CAST(di AS DOUBLE) * n1 / ni * 1e9
                                   + 0.5) AS BIGINT)) AS BIGINT) AS e1_q,
               CAST(SUM(CASE WHEN ni > 1 THEN
                   CAST(FLOOR(CAST(di AS DOUBLE) * n1 / ni
                              * (ni - n1) / ni
                              * (ni - di) / (ni - 1) * 1e9 + 0.5)
                        AS BIGINT) ELSE 0 END) AS BIGINT) AS v_q
        FROM risk
    )
    SELECT c.n1_0 AS n_grp1, c.n0_all - c.n1_0 AS n_grp0, t.o1,
           FLOOR(t.e1_q / 1e9 * 1000000 + 0.5) / 1000000 AS e1,
           FLOOR(t.v_q / 1e9 * 1000000 + 0.5) / 1000000 AS v,
           FLOOR((t.o1 - t.e1_q / 1e9) * (t.o1 - t.e1_q / 1e9)
                 / (t.v_q / 1e9) * 1000000 + 0.5) / 1000000 AS chi2
    FROM terms t CROSS JOIN cohort c
    """,
)
def logrank_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel–Cox) test comparing signup→purchase survival
    between the two user-id parity cohorts: at each conversion day,
    O₁ accumulates group-1 events, E₁ the hypergeometric expectation
    dᵢ·n₁ᵢ/nᵢ, and V the variance dᵢ(n₁/n)(1−n₁/n)(n−d)/(n−1);
    χ² = (O₁−E₁)²/V. Same right-censoring as kaplan_meier_survival
    (never-converting users stay at risk to the window end). Each
    per-day E/V term is an integer-ratio double nano-quantized (×1e9,
    floor+0.5) before summing, so the day-level aggregates are exact
    int64 and order-free (the hill_tail_index discipline); O₁ is a
    plain integer sum; χ² evaluates once on one row.

    Scale shape: raw volume stops at the per-user min-aggregations; the
    day table is tiny (≤ observation-window days); one ordered prefix
    over it for the at-risk counts, then a single-row reduce."""
    ev = tables(spark, sf_dir)["events"]
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .withColumn("grp", F.col("user_id") % 2)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("tp"))
        .join(F.broadcast(s), "user_id")
        .filter(F.col("tp") > F.col("t0"))
        .groupBy("user_id", "grp")
        .agg(
            F.min(F.datediff(F.to_date("tp"), F.to_date("t0"))).alias("d")
        )
    )
    cohort = s.agg(
        F.sum((F.col("grp") == 1).cast("long")).alias("n1_0"),
        F.count(F.lit(1)).cast("long").alias("n0_all"),
    )
    evd = p.groupBy("d").agg(
        F.sum((F.col("grp") == 1).cast("long")).alias("d1"),
        F.count(F.lit(1)).cast("long").alias("di"),
    )
    wprev = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = evd.crossJoin(F.broadcast(cohort)).select(
        "d",
        "d1",
        "di",
        (
            F.col("n1_0") - F.coalesce(F.sum("d1").over(wprev), F.lit(0))
        ).alias("n1"),
        (
            F.col("n0_all") - F.coalesce(F.sum("di").over(wprev), F.lit(0))
        ).alias("ni"),
    )
    di = F.col("di").cast("double")
    n1 = F.col("n1").cast("double")
    ni = F.col("ni").cast("double")
    e_term = F.floor(di * n1 / ni * 1e9 + F.lit(0.5)).cast("long")
    v_term = F.when(
        F.col("ni") > 1,
        F.floor(
            di * n1 / ni * (ni - n1) / ni * (ni - di) / (ni - F.lit(1.0))
            * 1e9
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    terms = risk.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(e_term).cast("long").alias("e1_q"),
        F.sum(v_term).cast("long").alias("v_q"),
    )
    e1 = F.col("e1_q") / 1e9
    v = F.col("v_q") / 1e9
    o1 = F.col("o1").cast("double")
    return terms.crossJoin(F.broadcast(cohort)).select(
        F.col("n1_0").alias("n_grp1"),
        (F.col("n0_all") - F.col("n1_0")).alias("n_grp0"),
        "o1",
        q6(e1).alias("e1"),
        q6(v).alias("v"),
        q6((o1 - e1) * (o1 - e1) / v).alias("chi2"),
    )
