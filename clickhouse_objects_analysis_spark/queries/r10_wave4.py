"""Round-10 query wave 4: experiment-metrology and inequality operators
— the delta-method CI for a clustered ratio metric (revenue per order),
the binned two-sample Hodges–Lehmann shift estimator, the expected-
calibration-error reliability table of a holdout-validated bucket
predictor, and the Theil-T / Theil-L / Atkinson(1) inequality indices of
per-customer revenue.

Reference parity note: the reference grammar admits these aggregate
shapes through the generic function rule (ratio/uplift aggregates,
``medianExact`` over derived streams, entropy-family aggregates —
generated_ch_parser/ClickHouseParser.py:15571); this wave extends the
engine's A/B-metrology family (ab_ztest_power_suite, cuped, bayes,
conformal) with the ratio-metric and calibration members every
experimentation platform ships.

Exactness discipline (the file-level contract): cents at the scan;
moment sums exact int64 with hi/lo quotient/remainder splits where a
square could leave int64 (divisors noted per query); per-row log /
ratio terms nano-quantized (×1e9, floor+0.5) before aggregation so
sums are order-free (hill_tail_index precedent); ≤20-row folds run as
ordered cumulative sums of nonnegative terms (last = MAX); the final
statistics evaluate once per engine and floor-quantize at 1e6 (q6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import q6, query, tables

# ---------------------------------------------------------------------------
# delta_method_ratio_ci
# ---------------------------------------------------------------------------


@query(
    "delta_method_ratio_ci",
    oracle="""
    WITH cu AS (
        SELECT o.o_custkey AS cust, c.c_mktsegment AS seg,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey, c.c_mktsegment
    ),
    g AS (
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_c,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(m) AS BIGINT) AS sm,
               CAST(SUM(y * y // 1000000000) AS BIGINT) AS syy_hi,
               CAST(SUM(y * y % 1000000000) AS BIGINT) AS syy_lo,
               CAST(SUM(y * m) AS BIGINT) AS sym,
               CAST(SUM(m * m) AS BIGINT) AS smm
        FROM cu GROUP BY seg
    )
    SELECT seg AS segment, n_c AS n_customers, sm AS n_orders,
           FLOOR(CAST(sy AS DOUBLE) / sm / 100.0 * 1000000 + 0.5)
               / 1000000 AS ratio,
           FLOOR(sqrt(CAST(n_c AS DOUBLE) / (n_c - 1)
                 * (CAST(CAST(syy_hi AS HUGEINT) * 1000000000 + syy_lo
                         AS DOUBLE)
                    - 2 * (CAST(sy AS DOUBLE) / sm) * sym
                    + (CAST(sy AS DOUBLE) / sm)
                      * (CAST(sy AS DOUBLE) / sm) * smm))
                 / sm / 100.0 * 1000000 + 0.5) / 1000000 AS se,
           FLOOR((CAST(sy AS DOUBLE) / sm
                  - 1.96 * sqrt(CAST(n_c AS DOUBLE) / (n_c - 1)
                        * (CAST(CAST(syy_hi AS HUGEINT) * 1000000000
                                + syy_lo AS DOUBLE)
                           - 2 * (CAST(sy AS DOUBLE) / sm) * sym
                           + (CAST(sy AS DOUBLE) / sm)
                             * (CAST(sy AS DOUBLE) / sm) * smm)) / sm)
                 / 100.0 * 1000000 + 0.5) / 1000000 AS ci_lo,
           FLOOR((CAST(sy AS DOUBLE) / sm
                  + 1.96 * sqrt(CAST(n_c AS DOUBLE) / (n_c - 1)
                        * (CAST(CAST(syy_hi AS HUGEINT) * 1000000000
                                + syy_lo AS DOUBLE)
                           - 2 * (CAST(sy AS DOUBLE) / sm) * sym
                           + (CAST(sy AS DOUBLE) / sm)
                             * (CAST(sy AS DOUBLE) / sm) * smm)) / sm)
                 / 100.0 * 1000000 + 0.5) / 1000000 AS ci_hi
    FROM g ORDER BY seg
    """,
)
def delta_method_ratio_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for the clustered ratio metric
    "revenue per order" by market segment: randomization units are
    CUSTOMERS, the metric is Σy/Σm over customer-level (revenue, order
    count) pairs, so the naive per-order variance is wrong whenever
    orders within a customer correlate — the linearization
    Var(R) ≈ n/(n−1)·Σ(yᵢ − R·mᵢ)²/(Σm)² is the standard correction
    (expanded to the moment form Syy − 2R·Sym + R²·Smm so a single
    aggregation pass suffices). The experiment-metrology member every
    ratio-metric A/B readout needs next to the mean-metric z-test.
    Customer moments are exact int64 (y² as a hi/lo split, divisor 1e9
    — per-customer revenue is SF-invariant by construction, the split
    is headroom against whale customers); R, SE, and the ±1.96 bounds
    evaluate once per segment row.

    Scale shape: one co-partitioned join orders⋈customer (customer side
    broadcast at test SF; key-partitioned at scale), one hash agg to
    customers, one to ≤5 segment rows — no data-sized sort."""
    o = tables(spark, sf_dir)["orders"]
    c = tables(spark, sf_dir)["customer"]
    # aggregate-before-join: collapse orders to per-customer (y, m)
    # FIRST, so the segment join moves |customers| rows instead of
    # |orders| — Catalyst won't hoist an aggregation across a join on
    # its own, and at 10x fact-to-dim fan-in this is the whole
    # data-sized cost of the query
    per_cust = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("y"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    cu = per_cust.join(
        c.select(
            F.col("c_custkey").alias("cust"),
            F.col("c_mktsegment").alias("seg"),
        ),
        "cust",
    )
    g = cu.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("m").cast("long").alias("sm"),
        F.sum(F.expr("y * y DIV 1000000000")).alias("syy_hi"),
        F.sum(F.expr("y * y % 1000000000")).alias("syy_lo"),
        F.sum(F.col("y") * F.col("m")).cast("long").alias("sym"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("smm"),
    )
    syy = (
        F.col("syy_hi").cast("decimal(38,0)") * F.lit(1000000000)
        + F.col("syy_lo")
    ).cast("double")
    r = F.col("sy").cast("double") / F.col("sm")
    se = (
        F.sqrt(
            F.col("n_c").cast("double")
            / (F.col("n_c") - 1)
            * (syy - 2 * r * F.col("sym") + r * r * F.col("smm"))
        )
        / F.col("sm")
    )
    return g.select(
        F.col("seg").alias("segment"),
        F.col("n_c").alias("n_customers"),
        F.col("sm").alias("n_orders"),
        q6(r / F.lit(100.0)).alias("ratio"),
        q6(se / F.lit(100.0)).alias("se"),
        q6((r - 1.96 * se) / F.lit(100.0)).alias("ci_lo"),
        q6((r + 1.96 * se) / F.lit(100.0)).alias("ci_hi"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# hodges_lehmann_shift
# ---------------------------------------------------------------------------


@query(
    "hodges_lehmann_shift",
    oracle="""
    WITH b AS (
        SELECT c_mktsegment AS seg,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) // 1000 AS bx
        FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    h1 AS (SELECT bx, CAST(COUNT(*) AS BIGINT) AS w FROM b
           WHERE seg = 'BUILDING' GROUP BY bx),
    h0 AS (SELECT bx, CAST(COUNT(*) AS BIGINT) AS w FROM b
           WHERE seg = 'MACHINERY' GROUP BY bx),
    d AS (
        SELECT h1.bx - h0.bx AS diff,
               CAST(SUM(h1.w * h0.w) AS BIGINT) AS w
        FROM h1 CROSS JOIN h0 GROUP BY h1.bx - h0.bx
    ),
    c AS (
        SELECT diff, w,
               SUM(w) OVER (ORDER BY diff) AS cum,
               SUM(w) OVER () AS wtot
        FROM d
    ),
    hl AS (
        SELECT MIN(diff) AS hl_bin FROM c WHERE cum >= (wtot + 1) // 2
    ),
    n AS (
        SELECT CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n0
        FROM b
    )
    SELECT n.n1, n.n0, hl.hl_bin,
           FLOOR(hl.hl_bin * 10.0 * 1000000 + 0.5) / 1000000
               AS hl_shift_dollars
    FROM n CROSS JOIN hl
    """,
)
def hodges_lehmann_shift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Hodges–Lehmann location-shift estimate between the
    BUILDING and MACHINERY segments' account balances: the median of all
    pairwise differences x − y — the robust companion to
    mann_whitney_utest (that tests; this ESTIMATES the shift with the
    same rank machinery, 50% breakdown, no normality assumption).
    Computed over $10 value bins (integer cents // 1000): each side
    collapses to a ≤~1,100-cell histogram, the pairwise-difference
    distribution is the weighted cross of the two HISTOGRAMS (cell
    count × cell count, exact int64 — n₁·n₀ pair mass ≈ 9e12 at sf10,
    far inside int64), and the estimate is the lower weighted median
    (smallest diff with cum ≥ ⌈W/2⌉ — the brown_forsythe integer-median
    convention). Bin quantization bounds the estimator's resolution at
    $10, stated in the output's name.

    Scale shape: the data-sized passes are two map-side-combined
    histogram aggs; the histogram cross-product is value-range-sized
    (≤1.3M weighted pairs regardless of SF) and reduces immediately to
    the ≤2,200-bin difference histogram — row count never reaches the
    join."""
    c = tables(spark, sf_dir)["customer"]
    b = c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.expr(
            "CAST(ROUND(c_acctbal * 100) AS BIGINT) DIV 1000"
        ).alias("bx"),
    )
    h1 = (
        b.filter(F.col("seg") == "BUILDING")
        .groupBy("bx")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    h0 = (
        b.filter(F.col("seg") == "MACHINERY")
        .groupBy("bx")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    d = (
        h1.alias("a")
        .crossJoin(F.broadcast(h0.alias("b")))
        .groupBy((F.col("a.bx") - F.col("b.bx")).alias("diff"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).cast("long").alias("w"))
    )
    wcum = Window.orderBy("diff").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = d.select(
        "diff",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wall).alias("wtot"),
    )
    hl = cdf.filter(
        F.col("cum") >= F.expr("(wtot + 1) DIV 2")
    ).agg(F.min("diff").alias("hl_bin"))
    n = b.agg(
        F.sum((F.col("seg") == "BUILDING").cast("long")).alias("n1"),
        F.sum((F.col("seg") == "MACHINERY").cast("long")).alias("n0"),
    )
    return n.crossJoin(F.broadcast(hl)).select(
        "n1",
        "n0",
        "hl_bin",
        q6(F.col("hl_bin") * F.lit(10.0)).alias("hl_shift_dollars"),
    )


# ---------------------------------------------------------------------------
# ece_reliability_bins
# ---------------------------------------------------------------------------


@query(
    "ece_reliability_bins",
    oracle="""
    WITH b AS (
        SELECT LEAST(CAST(FLOOR(o_totalprice / 30000.0) AS BIGINT), 19)
                   AS bucket,
               o_orderkey % 2 AS fold,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS hi
        FROM orders
    ),
    g AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN fold = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train,
               CAST(SUM(CASE WHEN fold = 0 THEN hi ELSE 0 END) AS BIGINT)
                   AS k_train,
               CAST(SUM(CASE WHEN fold = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_test,
               CAST(SUM(CASE WHEN fold = 1 THEN hi ELSE 0 END) AS BIGINT)
                   AS k_test
        FROM b GROUP BY bucket
    ),
    t AS (SELECT CAST(SUM(n_test) AS BIGINT) AS nt FROM g),
    terms AS (
        SELECT g.bucket, g.n_train, g.n_test,
               CAST(g.k_train AS DOUBLE) / g.n_train AS conf,
               CAST(g.k_test AS DOUBLE) / g.n_test AS acc,
               CAST(FLOOR(ABS(CAST(g.k_test AS DOUBLE) / g.n_test
                              - CAST(g.k_train AS DOUBLE) / g.n_train)
                          * g.n_test / t.nt * 1e9 + 0.5) AS BIGINT)
                   AS term_q
        FROM g CROSS JOIN t
        WHERE g.n_train > 0 AND g.n_test > 0
    ),
    e AS (SELECT CAST(SUM(term_q) AS BIGINT) AS ece_q FROM terms)
    SELECT terms.bucket, terms.n_train, terms.n_test,
           FLOOR(terms.conf * 1000000 + 0.5) / 1000000 AS conf,
           FLOOR(terms.acc * 1000000 + 0.5) / 1000000 AS acc,
           FLOOR(e.ece_q / 1e9 * 1000000 + 0.5) / 1000000 AS ece
    FROM terms CROSS JOIN e ORDER BY terms.bucket
    """,
)
def ece_reliability_bins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-calibration-error reliability table for a holdout-
    validated bucket predictor: the even-orderkey fold estimates
    P(high priority | price bucket) per 20 fixed price buckets (the
    "model's confidence"), the odd fold measures the realized rate (the
    "accuracy"), and ECE = Σ (n_b/N)·|acc_b − conf_b| summarizes the
    calibration gap — the measurement-side complement to
    isotonic_calibration (which FIXES calibration) and
    conformal_interval_calibration (which wraps intervals around it).
    Each bucket's weighted gap is nano-quantized before summing (hill
    discipline), so ECE folds as exact int64; conf/acc are single
    integer-ratio divisions per bucket row.

    Scale shape: ONE map-side-combined scan-agg to ≤20 bucket rows
    (both folds aggregated in the same pass via conditional sums);
    everything downstream is constant-size."""
    o = tables(spark, sf_dir)["orders"]
    b = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / 30000.0).cast("long"),
            F.lit(19),
        ).alias("bucket"),
        (F.col("o_orderkey") % 2).alias("fold"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("long")
        .alias("hi"),
    )
    g = b.groupBy("bucket").agg(
        F.sum((F.col("fold") == 0).cast("long")).alias("n_train"),
        F.sum(F.when(F.col("fold") == 0, F.col("hi")).otherwise(0)).alias(
            "k_train"
        ),
        F.sum((F.col("fold") == 1).cast("long")).alias("n_test"),
        F.sum(F.when(F.col("fold") == 1, F.col("hi")).otherwise(0)).alias(
            "k_test"
        ),
    )
    t = g.agg(F.sum("n_test").cast("long").alias("nt"))
    conf = F.col("k_train").cast("double") / F.col("n_train")
    acc = F.col("k_test").cast("double") / F.col("n_test")
    terms = (
        g.crossJoin(F.broadcast(t))
        .filter((F.col("n_train") > 0) & (F.col("n_test") > 0))
        .select(
            "bucket",
            "n_train",
            "n_test",
            conf.alias("conf"),
            acc.alias("acc"),
            F.floor(
                F.abs(acc - conf) * F.col("n_test") / F.col("nt") * 1e9
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term_q"),
        )
    )
    e = terms.agg(F.sum("term_q").cast("long").alias("ece_q"))
    return (
        terms.crossJoin(F.broadcast(e))
        .select(
            "bucket",
            "n_train",
            "n_test",
            q6(F.col("conf")).alias("conf"),
            q6(F.col("acc")).alias("acc"),
            q6(F.col("ece_q") / 1e9).alias("ece"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# theil_atkinson_inequality
# ---------------------------------------------------------------------------


@query(
    "theil_atkinson_inequality",
    oracle="""
    WITH cu AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY o_custkey
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx
        FROM cu
    ),
    terms AS (
        SELECT CAST(FLOOR((CAST(cu.x AS DOUBLE) * m.n / m.sx)
                          * ln(CAST(cu.x AS DOUBLE) * m.n / m.sx)
                          * 1e9 + 0.5) AS BIGINT) AS t_q,
               CAST(FLOOR(ln(CAST(cu.x AS DOUBLE) * m.n / m.sx) * 1e9
                          + 0.5) AS BIGINT) AS l_q
        FROM cu CROSS JOIN m
    ),
    s AS (
        SELECT CAST(SUM(t_q) AS BIGINT) AS st,
               CAST(SUM(l_q) AS BIGINT) AS sl
        FROM terms
    )
    SELECT m.n AS n_customers,
           FLOOR(CAST(m.sx AS DOUBLE) / m.n / 100.0 * 1000000 + 0.5)
               / 1000000 AS mean_revenue,
           FLOOR(s.st / 1e9 / m.n * 1000000 + 0.5) / 1000000
               AS theil_t,
           FLOOR(-(s.sl / 1e9) / m.n * 1000000 + 0.5) / 1000000
               AS theil_l,
           FLOOR((1.0 - exp(s.sl / 1e9 / m.n)) * 1000000 + 0.5)
               / 1000000 AS atkinson_1
    FROM m CROSS JOIN s
    """,
)
def theil_atkinson_inequality_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theil-T, Theil-L (mean log deviation), and Atkinson(ε=1)
    inequality indices of per-customer revenue — the decomposable
    entropy-family inequality measures that complement
    gini_source_concentration / lorenz_curve_customers (Gini weights
    transfers at the mode; Theil-T weights the top tail, Theil-L the
    bottom, and Atkinson(1) = 1 − geomean/μ prices inequality as the
    welfare share society would give up for equality). Population =
    customers with ≥1 order (revenue > 0, so every log is defined).
    Two-pass: the (n, Σx) scalar broadcasts back, then each customer's
    (x/μ)ln(x/μ) and ln(x/μ) terms are nano-quantized per row before
    summing (order-free exact int64 — the hill discipline); the three
    indices evaluate once on one row.

    Scale shape: one hash agg to customers, one scalar agg, one
    broadcast, one map-side-combined term agg — no sort, no data-sized
    join."""
    o = tables(spark, sf_dir)["orders"]
    cu = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("x")
    )
    m = cu.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    ratio = (
        F.col("x").cast("double") * F.col("n") / F.col("sx")
    )
    terms = cu.crossJoin(F.broadcast(m)).select(
        F.floor(ratio * F.log(ratio) * 1e9 + F.lit(0.5))
        .cast("long")
        .alias("t_q"),
        F.floor(F.log(ratio) * 1e9 + F.lit(0.5)).cast("long").alias("l_q"),
    )
    s = terms.agg(
        F.sum("t_q").cast("long").alias("st"),
        F.sum("l_q").cast("long").alias("sl"),
    )
    return m.crossJoin(F.broadcast(s)).select(
        F.col("n").alias("n_customers"),
        q6(F.col("sx").cast("double") / F.col("n") / F.lit(100.0)).alias(
            "mean_revenue"
        ),
        q6(F.col("st") / 1e9 / F.col("n")).alias("theil_t"),
        q6(-(F.col("sl") / 1e9) / F.col("n")).alias("theil_l"),
        q6(
            F.lit(1.0) - F.exp(F.col("sl") / 1e9 / F.col("n"))
        ).alias("atkinson_1"),
    )
