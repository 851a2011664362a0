"""Round-10 query wave: change/drift detection and dependence-structure
statistics for training-data pipeline health — Page–Hinkley drift on the
daily value series, Kendall τ-b over a binned contingency grid, the
decision-stump Gini split, mutual information / NMI between a
categorical and a binned numeric column, the population-stability-index
drift readout, and McNemar's paired test of two quality rules.

Reference parity note: none in the reference repo (a lineage extractor);
all six extend the data-curation charter — drift tells you WHEN a
source went bad, dependence/split statistics tell you WHICH features
carry signal, PSI is the production
scoring-drift gauge, McNemar compares two filter rules on the same
corpus.

Exactness discipline (the decisive design constraint for oracled
floats): every accumulation that crosses rows is kept in EXACT INTEGER
arithmetic — centi-quantized sums, truncated integer means via
``s - s % c``, contingency products — and doubles appear only in final
per-row expressions both engines evaluate with the identical IEEE ops
(one division, one sqrt, one ln), then floor-quantized with q6."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import q6, query, tables

# ---------------------------------------------------------------------------
# page_hinkley_drift
# ---------------------------------------------------------------------------


@query(
    "page_hinkley_drift",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS s,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    run AS (
        SELECT day, s, c,
               (s - s % c) / c AS x,
               CAST(SUM(s) OVER (ORDER BY day) AS BIGINT) AS ss,
               CAST(SUM(c) OVER (ORDER BY day) AS BIGINT) AS cc
        FROM daily
    ),
    dev AS (
        SELECT day, x, c,
               CAST(x - (ss - ss % cc) / cc AS BIGINT) AS d
        FROM run
    ),
    cum AS (
        SELECT day, x, d,
               CAST(SUM(d) OVER (ORDER BY day) AS BIGINT) AS u
        FROM dev
    ),
    ph AS (
        SELECT day, x, u,
               u - MIN(u) OVER (ORDER BY day) AS stat
        FROM cum
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           FLOOR((x / 100.0) * 1000000 + 0.5) / 1000000 AS day_mean,
           FLOOR((stat / 100.0) * 1000000 + 0.5) / 1000000 AS ph_stat,
           stat > 500 AS drift
    FROM ph ORDER BY day
    """,
)
def page_hinkley_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley change detection on the daily mean of events.value:
    per day, the deviation of the day's mean from the running mean is
    accumulated, and the PH statistic is that cumulative sum minus its
    running minimum — a sustained upward shift makes it climb past the
    λ = 5.00 alarm while noise keeps it near zero. EVERYTHING that
    crosses rows is exact integer arithmetic in centi-units (values
    quantized at 2 digits, means TRUNCATED via s - s%c), so the two
    engines cannot diverge by summation order; the only doubles are the
    final /100 renders.

    Scale shape: one map-side-combined hash agg to days, then windows
    over the day-count-sized series (constant per retention window —
    never data-sized)."""
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    x = (F.col("s") - F.col("s") % F.col("c")) / F.col("c")
    run = daily.select(
        "day",
        x.cast("long").alias("x"),
        F.sum("s").over(w).cast("long").alias("ss"),
        F.sum("c").over(w).cast("long").alias("cc"),
    )
    m = (F.col("ss") - F.col("ss") % F.col("cc")) / F.col("cc")
    dev = run.select(
        "day", "x", (F.col("x") - m).cast("long").alias("d")
    )
    cum = dev.select(
        "day", "x", F.sum("d").over(w).cast("long").alias("u")
    )
    stat = F.col("u") - F.min("u").over(w)
    return cum.select(
        # string-rendered date: DuckDB hands DATE to pandas as a
        # datetime64 while Spark yields datetime.date — the canonical
        # hash renders those differently (ohlc_daily_bars precedent)
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        q6(F.col("x") / 100.0).alias("day_mean"),
        q6(stat / 100.0).alias("ph_stat"),
        (stat > 500).alias("drift"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# kendall_tau_b_binned
# ---------------------------------------------------------------------------


@query(
    "kendall_tau_b_binned",
    oracle="""
    WITH g AS (
        SELECT LEAST(CAST(FLOOR(l_extendedprice / 6875.0) AS BIGINT), 15)
                   AS bx,
               LEAST(CAST(FLOOR(l_quantity / 5.0) AS BIGINT), 9) AS by_,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1, 2
    ),
    pq AS (
        SELECT
            CAST(SUM(CASE WHEN b.bx > a.bx AND b.by_ > a.by_
                          THEN a.n * b.n ELSE 0 END) AS BIGINT) AS p,
            CAST(SUM(CASE WHEN b.bx > a.bx AND b.by_ < a.by_
                          THEN a.n * b.n ELSE 0 END) AS BIGINT) AS q
        FROM g a JOIN g b ON NOT (a.bx = b.bx AND a.by_ = b.by_)
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n FROM g
    ),
    rowties AS (
        SELECT CAST(SUM(r * (r - 1) / 2) AS BIGINT) AS n1
        FROM (SELECT SUM(n) AS r FROM g GROUP BY bx)
    ),
    colties AS (
        SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS n2
        FROM (SELECT SUM(n) AS c FROM g GROUP BY by_)
    )
    SELECT tot.n AS n, pq.p AS concordant, pq.q AS discordant,
           FLOOR((pq.p - pq.q)
                 / (sqrt(CAST(tot.n * (tot.n - 1) / 2 - n1 AS DOUBLE))
                    * sqrt(CAST(tot.n * (tot.n - 1) / 2 - n2 AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000 AS tau_b
    FROM pq, tot, rowties, colties
    """,
)
def kendall_tau_b_binned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b rank correlation between price and quantity, EXACT
    over a 16×10 binned contingency grid: concordant/discordant pair
    counts come from the grid's self-join (Σ n_ij·n_i'j' over cell pairs
    ordered both ways / opposite ways), tie corrections from row/column
    marginals — all BIGINT until the single final sqrt·sqrt division
    (the (n0−n1)(n0−n2) product would overflow int64 at sf10, so the
    sqrt factors split first; both engines run the identical IEEE ops).
    Complements rank_corr_spearman with the concordance-based member of
    the rank-correlation family.

    Scale shape: one map-side-combined grid agg (≤160 cells at any SF),
    then a ≤160×160 broadcast self-join — the data-sized pass is ONE
    scan; nothing downstream grows with rows."""
    li = tables(spark, sf_dir)["lineitem"]
    g = (
        li.select(
            F.least(
                F.floor(F.col("l_extendedprice") / 6875.0).cast("long"),
                F.lit(15),
            ).alias("bx"),
            F.least(
                F.floor(F.col("l_quantity") / 5.0).cast("long"), F.lit(9)
            ).alias("by_"),
        )
        .groupBy("bx", "by_")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)  # grid feeds 4 tiny consumers
    )
    a, b = g.alias("a"), g.alias("b")
    pq = (
        a.join(
            F.broadcast(b),
            ~(
                (F.col("a.bx") == F.col("b.bx"))
                & (F.col("a.by_") == F.col("b.by_"))
            ),
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("b.bx") > F.col("a.bx"))
                    & (F.col("b.by_") > F.col("a.by_")),
                    F.col("a.n") * F.col("b.n"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("p"),
            F.sum(
                F.when(
                    (F.col("b.bx") > F.col("a.bx"))
                    & (F.col("b.by_") < F.col("a.by_")),
                    F.col("a.n") * F.col("b.n"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("q"),
        )
    )
    tot = g.agg(F.sum("n").cast("long").alias("n"))
    n1 = (
        g.groupBy("bx")
        .agg(F.sum("n").alias("r"))
        .agg(
            F.sum(F.col("r") * (F.col("r") - 1) / 2)
            .cast("long")
            .alias("n1")
        )
    )
    n2 = (
        g.groupBy("by_")
        .agg(F.sum("n").alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2)
            .cast("long")
            .alias("n2")
        )
    )
    n0 = F.col("n") * (F.col("n") - 1) / 2
    tau = (F.col("p") - F.col("q")) / (
        F.sqrt((n0 - F.col("n1")).cast("double"))
        * F.sqrt((n0 - F.col("n2")).cast("double"))
    )
    return (
        pq.crossJoin(F.broadcast(tot))  # 1-row × 1-row grand totals
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "n",
            F.col("p").alias("concordant"),
            F.col("q").alias("discordant"),
            q6(tau).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# gini_split_stump
# ---------------------------------------------------------------------------


@query(
    "gini_split_stump",
    oracle="""
    WITH b AS (
        SELECT CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM lineitem GROUP BY 1
    ),
    cum AS (
        SELECT t,
               CAST(SUM(cnt) OVER (ORDER BY t) AS BIGINT) AS nl,
               CAST(SUM(pos) OVER (ORDER BY t) AS BIGINT) AS pl,
               CAST(SUM(cnt) OVER () AS BIGINT) AS n,
               CAST(SUM(pos) OVER () AS BIGINT) AS np
        FROM b
    ),
    s AS (
        SELECT t, nl, n - nl AS nr,
               (CAST(nl AS DOUBLE) / n)
                   * (1.0 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
                          - (CAST(nl - pl AS DOUBLE) / nl)
                            * (CAST(nl - pl AS DOUBLE) / nl))
               + (CAST(n - nl AS DOUBLE) / n)
                   * (1.0 - (CAST(np - pl AS DOUBLE) / (n - nl))
                            * (CAST(np - pl AS DOUBLE) / (n - nl))
                          - (CAST((n - nl) - (np - pl) AS DOUBLE) / (n - nl))
                            * (CAST((n - nl) - (np - pl) AS DOUBLE) / (n - nl)))
                   AS gini
        FROM cum WHERE nl < n
    )
    SELECT t AS best_threshold_bucket, nl AS n_left, nr AS n_right,
           FLOOR(gini * 1000000 + 0.5) / 1000000 AS weighted_gini
    FROM s ORDER BY gini, t LIMIT 1
    """,
)
def gini_split_stump_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training: the single price-bucket threshold that
    minimizes weighted Gini impurity of the returned-flag label — the
    inner loop of tree building and a standard which-feature-carries-
    signal probe for curation. Candidate thresholds are the ~105
    1000-unit price buckets; left/right class counts come from ONE
    cumulative window over the bucket aggregate, the Gini expression is
    the identical IEEE arithmetic on both engines, and the argmin is an
    ORDER BY (gini, t) LIMIT 1 over the same doubles.

    Scale shape: one scan → bucket hash agg (map-side combined, ≤105
    groups), window + argmin over the bucket table only."""
    li = tables(spark, sf_dir)["lineitem"]
    b = li.groupBy(
        F.floor(F.col("l_extendedprice") / 1000.0).cast("long").alias("t")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum((F.col("l_returnflag") == "R").cast("int"))
        .cast("long")
        .alias("pos"),
    )
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = b.select(
        "t",
        F.sum("cnt").over(wc).cast("long").alias("nl"),
        F.sum("pos").over(wc).cast("long").alias("pl"),
        F.sum("cnt").over(wall).cast("long").alias("n"),
        F.sum("pos").over(wall).cast("long").alias("np"),
    ).filter(F.col("nl") < F.col("n"))
    nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
    n, np_ = F.col("n").cast("double"), F.col("np").cast("double")
    nr, pr = n - nl, np_ - pl
    gini = (nl / n) * (
        F.lit(1.0) - (pl / nl) * (pl / nl) - ((nl - pl) / nl) * ((nl - pl) / nl)
    ) + (nr / n) * (
        F.lit(1.0) - (pr / nr) * (pr / nr) - ((nr - pr) / nr) * ((nr - pr) / nr)
    )
    return (
        cum.select(
            F.col("t").alias("best_threshold_bucket"),
            F.col("nl").alias("n_left"),
            (F.col("n") - F.col("nl")).alias("n_right"),
            gini.alias("__g"),
        )
        .orderBy("__g", "best_threshold_bucket")
        .limit(1)
        .select(
            "best_threshold_bucket",
            "n_left",
            "n_right",
            q6(F.col("__g")).alias("weighted_gini"),
        )
    )


# ---------------------------------------------------------------------------
# mutual_information_nmi
# ---------------------------------------------------------------------------


@query(
    "mutual_information_nmi",
    oracle="""
    WITH j AS (
        SELECT event_type AS x,
               LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS y,
               CAST(COUNT(*) AS BIGINT) AS nxy
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT x, y, nxy,
               CAST(SUM(nxy) OVER (PARTITION BY x) AS BIGINT) AS nx,
               CAST(SUM(nxy) OVER (PARTITION BY y) AS BIGINT) AS ny,
               CAST(SUM(nxy) OVER () AS BIGINT) AS n
        FROM j
    ),
    terms AS (
        SELECT n,
               SUM((CAST(nxy AS DOUBLE) / n)
                   * ln(CAST(n AS DOUBLE) * nxy / (CAST(nx AS DOUBLE) * ny)))
                   AS mi
        FROM m GROUP BY n
    ),
    hx AS (
        SELECT SUM((CAST(c AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / c)) AS hx
        FROM (SELECT x, SUM(nxy) AS c, CAST(SUM(SUM(nxy)) OVER () AS BIGINT)
                     AS n
              FROM j GROUP BY x)
        GROUP BY n
    ),
    hy AS (
        SELECT SUM((CAST(c AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / c)) AS hy
        FROM (SELECT y, SUM(nxy) AS c, CAST(SUM(SUM(nxy)) OVER () AS BIGINT)
                     AS n
              FROM j GROUP BY y)
        GROUP BY n
    )
    SELECT terms.n AS n,
           FLOOR(hx * 1000000 + 0.5) / 1000000 AS h_x,
           FLOOR(hy * 1000000 + 0.5) / 1000000 AS h_y,
           FLOOR(mi * 1000000 + 0.5) / 1000000 AS mi,
           FLOOR(mi / sqrt(hx * hy) * 1000000 + 0.5) / 1000000 AS nmi
    FROM terms, hx, hy
    """,
)
def mutual_information_nmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event_type and the binned value
    column, plus marginal entropies and the sqrt-normalized NMI — the
    does-this-feature-predict-that probe run before spending on model
    features. The joint histogram is one exact integer grid (≤50
    cells); MI/H are per-cell double terms (identical IEEE ln on both
    engines) summed over the tiny grid, q6-rendered; both marginal
    entropies fold the SAME grid, so the data-sized work is exactly one
    scan.

    Scale shape: one scan → ≤50-cell hash agg; everything after is
    constant-size."""
    ev = tables(spark, sf_dir)["events"]
    j = (
        ev.select(
            F.col("event_type").alias("x"),
            F.least(
                F.floor(F.col("value") / 50.0).cast("long"), F.lit(9)
            ).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("nxy"))
        .localCheckpoint(eager=False)  # ≤50-cell grid, 2 consumers
    )
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wall = Window.partitionBy()
    m = j.select(
        "x",
        "y",
        "nxy",
        F.sum("nxy").over(wx).cast("long").alias("nx"),
        F.sum("nxy").over(wy).cast("long").alias("ny"),
        F.sum("nxy").over(wall).cast("long").alias("n"),
    )
    nxy, nx = F.col("nxy").cast("double"), F.col("nx").cast("double")
    ny, n = F.col("ny").cast("double"), F.col("n").cast("double")
    terms = m.groupBy("n").agg(
        F.sum((nxy / n) * F.log(n * nxy / (nx * ny))).alias("mi"),
    )

    def _marginal_entropy(key: str, out: str) -> DataFrame:
        marg = j.groupBy(key).agg(F.sum("nxy").cast("long").alias("c"))
        marg = marg.withColumn(
            "n", F.sum("c").over(Window.partitionBy()).cast("long")
        )
        c, ntot = F.col("c").cast("double"), F.col("n").cast("double")
        return (
            marg.groupBy("n")
            .agg(F.sum((c / ntot) * F.log(ntot / c)).alias(out))
            .select(out)
        )

    hx = _marginal_entropy("x", "hx")
    hy = _marginal_entropy("y", "hy")
    return (
        terms.crossJoin(F.broadcast(hx))  # 1-row × 1-row grand totals
        .crossJoin(F.broadcast(hy))
        .select(
            F.col("n").cast("long").alias("n"),
            q6(F.col("hx")).alias("h_x"),
            q6(F.col("hy")).alias("h_y"),
            q6(F.col("mi")).alias("mi"),
            q6(F.col("mi") / F.sqrt(F.col("hx") * F.col("hy"))).alias(
                "nmi"
            ),
        )
    )


# ---------------------------------------------------------------------------
# population_stability_index
# ---------------------------------------------------------------------------


@query(
    "population_stability_index",
    oracle="""
    WITH h AS (
        SELECT LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS bin,
               CAST(SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb,
               CAST(SUM(CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END)
                    AS BIGINT) AS nc
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT bin, nb, nc,
               CAST(SUM(nb) OVER () AS BIGINT) AS tb,
               CAST(SUM(nc) OVER () AS BIGINT) AS tc
        FROM h
    )
    SELECT bin, nb AS n_base, nc AS n_current,
           FLOOR((nb + 0.5) / (tb + 5.0) * 1000000 + 0.5) / 1000000
               AS base_share,
           FLOOR((nc + 0.5) / (tc + 5.0) * 1000000 + 0.5) / 1000000
               AS current_share,
           FLOOR(((nb + 0.5) / (tb + 5.0) - (nc + 0.5) / (tc + 5.0))
                 * ln(((nb + 0.5) / (tb + 5.0))
                      / ((nc + 0.5) / (tc + 5.0)))
                 * 1000000 + 0.5) / 1000000 AS psi_term
    FROM t ORDER BY bin
    """,
)
def population_stability_index_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-BIN Population Stability Index attribution between the first
    half of the month (baseline, day ≤ 15) and the rest — the drilldown
    twin of the scalar `psi_drift` monitor (r7_wave5): that one reports
    one quantile-edge-bucketed PSI scalar per event_type series; this
    one reports WHICH fixed equal-width value bin moved, with the
    Laplace convention (c+0.5)/(N+B/2) instead of +1e-6 smoothing so
    empty bins are well-defined without an epsilon whose scale depends
    on N. Counts are exact integers from ONE scan (the bin×window
    histogram); each PSI term is a single identical IEEE expression,
    q6-rendered.

    Scale shape: one map-side-combined hash agg to ≤10 bins; everything
    after is constant-size."""
    ev = tables(spark, sf_dir)["events"]
    is_base = F.dayofmonth("ts") <= 15
    h = ev.groupBy(
        F.least(
            F.floor(F.col("value") / 50.0).cast("long"), F.lit(9)
        ).alias("bin")
    ).agg(
        F.sum(is_base.cast("int")).cast("long").alias("nb"),
        F.sum((~is_base).cast("int")).cast("long").alias("nc"),
    )
    wall = Window.partitionBy()
    t = h.select(
        "bin",
        "nb",
        "nc",
        F.sum("nb").over(wall).cast("long").alias("tb"),
        F.sum("nc").over(wall).cast("long").alias("tc"),
    )
    p = (F.col("nb") + 0.5) / (F.col("tb") + 5.0)
    q_ = (F.col("nc") + 0.5) / (F.col("tc") + 5.0)
    return t.select(
        "bin",
        F.col("nb").alias("n_base"),
        F.col("nc").alias("n_current"),
        q6(p).alias("base_share"),
        q6(q_).alias("current_share"),
        q6((p - q_) * F.log(p / q_)).alias("psi_term"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# mcnemar_quality_rules
# ---------------------------------------------------------------------------


@query(
    "mcnemar_quality_rules",
    oracle="""
    WITH r AS (
        SELECT (n_chars > 300) AS r1,
               (len(string_split(text, ' ')) > 55) AS r2
        FROM documents
    ),
    c AS (
        SELECT CAST(SUM(CASE WHEN r1 AND NOT r2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN r2 AND NOT r1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS both_pass,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM r
    )
    SELECT n, both_pass, b AS only_rule1, c AS only_rule2,
           FLOOR((CAST(ABS(b - c) AS DOUBLE) - 1)
                 * (CAST(ABS(b - c) AS DOUBLE) - 1)
                 / (b + c) * 1000000 + 0.5) / 1000000 AS chi2_cc
    FROM c
    """,
)
def mcnemar_quality_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (continuity-corrected) comparing two
    document quality rules on the SAME corpus — a char-length gate vs a
    word-count gate: only the DISCORDANT counts (passes one rule, fails
    the other) carry information about which rule is stricter, which is
    exactly what a curation team needs before swapping filters. All
    counts exact integers from one scan; χ²_cc = (|b−c|−1)²/(b+c) is a
    single final double expression.

    Scale shape: one map-side-combined scan aggregation; no shuffle of
    anything data-sized."""
    d = tables(spark, sf_dir)["documents"]
    r1 = F.col("n_chars") > 300
    r2 = F.size(F.split(F.col("text"), " ")) > 55
    agg = d.agg(
        F.sum((r1 & ~r2).cast("int")).cast("long").alias("b"),
        F.sum((r2 & ~r1).cast("int")).cast("long").alias("c"),
        F.sum((r1 & r2).cast("int")).cast("long").alias("both_pass"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    ad = F.abs(F.col("b") - F.col("c")).cast("double")
    return agg.select(
        "n",
        "both_pass",
        F.col("b").alias("only_rule1"),
        F.col("c").alias("only_rule2"),
        q6((ad - 1) * (ad - 1) / (F.col("b") + F.col("c"))).alias(
            "chi2_cc"
        ),
    )
