"""Round-4 aggregate wave: more ClickHouse behavioral aggregates
(grammar: the aggregate-function name list reachable from the generic
function rule, generated_ch_parser/ClickHouseParser.py:15571) —
covarPop/covarSamp/avgWeighted, maxIntersections(+Position),
studentTTest/welchTTest, arrayAUC, groupUniqArray.

Float discipline follows the SCALE.md playbook: every moment accumulates
as an exact integer (quantities as int64, prices as int64 cents, with
hi/lo quotient/remainder splits where a sum could leave int64 at scale),
and each final statistic is evaluated ONCE per group in double with the
identical expression tree on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.dist_rank import dist_cumsum, histogram_r2
from .ch_aggregates import _FUNNEL_W_US
from .registry import query, tables


def _FUNNEL_W() -> int:
    return _FUNNEL_W_US


@query(
    "covar_avg_weighted",
    oracle="""
    WITH b AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy
        FROM b GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(ROUND((n * sxy - sx * sy) / (n * n) / 100.0, 6)
                AS DOUBLE) AS covar_pop,
           CAST(ROUND((n * sxy - sx * sy) / (n * (n - 1)) / 100.0, 6)
                AS DOUBLE) AS covar_samp,
           CAST(ROUND(sxy / sx / 100.0, 6) AS DOUBLE) AS avg_weighted
    FROM m ORDER BY l_returnflag
    """,
)
def covar_avg_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``covarPop(x, y)`` / ``covarSamp(x, y)`` /
    ``avgWeighted(y, x)`` from the same exact integer moments as
    linear_regression_agg (x = quantity, y = price cents; sy and sxy as
    hi/lo int64 splits, reconstructed exactly per group). One map-side
    combined aggregate; four moments per group is the shuffle payload."""
    li = tables(spark, sf_dir)["lineitem"]
    b = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    x = F.col("x")
    m = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(F.expr("y DIV 10000")).alias("sy_hi"),
        F.sum(F.expr("y % 10000")).alias("sy_lo"),
        F.sum(F.expr("x * y DIV 100000")).alias("sxy_hi"),
        F.sum(F.expr("x * y % 100000")).alias("sxy_lo"),
    )

    def _join(hi: str, lo: str, div: int):
        return (
            F.col(hi).cast("decimal(38,0)") * F.lit(div) + F.col(lo)
        ).cast("double")

    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = _join("sy_hi", "sy_lo", 10000)
    sxyd = _join("sxy_hi", "sxy_lo", 100000)
    num = nd * sxyd - sxd * syd
    return m.select(
        "l_returnflag",
        F.round(num / (nd * nd) / F.lit(100.0), 6)
        .cast("double")
        .alias("covar_pop"),
        F.round(num / (nd * (nd - F.lit(1))) / F.lit(100.0), 6)
        .cast("double")
        .alias("covar_samp"),
        F.round(sxyd / sxd / F.lit(100.0), 6)
        .cast("double")
        .alias("avg_weighted"),
    ).orderBy("l_returnflag")


@query(
    "max_intersections",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS lo,
               epoch_us(ts) + CAST(3600e6 AS BIGINT) AS hi
        FROM events WHERE event_type = 'view'
    ),
    pts AS (
        SELECT user_id, lo AS t, 1 AS d, event_id FROM iv
        UNION ALL
        SELECT user_id, hi AS t, -1 AS d, event_id FROM iv
    ),
    run AS (
        SELECT user_id, t,
               SUM(d) OVER (PARTITION BY user_id
                            ORDER BY t, d, event_id
                            ROWS UNBOUNDED PRECEDING) AS c
        FROM pts
    ),
    mx AS (
        SELECT user_id, t, c,
               MAX(c) OVER (PARTITION BY user_id) AS m
        FROM run
    )
    SELECT user_id,
           CAST(MAX(m) AS BIGINT) AS max_intersections,
           CAST(MIN(t) AS BIGINT) AS at_us
    FROM mx WHERE c = m
    GROUP BY user_id ORDER BY user_id
    """,
)
def max_intersections_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``maxIntersections(start, end)`` +
    ``maxIntersectionsPosition``: the peak number of concurrently-open
    intervals and the earliest instant it is reached (same 1-hour view
    windows as interval_length_sum; intervals are half-open [lo, hi), so
    at equal timestamps closes process before opens — the d-ascending
    tiebreak). Sweep-line as pure windowing: ±1 endpoint deltas, one
    running sum over the (t, d, event_id) sort, then max + argmin-t.
    All integer microseconds; no state machine, no Python."""
    ev = tables(spark, sf_dir)["events"].filter(
        F.col("event_type") == "view"
    )
    lo = F.unix_micros("ts")
    iv = ev.select(
        "user_id",
        "event_id",
        lo.alias("lo"),
        (lo + F.lit(3600_000_000).cast("long")).alias("hi"),
    )
    pts = iv.select(
        "user_id", F.col("lo").alias("t"), F.lit(1).alias("d"), "event_id"
    ).unionAll(
        iv.select(
            "user_id", F.col("hi").alias("t"), F.lit(-1).alias("d"),
            "event_id",
        )
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t", "d", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pts.select(
        "user_id", "t", F.sum("d").over(w_run).alias("c")
    ).withColumn("m", F.max("c").over(Window.partitionBy("user_id")))
    return (
        run.filter(F.col("c") == F.col("m"))
        .groupBy("user_id")
        .agg(
            F.max("m").cast("long").alias("max_intersections"),
            F.min("t").cast("long").alias("at_us"),
        )
        .orderBy("user_id")
    )


@query(
    "student_welch_ttest",
    oracle="""
    WITH b AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ),
    m AS (
        SELECT
            CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                 AS DOUBLE) AS na,
            CAST(SUM(CASE WHEN l_returnflag = 'A' THEN y END)
                 AS DOUBLE) AS s1a,
            CAST(SUM(CASE WHEN l_returnflag = 'A' THEN y * y END)
                 AS DOUBLE) AS s2a,
            CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                 AS DOUBLE) AS nr,
            CAST(SUM(CASE WHEN l_returnflag = 'R' THEN y END)
                 AS DOUBLE) AS s1r,
            CAST(SUM(CASE WHEN l_returnflag = 'R' THEN y * y END)
                 AS DOUBLE) AS s2r
        FROM b
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nr AS BIGINT) AS n_r,
           CAST(ROUND((s1a / na - s1r / nr)
             / SQRT((((s2a - s1a * s1a / na) + (s2r - s1r * s1r / nr))
                     / (na + nr - 2)) * (1.0 / na + 1.0 / nr)), 6)
             AS DOUBLE) AS t_student,
           CAST(ROUND((s1a / na - s1r / nr)
             / SQRT((s2a - s1a * s1a / na) / (na - 1) / na
                    + (s2r - s1r * s1r / nr) / (nr - 1) / nr), 6)
             AS DOUBLE) AS t_welch,
           CAST(ROUND(
             ((s2a - s1a * s1a / na) / (na - 1) / na
              + (s2r - s1r * s1r / nr) / (nr - 1) / nr)
             * ((s2a - s1a * s1a / na) / (na - 1) / na
                + (s2r - s1r * s1r / nr) / (nr - 1) / nr)
             / ((s2a - s1a * s1a / na) / (na - 1) / na
                * ((s2a - s1a * s1a / na) / (na - 1) / na) / (na - 1)
                + (s2r - s1r * s1r / nr) / (nr - 1) / nr
                  * ((s2r - s1r * s1r / nr) / (nr - 1) / nr) / (nr - 1)),
             6) AS DOUBLE) AS df_welch
    FROM m
    """,
)
def student_welch_ttest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``studentTTest(x, y)`` / ``welchTTest(x, y)``: two-sample
    t statistics comparing extended price between return flags A and R,
    plus the Welch-Satterthwaite degrees of freedom. Moments are exact
    integer cent sums (the y² sums as hi/lo int64 splits); every
    statistic evaluates once, on one row, in double, with the identical
    expression tree on both engines — t is scale-invariant so the cents
    scale never needs undoing."""
    li = tables(spark, sf_dir)["lineitem"].filter(
        F.col("l_returnflag").isin("A", "R")
    )
    b = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    is_a = F.col("l_returnflag") == "A"
    is_r = F.col("l_returnflag") == "R"
    m = b.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("na"),
        F.sum(F.when(is_a, F.col("y"))).alias("s1a"),
        F.sum(F.when(is_a, F.expr("y * y DIV 10000000"))).alias("s2a_hi"),
        F.sum(F.when(is_a, F.expr("y * y % 10000000"))).alias("s2a_lo"),
        F.sum(F.when(is_r, 1).otherwise(0)).alias("nr"),
        F.sum(F.when(is_r, F.col("y"))).alias("s1r"),
        F.sum(F.when(is_r, F.expr("y * y DIV 10000000"))).alias("s2r_hi"),
        F.sum(F.when(is_r, F.expr("y * y % 10000000"))).alias("s2r_lo"),
    )

    def _join(hi: str, lo: str):
        return (
            F.col(hi).cast("decimal(38,0)") * F.lit(10000000) + F.col(lo)
        ).cast("double")

    na, nr = F.col("na").cast("double"), F.col("nr").cast("double")
    s1a, s1r = F.col("s1a").cast("double"), F.col("s1r").cast("double")
    s2a, s2r = _join("s2a_hi", "s2a_lo"), _join("s2r_hi", "s2r_lo")
    dmean = s1a / na - s1r / nr
    ssa = s2a - s1a * s1a / na  # group sums of squared deviations
    ssr = s2r - s1r * s1r / nr
    va_n = ssa / (na - F.lit(1)) / na  # var_a / n_a
    vr_n = ssr / (nr - F.lit(1)) / nr
    t_student = dmean / F.sqrt(
        ((ssa + ssr) / (na + nr - F.lit(2)))
        * (F.lit(1.0) / na + F.lit(1.0) / nr)
    )
    t_welch = dmean / F.sqrt(va_n + vr_n)
    df_welch = (
        (va_n + vr_n) * (va_n + vr_n)
        / (va_n * va_n / (na - F.lit(1)) + vr_n * vr_n / (nr - F.lit(1)))
    )
    return m.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nr").cast("long").alias("n_r"),
        F.round(t_student, 6).cast("double").alias("t_student"),
        F.round(t_welch, 6).cast("double").alias("t_welch"),
        F.round(df_welch, 6).cast("double").alias("df_welch"),
    )


@query(
    "array_auc",
    oracle="""
    WITH s AS (
        SELECT (embedding::DOUBLE[])[1] AS score,
               CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
        FROM embeddings
    ),
    r AS (
        SELECT pos,
               RANK() OVER (ORDER BY score) AS rk,
               COUNT(*) OVER (PARTITION BY score) AS ties
        FROM s
    ),
    agg AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS p,
               CAST(SUM(1 - pos) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN pos = 1
                             THEN 2 * rk + ties - 1 END) AS BIGINT) AS s2
        FROM r
    )
    SELECT p AS n_pos, n AS n_neg,
           CAST(ROUND((s2 - p * (p + 1)) / (2.0 * p * n), 6)
                AS DOUBLE) AS auc
    FROM agg
    """,
)
def array_auc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayAUC(scores, labels)``: ROC AUC of the first
    embedding component as a score for label >= 5, via the exact
    rank-sum identity AUC = (ΣR₊ − P(P+1)/2) / (P·N) with average ranks
    for ties kept integral as 2·avg_rank = 2·min_rank + ties − 1. One
    double division at the end.

    Ranks come from the two-pass partition-histogram rank
    (operators/dist_rank.py) — distinct-score histogram, range
    partition, per-slice cumsum + broadcast offsets — so no task ever
    sorts more than ~1/P of the distinct scores.  ΣR₊ needs no
    row-level join back: per distinct score, the positive rows
    contribute ``n_pos(score) · r2(score)``, an exact integer."""
    e = tables(spark, sf_dir)["embeddings"]
    s = e.select(
        F.col("embedding")[0].cast("double").alias("score"),
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("pos"),
    )
    h = histogram_r2(
        s, "score", extra_aggs={"np": F.sum("pos").cast("long")}
    )
    agg = h.agg(
        F.sum("np").cast("long").alias("p"),
        F.sum(F.col("cnt") - F.col("np")).cast("long").alias("n"),
        F.sum(F.col("np") * F.col("r2")).cast("long").alias("s2"),
    )
    p, n = F.col("p"), F.col("n")
    return agg.select(
        p.alias("n_pos"),
        n.alias("n_neg"),
        F.round(
            (F.col("s2") - p * (p + 1)) / (F.lit(2.0) * p * n), 6
        )
        .cast("double")
        .alias("auc"),
    )


@query(
    "group_uniq_array",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
               AS priorities,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_uniq,
           CAST(LEAST(COUNT(DISTINCT o_orderpriority), 4) AS BIGINT)
               AS uniq_up_to_3
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def group_uniq_array_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupUniqArray(x)`` (+ arrayStringConcat /
    arraySort) and ``uniqUpTo(3)(x)`` — exact distinct count saturating
    at N+1, the cheap "are there more than N" probe: the distinct
    values of a column per group as a sorted array — rendered as a
    joined string so the hash gate compares canonical text. collect_set
    is the map-side-combined native path; sorting happens once per
    group row."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
            F.count_distinct("o_orderpriority").cast("long").alias("n_uniq"),
            F.least(
                F.count_distinct("o_orderpriority"), F.lit(4)
            ).cast("long").alias("uniq_up_to_3"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "rank_corr_spearman",
    oracle="""
    WITH b AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    r AS (
        SELECT l_returnflag,
               2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY x)
                 + COUNT(*) OVER (PARTITION BY l_returnflag, x) - 1 AS rx,
               2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY y)
                 + COUNT(*) OVER (PARTITION BY l_returnflag, y) - 1 AS ry
        FROM b
    ),
    m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(rx) AS DOUBLE) AS sx,
               CAST(SUM(ry) AS DOUBLE) AS sy,
               CAST(SUM(rx * rx) AS DOUBLE) AS sxx,
               CAST(SUM(ry * ry) AS DOUBLE) AS syy,
               CAST(SUM(rx * ry) AS DOUBLE) AS sxy
        FROM r GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           AS DOUBLE) AS spearman_rho
    FROM m ORDER BY l_returnflag
    """,
)
def rank_corr_spearman_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``rankCorr(x, y)`` — Spearman's rho: Pearson
    correlation of the two rank vectors, with average ranks for ties
    kept integral as 2·avg_rank = 2·min_rank + ties − 1 (the array_auc
    trick; correlation is affine-invariant so the ×2 never needs
    undoing). The quadratic rank moments grow as 4n³, which leaves
    int64 near n ≈ 1.3e6 rows per group — the sf1 scaling bench caught
    exactly that overflow — so sxx/syy/sxy accumulate as hi/lo splits
    (divisor 1e8; exact to n ≈ 1e9 rows per group) and reconstruct in
    decimal(38,0) on the group rows; rho evaluates once per group in
    double, identical tree both engines.

    Ranks are the two-pass partition-histogram rank
    (operators/dist_rank.py).  No row-level join back: the x
    histogram (l_quantity, 50 distinct per flag) broadcasts rx onto
    the rows map-side, and every moment then FOLDS from histograms —
    n/sx/sxx from the tiny x histogram, sy/syy from the y histogram
    (all t rows tied at y share one ry, so Σ_rows ry^k = Σ_y t·ry^k,
    term-for-term the same integers as the row-level sum), and
    Σrx·ry = Σ_y srx(y)·ry with srx the per-y rank sum, accumulated
    in decimal(38,0) because srx·ry is cubic in the worst all-ties
    case.  Two fact-table shuffles total (one per axis histogram),
    both plain hash aggregations."""
    li = tables(spark, sf_dir)["lineitem"]
    b = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    hx = histogram_r2(
        b.select("l_returnflag", "x"), "x", keys=["l_returnflag"]
    ).select("l_returnflag", "x", "cnt", F.col("r2").alias("rx"))
    mx = hx.groupBy("l_returnflag").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("rx")).alias("sx"),
        F.sum(F.expr("cnt * (rx * rx DIV 100000000)")).alias("sxx_hi"),
        F.sum(F.expr("cnt * (rx * rx % 100000000)")).alias("sxx_lo"),
    )
    b2 = b.join(
        F.broadcast(hx.select("l_returnflag", "x", "rx")),
        ["l_returnflag", "x"],
    )
    hy = b2.groupBy("l_returnflag", "y").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("rx").alias("srx"),
    )
    hy = dist_cumsum(hy, "y", ["cnt"], keys=["l_returnflag"]).withColumn(
        "ry", 2 * F.col("cum_cnt") - F.col("cnt") + 1
    )
    my = hy.groupBy("l_returnflag").agg(
        F.sum(F.col("cnt") * F.col("ry")).alias("sy"),
        F.sum(F.expr("cnt * (ry * ry DIV 100000000)")).alias("syy_hi"),
        F.sum(F.expr("cnt * (ry * ry % 100000000)")).alias("syy_lo"),
        F.sum(
            F.col("srx").cast("decimal(38,0)") * F.col("ry")
        ).alias("sxy"),
    )
    m = mx.join(my, "l_returnflag")

    def _join(hi: str, lo: str):
        return (
            F.col(hi).cast("decimal(38,0)") * F.lit(100000000) + F.col(lo)
        ).cast("double")

    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd = _join("sxx_hi", "sxx_lo")
    syyd = _join("syy_hi", "syy_lo")
    sxyd = F.col("sxy").cast("double")
    rho = (nd * sxyd - sxd * syd) / F.sqrt(
        (nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)
    )
    return m.select(
        "l_returnflag",
        F.round(rho, 6).cast("double").alias("spearman_rho"),
    ).orderBy("l_returnflag")


@query(
    "mann_whitney_utest",
    oracle="""
    WITH b AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ),
    r AS (
        SELECT l_returnflag, y,
               2 * RANK() OVER (ORDER BY y)
                 + COUNT(*) OVER (PARTITION BY y) - 1 AS r2
        FROM b
    ),
    ties AS (
        SELECT CAST(SUM(t * t * t - t) AS DOUBLE) AS tcorr
        FROM (SELECT COUNT(*) AS t FROM b GROUP BY y)
    ),
    m AS (
        SELECT
            CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                 AS DOUBLE) AS na,
            CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                 AS DOUBLE) AS nr,
            CAST(SUM(CASE WHEN l_returnflag = 'A' THEN r2 END)
                 AS DOUBLE) AS sra2
        FROM r
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nr AS BIGINT) AS n_r,
           CAST(ROUND(((sra2 / 2 - na * (na + 1) / 2) - na * nr / 2)
             / SQRT(na * nr / 12.0
                    * ((na + nr + 1)
                       - tcorr / ((na + nr) * (na + nr - 1)))), 6)
           AS DOUBLE) AS z_stat,
           CAST(ROUND(sra2 / 2 - na * (na + 1) / 2, 1) AS DOUBLE) AS u_a
    FROM m, ties
    """,
)
def mann_whitney_utest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``mannWhitneyUTest(x, y)``: the rank-sum U statistic
    for extended price between return flags A and R, plus the
    tie-corrected normal approximation z. Combined ranks use the
    integral 2·avg_rank form; U_A = ΣR_A − n_A(n_A+1)/2 and
    z = (U_A − n_A·n_R/2) / σ with
    σ² = n_A·n_R/12 · (N+1 − Σ(t³−t)/(N(N−1))). Every sum is an exact
    integer; z and U evaluate once in double on one row.

    Combined ranks come from the two-pass partition-histogram rank
    (operators/dist_rank.py); ΣR_A·2 folds from the histogram as
    Σ n_A(y)·r2(y) with no row-level join, and the tie correction
    Σ(t³−t) reads off the same histogram — one distinct-value pass
    serves ranks, counts, and ties.  ΣR_A·2 ~ N² leaves int64 near
    N ≈ 3e9, so it accumulates as a hi/lo quotient/remainder split
    (divisor 1e8) per the file's discipline."""
    li = tables(spark, sf_dir)["lineitem"].filter(
        F.col("l_returnflag").isin("A", "R")
    )
    b = li.select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
        F.when(F.col("l_returnflag") == "A", 1).otherwise(0).alias("a"),
    )
    h = histogram_r2(b, "y", extra_aggs={"ca": F.sum("a").cast("long")})
    m = h.agg(
        F.sum("ca").alias("na"),
        F.sum(F.col("cnt") - F.col("ca")).alias("nr"),
        F.sum(F.expr("ca * r2 DIV 100000000")).alias("sra2_hi"),
        F.sum(F.expr("ca * r2 % 100000000")).alias("sra2_lo"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).cast("double").alias("tcorr"),
    ).withColumn(
        "sra2",
        (
            F.col("sra2_hi").cast("decimal(38,0)") * F.lit(100000000)
            + F.col("sra2_lo")
        ).cast("double"),
    )
    j = m
    na, nr = F.col("na").cast("double"), F.col("nr").cast("double")
    sra2 = F.col("sra2").cast("double")
    u_a = sra2 / F.lit(2) - na * (na + F.lit(1)) / F.lit(2)
    ntot = na + nr
    sigma = F.sqrt(
        na * nr / F.lit(12.0)
        * ((ntot + F.lit(1))
           - F.col("tcorr") / (ntot * (ntot - F.lit(1))))
    )
    z = (u_a - na * nr / F.lit(2)) / sigma
    return j.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nr").cast("long").alias("n_r"),
        F.round(z, 6).cast("double").alias("z_stat"),
        F.round(u_a, 1).cast("double").alias("u_a"),
    )


@query(
    "exp_time_decayed_avg",
    oracle="""
    WITH b AS (
        SELECT user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) AS t
        FROM events WHERE event_type = 'purchase'
    ),
    k AS (
        SELECT user_id, cents,
               (MAX(t) OVER (PARTITION BY user_id) - t)
                   // CAST(86400e6 AS BIGINT) AS age
        FROM b
    ),
    w AS (
        SELECT user_id, cents,
               CASE WHEN age <= 36
                    THEN CAST(POWER(2, 36 - age) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS wq
        FROM k
    ),
    m AS (
        SELECT user_id,
               CAST(SUM(cents * wq) AS DOUBLE) AS num,
               CAST(SUM(wq) AS DOUBLE) AS den
        FROM w GROUP BY user_id
    )
    SELECT user_id,
           CAST(ROUND(num / den / 100.0, 6) AS DOUBLE) AS decayed_avg
    FROM m WHERE den > 0 ORDER BY user_id
    """,
)
def exp_time_decayed_avg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedAvg(halflife)(v, t)`` — recency
    -weighted average of each user's purchase values, half-life one day.
    Cross-engine determinism demands exact arithmetic, so the decay is
    bucketed to integer half-lives: age = (t_max − t) DIV halflife and
    weight = 2^(36−age) as an exact int64 (0 beyond 36 half-lives, where
    the true weight is < 2⁻³⁶ ≈ 1.5e-11 of the newest point — below the
    1e-6 output rounding). Every sum is integer-exact; one double
    division per user. The delta vs ClickHouse's continuous exp() decay
    is the within-bucket resolution, bounded by 2× weight steps —
    documented, deterministic, and identical on both engines."""
    ev = tables(spark, sf_dir)["events"].filter(
        F.col("event_type") == "purchase"
    )
    b = ev.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.unix_micros("ts").alias("t"),
    )
    wu = Window.partitionBy("user_id")
    k = b.withColumn("tmax", F.max("t").over(wu)).withColumn(
        # exact int64 floor division on both engines (a double division
        # could round up across a bucket boundary)
        "age",
        F.expr("(tmax - t) DIV 86400000000"),
    )
    # integer-exact 2^(36-age); FLOOR-free because POWER(2, int) is exact
    w = k.select(
        "user_id",
        "cents",
        F.when(
            F.col("age") <= 36,
            F.pow(F.lit(2.0), F.lit(36) - F.col("age")).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("wq"),
    )
    # cents*wq reaches ~cents*2^36 per row (~1e17-1e18): a plain int64
    # SUM wraps for a user with thousands of recent purchases while the
    # DuckDB oracle promotes to HUGEINT — so num accumulates as the
    # file's hi/lo quotient/remainder split and reconstructs in
    # decimal(38,0)
    m = w.groupBy("user_id").agg(
        F.sum(F.expr("cents * wq DIV 100000000")).alias("num_hi"),
        F.sum(F.expr("cents * wq % 100000000")).alias("num_lo"),
        F.sum("wq").alias("den"),
    )
    num = (
        F.col("num_hi").cast("decimal(38,0)") * F.lit(100000000)
        + F.col("num_lo")
    ).cast("double")
    return (
        m.filter(F.col("den") > 0)
        .select(
            "user_id",
            F.round(
                num / F.col("den").cast("double") / F.lit(100.0), 6
            )
            .cast("double")
            .alias("decayed_avg"),
        )
        .orderBy("user_id")
    )


@query(
    "sequence_next_node",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    hits AS (
        SELECT user_id, t, event_id, nxt,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY t, event_id) AS rn
        FROM e
        WHERE event_type = 'click'
          AND EXISTS (SELECT 1 FROM events v
                      WHERE v.user_id = e.user_id
                        AND v.event_type = 'view'
                        AND (epoch_us(v.ts) < e.t
                             OR (epoch_us(v.ts) = e.t
                                 AND v.event_id < e.event_id)))
    )
    SELECT user_id, nxt AS next_event_type
    FROM hits WHERE rn = 1 AND nxt IS NOT NULL
    ORDER BY user_id
    """,
)
def sequence_next_node_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode('forward','first_match')(ts, et,
    et='click', et='view')``: the event type that FOLLOWS the first
    'click' which itself has some earlier 'view' — i.e. where does the
    funnel go after view→…→click. One (user, time) sort serves three
    windows: a running had-view flag, the next-event lead, and the
    first-match row_number. Ties break on event_id on both engines."""
    ev = tables(spark, sf_dir)["events"]
    wt = Window.partitionBy("user_id").orderBy("t", "event_id")
    e = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("t"), "event_id"
    ).select(
        "*",
        F.lead("event_type").over(wt).alias("nxt"),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .over(wt.rowsBetween(Window.unboundedPreceding, -1))
        .alias("had_view"),
    )
    hits = (
        e.filter((F.col("event_type") == "click") & (F.col("had_view") == 1))
        .select(
            "user_id", "nxt", F.row_number().over(wt).alias("rn")
        )
    )
    return (
        hits.filter((F.col("rn") == 1) & F.col("nxt").isNotNull())
        .select("user_id", F.col("nxt").alias("next_event_type"))
        .orderBy("user_id")
    )


@query(
    "lttb_downsample",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS ot,
               CAST(ROUND(value * 100) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase'
    ),
    r AS (
        SELECT user_id, event_id, ot, y,
               ot - MIN(ot) OVER (PARTITION BY user_id) AS x,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ot, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM p
    ),
    pb AS (
        SELECT *, (rk - 1) * 10 // n AS b FROM r
    ),
    agg AS (
        SELECT user_id, b,
               SUM(x) AS sx, SUM(y) AS sy, COUNT(*) AS c
        FROM pb GROUP BY user_id, b
    ),
    anch AS (
        SELECT user_id, b,
               lag(sx) OVER w AS pxs, lag(sy) OVER w AS pys,
               lag(c) OVER w AS pc,
               lead(sx) OVER w AS nxs, lead(sy) OVER w AS nys,
               lead(c) OVER w AS nc
        FROM agg WINDOW w AS (PARTITION BY user_id ORDER BY b)
    ),
    scored AS (
        SELECT pb.user_id, pb.b, pb.ot, pb.y, pb.rk, pb.n, pb.event_id,
               a.pc, a.nc,
               CASE WHEN a.pc IS NOT NULL AND a.nc IS NOT NULL THEN
                 abs((CAST(pb.x AS HUGEINT) * a.pc - a.pxs)
                       * (CAST(a.nys AS HUGEINT) * a.pc - CAST(a.pys AS HUGEINT) * a.nc)
                     - (CAST(a.nxs AS HUGEINT) * a.pc - CAST(a.pxs AS HUGEINT) * a.nc)
                       * (CAST(pb.y AS HUGEINT) * a.pc - a.pys))
               END AS t2
        FROM pb JOIN anch a ON pb.user_id = a.user_id AND pb.b = a.b
    ),
    pick AS (
        SELECT user_id, b, ot, y,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, b
                   ORDER BY CASE
                       WHEN pc IS NULL THEN rk         -- first bucket: first pt
                       WHEN nc IS NULL THEN -rk END,   -- last bucket: last pt
                     t2 DESC, ot, event_id) AS pr
        FROM scored
    )
    SELECT user_id, CAST(b AS BIGINT) AS bucket,
           CAST(ot AS BIGINT) AS t_us, CAST(y AS BIGINT) AS v_cents
    FROM pick WHERE pr = 1
    ORDER BY user_id, bucket
    """,
)
def lttb_downsample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``largestTriangleThreeBuckets(10)(t, v)``: downsample
    each user's purchase series to <= 10 visually-representative points.
    Anchored variant: points fall into 10 equal-count buckets; an
    interior bucket keeps the point maximizing the triangle area against
    the MEAN of the previous and next non-empty buckets (CH anchors on
    the previously-selected point, which is inherently sequential; mean
    anchors make every bucket independent — one window pass instead of a
    per-series loop — with the same visual intent). Edge buckets keep
    their first/last point.

    Exactness: areas compare as |T| where T is the cross product scaled
    by prev_count²·next_count — every factor integer (µs offsets ×
    cents), products up to ~1e30 carried in decimal(38,0)/HUGEINT, so
    the argmax and its (t, event_id) tie-break are deterministic on both
    engines. No floats anywhere in the operator."""
    from pyspark.sql.types import DecimalType

    ev = tables(spark, sf_dir)["events"].filter(
        F.col("event_type") == "purchase"
    )
    p = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ot"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
    )
    wu = Window.partitionBy("user_id")
    wt = wu.orderBy("ot", "event_id")
    r = p.select(
        "*",
        (F.col("ot") - F.min("ot").over(wu)).alias("x"),
        F.row_number().over(wt).alias("rk"),
        F.count(F.lit(1)).over(wu).alias("n"),
    )
    pb = r.withColumn("b", F.expr("(rk - 1) * 10 DIV n"))
    agg = pb.groupBy("user_id", "b").agg(
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.count(F.lit(1)).alias("c"),
    )
    wb = Window.partitionBy("user_id").orderBy("b")
    anch = agg.select(
        "user_id",
        "b",
        F.lag("sx").over(wb).alias("pxs"),
        F.lag("sy").over(wb).alias("pys"),
        F.lag("c").over(wb).alias("pc"),
        F.lead("sx").over(wb).alias("nxs"),
        F.lead("sy").over(wb).alias("nys"),
        F.lead("c").over(wb).alias("nc"),
    )
    dec = DecimalType(38, 0)

    def d(c):
        return c.cast(dec)

    t2 = F.abs(
        (d(F.col("x")) * F.col("pc") - F.col("pxs"))
        * (d(F.col("nys")) * F.col("pc") - d(F.col("pys")) * F.col("nc"))
        - (d(F.col("nxs")) * F.col("pc") - d(F.col("pxs")) * F.col("nc"))
        * (d(F.col("y")) * F.col("pc") - F.col("pys"))
    )
    scored = pb.join(anch, ["user_id", "b"]).withColumn(
        "t2",
        F.when(
            F.col("pc").isNotNull() & F.col("nc").isNotNull(), t2
        ),
    )
    edge_key = F.when(F.col("pc").isNull(), F.col("rk")).when(
        F.col("nc").isNull(), -F.col("rk")
    )
    w_pick = Window.partitionBy("user_id", "b").orderBy(
        edge_key.asc_nulls_last(),
        F.col("t2").desc_nulls_last(),
        "ot",
        "event_id",
    )
    pick = scored.withColumn("pr", F.row_number().over(w_pick))
    return (
        pick.filter(F.col("pr") == 1)
        .select(
            "user_id",
            F.col("b").cast("long").alias("bucket"),
            F.col("ot").cast("long").alias("t_us"),
            F.col("y").cast("long").alias("v_cents"),
        )
        .orderBy("user_id", "bucket")
    )


@query(
    "cramers_v_contingency",
    oracle="""
    WITH cells AS (
        SELECT o_orderstatus AS r, o_orderpriority AS c,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2
    ),
    margins AS (
        SELECT r, SUM(o) AS ro FROM cells GROUP BY r
    ),
    colm AS (
        SELECT c, SUM(o) AS co FROM cells GROUP BY c
    ),
    tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT r) AS nr,
                   COUNT(DISTINCT c) AS nc FROM cells),
    terms AS (
        SELECT CAST(FLOOR(
                 (CAST(cells.o AS DOUBLE)
                    - CAST(m.ro AS DOUBLE) * cm.co / t.n)
                 * (CAST(cells.o AS DOUBLE)
                    - CAST(m.ro AS DOUBLE) * cm.co / t.n)
                 / (CAST(m.ro AS DOUBLE) * cm.co / t.n)
                 * 1e9 + 0.5) AS BIGINT) AS q
        FROM cells
        JOIN margins m ON cells.r = m.r
        JOIN colm cm ON cells.c = cm.c
        CROSS JOIN tot t
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(ROUND(SQRT(CAST(s.chi2q AS DOUBLE) / 1e9
                           / (t.n * (LEAST(t.nr, t.nc) - 1))), 6)
                AS DOUBLE) AS cramers_v,
           CAST(ROUND(SQRT(CAST(s.chi2q AS DOUBLE) / 1e9
                           / (CAST(s.chi2q AS DOUBLE) / 1e9 + t.n)), 6)
                AS DOUBLE) AS contingency_coef
    FROM (SELECT SUM(q) AS chi2q FROM terms) s CROSS JOIN tot t
    """,
)
def cramers_v_contingency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``cramersV(x, y)`` + ``contingency(x, y)``: association
    between order status and priority from the full contingency table.
    Each cell's χ² term (o−e)²/e is computed in double on identical
    integer operands — same expression tree both engines — then
    QUANTIZED to a 1e-9 grid and summed as int64, so the cross-cell
    summation order (which the engines do differ on) can't move the
    total. V and the contingency coefficient evaluate once from the
    exact quantized χ². The contingency table itself is tiny (|statuses|
    × |priorities|); the only full-data pass is the cell count."""
    o = tables(spark, sf_dir)["orders"]
    cells = o.groupBy(
        F.col("o_orderstatus").alias("r"), F.col("o_orderpriority").alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = cells.groupBy("r").agg(F.sum("o").alias("ro"))
    colm = cells.groupBy("c").agg(F.sum("o").alias("co"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("r").alias("nr"),
        F.count_distinct("c").alias("nc"),
    )
    e = F.col("ro").cast("double") * F.col("co") / F.col("n")
    term = (F.col("o").cast("double") - e) * (
        F.col("o").cast("double") - e
    ) / e
    terms = (
        cells.join(F.broadcast(margins), "r")
        .join(F.broadcast(colm), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long").alias("q")
        )
    )
    s = terms.agg(F.sum("q").alias("chi2q"))
    j = s.crossJoin(F.broadcast(tot))
    chi2 = F.col("chi2q").cast("double") / F.lit(1e9)
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            F.sqrt(chi2 / (F.col("n") * (F.least("nr", "nc") - F.lit(1)))),
            6,
        )
        .cast("double")
        .alias("cramers_v"),
        F.round(F.sqrt(chi2 / (chi2 + F.col("n"))), 6)
        .cast("double")
        .alias("contingency_coef"),
    )


@query(
    "quantiles_exact_weighted",
    oracle="""
    WITH b AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ),
    c AS (
        SELECT l_returnflag, y, w,
               SUM(w) OVER (PARTITION BY l_returnflag
                            ORDER BY y ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM b
    )
    SELECT l_returnflag,
           CAST(MIN(CASE WHEN 4 * cw >= tw THEN y END) AS BIGINT)
               AS p25_cents,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN y END) AS BIGINT)
               AS p50_cents,
           CAST(MIN(CASE WHEN 4 * cw >= 3 * tw THEN y END) AS BIGINT)
               AS p75_cents
    FROM c GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def quantiles_exact_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantilesExactWeighted(0.25, 0.5, 0.75)(y, w)``:
    weight-cumulative exact quantiles (weighted_median generalized to a
    quantile VECTOR) — the smallest value whose running weight reaches
    q·total. Cumulative weights come from the distributed two-pass
    histogram cumsum (operators/dist_rank.py; the per-group window sort
    this replaced measured sf1 exponent 0.718 — a third of the table in
    one task); all three quantiles read off the same cumsum as
    conditional mins, and the q·total comparisons stay integral
    (4·cw ≥ k·tw), so no float crosses the selection boundary.
    Per-distinct-value cumulation picks the same boundary values: the
    cumsum at y includes every tied row's weight.

    r15 (OPTIMIZATION_r15.md): the full dist_cumsum paid two
    near-fact-sized exchanges because prices are near-unique; the three
    threshold selectors only need the crossing-bucket values, so the
    cumsum now comes from the two-level boundary histogram
    (weighted_quantile_boundary_cw — zero fact-sized exchanges, one
    extra columnar scan). The conditional aggregates below are
    unchanged; equivalence argument in the operator docstring. Bucket
    width 4096 cents over the scale-free TPC-H price domain
    (~90k..10.5M cents) gives ~2.5k buckets per group at any SF."""
    from ..operators.dist_rank import weighted_quantile_boundary_cw

    li = tables(spark, sf_dir)["lineitem"]
    rows = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
        F.col("l_quantity").cast("long").alias("__w"),
    )
    c = weighted_quantile_boundary_cw(
        rows, "l_returnflag", "y", [(4, 1), (2, 1), (4, 3)], 4096
    )
    return (
        c.groupBy("l_returnflag")
        .agg(
            F.min(F.when(4 * F.col("cw") >= F.col("tw"), F.col("y")))
            .cast("long")
            .alias("p25_cents"),
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("y")))
            .cast("long")
            .alias("p50_cents"),
            F.min(F.when(4 * F.col("cw") >= 3 * F.col("tw"), F.col("y")))
            .cast("long")
            .alias("p75_cents"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "kolmogorov_smirnov_test",
    oracle="""
    WITH b AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ),
    v AS (
        SELECT y,
               SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cr
        FROM b GROUP BY y
    ),
    c AS (
        SELECT SUM(ca) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) AS cuma,
               SUM(cr) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) AS cumr
        FROM v
    ),
    t AS (SELECT SUM(ca) AS na, SUM(cr) AS nr FROM v),
    d AS (SELECT MAX(abs(cuma * (SELECT nr FROM t)
                         - cumr * (SELECT na FROM t))) AS dmax
          FROM c)
    SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nr AS BIGINT) AS n_r,
           CAST(ROUND(CAST(d.dmax AS DOUBLE)
                      / (CAST(t.na AS DOUBLE) * t.nr), 6) AS DOUBLE)
               AS ks_stat
    FROM d CROSS JOIN t
    """,
)
def kolmogorov_smirnov_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``kolmogorovSmirnovTest(x, y)``: the two-sample KS
    statistic D = max |F_A(y) − F_R(y)| between the A and R price
    distributions. Exactness: at every distinct value the CDF gap
    compares as the INTEGER |cum_A·n_R − cum_R·n_A| (common denominator
    n_A·n_R cleared), so the max is an integer max and the single
    division to D happens once. One distinct-value aggregate, one
    DISTRIBUTED cumulative sum over the value order (two-pass
    partition-histogram cumsum, operators/dist_rank.py — range
    partition + per-slice running sums + broadcast offsets, no
    single-task sort), one max."""
    li = tables(spark, sf_dir)["lineitem"].filter(
        F.col("l_returnflag").isin("A", "R")
    )
    b = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    is_a = F.col("l_returnflag") == "A"
    v = b.groupBy("y").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("cr"),
    )
    c = dist_cumsum(v, "y", ["ca", "cr"]).select(
        F.col("cum_ca").alias("cuma"), F.col("cum_cr").alias("cumr")
    )
    t = v.agg(F.sum("ca").alias("na"), F.sum("cr").alias("nr"))
    d = (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.max(
                F.abs(F.col("cuma") * F.col("nr") - F.col("cumr") * F.col("na"))
            ).alias("dmax")
        )
    )
    j = d.crossJoin(F.broadcast(t))
    return j.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nr").cast("long").alias("n_r"),
        F.round(
            F.col("dmax").cast("double")
            / (F.col("na").cast("double") * F.col("nr")),
            6,
        )
        .cast("double")
        .alias("ks_stat"),
    )


@query(
    "window_funnel_strict_order",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
               lag(event_type) OVER w AS p1_type,
               lag(epoch_us(ts)) OVER w AS p1_t,
               lag(event_type, 2) OVER w AS p2_type,
               lag(epoch_us(ts), 2) OVER w AS p2_t
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    f AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
               MAX(CASE WHEN event_type = 'click' AND p1_type = 'view'
                         AND t - p1_t <= {_FUNNEL_W()} THEN 1 ELSE 0 END)
                   AS l2,
               MAX(CASE WHEN event_type = 'purchase'
                         AND p1_type = 'click' AND p2_type = 'view'
                         AND t - p2_t <= {_FUNNEL_W()} THEN 1 ELSE 0 END)
                   AS l3
        FROM e GROUP BY user_id
    )
    SELECT CAST(l1 + l2 + l3 AS INT) AS funnel_level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM (SELECT user_id,
                 l1,
                 CASE WHEN l1 = 1 THEN l2 ELSE 0 END AS l2,
                 CASE WHEN l1 = 1 AND l2 = 1 THEN l3 ELSE 0 END AS l3
          FROM f)
    GROUP BY 1 ORDER BY 1
    """,
)
def window_funnel_strict_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(window, 'strict_order')``: the funnel
    only advances when the steps are CONSECUTIVE events — a click counts
    only if the immediately preceding event is a view (any intervening
    event breaks the chain), a purchase only if preceded by exactly
    click-after-view, all inside the time window. Two lags over one
    (user, time) sort replace window_funnel's running-max construction;
    levels stay monotone (a level only counts if the previous one was
    reached). Output is the same per-level user histogram as
    window_funnel — directly comparable to see how much the strict mode
    shrinks each level."""
    ev = tables(spark, sf_dir)["events"]
    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        F.lag("event_type").over(wt).alias("p1_type"),
        F.lag(F.unix_micros("ts")).over(wt).alias("p1_t"),
        F.lag("event_type", 2).over(wt).alias("p2_type"),
        F.lag(F.unix_micros("ts"), 2).over(wt).alias("p2_t"),
    )
    w = F.lit(_FUNNEL_W())
    f = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("l1"),
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("p1_type") == "view")
                & (F.col("t") - F.col("p1_t") <= w),
                1,
            ).otherwise(0)
        ).alias("l2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("p1_type") == "click")
                & (F.col("p2_type") == "view")
                & (F.col("t") - F.col("p2_t") <= w),
                1,
            ).otherwise(0)
        ).alias("l3"),
    )
    lvl = (
        F.col("l1")
        + F.when(F.col("l1") == 1, F.col("l2")).otherwise(0)
        + F.when(
            (F.col("l1") == 1) & (F.col("l2") == 1), F.col("l3")
        ).otherwise(0)
    )
    return (
        f.select(lvl.cast("int").alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("funnel_level")
    )


@query(
    "bitmap_set_cardinalities",
    oracle="""
    WITH v AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view'),
    c AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase')
    SELECT
        CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
        CAST((SELECT COUNT(*) FROM v JOIN c USING (user_id)) AS BIGINT)
            AS view_and_click,
        CAST((SELECT COUNT(*) FROM (SELECT user_id FROM v
                                    UNION SELECT user_id FROM c))
             AS BIGINT) AS view_or_click,
        CAST((SELECT COUNT(*) FROM v
              WHERE user_id NOT IN (SELECT user_id FROM p)) AS BIGINT)
            AS view_andnot_purchase
    """,
)
def bitmap_set_cardinalities_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse bitmap family — ``groupBitmap`` /
    ``groupBitmapAnd/Or/AndNot`` cardinalities (bitmapAnd, bitmapOr,
    bitmapAndnot over per-segment user bitmaps): audience intersection /
    union / difference counts between event-type segments. Spark-first,
    the bitmap IS the distinct key set: semi/anti joins and a distinct
    union — expressed as ONE plan: per-user membership flags (a single
    map-side-combined aggregate over (user, 3 booleans)) followed by one
    global conditional count, so all four cardinalities share a single
    shuffle and nothing executes at DataFrame-build time. At 100 TB this
    is the layout roaring bitmaps accelerate; the relational plan has
    the same asymptotics (shuffle on the id)."""
    ev = tables(spark, sf_dir)["events"]
    flags = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("v"),
        F.max((F.col("event_type") == "click").cast("int")).alias("c"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
    )
    one = F.lit(1)
    return flags.agg(
        F.sum(F.when(F.col("v") == 1, one).otherwise(0))
        .cast("long")
        .alias("n_view"),
        F.sum(F.when((F.col("v") == 1) & (F.col("c") == 1), one).otherwise(0))
        .cast("long")
        .alias("view_and_click"),
        F.sum(F.when((F.col("v") == 1) | (F.col("c") == 1), one).otherwise(0))
        .cast("long")
        .alias("view_or_click"),
        F.sum(F.when((F.col("v") == 1) & (F.col("p") == 0), one).otherwise(0))
        .cast("long")
        .alias("view_andnot_purchase"),
    )


@query(
    "group_array_sample",
    oracle="""
    WITH r AS (
        SELECT o_orderstatus, o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY md5(CAST(o_orderkey AS VARCHAR) || ':42'),
                            o_orderkey) AS rn
        FROM orders
    )
    SELECT o_orderstatus,
           array_to_string(list_sort(list(o_orderkey)), ',') AS sample_keys
    FROM r WHERE rn <= 3
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def group_array_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArraySample(3, 42)(x)``: a fixed-size uniform
    sample of values per group. Determinism across engines comes from
    hash-ordering instead of RNG state: rank by md5(value || ':seed')
    (the portable-hash idiom every dedup operator here uses) and keep
    the first 3 — a seeded sample both engines reproduce bit-exactly.
    One window over the group sort, map-side nothing-fancy; rendered as
    a sorted joined string for the hash gate."""
    o = tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":42"))),
        "o_orderkey",
    )
    r = o.select(
        "o_orderstatus", "o_orderkey", F.row_number().over(w).alias("rn")
    )
    return (
        r.filter(F.col("rn") <= 3)
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("o_orderkey")), ","
            ).alias("sample_keys")
        )
        .orderBy("o_orderstatus")
    )


@query(
    "quantile_timing",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CASE WHEN CAST(ROUND(value) AS BIGINT) < 1024
                    THEN CAST(ROUND(value) AS BIGINT)
                    ELSE LEAST(CAST(ROUND(value) AS BIGINT) // 16 * 16,
                               30000) END AS ms
        FROM events
    ),
    c AS (
        SELECT event_type, ms,
               SUM(1) OVER (PARTITION BY event_type
                            ORDER BY ms ROWS UNBOUNDED PRECEDING) AS cw,
               COUNT(*) OVER (PARTITION BY event_type) AS tw
        FROM b
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN ms END) AS BIGINT)
               AS p50_ms,
           CAST(MIN(CASE WHEN 10 * cw >= 9 * tw THEN ms END) AS BIGINT)
               AS p90_ms
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def quantile_timing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileTiming(q)(t)``: the timing-specialized
    quantile with CH's documented resolution — exact integer
    milliseconds below 1024, 16 ms buckets above, saturated at 30 s.
    After bucketing, the quantile is EXACT over integers (the same
    cumulative-count threshold construction as quantiles_exact_weighted
    with unit weights, k·cw ≥ q·tw kept integral), so the sketch's
    deterministic contract survives the hash gate — unlike t-digest,
    whose centroids are stream-order-dependent."""
    ev = tables(spark, sf_dir)["events"]
    v = F.round(F.col("value"), 0).cast("long")
    b = ev.select(
        "event_type",
        F.when(v < 1024, v)
        .otherwise(F.least(F.expr(
            "CAST(ROUND(value, 0) AS BIGINT) DIV 16 * 16"
        ), F.lit(30000)))
        .alias("ms"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = b.select(
        "event_type",
        "ms",
        F.sum(F.lit(1)).over(wc).alias("cw"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("tw"),
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("ms")))
            .cast("long")
            .alias("p50_ms"),
            F.min(F.when(10 * F.col("cw") >= 9 * F.col("tw"), F.col("ms")))
            .cast("long")
            .alias("p90_ms"),
        )
        .orderBy("event_type")
    )


@query(
    "group_array_intersect",
    oracle="""
    WITH dw AS (
        SELECT DISTINCT d.lang, d.doc_id, w.w
        FROM documents d,
             unnest(list_filter(string_split_regex(trim(d.text), '\\s+'),
                                x -> length(x) > 0)) AS w(w)
    ),
    per_lang AS (
        SELECT lang, COUNT(DISTINCT doc_id) AS n_docs FROM dw GROUP BY lang
    ),
    common AS (
        SELECT dw.lang, dw.w
        FROM dw JOIN per_lang p ON dw.lang = p.lang
        GROUP BY dw.lang, dw.w, p.n_docs
        HAVING COUNT(DISTINCT dw.doc_id) = p.n_docs
    )
    SELECT p.lang,
           CAST(p.n_docs AS BIGINT) AS n_docs,
           COALESCE(array_to_string(list_sort(list(c.w)), ','), '')
               AS common_words
    FROM per_lang p LEFT JOIN common c ON p.lang = c.lang
    GROUP BY p.lang, p.n_docs ORDER BY p.lang
    """,
)
def group_array_intersect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayIntersect(arr)``: the intersection of the
    per-row word sets across each group — here, words present in EVERY
    document of a language. Relational rendering: distinct (lang, doc,
    word) triples, then a word survives iff its distinct-doc count
    equals the group's doc count — two map-side-combined aggregates, no
    per-row set state; the intersection is emitted as a sorted joined
    string (empty when no word is universal). Scale shape: the triple
    dedup is the only wide shuffle and it is (lang, word)-keyed."""
    d = tables(spark, sf_dir)["documents"]
    from ..operators.text import tokenize

    dw = d.select(
        "lang", "doc_id", F.explode(tokenize(F.col("text"))).alias("w")
    ).distinct()
    per_lang = dw.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    common = (
        dw.join(per_lang, "lang")
        .groupBy("lang", "w", "n_docs")
        .agg(F.count_distinct("doc_id").alias("dc"))
        .filter(F.col("dc") == F.col("n_docs"))
        .select("lang", "w")
    )
    return (
        per_lang.join(
            common.groupBy("lang").agg(
                F.array_join(F.sort_array(F.collect_list("w")), ",").alias(
                    "cw"
                )
            ),
            "lang",
            "left",
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.coalesce(F.col("cw"), F.lit("")).alias("common_words"),
        )
        .orderBy("lang")
    )
