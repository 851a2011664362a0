"""Round-10 query wave 7: categorical-association and trend-break
operators — Goodman–Kruskal λ (proportional-reduction-in-error of
predicting order priority from price bucket), Goodman–Kruskal γ
(ordinal concordance over the discount × quantity grid), the 2×2 odds
ratio with its Woolf logit CI and relative risk, and a two-segment
piecewise-linear trend-break fit of the daily revenue series (argmin
SSE over candidate breakpoints).

Reference parity note: the reference grammar admits the contingency
family as plain aggregate names (``cramersV``, ``theilsU``,
``contingency`` — generic function rule,
generated_ch_parser/ClickHouseParser.py:15571); λ and γ complete that
family's PRE and ordinal members, the odds ratio is its 2×2 epidemiology
member, and the trend break extends the changepoint family
(cusum_changepoint, page_hinkley_drift detect mean shifts; this FITS the
two-regime trend).

Exactness discipline: grids and 2×2 counts are exact int64 off one
scan-agg each; day-series moments accumulate as exact
DECIMAL(38,0)/HUGEINT prefix sums (y² would leave int64 at sf10); the
per-candidate SSE doubles derive from exact integers through identical
IEEE expressions on both engines, so the argmin agrees bit-for-bit;
finals floor-quantize at 1e6 (q6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import q6, query, tables

# ---------------------------------------------------------------------------
# goodman_kruskal_lambda
# ---------------------------------------------------------------------------


@query(
    "goodman_kruskal_lambda",
    oracle="""
    WITH g AS (
        SELECT LEAST(CAST(FLOOR(o_totalprice / 55000.0) AS BIGINT), 9)
                   AS b,
               o_orderpriority AS pri,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ),
    rowmax AS (
        SELECT CAST(SUM(mx) AS BIGINT) AS sum_row_max
        FROM (SELECT b, MAX(n) AS mx FROM g GROUP BY b)
    ),
    colmax AS (
        SELECT CAST(MAX(s) AS BIGINT) AS max_col
        FROM (SELECT pri, SUM(n) AS s FROM g GROUP BY pri)
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM g)
    SELECT tot.n AS n, rowmax.sum_row_max, colmax.max_col,
           FLOOR(CAST(rowmax.sum_row_max - colmax.max_col AS DOUBLE)
                 / (tot.n - colmax.max_col) * 1000000 + 0.5) / 1000000
               AS lambda_gk
    FROM rowmax, colmax, tot
    """,
)
def goodman_kruskal_lambda_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goodman–Kruskal λ: the proportional reduction in prediction error
    for order priority when the price bucket is known —
    λ = (Σ_b max_k n_bk − max_k n_·k)/(n − max_k n_·k), i.e. how much
    better "predict the bucket's modal priority" does than "always
    predict the global mode". The PRE member of the contingency family
    next to cramers_v (effect size) and theils_u (entropy reduction);
    λ = 0 means the bucket adds nothing even when χ² is huge. λ uses
    only counts and maxima, so everything is exact int64 until one
    final division.

    Scale shape: ONE map-side-combined grid agg (≤50 cells), then
    constant-size maxima."""
    o = tables(spark, sf_dir)["orders"]
    g = (
        o.select(
            F.least(
                F.floor(F.col("o_totalprice") / 55000.0).cast("long"),
                F.lit(9),
            ).alias("b"),
            F.col("o_orderpriority").alias("pri"),
        )
        .groupBy("b", "pri")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)  # ≤50-cell grid feeds 3 consumers
    )
    rowmax = g.groupBy("b").agg(F.max("n").alias("mx")).agg(
        F.sum("mx").cast("long").alias("sum_row_max")
    )
    colmax = g.groupBy("pri").agg(F.sum("n").alias("s")).agg(
        F.max("s").cast("long").alias("max_col")
    )
    tot = g.agg(F.sum("n").cast("long").alias("n"))
    return (
        tot.crossJoin(F.broadcast(rowmax))
        .crossJoin(F.broadcast(colmax))
        .select(
            "n",
            "sum_row_max",
            "max_col",
            q6(
                (F.col("sum_row_max") - F.col("max_col")).cast("double")
                / (F.col("n") - F.col("max_col"))
            ).alias("lambda_gk"),
        )
    )


# ---------------------------------------------------------------------------
# goodman_kruskal_gamma
# ---------------------------------------------------------------------------


@query(
    "goodman_kruskal_gamma",
    oracle="""
    WITH g AS (
        SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS bx,
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
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM g)
    SELECT tot.n AS n, pq.p AS concordant, pq.q AS discordant,
           FLOOR(CAST(pq.p - pq.q AS DOUBLE) / (pq.p + pq.q)
                 * 1000000 + 0.5) / 1000000 AS gamma
    FROM pq, tot
    """,
)
def goodman_kruskal_gamma_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goodman–Kruskal γ between discount level (11 exact percent
    values) and quantity decile: γ = (P−Q)/(P+Q) over concordant /
    discordant pairs — the ordinal-association member that IGNORES ties
    (kendall_tau_b_binned corrects for them; γ answers "of the pairs
    that order at all, what fraction order the same way", the right
    reading for heavily-tied grids). Pair masses come from the ≤110-cell
    grid's broadcast self-join, ACCUMULATED in decimal(38,0) so the sum
    is exact at any reachable sf (pair count ~n²/2 ≈ 2e16 at sf10; int64
    accumulation would wrap silently past ~sf500 in non-ANSI mode while
    the DuckDB oracle widens to HUGEINT — r10 advice). The output
    columns stay int64 to match the oracle's BIGINT; past the int64
    bound the cast yields NULL (Spark) / error (DuckDB) — loud, never a
    silently-wrong number — and gamma itself is computed from the exact
    decimals so it stays correct regardless.

    Scale shape: one map-side-combined grid agg; the self-join is
    grid-sized (≤110×110), never data-sized."""
    li = tables(spark, sf_dir)["lineitem"]
    g = (
        li.select(
            F.round(F.col("l_discount") * 100, 0).cast("long").alias("bx"),
            F.least(
                F.floor(F.col("l_quantity") / 5.0).cast("long"), F.lit(9)
            ).alias("by_"),
        )
        .groupBy("bx", "by_")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    a, b = g.alias("a"), g.alias("b")
    pq = a.join(
        F.broadcast(b),
        ~(
            (F.col("a.bx") == F.col("b.bx"))
            & (F.col("a.by_") == F.col("b.by_"))
        ),
    ).agg(
        F.sum(
            F.when(
                (F.col("b.bx") > F.col("a.bx"))
                & (F.col("b.by_") > F.col("a.by_")),
                F.col("a.n").cast("decimal(38,0)") * F.col("b.n"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("p"),
        F.sum(
            F.when(
                (F.col("b.bx") > F.col("a.bx"))
                & (F.col("b.by_") < F.col("a.by_")),
                F.col("a.n").cast("decimal(38,0)") * F.col("b.n"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q"),
    )
    tot = g.agg(F.sum("n").cast("long").alias("n"))
    return pq.crossJoin(F.broadcast(tot)).select(
        "n",
        F.col("p").cast("long").alias("concordant"),
        F.col("q").cast("long").alias("discordant"),
        q6(
            (F.col("p") - F.col("q")).cast("double")
            / (F.col("p") + F.col("q")).cast("double")
        ).alias("gamma"),
    )


# ---------------------------------------------------------------------------
# odds_ratio_ci
# ---------------------------------------------------------------------------


@query(
    "odds_ratio_ci",
    oracle="""
    WITH r AS (
        SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS x,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    m AS (
        SELECT CAST(SUM(x * y) AS BIGINT) AS a,
               CAST(SUM(x * (1 - y)) AS BIGINT) AS b,
               CAST(SUM((1 - x) * y) AS BIGINT) AS c,
               CAST(SUM((1 - x) * (1 - y)) AS BIGINT) AS d
        FROM r
    )
    SELECT a, b, c, d,
           FLOOR(CAST(a AS DOUBLE) * d / b / c * 1000000 + 0.5)
               / 1000000 AS odds_ratio,
           FLOOR(exp(ln(CAST(a AS DOUBLE) * d / b / c)
                     - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d))
                 * 1000000 + 0.5) / 1000000 AS ci_lo,
           FLOOR(exp(ln(CAST(a AS DOUBLE) * d / b / c)
                     + 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d))
                 * 1000000 + 0.5) / 1000000 AS ci_hi,
           FLOOR((CAST(a AS DOUBLE) / (a + b))
                 / (CAST(c AS DOUBLE) / (c + d)) * 1000000 + 0.5)
               / 1000000 AS relative_risk
    FROM m
    """,
)
def odds_ratio_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 odds ratio of (long document ≥300 chars — the corpus median) × (English) with the
    Woolf logit 95% CI — exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)) — plus the
    relative risk, the effect-size pair every epidemiology-style 2×2
    readout reports where cramers_v only gives magnitude. Cell counts
    exact int64 off one scan-agg; OR/CI/RR evaluate once on one row via
    identical IEEE expressions.

    Scale shape: ONE map-side-combined scan-agg to a single row."""
    d = tables(spark, sf_dir)["documents"]
    m = d.select(
        (F.col("n_chars") >= 300).cast("long").alias("x"),
        (F.col("lang") == "en").cast("long").alias("y"),
    ).agg(
        F.sum(F.col("x") * F.col("y")).cast("long").alias("a"),
        F.sum(F.col("x") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("x")) * F.col("y")).cast("long").alias("c"),
        F.sum((1 - F.col("x")) * (1 - F.col("y"))).cast("long").alias("d"),
    )
    orr = (
        F.col("a").cast("double") * F.col("d") / F.col("b") / F.col("c")
    )
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c")
        + 1.0 / F.col("d")
    )
    rr = (F.col("a").cast("double") / (F.col("a") + F.col("b"))) / (
        F.col("c").cast("double") / (F.col("c") + F.col("d"))
    )
    return m.select(
        "a",
        "b",
        "c",
        "d",
        q6(orr).alias("odds_ratio"),
        q6(F.exp(F.log(orr) - 1.96 * se)).alias("ci_lo"),
        q6(F.exp(F.log(orr) + 1.96 * se)).alias("ci_hi"),
        q6(rr).alias("relative_risk"),
    )


# ---------------------------------------------------------------------------
# segmented_trend_break
# ---------------------------------------------------------------------------


@query(
    "segmented_trend_break",
    oracle="""
    WITH d AS (
        SELECT datediff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS t,
               CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ),
    o AS (
        SELECT t, y, ROW_NUMBER() OVER (ORDER BY t) AS i,
               COUNT(*) OVER () AS nd,
               SUM(CAST(t AS HUGEINT)) OVER w AS sx,
               SUM(CAST(y AS HUGEINT)) OVER w AS sy,
               SUM(CAST(t AS HUGEINT) * t) OVER w AS sxx,
               SUM(CAST(t AS HUGEINT) * y) OVER w AS sxy,
               SUM(CAST(y AS HUGEINT) * y) OVER w AS syy,
               SUM(CAST(t AS HUGEINT)) OVER () AS tx,
               SUM(CAST(y AS HUGEINT)) OVER () AS ty,
               SUM(CAST(t AS HUGEINT) * t) OVER () AS txx,
               SUM(CAST(t AS HUGEINT) * y) OVER () AS txy,
               SUM(CAST(y AS HUGEINT) * y) OVER () AS tyy
        FROM d
        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    cand AS (
        SELECT t,
               (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / i)
                   / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / i)
                   AS slope_l,
               (CAST(txy - sxy AS DOUBLE)
                - CAST(tx - sx AS DOUBLE) * CAST(ty - sy AS DOUBLE)
                  / (nd - i))
                   / (CAST(txx - sxx AS DOUBLE)
                      - CAST(tx - sx AS DOUBLE) * CAST(tx - sx AS DOUBLE)
                        / (nd - i)) AS slope_r,
               CAST(tyy AS DOUBLE) - CAST(ty AS DOUBLE) * ty / nd
                   - (CAST(txy AS DOUBLE) - CAST(tx AS DOUBLE) * ty / nd)
                     * (CAST(txy AS DOUBLE) - CAST(tx AS DOUBLE) * ty / nd)
                     / (CAST(txx AS DOUBLE) - CAST(tx AS DOUBLE) * tx / nd)
                   AS sse_1,
               (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / i
                - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / i)
                  * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / i)
                  / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / i))
               + (CAST(tyy - syy AS DOUBLE)
                  - CAST(ty - sy AS DOUBLE) * CAST(ty - sy AS DOUBLE)
                    / (nd - i)
                  - (CAST(txy - sxy AS DOUBLE)
                     - CAST(tx - sx AS DOUBLE) * CAST(ty - sy AS DOUBLE)
                       / (nd - i))
                    * (CAST(txy - sxy AS DOUBLE)
                       - CAST(tx - sx AS DOUBLE) * CAST(ty - sy AS DOUBLE)
                         / (nd - i))
                    / (CAST(txx - sxx AS DOUBLE)
                       - CAST(tx - sx AS DOUBLE) * CAST(tx - sx AS DOUBLE)
                         / (nd - i))) AS sse_2
        FROM o
        WHERE i % 30 = 0 AND i >= 60 AND i <= nd - 60
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY sse_2, t) AS rn FROM cand
    )
    SELECT CAST(t AS BIGINT) AS break_t,
           FLOOR(slope_l * 1000000 + 0.5) / 1000000 AS slope_left,
           FLOOR(slope_r * 1000000 + 0.5) / 1000000 AS slope_right,
           FLOOR((1.0 - sse_2 / sse_1) * 1000000 + 0.5) / 1000000
               AS sse_reduction
    FROM ranked WHERE rn = 1
    """,
)
def segmented_trend_break_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-segment piecewise-linear trend-break fit of the daily revenue
    series: for every 30th candidate day (≥60 days margin each side),
    fit OLS left and right from HUGEINT/DECIMAL(38,0) prefix moments and
    pick the breakpoint minimizing total SSE — the regime-FITTING
    complement to the drift DETECTORS (cusum_changepoint,
    page_hinkley_drift): it answers "when did the trend change and to
    what", not just "did it". All moments are exact integer prefix sums
    (y² leaves int64 at sf10 — hence 128-bit); each candidate's SSE is
    one closed-form double from exact integers, identical on both
    engines, so the argmin agrees bit-for-bit (ties break to the
    earliest day).

    Scale shape: one hash agg to the ~2,400-day series, one ordered
    prefix window over it, ~80 candidate rows — constant-size after the
    first agg."""
    o = tables(spark, sf_dir)["orders"]
    d = o.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01")
        ).alias("t")
    ).agg(
        F.sum(F.round(F.col("o_totalprice"), 0).cast("long"))
        .cast("long")
        .alias("y")
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    td = F.col("t").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    oo = d.select(
        "t",
        "y",
        F.row_number().over(Window.orderBy("t")).alias("i"),
        F.count(F.lit(1)).over(wall).alias("nd"),
        F.sum(td).over(wcum).alias("sx"),
        F.sum(yd).over(wcum).alias("sy"),
        F.sum(td * td).over(wcum).alias("sxx"),
        F.sum(td * yd).over(wcum).alias("sxy"),
        F.sum(yd * yd).over(wcum).alias("syy"),
        F.sum(td).over(wall).alias("tx"),
        F.sum(yd).over(wall).alias("ty"),
        F.sum(td * td).over(wall).alias("txx"),
        F.sum(td * yd).over(wall).alias("txy"),
        F.sum(yd * yd).over(wall).alias("tyy"),
    )
    cand = oo.filter(
        (F.col("i") % 30 == 0)
        & (F.col("i") >= 60)
        & (F.col("i") <= F.col("nd") - 60)
    )

    def _sse(sx, sy, sxx, sxy, syy, n):
        vxy = sxy.cast("double") - sx.cast("double") * sy / n
        vxx = sxx.cast("double") - sx.cast("double") * sx / n
        return (
            syy.cast("double") - sy.cast("double") * sy / n
            - vxy * vxy / vxx
        )

    def _slope(sx, sy, sxx, sxy, n):
        vxy = sxy.cast("double") - sx.cast("double") * sy / n
        vxx = sxx.cast("double") - sx.cast("double") * sx / n
        return vxy / vxx

    i = F.col("i").cast("double")
    ni = (F.col("nd") - F.col("i")).cast("double")
    rx = F.col("tx") - F.col("sx")
    ry = F.col("ty") - F.col("sy")
    rxx = F.col("txx") - F.col("sxx")
    rxy = F.col("txy") - F.col("sxy")
    ryy = F.col("tyy") - F.col("syy")
    sse_l = _sse(F.col("sx"), F.col("sy"), F.col("sxx"), F.col("sxy"),
                 F.col("syy"), i)
    sse_r = _sse(rx, ry, rxx, rxy, ryy, ni)
    sse_1 = _sse(F.col("tx"), F.col("ty"), F.col("txx"), F.col("txy"),
                 F.col("tyy"), F.col("nd").cast("double"))
    scored = cand.select(
        "t",
        _slope(F.col("sx"), F.col("sy"), F.col("sxx"), F.col("sxy"), i)
        .alias("slope_l"),
        _slope(rx, ry, rxx, rxy, ni).alias("slope_r"),
        sse_1.alias("sse_1"),
        (sse_l + sse_r).alias("sse_2"),
    )
    best = scored.withColumn(
        "rn",
        F.row_number().over(Window.orderBy("sse_2", "t")),
    ).filter(F.col("rn") == 1)
    return best.select(
        F.col("t").cast("long").alias("break_t"),
        q6(F.col("slope_l")).alias("slope_left"),
        q6(F.col("slope_r")).alias("slope_right"),
        q6(F.lit(1.0) - F.col("sse_2") / F.col("sse_1")).alias(
            "sse_reduction"
        ),
    )
