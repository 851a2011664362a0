"""Round-10 query wave 6: ordered-trend, extreme-value, time-series-
dependence, post-hoc-comparison, and path-attribution operators — the
Cochran–Armitage trend test over ordered price buckets, a Gumbel
block-maxima fit with exceedance probability, Yule–Walker partial
autocorrelations (Durbin–Levinson, lags 1–3) of the daily revenue
series, Tukey-HSD pairwise studentized contrasts after the segment
ANOVA, and Markov removal-effect channel attribution over per-user
event journeys.

Reference parity note: the reference grammar admits the aggregate /
path-analysis families these extend through the generic function rule
(``sequenceMatch``/``windowFunnel`` cousins, the statistical aggregate
names — generated_ch_parser/ClickHouseParser.py:15571); removal-effect
attribution completes the attribution family (first-touch, linear,
time-decay, U-shaped) with the data-driven member.

Exactness discipline: integer cents/dollars at the scan; covariance
moments as exact DECIMAL(38,0)/HUGEINT cross-products (the n²·Sxy −
n·S·(S₁+S₂) + m_k·S² expansion — m_k the counted matched-pair mass —
keeps everything integral until ONE double division per lag); the
Markov fixed point runs as an INTEGER
recurrence (probabilities scaled 1e12, floor division) for a fixed 120
iterations, so both engines produce bit-identical absorption values by
construction; final statistics floor-quantize at 1e6 (q6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Row, SparkSession, Window

from ..operators.markov import absorption_probability
from .registry import q6, query, tables

# ---------------------------------------------------------------------------
# cochran_armitage_trend
# ---------------------------------------------------------------------------


@query(
    "cochran_armitage_trend",
    oracle="""
    WITH b AS (
        SELECT LEAST(CAST(FLOOR(o_totalprice / 110000.0) AS BIGINT), 4)
                   AS w,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS hi
        FROM orders
    ),
    g AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_i,
               CAST(SUM(hi) AS BIGINT) AS k_i
        FROM b GROUP BY w
    ),
    m AS (
        SELECT CAST(SUM(n_i) AS BIGINT) AS n,
               CAST(SUM(k_i) AS BIGINT) AS kk,
               CAST(SUM(w * n_i) AS BIGINT) AS swn,
               CAST(SUM(w * w * n_i) AS BIGINT) AS sw2n,
               CAST(SUM(w * k_i) AS BIGINT) AS swk
        FROM g
    ),
    s AS (
        SELECT g.w, g.n_i, g.k_i,
               FLOOR(CAST(g.k_i AS DOUBLE) / g.n_i * 1000000 + 0.5)
                   / 1000000 AS rate,
               (CAST(m.swk AS DOUBLE) - CAST(m.kk AS DOUBLE) * m.swn / m.n)
               / sqrt(CAST(m.kk AS DOUBLE) / m.n * (1.0 - CAST(m.kk AS DOUBLE) / m.n)
                      * (CAST(m.sw2n AS DOUBLE)
                         - CAST(m.swn AS DOUBLE) * m.swn / m.n))
                   AS z
        FROM g CROSS JOIN m
    )
    SELECT w AS bucket, n_i, k_i, rate,
           FLOOR(z * 1000000 + 0.5) / 1000000 AS z_trend
    FROM s ORDER BY bucket
    """,
)
def cochran_armitage_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage test for a monotone trend in the high-priority
    rate across five ORDERED price buckets (weights w = bucket index):
    z = Σw(kᵢ − nᵢK/n) / √[ K/n·(1−K/n)·(Σw²nᵢ − (Σwnᵢ)²/n) ] — the
    dose-response test that a plain chi-square independence test throws
    away ordering information on. Complements chi-square-family members
    (cramers_v, mutual_information_nmi) with the ordinal-trend member.
    All five moment sums are exact int64 off one grid agg; z evaluates
    once per row group.

    Scale shape: ONE map-side-combined scan-agg to 5 bucket rows;
    everything downstream constant-size."""
    o = tables(spark, sf_dir)["orders"]
    b = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / 110000.0).cast("long"),
            F.lit(4),
        ).alias("w"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("long")
        .alias("hi"),
    )
    g = b.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum("hi").cast("long").alias("k_i"),
    )
    m = g.agg(
        F.sum("n_i").alias("n"),
        F.sum("k_i").alias("kk"),
        F.sum(F.col("w") * F.col("n_i")).alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n_i")).alias("sw2n"),
        F.sum(F.col("w") * F.col("k_i")).alias("swk"),
    )
    p = F.col("kk").cast("double") / F.col("n")
    z = (
        F.col("swk").cast("double")
        - F.col("kk").cast("double") * F.col("swn") / F.col("n")
    ) / F.sqrt(
        p
        * (F.lit(1.0) - p)
        * (
            F.col("sw2n").cast("double")
            - F.col("swn").cast("double") * F.col("swn") / F.col("n")
        )
    )
    return (
        g.crossJoin(F.broadcast(m))
        .select(
            F.col("w").alias("bucket"),
            "n_i",
            "k_i",
            q6(F.col("k_i").cast("double") / F.col("n_i")).alias("rate"),
            q6(z).alias("z_trend"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# gumbel_block_maxima
# ---------------------------------------------------------------------------

_GAMMA = 0.5772156649015329  # Euler–Mascheroni
_EXCEED = 400.0  # exceedance level in value units


@query(
    "gumbel_block_maxima",
    oracle=f"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS mx
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(mx) AS BIGINT) AS s1,
               CAST(SUM(mx * mx) AS BIGINT) AS s2
        FROM d
    )
    SELECT n AS n_blocks,
           FLOOR(CAST(s1 AS DOUBLE) / n / 100.0 * 1000000 + 0.5)
               / 1000000 AS mean_max,
           FLOOR(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                      / (n - 1)) / 100.0
                 * sqrt(6.0) / pi() * 1000000 + 0.5) / 1000000 AS beta,
           FLOOR((CAST(s1 AS DOUBLE) / n / 100.0
                  - {_GAMMA!r} * sqrt((CAST(s2 AS DOUBLE)
                                       - CAST(s1 AS DOUBLE) * s1 / n)
                                      / (n - 1)) / 100.0
                    * sqrt(6.0) / pi()) * 1000000 + 0.5) / 1000000 AS mu,
           FLOOR((1.0 - exp(-exp(-(({_EXCEED!r})
                  - (CAST(s1 AS DOUBLE) / n / 100.0
                     - {_GAMMA!r} * sqrt((CAST(s2 AS DOUBLE)
                                          - CAST(s1 AS DOUBLE) * s1 / n)
                                         / (n - 1)) / 100.0
                       * sqrt(6.0) / pi()))
                 / (sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                         / (n - 1)) / 100.0 * sqrt(6.0) / pi()))))
                 * 1000000 + 0.5) / 1000000 AS p_exceed
    FROM m
    """,
)
def gumbel_block_maxima_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit over daily block maxima of the event
    value stream (method of moments: β̂ = s·√6/π, μ̂ = x̄ − γβ̂) and the
    implied exceedance probability P(daily max > 400) = 1 − exp(−exp(
    −(q−μ̂)/β̂)) — the block-maxima complement to hill_tail_index's
    peaks-over-threshold view of the same tail question ("how bad is a
    1-in-N day"). Day maxima are integer cents (max of rounded values —
    order-free); the two moment sums are exact int64; β̂/μ̂/P evaluate
    once on one row via identical IEEE expressions in both engines.

    Scale shape: one map-side-combined max-per-day agg (the data-sized
    pass), then a ≤|days|-row moment agg to a single row."""
    ev = tables(spark, sf_dir)["events"]
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.max(F.round(F.col("value") * 100, 0).cast("long")).alias("mx")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").cast("long").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n / 100.0
    sd = (
        F.sqrt(
            (F.col("s2").cast("double")
             - F.col("s1").cast("double") * F.col("s1") / n)
            / (n - F.lit(1.0))
        )
        / 100.0
    )
    beta = sd * F.sqrt(F.lit(6.0)) / F.lit(3.141592653589793)
    mu = mean - F.lit(_GAMMA) * beta
    p_exceed = F.lit(1.0) - F.exp(
        -F.exp(-((F.lit(_EXCEED) - mu) / beta))
    )
    return m.select(
        F.col("n").alias("n_blocks"),
        q6(mean).alias("mean_max"),
        q6(beta).alias("beta"),
        q6(mu).alias("mu"),
        q6(p_exceed).alias("p_exceed"),
    )


# ---------------------------------------------------------------------------
# pacf_yule_walker
# ---------------------------------------------------------------------------


def _acf_sql(k: int) -> str:
    """Exact-integer ACF numerator at lag k, scaled by n² (see module
    docstring): n²·Sxy_k − n·S·(S₁+S₂) + m_k·S², as HUGEINT — m_k is
    the COUNTED number of matched (t, t+k) pairs, not the calendar
    shortcut n−k, which overstates the mean correction whenever the
    day series has gaps."""
    return (
        f"(CAST(m.n AS HUGEINT) * m.n * l.sxy{k}"
        f" - CAST(m.n AS HUGEINT) * m.s * (l.sh{k} + l.st{k})"
        f" + CAST(l.m{k} AS HUGEINT) * m.s * m.s)"
    )


@query(
    "pacf_yule_walker",
    oracle=f"""
    WITH d AS (
        SELECT datediff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS t,
               CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS x
        FROM orders GROUP BY 1
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        FROM d
    ),
    l AS (
        SELECT
          CAST(SUM(CASE WHEN b1.x IS NOT NULL
                   THEN CAST(a.x AS HUGEINT) * b1.x END) AS HUGEINT)
              AS sxy1,
          CAST(SUM(CASE WHEN b1.x IS NOT NULL THEN a.x END) AS BIGINT)
              AS sh1,
          CAST(SUM(b1.x) AS BIGINT) AS st1,
          CAST(SUM(CASE WHEN b1.x IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS m1,
          CAST(SUM(CASE WHEN b2.x IS NOT NULL
                   THEN CAST(a.x AS HUGEINT) * b2.x END) AS HUGEINT)
              AS sxy2,
          CAST(SUM(CASE WHEN b2.x IS NOT NULL THEN a.x END) AS BIGINT)
              AS sh2,
          CAST(SUM(b2.x) AS BIGINT) AS st2,
          CAST(SUM(CASE WHEN b2.x IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS m2,
          CAST(SUM(CASE WHEN b3.x IS NOT NULL
                   THEN CAST(a.x AS HUGEINT) * b3.x END) AS HUGEINT)
              AS sxy3,
          CAST(SUM(CASE WHEN b3.x IS NOT NULL THEN a.x END) AS BIGINT)
              AS sh3,
          CAST(SUM(b3.x) AS BIGINT) AS st3,
          CAST(SUM(CASE WHEN b3.x IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS m3
        FROM d a
        LEFT JOIN d b1 ON b1.t = a.t + 1
        LEFT JOIN d b2 ON b2.t = a.t + 2
        LEFT JOIN d b3 ON b3.t = a.t + 3
    ),
    den AS (
        SELECT CAST(CAST(m.n AS HUGEINT) * m.n * m.sxx
                    - CAST(m.n AS HUGEINT) * m.s * m.s AS DOUBLE) AS v,
               {_acf_sql(1)} AS c1, {_acf_sql(2)} AS c2,
               {_acf_sql(3)} AS c3
        FROM m CROSS JOIN l
    ),
    r AS (
        SELECT CAST(c1 AS DOUBLE) / v AS r1,
               CAST(c2 AS DOUBLE) / v AS r2,
               CAST(c3 AS DOUBLE) / v AS r3
        FROM den
    )
    SELECT
      FLOOR(r1 * 1000000 + 0.5) / 1000000 AS phi_1,
      FLOOR((r2 - r1 * r1) / (1 - r1 * r1) * 1000000 + 0.5) / 1000000
          AS phi_2,
      FLOOR((r3 - (r1 - ((r2 - r1 * r1) / (1 - r1 * r1)) * r1) * r2
             - ((r2 - r1 * r1) / (1 - r1 * r1)) * r1)
            / ((1 - r1 * r1)
               * (1 - ((r2 - r1 * r1) / (1 - r1 * r1))
                      * ((r2 - r1 * r1) / (1 - r1 * r1))))
            * 1000000 + 0.5) / 1000000 AS phi_3
    FROM r
    """,
)
def pacf_yule_walker_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelations of the daily revenue series at lags 1–3
    via the Durbin–Levinson recursion on Yule–Walker autocorrelations:
    φ₁₁ = r₁, φ₂₂ = (r₂−r₁²)/(1−r₁²), φ₃₃ = (r₃ − φ₂₁r₂ − φ₂₂r₁)/v₂
    with φ₂₁ = r₁(1−φ₂₂)·… — the lag-k dependence AFTER removing
    shorter-lag structure, which raw ACF (dominant_period_autocorr)
    conflates. Each r_k is computed from the all-integer expansion
    n²·Σx_tx_{t+k} − n·S·(S_head+S_tail) + m_k·S² (m_k = counted
    matched pairs, robust to calendar gaps) over DOLLAR-
    quantized day sums (HUGEINT / DECIMAL(38,0): products stay ≤ ~1e30
    at sf100), so the three doubles r₁,r₂,r₃ are each ONE exact-integer
    ratio and the recursion is a closed-form expression both engines
    evaluate identically.

    Scale shape: one hash agg to the ~2,400-day series, then ONE
    window pass over that constant-size frame (r10 verdict #1: the
    original three broadcast lag self-joins + scalar cross cost ~6 s of
    fixed overhead for 3 numbers). Because day indices t are strictly
    increasing integers, the row at t+k — if it exists — sits at most k
    rows ahead, so lead(t,j)/lead(x,j) for j=1..3 recover the exact
    calendar-gap-robust lag-k pair (CASE on lead(t,j) == t+k), and all
    twelve lag moments plus n/S/Σx² come out of a single aggregate:
    zero joins, zero checkpoints."""
    o = tables(spark, sf_dir)["orders"]
    d = o.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01")
        ).alias("t")
    ).agg(
        F.sum(F.round(F.col("o_totalprice"), 0).cast("long"))
        .cast("long")
        .alias("x")
    )
    # Single-partition window is deliberate: the frame is ~2,400 rows
    # (one per calendar day) regardless of sf.
    w = Window.orderBy("t")
    lead_cols = []
    for jx in (1, 2, 3):
        lead_cols += [
            F.lead("t", jx).over(w).alias(f"lt{jx}"),
            F.lead("x", jx).over(w).alias(f"lx{jx}"),
        ]
    led = d.select("t", "x", *lead_cols)
    for k in (1, 2, 3):
        xk = F.lit(None).cast("long")
        for jx in range(k, 0, -1):
            xk = F.when(
                F.col(f"lt{jx}") == F.col("t") + k, F.col(f"lx{jx}")
            ).otherwise(xk)
        led = led.withColumn(f"x{k}", xk)
    agg_cols = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    ]
    for k in (1, 2, 3):
        agg_cols += [
            F.sum(
                F.when(
                    F.col(f"x{k}").isNotNull(),
                    F.col("x").cast("decimal(38,0)") * F.col(f"x{k}"),
                )
            ).alias(f"sxy{k}"),
            F.sum(F.when(F.col(f"x{k}").isNotNull(), F.col("x")))
            .cast("long")
            .alias(f"sh{k}"),
            F.sum(F.col(f"x{k}")).cast("long").alias(f"st{k}"),
            F.sum(F.col(f"x{k}").isNotNull().cast("long"))
            .cast("long")
            .alias(f"m{k}"),
        ]
    j = led.agg(*agg_cols)
    nn = F.col("n").cast("decimal(38,0)")
    ss = F.col("s").cast("decimal(38,0)")
    den = (nn * nn * F.col("sxx") - nn * ss * ss).cast("double")

    def _r(k: int):
        num = (
            nn * nn * F.col(f"sxy{k}")
            - nn * ss * (F.col(f"sh{k}") + F.col(f"st{k}")).cast(
                "decimal(38,0)"
            )
            + F.col(f"m{k}").cast("decimal(38,0)") * ss * ss
        ).cast("double")
        return num / den

    r1, r2, r3 = _r(1), _r(2), _r(3)
    phi22 = (r2 - r1 * r1) / (F.lit(1.0) - r1 * r1)
    phi21 = r1 - phi22 * r1
    v2 = (F.lit(1.0) - r1 * r1) * (F.lit(1.0) - phi22 * phi22)
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / v2
    return j.select(
        q6(r1).alias("phi_1"),
        q6(phi22).alias("phi_2"),
        q6(phi33).alias("phi_3"),
    )


# ---------------------------------------------------------------------------
# tukey_hsd_pairs
# ---------------------------------------------------------------------------


@query(
    "tukey_hsd_pairs",
    oracle="""
    WITH b AS (
        SELECT c_mktsegment AS seg,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS y
        FROM customer
    ),
    g AS (
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y // 10000000) AS BIGINT) AS s2_hi,
               CAST(SUM(y * y % 10000000) AS BIGINT) AS s2_lo
        FROM b GROUP BY seg
    ),
    t AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(CAST(CAST(s2_hi AS HUGEINT) * 10000000 + s2_lo
                        AS DOUBLE)
                   - CAST(sy AS DOUBLE) * sy / n_g) AS ssw
        FROM g
    )
    SELECT a.seg AS seg_a, c.seg AS seg_b,
           FLOOR((CAST(a.sy AS DOUBLE) / a.n_g
                  - CAST(c.sy AS DOUBLE) / c.n_g) / 100.0
                 * 1000000 + 0.5) / 1000000 AS mean_diff,
           FLOOR((CAST(a.sy AS DOUBLE) / a.n_g
                  - CAST(c.sy AS DOUBLE) / c.n_g)
                 / sqrt(t.ssw / (t.n - t.k) / 2.0
                        * (1.0 / a.n_g + 1.0 / c.n_g))
                 * 1000000 + 0.5) / 1000000 AS q_stat
    FROM g a JOIN g c ON a.seg < c.seg CROSS JOIN t
    ORDER BY seg_a, seg_b
    """,
)
def tukey_hsd_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-HSD pairwise studentized contrasts after the one-way
    segment ANOVA (anova_ftest's post-hoc step): for each of the 10
    segment pairs, q = (x̄ₐ − x̄_b)/√(MSW/2·(1/nₐ + 1/n_b)) with MSW
    the pooled within-group mean square — the statistic compared against
    the studentized-range distribution to control family-wise error
    where per-pair t-tests inflate it. Moments exact int64 (y² hi/lo
    split, divisor 1e7); SSW folds over the 5 group rows inside a
    single aggregate (terms are double but the 5-row fold is pinned by
    the oracle evaluating the identical plan shape); q evaluates once
    per pair row.

    Scale shape: one moment agg to 5 rows, a 5×5 broadcast self-join —
    nothing downstream grows with rows."""
    c = tables(spark, sf_dir)["customer"]
    b = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("y"),
    )
    g = b.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("y * y DIV 10000000")).alias("s2_hi"),
        F.sum(F.expr("y * y % 10000000")).alias("s2_lo"),
    ).localCheckpoint(eager=False)
    sy2 = (
        F.col("s2_hi").cast("decimal(38,0)") * F.lit(10000000)
        + F.col("s2_lo")
    ).cast("double")
    t = g.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            sy2 - F.col("sy").cast("double") * F.col("sy") / F.col("n_g")
        ).alias("ssw"),
    )
    a, cc = g.alias("a"), g.alias("c")
    mean_diff = (
        F.col("a.sy").cast("double") / F.col("a.n_g")
        - F.col("c.sy").cast("double") / F.col("c.n_g")
    )
    qstat = mean_diff / F.sqrt(
        F.col("ssw")
        / (F.col("n") - F.col("k"))
        / F.lit(2.0)
        * (1.0 / F.col("a.n_g") + 1.0 / F.col("c.n_g"))
    )
    return (
        a.join(F.broadcast(cc), F.col("a.seg") < F.col("c.seg"))
        .crossJoin(F.broadcast(t))
        .select(
            F.col("a.seg").alias("seg_a"),
            F.col("c.seg").alias("seg_b"),
            q6(mean_diff / F.lit(100.0)).alias("mean_diff"),
            q6(qstat).alias("q_stat"),
        )
        .orderBy("seg_a", "seg_b")
    )


# ---------------------------------------------------------------------------
# markov_removal_attribution
# ---------------------------------------------------------------------------

_SCALE = 10**12
_ITERS = 120
_CHANNELS = ["click", "error", "signup", "view"]


def _markov_oracle() -> str:
    """Generate the DuckDB twin of the integer fixed-point iteration:
    one transition table per scenario (base + one per removed channel,
    transitions INTO the removed channel redirected to the NULL
    absorber), then {_ITERS} chained aggregation CTEs computing
    v_{{k+1}}(s) = (conv(s)·SCALE + Σ_t n(s,t)·v_k(t)) // tot(s) in
    HUGEINT — bit-identical to the Python recurrence by construction."""
    scen_arms = ", ".join(f"('{c}')" for c in ["__base__"] + _CHANNELS)
    head = f"""
    WITH pts AS (
        SELECT user_id, MIN(ts) AS pt FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    j AS (
        SELECT e.user_id, e.ts, e.event_id, e.event_type,
               (p.pt IS NOT NULL) AS conv
        FROM events e LEFT JOIN pts p ON e.user_id = p.user_id
        WHERE e.event_type <> 'purchase'
          AND (p.pt IS NULL OR e.ts < p.pt)
    ),
    seq AS (
        SELECT user_id, event_type, conv,
               COALESCE(LAG(event_type) OVER w, 'START') AS prev,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC)
                   AS rn_last
        FROM j
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    users AS (
        SELECT s.user_id, (p.pt IS NOT NULL) AS conv,
               COUNT(j.user_id) AS n_ev
        FROM (SELECT DISTINCT user_id FROM events) s
        LEFT JOIN pts p ON s.user_id = p.user_id
        LEFT JOIN j ON j.user_id = s.user_id
        GROUP BY s.user_id, p.pt
    ),
    trans AS (
        SELECT prev AS src, event_type AS dst FROM seq
        UNION ALL
        SELECT event_type AS src,
               CASE WHEN conv THEN 'CONV' ELSE 'LOSS' END AS dst
        FROM seq WHERE rn_last = 1
        UNION ALL
        SELECT 'START' AS src,
               CASE WHEN conv THEN 'CONV' ELSE 'LOSS' END AS dst
        FROM users WHERE n_ev = 0
    ),
    tc AS MATERIALIZED (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
        FROM trans GROUP BY src, dst
    ),
    scen(rm) AS (VALUES {scen_arms}),
    st AS (
        SELECT scen.rm, tc.src,
               CASE WHEN tc.dst = scen.rm THEN 'LOSS' ELSE tc.dst END
                   AS dst,
               tc.c
        FROM tc CROSS JOIN scen
        WHERE tc.src <> scen.rm
    ),
    sg AS MATERIALIZED (
        SELECT rm, src, dst, CAST(SUM(c) AS BIGINT) AS c
        FROM st GROUP BY rm, src, dst
    ),
    tot AS MATERIALIZED (
        SELECT rm, src, CAST(SUM(c) AS BIGINT) AS t
        FROM sg GROUP BY rm, src
    ),
    v0 AS MATERIALIZED (
        SELECT rm, src AS s, CAST(0 AS HUGEINT) AS v FROM tot
    )"""
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(f"""
    v{i} AS MATERIALIZED (
        SELECT tot.rm, tot.src AS s,
               (COALESCE(cv.c, 0)::HUGEINT * {_SCALE}
                + COALESCE(tv.sv, 0)::HUGEINT) // tot.t AS v
        FROM tot
        LEFT JOIN (SELECT rm, src, c FROM sg WHERE dst = 'CONV') cv
          ON cv.rm = tot.rm AND cv.src = tot.src
        LEFT JOIN (
            SELECT sg.rm, sg.src,
                   SUM(sg.c::HUGEINT * p.v) AS sv
            FROM sg JOIN v{i - 1} p
              ON p.rm = sg.rm AND p.s = sg.dst
            GROUP BY sg.rm, sg.src
        ) tv ON tv.rm = tot.rm AND tv.src = tot.src
    )""")
    chan_list = ", ".join(f"'{c}'" for c in _CHANNELS)
    tail = f"""
    , fin AS (
        SELECT rm, v FROM v{_ITERS} WHERE s = 'START'
    ),
    base AS (SELECT v AS v0 FROM fin WHERE rm = '__base__'),
    eff AS (
        SELECT fin.rm AS channel,
               CAST(base.v0 AS DOUBLE) / {_SCALE} AS base_cvr,
               CAST(fin.v AS DOUBLE) / {_SCALE} AS removed_cvr,
               1.0 - CAST(fin.v AS DOUBLE) / base.v0 AS re
        FROM fin CROSS JOIN base WHERE fin.rm IN ({chan_list})
    ),
    s AS (SELECT SUM(re) OVER () AS tot_re, * FROM eff)
    SELECT channel,
           FLOOR(base_cvr * 1000000 + 0.5) / 1000000 AS base_cvr,
           FLOOR(removed_cvr * 1000000 + 0.5) / 1000000 AS removed_cvr,
           FLOOR(re * 1000000 + 0.5) / 1000000 AS removal_effect,
           FLOOR(re / tot_re * 1000000 + 0.5) / 1000000
               AS attribution_share
    FROM s ORDER BY channel
    """
    return head + "," + ",".join(steps) + tail


@query("markov_removal_attribution", oracle=_markov_oracle())
def markov_removal_attribution_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov removal-effect channel attribution: per-user journeys
    (events before the first purchase, START-prefixed, CONV/LOSS
    absorbed) build a first-order transition-count matrix; the base
    conversion probability is the absorption probability into CONV from
    START, and each channel's removal effect re-runs the absorption
    with transitions INTO that channel redirected to LOSS — the
    data-driven attribution that first/linear/time-decay/U-shaped
    heuristics approximate. Attribution share = effect / Σ effects.

    Engine-agreement design: absorption runs as an INTEGER fixed-point
    recurrence v_{k+1}(s) = (conv(s)·1e12 + Σ_t n(s,t)·v_k(t)) // tot(s)
    for exactly 120 iterations (geometric convergence leaves the
    iterate within ~1e-6 of the true fixed point on these chains) —
    Python big-ints here, a generated 120-CTE HUGEINT ladder in the
    DuckDB twin, so both engines produce bit-identical values by
    construction rather than by float luck.

    Scale shape: the data-sized work (journey windows, transition
    counts) is two shuffles over events; the recurrence then runs
    driver-side on the collected ≤(6·7)-row count matrix — the same
    constant-size post-processing class as the size-gated dict-strategy
    builders (a 120-step loop over a 6-state chain is not a cluster
    job). Output: 4 channel rows."""
    ev = tables(spark, sf_dir)["events"]
    pts = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    j = (
        ev.filter(F.col("event_type") != "purchase")
        .join(F.broadcast(pts), "user_id", "left")
        .filter(F.col("pt").isNull() | (F.col("ts") < F.col("pt")))
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.col("pt").isNotNull().alias("conv"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wl = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    seq = j.select(
        "event_type",
        "conv",
        F.coalesce(F.lag("event_type").over(w), F.lit("START")).alias(
            "prev"
        ),
        F.row_number().over(wl).alias("rn_last"),
    )
    all_users = ev.select("user_id").distinct()
    users = (
        all_users.join(F.broadcast(pts), "user_id", "left")
        .join(
            j.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev")),
            "user_id",
            "left",
        )
        .select(
            F.col("pt").isNotNull().alias("conv"),
            F.coalesce(F.col("n_ev"), F.lit(0)).alias("n_ev"),
        )
    )
    trans = (
        seq.select(F.col("prev").alias("src"),
                   F.col("event_type").alias("dst"))
        .unionAll(
            seq.filter(F.col("rn_last") == 1).select(
                F.col("event_type").alias("src"),
                F.when(F.col("conv"), F.lit("CONV"))
                .otherwise(F.lit("LOSS"))
                .alias("dst"),
            )
        )
        .unionAll(
            users.filter(F.col("n_ev") == 0).select(
                F.lit("START").alias("src"),
                F.when(F.col("conv"), F.lit("CONV"))
                .otherwise(F.lit("LOSS"))
                .alias("dst"),
            )
        )
    )
    tc = {
        (r["src"], r["dst"]): r["c"]
        for r in trans.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()  # constant-size: ≤ (|channels|+1) × (|channels|+2)
    }

    def absorb(removed: str | None) -> int:
        return absorption_probability(tc, removed, _SCALE, _ITERS)

    v0 = absorb(None)
    rows = []
    effs = {}
    for ch in _CHANNELS:
        vr = absorb(ch)
        # v0 == 0 (a corpus with no conversions at all) must yield NULL,
        # not ZeroDivisionError — the DuckDB twin's double x/0.0 renders
        # NULL, and the two engines must fail identically
        effs[ch] = (1.0 - vr / v0) if v0 else None
        rows.append((ch, v0, vr))
    tot_re = sum(e for e in effs.values() if e is not None)

    def _q(x: float | None) -> float | None:
        import math

        if x is None:
            return None
        return math.floor(x * 1_000_000 + 0.5) / 1_000_000

    out = [
        Row(
            channel=ch,
            base_cvr=_q(b / _SCALE),
            removed_cvr=_q(vr / _SCALE),
            removal_effect=_q(effs[ch]),
            attribution_share=_q(
                effs[ch] / tot_re
                if effs[ch] is not None and tot_re
                else None
            ),
        )
        for ch, b, vr in rows
    ]
    schema = (
        "channel string, base_cvr double, removed_cvr double, "
        "removal_effect double, attribution_share double"
    )
    return spark.createDataFrame(out, schema).orderBy("channel")
