"""Round-10 query wave 2: oracled engine-internals and sampling-theory
operators — a from-scratch HyperLogLog whose every register is replayed
bit-for-bit by the DuckDB twin (unlike the builtin approx_count_distinct,
whose sketch is engine-private and only rows-only checkable), split
conformal prediction-interval calibration, the Hill tail-index estimator
of the document-length distribution, and Kish effective sample size.

Reference parity note: the reference grammar admits uniq/uniqHLL12 as
plain aggregate names (generic function rule); re-deriving HLL with an
engine-independent hash makes the approximation itself TESTABLE against
SQL rather than trusted.

Exactness discipline: the HLL register sums are dyadic rationals with a
common denominator 2^27 over ≤64 terms — exactly representable in a
double REGARDLESS of summation order — and the Wang 32-bit mix is
written as identical shift/mask arithmetic on both engines; Hill's
Σ ln(x_i/x_k) is quantized to nano-integers per row before summing so
the aggregate is order-free; conformal works on centi-quantized values
so the train means are exact integer ratios.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..operators.dist_rank import dist_cumsum
from .registry import q6, query, tables

_M32 = 0xFFFFFFFF

#: Wang 32-bit integer hash as (python-level) step list; each step is
#: (kind, amount): the SAME sequence renders to a Spark Column chain and
#: to a DuckDB CTE ladder, so the two engines agree bit-for-bit.
_WANG32_STEPS = (
    ("not_add_shl", 15),   # h = (~h + (h << 15)) & M
    ("xor_shr", 12),       # h ^= h >> 12
    ("add_shl", 2),        # h = (h + (h << 2)) & M
    ("xor_shr", 4),        # h ^= h >> 4
    ("mul", 2057),         # h = (h * 2057) & M   (< 2^43, no overflow)
    ("xor_shr", 16),       # h ^= h >> 16
)


def wang32(col: Column) -> Column:
    """Wang's 32-bit mix over ``col & 0xFFFFFFFF`` as a LINEAR Catalyst
    chain (each step references the accumulator a bounded number of
    times — see the composition-trap note in operators/similarity)."""
    h = col.cast("long").bitwiseAND(F.lit(_M32))
    for kind, amt in _WANG32_STEPS:
        if kind == "not_add_shl":
            h = (F.lit(_M32) - h + F.shiftleft(h, amt)).bitwiseAND(
                F.lit(_M32)
            )
        elif kind == "xor_shr":
            h = h.bitwiseXOR(F.shiftrightunsigned(h, amt))
        elif kind == "add_shl":
            h = (h + F.shiftleft(h, amt)).bitwiseAND(F.lit(_M32))
        else:  # mul
            h = (h * amt).bitwiseAND(F.lit(_M32))
    return h


def _wang32_sql(expr: str) -> str:
    """The identical mix as a nested DuckDB SQL expression."""
    h = f"(({expr}) & {_M32})"
    for kind, amt in _WANG32_STEPS:
        if kind == "not_add_shl":
            h = f"((({_M32} - {h}) + ({h} << {amt})) & {_M32})"
        elif kind == "xor_shr":
            h = f"xor({h}, ({h} >> {amt}))"
        elif kind == "add_shl":
            h = f"(({h} + ({h} << {amt})) & {_M32})"
        else:
            h = f"(({h} * {amt}) & {_M32})"
    return h


# ---------------------------------------------------------------------------
# hll_distinct_audit
# ---------------------------------------------------------------------------

_HLL_P = 6            # 64 registers
_HLL_M = 1 << _HLL_P
_HLL_WBITS = 32 - _HLL_P  # 26-bit suffix feeding rho


@query(
    "hll_distinct_audit",
    oracle=f"""
    WITH h AS (
        SELECT l_returnflag AS event_type,
               {_wang32_sql("l_orderkey")} AS hv
        FROM lineitem
    ),
    reg AS (
        SELECT event_type,
               hv % {_HLL_M} AS bucket,
               MAX(CASE WHEN (hv // {_HLL_M}) = 0 THEN {_HLL_WBITS + 1}
                        ELSE {_HLL_WBITS}
                             - length(bin(hv // {_HLL_M})) + 1 END)
                   AS rho
        FROM h GROUP BY 1, 2
    ),
    agg AS (
        SELECT event_type,
               SUM(1.0 / (1::BIGINT << rho)) AS s_present,
               CAST(COUNT(*) AS BIGINT) AS n_present
        FROM reg GROUP BY 1
    ),
    ex AS (
        SELECT l_returnflag AS event_type, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
                   AS exact_distinct
        FROM lineitem GROUP BY 1
    ),
    est AS (
        SELECT agg.event_type, exact_distinct, n_present,
               (0.7213 / (1.0 + 1.079 / {_HLL_M}))
                   * {_HLL_M} * {_HLL_M}
                   / (s_present + ({_HLL_M} - n_present)) AS e_raw
        FROM agg JOIN ex ON agg.event_type = ex.event_type
    ),
    fin AS (
        SELECT event_type, exact_distinct, n_present,
               CASE WHEN e_raw <= 2.5 * {_HLL_M}
                         AND n_present < {_HLL_M}
                    THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                       / ({_HLL_M} - n_present))
                    ELSE e_raw END AS e
        FROM est
    )
    SELECT event_type AS grp, exact_distinct,
           n_present AS registers_hit,
           FLOOR(e * 1000000 + 0.5) / 1000000 AS hll_estimate,
           FLOOR((e - exact_distinct) / exact_distinct * 1000000 + 0.5)
               / 1000000 AS rel_error
    FROM fin ORDER BY grp
    """,
)
def hll_distinct_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog from scratch, ORACLED: 64 registers over a Wang
    32-bit mix of l_orderkey, per returnflag (~11k distinct orders per
    flag at sf0.01, ~11M at sf10 — the asymptotic regime) — register
    maxima, the
    harmonic estimate with alpha_64 = 0.7213/(1+1.079/64), and the
    small-range linear-counting correction, next to the EXACT distinct
    count and the relative error. The whole sketch replays in SQL: the
    mix is identical shift/mask arithmetic, rho comes from bin-string
    length (no float log2, which mis-floors at exact powers of two),
    and Σ 2^-rho over ≤64 registers is a dyadic rational with common
    denominator 2^27 — exact in a double in ANY summation order, so the
    oracle cannot be broken by aggregation order.

    Scale shape: one scan → (type, bucket) hash agg (≤ 64·|types| rows)
    → per-type fold. The exact-distinct companion column is the only
    data-sized distinct — at 100 TB you would drop it and keep the
    sketch; here it IS the audit."""
    li = tables(spark, sf_dir)["lineitem"]
    hv = wang32(F.col("l_orderkey"))
    w = F.shiftrightunsigned(F.col("hv"), _HLL_P)
    # rho = leading zeros of the 26-bit suffix + 1 = WBITS - bitlen + 1
    rho = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS) - F.length(F.bin(w)) + 1
    )
    reg = (
        li.select(F.col("l_returnflag").alias("grp"), hv.alias("hv"))
        .select(
            "grp",
            F.col("hv").bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    agg = reg.groupBy("grp").agg(
        # 2^-rho via an integer shift (PySpark's shiftleft builder takes
        # only literal bit counts, so this one goes through F.expr) —
        # exact dyadic, never a pow() whose last ulp could differ
        F.sum(F.expr("1.0 / shiftleft(1L, cast(rho AS int))")).alias(
            "s_present"
        ),
        F.count(F.lit(1)).cast("long").alias("n_present"),
    )
    ex = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count_distinct("l_orderkey").cast("long").alias("exact_distinct")
    )
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    e_raw = (
        F.lit(alpha)
        * _HLL_M
        * _HLL_M
        / (F.col("s_present") + (_HLL_M - F.col("n_present")))
    )
    e = F.when(
        (e_raw <= 2.5 * _HLL_M) & (F.col("n_present") < _HLL_M),
        _HLL_M
        * F.log(
            F.lit(float(_HLL_M)) / (_HLL_M - F.col("n_present"))
        ),
    ).otherwise(e_raw)
    return (
        agg.join(ex, "grp")
        .select(
            "grp",
            "exact_distinct",
            F.col("n_present").alias("registers_hit"),
            q6(e).alias("hll_estimate"),
            q6(
                (e - F.col("exact_distinct")) / F.col("exact_distinct")
            ).alias("rel_error"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# conformal_interval_calibration
# ---------------------------------------------------------------------------


@query(
    "conformal_interval_calibration",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc,
               day(ts) AS d
        FROM events
    ),
    tr AS (
        SELECT event_type,
               CAST(SUM(vc) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM e WHERE d <= 15 GROUP BY 1
    ),
    cal AS (
        SELECT e.event_type,
               abs(vc / 100.0 - s / (100.0 * n)) AS r
        FROM e JOIN tr ON e.event_type = tr.event_type
        WHERE d BETWEEN 16 AND 23
    ),
    qh AS (
        SELECT event_type, r AS q_hat, n_cal
        FROM (SELECT event_type, r,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY r) AS rn,
                     CAST(COUNT(*) OVER (PARTITION BY event_type)
                          AS BIGINT) AS n_cal
              FROM cal)
        WHERE rn = CAST(CEIL(0.9 * (n_cal + 1)) AS BIGINT)
    ),
    te AS (
        SELECT e.event_type,
               CAST(SUM(CASE WHEN abs(vc / 100.0 - s / (100.0 * n))
                                  <= q_hat THEN 1 ELSE 0 END) AS BIGINT)
                   AS covered,
               CAST(COUNT(*) AS BIGINT) AS n_test
        FROM e JOIN tr ON e.event_type = tr.event_type
               JOIN qh ON e.event_type = qh.event_type
        WHERE d >= 24 GROUP BY 1
    )
    SELECT qh.event_type AS event_type,
           FLOOR(tr.s / (100.0 * tr.n) * 1000000 + 0.5) / 1000000
               AS predicted,
           FLOOR(qh.q_hat * 1000000 + 0.5) / 1000000 AS q_hat,
           qh.n_cal, te.n_test,
           FLOOR(CAST(covered AS DOUBLE) / n_test * 1000000 + 0.5)
               / 1000000 AS coverage
    FROM qh JOIN tr ON qh.event_type = tr.event_type
            JOIN te ON qh.event_type = te.event_type
    ORDER BY qh.event_type
    """,
)
def conformal_interval_calibration_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split conformal prediction intervals per event_type: train (days
    ≤ 15) fits the trivial per-type mean predictor, calibration (days
    16–23) takes q_hat = the ⌈0.9·(n+1)⌉-th smallest absolute residual
    — the distribution-free 90% guarantee — and the test window (days
    ≥ 24) measures realized coverage of predicted ± q_hat. Values are
    centi-quantized so the train means are exact integer ratios; the
    calibration order statistic uses the dist_cumsum partition-
    histogram rank (the oracle's per-type ROW_NUMBER would be a
    single-task sort per type at scale).

    Scale shape: two scans (train+cal aggregate, test coverage), the
    rank machinery over the residual histogram, broadcast of the
    per-type scalars."""
    ev = tables(spark, sf_dir)["events"].select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("vc"),
        F.dayofmonth("ts").alias("d"),
    )
    tr = (
        ev.filter(F.col("d") <= 15)
        .groupBy("event_type")
        .agg(
            F.sum("vc").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    resid = F.abs(
        F.col("vc") / 100.0 - F.col("s") / (100.0 * F.col("n"))
    )
    cal = (
        ev.filter((F.col("d") >= 16) & (F.col("d") <= 23))
        .join(F.broadcast(tr), "event_type")
        .select("event_type", resid.alias("r"))
    )
    hist = cal.groupBy("event_type", "r").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ranked = dist_cumsum(hist, "r", ["cnt"], keys=["event_type"])
    ncal = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_cal")
    )
    k = F.ceil(0.9 * (F.col("n_cal") + 1)).cast("long")
    qh = (
        ranked.join(F.broadcast(ncal), "event_type")
        .filter(F.col("cum_cnt") >= k)
        .groupBy("event_type", "n_cal")
        .agg(F.min("r").alias("q_hat"))
    )
    te = (
        ev.filter(F.col("d") >= 24)
        .join(F.broadcast(tr), "event_type")
        .join(F.broadcast(qh), "event_type")
        .groupBy("event_type", "n_cal", "q_hat", "s", "n")
        .agg(
            F.sum((resid <= F.col("q_hat")).cast("int"))
            .cast("long")
            .alias("covered"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
        )
    )
    return te.select(
        "event_type",
        q6(F.col("s") / (100.0 * F.col("n"))).alias("predicted"),
        q6(F.col("q_hat")).alias("q_hat"),
        "n_cal",
        "n_test",
        q6(F.col("covered").cast("double") / F.col("n_test")).alias(
            "coverage"
        ),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# hill_tail_index
# ---------------------------------------------------------------------------

_HILL_K = 200


@query(
    "hill_tail_index",
    oracle=f"""
    WITH top AS (
        SELECT n_chars
        FROM documents
        ORDER BY n_chars DESC, doc_id
        LIMIT {_HILL_K + 1}
    ),
    r AS (
        SELECT n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars DESC) AS rn
        FROM top
    ),
    xk AS (SELECT n_chars AS x_k FROM r WHERE rn = {_HILL_K + 1}),
    terms AS (
        SELECT CAST(SUM(CAST(FLOOR(ln(CAST(n_chars AS DOUBLE) / x_k)
                                   * 1000000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS s_nano
        FROM r, xk WHERE rn <= {_HILL_K}
    )
    SELECT {_HILL_K} AS k,
           (SELECT x_k FROM xk) AS x_k,
           FLOOR({_HILL_K} / (s_nano / 1e9) * 1000000 + 0.5) / 1000000
               AS alpha_hill,
           FLOOR({_HILL_K} / (s_nano / 1e9) / sqrt({_HILL_K})
                 * 1000000 + 0.5) / 1000000 AS alpha_se
    FROM terms
    """,
)
def hill_tail_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the document-length tail index: over the top
    k = 200 order statistics of n_chars, α̂ = k / Σ ln(x_(i)/x_(k+1)) —
    the heavy-tail diagnostic that says whether corpus length follows a
    power law (α ≈ 1–2 ⇒ pareto-like, big docs dominate token mass).
    Per-row ln ratios are quantized to nano-integers BEFORE the sum so
    the 200-term aggregate is order-free on both engines; boundary ties
    at rank k+1 cannot change the VALUE set (same n_chars), so the
    estimate is tie-stable.

    Scale shape: TakeOrdered top-(k+1) — no global sort — then
    constant-size arithmetic."""
    d = tables(spark, sf_dir)["documents"]
    top = (
        d.select("n_chars", "doc_id")
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(_HILL_K + 1)
    )
    w = Window.orderBy(F.desc("n_chars"), "doc_id")
    r = top.select(
        "n_chars", F.row_number().over(w).alias("rn")
    ).localCheckpoint(eager=False)  # 201 rows, feeds x_k + the sum
    xk = r.filter(F.col("rn") == _HILL_K + 1).select(
        F.col("n_chars").alias("x_k")
    )
    terms = (
        r.filter(F.col("rn") <= _HILL_K)
        .crossJoin(F.broadcast(xk))  # 200 rows × 1 row
        .agg(
            F.sum(
                F.floor(
                    F.log(
                        F.col("n_chars").cast("double") / F.col("x_k")
                    )
                    * 1000000000
                    + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("s_nano")
        )
    )
    alpha = _HILL_K / (F.col("s_nano") / 1e9)
    return terms.crossJoin(F.broadcast(xk)).select(  # 1-row × 1-row
        F.lit(_HILL_K).cast("long").alias("k"),
        F.col("x_k").cast("long").alias("x_k"),
        q6(alpha).alias("alpha_hill"),
        q6(alpha / F.sqrt(F.lit(float(_HILL_K)))).alias("alpha_se"),
    )


# ---------------------------------------------------------------------------
# kish_effective_sample_size
# ---------------------------------------------------------------------------


@query(
    "kish_effective_sample_size",
    oracle="""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS sw,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS sww
        FROM documents GROUP BY source
    )
    SELECT source, n,
           FLOOR(CAST(sw AS DOUBLE) * sw / sww * 1000000 + 0.5)
               / 1000000 AS n_eff,
           FLOOR(n / (CAST(sw AS DOUBLE) * sw / sww) * 1000000 + 0.5)
               / 1000000 AS design_effect,
           FLOOR(sqrt(CAST(n AS DOUBLE) * sww / (CAST(sw AS DOUBLE) * sw)
                      - 1.0) * 1000000 + 0.5) / 1000000 AS weight_cv
    FROM s ORDER BY source
    """,
)
def kish_effective_sample_size_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kish effective sample size per source under length-proportional
    importance weights (w = n_chars): n_eff = (Σw)²/Σw², the design
    effect n/n_eff, and the weight CV √(n·Σw²/(Σw)² − 1) — the standard
    answer to 'how many effective documents does this weighted mixture
    contribute', the gatekeeper stat for DSIR-style mixture reweighting
    (weights that crater n_eff buy distribution match with variance).
    Integer weights ⇒ Σw, Σw² exact BIGINTs from one map-side-combined
    scan; the three outputs are single IEEE expressions.

    Scale shape: one scan, one ≤|sources| hash agg. Σw² fits int64 to
    ~4e9 docs of 1e4 chars; past that, promote to decimal(38,0) — noted
    rather than paid here."""
    d = tables(spark, sf_dir)["documents"]
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("sw"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("long")
        .alias("sww"),
    )
    n_eff = F.col("sw").cast("double") * F.col("sw") / F.col("sww")
    cv = F.sqrt(
        F.col("n").cast("double")
        * F.col("sww")
        / (F.col("sw").cast("double") * F.col("sw"))
        - 1.0
    )
    return s.select(
        "source",
        "n",
        q6(n_eff).alias("n_eff"),
        q6(F.col("n") / n_eff).alias("design_effect"),
        q6(cv).alias("weight_cv"),
    ).orderBy("source")
