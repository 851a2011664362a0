"""Per-series time-series operators: Holt smoothing, CUSUM changepoint,
Theil–Sen robust trend, PSI drift.

All four take an already-aggregated series frame (one row per
(series, order) — callers build it with a plain codegen groupBy, so raw
event volume never reaches these operators) and are across-series
parallel: Holt is an applyInPandas ordered recurrence (the one shape
Catalyst can't express without a 2^k expression tree), the other three
are window/join compositions that stay JVM-side.

Reference parity note: the reference repo (a lineage extractor,
ch_view_dependencies.py) has no time-series surface; these extend the
rebuild's analytics charter (CH analogues: exponentialMovingAverage,
seriesOutliersDetectTukey, seriesPeriodDetectFFT, seriesDecomposeSTL).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def holt_smooth(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    gamma: float = 0.3,
) -> DataFrame:
    """Holt double-exponential smoothing per series: init l₁=y₁,
    b₁=y₂−y₁; lₜ = αyₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = γ(lₜ−lₜ₋₁) +
    (1−γ)bₜ₋₁. Emits (series, level, trend, fc_1, fc_3) rounded to 4dp.
    Series with fewer than 2 points are dropped (mirrors the SQL
    oracle's init-join semantics). Gaps in the order grid are treated
    as consecutive samples — densify upstream (WITH FILL) if unwanted."""
    import pandas as pd

    a, g = float(alpha), float(gamma)

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = [float(v) for v in pdf[value_col]]
        key = pdf[series_col].iloc[0]
        if len(y) < 2:
            return pd.DataFrame(
                {
                    series_col: pd.Series(dtype="object"),
                    "level": pd.Series(dtype="float64"),
                    "trend": pd.Series(dtype="float64"),
                    "fc_1": pd.Series(dtype="float64"),
                    "fc_3": pd.Series(dtype="float64"),
                }
            )
        l, b = y[0], y[1] - y[0]
        for t in range(1, len(y)):
            l_new = a * y[t] + (1 - a) * (l + b)
            b = g * (l_new - l) + (1 - g) * b
            l = l_new
        return pd.DataFrame(
            [[key, round(l, 4), round(b, 4),
              round(l + b, 4), round(l + 3 * b, 4)]],
            columns=[series_col, "level", "trend", "fc_1", "fc_3"],
        )

    key_type = df.schema[series_col].dataType.simpleString()
    return df.groupBy(series_col).applyInPandas(
        holt,
        schema=f"{series_col} {key_type}, level double, trend double, "
        "fc_1 double, fc_3 double",
    )


def cusum_changepoint(
    df: DataFrame, series_col: str, order_col: str, value_col: str
) -> DataFrame:
    """Mean-centered cumulative-sum changepoint per series: the order
    position where |Σ(y − ȳ)| peaks (earliest position on ties). One
    per-series window sort; the mean rides a broadcast join. Emits
    (series, cp at order_col's name, cusum_at_cp, n_points)."""
    m = df.groupBy(series_col).agg(
        F.avg(value_col).alias("__mu"), F.count("*").alias("n_points")
    )
    cu = df.join(F.broadcast(m), series_col).withColumn(
        "__cusum",
        F.sum(F.col(value_col) - F.col("__mu")).over(
            Window.partitionBy(series_col)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    w = Window.partitionBy(series_col).orderBy(
        F.abs(F.col("__cusum")).desc(), F.asc(order_col)
    )
    return (
        cu.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            series_col,
            F.col(order_col).cast("long").alias("cp_" + order_col),
            F.round("__cusum", 4).alias("cusum_at_cp"),
            F.col("n_points").cast("long").alias("n_points"),
        )
    )


def theil_sen(
    df: DataFrame, series_col: str, order_col: str, value_col: str
) -> DataFrame:
    """Theil–Sen robust trend per series: slope = median of all pairwise
    slopes (O(points²) per series — bounded by series length, never raw
    volume), intercept = median residual at that slope. Emits (series,
    slope, intercept) at 4dp. Outlier-immune where OLS is not."""
    sl = (
        df.alias("a")
        .join(df.alias("b"), series_col)
        .where(F.col(f"a.{order_col}") < F.col(f"b.{order_col}"))
        .select(
            series_col,
            (
                (F.col(f"b.{value_col}") - F.col(f"a.{value_col}"))
                / (F.col(f"b.{order_col}") - F.col(f"a.{order_col}"))
            ).alias("__slope"),
        )
    )
    med = sl.groupBy(series_col).agg(
        F.percentile("__slope", F.lit(0.5)).alias("__m")
    )
    return (
        df.join(F.broadcast(med), series_col)
        .groupBy(series_col, "__m")
        .agg(
            F.percentile(
                F.col(value_col) - F.col("__m") * F.col(order_col),
                F.lit(0.5),
            ).alias("__res")
        )
        .select(
            series_col,
            F.round("__m", 4).alias("slope"),
            F.round("__res", 4).alias("intercept"),
        )
    )


def psi_between(
    df: DataFrame,
    series_col: str,
    value_col: str,
    is_current: Column,
    n_edges: int = 9,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per series between the reference rows
    (is_current false) and current rows (is_current true): decile edges
    from the reference via exact interpolated percentiles, both windows
    bucketed with a codegen array filter (no UDF), PSI = Σ (p_cur −
    p_ref)·ln(p_cur/p_ref) with eps smoothing. The edge array is tiny
    per-series state on a broadcast join. Emits (series, psi, n_ref,
    n_cur)."""
    dfc = df.withColumn("__cur", is_current)
    edges = (
        dfc.where(~F.col("__cur"))
        .groupBy(series_col)
        .agg(
            F.percentile(
                value_col,
                F.array(
                    *[
                        F.lit((i + 1) / (n_edges + 1.0))
                        for i in range(n_edges)
                    ]
                ),
            ).alias("__e")
        )
    )
    b = dfc.join(F.broadcast(edges), series_col).select(
        series_col,
        "__cur",
        F.size(
            F.filter(F.col("__e"), lambda x: F.col(value_col) > x)
        ).alias("__bucket"),
    )
    f = b.groupBy(series_col, "__bucket").agg(
        F.count_if(~F.col("__cur")).alias("__n_ref"),
        F.count_if(F.col("__cur")).alias("__n_cur"),
    )
    wt = Window.partitionBy(series_col)
    t = f.select(
        series_col,
        "__n_ref",
        "__n_cur",
        F.sum("__n_ref").over(wt).alias("__tr"),
        F.sum("__n_cur").over(wt).alias("__tc"),
    )
    pc = F.col("__n_cur").cast("double") / F.col("__tc")
    pr = F.col("__n_ref").cast("double") / F.col("__tr")
    return t.groupBy(series_col).agg(
        F.round(
            F.sum((pc - pr) * F.log((pc + eps) / (pr + eps))), 4
        ).alias("psi"),
        F.max("__tr").cast("long").alias("n_ref"),
        F.max("__tc").cast("long").alias("n_cur"),
    )


def holt_winters_additive(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.2,
) -> DataFrame:
    """Additive Holt–Winters (level + trend + length-``period`` season)
    per series — the seasonal extension of holt_smooth, same ordered
    recurrence shape Catalyst cannot express.

    Init from the first two seasons (requires >= 2*period points;
    shorter series are dropped, mirroring the oracle's WHERE):
    l = mean(season 1), b = (mean(season 2) − mean(season 1)) / period,
    s_j = y_j − l. Then for t > period (0-based idx = t−1 mod period):
        lₜ = α(yₜ − s_idx) + (1−α)(l + b)
        bₜ = β(lₜ − l) + (1−β)b
        s_idx ← γ(yₜ − lₜ) + (1−γ)s_idx
    Seasonal position is the sample POSITION mod period, not the
    calendar slot — gaps shift the grid; densify upstream (WITH FILL)
    if unwanted (same contract as holt_smooth).

    Float parity: the season means are LEFT FOLDS over the
    position-ordered values (functools.reduce here, list_reduce in the
    DuckDB oracle) and every recurrence step is one fixed expression
    tree, so both engines execute identical double ops in identical
    order. Emits (series, level, trend, season_next, fc_1) at 4dp where
    fc_1 = l + b + s_{next position}.

    100 TB: per-series sequential, across-series parallel — one Arrow
    batch per series; raw volume is reduced by the caller's codegen
    groupBy before the recurrence ever runs."""
    import functools
    import operator as op

    import pandas as pd

    a, b_, g, p = float(alpha), float(beta), float(gamma), int(period)

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                series_col: pd.Series(dtype="object"),
                "level": pd.Series(dtype="float64"),
                "trend": pd.Series(dtype="float64"),
                "season_next": pd.Series(dtype="float64"),
                "fc_1": pd.Series(dtype="float64"),
            }
        )
        pdf = pdf.sort_values(order_col)
        y = [float(v) for v in pdf[value_col]]
        if len(y) < 2 * p:
            return empty
        m1 = functools.reduce(op.add, y[0:p]) / p
        m2 = functools.reduce(op.add, y[p : 2 * p]) / p
        l, b = m1, (m2 - m1) / p
        s = [y[j] - m1 for j in range(p)]
        for t in range(p, len(y)):
            idx = t % p
            l_new = a * (y[t] - s[idx]) + (1 - a) * (l + b)
            b = b_ * (l_new - l) + (1 - b_) * b
            s[idx] = g * (y[t] - l_new) + (1 - g) * s[idx]
            l = l_new
        nxt = s[len(y) % p]
        return pd.DataFrame(
            [[pdf[series_col].iloc[0], round(l, 4), round(b, 4),
              round(nxt, 4), round(l + b + nxt, 4)]],
            columns=[series_col, "level", "trend", "season_next", "fc_1"],
        )

    key_type = df.schema[series_col].dataType.simpleString()
    return df.groupBy(series_col).applyInPandas(
        hw,
        schema=f"{series_col} {key_type}, level double, trend double, "
        "season_next double, fc_1 double",
    )
