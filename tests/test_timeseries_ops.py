"""Behavior tests for operators/timeseries.py on synthetic series —
parity (tests/test_oracle_parity.py) proves engine agreement; these
prove the SEMANTICS: CUSUM finds a planted level shift, Theil–Sen
shrugs off an outlier that drags OLS, Holt recovers a perfect linear
trend, PSI is ~0 for identical windows and large for a shifted one."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clickhouse_objects_analysis_spark.operators.timeseries import (
    cusum_changepoint,
    holt_smooth,
    psi_between,
    theil_sen,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "s string, t long, v double")


def test_cusum_locates_planted_level_shift(spark):
    # flat at 10 for t<20, flat at 30 for t>=20: |cusum| peaks at t=19
    rows = [("a", t, 10.0 if t < 20 else 30.0) for t in range(40)]
    out = cusum_changepoint(_series(spark, rows), "s", "t", "v").collect()
    assert len(out) == 1
    assert out[0]["cp_t"] == 19
    assert out[0]["n_points"] == 40
    # mean = 20, cusum at 19 = 20 * (10 - 20) = -200
    assert out[0]["cusum_at_cp"] == -200.0


def test_theil_sen_ignores_outlier_ols_does_not(spark):
    # perfect slope-2 line with one wild outlier at the end (t=20 —
    # max leverage; a centered outlier can't tilt OLS at all)
    rows = [("a", t, 2.0 * t + 1.0) for t in range(21)]
    rows[20] = ("a", 20, 1000.0)
    df = _series(spark, rows)
    ts = theil_sen(df, "s", "t", "v").collect()[0]
    assert ts["slope"] == 2.0 and ts["intercept"] == 1.0
    ols = df.groupBy("s").agg(F.regr_slope("v", "t").alias("b")).collect()
    assert abs(ols[0]["b"] - 2.0) > 1.0  # OLS dragged by the outlier


def test_holt_recovers_linear_trend(spark):
    # on y = 5 + 3t Holt's recurrence is exact: level tracks the line,
    # trend equals the slope, forecasts extrapolate it
    rows = [("a", t, 5.0 + 3.0 * t) for t in range(30)]
    out = holt_smooth(_series(spark, rows), "s", "t", "v").collect()[0]
    assert out["level"] == pytest.approx(5.0 + 3.0 * 29, abs=1e-6)
    assert out["trend"] == pytest.approx(3.0, abs=1e-6)
    assert out["fc_3"] == pytest.approx(5.0 + 3.0 * 32, abs=1e-6)


def test_holt_drops_single_point_series(spark):
    rows = [("lone", 0, 1.0)] + [("ok", t, float(t)) for t in range(5)]
    out = holt_smooth(_series(spark, rows), "s", "t", "v").collect()
    assert [r["s"] for r in out] == ["ok"]


def test_psi_zero_for_identical_large_for_shifted(spark):
    ref = [("a", float(i % 100)) for i in range(1000)]
    same = [("a", float((i * 7) % 100)) for i in range(1000)]
    shifted = [("a", 200.0 + i % 100) for i in range(1000)]

    def run(cur_rows):
        df = spark.createDataFrame(
            [(s, v, False) for s, v in ref]
            + [(s, v, True) for s, v in cur_rows],
            "s string, v double, cur boolean",
        )
        return psi_between(df, "s", "v", F.col("cur")).collect()[0]

    near = run(same)
    assert near["psi"] < 0.02 and near["n_ref"] == 1000
    far = run(shifted)
    # every current row lands in the top bucket: PSI blows up
    assert far["psi"] > 1.0
