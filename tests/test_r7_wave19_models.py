"""Round-7 wave-19 behavior tests: the threshold sweep's monotone
calibration law and the dimension stats vs numpy."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave19 import (
    embedding_dimension_stats_q,
    quality_threshold_sweep_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_threshold_sweep_is_monotone_and_conserves(spark):
    rows = [r.asDict() for r in quality_threshold_sweep_q(spark, SF_SMALL).collect()]
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    assert [r["t_micro"] for r in rows] == [
        100000, 300000, 500000, 700000, 900000
    ]
    # raising the cutoff can only shed documents, tokens, and mass
    for a, b in zip(rows, rows[1:]):
        assert a["n_kept"] >= b["n_kept"]
        assert a["tokens_kept"] >= b["tokens_kept"]
        assert a["sum_q_micro"] >= b["sum_q_micro"]
    for r in rows:
        assert 0.0 <= r["kept_share"] <= 1.0
        assert abs(r["kept_share"] - math.floor(r["n_kept"] / len(d) * 1e4 + 0.5) / 1e4) < 1e-9
        if r["n_kept"]:
            # kept mean quality must sit at/above the cutoff
            assert r["sum_q_micro"] / r["n_kept"] >= r["t_micro"]
    # the lowest cutoff keeps a nontrivial corpus share
    assert rows[0]["n_kept"] > 0


def test_dimension_stats_match_numpy(spark):
    got = {r["dim"]: r.asDict() for r in embedding_dimension_stats_q(spark, SF_SMALL).collect()}
    e = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = np.stack(e.embedding.to_numpy()).astype(np.float64)
    micro = np.floor(vecs * 1e6 + 0.5).astype(np.int64)
    assert set(got) == set(range(1, vecs.shape[1] + 1))
    for j in range(vecs.shape[1]):
        col = micro[:, j]
        g = got[j + 1]
        assert g["min_micro"] == int(col.min())
        assert g["max_micro"] == int(col.max())
        n, s1, s2 = len(col), int(col.sum()), int((col * col).sum())
        mean = s1 / n / 1e6
        std = math.sqrt((s2 - s1 * s1 / n) / (n - 1)) / 1e6
        assert abs(g["mean_val"] - math.floor(mean * 1e6 + 0.5) / 1e6) < 1e-9
        assert abs(g["std_val"] - math.floor(std * 1e6 + 0.5) / 1e6) < 1e-9
        assert g["low_variance"] == (std < 0.01)
