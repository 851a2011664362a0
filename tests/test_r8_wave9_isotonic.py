"""Round-8 wave-9 behavior test: the minimax-formula isotonic fit must
equal the classic pool-adjacent-violators sweep on the same buckets."""

from __future__ import annotations

import math

from clickhouse_objects_analysis_spark.queries.r8_wave9 import (
    isotonic_calibration_q,
)


def test_minimax_equals_pav(spark):
    rows = isotonic_calibration_q(spark, "/root/testdata/sf0.001").collect()
    ws = [r["w"] for r in rows]
    ys = [r["pos"] / r["w"] for r in rows]
    # expand PAV block means back to per-bucket fits
    blocks: list[list[float]] = []
    counts: list[int] = []
    for w, y in zip(ws, ys):
        blocks.append([float(w), y])
        counts.append(1)
        while len(blocks) > 1 and blocks[-2][1] >= blocks[-1][1]:
            w2, y2 = blocks.pop()
            c2 = counts.pop()
            w1, y1 = blocks.pop()
            c1 = counts.pop()
            blocks.append([w1 + w2, (w1 * y1 + w2 * y2) / (w1 + w2)])
            counts.append(c1 + c2)
    want: list[float] = []
    for (w, y), c in zip(blocks, counts):
        want.extend([y] * c)
    got = [r["fitted_u"] for r in rows]
    assert got == [math.floor(y * 1000000 + 0.5) for y in want]
    # and the fit is monotone non-decreasing
    assert all(got[i] <= got[i + 1] for i in range(len(got) - 1))
