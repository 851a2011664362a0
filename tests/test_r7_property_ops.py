"""Property-style randomized checks for the round-7 session operators:
triangle_stats over random graphs (incl. adversarial shapes the
degree orientation must survive) and Holt–Winters over random series —
both against brute-force Python references. Seeded RNG, deterministic;
cases batched to keep Spark round trips low."""

from __future__ import annotations

import functools
import operator as op
from itertools import combinations

import numpy as np

from clickhouse_objects_analysis_spark.operators.graph import triangle_stats
from clickhouse_objects_analysis_spark.operators.timeseries import (
    holt_winters_additive,
)


def _brute(edges):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    return len(adj), len(edges), tri, wedges


def test_triangle_stats_random_and_adversarial_graphs(spark):
    rng = np.random.RandomState(74201)
    cases = []
    for density in (0.1, 0.3, 0.7):
        n = int(rng.randint(6, 18))
        edges = {
            (a, b)
            for a, b in combinations(range(n), 2)
            if rng.rand() < density
        }
        if edges:
            cases.append(sorted(edges))
    # adversarial: equal-degree ties everywhere (cycle), double star
    cases.append([(i, (i + 1) % 9) for i in range(9)])
    cases.append(
        [(0, i) for i in range(2, 9)] + [(1, i) for i in range(2, 9)] + [(0, 1)]
    )
    for edges in cases:
        df = spark.createDataFrame(edges, "u long, v long")
        row = triangle_stats(df, "u", "v").collect()[0]
        n, m, t, w = _brute(set(edges))
        assert (
            row["n_nodes"], row["n_edges"], row["n_triangles"], row["n_wedges"]
        ) == (n, m, t, w), edges


def _hw_ref(y, p=7, a=0.5, b_=0.3, g=0.2):
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
    return round(l, 4), round(b, 4), round(nxt, 4), round(l + b + nxt, 4)


def test_holt_winters_random_series_match_reference(spark):
    rng = np.random.RandomState(74202)
    rows, expected = [], {}
    for sid in range(8):
        length = int(rng.randint(14, 40))
        y = [
            float(np.round(rng.uniform(-50, 50), 3)) for _ in range(length)
        ]
        expected[f"s{sid}"] = _hw_ref(y)
        rows += [(f"s{sid}", t, v) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "sid string, t long, v double")
    got = {
        r["sid"]: (r["level"], r["trend"], r["season_next"], r["fc_1"])
        for r in holt_winters_additive(df, "sid", "t", "v").collect()
    }
    assert got == expected
