"""Round-8 wave-2 behavior tests: k-core peeling against a brute-force
reference on hand graphs, the grid spatial join against an O(n²) scan
over random points, and the k-core convergence-depth margin the
unrolled DuckDB oracle depends on."""

from __future__ import annotations

import itertools
import random

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.operators.graph import k_core
from clickhouse_objects_analysis_spark.operators.spatial import (
    grid_neighbor_pairs,
)

SF_SMALL = "/root/testdata/sf0.001"


def _brute_k_core(edges: set[tuple[int, int]], k: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items() if ns}


def _check_k_core(spark, edges, k):
    df = spark.createDataFrame(list(edges), "u long, v long")
    got = {
        r["n"]: r["deg"] for r in k_core(df, "u", "v", k).collect()
    }
    want = _brute_k_core({(min(u, v), max(u, v)) for u, v in edges}, k)
    assert got == want, (k, got, want)


def test_k_core_known_graphs(spark):
    # triangle + pendant chain: 2-core = the triangle only
    tri_tail = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    _check_k_core(spark, tri_tail, 2)
    # K4 plus a C4 sharing one vertex: 3-core = K4 only
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    c4 = [(4, 10), (10, 11), (11, 12), (12, 4)]
    _check_k_core(spark, k4 + c4, 3)
    _check_k_core(spark, k4 + c4, 2)  # both survive at k=2
    # long chain: 2-core empty (cascading peel, multiple rounds)
    chain = [(i, i + 1) for i in range(12)]
    _check_k_core(spark, chain, 2)
    # cycle: entirely its own 2-core
    cyc = [(i, (i + 1) % 8) for i in range(8)]
    _check_k_core(spark, cyc, 2)


def test_k_core_random_graph(spark):
    rng = random.Random(8)
    edges = {
        (rng.randrange(30), rng.randrange(30)) for _ in range(120)
    }
    edges = {(u, v) for u, v in edges if u != v}
    for k in (2, 3, 4):
        _check_k_core(spark, list(edges), k)


def test_k_core_oracle_unroll_margin(spark):
    """The DuckDB oracle unrolls 16 peel rounds; the real similarity
    graph must converge well inside that (chain graphs need length/2
    rounds — the random/testdata graphs are nowhere near that
    pathological). Count rounds via the brute-force peel."""
    from clickhouse_objects_analysis_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from clickhouse_objects_analysis_spark.queries.registry import tables

    d = tables(spark, SF_SMALL)["documents"]
    edges = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            d, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    for k in (2, 3):
        adj: dict[int, set[int]] = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        rounds = 0
        while True:
            drop = [n for n in adj if len(adj[n]) < k]
            if not drop:
                break
            rounds += 1
            for n in drop:
                for m in adj.pop(n):
                    adj[m].discard(n)
        assert rounds <= 8, f"k={k} peeled in {rounds} rounds (oracle unrolls 16)"


def test_grid_pairs_match_brute_force(spark):
    rng = random.Random(42)
    pts = [(i, rng.randrange(0, 2000), rng.randrange(0, 2000)) for i in range(300)]
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    r = 150
    got = {
        (row["id_a"], row["id_b"], row["dx"], row["dy"])
        for row in grid_neighbor_pairs(df, "pid", "x", "y", r).collect()
    }
    want = {
        (a[0], b[0], a[1] - b[1], a[2] - b[2])
        for a, b in itertools.combinations(pts, 2)
        if abs(a[1] - b[1]) <= r and abs(a[2] - b[2]) <= r
    }
    assert got == want


def test_grid_pairs_boundary_cells(spark):
    """Points exactly radius apart, straddling cell boundaries, and
    coincident points must all pair exactly once."""
    r = 10
    pts = [(1, 9, 9), (2, 19, 19), (3, 20, 20), (4, 9, 9), (5, 31, 9)]
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    got = {
        (row["id_a"], row["id_b"])
        for row in grid_neighbor_pairs(df, "pid", "x", "y", r).collect()
    }
    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(pts, 2)
        if abs(a[1] - b[1]) <= r and abs(a[2] - b[2]) <= r
    }
    assert got == want
    assert (1, 2) in got and (2, 3) in got and (1, 4) in got
    assert (1, 5) not in got  # dx = 22 > r


def test_jsd_zero_for_identical_split(spark):
    """JSD of a distribution against itself is exactly 0 — feed the
    term expression two identical count columns."""
    df = spark.createDataFrame(
        [(10, 10, 100, 100), (90, 90, 100, 100)], "ca long, cb long, ta long, tb long"
    )
    pa = F.col("ca").cast("double") / F.col("ta")
    pb = F.col("cb").cast("double") / F.col("tb")
    m = (pa + pb) / 2
    term = F.lit(0.5) * (
        F.when(F.col("ca") > 0, pa * F.log(pa / m)).otherwise(0.0)
        + F.when(F.col("cb") > 0, pb * F.log(pb / m)).otherwise(0.0)
    )
    vals = [r["t"] for r in df.select(term.alias("t")).collect()]
    assert all(v == 0.0 for v in vals)
