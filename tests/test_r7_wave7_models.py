"""Round-7 wave-7 behavior tests: triangle counting against a
brute-force reference (hand graphs + a random graph), RRF fusion and
survivorship against pure-Python replays over sf0.001 — the independent
third implementation besides Spark and the DuckDB oracle."""

from __future__ import annotations

import math
import random
import re
from itertools import combinations

import pandas as pd

from clickhouse_objects_analysis_spark.operators.graph import triangle_stats
from clickhouse_objects_analysis_spark.queries.r7_wave7 import (
    dedup_survivorship_q,
    rrf_hybrid_retrieval_q,
)

SF_SMALL = "/root/testdata/sf0.001"
_WS = re.compile(r"\s+")


def _brute_triangles(edges: set[tuple[int, int]]):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    return len(adj), len(edges), tri, wedges


def _check_graph(spark, edges):
    df = spark.createDataFrame(
        [(u, v) for u, v in edges], "u long, v long"
    )
    row = triangle_stats(df, "u", "v").collect()[0]
    n, m, t, w = _brute_triangles({(min(u, v), max(u, v)) for u, v in edges})
    assert (row["n_nodes"], row["n_edges"]) == (n, m)
    assert (row["n_triangles"], row["n_wedges"]) == (t, w), (t, w, row)
    if w:
        assert abs(row["global_clustering"] - round(3 * t / w, 6)) < 1e-9


def test_triangle_stats_known_graphs(spark):
    # K4: 4 triangles; plus a disjoint 3-path (no triangles, 2 wedges)
    k4 = list(combinations([1, 2, 3, 4], 2))
    _check_graph(spark, k4)  # C(4,3)=4 triangles
    _check_graph(spark, k4 + [(10, 11), (11, 12), (12, 13)])
    # star: many wedges, zero triangles — the skew case orientation fixes
    _check_graph(spark, [(0, i) for i in range(1, 12)])
    # triangle with duplicate / reversed duplicates must canonicalize
    _check_graph(spark, [(1, 2), (2, 3), (3, 1), (2, 1), (1, 3)])


def test_triangle_stats_random_graph_matches_bruteforce(spark):
    rng = random.Random(7177)
    edges = {
        tuple(sorted(rng.sample(range(30), 2))) for _ in range(140)
    }
    _check_graph(spark, sorted(edges))


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


def test_rrf_matches_python_reference(spark):
    got = [r.asDict() for r in rrf_hybrid_retrieval_q(spark, SF_SMALL).collect()]
    d = _docs()
    # lexical side: tf-idf over df-rank-10/20/30 terms
    tf: dict[tuple[int, str], int] = {}
    for r in d.itertuples():
        for w in r.text.strip().split():
            tf[(r.doc_id, w)] = tf.get((r.doc_id, w), 0) + 1
    dfreq: dict[str, int] = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    ranked_terms = sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))
    qterms = {ranked_terms[i][0] for i in (9, 19, 29)}
    n_docs = len(d)
    lex: dict[int, int] = {}
    for (doc, w), c in tf.items():
        if w in qterms:
            s = math.floor(c * math.log(n_docs / dfreq[w]) * 1e6 + 0.5)
            lex[doc] = lex.get(doc, 0) + s
    lexr = {
        doc: i + 1
        for i, (doc, _) in enumerate(
            sorted(lex.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        )
    }
    # dense side: cosine vs vec 0 on the nano grid
    e = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    import numpy as np

    vecs = np.stack(e.embedding.to_numpy()).astype(np.float64)
    ids = e.vec_id.to_numpy()
    q = vecs[ids == 0][0]
    cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    cn = np.floor(cos * 1e9 + 0.5).astype(np.int64)
    order = sorted(zip(-cn, ids))[:50]
    denser = {int(doc): i + 1 for i, (_, doc) in enumerate(order)}
    fused: dict[int, tuple[int, int, int]] = {}
    for doc in set(lexr) | set(denser):
        lr, dr = lexr.get(doc, 0), denser.get(doc, 0)
        s = (math.floor(1e9 / (60 + lr)) if lr else 0) + (
            math.floor(1e9 / (60 + dr)) if dr else 0
        )
        fused[doc] = (lr, dr, s)
    top = sorted(fused.items(), key=lambda kv: (-kv[1][2], kv[0]))[:10]
    assert [r["doc_id"] for r in got] == [doc for doc, _ in top]
    for r, (doc, (lr, dr, s)) in zip(got, top):
        assert (r["lex_rank"], r["dense_rank"], r["rrf_nano"]) == (lr, dr, s)


def test_survivorship_invariants_and_bruteforce_clusters(spark):
    rows = [r.asDict() for r in dedup_survivorship_q(spark, SF_SMALL).collect()]
    d = _docs()
    assert len(rows) == len(d)  # singletons included
    by_cluster: dict[int, list[dict]] = {}
    for r in rows:
        by_cluster.setdefault(r["canonical"], []).append(r)
    nchars = dict(zip(d.doc_id, d.n_chars))
    for canon, members in by_cluster.items():
        assert all(m["cluster_size"] == len(members) for m in members)
        best = min(members, key=lambda m: (-nchars[m["doc_id"]], m["doc_id"]))
        assert all(m["survivor_id"] == best["doc_id"] for m in members)
        assert sum(m["keep"] for m in members) == 1
        assert canon == min(m["doc_id"] for m in members)
    # brute-force clusters: exact jaccard >= 0.8 over word trigram sets
    sets: dict[int, set[str]] = {}
    for r in d.itertuples():
        ws = [w for w in _WS.split((r.text or "").strip()) if w]
        if len(ws) >= 3:
            sets[r.doc_id] = {" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)}
    parent = {i: i for i in d.doc_id}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    items = sorted(sets.items())
    for i, (ia, sa) in enumerate(items):
        for ib, sb in items[i + 1 :]:
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= 0.8:
                ra, rb = find(ia), find(ib)
                parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in parent}
    got_map = {r["doc_id"]: r["canonical"] for r in rows}
    assert got_map == expected
