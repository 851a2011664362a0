"""Round-9 wave-5 behavior tests vs pure-Python references (bigram
Jaccard recomputed with sets — the third engine)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark_rows():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from clickhouse_objects_analysis_spark.queries import QUERIES
    from clickhouse_objects_analysis_spark.session import get_spark

    spark = get_spark("tests")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def _q6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


@pytest.fixture(scope="module")
def docs():
    return duckdb.sql(
        f"SELECT doc_id, source, n_chars, text "
        f"FROM '{SF}/documents.parquet'"
    ).fetchall()


@pytest.fixture(scope="module")
def trigram_pairs(docs):
    """All (id_a, id_b, exact_jaccard) with jacc >= 0.3 via set math —
    trigram shingles under the max_df=64 stop-shingle cap (intersection
    over capped posting lists, denominators full set sizes)."""
    grams = {}
    for doc_id, _, _, text in docs:
        ws = text.split(" ")
        if len(ws) >= 3:
            grams[doc_id] = {
                f"{ws[i]} {ws[i + 1]} {ws[i + 2]}"
                for i in range(len(ws) - 2)
            }
    inv = defaultdict(list)
    for doc_id, g in grams.items():
        for x in g:
            inv[x].append(doc_id)
    kept = {g for g, ids in inv.items() if len(ids) <= 64}
    cand = set()
    for g, ids in inv.items():
        if g not in kept:
            continue
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                cand.add((a, b))
    out = {}
    for a, b in cand:
        inter = len((grams[a] & grams[b]) & kept)
        j = inter / (len(grams[a]) + len(grams[b]) - inter)
        if j >= 0.3:
            out[(a, b)] = j
    return out


def test_dedup_roi_reference(spark_rows, docs, trigram_pairs):
    tokens = {d: len(t.split(" ")) for d, _, _, t in docs}
    n_docs = len(docs)
    got = {r["threshold"]: r for r in spark_rows("dedup_threshold_roi")}
    for th in (0.5, 0.6, 0.7, 0.8, 0.9):
        removed = {b for (a, b), j in trigram_pairs.items() if j >= th}
        r = got[th]
        assert r["docs_removed"] == len(removed)
        assert r["tokens_removed"] == sum(tokens[d] for d in removed)
        assert r["doc_frac_removed"] == _q6(len(removed) / n_docs)
    # the curve must be monotone non-increasing in the threshold
    vals = [got[t]["docs_removed"] for t in (0.5, 0.6, 0.7, 0.8, 0.9)]
    assert vals == sorted(vals, reverse=True)


def test_record_linkage_fs_reference(spark_rows, docs, trigram_pairs):
    meta = {d: (src, nc, t[:16]) for d, src, nc, t in docs}

    def w(m, u, agree):
        return math.log2(m / u) if agree else math.log2((1 - m) / (1 - u))

    got = {(r["id_a"], r["id_b"]): r for r in spark_rows("record_linkage_fs")}
    assert set(got) == set(trigram_pairs)
    for (a, b), _ in trigram_pairs.items():
        sa, na, pa = meta[a]
        sb, nb, pb = meta[b]
        f_src = sa == sb
        f_len = abs(na - nb) <= 0.1 * max(na, nb)
        f_pre = pa == pb
        score = (
            w(0.95, 0.25, f_src) + w(0.9, 0.1, f_len) + w(0.8, 0.01, f_pre)
        )
        r = got[(a, b)]
        assert (r["f_src"], r["f_len"], r["f_pre"]) == (
            int(f_src), int(f_len), int(f_pre),
        )
        assert r["fs_score"] == _q6(score)
        assert r["decision"] == (
            "link" if score >= 2.0 else "possible" if score >= 0.0
            else "non-link"
        )
