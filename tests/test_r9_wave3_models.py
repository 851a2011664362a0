"""Round-9 wave-3 behavior tests vs pure-Python references."""

from __future__ import annotations

import hashlib
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


def test_neyman_allocation_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT source, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    by_src = defaultdict(list)
    for s, c in rows:
        by_src[s].append(c)
    stats = {}
    for s, xs in by_src.items():
        n = len(xs)
        if n < 2:
            continue
        sx, sxx = sum(xs), sum(x * x for x in xs)
        stats[s] = (n, math.sqrt((sxx - sx * sx / n) / (n - 1)))
    denom = 0.0
    for s in sorted(stats):
        n, sd = stats[s]
        denom += n * sd
    got = {r["source"]: r for r in spark_rows("neyman_allocation")}
    assert set(got) == set(stats)
    total_alloc = 0
    for s, (n, sd) in stats.items():
        share = 1000 * (n * sd) / denom
        r = got[s]
        assert r["n_h"] == n
        assert r["s_h"] == _q6(sd)
        assert r["n_alloc"] == math.floor(share)
        assert r["n_exact"] == _q6(share)
        total_alloc += r["n_alloc"]
    # floors can undershoot the budget by at most one per stratum
    assert 1000 - len(stats) <= total_alloc <= 1000


def test_vocab_overlap_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    vocab = defaultdict(set)
    for s, t in rows:
        vocab[s].update(t.split(" "))
    got = {(r["src_a"], r["src_b"]): r for r in spark_rows("source_vocab_overlap")}
    srcs = sorted(vocab)
    expected_pairs = set()
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                continue
            expected_pairs.add((a, b))
            r = got[(a, b)]
            assert r["n_shared"] == inter
            assert r["vocab_a"] == len(vocab[a])
            assert r["vocab_b"] == len(vocab[b])
            assert r["jaccard"] == _q6(
                inter / (len(vocab[a]) + len(vocab[b]) - inter)
            )
            assert r["containment_a"] == _q6(inter / len(vocab[a]))
    assert set(got) == expected_pairs


def test_confusion_reference(spark_rows):
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    kq = {}
    for doc_id, _, text in rows:
        ws = text.split(" ")
        mwl = sum(len(w) for w in ws) / len(ws)
        kq[doc_id] = 1 if len(ws) >= 20 and mwl <= 8.0 else 0
        groups[hashlib.md5(text.lower().encode()).hexdigest()].append(doc_id)
    kd = {}
    for ids in groups.values():
        keep = min(ids)
        for i in ids:
            kd[i] = 1 if i == keep else 0
    n11 = sum(1 for i in kq if kq[i] and kd[i])
    n10 = sum(1 for i in kq if kq[i] and not kd[i])
    n01 = sum(1 for i in kq if not kq[i] and kd[i])
    n00 = sum(1 for i in kq if not kq[i] and not kd[i])
    [r] = spark_rows("quality_dedup_confusion")
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (n11, n10, n01, n00)
    assert r["agreement"] == _q6((n11 + n00) / len(kq))
    if n10 + n01:
        assert r["mcnemar_chi2"] == _q6((n10 - n01) ** 2 / (n10 + n01))
