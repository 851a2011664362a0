"""Round-10 wave-8 behavior test: the leakage matrix must partition the
verified near-dup pair stream — same pairs, attributed by source."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark_rows():
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from clickhouse_objects_analysis_spark.queries import QUERIES
    from clickhouse_objects_analysis_spark.session import get_spark

    spark = get_spark("tests")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def test_leakage_partitions_pair_stream(spark_rows):
    pairs = spark_rows("dedup_minhash_lsh")
    src = dict(
        duckdb.sql(
            f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    want = defaultdict(int)
    for p in pairs:
        a, b = src[p["id_a"]], src[p["id_b"]]
        want[(min(a, b), max(a, b))] += 1
    got = {
        (r["src_a"], r["src_b"]): r
        for r in spark_rows("source_neardup_leakage")
    }
    assert {k: r["n_pairs"] for k, r in got.items()} == dict(want)
    # the matrix is upper-triangular and the flag is consistent
    for (a, b), r in got.items():
        assert a <= b
        assert r["cross_source"] == (a != b)
    # pair mass is conserved
    assert sum(r["n_pairs"] for r in got.values()) == len(pairs)
