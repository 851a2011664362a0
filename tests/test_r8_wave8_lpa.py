"""Round-8 wave-8 behavior test: synchronous label propagation on a
hand-traced graph — two triangles joined by a bridge edge resolve to
exactly two communities after three rounds (trace in the assertions)."""

from __future__ import annotations

from clickhouse_objects_analysis_spark.operators.graph import (
    label_propagation,
)


def test_lpa_two_triangles_bridge(spark):
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["n"]: r["lbl"]
        for r in label_propagation(df, "id_a", "id_b", rounds=3).collect()
    }
    # hand trace (votes = previous-round neighbor labels, ties -> min):
    # r1: {1:2, 2:1, 3:1, 10:3, 11:10, 12:10}
    # r2: {1:1, 2:1, 3:1, 10:10, 11:3, 12:3}
    # r3: {1:1, 2:1, 3:1, 10:3, 11:3, 12:3}
    assert got == {1: 1, 2: 1, 3: 1, 10: 3, 11: 3, 12: 3}


def test_lpa_zero_rounds_identity(spark):
    df = spark.createDataFrame([(5, 7)], "id_a long, id_b long")
    got = {
        r["n"]: r["lbl"]
        for r in label_propagation(df, "id_a", "id_b", rounds=0).collect()
    }
    assert got == {5: 5, 7: 7}


def test_ppr_star_graph_integer_trace(spark):
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.operators.graph import (
        personalized_pagerank,
    )

    # star: 1-2, 1-3, 1-4; seed {1}; hand trace in integer nanos:
    # r0 = {1: 1e9}; r1(1) = 15e9//100, r1(leaf) = 85*(1e9//3)//100
    # r2(1) = (15e9 + 85*3*283333333)//100 = 872499999
    # r2(leaf) = 85*(150000000//3)//100 = 42500000
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    got = {
        r["n"]: r["rank_nano"]
        for r in personalized_pagerank(
            df, "id_a", "id_b", F.col("n") == 1, rounds=2
        ).collect()
    }
    assert got == {1: 872499999, 2: 42500000, 3: 42500000, 4: 42500000}
