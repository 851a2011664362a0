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


def test_driver_gate_matches_distributed_paths(spark, monkeypatch):
    """r13 driver-kernel gate (PPR/LPA): forcing the distributed loop
    (gate=-1) must produce EXACTLY the rows the driver replay produces
    on the same graph — the recurrences are deterministic integer
    arithmetic, so equality is bitwise, not approximate."""
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (7, 8)],
        ["a", "b"],
    )
    seed = (F.col("n") % 3 == 1)

    def ppr_rows():
        return sorted(
            (r["n"], r["deg"], r["rank_nano"])
            for r in G.personalized_pagerank(
                edges, "a", "b", seed, rounds=3
            ).collect()
        )

    def lpa_rows():
        return sorted(
            (r["n"], r["lbl"])
            for r in G.label_propagation(edges, "a", "b", rounds=3).collect()
        )

    via_driver_ppr, via_driver_lpa = ppr_rows(), lpa_rows()
    monkeypatch.setattr(G, "_GRAPH_DRIVER_NODES", -1)
    assert ppr_rows() == via_driver_ppr
    assert lpa_rows() == via_driver_lpa


def test_ppr_storage_arms_bitwise_equal(spark, monkeypatch):
    """r14 input-bytes storage routing: the checkpoint arm (small scan
    inputs) and the persist arm (big/unknown inputs) are pure storage
    choices for the same dataflow — on the forced DISTRIBUTED path they
    must produce bitwise-identical rows."""
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (7, 8)],
        ["a", "b"],
    )
    seed = (F.col("n") % 3 == 1)
    monkeypatch.setattr(G, "_GRAPH_DRIVER_NODES", -1)  # force distributed

    def rows():
        return sorted(
            (r["n"], r["deg"], r["rank_nano"])
            for r in G.personalized_pagerank(
                edges, "a", "b", seed, rounds=3
            ).collect()
        )

    # in-memory frame -> inputFiles() empty -> persist arm
    assert G._scan_input_bytes(edges) is None
    via_persist = rows()
    monkeypatch.setattr(G, "_scan_input_bytes", lambda df: 1)
    assert rows() == via_persist


def test_scan_input_bytes_reads_parquet_scans(spark, tmp_path):
    """_scan_input_bytes totals the on-disk size of the file scans under
    a derived plan (joins/filters included) without running a job."""
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.operators import graph as G

    p = str(tmp_path / "t.parquet")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    derived = df.filter(F.col("k") > 1).join(
        df.select(F.col("id").alias("id2")), F.col("id") == F.col("id2")
    )
    got = G._scan_input_bytes(derived)
    assert got is not None and got > 0


def test_k_core_driver_gate_matches_distributed(spark, monkeypatch):
    """r13: k_core's driver peel must equal the distributed frontier
    peel on the same graph (deterministic fixpoint, bitwise rows)."""
    from clickhouse_objects_analysis_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4),
         (1, 4), (7, 8)],
        ["a", "b"],
    )

    def rows():
        return sorted(
            (r["n"], r["deg"])
            for r in G.k_core(edges, "a", "b", 2).collect()
        )

    via_driver = rows()
    monkeypatch.setattr(G, "_GRAPH_DRIVER_NODES", -1)
    assert rows() == via_driver
    # the 2-core drops the pendant 7-8 component entirely
    assert {n for n, _ in via_driver} == {1, 2, 3, 4, 5, 6}
