#!/usr/bin/env python
"""k_core lazy-rounds A/B at sf1 scale (VERDICT r14 #3).

The k_core_decomposition QUERY routes to the driver gate even at sf1
(near-dup graph ~10k edges), so the distributed peel loop is exercised
directly on an over-gate bipartite order-part graph built from sf1
lineitem (~6M edges, ~1.7M nodes). Arms, alternating in ONE session:

  A  shipped loop (eager removed + eager nd per round)
  B  lazy rounds  (removed/nd lazy; the per-round count materializes
     the whole chain in one job — the CC-style dispatch saving)
  C  lazy rounds + shuffle_hash hint on the nd-side delta join (the
     r14 LPA lesson: lazy chains deny the planner stats, so pin the
     per-round join strategy explicitly)

Usage: python tools/ab_r15_kcore.py [--rounds N] [--k K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from clickhouse_objects_analysis_spark.operators.graph import (  # noqa: E402
    _BROADCAST_NODES_GATE,
)
from clickhouse_objects_analysis_spark.queries.registry import tables  # noqa: E402
from clickhouse_objects_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf1")


def _setup(spark, k):
    li = tables(spark, SF_DIR)["lineitem"]
    edges = li.select(
        F.col("l_orderkey").cast("long").alias("u"),
        (F.col("l_partkey").cast("long") + F.lit(10**9)).alias("v"),
    )
    return edges


def _loop(adj, nd, k, max_iter, lazy, hint):
    for _ in range(max_iter):
        removed = nd.filter(F.col("deg") < k).select("n").localCheckpoint(
            eager=not lazy
        )
        n_removed = removed.count()
        if n_removed == 0:
            break
        rm_m = removed.select(F.col("n").alias("m"))
        if n_removed <= _BROADCAST_NODES_GATE:
            probe = F.broadcast(rm_m)
        else:
            probe = rm_m.hint("shuffle_hash")
        delta = (
            adj.join(probe, "m", "left_semi")
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("long").alias("dd"))
        )
        if hint:
            delta = delta.hint("shuffle_hash")
        nd = (
            nd.filter(F.col("deg") >= k)
            .join(delta, "n", "left")
            .select(
                "n",
                (F.col("deg") - F.coalesce(F.col("dd"), F.lit(0))).alias(
                    "deg"
                ),
            )
            .localCheckpoint(eager=not lazy)
        )
    return nd.filter(F.col("deg") >= k).localCheckpoint(eager=True)


def run_arm(spark, edges, k, lazy, hint):
    a, b = F.col("u"), F.col("v")
    canon = (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = (
        canon.select(F.col("u").alias("n"), F.col("v").alias("m"))
        .unionAll(canon.select(F.col("v").alias("n"), F.col("u").alias("m")))
        .localCheckpoint(eager=True)
    )
    n_nodes = adj.select("n").distinct().count()
    big = n_nodes > _BROADCAST_NODES_GATE
    if big:
        adj = adj.repartition(F.col("m")).persist()
    nd = (
        adj.groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    res = _loop(adj, nd, k, 30, lazy, hint)
    out = res.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n").alias("sn"),
        F.sum("deg").alias("sd"),
    ).collect()[0]
    if big:
        adj.unpersist(blocking=False)
    return tuple(out)


def main() -> None:
    args = sys.argv[1:]
    rounds, k = 3, 5
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
    if "--k" in args:
        i = args.index("--k")
        k = int(args[i + 1])
    spark = get_spark("ab-r15-kcore")
    spark.sparkContext.setLogLevel("ERROR")
    edges = _setup(spark, k)
    print("edges:", edges.count())
    arms = [("A eager", False, False), ("B lazy", True, False),
            ("C lazy+hint", True, True)]
    times = {n: [] for n, _, _ in arms}
    sigs = set()
    for r in range(rounds):
        for name, lazy, hint in arms:
            spark.sparkContext.setJobDescription(f"kcore-{name}-{r}")
            t0 = time.time()
            sig = run_arm(spark, edges, k, lazy, hint)
            times[name].append(round(time.time() - t0, 2))
            sigs.add(sig)
    print("result signatures (must be 1):", sigs)
    for name, _, _ in arms:
        print(f"{name}: {times[name]} min={min(times[name]):.2f}")


if __name__ == "__main__":
    main()
