#!/usr/bin/env python
"""Isolated per-query timing: fresh session, JVM+Arrow warmup, then
best-of-N noop-sink runs for each named query (guide §1.4).

Usage: python tools/time_query.py q1 q2 ... [--reps N] [--sf DIR]
Prints one JSON line: {"sf": ..., "queries": {name: [runs...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_objects_analysis_spark.queries import QUERIES  # noqa: E402
from clickhouse_objects_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen + Arrow worker warmup (mirrors bench.py)
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.operators.similarity import dot_pd

    (
        spark.range(10_000)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select(F.array(F.lit(1.0), F.lit(2.0)).alias("a"))
        .select(dot_pd("a", "a").alias("d"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time_query: {name}")
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
