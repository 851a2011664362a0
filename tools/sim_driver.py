"""Simulate the driver's correctness pass: iterate the registry in order,
run Spark query + DuckDB oracle at sf0.01, time each. Prints per-query
seconds (spark, oracle) and the cumulative total — the budget profile that
decides whether the whole registry fits the driver's correctness window.

Usage: python tools/sim_driver.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as e  # noqa: E402
from clickhouse_objects_analysis_spark.session import get_spark  # noqa: E402
from tests.parity import run_oracle  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    oracles = e.oracle_sql()
    total = 0.0
    rows = []
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        err = ""
        try:
            n = len(fn(spark, sf_dir).toPandas())
        except Exception as ex:  # noqa: BLE001
            n, err = -1, f"SPARK_ERR {type(ex).__name__}: {ex}"[:120]
        t1 = time.time()
        on = None
        if name in oracles and not err:
            try:
                on = len(run_oracle(oracles[name], sf_dir))
            except Exception as ex:  # noqa: BLE001
                err = f"ORACLE_ERR {type(ex).__name__}: {ex}"[:120]
        t2 = time.time()
        total = t2 - START
        rows.append((i, name, t1 - t0, t2 - t1, n, on, err))
        print(
            f"{i:3d} {name:36s} spark={t1-t0:6.2f}s oracle={t2-t1:5.2f}s "
            f"cum={total:7.1f}s rows={n}/{on} {err}"
        )
    print(f"TOTAL {total:.1f}s for {len(qs)} queries")


START = time.time()

if __name__ == "__main__":
    main()
